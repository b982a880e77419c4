#!/bin/bash
# Plain-java runner mirroring build.sbt's fork settings (avoids the sbt
# lock so fixture builds / benches can run while sbt tests elsewhere).
# usage: jrun.sh <mainClass> [args...]   env: SPARK_DRIVER_MEM (default 8g),
#   GRAFT_CLASSES (classes dir override — snapshot the classpath before a
#   long campaign so a concurrent sbt compile can't break lazy classloading)
set -euo pipefail
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$CP" "$@"
