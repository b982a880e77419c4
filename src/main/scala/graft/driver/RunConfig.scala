package graft.driver

/** Externalized run configuration (SURVEY §3.1 — `EC2/config_loader.py:3-13`
  * + `ec2_deploy/scripts/run.sh:161-168`): the reference selects per-mode
  * defaults from `RUN_MODE` (test ⇒ player limit 10, source 'test'; prod ⇒
  * 20000, 'prod'), lets `PLAYER_LIMIT` override, and threads the resolved
  * record through every stage. The typed record replaces the engine's
  * former per-query hard-coding; [[Pipeline.run]] and the leftover
  * re-drive take it as a parameter.
  *
  * Test-mode behaviors it drives (each pinned by PipelineSpec):
  *  - the fetched player list is capped at [[playerLimit]]
  *    (`EC2/fetcher.py:94`);
  *  - landed batch keys get the `test_` prefix (`Utils/S3.py:107-110`),
  *    so production readers never pick up test objects;
  *  - leftover re-processing is skipped entirely (`EC2/leftover.py:30-31`).
  */
final case class RunConfig(
    runMode: String,
    playerLimit: Int,
    startEpoch: Option[Long],
    endEpoch: Option[Long]) {

  def isTest: Boolean = runMode == "test"

  /** Batch-object key for a landed micro-batch — the reference's
    * hive-dated key layout (`Utils/S3.py:95-110`), `test_`-prefixed in
    * test mode. `kind` mirrors `data_collection_type`:
    * "match_timeline" ⇒ `match_timelines`, anything else ⇒ `matches`. */
  def batchKey(year: Int, month: Int, day: Int, timestamp: String,
      matchCount: Int, kind: String): String = {
    val suffix = if (kind == "match_timeline") "match_timelines" else "matches"
    val prefix = if (isTest) "test_batch" else "batch"
    f"matches/year=$year%04d/month=$month%02d/day=$day%02d/" +
      s"${prefix}_${timestamp}_${matchCount}_$suffix.json"
  }
}

object RunConfig {
  /** run.sh:162-168 mode defaults. */
  val TestPlayerLimit = 10
  val ProdPlayerLimit = 20000

  val prod: RunConfig = fromEnv(Map.empty)
  val test: RunConfig = fromEnv(Map("RUN_MODE" -> "test"))

  /** Resolve a config from an environment map (injectable for tests;
    * pass `sys.env` in production). `RUN_MODE` picks the defaults,
    * `PLAYER_LIMIT`/`start_epoch`/`end_epoch` override individually —
    * the same precedence as run.sh exporting into config_loader. */
  def fromEnv(env: Map[String, String]): RunConfig = {
    val mode = env.getOrElse("RUN_MODE", "prod")
    val defaultLimit = if (mode == "test") TestPlayerLimit else ProdPlayerLimit
    RunConfig(
      runMode = mode,
      playerLimit = env.get("PLAYER_LIMIT").map(_.toInt).getOrElse(defaultLimit),
      startEpoch = env.get("start_epoch").map(_.toLong),
      endEpoch = env.get("end_epoch").map(_.toLong))
  }
}
