package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Benchmark main (driver contract): times every headline catalog query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement rules (VERDICT r01 findings 1/2/6):
  *  - fixed catalog order, so run-to-run diffs are query diffs;
  *  - a warmup pass at a tiny SF first, so JVM/codegen warmup isn't billed
  *    to whichever query runs first;
  *  - results go to a `noop`-format write — the full plan executes
  *    (projections, sorts, joins) with zero sink cost; a bare `count()`
  *    would let Catalyst strip projections and final sorts;
  *  - per-query failures are REPORTED (`errors` map + driver-visible -1
  *    timing), never swallowed into a plausible total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(q: queries.Q, dir: String): Option[String] =
      try {
        q.run(spark, dir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }

    val qs = SparkEntry.catalog.filter(_.headline)
    qs.foreach(exec(_, warmDir)) // warmup: codegen + JIT per query shape

    // best-of-N per query: box noise is additive, so the minimum is the
    // least-contaminated estimate of the plan's real cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val results = qs.map { q =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val err = exec(q, sfDir)
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val ok = runs.filter(_._2.isEmpty)
      if (ok.nonEmpty) (q.name, ok.map(_._1).min, None)
      else (q.name, -1.0, runs.head._2)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qJson = results.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
    val errJson = if (errs.isEmpty) "" else s""","errors":${errs.mkString("{", ",", "}")}"""
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.nonEmpty)) sys.exit(1)
  }
}
