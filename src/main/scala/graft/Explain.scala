package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Dev tool: print a catalog query's formatted physical plan (the
  * `.explain("formatted")` audit PERF.md's per-round plan reviews are
  * built from) without spark-shell ceremony.
  *
  * Usage: `runMain graft.Explain <queryName> [sfDir] [exec]` — defaults
  * to sf0.001 (plan SHAPE is scale-independent; PlanSpec pins the claims
  * that matter, this is for eyes). `all` lists catalog names. The third
  * arg `exec` RUNS the query first and prints the FINAL adaptive plan —
  * what AQE actually chose at this scale (broadcast conversions, skew
  * splits), which the static explain cannot show; `SPARK_GRAFT_CPUS`
  * sizes the session like Bench.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val exec = args.lift(2).contains("exec")
    if (name == "all") {
      SparkEntry.catalog.foreach(q => println(q.name))
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same scale-experiment override as Bench: emulate a bigger cluster's
    // partition count without changing the local core count
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.catalog.find(_.name == name).getOrElse {
      System.err.println(s"no catalog query named '$name' (try: runMain graft.Explain all)")
      sys.exit(2)
    }
    val df = q.run(spark, sfDir)
    if (exec) {
      // drive THIS plan's own RDD (df.count() would compile a separate
      // count plan and leave this one unexecuted): the action walks AQE
      // to completion, after which the AdaptiveSparkPlan node prints the
      // FINAL plan it actually ran
      val plan = df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      val n = plan.execute().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"rows=$n wall=${math.round(secs * 100) / 100.0}s")
      println(plan.toString)
      // per-node hot-spot table: every node whose executed metrics show
      // bytes spilled / shuffled / broadcast — the "WHICH operator paid"
      // answer a whole-query spill total (Bench's spill_mb) cannot give
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def nodes(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case o => o.children
        }
        p +: kids.flatMap(nodes)
      }
      println("\n-- node metrics (nonzero spill/shuffle/broadcast bytes) --")
      nodes(plan).foreach { nd =>
        val hot = nd.metrics.toSeq.filter { case (k, m) =>
          val lk = k.toLowerCase
          m.value > 0 && (lk.contains("spill") || lk.contains("bytes written") ||
            lk.contains("shuffle bytes") || lk.contains("data size") ||
            lk == "shufflebyteswritten" || lk == "datasize" || lk.contains("spilled"))
        }
        if (hot.nonEmpty) {
          val mb = hot.map { case (k, m) => f"$k=${m.value / 1048576.0}%.0fMB" }
          println(s"${nd.simpleString(100)}\n    ${mb.mkString("  ")}")
        }
      }
    } else df.explain("formatted")
    spark.stop()
  }
}
