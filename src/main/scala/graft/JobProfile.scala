package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Per-JOB byte attribution for a catalog query — the iterative-query
  * counterpart of `graft.Explain <q> <sf> exec`.
  *
  * `Explain exec` names which OPERATOR of a single executed plan spilled;
  * queries that drive eager jobs while CONSTRUCTING their frame
  * (connected components' per-round localCheckpoints, the index-absorb
  * loop) hide their cost outside that plan. This runs the whole query —
  * construction and final drive — under
  * [[graft.plans.PlanMetrics.measureJobs]] and prints one line per Spark
  * job: the driver-set job description (`cc:edges`, `cc:round2:jump`, …),
  * task count, wall ms, shuffle-write MB, spill MB. The "WHICH action
  * pays" answer for multi-action queries.
  *
  * Usage: `jrun.sh graft.JobProfile <query> <sfDir>`; env knobs match
  * Bench (`SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SHUFFLE`).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println("usage: JobProfile <query> [sfDir]"); sys.exit(2)
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.catalog.find(_.name == name).getOrElse {
      System.err.println(s"no catalog query named '$name'"); sys.exit(2)
    }
    // optional rep count (3rd arg): at sf0.1 a COLD single run bills JIT/
    // codegen warmup to whichever jobs run first — with reps>1 the table
    // below is the LAST (warm) run's, matching what Bench's best-of-N
    // minima actually measure
    val reps = args.lift(2).map(_.toInt).getOrElse(1).max(1)
    var rows = 0L
    var jobs: Seq[graft.plans.PlanMetrics.JobBytes] = Nil
    var secs = 0.0
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      val (r, j) = graft.plans.PlanMetrics.measureJobs(spark) {
        // construction (where iterative queries do their work) AND the
        // final drive both happen inside the measured body
        q.run(spark, sfDir).queryExecution.executedPlan.execute().count()
      }
      rows = r; jobs = j
      secs = (System.nanoTime() - t0) / 1e9
    }
    println(f"query=$name rows=$rows wall=$secs%.2fs jobs=${jobs.size}")
    println(f"${"job"}%5s  ${"desc"}%-28s ${"tasks"}%6s ${"wall_s"}%8s ${"shuffle_mb"}%11s ${"spill_mb"}%9s")
    jobs.foreach { j =>
      val d = if (j.desc.length > 28) j.desc.take(27) + "…" else j.desc
      println(f"${j.jobId}%5d  $d%-28s ${j.tasks}%6d ${j.wallMs / 1000.0}%8.1f " +
        f"${j.bytes.shuffleWrite / 1048576.0}%11.0f ${j.bytes.spill / 1048576.0}%9.0f")
    }
    val tot = jobs.map(_.bytes).foldLeft(graft.plans.PlanMetrics.Bytes(0, 0))(_ + _)
    println(f"total shuffle_mb=${tot.shuffleWrite / 1048576.0}%.0f spill_mb=${tot.spill / 1048576.0}%.0f")
    spark.stop()
  }
}
