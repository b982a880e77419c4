package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Dev tool: print a catalog query's formatted physical plan (the
  * `.explain("formatted")` audit PERF.md's per-round plan reviews are
  * built from) without spark-shell ceremony.
  *
  * Usage: `runMain graft.Explain <queryName> [sfDir]` — defaults to
  * sf0.001 (plan SHAPE is scale-independent; PlanSpec pins the claims
  * that matter, this is for eyes). `all` lists catalog names.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    if (name == "all") {
      SparkEntry.catalog.foreach(q => println(q.name))
      return
    }
    val b = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = SparkEntry.catalog.find(_.name == name).getOrElse {
      System.err.println(s"no catalog query named '$name' (try: runMain graft.Explain all)")
      sys.exit(2)
    }
    q.run(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
