package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

object Smoke {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show()
    println("rows=" + df.count())
    spark.stop()
  }
}
