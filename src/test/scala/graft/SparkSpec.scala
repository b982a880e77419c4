package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def fixture(name: String): String =
    getClass.getResource(s"/lol/$name").toString
}

abstract class SparkSpec extends AnyFunSuite {
  // Per-suite cache hygiene (ADVICE r20 #2): suites share one JVM, and a
  // suite that rewrites a fixture/table path must not leak its schema or
  // row-count memo into the next suite — clear both per-JVM caches at
  // suite construction so the invalidation seam is exercised for real.
  graft.sources.Tables.invalidateSchemas()
  graft.operators.AnnGeometry.invalidateCounts()

  lazy val spark: SparkSession = TestSpark.spark

  def readLol(name: String): DataFrame =
    spark.read.option("multiLine", true).json(TestSpark.fixture(name))
}
