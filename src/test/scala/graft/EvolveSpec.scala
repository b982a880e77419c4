package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import graft.operators.Evolve

/** Schema evolution semantics (`Utils/sql.py:5-69` parity, K4). */
class EvolveSpec extends SparkSpec {
  import spark.implicits._

  test("widen: INT⊔BIGINT=BIGINT, numeric⊔floating=DOUBLE, mixed=STRING") {
    assert(Evolve.widen(IntegerType, LongType) == LongType)
    assert(Evolve.widen(IntegerType, DoubleType) == DoubleType)
    assert(Evolve.widen(LongType, DoubleType) == DoubleType)
    assert(Evolve.widen(IntegerType, StringType) == StringType) // Error503 case
    assert(Evolve.widen(BooleanType, IntegerType) == StringType)
    assert(Evolve.widen(NullType, LongType) == LongType)
  }

  test("unionEvolve keeps first-seen column order, widens, null-pads — and keeps the introducing batch's values") {
    val b1 = Seq((1, "a")).toDF("id", "name")                  // id: int
    val b2 = Seq((2L, "b", 9.5)).toDF("id", "name", "score")   // id: long, new col
    val out = Evolve.unionEvolve(Seq(b1, b2)).orderBy("id")
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    // divergence from the reference quirk: batch-2's score survives in
    // batch 2's own rows (the reference drops it until the NEXT batch)
    assert(out.collect().toSeq == Seq(Row(1L, "a", null), Row(2L, "b", 9.5)))
  }

  test("widen is commutative and associative — batch arrival order never changes the merged schema") {
    val types = Seq(IntegerType, LongType, DoubleType, StringType,
      BooleanType, NullType, TimestampType, DateType)
    for (a <- types; b <- types) {
      assert(Evolve.widen(a, b) == Evolve.widen(b, a), s"comm: $a,$b")
      for (c <- types)
        assert(Evolve.widen(Evolve.widen(a, b), c) == Evolve.widen(a, Evolve.widen(b, c)),
          s"assoc: $a,$b,$c")
    }
  }

  test("DDL emission follows the reference type table") {
    assert(Evolve.toDdlType(IntegerType) == "INT")
    assert(Evolve.toDdlType(LongType) == "BIGINT")
    assert(Evolve.toDdlType(DoubleType) == "DECIMAL(10,2)")
    assert(Evolve.toDdlType(BooleanType) == "BOOLEAN")
    assert(Evolve.toDdlType(StringType) == "VARCHAR(255)")
    assert(Evolve.toDdlType(NullType) == "TEXT")
    val existing = StructType(Seq(StructField("id", LongType)))
    val incoming = StructType(Seq(StructField("id", LongType),
      StructField("kda", DoubleType), StructField("win", BooleanType)))
    assert(Evolve.alterStatements("player_data", existing, incoming) == Seq(
      "ALTER TABLE player_data ADD COLUMN `kda` DECIMAL(10,2)",
      "ALTER TABLE player_data ADD COLUMN `win` BOOLEAN"))
  }

  test("align: binds by the batch's EXACT name case-insensitively; case collisions fail fast") {
    // a Derby read-back reports "K" for a batch column "k" — align must bind
    // the batch's column by its own exact name, not the target's case
    val folded = spark.range(1).select(lit(5L).as("k"))
    val target = StructType(Seq(StructField("K", LongType)))
    val out = Evolve.align(folded, target)
    assert(out.columns.toSeq == Seq("K") && out.head().getLong(0) == 5L)
    // two batch columns differing only in case cannot align unambiguously
    val colliding = spark.range(1).select(lit(1).as("a"), lit(2).as("A"))
    val ex = intercept[IllegalArgumentException] {
      Evolve.align(colliding, StructType(Seq(StructField("a", IntegerType))))
    }
    assert(ex.getMessage.contains("differing only in case"))
  }

  test("mixed-type error sentinels (api.py:228-239) reconcile to STRING columns") {
    val df = readLol("errors.json")
    // championLevel holds 7 and "Error503" → json inference lands STRING
    assert(df.schema("championLevel").dataType == StringType)
    val errs = df.filter($"championLevel".startsWith("Error"))
    assert(errs.count() == 2)
  }
}
