package graft

import java.nio.file.Files

/** The regression-gate reader: prior-round BENCH files are driver
  * artifacts (stdout wrapped in a 2000-char `tail`), so the reader must
  * skip head-truncated files, drop errored (-1) entries, and fall back
  * through history rather than self-compare against garbage. */
class BenchSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def write(dir: String, round: Int, tail: String): Unit =
    Files.writeString(java.nio.file.Paths.get(s"$dir/BENCH_r0$round.json"),
      s"""{"n":1,"rc":0,"tail":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.JString(tail))}}""")

  test("newest PARSEABLE round wins; head-truncated files are skipped") {
    val dir = Files.createTempDirectory("graft_bench_hist").toString
    write(dir, 3, """{"metric":"total","value":1,"unit":"sec","queries":{"a":1.5,"b":0.2}}""" + "\n[success]")
    // round 4's line lost its head to the 2000-char capture — unparseable
    write(dir, 4, """b":0.3,"c":9.9},"sf":"x"}""" + "\n[success]")
    val Some((round, qs)) = Bench.previousBench(dir)
    assert(round == 3 && qs == Map("a" -> 1.5, "b" -> 0.2))
  }

  test("errored queries (negative seconds) are dropped from the baseline") {
    val dir = Files.createTempDirectory("graft_bench_hist").toString
    write(dir, 5, """{"metric":"total","value":1,"unit":"sec","queries":{"ok":0.4,"boom":-1.0}}""")
    val Some((_, qs)) = Bench.previousBench(dir)
    assert(qs == Map("ok" -> 0.4))
  }

  test("short total-only closing line is skipped; per-query line above it wins") {
    val dir = Files.createTempDirectory("graft_bench_hist").toString
    write(dir, 6,
      """{"metric":"total","value":2,"unit":"sec","queries":{"a":1.5,"b":0.2},"sf":"x"}""" + "\n" +
      """{"metric":"total","value":2,"unit":"sec","detail":"bench_full.json","sf":"x"}""" + "\n[success]")
    val Some((round, qs)) = Bench.previousBench(dir)
    assert(round == 6 && qs == Map("a" -> 1.5, "b" -> 0.2))
    // a file where ONLY the short line survived (per-query head truncated)
    // yields no queries map and falls back to an older parseable round
    write(dir, 7,
      """b":0.3},"sf":"x"}""" + "\n" +
      """{"metric":"total","value":9,"unit":"sec","detail":"bench_full.json","sf":"x"}""")
    val Some((r2, qs2)) = Bench.previousBench(dir)
    assert(r2 == 6 && qs2 == Map("a" -> 1.5, "b" -> 0.2))
  }

  test("previousFull: matching-sf bench_full wins with calib; subset and other-sf are refused") {
    val dir = Files.createTempDirectory("graft_bench_full").toString
    def put(json: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/bench_full.json"), json)
    put("""{"metric":"total","value":2,"calib_sec":0.1,"queries":{"a":1.234,"bad":-1.0},"sf":"/sf/x"}""")
    assert(Bench.previousFull(dir, "/sf/x")
      == Some((Map("a" -> 1.234), Some(0.1))))
    assert(Bench.previousFull(dir, "/sf/OTHER").isEmpty, "sf mismatch must refuse")
    put("""{"metric":"total","value":2,"queries":{"a":1.0},"subset":"3 of 109","sf":"/sf/x"}""")
    assert(Bench.previousFull(dir, "/sf/x").isEmpty, "subset record must refuse")
    put("""{"metric":"total","value":2,"queries":{"a":2.5},"sf":"/sf/x"}""")
    assert(Bench.previousFull(dir, "/sf/x") == Some((Map("a" -> 2.5), None)),
      "calib-less history is usable, just unnormalized")
    assert(Bench.previousFull(
      Files.createTempDirectory("graft_bench_none").toString, "/sf/x").isEmpty)
  }

  test("sbt [info] prefixes and bare-line files are tolerated; empty dir is None") {
    val dir = Files.createTempDirectory("graft_bench_hist").toString
    write(dir, 2, """[info] {"metric":"total","value":1,"unit":"sec","queries":{"q":2.0}}""")
    val Some((r, qs)) = Bench.previousBench(dir)
    assert(r == 2 && qs("q") == 2.0)
    assert(Bench.previousBench(Files.createTempDirectory("graft_empty").toString).isEmpty)
  }

  test("sf filter: other-sf lines are skipped, absent/truncated sf is accepted") {
    val dir = Files.createTempDirectory("graft_bench_sf").toString
    write(dir, 8, """{"metric":"total","value":1,"unit":"sec","queries":{"a":1.0},"sf":"/sf/big"}""")
    // a local iteration at a different SF must not gate against it
    assert(Bench.previousBench(dir, Some("/sf/small")).isEmpty)
    assert(Bench.previousBench(dir, Some("/sf/big")).map(_._2) == Some(Map("a" -> 1.0)))
    // head-truncated lines lose the LEADING fields, never the trailing
    // sf — but a line with no sf at all (older format) still counts
    write(dir, 9, """{"metric":"total","value":1,"unit":"sec","queries":{"b":2.0}}""")
    assert(Bench.previousBench(dir, Some("/sf/anything")).map(_._2) == Some(Map("b" -> 2.0)))
  }

  test("contract line (r21): ascending order, trailing value/sf, mixed-precision fallback") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // short catalog: full 2-decimal precision, queries sorted ascending
    val short = Bench.contractLine(
      Seq(("slow", 2.345), ("fast", 0.123), ("mid", 1.0)), 3.47, "f.json", "/sf/x")
    assert(short.indexOf("\"fast\"") < short.indexOf("\"mid\"") &&
      short.indexOf("\"mid\"") < short.indexOf("\"slow\""), "ascending by seconds")
    assert(short.indexOf("\"queries\"") < short.indexOf("\"value\""),
      "value/sf must trail the map so they survive head-truncation")
    val j = JsonMethods.parse(short)
    assert((j \ "queries" \ "slow") == JDouble(2.35) &&
      (j \ "value") == JDouble(3.47) && (j \ "sf") == JString("/sf/x"))
    // catalog-sized map: the fallback must keep >=1-decimal precision on
    // sub-10s rows (the PERF_r20 integer-blindness fix), integers >=10s
    val many = (1 to 120).map(i => (f"query_name_number_$i%03d", i * 0.1))
    val long = Bench.contractLine(many, 726.0, "f.json", "/sf/x")
    val jq = JsonMethods.parse(long) \ "queries"
    assert((jq \ "query_name_number_012") == JDouble(1.2), "1-decimal below 10s")
    assert((jq \ "query_name_number_115") == JInt(12) ||
      (jq \ "query_name_number_115") == JDouble(12), "integer at >=10s")
    assert((jq \ "query_name_number_010") == JInt(1) ||
      (jq \ "query_name_number_010") == JDouble(1), "whole values trimmed of .0")
    // and the line is what previousBench reads back
    val dir = Files.createTempDirectory("graft_bench_line").toString
    write(dir, 9, long)
    val Some((_, qs)) = Bench.previousBench(dir, Some("/sf/x"))
    assert(qs("query_name_number_012") == 1.2 && qs.size == 120)
  }

  test("sf-less records must share half their query names with the catalog") {
    val dir = Files.createTempDirectory("graft_bench_known").toString
    write(dir, 9, """{"metric":"total","value":1,"unit":"sec","queries":{"b":2.0,"c":3.0}}""")
    // no knownQueries → accepted (back-compat); disjoint catalog → refused
    assert(Bench.previousBench(dir, Some("/sf/x")).isDefined)
    assert(Bench.previousBench(dir, Some("/sf/x"), Set("z1", "z2")).isEmpty,
      "an sf-less record from a foreign catalog must not gate")
    // half-overlap (catalog evolves between rounds) → accepted
    assert(Bench.previousBench(dir, Some("/sf/x"), Set("b", "z"))
      .map(_._2) == Some(Map("b" -> 2.0, "c" -> 3.0)))
    // a record WITH a matching sf is never name-checked
    write(dir, 9, """{"metric":"total","value":1,"unit":"sec","queries":{"b":2.0},"sf":"/sf/x"}""")
    assert(Bench.previousBench(dir, Some("/sf/x"), Set("zz")).isDefined)
  }
}
