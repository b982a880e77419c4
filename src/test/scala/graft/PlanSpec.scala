package graft

/** Plan-property regressions: the perf claims in PERF.md, enforced. A
  * change that turns a broadcast into a shuffled join, drops a pushdown,
  * or introduces a sort into a scale plan fails here, not in the next
  * benchmark. Plans are inspected at sf0.001 (shape, not size). */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.catalog.find(_.name == name).get
      .run(spark, d).queryExecution.executedPlan.toString

  test("filters and projections reach the parquet scan") {
    val p = plan("filter_null")
    assert(p.contains("PushedFilters: [IsNotNull(event_type)"))
    assert(!p.contains("Exchange"))
  }

  test("small-side joins broadcast") {
    assert(plan("lookup_join").contains("BroadcastHashJoin"))
    assert(plan("enrich_left").contains("BroadcastHashJoin"))
    assert(plan("leftover_anti").contains("BroadcastHashJoin"))
  }

  test("limits compile to TakeOrderedAndProject, never a global sort") {
    assert(plan("limit_players").contains("TakeOrderedAndProject"))
    assert(plan("topk_rank").contains("TakeOrderedAndProject"))
    assert(!plan("topk_rank").contains("Exchange"))
  }

  test("scale plans of large-output queries carry NO oracle sort") {
    for (q <- Seq("dedup", "enrich_match", "exists_semi", "explode_words",
        "doc_dedup", "minhash_bands"))
      assert(!plan(q).contains("Sort "), s"$q has a sort in its scale plan")
  }

  test("narrow ETL queries stay exchange-free") {
    for (q <- Seq("flatten", "flatten_perks", "explode_participants",
        "explode_events", "explode_map", "rename_prefix", "text_stats",
        "doc_fingerprint", "frame_sample", "route_file"))
      assert(!plan(q).contains("Exchange"), s"$q shuffles unexpectedly")
  }

  test("as-of joins once-shuffled; range join equi-joins on the bucket id") {
    val asof = plan("asof_join")
    assert("Exchange hashpartitioning".r.findAllIn(asof).length <= 2) // union sides co-shuffled
    assert(!asof.contains("CartesianProduct") && !asof.contains("BroadcastNestedLoopJoin"))
    val range = plan("range_join")
    assert(range.contains("_bucket")) // the non-equi predicate rides an equi-join
    assert(!range.contains("CartesianProduct"))
  }

  test("aggregations partial-aggregate before their single exchange") {
    for (q <- Seq("q1_agg", "census_by_queue", "window_tumbling", "simhash")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, s"$q exchanges")
      assert(p.contains("partial"), s"$q lacks partial aggregation")
    }
  }
}
