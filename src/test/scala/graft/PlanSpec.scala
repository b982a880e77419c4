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

  test("similarity kernels run the native scaled_dot inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val p = plan("knn_cosine")
    assert(p.contains("scaled_dot"), "knn_cosine no longer uses the native expression")
    // the HOF chain it replaced would surface as aggregate(zip_with(...))
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "interpreted HOF chain crept back into the similarity kernel")
    // the projection computing the similarity is inside a codegen span
    val df = graft.sources.Tables.embeddings(spark, d)
      .select(graft.operators.Vectors
        .dotScaled(col("embedding"), col("embedding")).as("n2"))
    val exec = df.queryExecution.executedPlan.toString
    // "*(n) Project [scaled_dot(...)" — the * prefix IS the
    // WholeStageCodegen marker in executedPlan.toString
    assert("""\*\(\d+\) Project \[scaled_dot""".r.findFirstIn(exec).isDefined,
      s"scaled_dot projection fell out of codegen:\n$exec")
  }

  test("training_prep: every join hash-based, no cartesian anywhere in the chain") {
    val p = plan("training_prep")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the composed prep chain grew a cartesian/nested-loop join")
    // the near-dup drop is a broadcast anti-join against the cluster
    // labeling (the LSH pairing + connected components run inside the
    // checkpointed Components subgraph, so they are not in THIS plan —
    // the pairing shape itself is pinned below on minhash_pairs)
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      "canonical-keep drop is not a broadcast anti-join")
    assert(plan("minhash_pairs").contains("collect_set"),
      "bucket-group pairing shape lost")
  }

  test("train_split is a pure narrow map; pivot has one exchange, no domain scan") {
    val split = plan("train_split")
    assert(!split.contains("Exchange"), "train_split gained a shuffle")
    val pivot = plan("pivot_census")
    // explicit value list ⇒ ONE scan of orders (domain discovery would add
    // a second scan + a driver collect). Spark compiles pivot as two-phase
    // aggregation — (group, pivot) agg, then pivot agg — so two exchanges
    // are the operator's standard shape; the second carries group rows only
    assert("Exchange hashpartitioning".r.findAllIn(pivot).length <= 2)
    assert("Scan parquet".r.findAllIn(pivot).length == 1, "pivot re-scans for its domain")
    val delta = plan("event_delta")
    assert("Exchange hashpartitioning".r.findAllIn(delta).length == 1)
  }

  test("two-phase scans: no row-level window spans a whole source") {
    // VERDICT r06 findings 2/3: a Window partitioned by `source` alone and
    // ordered by doc_id is a sequential per-source prefix scan on ONE task.
    // The rewritten plans may only order doc_id inside a (source, seg)
    // partition; the per-source-only window must order over the SEGMENT
    // frame (post-aggregation, #segments rows).
    for (q <- Seq("per_source_cap", "pack_sequences")) {
      val p = plan(q)
      assert("""windowspecdefinition\(source#\d+, doc_id#\d+L? ASC""".r
        .findFirstIn(p).isEmpty,
        s"$q regressed to a whole-source row-level window")
      assert("""windowspecdefinition\(source#\d+, seg#\d+L?, doc_id#\d+L? ASC""".r
        .findFirstIn(p).isDefined,
        s"$q lost its segment-bounded row-level window:\n$p")
      assert("""windowspecdefinition\(source#\d+, seg#\d+L? ASC""".r
        .findFirstIn(p).isDefined,
        s"$q lost its segment-frame offset window:\n$p")
    }
  }

  test("media_knn: query side broadcasts; no cartesian; scaled_dot stays native") {
    val p = plan("media_knn")
    // the ≠ join predicate forces a nested loop — acceptable ONLY because
    // the build side is the bounded query set (k rows), which must be the
    // broadcast side; an unbroadcast nested loop here would be a cartesian
    // over the corpus
    assert(p.contains("BroadcastNestedLoopJoin"), "query side lost its broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("scaled_dot"), "similarity kernel fell back off the native expression")
  }

  test("corpus_dedup_probe: one broadcast anti-join against the labeling artifact") {
    val p = plan("corpus_dedup_probe")
    assert(p.contains("graft_cc_"), "probe is not reading the persisted labeling")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "canonical-keep filter is not a broadcast anti-join")
    // the corpus side must not shuffle: drop list broadcasts, body stays put
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus body crosses a shuffle in the probe plan")
  }

  test("curation: narrow rows stay exchange-free; decontamination broadcasts") {
    // quality gate / scrub / mix are pure codegen'd maps — zero shuffle
    for (q <- Seq("gopher_filter", "pii_scrub", "domain_mix"))
      assert(!plan(q).contains("Exchange"), s"$q shuffles unexpectedly")
    // the benchmark gram set broadcasts; the corpus side never shuffles
    // for the probe (the only hash exchange is the per-doc hit count)
    val dec = plan("decontaminate")
    assert(dec.contains("BroadcastHashJoin"), "benchmark grams lost their broadcast")
    assert(!dec.contains("SortMergeJoin") && !dec.contains("CartesianProduct"))
    // composed funnel keeps the same discipline end to end
    val prep = plan("curate_prep")
    assert(prep.contains("BroadcastHashJoin") && prep.contains("LeftAnti"),
      "contaminated-id set is not a broadcast anti-join")
    assert(!prep.contains("SortMergeJoin") && !prep.contains("CartesianProduct"))
    // repetition needs term frequencies: hash aggregates with map-side
    // partial agg on the high-cardinality (doc, token) keys — no window
    val rep = plan("repetition_profile")
    assert(rep.contains("partial"), "repetition_profile lacks partial aggregation")
    assert(!rep.contains("Window"), "repetition_profile uses a window")
  }

  test("curriculum_order: range-partitioned two-phase rank, no global window") {
    val p = plan("curriculum_order")
    assert(p.contains("rangepartitioning"), "lost the distributed range sort")
    // every row_number window must be partition-local (keyed on _pid);
    // a global window would read "Window [...], [n_words ...]" with no
    // partition spec and funnel the corpus through one reducer
    val rowNumberWindows = "Window \\[row_number\\(\\)[^\\n]*".r.findAllIn(p).toSeq
    assert(rowNumberWindows.nonEmpty)
    assert(rowNumberWindows.forall(_.contains("_pid")),
      s"global row_number window found: ${rowNumberWindows.mkString("; ")}")
  }

  test("ivf_probe reads the persisted index; only ivf_knn pays the build") {
    // probe plan: scans the index parquet (centroids + assignments) and
    // never recomputes the corpus assignment (no posexplode/Lloyd stage)
    val probe = plan("ivf_probe")
    assert(probe.contains("graft_ivf_"), "probe is not reading the persisted index")
    assert(!probe.contains("posexplode"),
      "probe plan contains the centroid-mean build stage")
    val build = plan("ivf_knn")
    assert(build.contains("posexplode"), "ivf_knn lost its build stage (fixture drift?)")
  }
}
