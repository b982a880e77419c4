package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.{Curate, TextOps}
import graft.sources.Tables

/** Corpus-curation catalog rows (builder brief: quality scoring, text
  * analysis, dedup-adjacent curation as first-class engine components):
  * Gopher-style quality gates, repetition profiling, benchmark
  * decontamination, domain-mixture sampling, PII scrubbing. All over
  * `documents`, all DuckDB-oracle-gated. Operator logic lives in
  * [[graft.operators.Curate]]; these wrappers bind it to the fixture
  * tables and carry the oracle twins.
  */
object Curation {

  private val P = TextOps.P

  /** Gopher-rule quality gate (Rae et al. 2021 §A1.1): word-count bounds,
    * mean-word-length bounds, distinct-stopword floor — each rule
    * surfaced as its own column (the reject-reason histogram is the
    * first data-quality question), plus the conjunction. Pure narrow
    * codegen'd map — zero shuffle at any scale. */
  val gopherFilter = Q("gopher_filter", (s, d) => {
    import s.implicits._
    val cols = Curate.gopherRules(TextOps.tokens($"text"))
      .map { case (n, c) => c.as(n) }
    Tables.documents(s, d).select($"doc_id" +: cols: _*)
  }, Some {
    val en = TextOps.stopwords.head._2
    val nStop = en.map(w => s"CAST(list_contains(w, '$w') AS INTEGER)").mkString(" + ")
    s"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    s AS (SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_words,
        CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len,
        $nStop AS n_stop_distinct
      FROM t)
    SELECT doc_id, n_words, mean_word_len, n_stop_distinct,
      (n_words >= ${Curate.MinWords} AND n_words <= ${Curate.MaxWords}) AS r_len,
      (mean_word_len >= ${Curate.MinMeanWordLen} AND mean_word_len <= ${Curate.MaxMeanWordLen}) AS r_wordlen,
      (n_stop_distinct >= ${Curate.MinDistinctStopwords}) AS r_stop,
      ((n_words >= ${Curate.MinWords} AND n_words <= ${Curate.MaxWords})
        AND (mean_word_len >= ${Curate.MinMeanWordLen} AND mean_word_len <= ${Curate.MaxMeanWordLen})
        AND (n_stop_distinct >= ${Curate.MinDistinctStopwords})) AS "keep"
    FROM s ORDER BY doc_id"""
  },
    sortCols = Seq("doc_id"))

  /** Repetition profile (Gopher repetition filters): distinct-word ratio
    * + top-word / top-bigram shares via explode + two-level HashAggregate
    * on high-cardinality (doc, token) keys — the scale-safe shape for
    * per-doc term frequencies (see [[Curate.repetitionProfile]]). */
  val repetitionProfile = Q("repetition_profile", (s, d) =>
    Curate.repetitionProfile(Tables.documents(s, d), "doc_id", "text"),
    Some("""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    u AS (SELECT doc_id, unnest(w) AS word FROM t),
    wc AS (SELECT doc_id, word, count(*) AS c FROM u GROUP BY 1, 2),
    wa AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_word_c
      FROM wc GROUP BY 1),
    g AS (SELECT doc_id, CASE WHEN len(w) >= 2
        THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        ELSE [array_to_string(w, ' ')] END AS grams FROM t),
    gu AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM gu GROUP BY 1, 2),
    ga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        CAST(max(c) AS BIGINT) AS top_gram_c
      FROM gc GROUP BY 1)
    SELECT wa.doc_id, n_words, n_distinct,
      CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
      CAST(top_word_c AS DOUBLE) / n_words AS top_word_share,
      CAST(top_gram_c AS DOUBLE) / n_grams AS top_gram_share
    FROM wa JOIN ga USING (doc_id) ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Benchmark-set membership for the decontamination row: every 50th
    * doc stands in for the eval suite (10 docs at sf0.01). */
  val BenchMod = 50L

  /** Benchmark decontamination (GPT-3 appendix C shape, 5-grams scaled
    * to the fixture): flag corpus docs sharing any 5-gram with the
    * benchmark set. Corpus grams probe a BROADCAST distinct benchmark
    * gram set — the 100 TB side never shuffles for the probe. */
  val decontaminate = Q("decontaminate", (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    Curate.decontaminate(
      docs.filter($"doc_id" % BenchMod =!= 0),
      docs.filter($"doc_id" % BenchMod === 0),
      "doc_id", "text")
  }, Some {
    val n = Curate.ContamGramN
    val gram = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    g AS (SELECT doc_id, CASE WHEN len(w) >= $n
        THEN list_transform(range(1, len(w) - ${n - 2}), i -> $gram)
        ELSE [array_to_string(w, ' ')] END AS grams FROM t),
    gu AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    bench AS (SELECT DISTINCT gram FROM gu WHERE doc_id % $BenchMod = 0),
    corp AS (SELECT doc_id, gram FROM gu WHERE doc_id % $BenchMod <> 0),
    hits AS (SELECT doc_id, count(DISTINCT gram) AS n_hits
      FROM corp JOIN bench USING (gram) GROUP BY 1)
    SELECT d.doc_id, COALESCE(n_hits, 0) AS n_hits,
      COALESCE(n_hits, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % $BenchMod <> 0) d
    LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id"""
  },
    sortCols = Seq("doc_id"))

  /** Domain-mixture sampling: deterministic hash-mod downsampling to a
    * per-source target rate (src0 → 100% … src19 → 24%), carrying the
    * inverse-propensity weight. Narrow map, no RNG state, reproducible
    * engine-to-engine — same portable-hash design as train_split. */
  /** The linear rate formula assumes source indices 0..24; a drifted
    * fixture (more sources, or one without trailing digits → null rate)
    * is caught LOUDLY by [[FixtureGuards.check]], which Verify and the
    * specs run once per session — never here in the builder, where the
    * min/max pass would re-scan the corpus on every invocation (VERDICT
    * r07 finding 4). */
  private[queries] def mixRatePct: Column = lit(100) -
    regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") * 4

  val domainMix = Q("domain_mix", (s, d) => {
    import s.implicits._
    Curate.domainMix(Tables.documents(s, d), "doc_id", mixRatePct)
      .select($"doc_id", $"source", $"rate_pct", $"weight")
  }, Some(s"""
    WITH r AS (SELECT doc_id, source,
        100 - 4 * CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INTEGER) AS rate_pct,
        ${hash60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents)
    SELECT doc_id, source, rate_pct,
      CAST(100 AS DOUBLE) / rate_pct AS weight
    FROM r WHERE bucket < rate_pct ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** PII scrubbing: the fixture corpus carries no PII (verified: zero
    * digits or punctuation), so the row stamps a deterministic synthetic
    * email + phone per doc and then scrubs it — pinning the Java-regex /
    * RE2 parity of the patterns end-to-end (match counts audited BEFORE
    * replacement). Pure codegen'd regexp expressions, zero shuffle. */
  val piiScrub = Q("pii_scrub", (s, d) => {
    import s.implicits._
    val stamped = concat($"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod($"doc_id", lit(10000L)).cast("string"), 4, "0"))
    val cols = Curate.scrubPii(stamped).map { case (n, c) => c.as(n) }
    Tables.documents(s, d).select($"doc_id" +: cols: _*)
  }, Some(s"""
    WITH t AS (SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com or +1-555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS stamped
      FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(stamped, '${Curate.EmailRe}')) AS INTEGER) AS n_emails,
      CAST(len(regexp_extract_all(stamped, '${Curate.PhoneRe}')) AS INTEGER) AS n_phones,
      regexp_replace(regexp_replace(stamped, '${Curate.EmailRe}', '<EMAIL>', 'g'),
                     '${Curate.PhoneRe}', '<PHONE>', 'g') AS clean
    FROM t ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Oracle plumbing shared with [[StreamingOps]]' streaming curation
    * twin: the per-doc quality-stat CTEs and the keep predicate, over
    * `documents`. */
  private[queries] def gopherStatsCtes: String = {
    val en = TextOps.stopwords.head._2
    val nStop = en.map(w => s"CAST(list_contains(w, '$w') AS INTEGER)").mkString(" + ")
    s"""
    t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    s AS (SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_words,
        CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len,
        $nStop AS n_stop_distinct
      FROM t)"""
  }

  private[queries] def gopherKeepSql: String =
    s"""n_words >= ${Curate.MinWords} AND n_words <= ${Curate.MaxWords}
      AND mean_word_len >= ${Curate.MinMeanWordLen} AND mean_word_len <= ${Curate.MaxMeanWordLen}
      AND n_stop_distinct >= ${Curate.MinDistinctStopwords}"""

  /** Shared oracle CTE chain for the composed funnel rows: gopher flags,
    * benchmark/corpus 5-gram split, contaminated-id set, mix buckets. */
  private def funnelCtes: String = {
    val en = TextOps.stopwords.head._2
    val nStop = en.map(w => s"CAST(list_contains(w, '$w') AS INTEGER)").mkString(" + ")
    val n = Curate.ContamGramN
    val gram = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""
    t AS (SELECT doc_id, source, string_split(trim(text), ' ') AS w FROM documents),
    q AS (SELECT doc_id FROM (SELECT doc_id,
        CAST(len(w) AS INTEGER) AS n_words,
        CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mwl,
        $nStop AS n_stop FROM t)
      WHERE n_words >= ${Curate.MinWords} AND n_words <= ${Curate.MaxWords}
        AND mwl >= ${Curate.MinMeanWordLen} AND mwl <= ${Curate.MaxMeanWordLen}
        AND n_stop >= ${Curate.MinDistinctStopwords}),
    g AS (SELECT doc_id, CASE WHEN len(w) >= $n
        THEN list_transform(range(1, len(w) - ${n - 2}), i -> $gram)
        ELSE [array_to_string(w, ' ')] END AS grams FROM t),
    gu AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    bench AS (SELECT DISTINCT gram FROM gu WHERE doc_id % $BenchMod = 0),
    contam AS (SELECT DISTINCT doc_id FROM gu
      WHERE doc_id % $BenchMod <> 0 AND gram IN (SELECT gram FROM bench)),
    r AS (SELECT doc_id, source,
        100 - 4 * CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INTEGER) AS rate_pct,
        ${hash60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents)"""
  }

  /** The composed curation funnel (training_prep's curation twin): corpus
    * docs (benchmark held out) → Gopher quality gate → decontamination →
    * domain-mixture sampling, emitting the surviving docs with their
    * mixture weights. Stage order is chosen for scale: the narrow quality
    * predicate runs FIRST (shrinking the gram-explode side of the
    * decontamination probe), the contaminated-id set broadcasts into an
    * anti-join, and the mix predicate is again narrow. One exchange
    * total (the per-doc hit count inside decontaminate) on the
    * high-cardinality doc key.
    *
    * The broadcast assumes contamination is rare (real-world benchmark
    * leakage is per-mille scale, and the set holds only 8-byte ids) —
    * and the assumption is ENFORCED, not documented
    * ([[Curate.boundedBroadcast]], VERDICT r07 item 7): past the
    * ceiling the hint drops and the same plan degrades to a shuffled
    * anti-join — semantics unchanged, CurationSpec pins both shapes. */
  val curatePrep = Q("curate_prep", (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val keep = Curate.gopherRules(TextOps.tokens($"text")).toMap.apply("keep")
    val quality = docs.filter($"doc_id" % BenchMod =!= 0).filter(keep)
    val contamIds = Curate.decontaminate(
        quality, docs.filter($"doc_id" % BenchMod === 0), "doc_id", "text")
      .filter($"contaminated").select($"doc_id")
    val clean = quality.join(Curate.boundedBroadcast(contamIds), Seq("doc_id"), "left_anti")
    val ratePct = lit(100) -
      regexp_extract($"source", "([0-9]+)$", 1).cast("int") * 4
    Curate.domainMix(clean, "doc_id", ratePct)
      .select($"doc_id", $"source", $"rate_pct", $"weight")
  }, Some(s"""
    WITH $funnelCtes
    SELECT r.doc_id, r.source, r.rate_pct,
      CAST(100 AS DOUBLE) / rate_pct AS weight
    FROM r
    JOIN q USING (doc_id)
    WHERE r.doc_id % $BenchMod <> 0
      AND r.doc_id NOT IN (SELECT doc_id FROM contam)
      AND bucket < rate_pct
    ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Funnel dashboard: one row of per-stage survivor counts (the
    * data-quality review's first table). Same plan as [[curatePrep]] but
    * collapsing to exact long counts — flags computed in ONE pass over
    * the corpus (the mix predicate is a column, not a join), so the whole
    * funnel audit is a single aggregate. */
  val curateFunnel = Q("curate_funnel", (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val keep = Curate.gopherRules(TextOps.tokens($"text")).toMap.apply("keep")
    val corpus = docs.filter($"doc_id" % BenchMod =!= 0)
      .withColumn("q", keep)
    val contamIds = Curate.decontaminate(
        corpus.filter($"q"), docs.filter($"doc_id" % BenchMod === 0),
        "doc_id", "text")
      .filter($"contaminated").select($"doc_id", lit(true).as("bad"))
    val ratePct = lit(100) -
      regexp_extract($"source", "([0-9]+)$", 1).cast("int") * 4
    val mixKeep = pmod(
      hash60(concat(lit("mix:"), $"doc_id".cast("string"))), lit(100L)) < ratePct
    corpus.join(Curate.boundedBroadcast(contamIds), Seq("doc_id"), "left")
      .select($"q", coalesce($"bad", lit(false)).as("bad"), mixKeep.as("m"))
      .agg(
        count(lit(1)).as("n_corpus"),
        sum($"q".cast("long")).as("n_quality"),
        sum(($"q" && !$"bad").cast("long")).as("n_clean"),
        sum(($"q" && !$"bad" && $"m").cast("long")).as("n_kept"))
  }, Some(s"""
    WITH $funnelCtes
    SELECT count(*) AS n_corpus,
      CAST(sum(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
      CAST(sum(CASE WHEN q.doc_id IS NOT NULL AND c.doc_id IS NULL
        THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
      CAST(sum(CASE WHEN q.doc_id IS NOT NULL AND c.doc_id IS NULL
        AND bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM r
    LEFT JOIN q ON r.doc_id = q.doc_id
    LEFT JOIN contam c ON r.doc_id = c.doc_id
    WHERE r.doc_id % $BenchMod <> 0"""))

  /** Curriculum ordering: a TOTAL rank over the corpus (shortest docs
    * first, doc_id tie-break) via [[Curate.globalRank]]'s two-phase
    * range-partitioned rank — the naive global window would drag the
    * whole corpus through one reducer; this shape keeps every window
    * partition-local (PlanSpec pins it). */
  val curriculumOrder = Q("curriculum_order", (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", size(TextOps.tokens($"text")).as("n_words"))
    Curate.globalRank(docs, "curriculum_rank", $"n_words".asc, $"doc_id".asc)
      .select($"doc_id", $"n_words", $"curriculum_rank")
  }, Some("""
    WITH t AS (SELECT doc_id,
        CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_words
      FROM documents)
    SELECT doc_id, n_words,
      row_number() OVER (ORDER BY n_words, doc_id) AS curriculum_rank
    FROM t ORDER BY doc_id"""),
    sortCols = Seq("doc_id"))

  /** Stratified eval sampling: exactly K docs per (source, lang)
    * stratum, ranked by a salted portable hash — the held-out-set
    * construction that needs every stratum represented regardless of
    * its share of the corpus (domain_mix keeps proportions; this pins
    * counts). Hash-ranked selection is deterministic and RNG-free like
    * train_split, and the heavy lifting reuses
    * [[graft.operators.Vectors.topKPerKey]] — partial per-partition
    * top-K heaps before the per-stratum window, so no reducer ever
    * sorts a whole stratum. */
  val evalSample = Q("eval_sample", (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"source", $"lang",
      hash60(concat(lit("eval:"), $"doc_id".cast("string"))).as("h"))
    graft.operators.Vectors
      .topKPerKey(docs, struct($"source", $"lang"), $"h", $"doc_id", 3)
      .select($"doc_id", $"source", $"lang", $"rank")
  }, Some(s"""
    WITH t AS (SELECT doc_id, source, lang,
        ${hash60Sql("'eval:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    r AS (SELECT doc_id, source, lang,
        CAST(row_number() OVER (PARTITION BY source, lang
          ORDER BY h DESC, doc_id) AS INTEGER) AS rank
      FROM t)
    SELECT doc_id, source, lang, rank FROM r WHERE rank <= 3
    ORDER BY source, lang, rank"""),
    sortCols = Seq("source", "lang", "rank"))

  val all: Seq[Q] = Seq(
    gopherFilter, repetitionProfile, decontaminate, domainMix, piiScrub,
    curatePrep, curateFunnel, curriculumOrder, evalSample)
}
