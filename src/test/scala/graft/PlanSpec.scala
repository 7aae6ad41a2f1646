package graft

/** Physical-plan audits: the properties that make these queries scale are
  * asserted, not hoped for. If an optimizer upgrade or a refactor loses a
  * pushdown/broadcast/TakeOrdered, these fail before any benchmark does.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 scan: filter pushed to parquet and columns pruned") {
    val p = plan("q2_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    // pruned read schema: the 4 selected columns only
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"), p)
  }

  test("q3 time-range filter reaches the scan") {
    val p = plan("q3_filter_eq_range")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,purchase)"), p)
  }

  test("q5 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q5_topk_desc")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("q7 dim lookup is a broadcast hash join") {
    val p = plan("q7_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1 aggregation is two-phase (map-side partial)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length >= 3, "expected partial+final HashAggregate\n" + p)
  }

  test("q13 five-way join broadcasts the dimension chain") {
    val p = plan("q13_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q9 semi join stays a join, not a distinct+inner rewrite") {
    val p = plan("q9_semi_join")
    assert(p.contains("LeftSemi"), p)
  }

  test("q11 explosion pipeline is shuffle-free (narrow scan->generate)") {
    val p = plan("q11_signal_explode")
    assert(!p.contains("Exchange"), "signal explosion must not shuffle\n" + p)
  }

  test("q50 ANN: corpus side never shuffles; query side broadcasts") {
    val p = plan("q50_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the only exchange allowed is the final per-query top-k window
    val exchanges = p.split("\n").count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 2, s"too many shuffles ($exchanges)\n" + p)
  }

  test("dedup family never degenerates to a cartesian product") {
    for (q <- Seq("q41_dedup_ngram_jaccard", "q42_dedup_minhash_lsh", "q43_dedup_simhash",
        "q61_dedup_fingerprint", "q62_ann_lsh", "q65_dedup_cascade", "q29_range_join")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went quadratic\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q uses a nested-loop join\n$p")
    }
  }

  test("custom hash expressions stay inside whole-stage codegen") {
    // A fused span prints as `*(n) Project [...simhashword(...)...]`; a
    // CodegenFallback expression would eject its projection from the span.
    // AQE's initial plan hides the codegen collapse, so audit with AQE off.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q43_dedup_simhash")
      val fused = p.split("\n").exists(l => l.contains("*(") && l.toLowerCase.contains("simhashword"))
      assert(fused, "SimHashWord fell out of whole-stage codegen\n" + p)
      // q41's declared plan no longer SHOWS the shingle stage (the
      // frequency-reordered set table is localCheckpointed, so consumers
      // read an RDD leaf — r18); the fusion property is pinned where the
      // expression actually executes, the shingle-set subtree's own plan.
      val p41 = graft.operators.Dedup
        .shingleSets(graft.queries.Tables.load(spark, sf, "documents"), "doc_id", "text", 3)
        .queryExecution.executedPlan.toString
      val fused41 = p41.split("\n").exists(l => l.contains("*(") && l.toLowerCase.contains("shinglehash"))
      assert(fused41, "ShingleHash32 fell out of whole-stage codegen\n" + p41)
      val p92 = plan("q92_dedup_substring")
      val fused92 = p92.split("\n").exists(l => l.contains("*(") && l.toLowerCase.contains("chargramhash"))
      assert(fused92, "CharGramHash32 fell out of whole-stage codegen\n" + p92)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q44 bucketed embedding near-dup: pair join is an equi-join, no cartesian") {
    val p = plan("q44_dedup_embedding")
    assert(!p.contains("CartesianProduct"), s"q44 went quadratic\n$p")
    // The only nested-loop joins allowed are the broadcast centroid
    // assignments (corpus × 16 centroids, the a and b subtrees of the
    // self-join); the PAIR join itself must be an equi-join on the list id.
    val bnlj = p.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"q44 has $bnlj nested-loop joins — pair join degenerated\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"q44 pair join is not an equi-join\n$p")
  }

  test("q204 semantic decontamination: train x test candidates are co-bucketed, no cartesian") {
    val p = plan("q204_semantic_decontam")
    assert(!p.contains("CartesianProduct"), s"q204 went quadratic\n$p")
    // same shape contract as q44: nested loops only for the broadcast
    // centroid assignment; the cross-set candidate join is an equi-join
    // on the bucket id, never |train| x |test|
    val bnlj = p.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"q204 has $bnlj nested-loop joins — candidate join degenerated\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"q204 candidate join is not an equi-join\n$p")
  }

  test("as-of join is join-free: union + window only") {
    val p = plan("q20_asof_join")
    assert(!p.contains("Join"), "as-of must compose via union+window, not a join\n" + p)
    assert(p.contains("Window"), p)
  }

  test("q54 TPC-H Q3 shape: filtered dims broadcast, top-10 is TakeOrdered") {
    val p = plan("q54_tpch_q3")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q27 salted aggregate runs two aggregation phases per stage") {
    val p = plan("q27_salted_agg")
    assert(p.split("HashAggregate").length >= 4, "expected partial+final for both phases\n" + p)
  }

  test("q59 versioned dispatch is shuffle-free (narrow scan->project->generate)") {
    val p = plan("q59_versioned_dispatch")
    assert(!p.contains("Exchange"), "per-doc dispatch must not shuffle\n" + p)
  }

  test("q39 null-safe join routes the null slice through a broadcast") {
    val p = plan("q39_null_safe_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "null slice must broadcast, not hash to one reducer\n" + p)
  }

  test("q101 semantic dedup: pair join is an equi-join; only the centroid assignment broadcasts") {
    val p = plan("q101_dedup_semantic")
    assert(!p.contains("CartesianProduct"), s"q101 went quadratic\n$p")
    // corpus × 16 centroids on each self-join side is the only allowed
    // nested-loop; the within-list pair join must stay an equi-join
    val bnlj = p.split("\n").count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"q101 has $bnlj nested-loop joins — pair join degenerated\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
      s"q101 pair join is not an equi-join\n$p")
  }

  test("q102/q103 are shuffle-free per-row passes") {
    Seq("q102_cdc_chunking", "q103_hash_split").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name must be a narrow per-row pass\n$p")
    }
  }

  test("q104 importance weights: feature-weight table broadcasts, nothing quadratic") {
    val p = plan("q104_importance_weights")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), s"q104 weight join must broadcast\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q104 top-50 must not globally sort\n$p")
  }

  test("q105 textrank: every PageRank round is an equi-join, never a cartesian") {
    val p = plan("q105_textrank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), s"q105 top-20 must not globally sort\n$p")
  }

  test("q106/q107/q108 time-series plans: broadcast dims, equi-joins, no cartesian") {
    for (name <- Seq("q106_gap_fill", "q107_mad_outliers", "q108_interval_join")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name went quadratic\n$p")
    }
    // the 5-row median/MAD dims must broadcast, not shuffle the events
    assert(plan("q107_mad_outliers").contains("BroadcastHashJoin"))
  }

  test("q109 is a single-aggregate plan; q110 profiles via the tall dictionary") {
    assert(!plan("q109_ewma").contains("Join"), "q109 must not join")
    // multi-distinct profiling: NO countDistinct Expand (which multiplies
    // every corpus row by #distinct-aggs); instead posexplode to the tall
    // (col, value) form, two-phase hash aggregate down to the per-column
    // value dictionaries, and ONE broadcast join of the 7-row stat panel
    val prof = plan("q110_profile")
    assert(!prof.contains("Expand"), s"q110 reverted to the Expand multi-distinct\n$prof")
    assert(prof.contains("Generate"), s"q110 lost the tall posexplode form\n$prof")
    assert(prof.contains("BroadcastHashJoin"),
      s"q110's panel/dictionary merge must broadcast\n$prof")
    assert(prof.split("\n").count(_.contains("Scan parquet")) <= 2,
      s"q110 must scan lineitem at most twice (tall pass + stat pass)\n$prof")
  }

  test("q107 medians never row_number the corpus: aggregates + grid windows only") {
    val p = plan("q107_mad_outliers")
    // the corpus-sized steps are hash aggregates (map-side combine); the
    // only windows run over the bounded bucket grid
    assert(!p.contains("row_number"), s"q107 regressed to the per-key funnel\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q113 BPE: corpus collapses to vocab once; merge rounds are vocab-sized") {
    val p = plan("q113_bpe_train")
    // r18: each merge round localCheckpoints (the winning-pair TakeOrdered
    // top-1 and the 1-row broadcast merge fold now run INSIDE the round
    // jobs — the per-iteration nesting that made the declared plan walk
    // 1,160 lines is gone). The declared plan must therefore be exactly
    // the union of the five checkpointed round results: lineage-free — no
    // corpus re-scan, no global sort, no cartesian can survive here.
    assert(p.contains("ExistingRDD"), s"q113 rounds must be checkpointed\n$p")
    assert(!p.contains("Scan parquet"), s"q113's final plan must not re-scan the corpus\n$p")
    assert(!p.contains("Sort "), s"the merge list needs no global sort\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q114/q116/q117 are hash-aggregate shapes (no window, no funnel)") {
    for (name <- Seq("q114_correlation", "q116_histogram", "q117_hhi")) {
      val p = plan(name)
      assert(p.contains("HashAggregate"), p)
      assert(!p.contains("Window"), s"$name must not need a window\n$p")
      assert(!p.contains("SinglePartition") || name == "q114_correlation",
        s"$name has a single-partition stage\n$p")
    }
  }

  test("q115 triangles: equi-joins only, TakeOrdered edge cap") {
    val p = plan("q115_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle closure must stay equi-join\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"edge cap must be TakeOrdered\n$p")
  }

  test("q118 markov: user-partitioned lag window, transition table reused") {
    val p = plan("q118_markov")
    assert(p.contains("hashpartitioning(user_id"),
      s"q118 lag window must partition by user_id\n$p")
    assert(!p.contains("SinglePartition"), s"q118 has a single-partition stage\n$p")
  }

  test("q119 quartiles reuse the rank-select shape; q120 is aggregate-only") {
    val p = plan("q119_iqr_outliers")
    assert(!p.contains("row_number"), s"q119 regressed to the per-key funnel\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val p2 = plan("q120_stickiness")
    assert(!p2.contains("Window"), s"q120 must not need a window\n$p2")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }

  test("q77/q79/q82/q83 per-row pipeline passes are shuffle-free") {
    Seq("q77_pii_redact", "q79_repetition", "q82_chunking", "q83_embedding_quant").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name must be a narrow per-row pass\n$p")
    }
  }

  test("q76/q78 windows are partitioned by lang (parallel, not global)") {
    Seq("q76_lang_quota", "q78_sequence_pack").foreach { name =>
      val p = plan(name)
      assert(p.contains("Window"), p)
      assert(p.contains("hashpartitioning(lang"),
        s"$name window must partition by lang, not run single-partition\n$p")
      assert(!p.contains("SinglePartition"), s"$name has a single-partition stage\n$p")
    }
  }

  test("q80 aggregate pipeline never goes quadratic") {
    Seq("q80_countmin").foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name degenerated to a non-equi join\n$p")
    }
  }

  test("q80 sketch build is join-free: one linear aggregate + window plan") {
    // the single-pass contract: the corpus is tokenized/shuffled once and
    // both sketch rows derive from the distinct-word table as windows —
    // any join in this plan means a second corpus pass crept back in
    val p = plan("q80_countmin")
    assert(!p.contains("Join"), s"q80 must not join\n$p")
  }

  test("q33 winnowing is shuffle-free (per-row array HOFs, no window)") {
    val p = plan("q33_fingerprint")
    assert(!p.contains("Exchange"), s"q33 winnowing must not shuffle\n$p")
    assert(!p.contains("Window"), s"q33 must not use a window operator\n$p")
  }

  test("q92 substring dedup: skew-safe two-phase gram count, equi-join only") {
    val p = plan("q92_dedup_substring")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the global gram count MUST be a hash aggregate (map-side partial
    // combine absorbs hot boilerplate grams) — a count-window over g would
    // serialize every occurrence of a hot gram through one task at scale
    assert(p.contains("HashAggregate"), s"q92 gram count must be a hash aggregate\n$p")
    // every window operator must partition by doc_id (the sparse per-doc
    // interval pass) — none by the gram hash
    p.split("\n").filter(_.contains("Window ")).foreach { l =>
      assert(l.contains("doc_id"), s"q92 window not partitioned by doc_id: $l\n$p")
    }
  }

  test("q96 global rank: corpus window is sharded, offsets broadcast") {
    val p = plan("q96_global_rank")
    // the corpus-side row_number must partition by (lang, shard) — never a
    // global single-partition sort of the corpus
    assert(p.contains("hashpartitioning(lang"),
      s"q96 corpus window must partition by lang/shard\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q96 offsets must broadcast\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q95 vocab coverage: top-K vocabulary is TakeOrdered and broadcasts") {
    val p = plan("q95_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"), s"vocab must be a top-K heap\n$p")
    assert(p.contains("BroadcastHashJoin"), s"vocab side must broadcast\n$p")
  }

  test("q85 curation pipeline: dedup is a semi-join, nothing goes quadratic") {
    val p = plan("q85_curation_pipeline")
    assert(p.contains("LeftSemi"), s"dedup keep-first must be a semi-join\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q84 exact-K sample plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q84_exact_k_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("q87 image-dims sniffing is shuffle-free and codegen-fused") {
    val p = plan("q87_image_dims")
    assert(!p.contains("Exchange"), s"header sniffing must be a narrow pass\n$p")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p2 = plan("q87_image_dims")
      val fused = p2.split("\n").exists(l => l.contains("*(") && l.toLowerCase.contains("imagedims"))
      assert(fused, "ImageDims fell out of whole-stage codegen\n" + p2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("CanonAlnum stays inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q75_dedup_normalized")
      val fused = p.split("\n").exists(l => l.contains("*(") && l.toLowerCase.contains("canonalnum"))
      assert(fused, "CanonAlnum fell out of whole-stage codegen\n" + p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q128 first-occurrence is a combining hash aggregate, never a window or cartesian") {
    val p = plan("q128_segment_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // min(pk) by segment hash must be partial+final (map-side combine eats
    // hot boilerplate segments before the shuffle)
    assert(p.split("HashAggregate").length >= 3, "expected partial+final HashAggregate\n" + p)
    assert(!p.contains("RunningWindowFunction"), p)
  }

  test("q129 cap is two-phase: the shard-local rank precedes the global rank") {
    val p = plan("q129_dup_cap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // two Window operators: (canon_hash, shard) local then canon_hash global
    assert(p.split("\\bWindow\\b").length >= 3, "expected local+global rank windows\n" + p)
  }

  test("q165 native as-of: merge exec planned, aggregate reuses its partitioning") {
    val p = plan("q165_asof_merge")
    assert(p.contains("AsofMergeJoin"), p)
    assert(!p.contains("Window"), "native as-of must not fall back to a window\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // outputPartitioning propagation: nothing between the final per-user
    // aggregate and the merge join — the exec's left clustering feeds it
    val agg = p.split("AsofMergeJoin").head
    assert(!agg.contains("Exchange"),
      "per-user aggregate must reuse the merge join's clustering\n" + p)
  }

  test("q181 sharded watermark: COUNT/MIN pushed into the key-grouped scan") {
    val p = plan("q181_sharded_watermark")
    assert(p.contains("pushedAgg=[groups=token_id aggs=count_star(),min(ts_us)]"),
      s"the watermark fragment must compute inside the scan\n$p")
  }

  test("q182 sharded SPJ: aggregations and join all zero-exchange") {
    val df = SparkEntry.queries("q182_sharded_spj")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("Exchange"),
      s"same-layout storage-partitioned join must not shuffle either side\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the SPJ path, not a broadcast, is the declared 100 TB plan\n$p")
  }

  test("q183 sharded DISTINCT tokens is a pushed group-by") {
    val p = plan("q183_sharded_tokens")
    assert(p.contains("pushedAgg=[groups=token_id aggs=]"),
      s"DISTINCT token_id must reach the scan\n$p")
  }

  test("q185 repetition gate: zero shuffles before the per-source aggregate") {
    val p = plan("q185_repetition_quality")
    // one exchange total — the final per-source combine; all repetition
    // arithmetic is per-row array HOFs
    assert(p.split("Exchange").length - 1 <= 1, s"extra shuffles crept in\n$p")
    assert(!p.contains("Window"), s"per-row HOFs must not become windows\n$p")
  }

  test("q186 leakage split: two hash aggregates, no window, no sort") {
    val p = plan("q186_leakage_split")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window") && !p.contains("SortExec"), p)
  }

  test("q187 token budget: one corpus scan; apportionment on the tiny tier") {
    val p = plan("q187_token_budget")
    // the documents table is scanned exactly once (the per-source token
    // aggregate); the grand total comes from the tiny-table window, so no
    // second corpus subtree and no broadcast join exist at all
    assert(p.split("FileScan").length - 1 === 1, s"corpus must be scanned once\n$p")
    assert(!p.contains("Join"), s"no join needed on the tiny tier\n$p")
  }

  test("q188 sharded latest-K: TopN pushed into the key-grouped scan") {
    val p = plan("q188_sharded_latest")
    assert(p.contains("topN=10 ts_us DESC"),
      s"the newest-K page query must push its TopN into the store\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q189 sharded point lookup: static filters pushed, 7 of 8 shard files pruned") {
    val df = SparkEntry.queries("q189_sharded_point")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedFilters=") && p.contains("EqualTo(token_id,7)")
      && p.contains("EqualTo(name,purchase)"),
      s"the point predicates must reach the scan\n$p")
    // residual-free: the scan consumed every conjunct exactly
    assert(df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df.queryExecution.optimizedPlan}")
    // file-level prune: the scan plans ONE shard partition, not 8
    val scan = findScan(df, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 1,
      s"shard=7 must plan exactly one input partition\n$p")
    // and emits only the matching rows (parse-time skip, no residual)
    assert(scan.metrics("numOutputRows").value === df.count())
  }

  test("q206 compacted point lookup: pushed residual-free onto the post-FINAL store, one shard planned") {
    val df = SparkEntry.queries("q206_compacted_point")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedFilters=") && p.contains("EqualTo(token_id,7)"),
      s"the point predicate must reach the compacted-store scan\n$p")
    assert(df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df.queryExecution.optimizedPlan}")
    // shard=7: the scan plans exactly one input partition of the compacted
    // store and emits only the token's rows (parse-time skip; the granule
    // index bounds the parse itself — GranuleIndexSpec pins <10% of rows)
    val scan = findScan(df, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 1,
      s"shard=7 must plan exactly one input partition\n$p")
    assert(scan.metrics("numOutputRows").value === df.count())
  }

  test("q210/q211 time-window reads: ts range pushed residual-free; q211 plans one shard") {
    // q210: pure time window over the compacted store — the ts bounds must
    // be consumed by the scan (the g2 granule bands then prune inside the
    // parts; GranuleIndexSpec pins the parsed-row bound)
    val df210 = SparkEntry.queries("q210_time_window_granules")(spark, sf)
    df210.collect()
    val p210 = df210.queryExecution.executedPlan.toString
    assert(p210.contains("pushedFilters=") && p210.contains("GreaterThanOrEqual(ts_us,")
      && p210.contains("LessThan(ts_us,"),
      s"the window bounds must reach the compacted-store scan\n$p210")
    assert(df210.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df210.queryExecution.optimizedPlan}")

    // q211: token + window — the reference's per-device fetch; one shard
    // partition planned, every emitted row inside the pushed box
    val df211 = SparkEntry.queries("q211_token_window_point")(spark, sf)
    df211.collect()
    val p211 = df211.queryExecution.executedPlan.toString
    assert(p211.contains("EqualTo(token_id,7)") && p211.contains("GreaterThanOrEqual(ts_us,"),
      s"token AND window must reach the scan\n$p211")
    assert(df211.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df211.queryExecution.optimizedPlan}")
    val scan = findScan(df211, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 1,
      s"shard=7 must plan exactly one input partition\n$p211")
    assert(scan.metrics("numOutputRows").value === df211.count())
  }

  test("q190 sharded DPP: the VIP build side prunes shard files at runtime") {
    val df = SparkEntry.queries("q190_sharded_dpp")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RuntimeFilters: [dynamicpruning"),
      s"the VIP join must inject a runtime filter into the sharded scan\n$p")
    // at sf0.001 exactly one token exceeds the threshold. The join key
    // carries BOTH filterable attributes, so two runtime filters compose:
    // shard FILES prune before bytes, and (r8) the token IN-set drops the
    // shard's other tokens at parse time — the scan emits exactly the VIP
    // token's own rows, not its whole shard's.
    val scan = findScan(df, "graft_sharded")
    val emitted = scan.metrics("numOutputRows").value
    val vipRows = SparkEntry.queries("q181_sharded_watermark")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 == rows.head.getLong(0)).map(_._2).sum
    assert(emitted === vipRows,
      s"scan emitted $emitted rows, expected the VIP token's own $vipRows")
  }

  test("q193 stats-driven broadcast: the pruned sharded dim BHJs with no hint") {
    val df = SparkEntry.queries("q193_sharded_bhj")(spark, sf)
    df.collect()
    // no ResolvedHint anywhere in the analyzed plan — the broadcast must
    // come from the scan's REPORTED post-prune statistics, not a human
    assert(df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.isEmpty, "q193 must not carry a broadcast hint")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"reported post-prune stats must make the dim broadcast:\n$p")
    assert(p.contains("EqualTo(shard,3)") || p.contains("pushedFilters=[EqualTo(shard,3)"),
      s"the static shard prune must reach the scan:\n$p")
  }

  test("q194 pushed sum: per-token spend partials computed inside the scan") {
    val df = SparkEntry.queries("q194_sharded_spend")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedAgg=[groups=token_id aggs=sum(v)]"),
      s"the sum must reach the scan:\n$p")
    // the scan ships one partial row per (shard, token), bounded by the
    // per-shard token count — not the corpus
    val scan = findScan(df, "graft_sharded")
    val tokens = SparkEntry.queries("q183_sharded_tokens")(spark, sf).count()
    assert(scan.metrics("numOutputRows").value <= 8L * tokens,
      s"scan must emit per-shard partials, got ${scan.metrics("numOutputRows").value}")
  }

  test("q191 classifier: train + score are hash aggregates and an equi-join, no cartesian") {
    val p = plan("q191_quality_classifier")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"token scoring must be an equi-join\n$p")
    assert(!p.contains("Window"), s"no window machinery belongs in the classifier\n$p")
  }

  test("q192 perplexity gate: boundaries from grid rank-select, not a corpus row_number funnel") {
    val p = plan("q192_perplexity_gate")
    assert(!p.contains("row_number"),
      s"terciles must come from the grid rank-select, not a global row_number\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      s"the two boundaries must broadcast to the per-doc projection\n$p")
  }

  test("q195 big-ticket: pushed v-range filter COMPOSES with pushed count/sum") {
    val df = SparkEntry.queries("q195_sharded_bigticket")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedAgg=[groups=token_id aggs=count_star(),sum(v)]"),
      s"the filtered aggregate must still push:\n$p")
    assert(p.contains("GreaterThanOrEqual(v,20000.0)"),
      s"the v threshold must reach the scan:\n$p")
    // residual-free is what KEEPS the aggregate pushdown available
    assert(df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df.queryExecution.optimizedPlan}")
  }

  test("q196 stratified subsample keeps q192's no-row_number contract") {
    val p = plan("q196_ccnet_sample")
    assert(!p.contains("row_number"),
      s"the tier boundaries must come from the grid rank-select\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"), p)
  }

  test("q197 raw extraction: residual-free pushed filters on the byte-range-split path") {
    val df = SparkEntry.queries("q197_sharded_extract")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // shard is pruned from the output → the scan takes the split path
    assert(p.contains("byte-range-split"),
      s"a non-key raw scan must plan byte-range splits:\n$p")
    assert(p.contains("EqualTo(name,click)") && p.contains("GreaterThanOrEqual(ts_us,"),
      s"the extraction predicates must reach the scan:\n$p")
    assert(df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.isEmpty, s"no Spark-side re-filter may remain\n${df.queryExecution.optimizedPlan}")
    // parse-time skip: the scan emits exactly the matching rows
    val scan = findScan(df, "graft_sharded")
    assert(scan.metrics("numOutputRows").value === df.count())
  }

  test("q198 page query: static filters AND TopN pushed into one scan, one shard planned") {
    val df = SparkEntry.queries("q198_sharded_page")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("topN=5 ts_us DESC") && p.contains("EqualTo(token_id,7)")
      && p.contains("EqualTo(shard,7)"),
      s"the reference's page fragment must push whole:\n$p")
    val scan = findScan(df, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 1, s"shard=7 must plan one partition\n$p")
    // per-partition heap: the scan ships exactly the K result rows (the
    // token's rows are the only heap entrants and it has ≥ K of them)
    assert(scan.metrics("numOutputRows").value === 5L)
  }

  test("q199 written-layout manifest: the V2-written store serves the key-grouped path") {
    val df = SparkEntry.queries("q199_written_manifest")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // grouping on the clustering column: the scan declines agg pushdown by
    // design and the key-grouped layout aggregates instead; the layout the
    // WRITER produced must carry the partitioning metadata end-to-end
    val scan = findScan(df, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 8, s"one partition per written shard\n$p")
  }

  test("q200 store count: pushed global CountStar ships one row per partition") {
    val df = SparkEntry.queries("q200_store_count")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedAgg=[groups= aggs=count_star()]"),
      s"the count must reach the scan:\n$p")
    val scan = findScan(df, "graft_sharded")
    val nParts = scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions
    assert(scan.metrics("numOutputRows").value === nParts.toLong,
      s"count path must emit exactly one row per partition ($nParts), " +
        s"got ${scan.metrics("numOutputRows").value}")
  }

  test("q201 sorted pairs: the SMJ subtree is exchange-free AND sort-free") {
    val df = SparkEntry.queries("q201_sorted_pairs")(spark, sf)
    df.collect()
    val nodes = allExecNodes(df.queryExecution.executedPlan)
    val smj = nodes.find(_.getClass.getSimpleName == "SortMergeJoinExec")
      .getOrElse(sys.error("q201 must plan a SortMergeJoin:\n" +
        df.queryExecution.executedPlan.toString))
    val below = allExecNodes(smj)
    // the co-located join runs on the scans' reported partitioning AND
    // reported ordering: no shuffle, no sort anywhere beneath it (the
    // only exchange in the query carries per-token partials ABOVE it)
    assert(!below.exists(_.getClass.getSimpleName.contains("Exchange")),
      s"SMJ subtree must not shuffle:\n$smj")
    assert(!below.exists(_.getClass.getSimpleName == "SortExec"),
      s"SMJ subtree must not sort:\n$smj")
  }

  test("q202 optimize-FINAL: one compacted part per shard, plain scan, no dedup machinery") {
    val df = SparkEntry.queries("q202_optimize_final")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the snapshot was baked by maintenance: the read is a RAW scan — no
    // dedup mode, no window, no pre-aggregation exchange below the project
    assert(!p.contains("dedup=latest") && !p.contains("Window"), p)
    val scan = findScan(df, "graft_sharded")
    assert(scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions === 8, s"one partition per compacted shard\n$p")
  }

  test("q203 latest snapshot: the collapse runs INSIDE the scan — no window, no exchange") {
    val df = SparkEntry.queries("q203_latest_snapshot")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dedup=latest") && p.contains("sorted-merge"),
      s"the snapshot must come from the merged-collapse read:\n$p")
    val nodes = allExecNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(n => n.getClass.getSimpleName.contains("Exchange") ||
      n.getClass.getSimpleName == "WindowExec" || n.getClass.getSimpleName == "SortExec"),
      s"query-time FINAL must not shuffle, window, or sort:\n$p")
  }

  test("entry flagship query produces rows and a non-degenerate plan") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
