package graft

/** Locks the scale posture of representative registered queries into CI:
  * pruned scans, pushed filters, broadcast small sides, and the absence of
  * cartesian products are PLAN properties — a regression in any of them
  * changes the 100 TB story without changing sf0.01 results, so results
  * alone cannot guard them.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val s = df.queryExecution.executedPlan.toString()
    graft.ops.OpCaches.release()
    s
  }

  test("no registered query plans a cartesian product") {
    // the similarity queries use crossJoin deliberately but ALWAYS with a
    // broadcast side - they must plan as BroadcastNestedLoopJoin, never
    // CartesianProduct (which would shuffle-pair both sides). Audited over
    // the ENTIRE registry except queries whose construction itself runs
    // driver-side fit jobs (k-means, union-find edge counts, blob builds,
    // BPE vocab) - those are spot-checked above/below where cheap.
    val constructionRunsJobs = Set(
      "x3_ivf_topk", "x7_dedup_clusters", "x7_dedup_apply", "x8_curation_pipeline",
      "x4_lazy_pointer", "x6_bpe_merges", "x6_bpe_tokens", "x3_pca_project", "x3_pq_topk",
      "x3_pq_recall", "x3_ivfpq_topk", "x3_ivfpq_recall",
      // round-8 fifth wave: logreg fit (K gradient aggregates), union-find
      // edge collect, classifier eval (both fits) run at construction
      "x5_logreg_quality", "x5_classifier_eval", "x7_dedup_pagerank", "x8_curation_v11",
      // round-9: the persist→reload query runs the fit + artifact IO at
      // construction (that IS the operator); its scoring plan is the
      // x5_logreg_quality plan already swept
      "x11_model_reload",
      // entity resolution runs the union-find edge collect at construction
      // (its pair-join plan is x2_fuzzy_names', already swept)
      "x8_entity_resolution",
      // round-10: the bloom build is collected at construction and embedded
      // as a literal (the PqAdc codebook discipline); the pruned-join plan
      // is audited in BloomPruneSpec
      "q12_bloom_revenue")
    (SparkEntry.queries.keySet -- constructionRunsJobs).toSeq.sorted.foreach { q =>
      assert(!planOf(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
    // the heavy ones still get the check, constructed once each
    Seq("x3_ivf_topk", "x7_dedup_apply").foreach { q =>
      assert(!planOf(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("split assignment reads only the id column and shuffles only for output order") {
    val plan = planOf("x7_split")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), "split scan is not pruned to doc_id")
    assert("Exchange".r.findAllIn(plan).size == 1, "split should shuffle once (the output sort)")
  }

  test("incremental scan pushes the checkpoint predicate into the parquet scan") {
    val plan = planOf("s2_incremental_scan")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      "checkpoint predicate did not reach the scan")
  }

  test("time-travel as-of pushes its cutoff into the parquet scan; one exchange for the LWW window") {
    val plan = planOf("k4_time_travel")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,"),
      "as-of cutoff did not reach the scan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("incremental rollup pushes BOTH partial predicates into their scans") {
    val plan = planOf("a2_incremental_rollup")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,"),
      "history-leg cutoff did not reach its scan")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      "increment-leg cutoff did not reach its scan")
  }

  test("composed v11: no cartesian product; the learned-gate join keys on doc_id") {
    val plan = planOf("x8_curation_v11")
    assert(!plan.contains("CartesianProduct"), "v11 plans a cartesian product")
  }

  test("decontamination broadcasts the benchmark gram set") {
    val plan = planOf("x7_decontaminate")
    assert(plan.contains("BroadcastExchange"), "benchmark side is not broadcast")
  }

  test("brute-force knn broadcasts the query side; corpus side stays unshuffled") {
    val plan = planOf("x3_knn_cosine")
    assert(plan.contains("BroadcastNestedLoopJoin"), "expected broadcast cross join")
    // tree prints top-down: everything after the join node is its input
    // subtree (corpus scan + broadcast build) — no shuffle may appear there
    val inputs = plan.substring(plan.indexOf("BroadcastNestedLoopJoin"))
    assert(!inputs.contains("Exchange hashpartitioning"),
      "corpus rows shuffle before scoring")
  }

  test("exact dedup scan prunes to the id and text columns") {
    val plan = planOf("x1_exact_dedup")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "dedup scan reads more than (doc_id, text)")
  }

  test("int8 quantization is a pure projection: no joins, no aggregates, one output-sort shuffle") {
    val plan = planOf("x3_quantize_int8")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "quantization should not join or aggregate")
    assert("Exchange".r.findAllIn(plan).size == 1, "quantization should shuffle once (output sort)")
  }

  test("PII scrub is a pure projection over a pruned scan") {
    val plan = planOf("x5_pii_scrub")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"))
  }

  test("sketch aggregation plans no Expand (exact distinct is its own two-stage agg)") {
    // mixing countDistinct into the sketch agg would Expand every input row
    // (one projection per distinct group) — the round-5 7x regression this
    // locks out. The exact distinct must stay a separate two-stage agg.
    val plan = planOf("q9_approx_sketches")
    assert(!plan.contains("Expand"), "q9 regressed to an Expand-based mixed distinct aggregate")
    assert(plan.contains("BroadcastExchange"), "exact-users side should broadcast-join back")
  }

  test("LSH-cell IVF broadcasts centroids and probe rows; repetition collapse is a pure projection") {
    val ivf = planOf("x3_ivf_lsh_topk")
    assert(ivf.contains("BroadcastExchange"), "IVF centroid/probe sides should broadcast")
    assert(!ivf.contains("CartesianProduct"))
    val rep = planOf("x5_collapse_repeats")
    assert(rep.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "collapse-repeats scan reads more than (doc_id, text)")
    assert(!rep.contains("Join") && !rep.contains("HashAggregate"),
      "collapse-repeats should not join or aggregate")
  }

  test("perceptual fingerprint queries read only (doc_id, text); pair joins are equi-joins on the chunk key") {
    // the fingerprints derive entirely from doc_id + text (the media/token
    // construction is in-plan), so every scan must prune to those two
    // columns — a wider ReadSchema means blob-or-metadata columns would
    // ride the scan at corpus scale for nothing
    for (q <- Seq("x4_awav_hash", "x4_audio_near_dup", "x4_image_near_dup",
        "x2_simhash128", "x2_simhash128_pairs")) {
      val plan = planOf(q)
      assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        s"$q scan reads more than (doc_id, text)")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q pairs must meet on the chunk equi-key, never via nested-loop")
    }
  }

  test("sequence packing shuffles once for the shard window, once for output order") {
    val plan = planOf("x7_pack_sequences")
    assert("Exchange".r.findAllIn(plan).size == 2,
      "packing should shuffle exactly twice (shard window + output sort)")
    assert(plan.contains("Window"), "expected the shard cumsum window")
  }

  test("mixture sampling broadcasts the quota table; the corpus pass is a filter, not a join shuffle") {
    val plan = planOf("x7_mixture_sample")
    assert(plan.contains("BroadcastHashJoin"), "quota table should broadcast back over the corpus")
    // the corpus side must not hash-shuffle for the quota join: between the
    // join node and the broadcast build (the quota subtree, where the tiny
    // group-count agg's own exchanges live) the stream side must be a plain
    // filtered scan
    val corpusBranch = plan.substring(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("BroadcastExchange"))
    assert(!corpusBranch.contains("Exchange"), "corpus rows shuffle for the quota join")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      "mixture scan reads more than (doc_id, lang)")
  }

  test("semantic dedup joins on cell keys only — no cartesian, centroids broadcast") {
    for (q <- Seq("x2_semdedup", "x2_semdedup_scale")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(plan.contains("BroadcastExchange"), s"$q: centroid table should broadcast")
    }
  }

  test("LM scoring broadcasts the model; doc grams never hash-shuffle for the lookup") {
    val plan = planOf("x5_lm_score")
    assert(plan.contains("BroadcastHashJoin"), "gram->logp lookup should be a broadcast join")
    // the only hash exchanges belong to the model fit (tiny vocab agg) and
    // the final per-doc aggregate — the gram stream itself must reach its
    // broadcast join unshuffled: no exchange between the join and its
    // stream-side scan
    val streamSide = plan.substring(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("BroadcastExchange"))
    assert(!streamSide.contains("Exchange"), "doc grams shuffle before the model lookup")
  }

  test("curation v5: cartesian-free; NB survivors restrict embeddings via semi join before the cell window") {
    val plan = planOf("x8_curation_v5")
    assert(!plan.contains("CartesianProduct"), "v5 plans a cartesian product")
    assert(plan.contains("LeftSemi"), "the NB-kept set should restrict embeddings via a semi join")
    assert(plan.contains("hashpartitioning(cell"), "cell window shuffles on the cell key")
  }

  test("cluster sample: one cell-keyed exchange feeds the rank window, no joins at all") {
    val plan = planOf("x7_cluster_sample")
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      "cell assignment is a projection — no join belongs in this plan")
    assert(plan.contains("hashpartitioning(cell"),
      "the per-cell rank window should shuffle on the cell key")
  }

  test("hybrid RRF: no cartesian; query batch broadcast on the vector side") {
    val plan = planOf("x6_hybrid_rrf")
    assert(!plan.contains("CartesianProduct"), "hybrid fusion plans a cartesian product")
    // the cosine pool's corpus pass meets the 3-probe batch via broadcast
    // (the x3_knn_cosine shape); the fusion join itself runs on two
    // queries×poolK lists, never corpus-sized input
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "probe batch should broadcast")
  }

  test("NB quality: model lookup broadcast, token stream unshuffled, no cartesian") {
    val plan = planOf("x5_nb_quality")
    assert(!plan.contains("CartesianProduct"), "nb scoring plans a cartesian product")
    assert(plan.contains("BroadcastHashJoin"), "token->log-odds lookup should be a broadcast join")
    // same property as the LM test: the scoring-side token stream reaches
    // its model lookup without a hash exchange (the only shuffles belong
    // to the vocabulary-sized fit aggregates and the per-doc aggregate)
    val streamSide = plan.substring(plan.indexOf("BroadcastHashJoin"),
      plan.indexOf("BroadcastExchange"))
    assert(!streamSide.contains("Exchange"), "doc tokens shuffle before the model lookup")
  }

  test("substring spans: hash-keyed duplicate counting, pruned scan, no pair join") {
    val plan = planOf("x1_substring_spans")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "substring scan reads more than (doc_id, text)")
    // duplicate detection must be COUNTING (agg on the gram hash), never a
    // gram-keyed self-join — a hot gram must cost a counter, not a fan-out
    assert(!plan.contains("SortMergeJoin"), "substring dedup pairs grams instead of counting them")
    assert(!plan.contains("CartesianProduct"))
  }

  test("DSIR: ratio table broadcasts back; selection plans a bounded top-k, not a global sort") {
    val score = planOf("x7_dsir_score")
    assert(score.contains("BroadcastHashJoin"), "bucket->ratio lookup should be a broadcast join")
    val topk = planOf("x7_dsir_topk")
    assert(topk.contains("TakeOrderedAndProject"),
      "dsir top-k should plan TakeOrderedAndProject (per-partition heaps), not a global sort")
  }

  test("PCA projection output is a pure pruned projection (fit jobs are separate bounded passes)") {
    val plan = planOf("x3_pca_project")
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,embedding"),
      "pca scan reads more than (vec_id, embedding)")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "the projection pass should not join or aggregate")
    assert("Exchange".r.findAllIn(plan).size == 1, "pca should shuffle once (output sort)")
  }

  test("domain trust: corpus filtered by a broadcast semi-join, domain agg map-side combined") {
    val plan = planOf("x5_domain_filter")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "trusted-domain set should broadcast into a semi-join")
    // the per-domain aggregation partial-aggregates before its shuffle
    assert(plan.contains("HashAggregate"), "domain mean should hash-aggregate")
  }

  test("chunking is map-side only: explode, no joins/aggregates, one output-sort shuffle") {
    val plan = planOf("x5_chunk_overlap")
    assert(plan.contains("Generate"), "chunk explode missing")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      "chunking must not join or aggregate")
    assert("Exchange".r.findAllIn(plan).size == 1, "chunking should shuffle once (output sort)")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text"),
      "chunk scan reads more than (doc_id, text)")
  }

  test("curriculum: spine broadcasts back; corpus window partitions by score, never unpartitioned") {
    val plan = planOf("x7_curriculum")
    assert(plan.contains("BroadcastHashJoin"), "score->bucket spine lookup should broadcast")
    // exactly the SPINE windows (bucket assignment over distinct scores) may
    // be single-partition; the corpus-side rank window must be keyed
    assert(plan.contains("Window [") || plan.contains("RunningWindowFunction") ||
      plan.contains("Window"), "expected window operators")
    assert(plan.contains("windowspecdefinition(score#") ||
      plan.contains("windowspecdefinition(score"),
      "corpus rank window should partition by score")
  }

  test("PQ top-k: codebook rides the plan (no centroid join); queries broadcast over a code projection") {
    val plan = planOf("x3_pq_topk")
    assert(plan.contains("BroadcastNestedLoopJoin"), "query side should broadcast")
    // the only joins are the broadcast query pairing — the codebook is
    // literal maps, so there is no centroid join anywhere
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "PQ scoring must not shuffle-join (codebook should be plan literals)")
    assert(!plan.contains("CartesianProduct"), "PQ pairing must be broadcast, not cartesian")
  }

  test("incremental admission: all joins keyed (band hash or id), corpus side never broadcast as a whole") {
    val plan = planOf("x2_incremental_admit")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "bipartite candidates must meet on the band key, never a nested loop")
  }

  test("curation v4: composed plan stays cartesian-free; trust set broadcast semi-joins the corpus") {
    val plan = planOf("x8_curation_v4")
    assert(!plan.contains("CartesianProduct"), "v4 plans a cartesian product")
    assert(plan.contains("LeftSemi"), "trusted-domain restriction should be a semi join")
  }

  test("zipf fit: corpus touched once — exactly one explode (Generate) feeds the token count agg") {
    val plan = planOf("x6_zipf_fit")
    assert(!plan.contains("CartesianProduct"))
    assert("Generate".r.findAllIn(plan).size >= 1 && plan.contains("HashAggregate"),
      "token counting should be one explode + hash agg")
  }

  test("IVF-PQ top-k: candidates pair by cell equi-join (broadcast hash), codebook rides the plan") {
    val plan = planOf("x3_ivfpq_topk")
    // the probe->candidate pairing must be the keyed join on __cell — the
    // whole point of IVF over the flat form's nested-loop cross join
    assert(plan.contains("BroadcastHashJoin"), "probes should broadcast-hash-join coded corpus on cell")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "IVF-PQ scoring must not shuffle-join (codebook is plan literals, probes broadcast)")
  }

  test("semantic decontamination: benchmark side broadcasts; corpus meets it on band keys only") {
    val plan = planOf("x2_semantic_decon")
    assert(plan.contains("BroadcastHashJoin"), "benchmark banded rows should broadcast")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "decon must join on (band, bucket) keys, never pair all rows")
  }

  test("shuffle-shard export: pruned scan, no joins, two exchanges (rank window + output order)") {
    val plan = planOf("x7_shuffle_shards")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"), "shard scan is not pruned to doc_id")
    assert(!plan.contains("Join"), "shard assignment must be join-free")
    // one hash exchange on the shard key for the rank window, one range
    // exchange for the registered query's canonical output order — the
    // export write path keeps only the first
    assert("Exchange".r.findAllIn(plan).size == 2,
      "shuffle-shards should shuffle exactly twice (shard window + output sort)")
    assert(plan.contains("hashpartitioning(shard"), "rank window must partition by the shard key")
  }

  test("naive-form image pair query is rescued by the optimizer rewrite: banded Expand, no cartesian") {
    val plan = planOf("x4_image_near_dup_sql")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the bit_count theta-join must be rewritten to the banded equi-join")
    assert(plan.contains("Expand"), "banded expansion missing — rewrite did not fire")
  }

  test("video temporal hash pair join is the banded equi-join, pruned to (doc_id, text)") {
    val plan = planOf("x4_video_near_dup")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "video fixture scan should read only (doc_id, text)")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "video pairs must meet on chunk keys, never pair all rows")
  }

  test("temperature mix: quota table broadcasts back; corpus pass stays map-only") {
    val plan = planOf("x7_temperature_mix")
    assert(plan.contains("BroadcastHashJoin"), "quota table must broadcast over the corpus")
    // the corpus side may shuffle only for the registered output sort; the
    // remaining exchanges serve the GROUP-count agg + its one-row window
    assert(!plan.contains("SortMergeJoin"), "corpus must never shuffle for the quota join")
  }

  test("threshold sweep: one aggregate pass, no joins, no row fan-out") {
    val plan = planOf("x5_threshold_sweep")
    assert(!plan.contains("Join"), "sweep must be join-free")
    assert(!plan.contains("Expand"), "sweep must not fan rows out per threshold")
    // one partial+final HashAggregate pair over the scan, then the inline
    // unpivot of the single result row
    assert("Exchange".r.findAllIn(plan).size <= 2,
      "sweep should shuffle at most twice (agg partials + output sort)")
  }

  test("dup-gram fraction: grams meet counts on the hash key, text never joins") {
    val plan = planOf("x1_dup_gram_fraction")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "gram membership must be an equi-join on the gram hash")
  }

  test("curation v10: calibration gate and quota broadcast; no corpus-scale join anywhere") {
    val plan = planOf("x8_curation_v10")
    assert(!plan.contains("CartesianProduct"), "v10 must stay cartesian-free")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the chosen-threshold single row must broadcast over the corpus")
    assert(plan.contains("BroadcastHashJoin"), "the temperature quota table must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "no join in v10 may shuffle the corpus")
  }
}
