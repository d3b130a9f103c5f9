package graft

/** Physical-plan regression guards: no query may silently degrade to a
  * nested-loop/cartesian plan (the scale-killer failure mode). Brute-force
  * similarity queries are exempt — their broadcast cross product over the
  * tiny query side IS the intended plan (the LSH/IVF variants are the
  * scale path).
  */
class PlanInvariantSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan legitimately contains a broadcast cross product. */
  private val bruteForceByDesign = Set(
    "q25_cosine_topk",      // broadcast query side × corpus (baseline ANN)
    "q26_ngram_jaccard",    // bounded all-pairs candidate set
    "q32_embedding_neardup", // exact near-dup baseline
    "q38_ann_ivf",          // centroid table broadcast-crossed for assignment
    "q175_ivf_stored_index", // centroid table broadcast-crossed for assignment + probing, as q38
    "q43_tfidf",            // scalar N broadcast-crossed into the score join
    "q71_unigram_lm",       // scalar corpus-size N broadcast-crossed, as q43
    "q58_kmv_distinct",     // 1-row sketch × 1-row exact count join
    "q76_semdedup",         // centroid table broadcast-crossed for assignment, as q38
    "q82_lm_buckets",       // composes q71's unigram LM (same 1-row cross join)
    "q177_lm_buckets_approx", // q82's scale sibling: q71's 1-row cross join + the 1-row approx-cutoff table broadcast-crossed (Bucketing.byApproxQuantilesDesc), as q88's bounds
    "q86_kmeans_step",      // centroid table broadcast-crossed for assignment, as q76
    "q88_histogram",        // 1-row min/max bounds broadcast-crossed, as q58
    "q89_bm25",             // 1-row corpus constants (N, avgdl, dfs) broadcast-crossed
    "q96_hybrid_retrieval", // composes q89's constants cross join + q25's 1-row query-vector broadcast
    "q99_bm25_batch",       // 1-row corpus constants (N, avgdl) broadcast-crossed, as q89
    "q109_hard_negatives",  // broadcast anchor side × corpus with a non-equi (label ≠) condition — the exact-mining baseline, as q25; the LSH form is the equi-join scale path
    "q110_prototype_eval",  // labels-row prototype table broadcast-crossed for assignment, as q86
    "q112_mmr_rerank",      // first stage IS q25's broadcast baseline; swap the LSH/IVF retriever in at corpus scale
    "q113_rank_eval",       // composes q25's baseline arm (the exact side being evaluated against)
    "q114_curriculum",      // 1-row quantile-fence table broadcast-crossed, as q88's bounds
    "q115_budget_select",   // 1-row fence table + nBuckets-row offsets broadcast-crossed, as q114
    "q118_dedup_eval",      // bounded all-pairs TRUTH baseline (the q26 shape) + 1-row metric cross joins
    "q119_vocab_coverage",  // 1-row corpus-total broadcast-crossed into the coverage curve, as q58/q88's bounds
    "q129_hybrid_serving",  // composes q99's constants cross join + q25's 1-row query-vector broadcast, as q96
    "q133_calibration",     // 1-row brier/log-loss/n_total scalar table broadcast-crossed onto the bin rows, as q58/q88
    "q152_target_encoding", // 1-row global-prior table broadcast-crossed onto the rows, as q43
    "q160_t_closeness",     // the classes × values audit grid IS the operator (both sides aggregation-bounded, value table + 1-row total broadcast), as q88's bounds
    "q165_pmi",             // 1-row corpus totals (n_tokens, n_pairs) broadcast-crossed onto the pair table, as q89's constants
    "q166_key_skew",        // 1-row summary (n_keys, n_rows, gini) broadcast-crossed onto the topK rows, as q58
    "q167_merge_collocations", // composes q165's 1-row corpus-total cross joins into the phrase inventory
    "q174_term_associations", // composes q165's cross joins; the rank window runs over the pair-bounded PMI table
    "q168_robust_scale",    // 1-row median then 1-row MAD broadcast-crossed onto the scan, as q88's bounds
    "q203_heavy_hitters",   // 1-row token-total broadcast-crossed onto the <= k verified candidate rows, as q58/q88's bounds
    "q204_incremental_heavy_hitters" // 1-row segment-summed total broadcast-crossed onto the <= S*k verified candidate rows, as q203
  )

  /** Queries whose DataFrame construction EXECUTES the heavy pipeline
    * (Components runs eagerly), so the returned plan is a post-collect
    * LocalTableScan and the guard would be vacuous while burning minutes.
    * Their upstream stages are guarded through their lazy twins: q57's
    * pair generation is q32's plan, q61's candidate join is q27's.
    *
    * DELIBERATELY NOT in this set (ADVICE r16): the media family
    * (q130/q147/q148/q149/q150/q154/q157/q161), whose construction since
    * r16 materializes an eager localCheckpoint of the per-asset hash/stat
    * proxy rows. Their RESIDUAL post-checkpoint plans are exactly the
    * part worth guarding — the band self-joins, verdict joins and final
    * sorts that could silently degrade to a nested-loop — and at this
    * spec's sf0.001 the decode-at-construction costs milliseconds, not
    * the minutes this set exists to avoid. The pre-checkpoint decode
    * segment is not plan-guarded here (it is an opaque typed map with no
    * join to degrade); its shape is pinned by MultimodalSpec.
    */
  private val eagerByConstruction = Set("q57_dedup_clusters", "q61_dedup_retention",
    "q180_dedup_clusters_lsh", // q57's bucketed sibling — same eager Components

    "q70_retain_canonical",
    // composes q70's chain (Components runs eagerly at construction)
    "q83_curation",
    // composes q70's components + q116's PageRank, both eager at construction
    "q117_retain_central",
    // the incremental allocator reads max(existing) at construction; its
    // building blocks (scalable two-phase ids) are covered by q07/q08 plans
    "q69_incremental_dim",
    // composes q123's fuzzy pairs into Components (eager at construction);
    // the pair-generation plan is guarded through q123/q126
    "q142_entity_resolution",
    // two component passes at construction (existing resolve + increment)
    "q146_incremental_entity_resolution",
    // triangle/degree aggregates collect at construction (the fit contract)
    "q153_triangle_stats",
    // power-iteration generations materialize at construction
    "q155_lsa_topic", "q156_lsa_doc_scores",
    // deflated power iteration + HITS + label prop + k-core peel rounds
    // all localCheckpoint at construction
    "q159_lsa_topics", "q162_hits", "q163_label_prop", "q169_kcore",
    // composes q165's PMI (1-row total cross joins) into q155's eager
    // power iteration
    "q173_ppmi_lsa",
    // DBSCAN runs Components at construction; pair generation is guarded
    // through q32 (exact baseline) / q68 (bucketed sibling)
    "q189_dbscan", "q190_dbscan_lsh",
    // materializes the stored bucket index + edge state at construction
    // (the q146 stored-state pattern), then runs eager Components
    "q193_incremental_dbscan",
    // collects the 64-piece vocabulary at construction (the q187 bounded-
    // artifact pattern); the vocab build's plan is guarded through q191
    "q192_wordpiece_encode",
    // composes q192 (same eager vocab collect)
    "q195_wordpiece_fertility",
    // same eager vocab collect feeding the Viterbi kernel
    "q198_viterbi_encode",
    // composes q61's chain into Components (eager), as q142/q194's family
    "q194_cluster_split")

  // Positive shape pins on flagship plans — the properties the 100-TB
  // story depends on, asserted, not just documented. Version-pinned
  // (Spark 4.1) and cheap: plan construction only, no execution.
  test("q05 star join broadcasts all four dims and aggregates map-side first") {
    val plan = SparkEntry.queries("q05_star_join")(spark, dir)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(broadcasts >= 4, s"expected 4 broadcast dims, got $broadcasts")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final aggregation pair")
    assert(!plan.contains("SortMergeJoin"),
      "a dim reached sort-merge: broadcast regressed")
  }

  test("q09 key filter reaches the parquet scan as the SPECIFIC pushed predicate") {
    // parquet scans always print a PushedFilters section (possibly []), so
    // the pin must name the predicate, not just the section header
    val plan = SparkEntry.queries("q09_null_fill")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(s_suppkey,5)"),
      "s_suppkey <= 5 no longer pushed to the supplier scan")
  }

  test("q184 domain stats never reads the text column (URL synthesis prunes to 3 columns)") {
    val plan = SparkEntry.queries("q184_domain_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("text#"),
      "q184's documents scan regressed to reading text — column pruning lost")
  }

  test("q02 aggregates map-side before the exchange") {
    val plan = SparkEntry.queries("q02_group_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial+final aggregation pair")
  }

  test("q06 top-k plans as TakeOrderedAndProject, not global sort") {
    val plan = SparkEntry.queries("q06_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k regressed to a full global sort")
  }

  /** The audited partition-less-window registry — moved to main code
    * (graft.queries.WindowAudits) in r14 so graft.Bench's RUNTIME window
    * census shares the exact same allowlist this plan census enforces.
    */
  private val boundedGlobalWindowByDesign: Map[String, String] =
    graft.queries.WindowAudits.boundedGlobalWindowByDesign

  test("runtime-only window audits never overlap the plan-census registry") {
    val overlap = graft.queries.WindowAudits.runtimeOnlyGlobalWindowByDesign.keySet
      .intersect(boundedGlobalWindowByDesign.keySet)
    assert(overlap.isEmpty, s"$overlap audited in both registries — a query whose " +
      "RETURNED plan carries the window belongs in boundedGlobalWindowByDesign only")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (!eagerByConstruction.contains(name)) {
      test(s"$name plans without nested-loop/cartesian joins or unaudited global windows") {
        val qe = fn(spark, dir).queryExecution
        val plan = qe.executedPlan.toString
        if (!bruteForceByDesign.contains(name)) {
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name degraded to BroadcastNestedLoopJoin")
          assert(!plan.contains("CartesianProduct"),
            s"$name degraded to CartesianProduct")
        }
        // window census: any partition-less WindowExec must be audited as
        // sitting over a bounded subtree, else this is a whole-corpus
        // single-partition sort hiding in the plan
        val bare = qe.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        if (bare.nonEmpty) {
          assert(boundedGlobalWindowByDesign.contains(name),
            s"$name plans ${bare.size} UNAUDITED partition-less WindowExec(s): " +
              bare.map(_.windowExpression.map(_.sql).mkString(",")).mkString(" | ").take(400))
        } else {
          assert(!boundedGlobalWindowByDesign.contains(name),
            s"$name is whitelisted for a partition-less window it no longer plans — remove the stale exemption")
        }
      }
    }
  }
}
