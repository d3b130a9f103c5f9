package graft.queries

/** The audited partition-less-window registry, shared by the two gates
  * that enforce it (moved out of test code in r14 so both can see it):
  *
  *   - `PlanInvariantSpec`'s window census fails on any registered query
  *     that PLANS an unaudited partition-less `WindowExec` — and on any
  *     stale entry whose query no longer plans one.
  *   - `graft.Bench`'s runtime window census ([[graft.WindowWarnCensus]])
  *     counts `WindowExec`'s "No Partition Defined" warnings per query
  *     during the sweep and reports any query that WARNS without being
  *     audited here. This closes the census's one blind spot: queries
  *     that are eager by construction (plan census skips them) still
  *     execute their windows under the bench and get counted.
  *
  * Every entry documents WHY the single-partition window is bounded —
  * these sit over vocabulary/centroid/bucket-cardinality tables, never
  * over the corpus. An unbounded global window is a scale-killer (the
  * whole dataset sorts in ONE task); that is exactly what both censuses
  * exist to catch.
  */
object WindowAudits {

  val boundedGlobalWindowByDesign: Map[String, String] = Map(
    "q07_dim_dedup_key" -> "surrogate-key rank over the DEDUPED dim table (distinct part attrs) — the presentation form; the scalable two-phase allocator is the same query's documented sibling (SurrogateKeys)",
    "q100_pq_codebooks" -> "seed rank over the k=8 lowest-id seed rows (LIMIT 8 upstream)",
    "q101_pq_codes" -> "same k=8 seed rank as q100 (shared pqCodebooks chain)",
    "q105_packed_sequences" -> "vocab id rank over the DISTINCT-token table — vocabulary cardinality, not corpus",
    "q95_vocab_encode" -> "same vocabulary rank as q105 (shared vocab build)",
    "q121_bpe_packed_sequences" -> "same vocabulary rank as q105, over the BPE-merged vocab",
    "q187_bpe_sampled_train" -> "q121's chain with trained merges — same bounded vocab rank",
    "q115_budget_select" -> "cumulative sum over the nBuckets-row quantile-fence table",
    "q127_logreg_eval" -> "ROC cumulative sums over the quantized score table (<= 1e6+1 rows by construction)",
    "q96_hybrid_retrieval" -> "rrfFuse head ranks over the two <= k retrieval heads (bounded-input contract ENFORCED in Index.rrfFuse)",
    "q129_hybrid_serving" -> "same rrfFuse <= k head ranks as q96",
    "q141_zipf_fit" -> "frequency rank over the word-frequency table — vocabulary cardinality",
    "q166_key_skew" -> "top-K row rank + cumulative mass over the per-key HISTOGRAM (aggregation-bounded; the diagnostic contract)",
    "q80_mixture_weights" -> "global mass total over the per-source table (n_sources rows)",
    "q82_lm_buckets" -> "the documented exact-ntile presentation form; q177_lm_buckets_approx is the registered no-global-sort scale sibling",
    "q191_wordpiece_vocab" -> "vocab rank over the top-64 piece rows (LIMIT 64 upstream of the window)",
    "q192_wordpiece_encode" -> "q191's vocab rank, executed at construction when the 64-piece vocabulary collects (the returned encode plan itself is window-free)",
    "q195_wordpiece_fertility" -> "composes q192 — the same construction-time 64-piece vocab rank",
    "q197_incremental_wordpiece_vocab" -> "q191's vocab rank over the top-64 MERGED piece rows (LIMIT 64 upstream of the window)",
    "q198_viterbi_encode" -> "q191's vocab rank, executed at construction when the 64-piece vocabulary collects (the q192 pattern)",
    "q200_unigram_prune" -> "prune rank over the TRAINED vocabulary literal (<= seedSize + alphabet rows — UnigramLm.train returns a local literal, never corpus data); two row_numbers: the keep filter and the re-rank",
    "q203_heavy_hitters" -> "final rank over the verified heavy-hitter rows — at most k rows survive cnt·(k+1) > n (fewer than k+1 tokens can each hold more than a 1/(k+1) share)",
    "q204_incremental_heavy_hitters" -> "q203's final rank, over the segment-verified heavy-hitter rows — the same <= k bound (cnt·(k+1) > n on exact summed counts)")

  /** Bounded global windows the PLAN census cannot see — they execute
    * inside internally-persisted (InMemoryRelation) or construction-time
    * subtrees, so `queryExecution.sparkPlan` never contains the
    * WindowExec, but the RUNTIME census still counts their warnings.
    * Kept separate from [[boundedGlobalWindowByDesign]] because the plan
    * census's stale-entry assertion must keep firing for queries whose
    * returned plan SHOULD carry the window. First populated from the r14
    * full-sweep runtime census — the census catching exactly the blind
    * spot it was built for.
    */
  val runtimeOnlyGlobalWindowByDesign: Map[String, String] = Map(
    "q102_pq_adc_topk" -> "q100's k=8 seed rank, executed when the internally-persisted PQ codes subtree materializes (cached plan — invisible to the plan census)",
    "q103_pq_rerank" -> "same cached-codes k=8 seed rank as q102 (shared pqTopK chain)",
    "q134_snapshot_drift" -> "KS cumulative window over the persisted DISTINCT-VALUE count table (bounded by the drifted column's value domain — the q127 contract), executed when driftFromCounts materializes its cache",
    "q201_unigram_encode" -> "q200's prune rank over the trained-vocabulary literal, executed at construction when the pruned p3 table collects (the q192/q198 pattern — the returned encode plan itself is window-free)")

  /** The union the RUNTIME census checks against. */
  val allAudited: Set[String] =
    boundedGlobalWindowByDesign.keySet ++ runtimeOnlyGlobalWindowByDesign.keySet
}
