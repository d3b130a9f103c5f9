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
    "q43_tfidf",            // scalar N broadcast-crossed into the score join
    "q58_kmv_distinct"      // 1-row sketch × 1-row exact count join
  )

  /** Queries whose DataFrame construction EXECUTES the heavy pipeline
    * (Components runs eagerly), so the returned plan is a post-collect
    * LocalTableScan and the guard would be vacuous while burning minutes.
    * Their upstream stages are guarded through their lazy twins: q57's
    * pair generation is q32's plan, q61's candidate join is q27's.
    */
  private val eagerByConstruction = Set("q57_dedup_clusters", "q61_dedup_retention",
    "q70_retain_canonical",
    // the incremental allocator reads max(existing) at construction; its
    // building blocks (scalable two-phase ids) are covered by q07/q08 plans
    "q69_incremental_dim")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    if (!eagerByConstruction.contains(name)) {
      test(s"$name plans without nested-loop/cartesian joins") {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (!bruteForceByDesign.contains(name)) {
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name degraded to BroadcastNestedLoopJoin")
          assert(!plan.contains("CartesianProduct"),
            s"$name degraded to CartesianProduct")
        }
      }
    }
  }
}
