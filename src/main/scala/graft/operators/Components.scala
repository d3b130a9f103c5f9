package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the final stage of
  * every near-dup dedup pipeline: LSH/SimHash/embedding passes emit PAIRS,
  * but retention decisions need CLUSTERS (keep one canonical doc per
  * component, drop the rest). The reference has nothing like it; at 100 TB
  * it is mandatory — transitive closure ("A~B, B~C ⇒ drop two of three")
  * cannot be expressed as any single join.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round every node takes the min of its own label and
  * its neighbors' labels; fixpoint = each node holds the min id of its
  * component. Rounds needed = graph diameter. Near-dup graphs are dense
  * cliques with short bridges (diameter is a small constant), so this
  * converges in a handful of rounds. For adversarial long-chain graphs at
  * scale, swap the propagation step for the large-star/small-star
  * operations ("Connected Components in MapReduce and Beyond", Kiveris et
  * al. 2014) which converge in O(log n) rounds with the same
  * per-round shuffle shape (join on src, re-aggregate min per node).
  *
  * Scale notes per round: one shuffle join of labels⋈edges on the node id
  * plus one min-aggregate (map-side combinable). Labels are
  * `localCheckpoint`ed every round — without it the lineage doubles per
  * iteration and Catalyst re-analyzes an exponentially growing plan.
  */
object Components {

  /** Components of the undirected graph given by `pairs` (srcCol, dstCol).
    * Returns (id, component): one row per distinct endpoint, `component` =
    * the smallest node id reachable from `id`. Deterministic for any edge
    * order. Throws if `maxIter` rounds don't reach the fixpoint.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val fwd = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    // decimal(38,0) keeps the sum exact for any realistic node count even
    // with 60-bit hash ids — a wrapped long sum could (astronomically
    // rarely) alias across an iteration and stop one round early
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty graph: sum is null
    var prevSum = lblSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: each node also receives every neighbor's current label
      val received = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.union(received)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      // each node's label is monotonically non-increasing, so the label sum
      // strictly decreases until the fixpoint — an O(1)-output scalar agg
      // detects convergence without a labels⋈labels diff join
      val s = lblSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Cluster-level dedup summary: one row per component with its canonical
    * (minimum) id and member count. Singleton nodes never appear in `pairs`
    * and are implicitly their own clusters — callers keep them untouched.
    */
  def dedupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    connectedComponents(pairs, srcCol, dstCol)
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"))
}
