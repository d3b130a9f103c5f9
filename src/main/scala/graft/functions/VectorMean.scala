package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: elementwise mean of float-vector columns — the
  * centroid-update step of k-means / IVF list refinement.
  *
  * Implemented as `Aggregator[IN, BUF, OUT]` (the user-facing typed-UDAF
  * surface): the buffer is a (sum vector, count) pair, `merge` is
  * elementwise add — associative and commutative, so Spark runs it with
  * map-side partial aggregation; the shuffle carries one buffer per
  * (partition, group), never the vectors.
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b // null vectors are skipped, matching avg() semantics
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    require(v.length == sums.length,
      s"VectorMean: inconsistent vector lengths in group (${v.length} vs ${sums.length})")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"VectorMean: inconsistent vector lengths across partitions (${a._1.length} vs ${b._1.length})")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
