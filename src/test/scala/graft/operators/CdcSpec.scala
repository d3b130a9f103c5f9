package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  /** driver-side reference: same polynomial, same boundary rule */
  private def refChunks(t: String, w: Int = 8, b: Long = 101L, d: Long = 61L): Seq[String] = {
    val pows = (0 until w).map(j => math.pow(b.toDouble, j.toDouble).toLong)
    val bounds = (w to t.length).filter { i =>
      (0 until w).map(j => t.charAt(i - j - 1).toLong * pows(j)).sum % d == 0
    }
    val starts = 0 +: bounds
    val ends = bounds :+ t.length
    starts.zip(ends).map { case (s, e) => t.substring(s, e) }.filter(_.nonEmpty)
  }

  private def pseudoText(seed: Int, len: Int): String =
    (0 until len).map { i =>
      val v = ((((seed * 131L + i) * 2654435761L) >> 13) % 27).toInt.abs
      if (v == 26) ' ' else ('a' + v).toChar
    }.mkString

  test("engine chunks == driver reference on pseudo-random strings") {
    val texts = (0 until 30).map(s => (s.toLong, pseudoText(s, 40 + s * 17)))
    val got = Cdc.chunks(texts.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id", "chunk_ix")
      .as[(Long, Long, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val want = texts.map { case (id, t) => id -> refChunks(t) }.toMap
    assert(got == want, s"first diff: ${want.keys.find(k => got.get(k) != want.get(k))}")
    // every doc reassembles exactly
    texts.foreach { case (id, t) => assert(want(id).mkString == t) }
    // the fixture actually chunks: some doc has >= 3 chunks
    assert(want.values.map(_.size).max >= 3)
  }

  test("boundaries are content-defined: an early edit leaves the tail chunks identical") {
    val t = pseudoText(7, 400)
    val edited = "INSERTED " + t
    val a = refChunks(t)
    val b = refChunks(edited)
    assert(a.size >= 4 && b.size >= 4)
    // after the first post-edit boundary the streams re-sync: the last
    // chunks are literally equal (this is the property fixed-size
    // blocking does NOT have)
    val shared = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(shared >= a.size - 2, s"tail not preserved: shared=$shared of ${a.size}")
    val gotB = Cdc.chunks(Seq((1L, edited)).toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("chunk_ix").as[(Long, Long, String)].collect().map(_._3).toSeq
    assert(gotB == b)
  }

  test("short, null, and empty documents") {
    val docs = Seq((1L, "tiny"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val got = Cdc.chunks(docs, "text", "doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 0L, "tiny")), got.toString) // < window -> one whole chunk
  }

  test("chunkDedupStats counts chunks shared across distinct documents") {
    // doc 1 and 2 share a long run -> share its interior chunks; doc 3
    // is unrelated. Use the reference to find the true shared digests.
    val core = pseudoText(3, 300)
    val docs = Seq(
      (1L, core),
      (2L, "PREFIX-EDIT " + core),
      (3L, pseudoText(9, 200)))
    val ref = docs.map { case (id, t) => id -> refChunks(t) }.toMap
    val sharedSet = ref.toSeq.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val want = ref.map { case (id, cs) =>
      (id, cs.size.toLong, cs.count(sharedSet).toLong)
    }.toSeq.sortBy(_._1)
    assert(want.exists(_._3 > 0) && want.exists(r => r._3 < r._2)) // both branches live
    val got = Cdc.chunkDedupStats(docs.toDF("doc_id", "text"), "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("rejects degenerate parameters") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Cdc.chunks(df, "text", "doc_id", window = 1) }
    intercept[IllegalArgumentException] { Cdc.chunks(df, "text", "doc_id", base = 1) }
    intercept[IllegalArgumentException] {
      Cdc.chunks(df, "text", "doc_id", window = 12, base = 127) // overflow guard
    }
  }
}
