package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM-training-data pipelines.
  *
  * Four tiers, all shuffle-conscious:
  *   - exact: hash-groupBy on a content digest (one shuffle on a 16-byte key,
  *     map-side partial agg).
  *   - MinHash + LSH banding: near-dup candidate pairs without the O(n²)
  *     cross join — signatures are computed per-row with higher-order
  *     functions (no UDF), then candidates come from a self-equi-join on
  *     (band, bandHash) which Spark executes as a shuffled hash join keyed
  *     on the band hash. At 100 TB this is THE way: cost is proportional to
  *     bucket collisions, not to n².
  *   - SimHash: 64-bit bitwise signature via 64 partial-aggregable bit sums
  *     (map-side combine; no row blowup).
  *   - n-gram Jaccard verification: exact similarity on candidate pairs only.
  */
object Dedup {

  /** Exact dedup: group by content digest, keep the smallest id per group.
    * Returns (digest, keep_id, n_dups). The digest shuffle key keeps skew
    * bounded even when one document dominates the corpus.
    */
  def exact(df: DataFrame, textCol: String, idCol: String, normalize: Boolean = true): DataFrame = {
    val content = if (normalize) lower(trim(col(textCol))) else col(textCol)
    df.groupBy(md5(content).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Rows of `df` surviving exact dedup (first id per digest wins). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(lower(trim(col(textCol))))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Word k-shingles of a text column (lowercased, whitespace-tokenized). */
  def shingles(text: Column, k: Int = 5): Column = {
    val words = split(trim(lower(text)), "\\s+")
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(words) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(words, i, lit(k)))
      )
    )
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum xxhash64(seed, shingle) over the document's shingle set.
    * Pure expression work — computed independently per row, embarrassingly
    * parallel, no shuffle.
    */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleK: Int = 5): Column = {
    val sh = shingles(text, shingleK)
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s)))
    )
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Emits one row per (id, band, bandHash).
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))
        )
      ).as(Seq("band", "band_hash"))
    )
    banded
  }

  /** Near-duplicate candidate pairs via MinHash + LSH: ids sharing at least
    * one (band, bandHash) bucket. Output columns (id_a, id_b), id_a < id_b,
    * deduplicated across bands. The join is an equi-join on the band hash —
    * shuffles only the (id, hash) pairs, never the documents.
    */
  def minhashCandidatePairs(
      df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("__id"), minhashSignature(col(textCol), numHashes, shingleK).as("__sig"))
    val banded = lshBands(sigs, "__id", "__sig", bands, rowsPerBand)
    val a = banded.select(col("band"), col("band_hash"), col("__id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("__id").as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs.
    * `pairs` has (id_a, id_b); `docs` has (idCol, textCol). Joins the text
    * back (broadcast-friendly if candidates are few) and computes
    * |A∩B| / |A∪B| over distinct shingle sets.
    */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, textCol: String, idCol: String, k: Int = 5): DataFrame = {
    val withSh = docs.select(col(idCol).as("__jid"), shingles(col(textCol), k).as("__sh"))
    pairs
      .join(withSh.withColumnRenamed("__jid", "id_a").withColumnRenamed("__sh", "sh_a"), Seq("id_a"))
      .join(withSh.withColumnRenamed("__jid", "id_b").withColumnRenamed("__sh", "sh_b"), Seq("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))
      )
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → exact Jaccard →
    * threshold filter. Returns (id_a, id_b, jaccard) for near-duplicates.
    */
  def nearDuplicates(
      df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16, shingleK: Int = 5): DataFrame = {
    val cand = minhashCandidatePairs(df, textCol, idCol, numHashes, bands, shingleK)
    jaccardOnPairs(cand, df, textCol, idCol, shingleK).where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token stream, computed with 64 partially
    * aggregable bit-sum columns — the per-token explode shuffles only
    * (id, tokenHash) pairs and the aggregation combines map-side, so there
    * is no 64× row amplification and no per-doc array state.
    * Returns (idCol, simhash LONG).
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(split(trim(lower(col(textCol))), "\\s+")).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { b =>
      sum((shiftright(col("__h"), b).bitwiseAND(1) * 2 - 1)).as(s"__b$b")
    }
    val agged = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agged.select(col(idCol), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding near-dup: pairs with cosine >= threshold among candidates
    * sharing a random-hyperplane LSH bucket (see [[Similarity.hyperplaneBucket]]).
    */
  def embeddingNearDups(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 12): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val withB = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      Similarity.hyperplaneBucket(col(vecCol), planes).as("__bucket"))
    val l = withB.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("v_a"))
    val r = withB.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("v_b"))
    l.join(r, Seq("__bucket")).where(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("v_a"), col("v_b")))
      .where(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .distinct()
  }
}
