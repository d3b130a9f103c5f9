package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenizer TRAINING as a distributed program — the
  * step that turns a curated corpus into the merge table a tokenizer
  * ships with (the reference pipeline stops at word counts; an LLM data
  * pipeline has to produce the tokenizer too).
  *
  * The pivotal scale idea: BPE statistics live on the DISTINCT-WORD
  * table, not the corpus. One corpus-cardinality aggregation builds
  * (word, count) — identical shape to the q47 Zipf head — and every
  * merge iteration after that runs over vocabulary-cardinality rows
  * (≤ a few million for 100 TB of text), each carrying its corpus count.
  * Word-internal adjacency never crosses documents, so no iteration
  * touches the corpus again.
  *
  * Everything is built-in HOFs (zip_with / aggregate / slice — all
  * codegen'd): the pair explosion is row-local, the per-iteration merge
  * is a left fold over each symbol array, and the only shuffle per
  * iteration is the map-side-combinable pair-count aggregation. The
  * driver collects exactly ONE row per iteration (the winning pair) —
  * the [[Components]] iterative pattern with persist/unpersist
  * generation handover.
  */
object Bpe {

  /** (word, cnt, symbols): distinct whitespace words of the lowercased
    * corpus with their corpus counts, symbols initialized to the word's
    * character sequence — BPE's starting state.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("symbols", filter(split(col("word"), ""), s => s =!= ""))

  /** Adjacent-symbol pair counts over a [[wordTable]]-shaped frame,
    * weighted by word count: (lhs, rhs, pair_count). Row-local zip of the
    * symbol array with its own tail — single-symbol words contribute
    * nothing — then ONE map-side-combinable aggregation on the pair.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), explode(
        zip_with(
          slice(col("symbols"), lit(1), size(col("symbols")) - 1),
          slice(col("symbols"), lit(2), size(col("symbols")) - 1),
          (a, b) => struct(a.as("lhs"), b.as("rhs")))).as("p"))
      .groupBy(col("p").getField("lhs").as("lhs"), col("p").getField("rhs").as("rhs"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Leftmost-first greedy merge of adjacent pair (a, b) → a+b, as a pure
    * fold over the symbol array (no UDF — `aggregate` is codegen'd).
    * Greedy-correctness falls out of the fold: once a merge fires, the
    * accumulated last element becomes a+b, which can never equal `a`
    * again (strictly longer), so overlapping occurrences ("a a a" under
    * (a,a)) merge exactly as a left-to-right scan would.
    */
  def mergePair(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s))))

  /** Train `nMerges` BPE merges: per iteration, ONE pair-count aggregation
    * + a 1-row driver collect picks the most frequent pair (count desc,
    * then lexicographic — fully deterministic), and the fold rewrites the
    * symbol column. Returns the merge table (merge_rank, lhs, rhs, merged,
    * pair_count) — the artifact a tokenizer consumes, in merge order.
    * Stops early if no pair remains (every word fully merged).
    */
  def train(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordTable(df, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    words.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (i <- 1 to nMerges if !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top.head.getAs[String]("lhs"),
          top.head.getAs[String]("rhs"), top.head.getAs[Long]("pair_count"))
        merges += ((i, a, b, a + b, c))
        val next = words.withColumn("symbols", mergePair(col("symbols"), a, b))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        words.unpersist()
        words = next
      }
    }
    words.unpersist()
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode the corpus with a trained merge table: replay the merges in
    * rank order over each word's character sequence (the same fold), then
    * stitch words back per document. Returns (idCol, bpe_tokens:
    * array<string>). Merge count is small (a tokenizer ships thousands),
    * so the replay is a fixed expression chain — no iteration at encode
    * time, one corpus pass.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")).as(Seq("__pos", "__w")))
      .where(col("__w") =!= "")
      .withColumn("__syms", filter(split(col("__w"), ""), s => s =!= ""))
    val merged = merges.foldLeft(words) { case (acc, (a, b)) =>
      acc.withColumn("__syms", mergePair(col("__syms"), a, b))
    }
    merged
      .select(col(idCol), col("__pos"), col("__syms"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__syms")))),
        p => p.getField("__syms"))).as("bpe_tokens"))
  }
}
