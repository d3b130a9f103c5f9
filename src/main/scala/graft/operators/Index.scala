package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index export — the term → posting-list table a search/retrieval
  * layer consumes (the batch half of a Lucene-style indexer, as a pure
  * relational program).
  *
  * Plan shape: one explode of the token stream, ONE shuffle on the term,
  * and a single aggregation computing document frequency, collection
  * frequency, and the (sorted, truncated) posting list together. count and
  * collect_set all combine map-side, so the shuffle carries per-partition
  * partial states, never the raw token stream.
  *
  * Scale: aggregation state per term is O(min(df, corpus partitions ·
  * maxPostings))-ish for the counters but O(df) for the posting set of a
  * head term — exactly the stop-word skew every indexer hits. The
  * `maxPostings` truncation bounds the OUTPUT; a production 100-TB index
  * additionally segments head-term postings per shard (the posting list
  * becomes (term, shard) keyed — [[graft.operators.Sharding]] composes for
  * that), and `minDf` drops the hapax tail that dominates term cardinality.
  */
object Index {

  /** (term, doc_freq, term_freq, postings): distinct-doc count, total
    * occurrence count, and the first `maxPostings` doc ids in ascending
    * order serialized as a comma-joined string (engine-portable, stable).
    * Terms are whitespace tokens of the lowercased, trimmed text. Only
    * terms with doc_freq >= `minDf` are emitted.
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
                    minDf: Int = 1, maxPostings: Int = Int.MaxValue): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    // doc_freq is DERIVED from the posting set rather than a separate
    // countDistinct: a multi-distinct aggregate plans a second (term, id)
    // pre-aggregation exchange, while the set is being collected anyway —
    // deriving size() keeps the whole index to ONE term-keyed shuffle with
    // identical aggregation state
    df.select(col(idCol).as("__id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("term_freq"),
        sort_array(collect_set(col("__id"))).as("__ids"))
      .select(
        col("term"),
        size(col("__ids")).cast("long").as("doc_freq"),
        col("term_freq"),
        array_join(transform(slice(col("__ids"), 1, maxPostings), _.cast("string")), ",")
          .as("postings"))
      .where(col("doc_freq") >= minDf)
  }
}
