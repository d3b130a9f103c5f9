package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.{AsOfJoin, Bpe, Curriculum, Dedup, Diff, Drift, Index, PageRank, Privacy, Profile, RankEval, Rerank, Sampling, Similarity, Skew, SuffixDedup, TextAnalysis, UrlCuration}

/** SQL TABLE-function entry points for the curation operator library —
  * the surface that lets a pure-`spark.sql` user run the pipeline
  * operators without touching the Scala API:
  *
  *   - `graft_dedup_exact(table, textCol, idCol)` —
  *     [[graft.operators.Dedup.exact]]'s (content_hash, keep_id, n_dups);
  *   - `graft_weighted_sample(table, idCol, weightCol, n)` —
  *     [[graft.operators.Sampling.weightedSample]]'s deterministic A-ES
  *     draw (the q93 operator);
  *   - `graft_quota_per_group(table, groupCol, quota, orderCol, idCol)` —
  *     [[graft.operators.Sampling.quotaPerGroup]] with preference
  *     (orderCol DESC, idCol) — the q87 per-source cap;
  *   - `graft_snapshot_diff(oldTable, newTable, keyCol, compareCols)` —
  *     [[graft.operators.Diff.snapshotDiff]], `compareCols` comma-joined;
  *   - `graft_bm25(table, textCol, idCol, terms, topK)` —
  *     [[graft.operators.Index.bm25TopK]] with a space-separated query
  *     term string (the q89 retrieval operator from pure SQL);
  *   - `graft_contaminate(docsTable, benchTable, textCol, idCol, k)` —
  *     [[graft.operators.TextAnalysis.contaminationAtScale]], the q106
  *     shuffle-free decontamination sweep;
  *   - `graft_bpe_pairs(table, textCol)` —
  *     [[graft.operators.Bpe.pairCounts]] over [[graft.operators.Bpe.wordTable]],
  *     the q108 BPE pair-statistics kernel;
  *   - `graft_hard_negatives(anchorsTable, corpusTable, vecCol, idCol, labelCol, k)` —
  *     [[graft.operators.Similarity.hardNegativesTopK]], the q109
  *     contrastive-mining step;
  *   - `graft_mmr(queriesTable, corpusTable, vecCol, idCol, m, k, lambda)` —
  *     [[graft.operators.Rerank.mmrDiversifyTopK]], the q112 diversified
  *     re-rank;
  *   - `graft_rank_eval(approxTable, exactTable, queryCol, rankCol, idCol)` —
  *     [[graft.operators.RankEval.vsExact]], the q113 recall@k / MRR gate;
  *   - `graft_assign_splits(table, idCol, 'train:0.8,validation:0.1,test:0.1')` —
  *     [[graft.operators.Sampling.assignSplits]], the q111 named split;
  *   - `graft_pagerank(edgesTable, aCol, bCol, iterations)` —
  *     [[graft.operators.PageRank.pageRank]], the q116 centrality;
  *   - `graft_curriculum(table, idCol, scoreCol, nPhases)` —
  *     [[graft.operators.Curriculum.curriculumOrder]], the q114 ordering;
  *   - `graft_budget_select(table, idCol, scoreCol, costCol, budget)` —
  *     [[graft.operators.Curriculum.budgetSelect]], the q115 selection;
  *   - `graft_retain_canonical(docsTable, pairsTable, idCol, preferenceCol)` —
  *     [[graft.operators.Dedup.retainCanonical]] keeping each near-dup
  *     cluster's best member by (preferenceCol DESC, idCol) — the q70
  *     retention policy;
  *   - `graft_drift(baseTable, curTable, valueCol, buckets)` —
  *     [[graft.operators.Drift.numericDrift]]'s 1-row PSI/KS report
  *     (the q134 monitor);
  *   - `graft_k_anonymity(table, 'quasi1,quasi2', k)` —
  *     [[graft.operators.Privacy.kAnonymityClasses]] per-class audit
  *     (the q145 gate), quasi columns comma-joined;
  *   - `graft_key_skew(table, keyCol, topK)` —
  *     [[graft.operators.Skew.keySkewReport]]'s hot-key + Gini report
  *     (the q166 diagnosis);
  *   - `graft_asof_join(leftTable, rightTable, keyCol, tsCol, 'col1,col2')` —
  *     [[graft.operators.AsOfJoin.asOfLeft]], the q36 as-of left join
  *     (right payload columns comma-joined);
  *   - `graft_profile(table, 'col1,col2'[, exact])` —
  *     [[graft.operators.Profile.profile]]'s per-column verification
  *     profile (the q77 operator); pass `false` for the approx
  *     (HLL, single-scan) 100-TB form;
  *   - `graft_heavy_hitters(table, textCol, k)` —
  *     [[graft.operators.HeavyHitters.ofText]]'s exact heavy hitters
  *     (the q203 operator);
  *   - `graft_phrase_match(table, textCol, idCol, 'pat1,pat2')` —
  *     [[graft.operators.PhraseMatch.matchCounts]]'s blocklist scan
  *     (the q205 operator), patterns comma-joined.
  *
  * Each builder resolves its table arguments against the ACTIVE session's
  * catalog (temp views, warehouse tables, anything `spark.table` reaches),
  * applies the same DataFrame operator the Scala API runs, and returns the
  * analyzed logical plan — so the SQL path plans IDENTICALLY to the Column
  * path (same WindowGroupLimit / TakeOrderedAndProject / broadcast shapes,
  * spec-asserted equality). Arguments must be literals: a table function's
  * plan is built once at analysis time.
  *
  * Installed by [[GraftExtensions]] via `injectTableFunction`; usable as
  * `spark.sql("SELECT * FROM graft_dedup_exact('docs', 'text', 'doc_id')")`.
  */
object GraftTableFunctions {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _: StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def int(e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def table(name: String) = SparkSession.active.table(name)

  type TableFn = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  val dedupExactFn: TableFn = (
    FunctionIdentifier("graft_dedup_exact"),
    new ExpressionInfo(Dedup.getClass.getName, "graft_dedup_exact"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_dedup_exact takes (table, textCol, idCol)")
      Dedup.exact(table(str(args(0), "table")),
          str(args(1), "textCol"), str(args(2), "idCol"))
        .queryExecution.analyzed
    })

  val weightedSampleFn: TableFn = (
    FunctionIdentifier("graft_weighted_sample"),
    new ExpressionInfo(Sampling.getClass.getName, "graft_weighted_sample"),
    (args: Seq[Expression]) => {
      require(args.length == 4, "graft_weighted_sample takes (table, idCol, weightCol, n)")
      Sampling.weightedSample(table(str(args(0), "table")),
          str(args(1), "idCol"), str(args(2), "weightCol"), int(args(3), "n"))
        .queryExecution.analyzed
    })

  val quotaPerGroupFn: TableFn = (
    FunctionIdentifier("graft_quota_per_group"),
    new ExpressionInfo(Sampling.getClass.getName, "graft_quota_per_group"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_quota_per_group takes (table, groupCol, quota, orderCol, idCol)")
      Sampling.quotaPerGroup(table(str(args(0), "table")),
          str(args(1), "groupCol"), int(args(2), "quota"),
          Seq(col(str(args(3), "orderCol")).desc, col(str(args(4), "idCol"))))
        .queryExecution.analyzed
    })

  val snapshotDiffFn: TableFn = (
    FunctionIdentifier("graft_snapshot_diff"),
    new ExpressionInfo(Diff.getClass.getName, "graft_snapshot_diff"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_snapshot_diff takes (oldTable, newTable, keyCol, compareColsCsv)")
      Diff.snapshotDiff(table(str(args(0), "oldTable")), table(str(args(1), "newTable")),
          Seq(str(args(2), "keyCol")),
          str(args(3), "compareCols").split(",").map(_.trim).toSeq)
        .queryExecution.analyzed
    })

  val bm25Fn: TableFn = (
    FunctionIdentifier("graft_bm25"),
    new ExpressionInfo(Index.getClass.getName, "graft_bm25"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_bm25 takes (table, textCol, idCol, termsSpaceSeparated, topK)")
      val terms = str(args(3), "terms").trim.split("\\s+").toSeq
      Index.bm25TopK(table(str(args(0), "table")),
          str(args(1), "textCol"), str(args(2), "idCol"),
          terms, int(args(4), "topK"))
        .queryExecution.analyzed
    })

  val contaminateFn: TableFn = (
    FunctionIdentifier("graft_contaminate"),
    new ExpressionInfo(TextAnalysis.getClass.getName, "graft_contaminate"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_contaminate takes (docsTable, benchTable, textCol, idCol, k)")
      TextAnalysis.contaminationAtScale(table(str(args(0), "docsTable")),
          table(str(args(1), "benchTable")),
          str(args(2), "textCol"), str(args(3), "idCol"), int(args(4), "k"))
        .queryExecution.analyzed
    })

  val bpePairsFn: TableFn = (
    FunctionIdentifier("graft_bpe_pairs"),
    new ExpressionInfo(Bpe.getClass.getName, "graft_bpe_pairs"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_bpe_pairs takes (table, textCol)")
      Bpe.pairCounts(Bpe.wordTable(table(str(args(0), "table")),
          str(args(1), "textCol")))
        .queryExecution.analyzed
    })

  private def dbl(e: Expression, what: String): Double = e match {
    case Literal(d: Double, _) => d
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(i: Int, IntegerType) => i.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  val hardNegativesFn: TableFn = (
    FunctionIdentifier("graft_hard_negatives"),
    new ExpressionInfo(Similarity.getClass.getName, "graft_hard_negatives"),
    (args: Seq[Expression]) => {
      require(args.length == 6,
        "graft_hard_negatives takes (anchorsTable, corpusTable, vecCol, idCol, labelCol, k)")
      Similarity.hardNegativesTopK(table(str(args(0), "anchorsTable")),
          table(str(args(1), "corpusTable")), str(args(2), "vecCol"),
          str(args(3), "idCol"), str(args(4), "labelCol"), int(args(5), "k"))
        .queryExecution.analyzed
    })

  val mmrFn: TableFn = (
    FunctionIdentifier("graft_mmr"),
    new ExpressionInfo(Rerank.getClass.getName, "graft_mmr"),
    (args: Seq[Expression]) => {
      require(args.length == 7,
        "graft_mmr takes (queriesTable, corpusTable, vecCol, idCol, m, k, lambda)")
      Rerank.mmrDiversifyTopK(table(str(args(0), "queriesTable")),
          table(str(args(1), "corpusTable")), str(args(2), "vecCol"),
          str(args(3), "idCol"), int(args(4), "m"), int(args(5), "k"),
          dbl(args(6), "lambda"))
        .queryExecution.analyzed
    })

  val rankEvalFn: TableFn = (
    FunctionIdentifier("graft_rank_eval"),
    new ExpressionInfo(RankEval.getClass.getName, "graft_rank_eval"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_rank_eval takes (approxTable, exactTable, queryCol, rankCol, idCol)")
      RankEval.vsExact(table(str(args(0), "approxTable")),
          table(str(args(1), "exactTable")), str(args(2), "queryCol"),
          str(args(3), "rankCol"), str(args(4), "idCol"))
        .queryExecution.analyzed
    })

  val assignSplitsFn: TableFn = (
    FunctionIdentifier("graft_assign_splits"),
    new ExpressionInfo(Sampling.getClass.getName, "graft_assign_splits"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_assign_splits takes (table, idCol, 'name:weight,name:weight,...')")
      val splits = str(args(2), "splits").split(",").map(_.trim).map { part =>
        part.split(":") match {
          case Array(name, w) => name.trim -> w.trim.toDouble
          case _ => throw new IllegalArgumentException(
            s"split spec '$part' must be name:weight")
        }
      }.toSeq
      Sampling.assignSplits(table(str(args(0), "table")), str(args(1), "idCol"), splits)
        .queryExecution.analyzed
    })

  val pageRankFn: TableFn = (
    FunctionIdentifier("graft_pagerank"),
    new ExpressionInfo(PageRank.getClass.getName, "graft_pagerank"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_pagerank takes (edgesTable, aCol, bCol, iterations)")
      PageRank.pageRank(table(str(args(0), "edgesTable")),
          str(args(1), "aCol"), str(args(2), "bCol"), int(args(3), "iterations"))
        .queryExecution.analyzed
    })

  val curriculumFn: TableFn = (
    FunctionIdentifier("graft_curriculum"),
    new ExpressionInfo(Curriculum.getClass.getName, "graft_curriculum"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_curriculum takes (table, idCol, scoreCol, nPhases)")
      Curriculum.curriculumOrder(table(str(args(0), "table")),
          str(args(1), "idCol"), str(args(2), "scoreCol"), int(args(3), "nPhases"))
        .queryExecution.analyzed
    })

  val budgetSelectFn: TableFn = (
    FunctionIdentifier("graft_budget_select"),
    new ExpressionInfo(Curriculum.getClass.getName, "graft_budget_select"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_budget_select takes (table, idCol, scoreCol, costCol, budget)")
      Curriculum.budgetSelect(table(str(args(0), "table")),
          str(args(1), "idCol"), str(args(2), "scoreCol"), str(args(3), "costCol"),
          int(args(4), "budget").toLong)
        .queryExecution.analyzed
    })

  val retainCanonicalFn: TableFn = (
    FunctionIdentifier("graft_retain_canonical"),
    new ExpressionInfo(Dedup.getClass.getName, "graft_retain_canonical"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_retain_canonical takes (docsTable, pairsTable, idCol, preferenceCol)")
      val idCol = str(args(2), "idCol")
      Dedup.retainCanonical(table(str(args(0), "docsTable")),
          table(str(args(1), "pairsTable")), idCol,
          Seq(col(str(args(3), "preferenceCol")).desc, col(idCol)))
        .queryExecution.analyzed
    })

  val driftFn: TableFn = (
    FunctionIdentifier("graft_drift"),
    new ExpressionInfo(Drift.getClass.getName, "graft_drift"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_drift takes (baseTable, curTable, valueCol, buckets)")
      Drift.numericDrift(table(str(args(0), "baseTable")),
          table(str(args(1), "curTable")), str(args(2), "valueCol"),
          int(args(3), "buckets"))
        .queryExecution.analyzed
    })

  val kAnonymityFn: TableFn = (
    FunctionIdentifier("graft_k_anonymity"),
    new ExpressionInfo(Privacy.getClass.getName, "graft_k_anonymity"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_k_anonymity takes (table, quasiColsCsv, k)")
      Privacy.kAnonymityClasses(table(str(args(0), "table")),
          str(args(1), "quasiCols").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          int(args(2), "k"))
        .queryExecution.analyzed
    })

  val keySkewFn: TableFn = (
    FunctionIdentifier("graft_key_skew"),
    new ExpressionInfo(Skew.getClass.getName, "graft_key_skew"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_key_skew takes (table, keyCol, topK)")
      Skew.keySkewReport(table(str(args(0), "table")),
          str(args(1), "keyCol"), int(args(2), "topK"))
        .queryExecution.analyzed
    })

  val asOfJoinFn: TableFn = (
    FunctionIdentifier("graft_asof_join"),
    new ExpressionInfo(AsOfJoin.getClass.getName, "graft_asof_join"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_asof_join takes (leftTable, rightTable, keyCol, tsCol, rightColsCsv)")
      AsOfJoin.asOfLeft(table(str(args(0), "leftTable")),
          table(str(args(1), "rightTable")), str(args(2), "keyCol"),
          str(args(3), "tsCol"),
          str(args(4), "rightCols").split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .queryExecution.analyzed
    })

  val profileFn: TableFn = (
    FunctionIdentifier("graft_profile"),
    new ExpressionInfo(Profile.getClass.getName, "graft_profile"),
    (args: Seq[Expression]) => {
      require(args.length == 2 || args.length == 3,
        "graft_profile takes (table, colsCsv[, exact])")
      val exact = args.drop(2).headOption.forall {
        case Literal(b: Boolean, _) => b
        case other => throw new IllegalArgumentException(
          s"graft_profile exact must be a boolean literal, got $other")
      }
      Profile.profile(table(str(args(0), "table")),
          str(args(1), "cols").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          exact = exact)
        .queryExecution.analyzed
    })

  val domainQuotaFn: TableFn = (
    FunctionIdentifier("graft_domain_quota"),
    new ExpressionInfo(UrlCuration.getClass.getName, "graft_domain_quota"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_domain_quota takes (table, urlCol, quota, orderCol, idCol)")
      UrlCuration.domainQuota(table(str(args(0), "table")),
          str(args(1), "urlCol"), int(args(2), "quota"),
          Seq(col(str(args(3), "orderCol")).desc, col(str(args(4), "idCol"))))
        .queryExecution.analyzed
    })

  val longestDupFn: TableFn = (
    FunctionIdentifier("graft_longest_dup"),
    new ExpressionInfo(SuffixDedup.getClass.getName, "graft_longest_dup"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_longest_dup takes (table, textCol, idCol, minLen, depth)")
      SuffixDedup.longestDupPerDoc(table(str(args(0), "table")),
          str(args(1), "textCol"), str(args(2), "idCol"),
          int(args(3), "minLen"), int(args(4), "depth"))
        .queryExecution.analyzed
    })

  /** `graft_dbscan(pointsTable, idCol, pairsTable, idA, idB, minPts)` —
    * [[graft.operators.Dbscan.fromPairs]]: the q189/q190 density
    * clustering from SQL, over any neighbor-pair table (exact, bucketed,
    * or incremental — the pair generator stays the caller's choice).
    * Eager like `graft_pagerank` (Components runs at analysis).
    */
  val dbscanFn: TableFn = (
    FunctionIdentifier("graft_dbscan"),
    new ExpressionInfo(operators.Dbscan.getClass.getName, "graft_dbscan"),
    (args: Seq[Expression]) => {
      require(args.length == 6,
        "graft_dbscan takes (pointsTable, idCol, pairsTable, idA, idB, minPts)")
      operators.Dbscan.fromPairs(table(str(args(0), "pointsTable")),
          str(args(1), "idCol"), table(str(args(2), "pairsTable")),
          str(args(3), "idA"), str(args(4), "idB"), int(args(5), "minPts"))
        .queryExecution.analyzed
    })

  /** `graft_wordpiece_vocab(table, textCol, maxPieceLen, vocabSize)` —
    * [[graft.operators.WordPiece.induceVocab]]: the q191 piece
    * vocabulary from SQL.
    */
  val wordpieceVocabFn: TableFn = (
    FunctionIdentifier("graft_wordpiece_vocab"),
    new ExpressionInfo(operators.WordPiece.getClass.getName, "graft_wordpiece_vocab"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_wordpiece_vocab takes (table, textCol, maxPieceLen, vocabSize)")
      operators.WordPiece.induceVocab(table(str(args(0), "table")),
          str(args(1), "textCol"), int(args(2), "maxPieceLen"),
          int(args(3), "vocabSize"))
        .queryExecution.analyzed
    })

  /** `graft_heavy_hitters(table, textCol, k)` —
    * [[graft.operators.HeavyHitters.ofText]]: the q203 exact
    * heavy-hitter mining from SQL (Misra–Gries candidate pruning +
    * broadcast exact verify).
    */
  val heavyHittersFn: TableFn = (
    FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(operators.HeavyHitters.getClass.getName, "graft_heavy_hitters"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_heavy_hitters takes (table, textCol, k)")
      operators.HeavyHitters.ofText(table(str(args(0), "table")),
          str(args(1), "textCol"), int(args(2), "k"))
        .queryExecution.analyzed
    })

  /** `graft_phrase_match(table, textCol, idCol, patternsCsv)` —
    * [[graft.operators.PhraseMatch.matchCounts]]: the q205 blocklist
    * scan from SQL; patterns comma-separated (blocklist phrases with
    * literal commas need the Scala API).
    */
  val phraseMatchFn: TableFn = (
    FunctionIdentifier("graft_phrase_match"),
    new ExpressionInfo(operators.PhraseMatch.getClass.getName, "graft_phrase_match"),
    (args: Seq[Expression]) => {
      require(args.length == 4,
        "graft_phrase_match takes (table, textCol, idCol, patternsCsv)")
      operators.PhraseMatch.matchCounts(table(str(args(0), "table")),
          str(args(1), "textCol"), str(args(2), "idCol"),
          str(args(3), "patternsCsv").split(',').toSeq.map(_.trim))
        .queryExecution.analyzed
    })

  /** Every table function, in registration order — shared by
    * [[GraftExtensions]] and the specs so the two cannot drift.
    */
  val all: Seq[TableFn] =
    Seq(dedupExactFn, weightedSampleFn, quotaPerGroupFn, snapshotDiffFn, bm25Fn,
      contaminateFn, bpePairsFn, hardNegativesFn, mmrFn, rankEvalFn, assignSplitsFn,
      pageRankFn, curriculumFn, budgetSelectFn,
      retainCanonicalFn, driftFn, kAnonymityFn, keySkewFn,
      asOfJoinFn, profileFn, domainQuotaFn, longestDupFn,
      dbscanFn, wordpieceVocabFn, heavyHittersFn, phraseMatchFn)
}
