package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, PhraseMatch}

/** Round-16 scale proof: the two new curation families at 100-TB-shaped
  * sizes, every correctness assertion exact by construction.
  *
  * 1. PATTERN-COUNT INDEPENDENCE (PhraseMatch): the same 1M-document
  *    corpus scanned once with a 10-pattern automaton and once with a
  *    10,000-pattern automaton. The match sets are exactly computable by
  *    construction (one planted `bannedphraseK` per 97th document; the
  *    decimal-prefix nesting — "bannedphrase12" inside
  *    "bannedphrase123" — makes the dictionary-suffix machinery fire at
  *    scale), so both runs assert EXACT (rows, total-count) equality
  *    against the closed form, and the wall-clock pair documents the
  *    design claim: per-document cost is O(len + matches), not
  *    O(|patterns|). The naive plan this replaces is |patterns| corpus
  *    scans — 1000× more work at 10k patterns; here the 10k run must
  *    stay within small constant factors of the 10-pattern run.
  *
  * 2. SEGMENT-PIGEONHOLE AT SCALE (HeavyHitters.fromSegments): a stored
  *    LSM state of 10.2M count rows across 200 segments (~2M distinct
  *    tokens) with two planted heavies — `hotall` heavy in EVERY
  *    segment, and `hotfew` heavy in only 6 of 200 segments and BELOW
  *    the local 1/(k+1) share in the other 194 (the case where naive
  *    per-segment top-k mining silently loses the token; the pigeonhole
  *    candidate filter must recover it through its 6 heavy segments and
  *    report the EXACT global sum including the 194 light segments).
  *    Expected output is computed in closed form; the candidate set is
  *    recomputed relationally and must be exactly {hotall, hotfew} —
  *    the "shuffle ∝ candidates, never distinct-token state" claim made
  *    structural.
  *
  * Run: `sbt "runMain graft.ScaleProofR16 unused SCALEPROOF_r16.json"`
  */
object ScaleProofR16 {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r16.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true"))
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    import spark.implicits._

    // ---- 1. phrase matching: 1M docs, 10 vs 10,000 patterns ---------
    // doc i: 12 lexicon words (`tokN`), plus `bannedphrase{i%1000}`
    // spliced mid-document for every 97th doc. Deterministic, no RNG.
    val nDocs = 1000000L
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ",
        array_join(transform(sequence(lit(0), lit(5)),
          i => concat(lit("tok"), pmod(xxhash64(col("id"), i), lit(5000L)))), " "),
        when(pmod(col("id"), lit(97L)) === 0,
          concat(lit("bannedphrase"), pmod(col("id"), lit(1000L)).cast("string")))
          .otherwise(lit("plain")),
        array_join(transform(sequence(lit(6), lit(11)),
          i => concat(lit("tok"), pmod(xxhash64(col("id"), i), lit(5000L)))), " "))
        .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    // closed-form expectation: planted doc i carries k = i%1000 exactly
    // once; pattern m hits iff str(m) is a decimal prefix of str(k)
    // (the trailing char after the phrase is ' ' or end — never a digit)
    def prefixHits(k: Long, pats: Set[String]): Long =
      (1 to k.toString.length).count(l => pats(k.toString.take(l))).toLong
    // rows = Σ per-doc distinct matched patterns (each planted phrase
    // matches `prefixHits` DISTINCT patterns, one row each, count 1);
    // total = the same sum, since every planted count is 1
    val planted = (0L until nDocs by 97L).map(_ % 1000L)
    // two measured passes per set, min taken: the first pass anywhere in
    // the JVM pays the codegen/JIT bill and would bias whichever set
    // runs first (observed 4.4 s first-touch vs 0.55 s warm)
    def run(patNums: Range): (Long, Long, Double) = {
      val pats = patNums.map(n => s"bannedphrase$n")
      def once(): (Long, Long, Double) = {
        val t0 = System.nanoTime()
        val m = PhraseMatch.matchCounts(docs, "text", "doc_id", pats)
          .agg(count(lit(1)), coalesce(sum(col("cnt")), lit(0L))).as[(Long, Long)].collect().head
        (m._1, m._2, secs(t0))
      }
      val (a, b) = (once(), once())
      require((a._1, a._2) == (b._1, b._2), s"nondeterministic match counts: $a vs $b")
      (a._1, a._2, math.min(a._3, b._3))
    }
    val (rows10, total10, sec10) = run(0 until 10)
    val (rows10k, total10k, sec10k) = run(0 until 10000)
    // expectation uses the same numbering (pattern "bannedphraseM" hits
    // text "bannedphraseK" iff str(M) prefixes str(K))
    val expRows10 = planted.map(k => prefixHits(k, (0 until 10).map(_.toString).toSet)).sum
    val expRows10k = planted.map(k => prefixHits(k, (0 until 10000).map(_.toString).toSet)).sum
    val phraseOk10 = rows10 == expRows10 && total10 == expRows10
    val phraseOk10k = rows10k == expRows10k && total10k == expRows10k

    // ---- 2. heavy hitters off a 200-segment LSM state ---------------
    val nBase = 10000000L
    val segsN = 200
    val k = 16
    // per-(seg, tok) aggregated, as the fromSegments contract requires
    // (tokenCounts/countsAvailableNow produce exactly this shape)
    val base = spark.range(nBase).select(
        concat(lit("seg"), pmod(col("id"), lit(segsN.toLong)).cast("string")).as("seg"),
        concat(lit("t"), pmod(xxhash64(col("id")), lit(2000000L)).cast("string")).as("tok"))
      .groupBy("seg", "tok").agg(count(lit(1)).as("cnt"))
    val hotall = spark.range(segsN.toLong).select(
      concat(lit("seg"), col("id").cast("string")).as("seg"),
      lit("hotall").as("tok"), lit(10000L).as("cnt"))
    val hotfew = spark.range(segsN.toLong).select(
      concat(lit("seg"), col("id").cast("string")).as("seg"),
      lit("hotfew").as("tok"),
      when(col("id") < 6, lit(100000L)).otherwise(lit(2500L)).as("cnt"))
    val segments = base.unionByName(hotall).unionByName(hotfew)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stateRows = segments.count()

    // the pigeonhole premise, asserted not assumed: hotfew is BELOW the
    // local 1/(k+1) share in exactly 194 segments and above in 6
    val localHeavySegs = segments.groupBy("seg").agg(sum("cnt").as("ni"))
      .join(segments.where(col("tok") === "hotfew"), "seg")
      .where(col("cnt") * (k + 1) > col("ni")).count()

    val t1 = System.nanoTime()
    val served = HeavyHitters.fromSegments(segments, k)
      .as[(String, Long, Long)].collect().toSeq
    val serveSec = secs(t1)
    // closed form: n = 10M + 200*10k + (6*100k + 194*2500) = 13,085,000
    val nTotal = nBase + segsN * 10000L + 6 * 100000L + 194 * 2500L
    val hotallCnt = segsN * 10000L
    val hotfewCnt = 6 * 100000L + 194 * 2500L
    val expectServed = Seq(("hotall", hotallCnt, 1L), ("hotfew", hotfewCnt, 2L))
      .filter { case (_, c, _) => c * (k + 1) > nTotal }
    val servedOk = served == expectServed
    // structural claim: the candidate set is exactly the two planted
    // tokens — the verify shuffle is 2 tokens, not 2M
    val candidates = segments.groupBy("seg").agg(sum("cnt").as("ni"))
      .join(segments, "seg").where(col("cnt") * (k + 1) > col("ni"))
      .select("tok").distinct().as[String].collect().toSeq.sorted

    val json =
      s"""{"phrase_docs":$nDocs,
         |"phrase_10_rows":$rows10,"phrase_10_expected":$expRows10,"phrase_10_sec":$sec10,
         |"phrase_10k_rows":$rows10k,"phrase_10k_expected":$expRows10k,"phrase_10k_sec":$sec10k,
         |"phrase_wall_ratio_10k_over_10":${sec10k / sec10},
         |"hh_state_rows":$stateRows,"hh_segments":$segsN,"hh_k":$k,
         |"hh_hotfew_locally_heavy_segments":$localHeavySegs,
         |"hh_served":"${served.map { case (t, c, r) => s"$t:$c:$r" }.mkString(",")}",
         |"hh_candidates":"${candidates.mkString(",")}",
         |"hh_serve_sec":$serveSec}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    assert(phraseOk10, s"10-pattern run must match closed form: $rows10/$total10 vs $expRows10")
    assert(phraseOk10k, s"10k-pattern run must match closed form: $rows10k/$total10k vs $expRows10k")
    assert(localHeavySegs == 6L, s"hotfew must be locally heavy in exactly 6 segments, got $localHeavySegs")
    assert(servedOk, s"served=$served expected=$expectServed")
    assert(candidates == Seq("hotall", "hotfew"), s"candidates=$candidates")
    Sessions.release(spark, owned)
  }
}
