package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Components, FuzzyJoin}
import org.apache.spark.sql.expressions.Window

/** Round-8d scale proof: the Bloom membership filter at ingest scale and
  * the entity-resolution composition on a planted-mutant corpus.
  *
  * 1. Bloom: 10M built keys into m=2^27 bits (k=3) — the bit table lands
  *    at the analytic fill m(1−e^(−kn/m)) ≈ 27M rows (bounded by m, NOT
  *    by corpus size: the 100-TB story), `pack` folds it to ≤2^21 longs,
  *    and a 1M-key probe (500k planted members + 500k absent) must show
  *    ZERO false negatives and a false-positive rate inside a 2× band of
  *    the analytic (1−e^(−kn/m))^k.
  * 2. Entity resolution: 200k distinct synthetic names + 10k planted
  *    edit-distance-1 mutants → fuzzy pairs → components → golden-record
  *    election. Every planted mutant must land in its source's entity,
  *    every entity elects exactly one canonical, and the output
  *    partitions the input (no row lost, no row duplicated).
  *
  * Run: `sbt "runMain graft.ScaleProofR8d /root/testdata/sf0.1 SCALEPROOF_r8d.json"`
  */
object ScaleProofR8d {

  def main(args: Array[String]): Unit = {
    val outPath = args.lift(1).getOrElse("SCALEPROOF_r8d.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (spark, owned) = Sessions.acquire(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
    spark.sparkContext.setLogLevel("WARN")
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // ---- 1. Bloom at ingest scale -----------------------------------
    val n = 10000000L
    val k = 3
    val m = 1 << 27
    val built = spark.range(n).select(concat(lit("key_"), col("id")).as("key"))
    val t0 = System.nanoTime()
    val bits = Bloom.build(built, "key", k, m)
    bits.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBits = bits.count()
    val buildSec = secs(t0)
    val fill = 1.0 - math.exp(-k.toDouble * n / m)
    val expBits = (m * fill).toLong

    val tP = System.nanoTime()
    val nWords = Bloom.pack(bits).count()
    val packSec = secs(tP)

    // probe: 500k members (every 20th built key) + 500k absent
    val members = spark.range(500000L).select(concat(lit("key_"), col("id") * 20L).as("key"))
    val absent = spark.range(500000L).select(concat(lit("absent_"), col("id")).as("key"))
    val tQ = System.nanoTime()
    val probed = Bloom.probe(bits, members.unionAll(absent), "key", k, m)
      .withColumn("is_built", col("key").startsWith("key_"))
    val agg = probed.agg(
      sum(when(col("is_built") && !col("member"), 1L).otherwise(0L)).as("false_neg"),
      sum(when(!col("is_built") && col("member"), 1L).otherwise(0L)).as("false_pos")).head
    val probeSec = secs(tQ)
    bits.unpersist()
    val falseNeg = agg.getLong(0)
    val falsePos = agg.getLong(1)
    val expFp = math.pow(fill, k) * 500000
    val bloomOk = falseNeg == 0L &&
      falsePos >= expFp / 2 && falsePos <= expFp * 2 &&
      math.abs(nBits - expBits) < expBits / 100

    // ---- 2. entity resolution with planted mutants ------------------
    // base names sparse in key space (stride 101 kills accidental
    // distance-1 pairs); every 20th name gets a planted mutant with one
    // substituted character
    val nNames = 200000L
    val base = spark.range(nNames)
      .select(col("id"), format_string("name%012d", col("id") * 101L).as("s"))
    // deterministic mutant: substitute the LAST character with 'X'. The
    // masked position must be one where every base agrees (multiples of
    // 2020 all end in '0'): masking a variable digit would let mutant
    // pairs whose sources differ at {masked, one other} land at distance
    // 1 of each other (measured: 9.2k such pairs when masking digit 5).
    // With the last digit masked, a distance-1 pair needs its sources to
    // differ by c·10^e — never a multiple of the prime 101 — or by |r|≤9
    // ≡ 0 (mod 101) ⇒ r = 0: each mutant pairs with its source and
    // NOTHING else.
    val mut2 = spark.range(nNames / 20)
      .select((col("id") * 20L + nNames).as("id"),
        concat(substring(format_string("name%012d", col("id") * 20L * 101L), 1, 15),
          lit("X")).as("s"))
    val corpus = base.unionAll(mut2).persist()
    val tE = System.nanoTime()
    val pairs = FuzzyJoin.editDistanceKJoin(corpus, "s", "id", t = 1)
      .select(col("id_a"), col("id_b")).persist()
    val nPairs = pairs.count()
    val comps = Components.connectedComponents(pairs, "id_a", "id_b")
    val elect = Window.partitionBy(col("entity")).orderBy(col("id"))
    val resolved = corpus.select(col("id"))
      .join(comps, Seq("id"), "left")
      .withColumn("entity", coalesce(col("component"), col("id")))
      .withColumn("is_canonical", when(row_number().over(elect) === 1, 1L).otherwise(0L))
      .persist()
    val nRows = resolved.count()
    val erSec = secs(tE)
    // every mutant (id >= nNames) must share an entity with its source
    // (id = (mutantId - nNames), entity = min label = source id)
    val mutantsJoined = resolved.where(col("id") >= nNames)
      .where(col("entity") === (col("id") - nNames))
      .count()
    val nEntities = resolved.agg(countDistinct(col("entity"))).head.getLong(0)
    val nCanon = resolved.where(col("is_canonical") === 1L).count()
    val erOk = nRows == nNames + nNames / 20 &&
      mutantsJoined == nNames / 20 &&
      nCanon == nEntities &&
      nEntities == nNames // each mutant folds into its source's entity
    pairs.unpersist(); corpus.unpersist(); resolved.unpersist()

    val json =
      s"""{"metric":"scaleproof_r8d","bloom":{"built_keys":$n,"k":$k,"m_bits":$m,""" +
      s""""bit_rows":$nBits,"expected_bit_rows":$expBits,"packed_words":$nWords,""" +
      s""""build_sec":${f"$buildSec%.1f"},"pack_sec":${f"$packSec%.1f"},"probe_sec":${f"$probeSec%.1f"},""" +
      s""""probes":1000000,"false_negatives":$falseNeg,"false_positives":$falsePos,""" +
      s""""expected_fp":${f"$expFp%.0f"},"ok":$bloomOk},""" +
      s""""entity_resolution":{"names":$nNames,"planted_mutants":${nNames / 20},""" +
      s""""pairs":$nPairs,"rows_out":$nRows,"mutants_resolved":$mutantsJoined,""" +
      s""""entities":$nEntities,"canonicals":$nCanon,"wall_sec":${f"$erSec%.1f"},"ok":$erOk}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    println(json)
    Sessions.release(spark, owned)
  }
}
