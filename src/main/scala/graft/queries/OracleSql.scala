package graft.queries

/** DuckDB oracle SQL, one entry per oracle-checkable query in SparkEntry.
  * Alignment rules (driver hash-compares column-name-sorted values):
  *   - identical output column names on both sides;
  *   - every integer output is BIGINT (DuckDB sums/row_number otherwise
  *     produce HUGEINT which would not match Spark's LongType);
  *   - doubles rounded on both sides;
  *   - dates/timestamps emitted as formatted strings (no temporal-type
  *     representation skew between engines);
  *   - every query totally ordered by explicit ORDER BY with tiebreakers.
  */
object OracleSql {

  /** q33's 60 bit-sum columns + signature reconstruction, generated rather
    * than hand-written.
    */
  private val simhashMd5Sql: String = {
    val bitSums = (0 until 60).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(",\n       ")
    val sig = (0 until 60).map(b =>
      s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" +\n       ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |       $bitSums
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash
       |FROM bits ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain of the md5 mod-prime MinHash + 16-band LSH pipeline
    * (generated with the same affine coefficients as
    * Dedup.minhashSignaturesMd5), ending in a `cand` CTE of candidate
    * pairs. Used by q27 (pairs as output) and q61 (full retention).
    */
  private def minhashCandCtesFrom(rel: String): String = {
    val P = 2147483647L
    val mins = (0 until 64).map { i =>
      val (a, b) = graft.operators.Dedup.minhashMd5Coeffs(i)
      s"min((h*$a+$b)%$P) AS mh$i"
    }.mkString(",\n       ")
    val bandSelects = (0 until 16).map { bnd =>
      val cols = (bnd * 4 until bnd * 4 + 4)
        .map(i => s"CAST(mh$i AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $bnd AS band, concat_ws('_', $cols) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""words AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM $rel WHERE text IS NOT NULL),
       |sh AS (
       |  SELECT doc_id, unnest(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS sh
       |  FROM words),
       |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(sh), 1, 7)) AS BIGINT) AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin
  }

  private val minhashCandCtes: String = minhashCandCtesFrom("documents")

  /** q208/q209 shared CTEs: content-defined chunking replayed — the
    * 8-term B=101 polynomial over trailing chars (BIGINT casts force
    * 64-bit arithmetic; DuckDB would otherwise overflow INT32 on the
    * ascii()·power products), boundaries at H % 61 == 0, slices
    * between consecutive boundaries, empty slices dropped, 0-based
    * chunk_ix over the survivors. `aguard` error()s on non-ASCII text
    * — the documented ascii() cross-engine parity assumption — forced
    * into evaluation through the chunk_ix expression (the lguard/wguard
    * device).
    */
  private val cdcCtes: String =
    s"""d AS (SELECT doc_id, text AS t FROM documents WHERE text IS NOT NULL),
       |aguard AS (SELECT CASE WHEN count(*) > 0 THEN
       |       error('cdc oracle: non-ASCII text breaks ascii() parity') ELSE 0 END AS ok
       |       FROM d WHERE regexp_matches(t, '[^\\x00-\\x7F]')),
       |b AS (
       |  SELECT doc_id, t,
       |    list_filter(generate_series(8, length(t)),
       |      i -> (CAST(ascii(t[i:i]) AS BIGINT)
       |            + ascii(t[i-1:i-1])*CAST(101 AS BIGINT)
       |            + ascii(t[i-2:i-2])*CAST(10201 AS BIGINT)
       |            + ascii(t[i-3:i-3])*CAST(1030301 AS BIGINT)
       |            + ascii(t[i-4:i-4])*CAST(104060401 AS BIGINT)
       |            + ascii(t[i-5:i-5])*10510100501
       |            + ascii(t[i-6:i-6])*1061520150601
       |            + ascii(t[i-7:i-7])*107213535210701) % 61 = 0) AS bnds
       |  FROM d),
       |cx AS (
       |  SELECT doc_id, unnest(
       |    list_filter(
       |      list_transform(generate_series(1, len(bnds) + 1),
       |        ix -> struct_pack(
       |          ix := ix,
       |          chv := t[(CASE WHEN ix = 1 THEN 0 ELSE bnds[ix-1] END) + 1 :
       |                   CASE WHEN ix = len(bnds) + 1 THEN length(t) ELSE bnds[ix] END])),
       |      s -> s.chv <> '')) AS u
       |  FROM b),
       |ch AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY u.ix) - 1
       |         + (SELECT ok FROM aguard) AS BIGINT) AS chunk_ix,
       |    u.chv AS chunk
       |  FROM cx)""".stripMargin

  /** q124/q125/q127/q128: the logistic-regression TRAINING unrolled — one
    * (gradient, weight-update) CTE pair per GD step, generated so the SQL
    * cannot drift from the step count. Arithmetic mirrors
    * operators.LogReg exactly: left-associated z, per-row sigmoid rounded
    * to 9 decimals before the gradient (absorbs libm exp ulp skew),
    * DECIMAL(28,12) gradient sums, half-away-from-zero weight rounding.
    * With `batches = Some(m)` the replay is MINI-BATCH GD: lrbase gains
    * the md5-bucket batch id (Sampling.bucket % m, same pure row function
    * the engine uses) and step k's gradient filters to batch (k−1) % m —
    * `iters` then counts total steps (epochs × m).
    */
  private def logregCtes(iters: Int, batches: Option[Int] = None): String = {
    val feats = Seq("bias", "x_chars", "x_tokens")
    val batchCol = batches.map { m =>
      ",\n         (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)" +
        s" % 10000) % $m AS b"
    }.getOrElse("")
    val base =
      s"""lrbase AS (
        |  SELECT doc_id, 1.0 AS bias,
        |         CAST(n_chars AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS x_chars,
        |         CAST(len(string_split_regex(trim(lower(text)), '${"\\"}s+')) AS DOUBLE)
        |           / CAST(100.0 AS DOUBLE) AS x_tokens,
        |         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y$batchCol
        |  FROM documents WHERE text IS NOT NULL)""".stripMargin
    val iterCtes = (1 to iters).map { k =>
      val w = (f: String) => if (k == 1) "0.0" else s"w_$f"
      val z = s"${w("bias")} * bias + ${w("x_chars")} * x_chars + ${w("x_tokens")} * x_tokens"
      val p = s"round(1.0 / (1.0 + exp(-($z))), 9)"
      val joinPrev = if (k == 1) "" else s" CROSS JOIN w${k - 1}"
      val batchWhere = batches.map(m => s" WHERE b = ${(k - 1) % m}").getOrElse("")
      val gSel = feats.map(f =>
        s"sum(CAST(($p - y) * $f AS DECIMAL(28,12))) AS g_$f").mkString(",\n         ")
      val wSel = feats.map(f =>
        s"round(${w(f)} - 0.5 * (CAST(g_$f AS DOUBLE) / n), 9) AS w_$f").mkString(",\n         ")
      val wFrom = if (k == 1) s"g$k" else s"g$k CROSS JOIN w${k - 1}"
      s"""g$k AS (
         |  SELECT $gSel,
         |         count(*) AS n
         |  FROM lrbase$joinPrev$batchWhere),
         |w$k AS (
         |  SELECT $wSel
         |  FROM $wFrom)""".stripMargin
    }
    (base +: iterCtes).mkString(",\n")
  }

  /** q131: the PCA power-iteration trajectory unrolled — per-dim decimal
    * means, `iters` (per-row projection → d decimal sums → IEEE normalize
    * → 9-decimal round) ladders, final projected/total variance split.
    * Generated per dimension so the SQL cannot drift from the width;
    * arithmetic mirrors operators.Pca exactly: left-associated per-row
    * sums in ascending-j order, DECIMAL(28,9) cross-row accumulation,
    * round-half-away at every driver-side update. sqrt and division are
    * correctly-rounded IEEE ops — no transcendental anywhere — so the
    * replay is bit-exact.
    */
  private def pcaCtes(dim: Int, iters: Int): String = {
    val ds = 1 to dim
    def vj(k: Int, j: Int) =
      if (k == 0) s"(1.0/sqrt(CAST($dim AS DOUBLE)))" else s"v$j"
    val base =
      s"pbase AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE len(embedding) = $dim)"
    val mus = "mus AS (SELECT\n  " + ds.map(j =>
      s"round(CAST(sum(CAST(v[$j] AS DECIMAL(28,9))) AS DOUBLE)/count(*), 9) AS m$j")
      .mkString(",\n  ") + "\n  FROM pbase)"
    val iterCtes = (1 to iters).map { k =>
      val prev = if (k == 1) "" else s" CROSS JOIN w${k - 1}"
      val sTerms = ds.map(j => s"${vj(k - 1, j)} * (v[$j] - m$j)").mkString(" + ")
      val yTerms = ds.map(j =>
        s"sum(CAST(s * (v[$j] - m$j) AS DECIMAL(28,9))) AS y$j").mkString(",\n  ")
      val hTerms = ds.map(j => s"CAST(y$j AS DOUBLE)/n AS h$j").mkString(", ")
      val nrm = ds.map(j => s"h$j*h$j").mkString(" + ")
      val wTerms = ds.map(j => s"round(h$j/nrm, 9) AS v$j").mkString(", ")
      s"""s$k AS (SELECT v, $sTerms AS s FROM pbase CROSS JOIN mus$prev),
         |y$k AS (SELECT
         |  $yTerms,
         |  count(*) AS n FROM s$k CROSS JOIN mus),
         |h$k AS (SELECT $hTerms FROM y$k),
         |n$k AS (SELECT *, sqrt($nrm) AS nrm FROM h$k),
         |w$k AS (SELECT $wTerms FROM n$k)""".stripMargin
    }
    s"$base,\n$mus,\n${iterCtes.mkString(",\n")}"
  }

  /** The engine-pinned per-row projection Σ v_j·(x_j − μ_j) in ascending-j
    * left association, referencing the final w{iters} / mus columns.
    */
  private def pcaScoreExpr(dim: Int): String =
    (1 to dim).map(j => s"v$j * (v[$j] - m$j)").mkString(" + ")

  private def pcaSql(dim: Int, iters: Int): String = {
    val ds = 1 to dim
    val sFin = pcaScoreExpr(dim)
    val tFin = ds.map(j => s"(v[$j] - m$j)*(v[$j] - m$j)").mkString(" + ")
    s"""WITH ${pcaCtes(dim, iters)},
       |fin AS (SELECT $sFin AS s, $tFin AS t FROM pbase CROSS JOIN mus CROSS JOIN w$iters),
       |vr AS (SELECT
       |  round(CAST(sum(CAST(s*s AS DECIMAL(28,9))) AS DOUBLE)/count(*), 9) AS explained_var,
       |  round(CAST(sum(CAST(t AS DECIMAL(28,9))) AS DOUBLE)/count(*), 9) AS vt,
       |  count(*) AS n_vecs FROM fin),
       |sel AS (
       |  ${ds.map(j =>
           s"SELECT $j AS d, m$j AS muv, v$j AS loading FROM mus CROSS JOIN w$iters")
           .mkString("\n  UNION ALL ")})
       |SELECT CAST(d AS BIGINT) AS dim, muv AS mu, loading, explained_var,
       |       CASE WHEN vt > 0 THEN round(explained_var/vt, 9) END AS explained_ratio,
       |       n_vecs
       |FROM sel CROSS JOIN vr ORDER BY dim""".stripMargin
  }

  /** q135: the fitted component folded back over the corpus — one
    * projection score per vector off the same unrolled training CTEs.
    */
  private def pcaScoreSql(dim: Int, iters: Int): String =
    s"""WITH ${pcaCtes(dim, iters)}
       |SELECT vec_id, round(${pcaScoreExpr(dim)}, 9) AS pca1
       |FROM pbase CROSS JOIN mus CROSS JOIN w$iters
       |ORDER BY vec_id""".stripMargin

  /** q132: the JL projection replayed with the SAME plan-time Rademacher
    * coefficients the engine unrolls (the q29/q68 generated-literal
    * precedent — RandomProjection.component is the single source of
    * truth, so the SQL cannot drift from the matrix).
    */
  private def randomProjectionSql(dimIn: Int, dimOut: Int): String = {
    val cols = (1 to dimOut).map { o =>
      val terms = (1 to dimIn).map { i =>
        val s = graft.operators.RandomProjection.component(o, i)
        s"CAST(embedding[$i] AS DOUBLE) * $s"
      }.mkString(" + ")
      s"round(($terms)/sqrt(CAST($dimOut AS DOUBLE)), 9) AS p$o"
    }
    s"""SELECT vec_id,
       |  ${cols.mkString(",\n  ")}
       |FROM embeddings WHERE len(embedding) = $dimIn
       |ORDER BY vec_id""".stripMargin
  }

  /** q118: LSH candidate QUALITY eval — precision/recall of the banded
    * minhash candidates against exact all-pairs 5-gram Jaccard ≥ 0.8
    * truth on a bounded subset (the bands×rows tuning measurement a
    * dedup rollout runs before committing parameters).
    */
  private val dedupEvalSql: String =
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id < 300),
       |${minhashCandCtesFrom("base")},
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |truth AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM shd a JOIN shd b ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(a.shs, b.shs))) >= 0.8),
       |m AS (SELECT
       |  (SELECT count(*) FROM truth) AS n_true,
       |  (SELECT count(*) FROM cand) AS n_cand,
       |  (SELECT count(*) FROM cand JOIN truth USING (id_a, id_b)) AS n_hit)
       |SELECT CAST(n_true AS BIGINT) AS n_true, CAST(n_cand AS BIGINT) AS n_cand,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       round(CASE WHEN n_cand = 0 THEN CAST(0.0 AS DOUBLE)
       |             ELSE CAST(n_hit AS DOUBLE) / n_cand END, 4) AS precision,
       |       round(CASE WHEN n_true = 0 THEN CAST(0.0 AS DOUBLE)
       |             ELSE CAST(n_hit AS DOUBLE) / n_true END, 4) AS recall
       |FROM m""".stripMargin

  /** q116: 3 unrolled damped-PageRank iterations over the minhash
    * candidate-pair graph (the q27 `cand` CTE chain). Literal arithmetic
    * is forced to DOUBLE everywhere — DuckDB's `1.0 - 0.85` is EXACT
    * decimal 0.15 while Scala's is the double 0.15000000000000002, so the
    * damping terms must be computed in double on both engines. Edge
    * contributions quantize to DECIMAL(28,9) before the sum, exactly as
    * the Spark operator does.
    */
  /** One unrolled PageRank iteration CTE (prev → cur) against CTEs named
    * `e` (directed edges src/dst), `deg` (src, d), `verts` (id) — shared
    * by q116 and q117 so the replayed arithmetic cannot drift.
    */
  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (SELECT v.id,
       |  round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |        + CAST(0.85 AS DOUBLE) * coalesce(s.c, CAST(0.0 AS DOUBLE)), 9) AS pr
       |  FROM verts v LEFT JOIN (
       |    SELECT e.dst AS id,
       |           CAST(sum(CAST($prev.pr / deg.d AS DECIMAL(28,9))) AS DOUBLE) AS c
       |    FROM e JOIN $prev ON e.src = $prev.id JOIN deg ON e.src = deg.src
       |    GROUP BY 1) s ON v.id = s.id)""".stripMargin

  private val pageRankSql: String = {
    def iter(prev: String, cur: String): String = prIter(prev, cur)
    s"""WITH $minhashCandCtes,
       |e AS (SELECT id_a AS src, id_b AS dst FROM cand
       |      UNION ALL SELECT id_b, id_a FROM cand),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |verts AS (SELECT DISTINCT src AS id FROM e),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM verts),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT id AS doc_id, pr FROM r3 ORDER BY doc_id""".stripMargin
  }

  /** q143: prIter with the teleport term pinned to the seed indicator —
    * (1−d)·t(v) + d·Σ, same decimal-quantized contribution sum.
    */
  private def pprIter(prev: String, cur: String): String =
    s"""$cur AS (SELECT tp.id,
       |  round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * tp.t
       |        + CAST(0.85 AS DOUBLE) * coalesce(s.c, CAST(0.0 AS DOUBLE)), 9) AS pr
       |  FROM tp LEFT JOIN (
       |    SELECT e.dst AS id,
       |           CAST(sum(CAST($prev.pr / deg.d AS DECIMAL(28,9))) AS DOUBLE) AS c
       |    FROM e JOIN $prev ON e.src = $prev.id JOIN deg ON e.src = deg.src
       |    GROUP BY 1) s ON tp.id = s.id)""".stripMargin

  /** q153: triangle count by the ID-ordered formulation — a different
    * orientation than the engine's degree-ordered one, same count.
    */
  private val triangleStatsSql: String =
    s"""WITH $minhashCandCtes,
       |e AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |      FROM cand WHERE id_a <> id_b),
       |und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT a AS v, count(*) AS deg FROM und GROUP BY 1),
       |tri AS (SELECT count(*) AS t
       |        FROM e e1 JOIN e e2 ON e1.b = e2.a
       |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |st AS (SELECT count(*) AS nv, CAST(sum(deg) / 2 AS BIGINT) AS ne,
       |              CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS nw FROM deg)
       |SELECT CAST(nv AS BIGINT) AS n_vertices, ne AS n_edges, nw AS n_wedges,
       |       CAST(t AS BIGINT) AS n_triangles,
       |       CASE WHEN nw = 0 THEN 0.0 ELSE round(3.0 * t / nw, 9) END AS global_clustering
       |FROM st, tri""".stripMargin

  /** q163: 3 unrolled clamped label-propagation rounds over the minhash
    * candidate graph — majority vote among labeled neighbors with the
    * smallest-label tiebreak (row_number over count desc, label asc),
    * seeds clamped, previous label carried when no vote arrives. Fully
    * discrete: no rounding doctrine needed anywhere.
    */
  // every CTE MATERIALIZED: each round references its predecessor twice
  // (vote join + carry) — inlined, the minhash chain would re-evaluate
  // 2^rounds times (the kcoreSql lesson)
  private def lpIter(prev: String, cur: String): String =
    s"""${cur}w AS MATERIALIZED (
       |  SELECT id, label FROM (
       |    SELECT e.dst AS id, p.label, count(*) AS v,
       |           row_number() OVER (PARTITION BY e.dst
       |                              ORDER BY count(*) DESC, p.label) AS rn
       |    FROM e JOIN $prev p ON e.src = p.id
       |    WHERE p.label IS NOT NULL
       |    GROUP BY e.dst, p.label) WHERE rn = 1),
       |$cur AS MATERIALIZED (SELECT l.id, coalesce(s.sl, w.label, l.label) AS label
       |         FROM $prev l LEFT JOIN ${cur}w w USING (id)
       |         LEFT JOIN seeds s USING (id))""".stripMargin

  private val labelPropSql: String =
    s"""WITH $minhashCandCtes,
       |base AS MATERIALIZED (SELECT DISTINCT id_a AS s, id_b AS d FROM cand),
       |e AS MATERIALIZED (SELECT s AS src, d AS dst FROM base UNION ALL SELECT d, s FROM base),
       |verts AS (SELECT DISTINCT src AS id FROM e),
       |seeds AS MATERIALIZED (SELECT doc_id AS id, min(lang) AS sl FROM documents
       |          WHERE doc_id % 20 = 0 AND lang IS NOT NULL GROUP BY 1),
       |l0 AS MATERIALIZED (SELECT v.id, s.sl AS label FROM verts v LEFT JOIN seeds s USING (id)),
       |${lpIter("l0", "l1")},
       |${lpIter("l1", "l2")},
       |${lpIter("l2", "l3")}
       |SELECT l3.id AS doc_id, l3.label,
       |       CAST(CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_seed
       |FROM l3 LEFT JOIN seeds s USING (id) ORDER BY doc_id""".stripMargin

  /** q169: 3 unrolled k=2 peel rounds over the minhash candidate graph —
    * fully discrete, convergence certified by comparing the last two
    * survivor counts.
    */
  // every CTE MATERIALIZED: each round references its predecessor three
  // times (degree union + two IN subqueries) — inlined, the minhash chain
  // would re-evaluate 3^rounds times and the replay would take minutes
  private def kcoreRound(prevEdges: String, d: String, s: String, e: String): String =
    s"""$d AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
       |  SELECT a AS v FROM $prevEdges UNION ALL SELECT b FROM $prevEdges) GROUP BY 1),
       |$s AS MATERIALIZED (SELECT v FROM $d WHERE deg >= 2),
       |$e AS MATERIALIZED (SELECT a, b FROM $prevEdges
       |       WHERE a IN (SELECT v FROM $s) AND b IN (SELECT v FROM $s))""".stripMargin

  private val kcoreSql: String =
    s"""WITH $minhashCandCtes,
       |e0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |       FROM cand WHERE id_a <> id_b),
       |${kcoreRound("e0", "d1", "s1", "e1")},
       |${kcoreRound("e1", "d2", "s2", "e2")},
       |${kcoreRound("e2", "d3", "s3", "e3")},
       |fin AS (SELECT v, count(*) AS degree FROM (
       |  SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
       |conv AS (SELECT CASE WHEN (SELECT count(*) FROM s2) = (SELECT count(*) FROM s3)
       |                     THEN 1 ELSE 0 END AS c)
       |SELECT s3.v AS doc_id, CAST(coalesce(fin.degree, 0) AS BIGINT) AS degree,
       |       CAST(conv.c AS BIGINT) AS converged
       |FROM s3 LEFT JOIN fin ON s3.v = fin.v CROSS JOIN conv
       |ORDER BY doc_id""".stripMargin

  /** q170: Newman degree assortativity over the minhash graph — exact
    * integer Pearson moments, one final rounded double expression
    * written identically to the engine's.
    */
  private val assortativitySql: String =
    s"""WITH $minhashCandCtes,
       |e0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |       FROM cand WHERE id_a <> id_b),
       |dir AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
       |deg AS MATERIALIZED (SELECT a AS v, count(*) AS d FROM dir GROUP BY 1),
       |xy AS (SELECT da.d AS x, db.d AS y FROM dir
       |       JOIN deg da ON dir.a = da.v JOIN deg db ON dir.b = db.v),
       |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
       |             sum(x*x) AS sxx, sum(y*y) AS syy FROM xy),
       |nv AS (SELECT count(*) AS c FROM deg),
       |ne AS (SELECT count(*) AS c FROM e0)
       |SELECT CAST(nv.c AS BIGINT) AS n_vertices, CAST(ne.c AS BIGINT) AS n_edges,
       |       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
       |            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
       |       END AS assortativity
       |FROM m, nv, ne""".stripMargin

  private val personalizedPageRankSql: String =
    s"""WITH $minhashCandCtes,
       |e AS (SELECT id_a AS src, id_b AS dst FROM cand
       |      UNION ALL SELECT id_b, id_a FROM cand),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |verts AS (SELECT DISTINCT src AS id FROM e),
       |tp AS (SELECT id, CASE WHEN id % 50 = 0 THEN CAST(1.0 AS DOUBLE)
       |                       ELSE CAST(0.0 AS DOUBLE) END AS t FROM verts),
       |r0 AS (SELECT id, t AS pr FROM tp),
       |${pprIter("r0", "r1")},
       |${pprIter("r1", "r2")},
       |${pprIter("r2", "r3")}
       |SELECT id AS doc_id, pr AS ppr FROM r3 ORDER BY doc_id""".stripMargin

  /** q117: q70's component chain + q116's PageRank arithmetic over the
    * SAME confirmed near-dup graph, keeping each component's highest-
    * centrality member (pr desc, doc_id tiebreak); singletons keep
    * themselves with pr 0.
    */
  private val retainCentralSql: String =
    s"""WITH RECURSIVE $minhashCandCtes,
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |nd AS (
       |  SELECT id_a, id_b
       |  FROM cand
       |  JOIN shd da ON da.doc_id = cand.id_a
       |  JOIN shd db ON db.doc_id = cand.id_b
       |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
       |e AS (SELECT id_a AS src, id_b AS dst FROM nd
       |      UNION SELECT id_b, id_a FROM nd),
       |nodes AS (SELECT DISTINCT src AS id FROM e),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, reach.lbl FROM reach JOIN e ON e.src = reach.id),
       |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
       |verts AS (SELECT id FROM nodes),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS pr FROM verts),
       |${prIter("r0", "r1")},
       |${prIter("r1", "r2")},
       |${prIter("r2", "r3")},
       |sel AS (
       |  SELECT d.doc_id, coalesce(r3.pr, CAST(0.0 AS DOUBLE)) AS pr, d.n_chars,
       |         row_number() OVER (PARTITION BY coalesce(c.lbl, d.doc_id)
       |                            ORDER BY coalesce(r3.pr, CAST(0.0 AS DOUBLE)) DESC,
       |                                     d.doc_id) AS rn
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
       |  LEFT JOIN r3 ON r3.id = d.doc_id)
       |SELECT doc_id, pr, n_chars FROM sel WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** q119: per-k coverage as generated UNION branches (the ks are
    * plan-time literals, exactly as in the Spark operator).
    */
  private val vocabCoverageSql: String = {
    val branches = Seq(64, 256, 1024).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS vocab_k,
         |       CAST((SELECT sum(freq) FROM
         |             (SELECT freq FROM freq ORDER BY freq DESC, term LIMIT $k)) AS BIGINT)
         |         AS covered_occurrences""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH freq AS (SELECT term, count(*) AS freq FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |    FROM documents)
       |  GROUP BY 1),
       |total AS (SELECT sum(freq) AS t FROM freq),
       |perk AS (
       |$branches)
       |SELECT vocab_k, covered_occurrences,
       |       round(CAST(covered_occurrences AS DOUBLE) / total.t, 4) AS coverage
       |FROM perk, total ORDER BY vocab_k""".stripMargin
  }

  /** q121: the BPE→vocab→pack export chain. The merge replay encodes each
    * word's token list as a chr(31)-wrapped string — every token wrapped
    * in its OWN separator pair (`␟tok␟␟tok␟…`) — so one left-to-right
    * non-overlapping `replace('␟a␟␟b␟' → '␟ab␟')` per merge rank IS
    * Bpe.replayMerges' greedy-leftmost scan: adjacent matches share no
    * characters (each owns its wrappers), a merged token can never
    * re-match as the same rank's lhs or rhs (strictly longer than both),
    * and partial-token matches are impossible (the pattern requires both
    * full wrappers). Verified exhaustively against the kernel on every
    * distinct corpus word at sf0.001 and sf0.01; chr(31) appears nowhere
    * in the corpus. The tail is q105's vocab/encode/pack SQL with the
    * BPE token stream (ordered by word pos, then within-word pos)
    * replacing the word stream, vocab 16, OOV → 0.
    */
  private val bpeSep = "chr(31)"

  /** One word's characters wrapped in chr(31) separators — every token
    * carries its OWN leading and trailing separator (doubled between
    * tokens), so one replace() pass of `⟂a⟂⟂b⟂ -> ⟂ab⟂` merges exactly
    * the greedy-leftmost non-overlapping occurrences, boundary-sharing
    * repeats included (each occurrence owns its delimiters).
    */
  private val bpeInitState = s"$bpeSep || array_to_string(list_transform(" +
    s"generate_series(1, length(word)), i -> substr(word, i, 1)), $bpeSep || $bpeSep) || $bpeSep"

  /** The q187 training replay, unrolled: iteration i reads sw(i-1)
    * (the sampled distinct-word table with its corpus counts and wrapped
    * symbol state), counts corpus-weighted adjacent pairs, picks the
    * argmax under the engine's exact tie-break (count desc, lhs, rhs),
    * and rewrites every word's state via the separator-replace merge.
    * A merge that finds no pairs (exhausted corpus) leaves m{i} empty;
    * the coalesce(chr(30)) sentinels make the replace a no-op then,
    * matching train()'s early stop.
    */
  private def bpeSampledTrainCtes(nMerges: Int, sampleBuckets: Int): String = {
    val iters = (1 to nMerges).map { i =>
      val prev = s"sw${i - 1}"
      s"""tl$i AS MATERIALIZED (SELECT word, cnt,
         |             string_split(substr(state, 2, length(state) - 2), $bpeSep || $bpeSep) AS toks
         |      FROM $prev),
         |pp$i AS MATERIALIZED (SELECT pr['lhs'] AS lhs, pr['rhs'] AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
         |       FROM (SELECT cnt, unnest(list_transform(generate_series(1, len(toks) - 1),
         |                    j -> {'lhs': toks[j], 'rhs': toks[j + 1]})) AS pr
         |             FROM tl$i WHERE len(toks) >= 2)
         |       GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT lhs, rhs, lhs || rhs AS merged FROM pp$i
         |      ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
         |sw$i AS MATERIALIZED (SELECT word, cnt,
         |             replace(state,
         |               $bpeSep || coalesce((SELECT lhs FROM m$i), chr(30)) || $bpeSep || $bpeSep || coalesce((SELECT rhs FROM m$i), chr(30)) || $bpeSep,
         |               $bpeSep || coalesce((SELECT merged FROM m$i), chr(30)) || $bpeSep) AS state
         |      FROM $prev)""".stripMargin
    }
    s"""sd AS MATERIALIZED (SELECT doc_id, text FROM documents
       |       WHERE text IS NOT NULL
       |         AND CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
       |             % 10000 < $sampleBuckets),
       |sw0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt, $bpeInitState AS state
       |        FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word FROM sd)
       |        WHERE word <> '' GROUP BY word),
       |${iters.mkString(",\n")},
       |""".stripMargin
  }

  /** The shared q121/q187 chain: `replay` rewrites one word's wrapped
    * char state with the merge table (literal or trained-by-CTE), then
    * vocab-16 id encoding and md5-sharded 128-token packing.
    */
  private def bpePackedSqlFrom(prefixCtes: String, replay: String): String =
    s"""WITH ${prefixCtes}w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
       |           FROM documents WHERE text IS NOT NULL),
       |wp AS (SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS wpos FROM w),
       |st AS (SELECT doc_id, wpos, $replay AS state FROM wp WHERE word <> ''),
       |tl AS (SELECT doc_id, wpos,
       |              string_split(substr(state, 2, length(state) - 2), $bpeSep || $bpeSep) AS wtoks
       |       FROM st),
       |wt AS (SELECT doc_id, wpos, unnest(wtoks) AS tok, generate_subscripts(wtoks, 1) AS tpos
       |       FROM tl),
       |toks AS (SELECT doc_id, tok,
       |                row_number() OVER (PARTITION BY doc_id ORDER BY wpos, tpos) AS pos
       |         FROM wt),
       |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
       |vocab AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS tid
       |          FROM (SELECT * FROM freq ORDER BY cnt DESC, tok LIMIT 16)),
       |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |               list(coalesce(tid, 0) ORDER BY pos) AS ids
       |        FROM toks LEFT JOIN vocab USING (tok) GROUP BY doc_id),
       |k AS (SELECT doc_id, n_tokens, ids,
       |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
       |      FROM enc WHERE n_tokens > 0),
       |p AS (SELECT doc_id, ids, key % 8 AS shard,
       |             CAST(sum(n_tokens) OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS BIGINT)
       |               - n_tokens AS start_offset
       |      FROM k),
       |t AS (SELECT shard, start_offset + generate_subscripts(ids, 1) - 1 AS gpos,
       |             unnest(ids) AS tid
       |      FROM p),
       |s AS (SELECT CAST(shard AS BIGINT) AS shard,
       |             CAST(floor(gpos / 128.0) AS BIGINT) AS seq_idx,
       |             gpos % 128 AS off, tid
       |      FROM t)
       |SELECT shard, seq_idx, array_to_string(list(tid ORDER BY off), ',') AS token_ids
       |FROM s GROUP BY 1, 2 HAVING count(*) = 128
       |ORDER BY shard, seq_idx""".stripMargin

  private val bpePackedSql: String = {
    val replay = DocQueries.q121Merges.foldLeft(bpeInitState) { case (acc, (a, b)) =>
      s"replace($acc, $bpeSep || '$a' || $bpeSep || $bpeSep || '$b' || $bpeSep, $bpeSep || '$a$b' || $bpeSep)"
    }
    bpePackedSqlFrom("", replay)
  }

  /** The q186/q188 strip replay from the TRUE keep-first definition — a
    * within-block self-join finds every position's max LCP against any
    * strictly earlier (doc_id, pos) suffix over the WHOLE corpus (see
    * the q186 comment above for why the covered unions coincide with the
    * engine's minLen-window form); `docFilter` restricts the OUTPUT rows
    * only, which is how q188's increment-only report replays.
    */
  private def stripDupSpansSql(docFilter: String): String =
    s"""WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |           FROM documents WHERE regexp_matches(text, '\\S')),
       |st AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS pos
       |       FROM d WHERE len(toks) >= 5),
       |s AS (SELECT doc_id, pos, toks[pos : least(pos + 29, len(toks))] AS sfx FROM st),
       |b AS (SELECT doc_id, pos, sfx, array_to_string(sfx[1:5], ' ') AS blk FROM s),
       |r AS (SELECT l.doc_id, l.pos,
       |        max(coalesce(nullif(list_position(list_transform(generate_series(1, greatest(len(l.sfx), len(e.sfx))), i -> l.sfx[i] IS DISTINCT FROM e.sfx[i]), true), 0) - 1, least(len(l.sfx), len(e.sfx)))) AS strip
       |      FROM b l JOIN b e ON l.blk = e.blk
       |        AND (e.doc_id < l.doc_id OR (e.doc_id = l.doc_id AND e.pos < l.pos))
       |      GROUP BY l.doc_id, l.pos),
       |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + strip - 1)) AS pos
       |        FROM r WHERE strip >= 5),
       |tk AS (SELECT doc_id, t.p AS pos, toks[t.p] AS tok
       |       FROM d, unnest(generate_series(1, len(toks))) t(p)),
       |kept AS (SELECT tk.doc_id, string_agg(tk.tok, ' ' ORDER BY tk.pos) AS stripped, count(*) AS n_kept
       |         FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id AND tk.pos = cov.pos
       |         WHERE cov.pos IS NULL GROUP BY tk.doc_id),
       |bef AS (SELECT doc_id, count(*) AS n_before FROM tk GROUP BY doc_id)
       |SELECT d0.doc_id,
       |       CAST(coalesce(bef.n_before, 0) AS BIGINT) AS n_tokens_before,
       |       CAST(coalesce(bef.n_before, 0) - coalesce(kept.n_kept, 0) AS BIGINT) AS n_tokens_removed,
       |       CASE WHEN d0.text IS NULL THEN NULL ELSE coalesce(kept.stripped, '') END AS text_stripped
       |FROM documents d0
       |LEFT JOIN bef USING (doc_id) LEFT JOIN kept USING (doc_id)
       |WHERE $docFilter
       |ORDER BY doc_id""".stripMargin

  /** q187: the full-corpus replay takes its merges from the trained
    * m1..m8 CTEs as scalar subqueries (chr(30) sentinels neutralize an
    * exhausted iteration), stacked on the training unroll.
    */
  private val bpeSampledPackedSql: String = {
    val replay = (1 to 8).foldLeft(bpeInitState) { (acc, i) =>
      s"replace($acc, $bpeSep || coalesce((SELECT lhs FROM m$i), chr(30)) || $bpeSep || $bpeSep || coalesce((SELECT rhs FROM m$i), chr(30)) || $bpeSep, " +
        s"$bpeSep || coalesce((SELECT merged FROM m$i), chr(30)) || $bpeSep)"
    }
    bpePackedSqlFrom(bpeSampledTrainCtes(nMerges = 8, sampleBuckets = 1000), replay)
  }

  /** q120: candidate pairs (the q27 chain) classified by the unordered
    * pair of splits they span — the train/test leakage audit.
    */
  private val splitLeakageSql: String =
    s"""WITH $minhashCandCtes,
       |sp AS (SELECT doc_id,
       |              CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
       |                        % 10000 < 8000 THEN 'train'
       |                   WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
       |                        % 10000 < 9000 THEN 'validation'
       |                   ELSE 'test' END AS split
       |       FROM documents)
       |SELECT least(a.split, b.split) AS split_lo,
       |       greatest(a.split, b.split) AS split_hi,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM cand JOIN sp a ON cand.id_a = a.doc_id JOIN sp b ON cand.id_b = b.doc_id
       |GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin

  private val minhashPairsMd5Sql: String =
    s"""WITH $minhashCandCtes
       |SELECT id_a, id_b FROM cand ORDER BY id_a, id_b""".stripMargin

  /** q61: candidates (shared CTEs) → exact Jaccard ≥ 0.8 on distinct
    * 5-shingle sets → connected components via recursive CTE → retained
    * corpus (anti-join against each cluster's non-canonical members).
    */
  private val dedupRetentionSql: String =
    s"""WITH RECURSIVE $minhashCandCtes,
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |nd AS (
       |  SELECT id_a, id_b
       |  FROM cand
       |  JOIN shd da ON da.doc_id = cand.id_a
       |  JOIN shd db ON db.doc_id = cand.id_b
       |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM nd
       |       UNION SELECT id_b, id_a FROM nd),
       |nodes AS (SELECT DISTINCT src AS id FROM ed),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
       |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)
       |SELECT doc_id, lang, n_chars FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> lbl)
       |ORDER BY doc_id""".stripMargin

  /** q70: q61's chain up to `comp`, then QUALITY-canonical retention —
    * rank every doc inside its cluster (singletons cluster with
    * themselves via the left-join coalesce) by n_chars desc, doc_id.
    */
  private val retainCanonicalSql: String =
    s"""WITH RECURSIVE $minhashCandCtes,
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |nd AS (
       |  SELECT id_a, id_b
       |  FROM cand
       |  JOIN shd da ON da.doc_id = cand.id_a
       |  JOIN shd db ON db.doc_id = cand.id_b
       |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM nd
       |       UNION SELECT id_b, id_a FROM nd),
       |nodes AS (SELECT DISTINCT src AS id FROM ed),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
       |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |sel AS (
       |  SELECT d.doc_id, d.lang, d.n_chars,
       |         row_number() OVER (PARTITION BY coalesce(c.lbl, d.doc_id)
       |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
       |SELECT doc_id, lang, n_chars FROM sel WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** q83: q70's recursive-CTE cluster chain → canonical keepers, plus the
    * exact-digest keepers, melted into the per-document verdict with the
    * same first-failing-stage precedence as the Spark query.
    */
  private val curationSql: String =
    s"""WITH RECURSIVE $minhashCandCtes,
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |nd AS (
       |  SELECT id_a, id_b
       |  FROM cand
       |  JOIN shd da ON da.doc_id = cand.id_a
       |  JOIN shd db ON db.doc_id = cand.id_b
       |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM nd
       |       UNION SELECT id_b, id_a FROM nd),
       |nodes AS (SELECT DISTINCT src AS id FROM ed),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
       |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
       |sel AS (
       |  SELECT d.doc_id,
       |         row_number() OVER (PARTITION BY coalesce(c.lbl, d.doc_id)
       |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
       |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
       |canon AS (SELECT doc_id FROM sel WHERE rn = 1),
       |exact AS (SELECT min(doc_id) AS doc_id
       |          FROM documents GROUP BY md5(lower(trim(text)))),
       |v AS (
       |  SELECT d.doc_id, d.lang,
       |         len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
       |         (e.doc_id IS NOT NULL) AS is_exact,
       |         (k.doc_id IS NOT NULL) AS is_canon
       |  FROM documents d
       |  LEFT JOIN exact e ON e.doc_id = d.doc_id
       |  LEFT JOIN canon k ON k.doc_id = d.doc_id)
       |SELECT doc_id,
       |       CAST(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END AS BIGINT) AS keep,
       |       reason
       |FROM (SELECT doc_id,
       |        CASE WHEN NOT is_exact THEN 'exact_dup'
       |             WHEN NOT is_canon THEN 'near_dup'
       |             WHEN n_tokens < 20 THEN 'too_short'
       |             WHEN lang NOT IN ('en','es','de','fr') THEN 'lang_filtered'
       |             ELSE 'keep' END AS reason
       |      FROM v)
       |ORDER BY doc_id""".stripMargin

  /** q84: the full candidate set restricted to increment-touching pairs
    * (equal to the incremental band-index join by q72's proven band
    * determinism), Jaccard-verified, then the corpus-priority greedy drop
    * rules and q83's verdict precedence over the odd-id increment.
    */
  private val incrementalCurationSql: String =
    s"""WITH $minhashCandCtes,
       |shd AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, greatest(len(w) - 4, 1)),
       |      i -> array_to_string(w[i:i+4], ' '))) AS shs
       |  FROM words),
       |nd AS (
       |  SELECT id_a, id_b
       |  FROM cand
       |  JOIN shd da ON da.doc_id = cand.id_a
       |  JOIN shd db ON db.doc_id = cand.id_b
       |  WHERE (id_a % 2 = 1 OR id_b % 2 = 1)
       |    AND CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
       |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
       |dropn AS (
       |  SELECT DISTINCT me AS doc_id FROM (
       |    SELECT id_a AS me, id_b AS other FROM nd
       |    UNION ALL SELECT id_b AS me, id_a AS other FROM nd)
       |  WHERE me % 2 = 1 AND (other % 2 = 0 OR other < me)),
       |dig AS (SELECT doc_id, md5(lower(trim(text))) AS dg FROM documents),
       |drope AS (
       |  SELECT DISTINCT i.doc_id
       |  FROM dig i JOIN dig o ON i.dg = o.dg
       |  WHERE i.doc_id % 2 = 1 AND (o.doc_id % 2 = 0 OR o.doc_id < i.doc_id)),
       |v AS (
       |  SELECT d.doc_id, d.lang,
       |         len(string_split_regex(trim(d.text), '\\s+')) AS n_tokens,
       |         (e.doc_id IS NOT NULL) AS ex,
       |         (n.doc_id IS NOT NULL) AS nr
       |  FROM documents d
       |  LEFT JOIN drope e ON e.doc_id = d.doc_id
       |  LEFT JOIN dropn n ON n.doc_id = d.doc_id
       |  WHERE d.doc_id % 2 = 1)
       |SELECT doc_id,
       |       CAST(CASE WHEN reason = 'keep' THEN 1 ELSE 0 END AS BIGINT) AS keep,
       |       reason
       |FROM (SELECT doc_id,
       |        CASE WHEN ex THEN 'exact_dup'
       |             WHEN nr THEN 'near_dup'
       |             WHEN n_tokens < 20 THEN 'too_short'
       |             WHEN lang NOT IN ('en','es','de','fr') THEN 'lang_filtered'
       |             ELSE 'keep' END AS reason
       |      FROM v)
       |ORDER BY doc_id""".stripMargin

  /** q28: md5 SimHash signatures (same CTEs as q33) + all-pairs Hamming ≤ 3
    * — the oracle for the banded (pigeonhole-exact) Spark plan.
    */
  private val simhashPairsSql: String = {
    val bitSums = (0 until 60).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b").mkString(",\n       ")
    val sig = (0 until 60).map(b =>
      s"CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" +\n       ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks),
       |bits AS (
       |  SELECT doc_id,
       |       $bitSums
       |  FROM h GROUP BY doc_id),
       |sigs AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM bits)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q29: deterministic ±1 sign-plane LSH buckets + in-bucket cosine top-5,
    * with the dot products unrolled in the same left-associated order as
    * Similarity.signPlaneBucket so bucket bits match bit for bit.
    */
  private val annLshDetSql: String = {
    val planes = 6
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v,
       |         $buckets AS bucket
       |       FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bk WHERE vec_id % 50 = 0),
       |s AS (SELECT q.qid, bk.vec_id AS nid,
       |             list_dot_product(q.qv, bk.v) /
       |               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(bk.v, bk.v))) AS sim
       |      FROM q JOIN bk ON q.bucket = bk.bucket AND q.qid <> bk.vec_id),
       |r AS (SELECT qid, nid,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
       |      FROM s)
       |SELECT qid, rnk, nid FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin
  }

  /** q178: sign-plane-bucketed hard negatives — annLshDetSql's bucket
    * replay composed with q109's cross-label filter and output shape.
    */
  private val hardNegativesLshSql: String = {
    val planes = 6
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, label, v,
       |         $buckets AS bucket
       |       FROM e),
       |q AS (SELECT vec_id AS anchor_id, label AS anchor_label, v AS qv, bucket
       |      FROM bk WHERE vec_id % 50 = 0),
       |s AS (SELECT q.anchor_id, q.anchor_label,
       |             bk.vec_id AS negative_id, bk.label AS negative_label,
       |             list_dot_product(q.qv, bk.v) /
       |               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(bk.v, bk.v))) AS sim
       |      FROM q JOIN bk ON q.bucket = bk.bucket
       |      WHERE q.anchor_id <> bk.vec_id AND q.anchor_label <> bk.label),
       |r AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
       |             CAST(row_number() OVER (PARTITION BY anchor_id
       |                                     ORDER BY sim DESC, negative_id) AS BIGINT) AS rnk
       |      FROM s)
       |SELECT anchor_id, anchor_label, rnk, negative_id, negative_label
       |FROM r WHERE rnk <= 5 ORDER BY anchor_id, rnk""".stripMargin
  }

  /** q179: mmrRerankSql's unrolled k=3 greedy, but candidates come from
    * the sign-plane bucket join instead of the exact cross product —
    * the same first-stage replay as q29/q178.
    */
  private val mmrLshSql: String = {
    val planes = 6
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v,
       |         $buckets AS bucket
       |       FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bk WHERE vec_id % 50 = 0),
       |s AS (SELECT qid, bk.vec_id AS nid, bk.v AS nv,
       |             ${cosSql("qv", "bk.v")} AS rel
       |      FROM q JOIN bk ON q.bucket = bk.bucket AND q.qid <> bk.vec_id),
       |cand AS (SELECT qid, nid, nv, rel,
       |                row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
       |         FROM s QUALIFY rn <= 10),
       |p1 AS (SELECT qid, nid, nv FROM cand WHERE rn = 1),
       |s2 AS (SELECT c.qid, c.nid, c.nv,
       |              0.5 * c.rel - 0.5 * (${cosSql("c.nv", "p1.nv")}) AS score
       |       FROM cand c JOIN p1 ON c.qid = p1.qid AND c.nid <> p1.nid),
       |p2 AS (SELECT qid, nid, nv FROM s2
       |       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) = 1),
       |s3 AS (SELECT c.qid, c.nid,
       |              0.5 * c.rel - 0.5 * greatest(${cosSql("c.nv", "p1.nv")},
       |                                           ${cosSql("c.nv", "p2.nv")}) AS score
       |       FROM cand c
       |       JOIN p1 ON c.qid = p1.qid JOIN p2 ON c.qid = p2.qid
       |       WHERE c.nid <> p1.nid AND c.nid <> p2.nid),
       |p3 AS (SELECT qid, nid FROM s3
       |       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) = 1)
       |SELECT qid AS query_id, CAST(1 AS BIGINT) AS mmr_rank, nid AS neighbor_id FROM p1
       |UNION ALL
       |SELECT qid, CAST(2 AS BIGINT), nid FROM p2
       |UNION ALL
       |SELECT qid, CAST(3 AS BIGINT), nid FROM p3
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** q68: LSH-bucketed embedding near-dup with the same generated ±1
    * sign-plane buckets as q29 (4 planes here) — DuckDB replays bucket
    * assignment and pair generation, then the q32-style cosine threshold
    * inside the buckets.
    */
  private val embeddingNearDupLshSql: String = {
    val planes = 4
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v,
       |         $buckets AS bucket
       |       FROM e)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       round(list_dot_product(a.v, b.v) /
       |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
       |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) /
       |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q180: q57's recursive-CTE components over q68's BUCKETED pairs —
    * the sign-plane bucket join replaces the exact all-pairs scan.
    */
  private val dedupClustersLshSql: String = {
    val planes = 4
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v,
       |         $buckets AS bucket
       |       FROM e),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |      WHERE list_dot_product(a.v, b.v) /
       |            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM p
       |       UNION SELECT id_b, id_a FROM p),
       |nodes AS (SELECT DISTINCT src AS id FROM ed),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id
       |)
       |SELECT CAST(id AS BIGINT) AS vid, CAST(min(lbl) AS BIGINT) AS comp,
       |       CAST(CASE WHEN id = min(lbl) THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM reach GROUP BY id ORDER BY vid""".stripMargin
  }

  /** q189/q190: deterministic DBSCAN replay over a pair CTE. `pairCtes`
    * must define `e` (vec_id, v DOUBLE[]) and `p` (id_a < id_b neighbor
    * pairs); the tail computes degrees over the doubled edge list, cores
    * at minPts=2 (self excluded), components over core-core edges via the
    * q57 recursive CTE (isolated cores self-label), and border points as
    * the min cluster among adjacent cores — exactly
    * graft.operators.Dbscan.fromPairs.
    */
  private def dbscanSqlFrom(pairCtes: String): String =
    s"""WITH RECURSIVE
       |$pairCtes,
       |pp AS (SELECT id_a, id_b FROM p WHERE id_a <> id_b),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM pp
       |       UNION ALL SELECT id_b, id_a FROM pp),
       |deg AS (SELECT src AS id, count(*) AS deg FROM ed GROUP BY 1),
       |core AS (SELECT id FROM deg WHERE deg >= 2),
       |ce AS (SELECT pp.id_a AS src, pp.id_b AS dst FROM pp
       |       JOIN core ca ON ca.id = pp.id_a
       |       JOIN core cb ON cb.id = pp.id_b),
       |ced AS (SELECT src, dst FROM ce UNION SELECT dst, src FROM ce),
       |cnodes AS (SELECT DISTINCT src AS id FROM ced),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM cnodes
       |  UNION
       |  SELECT ced.dst, reach.lbl FROM reach JOIN ced ON ced.src = reach.id
       |),
       |comp AS (SELECT id, min(lbl) AS c FROM reach GROUP BY 1),
       |corelbl AS (SELECT core.id, coalesce(comp.c, core.id) AS cluster
       |            FROM core LEFT JOIN comp ON comp.id = core.id),
       |border AS (SELECT ed.src AS id, min(cl.cluster) AS cluster
       |           FROM ed JOIN corelbl cl ON cl.id = ed.dst
       |           WHERE ed.src NOT IN (SELECT id FROM core)
       |           GROUP BY 1)
       |SELECT e.vec_id AS vid,
       |       CASE WHEN cl.id IS NOT NULL THEN 'core'
       |            WHEN b.id IS NOT NULL THEN 'border'
       |            ELSE 'noise' END AS role,
       |       CAST(coalesce(cl.cluster, b.cluster) AS BIGINT) AS cluster
       |FROM e LEFT JOIN corelbl cl ON cl.id = e.vec_id
       |LEFT JOIN border b ON b.id = e.vec_id
       |ORDER BY vid""".stripMargin

  private val dbscanSql: String = dbscanSqlFrom(
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |      FROM e a JOIN e b ON a.vec_id < b.vec_id
       |      WHERE list_dot_product(a.v, b.v) /
       |            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4)""".stripMargin)

  private val dbscanLshSql: String = {
    val planes = 4
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    dbscanSqlFrom(
      s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bk AS (SELECT vec_id, v,
         |         $buckets AS bucket
         |       FROM e),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |      WHERE list_dot_product(a.v, b.v) /
         |            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4)""".stripMargin)
  }

  /** q191/q192: the WordPiece vocab CTE chain — distinct lowercased words
    * with corpus counts, every substring up to length 5 (multiplicity
    * kept), top-64 pieces by (count desc, piece asc). Shared by the vocab
    * report and the encode replay.
    */
  private val wordpiecePieceCountCtes: String =
    s"""w AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |       SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |       FROM documents WHERE text IS NOT NULL)
       |     WHERE word <> '' GROUP BY 1),
       |sub AS (SELECT unnest(pieces) AS piece, cnt FROM (
       |       SELECT cnt, flatten(list_transform(generate_series(1, length(word)),
       |                i -> list_transform(generate_series(1, least(5, length(word) - i + 1)),
       |                     l -> substr(word, i, l)))) AS pieces
       |       FROM w)),
       |pc AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM sub GROUP BY 1)""".stripMargin

  private val wordpieceVocabCtes: String =
    s"""$wordpiecePieceCountCtes,
       |vocab AS (SELECT piece, cnt,
       |                 CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS BIGINT) AS rank
       |          FROM (SELECT * FROM pc ORDER BY cnt DESC, piece LIMIT 64))""".stripMargin

  /** q192/q195: greedy maximal munch replayed position-exactly — for
    * every (distinct word, position) the longest vocab piece prefixing
    * the remainder (single-char OOV fallback), then a recursive walk
    * visits exactly the positions the greedy scan visits, and documents
    * stitch their words' piece streams in word order. This IS
    * WordPiece.maxMatch: at a fixed position the longest match is unique,
    * so jump-table + walk = the left-to-right greedy scan. Ends in
    * `docenc` (doc_id, n_words, n_pieces, n_oov, pieces).
    */
  private val wordpieceDocEncCtes: String =
    s"""$wordpieceVocabCtes,
       |dw AS (SELECT word FROM w),
       |pos AS (SELECT word, unnest(generate_series(1, length(word))) AS p FROM dw),
       |mt AS (SELECT pos.word, pos.p, v.piece, length(v.piece) AS l,
       |              row_number() OVER (PARTITION BY pos.word, pos.p
       |                                 ORDER BY length(v.piece) DESC) AS rn
       |       FROM pos JOIN vocab v ON substr(pos.word, pos.p, length(v.piece)) = v.piece),
       |jmp AS (SELECT pos.word, pos.p,
       |               coalesce(m.piece, substr(pos.word, pos.p, 1)) AS piece,
       |               coalesce(m.l, 1) AS l,
       |               CASE WHEN m.piece IS NULL THEN 1 ELSE 0 END AS oov
       |        FROM pos LEFT JOIN (SELECT word, p, piece, l FROM mt WHERE rn = 1) m
       |          ON m.word = pos.word AND m.p = pos.p),
       |walk(word, p) AS (
       |  SELECT word, 1 FROM dw
       |  UNION ALL
       |  SELECT j.word, wk.p + j.l FROM walk wk JOIN jmp j
       |    ON j.word = wk.word AND j.p = wk.p
       |  WHERE wk.p + j.l <= length(j.word)),
       |seg AS (SELECT walk.word, walk.p, j.piece, j.oov FROM walk
       |        JOIN jmp j ON j.word = walk.word AND j.p = walk.p),
       |enc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces,
       |               CAST(sum(oov) AS BIGINT) AS n_oov,
       |               string_agg(piece, ' ' ORDER BY p) AS pieces
       |        FROM seg GROUP BY word),
       |ws AS (SELECT doc_id, unnest(wlist) AS word, generate_subscripts(wlist, 1) AS wpos
       |       FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS wlist
       |             FROM documents WHERE text IS NOT NULL)),
       |docenc AS (SELECT doc_id,
       |                  CAST(count(*) AS BIGINT) AS n_words,
       |                  CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
       |                  CAST(sum(e.n_oov) AS BIGINT) AS n_oov,
       |                  string_agg(e.pieces, ' ' ORDER BY wpos) AS pieces
       |           FROM ws JOIN enc e ON e.word = ws.word
       |           WHERE ws.word <> ''
       |           GROUP BY doc_id)""".stripMargin

  private val wordpieceEncodeSql: String =
    s"""WITH RECURSIVE
       |$wordpieceDocEncCtes
       |SELECT doc_id, n_pieces, n_oov, pieces FROM docenc ORDER BY doc_id""".stripMargin

  /** q195: docenc aggregated per language — fertility (pieces per word)
    * and the OOV-fallback rate, the tokenizer-quality report.
    */
  private val wordpieceFertilitySql: String =
    s"""WITH RECURSIVE
       |$wordpieceDocEncCtes
       |SELECT d.lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(de.n_words) AS BIGINT) AS n_words,
       |       CAST(sum(de.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(de.n_oov) AS BIGINT) AS n_oov,
       |       round(CAST(sum(de.n_pieces) AS DOUBLE) / sum(de.n_words), 4) AS fertility,
       |       round(CAST(sum(de.n_oov) AS DOUBLE) / sum(de.n_pieces), 4) AS oov_rate
       |FROM docenc de JOIN documents d USING (doc_id)
       |GROUP BY 1 ORDER BY lang""".stripMargin

  /** q198: the optimal-segmentation DP replayed LAYER BY LAYER. vopt is
    * every (word, position) option — vocab pieces prefixing the
    * remainder plus the single-char fallback at rank max(vocab)+1; cost
    * = 100000·pieces + rank (integer, count-dominant). Layer d computes
    * the best suffix cost for positions with d characters remaining from
    * the cumulative table of layers < d (backward DP unrolled — corpus
    * words are <= 8 chars, 12 layers carried for headroom, and `lguard`
    * error()s if any word ever exceeds the unroll instead of silently
    * dropping continuation options, ADVICE r14); vch picks
    * each position's argmin option under (total cost, immediate rank) —
    * a total order because ranks are unique — and the q192 recursive
    * walk emits exactly the chosen positions.
    */
  private val viterbiEncodeSql: String = {
    val nLayers = 12
    val layers = (2 to nLayers).map { d =>
      s"""vb$d AS MATERIALIZED (SELECT o.word, o.p, min(o.rcost + coalesce(b.cost, 0)) AS cost
         |        FROM vopt o LEFT JOIN vle${d - 1} b ON b.word = o.word AND b.p = o.p + o.l
         |        WHERE length(o.word) - o.p + 1 = $d
         |          AND (o.p + o.l > length(o.word) OR b.cost IS NOT NULL)
         |        GROUP BY 1, 2),
         |vle$d AS MATERIALIZED (SELECT * FROM vle${d - 1} UNION ALL SELECT * FROM vb$d)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |$wordpieceVocabCtes,
       |dw AS MATERIALIZED (SELECT word FROM w),
       |pos AS MATERIALIZED (SELECT word, unnest(generate_series(1, length(word))) AS p FROM dw),
       |lguard AS (SELECT CASE WHEN max(length(word)) > $nLayers + 1 THEN
       |    error('viterbiEncodeSql: corpus word longer than the $nLayers-layer DP unroll — raise nLayers')
       |    ELSE 0 END AS ok FROM dw),
       |fb AS (SELECT coalesce((SELECT max(rank) FROM vocab), 0) + 1 + (SELECT ok FROM lguard) AS frank),
       |vopt AS MATERIALIZED (
       |  SELECT pos.word, pos.p, v.piece, length(v.piece) AS l,
       |         v.rank, 100000 + v.rank AS rcost
       |  FROM pos JOIN vocab v ON substr(pos.word, pos.p, length(v.piece)) = v.piece
       |  UNION ALL
       |  SELECT word, p, substr(word, p, 1), 1, fb.frank, 100000 + fb.frank
       |  FROM pos, fb),
       |vb1 AS MATERIALIZED (SELECT word, p, min(rcost) AS cost FROM vopt
       |        WHERE length(word) - p + 1 = 1 GROUP BY 1, 2),
       |vle1 AS MATERIALIZED (SELECT * FROM vb1),
       |$layers,
       |vch AS MATERIALIZED (SELECT word, p, piece, l, rank FROM (
       |    SELECT o.word, o.p, o.piece, o.l, o.rank,
       |           row_number() OVER (PARTITION BY o.word, o.p
       |             ORDER BY o.rcost + coalesce(b.cost, 0), o.rank) AS rn
       |    FROM vopt o LEFT JOIN vle$nLayers b ON b.word = o.word AND b.p = o.p + o.l
       |    WHERE o.p + o.l > length(o.word) OR b.cost IS NOT NULL) WHERE rn = 1),
       |walk(word, p) AS (
       |  SELECT word, 1 FROM dw
       |  UNION ALL
       |  SELECT j.word, wk.p + j.l FROM walk wk JOIN vch j
       |    ON j.word = wk.word AND j.p = wk.p
       |  WHERE wk.p + j.l <= length(j.word)),
       |seg AS (SELECT walk.word, walk.p, j.piece, j.rank,
       |               CASE WHEN j.rank = (SELECT frank FROM fb) THEN 1 ELSE 0 END AS oov
       |        FROM walk JOIN vch j ON j.word = walk.word AND j.p = walk.p),
       |venc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces,
       |                CAST(sum(oov) AS BIGINT) AS n_oov,
       |                CAST(sum(rank) AS BIGINT) AS rank_sum,
       |                string_agg(piece, ' ' ORDER BY p) AS pieces
       |         FROM seg GROUP BY word),
       |ws AS (SELECT doc_id, unnest(wlist) AS word, generate_subscripts(wlist, 1) AS wpos
       |       FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS wlist
       |             FROM documents WHERE text IS NOT NULL))
       |SELECT doc_id,
       |       CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(e.n_oov) AS BIGINT) AS n_oov,
       |       CAST(sum(e.rank_sum) AS BIGINT) AS rank_sum,
       |       string_agg(e.pieces, ' ' ORDER BY wpos) AS pieces
       |FROM ws JOIN venc e ON e.word = ws.word
       |WHERE ws.word <> ''
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q199/q200: unigram-LM (SentencePiece) EM training unrolled — both
    * iterations replayed layer by layer, INTEGER-EXACT end to end.
    * Probabilities are integer thousandths (`p3` = GREATEST(1,
    * round½(cnt·10³/total)) via the pure-integer ⌊(2n+d)/(2d)⌋), so the
    * forward/backward DP is exact HUGEINT arithmetic: alpha layers by
    * absolute position (2..9), beta layers by remaining length (1..8),
    * Z = alpha(len+1); the per-(word, piece) expected count is an integer
    * count of BILLIONTHS, g9 = ⌊(2·num·10⁹ + Z) / (2Z)⌋ — no engine's
    * `round(double)` is ever consulted (DuckDB rounds doubles by x·10⁹
    * tricks, the JVM by decimal expansion; they disagree near 9-dp
    * boundaries — observed on this very query before the integer form).
    * The M-step is the same integer rounding over e9 sums. The only
    * float in either engine is the final report division e9/10⁹.
    * `wguard` error()s if any corpus word exceeds the 8-char unroll
    * (past it the al/bl joins would silently drop paths AND the γ9
    * numerator 2·8·Z·10⁹ ≈ 2e36 would approach HUGEINT's 1.7e38).
    * Mirrors graft.operators.UnigramLm exactly.
    */
  private def unigramEmCtes(iters: Int): String = {
    val maxLen = 8
    def iter(i: Int): String = {
      val alphaLayers = (2 to maxLen + 1).map { j =>
        s"""a${i}_$j AS (SELECT o.word, $j AS j, CAST(sum(pa.a * o.w) AS HUGEINT) AS a
           |      FROM opt$i o JOIN al${i}_${j - 1} pa ON pa.word = o.word AND pa.j = o.p
           |      WHERE o.p + o.l = $j GROUP BY 1),
           |al${i}_$j AS (SELECT * FROM al${i}_${j - 1} UNION ALL SELECT * FROM a${i}_$j)""".stripMargin
      }.mkString(",\n")
      val betaLayers = (1 to maxLen).map { r =>
        s"""b${i}_$r AS (SELECT o.word, o.p, CAST(sum(o.w * nb.b) AS HUGEINT) AS b
           |      FROM opt$i o JOIN bl${i}_${r - 1} nb ON nb.word = o.word AND nb.p = o.p + o.l
           |      WHERE length(o.word) - o.p + 1 = $r GROUP BY 1, 2),
           |bl${i}_$r AS (SELECT * FROM bl${i}_${r - 1} UNION ALL SELECT * FROM b${i}_$r)""".stripMargin
      }.mkString(",\n")
      val guard = if (i == 1) " + (SELECT ok FROM wguard)" else ""
      // edge weight at the common denominator: w = p3·1000^(l-1), so
      // paths with different piece counts compare correctly (the
      // numerator of Π(p3/1000) over the shared 1000^n); integer CASE
      // rather than power() — doubles are exact only to ~9e15
      val pow1000 = (1 to maxLen).map(l =>
        s"WHEN ${l} THEN CAST(${BigInt(1000).pow(l - 1)} AS HUGEINT)").mkString(" ")
      s"""opt$i AS MATERIALIZED (SELECT pos.word, pos.p, v.piece, length(v.piece) AS l,
         |      CAST(v.p3 AS HUGEINT) * (CASE length(v.piece) $pow1000 END) AS w
         |      FROM pos JOIN pr$i v ON substr(pos.word, pos.p, length(v.piece)) = v.piece),
         |al${i}_1 AS (SELECT word, 1 AS j, CAST(1 AS HUGEINT)$guard AS a FROM dw),
         |$alphaLayers,
         |bl${i}_0 AS (SELECT word, length(word) + 1 AS p, CAST(1 AS HUGEINT) AS b FROM dw),
         |$betaLayers,
         |z$i AS (SELECT word, a AS z FROM al${i}_${maxLen + 1} WHERE j = length(word) + 1),
         |g$i AS MATERIALIZED (SELECT o.word, o.piece,
         |        (2 * sum(al.a * o.w * bt.b) * 1000000000 + max(z.z)) // (2 * max(z.z)) AS g9
         |      FROM opt$i o
         |      JOIN al${i}_${maxLen + 1} al ON al.word = o.word AND al.j = o.p
         |      JOIN bl${i}_$maxLen bt ON bt.word = o.word AND bt.p = o.p + o.l
         |      JOIN z$i z ON z.word = o.word
         |      GROUP BY 1, 2),
         |e$i AS MATERIALIZED (SELECT g.piece, CAST(sum(g.g9 * dw.cnt) AS HUGEINT) AS e9
         |      FROM g$i g JOIN dw ON dw.word = g.word GROUP BY 1),
         |et$i AS (SELECT CAST(sum(e9) AS HUGEINT) AS t FROM e$i),
         |pr${i + 1} AS (SELECT piece, GREATEST(1, (2 * e9 * 1000 + (SELECT t FROM et$i))
         |        // (2 * (SELECT t FROM et$i))) AS p3 FROM e$i)""".stripMargin
    }
    s"""$wordpiecePieceCountCtes,
       |seedtop AS (SELECT piece, cnt FROM pc ORDER BY cnt DESC, piece LIMIT 64),
       |seed AS (SELECT piece, CAST(max(cnt) AS BIGINT) AS cnt FROM (
       |       SELECT piece, cnt FROM seedtop
       |       UNION ALL SELECT piece, cnt FROM pc WHERE length(piece) = 1) GROUP BY 1),
       |st AS (SELECT CAST(sum(cnt) AS HUGEINT) AS t FROM seed),
       |pr1 AS (SELECT piece, GREATEST(1, (2 * cnt * 1000 + (SELECT t FROM st))
       |       // (2 * (SELECT t FROM st))) AS p3 FROM seed),
       |dw AS MATERIALIZED (SELECT word, cnt FROM w),
       |wguard AS (SELECT CASE WHEN max(length(word)) > $maxLen THEN
       |       error('unigram oracle: corpus word longer than the $maxLen-char HUGEINT-safe unroll')
       |       ELSE 0 END AS ok FROM dw),
       |pos AS MATERIALIZED (SELECT word, unnest(generate_series(1, length(word))) AS p FROM dw),
       |${(1 to iters).map(iter).mkString(",\n")}""".stripMargin
  }

  private val unigramTrainSql: String =
    s"""WITH
       |${unigramEmCtes(2)}
       |SELECT p.piece, CAST(p.p3 AS BIGINT) AS p3,
       |       CAST(e.e9 AS DOUBLE) / 1000000000.0 AS e
       |FROM pr3 p JOIN e2 e USING (piece) ORDER BY piece""".stripMargin

  private val unigramPruneSql: String =
    s"""WITH
       |${unigramEmCtes(2)},
       |tr AS (SELECT p.piece, p.p3, e.e9 FROM pr3 p JOIN e2 e USING (piece)),
       |r0 AS (SELECT piece, p3, e9, row_number() OVER (ORDER BY e9 DESC, piece) AS r FROM tr),
       |kept AS (SELECT * FROM r0 WHERE r <= 24 OR length(piece) = 1)
       |SELECT piece, CAST(p3 AS BIGINT) AS p3,
       |       CAST(row_number() OVER (ORDER BY e9 DESC, piece) AS BIGINT) AS rank
       |FROM kept ORDER BY rank""".stripMargin

  /** q201: max-probability (Viterbi) encoding against the TRAINED +
    * PRUNED unigram LM — the serving tail of the q199/q200 chain. The
    * backward DP maximizes the exact integer path weight
    * Π p3·1000^(l-1) (HUGEINT; ties break score desc then SHORTEST
    * piece, a total order because at fixed (position, length) at most
    * one option exists); the q192/q198 recursive jump walk then replays
    * the chosen segmentation position by position. The OOV fallback
    * (weight one quantum, flagged) is generated only where the single
    * char is NOT in the pruned vocabulary — which [[unigramEmCtes]]'s
    * char-preserving prune makes impossible on this corpus; the branch
    * exists for schema parity with the kernel.
    */
  private val unigramEncodeSql: String = {
    val maxLen = 8
    val pow1000 = (1 to maxLen).map(l =>
      s"WHEN $l THEN CAST(${BigInt(1000).pow(l - 1)} AS HUGEINT)").mkString(" ")
    val mLayers = (1 to maxLen).map { r =>
      s"""mb_$r AS (SELECT o.word, o.p, max(o.w * nb.m) AS m
         |      FROM eopt o JOIN mbl_${r - 1} nb ON nb.word = o.word AND nb.p = o.p + o.l
         |      WHERE length(o.word) - o.p + 1 = $r GROUP BY 1, 2),
         |mbl_$r AS (SELECT * FROM mbl_${r - 1} UNION ALL SELECT * FROM mb_$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |${unigramEmCtes(2)},
       |tr AS (SELECT p.piece, p.p3, e.e9 FROM pr3 p JOIN e2 e USING (piece)),
       |r0 AS (SELECT piece, p3, e9, row_number() OVER (ORDER BY e9 DESC, piece) AS r FROM tr),
       |kept AS (SELECT * FROM r0 WHERE r <= 24 OR length(piece) = 1),
       |vw AS (SELECT piece, length(piece) AS l,
       |       CAST(p3 AS HUGEINT) * (CASE length(piece) $pow1000 END) AS w FROM kept),
       |eopt AS MATERIALIZED (
       |  SELECT pos.word, pos.p, v.piece, v.l, v.w, 0 AS oov
       |  FROM pos JOIN vw v ON substr(pos.word, pos.p, v.l) = v.piece
       |  UNION ALL
       |  SELECT pos.word, pos.p, substr(pos.word, pos.p, 1), 1, CAST(1 AS HUGEINT), 1
       |  FROM pos WHERE NOT EXISTS (
       |    SELECT 1 FROM vw WHERE vw.piece = substr(pos.word, pos.p, 1))),
       |mbl_0 AS (SELECT word, length(word) + 1 AS p, CAST(1 AS HUGEINT) AS m FROM dw),
       |$mLayers,
       |vch AS MATERIALIZED (SELECT word, p, piece, l, oov FROM (
       |    SELECT o.word, o.p, o.piece, o.l, o.oov,
       |           row_number() OVER (PARTITION BY o.word, o.p
       |             ORDER BY o.w * nb.m DESC, o.l) AS rn
       |    FROM eopt o JOIN mbl_$maxLen nb ON nb.word = o.word AND nb.p = o.p + o.l)
       |    WHERE rn = 1),
       |walk(word, p) AS (
       |  SELECT word, 1 FROM dw
       |  UNION ALL
       |  SELECT j.word, wk.p + j.l FROM walk wk JOIN vch j
       |    ON j.word = wk.word AND j.p = wk.p
       |  WHERE wk.p + j.l <= length(j.word)),
       |seg AS (SELECT walk.word, walk.p, j.piece, j.oov
       |        FROM walk JOIN vch j ON j.word = walk.word AND j.p = walk.p),
       |venc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_pieces,
       |                CAST(sum(oov) AS BIGINT) AS n_oov,
       |                string_agg(piece, ' ' ORDER BY p) AS pieces
       |         FROM seg GROUP BY 1),
       |wwt AS (SELECT word, m AS weight FROM mbl_$maxLen WHERE p = 1),
       |ws AS (SELECT doc_id, unnest(wlist) AS word, generate_subscripts(wlist, 1) AS wpos
       |       FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS wlist
       |             FROM documents WHERE text IS NOT NULL))
       |SELECT ws.doc_id,
       |       CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
       |       CAST(sum(e.n_oov) AS BIGINT) AS n_oov,
       |       CAST(CAST(sum(w.weight) AS HUGEINT) AS DOUBLE) AS weight,
       |       string_agg(e.pieces, ' ' ORDER BY wpos) AS pieces
       |FROM ws JOIN venc e ON e.word = ws.word JOIN wwt w ON w.word = ws.word
       |WHERE ws.word <> ''
       |GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** Cosine in DuckDB list arithmetic — the exact formula of the q25/q29
    * chains, shared by the generated MMR and rank-eval oracles.
    */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** q112: the MMR greedy unrolled for k=3 over the exact top-10
    * candidates (λ=0.5) — stage 1 is the relevance argmax, stages 2 and 3
    * re-score the remaining candidates against the selected set with
    * `0.5·rel − 0.5·max cos`, ties to the lower id, exactly the row-local
    * greedy in Rerank.greedyMmr.
    */
  private val mmrRerankSql: String = {
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
       |s AS (SELECT qid, e.vec_id AS nid, e.v AS nv,
       |             ${cosSql("qv", "e.v")} AS rel
       |      FROM q CROSS JOIN e WHERE qid <> e.vec_id),
       |cand AS (SELECT qid, nid, nv, rel,
       |                row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn
       |         FROM s QUALIFY rn <= 10),
       |p1 AS (SELECT qid, nid, nv FROM cand WHERE rn = 1),
       |s2 AS (SELECT c.qid, c.nid, c.nv,
       |              0.5 * c.rel - 0.5 * (${cosSql("c.nv", "p1.nv")}) AS score
       |       FROM cand c JOIN p1 ON c.qid = p1.qid AND c.nid <> p1.nid),
       |p2 AS (SELECT qid, nid, nv FROM s2
       |       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) = 1),
       |s3 AS (SELECT c.qid, c.nid,
       |              0.5 * c.rel - 0.5 * greatest(${cosSql("c.nv", "p1.nv")},
       |                                           ${cosSql("c.nv", "p2.nv")}) AS score
       |       FROM cand c
       |       JOIN p1 ON c.qid = p1.qid JOIN p2 ON c.qid = p2.qid
       |       WHERE c.nid <> p1.nid AND c.nid <> p2.nid),
       |p3 AS (SELECT qid, nid FROM s3
       |       QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) = 1)
       |SELECT qid AS query_id, CAST(1 AS BIGINT) AS mmr_rank, nid AS neighbor_id FROM p1
       |UNION ALL
       |SELECT qid, CAST(2 AS BIGINT), nid FROM p2
       |UNION ALL
       |SELECT qid, CAST(3 AS BIGINT), nid FROM p3
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** q113: the q29 sign-plane chain (approx) joined against the q25 exact
    * chain — per-query overlap, recall@5, and the reciprocal rank of the
    * exact rank-1 item in the approximate list.
    */
  private val rankEvalSql: String = {
    val planes = 6
    val dim = 64
    val buckets = (0 until planes).map { p =>
      val dot = (0 until dim).map { j =>
        val s = graft.operators.Similarity.signPlaneComponent(p, j)
        s"v[${j + 1}]*$s"
      }.mkString(" + ")
      s"CASE WHEN ($dot) >= 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("\n         + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bk AS (SELECT vec_id, v,
       |         $buckets AS bucket
       |       FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bk WHERE vec_id % 50 = 0),
       |exs AS (SELECT qid, e.vec_id AS nid, ${cosSql("qv", "e.v")} AS sim
       |        FROM q CROSS JOIN e WHERE qid <> e.vec_id),
       |ex AS (SELECT qid, nid,
       |              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
       |       FROM exs QUALIFY rnk <= 5),
       |aps AS (SELECT q.qid, bk.vec_id AS nid, ${cosSql("q.qv", "bk.v")} AS sim
       |        FROM q JOIN bk ON q.bucket = bk.bucket AND q.qid <> bk.vec_id),
       |ap AS (SELECT qid, nid,
       |              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
       |       FROM aps QUALIFY rnk <= 5),
       |pq AS (SELECT qid, count(*) AS n_exact FROM ex GROUP BY 1),
       |ov AS (SELECT ex.qid, count(*) AS n_overlap
       |       FROM ex JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid GROUP BY 1),
       |t1 AS (SELECT ex.qid, coalesce(round(1.0 / ap.rnk, 4), 0.0) AS rr
       |       FROM ex LEFT JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
       |       WHERE ex.rnk = 1)
       |SELECT pq.qid AS query_id,
       |       CAST(pq.n_exact AS BIGINT) AS n_exact,
       |       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       |       round(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE) / pq.n_exact, 4) AS recall_at_k,
       |       coalesce(t1.rr, 0.0) AS rr
       |FROM pq LEFT JOIN ov ON pq.qid = ov.qid LEFT JOIN t1 ON pq.qid = t1.qid
       |ORDER BY query_id""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q68_embedding_neardup_lsh" -> embeddingNearDupLshSql,
    "q112_mmr_rerank" -> mmrRerankSql,
    "q113_rank_eval" -> rankEvalSql,

    // replays both incremental rounds: round-1 ids are a dense rank over
    // the even-custkey names, round-2 newcomers continue from count(s1)
    "q69_incremental_dim" ->
      """WITH s1 AS (SELECT DISTINCT c_name FROM customer WHERE c_custkey % 2 = 0),
        |d1 AS (SELECT c_name, row_number() OVER (ORDER BY c_name) AS dim_id FROM s1),
        |s2 AS (SELECT DISTINCT c_name FROM customer
        |       WHERE c_name NOT IN (SELECT c_name FROM s1)),
        |d2 AS (SELECT c_name, (SELECT count(*) FROM s1) + row_number() OVER (ORDER BY c_name) AS dim_id
        |       FROM s2)
        |SELECT c_name, CAST(dim_id AS BIGINT) AS dim_id
        |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
        |ORDER BY c_name""".stripMargin,
    "q53_skew_join" ->
      """SELECT s_name AS supplier_name, count(*) AS n,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_rolling_window" ->
      """SELECT o_custkey AS ck, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS d,
        |       count(*) OVER w AS n_7d,
        |       round(sum(o_totalprice) OVER w, 2) AS sum_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY ck, o_orderkey""".stripMargin,

    "q55_corr_subquery" ->
      """SELECT o_orderkey, o_custkey AS ck, round(o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
        |                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q56_stats_agg" ->
      """SELECT l_returnflag AS flag,
        |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |       round(stddev_samp(l_quantity), 4) AS sd_q,
        |       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
        |       count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q45_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       CAST(grouping(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
        |       count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderstatus)
        |ORDER BY gid, seg, status""".stripMargin,

    "q46_window_battery" ->
      """SELECT o_custkey AS ck, o_orderkey,
        |       CAST(date_diff('day', lag(o_orderdate) OVER wd, o_orderdate) AS BIGINT) AS days_since_prev,
        |       CAST(ntile(4) OVER wd AS BIGINT) AS quartile,
        |       round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 4) AS pct_price,
        |       strftime(min(o_orderdate) OVER (PARTITION BY o_custkey), '%Y-%m-%d') AS first_d
        |FROM orders
        |WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY ck, o_orderkey""".stripMargin,

    "q48_redact" ->
      """SELECT c_custkey AS ck,
        |       regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(c_name, '[0-9]{4,}')) AS BIGINT) AS n_redactions
        |FROM customer ORDER BY ck""".stripMargin,

    "q47_word_freq" ->
      """SELECT term, count(*) AS freq FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term FROM documents)
        |GROUP BY 1 ORDER BY freq DESC, term LIMIT 100""".stripMargin,

    "q49_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, greatest(len(w) - 4, 1)),
        |         i -> array_to_string(w[i:i+4], ' ')))) AS shingle
        |       FROM w),
        |b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0)
        |SELECT s.doc_id, b.bench_id, count(*) AS n_shared
        |FROM sh s JOIN b ON s.shingle = b.shingle AND s.doc_id <> b.bench_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q50_seq_pack" ->
      """WITH t AS (SELECT doc_id, lang,
        |             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |           FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |       CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0) AS BIGINT) AS bin
        |FROM t ORDER BY doc_id""".stripMargin,

    "q51_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000
        |      < CASE WHEN lang = 'en' THEN 1000 ELSE 3000 END
        |ORDER BY doc_id""".stripMargin,

    "q52_repetition" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |              FROM documents),
        |pt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |       count(*) AS n_distinct,
        |       CAST(max(cnt) AS BIGINT) AS top_freq,
        |       round(1.0 - CAST(count(*) AS DOUBLE) / sum(cnt), 4) AS repetition_ratio
        |FROM pt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q27_minhash_pairs" -> minhashPairsMd5Sql,
    "q116_pagerank" -> pageRankSql,
    "q143_personalized_pagerank" -> personalizedPageRankSql,
    "q163_label_prop" -> labelPropSql,
    "q169_kcore" -> kcoreSql,
    "q170_assortativity" -> assortativitySql,
    "q153_triangle_stats" -> triangleStatsSql,
    "q117_retain_central" -> retainCentralSql,
    "q118_dedup_eval" -> dedupEvalSql,
    "q119_vocab_coverage" -> vocabCoverageSql,
    "q120_split_leakage" -> splitLeakageSql,
    "q121_bpe_packed_sequences" -> bpePackedSql,
    "q187_bpe_sampled_train" -> bpeSampledPackedSql,
    "q61_dedup_retention" -> dedupRetentionSql,
    "q70_retain_canonical" -> retainCanonicalSql,
    "q83_curation" -> curationSql,
    "q84_incremental_curation" -> incrementalCurationSql,

    // same tokenization + k=8 shingling as q74; removal is by token
    // position (overlapping hits coalesce via DISTINCT positions), and
    // the rebuild is an ordered string_agg — mirrors stripRepeatedSpans'
    // struct-sort rebuild exactly
    "q122_strip_repeated" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, w,
        |         unnest(generate_series(1, greatest(len(w) - 7, 1))) AS pos
        |  FROM words),
        |grams AS (
        |  SELECT doc_id, pos, least(8, len(w) - pos + 1) AS m,
        |         array_to_string(w[pos:pos+7], ' ') AS span
        |  FROM sh),
        |inv AS (SELECT span FROM grams GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT g.doc_id, g.pos, g.m FROM grams g JOIN inv USING (span)),
        |rem AS (SELECT DISTINCT doc_id, p FROM (
        |  SELECT doc_id, unnest(generate_series(pos, pos + m - 1)) AS p FROM hits)),
        |toks AS (SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) AS pos FROM words),
        |kept AS (SELECT t.doc_id, t.pos, t.word
        |         FROM toks t LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.pos = r.p
        |         WHERE r.p IS NULL)
        |SELECT w.doc_id,
        |       CAST(len(w.w) AS BIGINT) AS n_tokens,
        |       CAST(len(w.w) - count(k.pos) AS BIGINT) AS n_removed,
        |       coalesce(string_agg(k.word, ' ' ORDER BY k.pos), '') AS clean_text
        |FROM words w LEFT JOIN kept k USING (doc_id)
        |GROUP BY w.doc_id, len(w.w)
        |ORDER BY w.doc_id""".stripMargin,

    // symmetric-delete blocking replayed relationally: identity + every
    // single-char deletion as variants, equi-join on the variant, exact
    // levenshtein confirm — the same candidate set FuzzyJoin generates
    "q123_fuzzy_name_join" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS s FROM customer WHERE c_name IS NOT NULL),
        |dels AS (SELECT id, s, unnest(generate_series(1, length(s))) AS i FROM base),
        |vars AS (
        |  SELECT id, s, s AS var FROM base
        |  UNION ALL
        |  SELECT id, s, substr(s, 1, i - 1) || substr(s, i + 1) AS var FROM dels),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS name_a, b.s AS name_b
        |  FROM vars a JOIN vars b ON a.var = b.var AND a.id < b.id)
        |SELECT id_a, id_b, name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // batch-BM25 → slice → rrf fusion: the q99 index/scoring chain for
    // query 1 top-50, fused with q96's dense list via the same rank
    // arithmetic — the serving composition with the .limit(k) re-bound
    "q129_hybrid_serving" ->
      """WITH q AS (
        |  SELECT CAST(v.query_id AS BIGINT) AS query_id, v.term
        |  FROM (VALUES (1, 'spark'), (1, 'shuffle'), (1, 'join'),
        |               (2, 'data'), (2, 'parquet'),
        |               (3, 'the'), (3, 'of'), (3, 'and')) AS v(query_id, term)),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |dft AS (SELECT term, count(*) AS df FROM tf
        |        WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
        |hits AS (
        |  SELECT q.query_id, tf.doc_id,
        |         CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
        |              * CAST(tf AS DOUBLE) * (1.2 + 1.0)
        |              / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))
        |            AS DECIMAL(28,9)) AS ts
        |  FROM tf JOIN q USING (term) JOIN dft USING (term)
        |       JOIN dl USING (doc_id) CROSS JOIN c),
        |scored AS (
        |  SELECT query_id, doc_id, round(CAST(sum(ts) AS DOUBLE), 4) AS score
        |  FROM hits GROUP BY 1, 2),
        |bm AS (SELECT doc_id, score FROM (
        |  SELECT doc_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
        |  FROM scored WHERE query_id = 1)
        |  WHERE rn <= 50),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |dense AS (SELECT doc_id, cos_sim FROM (
        |  SELECT vec_id AS doc_id,
        |         list_dot_product(nv, qv) /
        |           (sqrt(list_dot_product(nv, nv)) * sqrt(list_dot_product(qv, qv))) AS cos_sim
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv
        |        FROM embeddings WHERE vec_id <> 0) CROSS JOIN qv)
        |  ORDER BY cos_sim DESC, doc_id LIMIT 50),
        |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_a FROM bm),
        |rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_b FROM dense),
        |f AS (SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |             coalesce(rank_a, 0) AS rank_a, coalesce(rank_b, 0) AS rank_b,
        |             round((CASE WHEN rank_a IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (rank_a + 60) ELSE 0.0 END)
        |                 + (CASE WHEN rank_b IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (rank_b + 60) ELSE 0.0 END), 6) AS rrf
        |      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
        |SELECT doc_id, rank_a, rank_b, rrf
        |FROM (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 20)
        |ORDER BY doc_id""".stripMargin,

    // the engine demuxes and JPEG-decodes real AVI bytes; the oracle
    // replays the SYNTHESIS formula (3 + id % 5 frames at 32x24, 10 fps,
    // assets on doc_id % 3 = 2 with even id/3) — a hash match proves the
    // real decode recovered exactly what was planted
    "q130_mjpeg_frame_stats" ->
      """SELECT doc_id AS media_id, TRUE AS decoded,
        |       CAST(3 + doc_id % 5 AS BIGINT) AS n_frames,
        |       CAST(32 AS BIGINT) AS width, CAST(24 AS BIGINT) AS height,
        |       10.0 AS fps
        |FROM documents
        |WHERE doc_id % 3 = 2 AND (doc_id // 3) % 2 = 0
        |ORDER BY media_id""".stripMargin,

    // MJPEG-in-MP4 plant formula: id%3==2 docs get 3+id%5 frames at
    // 32x24/10fps; id%5==4 assets are tail-truncated (final sample
    // severed) and MUST quarantine as decoded=false with -1 stats
    "q161_mp4_frame_stats" ->
      """SELECT doc_id AS media_id,
        |       doc_id % 5 <> 4 AS decoded,
        |       CAST(CASE WHEN doc_id % 5 <> 4 THEN 3 + doc_id % 5 ELSE -1 END AS BIGINT) AS n_frames,
        |       CAST(CASE WHEN doc_id % 5 <> 4 THEN 32 ELSE -1 END AS BIGINT) AS width,
        |       CAST(CASE WHEN doc_id % 5 <> 4 THEN 24 ELSE -1 END AS BIGINT) AS height,
        |       CASE WHEN doc_id % 5 <> 4 THEN 10.0 ELSE -1.0 END AS fps
        |FROM documents
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id""".stripMargin,

    // mini-batch GD replay: 2 epochs × 2 md5-bucket batches = 4 unrolled
    // steps, each gradient CTE filtered to its deterministic batch
    "q128_logreg_minibatch" ->
      s"""WITH ${logregCtes(4, batches = Some(2))}
         |SELECT 'bias' AS feature, w_bias AS weight FROM w4
         |UNION ALL SELECT 'x_chars', w_x_chars FROM w4
         |UNION ALL SELECT 'x_tokens', w_x_tokens FROM w4
         |ORDER BY feature""".stripMargin,

    // classifier eval: the oracle replays training, scoring AND the
    // Mann–Whitney rank arithmetic — rank2 = 2·(rows strictly below) +
    // n + 1 is twice the mid-rank, so the rank-sum is exact LONG
    // arithmetic in both engines and only the final divisions are floats
    "q127_logreg_eval" ->
      s"""WITH ${logregCtes(3)},
         |scored AS (
         |  SELECT round(round(1.0 / (1.0 + exp(-(w_bias * bias + w_x_chars * x_chars
         |           + w_x_tokens * x_tokens))), 9), 6) AS score,
         |         CAST(y AS BIGINT) AS pos
         |  FROM lrbase CROSS JOIN w3),
         |byscore AS (
         |  SELECT score, count(*) AS n, CAST(sum(pos) AS BIGINT) AS np
         |  FROM scored GROUP BY score),
         |ranked AS (
         |  SELECT score, n, np,
         |         2 * coalesce(sum(n) OVER (ORDER BY score
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS rank2
         |  FROM byscore),
         |tot AS (
         |  SELECT sum(np) AS p, sum(n - np) AS nn, sum(np * rank2) AS rs2,
         |         sum(CASE WHEN score >= 0.5 THEN np ELSE 0 END) AS tp,
         |         sum(CASE WHEN score >= 0.5 THEN n - np ELSE 0 END) AS fp
         |  FROM ranked)
         |SELECT
         |  round(CASE WHEN p > 0 AND nn > 0 THEN
         |    CAST(rs2 - p * (p + 1) AS DOUBLE) / (2.0 * CAST(p * nn AS DOUBLE)) END, 9) AS auc,
         |  CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
         |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(p - tp AS BIGINT) AS fn, CAST(nn - fp AS BIGINT) AS tn,
         |  round(CASE WHEN tp + fp > 0 THEN
         |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 9) AS precision,
         |  round(CASE WHEN p > 0 THEN
         |    CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) END, 9) AS recall
         |FROM tot""".stripMargin,

    // q125's scoring chain + ClassifierEval.calibration's bin arithmetic:
    // equal-width bins, decimal(28,12) mean/Brier sums, log-loss terms
    // rounded to 9 decimals per row BEFORE summing (the ln doctrine)
    "q133_calibration" ->
      s"""WITH ${logregCtes(3)},
         |scored AS (
         |  SELECT round(round(1.0 / (1.0 + exp(-(w_bias * bias + w_x_chars * x_chars
         |           + w_x_tokens * x_tokens))), 9), 6) AS s, y
         |  FROM lrbase CROSS JOIN w3),
         |b AS (
         |  SELECT CAST(least(floor(s * 1000), 999) AS BIGINT) AS bin, count(*) AS n,
         |         CAST(sum(CASE WHEN y > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |         round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE)/count(*), 9) AS mean_score
         |  FROM scored GROUP BY 1),
         |g AS (
         |  SELECT round(CAST(sum(CAST((s - y)*(s - y) AS DECIMAL(28,12))) AS DOUBLE)/count(*), 9) AS brier,
         |         round(CAST(sum(CAST(round(-(y * ln(greatest(least(s, 1.0 - 1e-9), 1e-9))
         |           + (1.0 - y) * ln(1.0 - greatest(least(s, 1.0 - 1e-9), 1e-9))), 9)
         |           AS DECIMAL(28,12))) AS DOUBLE)/count(*), 9) AS log_loss,
         |         count(*) AS n_total
         |  FROM scored)
         |SELECT bin, n, n_pos, mean_score,
         |       round(CAST(n_pos AS DOUBLE)/CAST(n AS DOUBLE), 9) AS pos_rate,
         |       brier, log_loss, n_total
         |FROM b CROSS JOIN g ORDER BY bin""".stripMargin,

    // threshold-2 oracle is the brute-force pair scan — completeness of
    // the engine's two-level symmetric-delete blocking is exactly what a
    // hash match against the exhaustive baseline proves
    "q126_fuzzy_name_join_t2" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS s FROM customer
        |  WHERE c_name IS NOT NULL AND c_custkey < 2500)
        |SELECT a.id AS id_a, b.id AS id_b, a.s AS name_a, b.s AS name_b,
        |       CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_dist
        |FROM base a JOIN base b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q124_logreg_fit" ->
      s"""WITH ${logregCtes(3)}
         |SELECT 'bias' AS feature, w_bias AS weight FROM w3
         |UNION ALL SELECT 'x_chars', w_x_chars FROM w3
         |UNION ALL SELECT 'x_tokens', w_x_tokens FROM w3
         |ORDER BY feature""".stripMargin,

    // the fitted weights score every row through the same pinned sigmoid;
    // Spark folds them in as literals, here they ride a 1-row cross join
    "q125_logreg_score" ->
      s"""WITH ${logregCtes(3)}
         |SELECT doc_id, x_chars, x_tokens,
         |       round(round(1.0 / (1.0 + exp(-(w_bias * bias + w_x_chars * x_chars
         |         + w_x_tokens * x_tokens))), 9), 6) AS score
         |FROM lrbase CROSS JOIN w3
         |ORDER BY doc_id""".stripMargin,

    "q85_inverted_index" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |              FROM documents)
        |SELECT term,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        |       count(*) AS term_freq,
        |       array_to_string(list_sort(list(DISTINCT doc_id))[1:20], ',') AS postings
        |FROM toks GROUP BY term
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY term""".stripMargin,

    // same assignment CTE as q76; centroid means quantize each member value
    // to DECIMAL(28,9) and sum exactly before one double division (the q71
    // pattern), matching Clustering.lloydStep bit for bit
    "q86_kmeans_step" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        |csim AS (SELECT e.vec_id, e.v, c.cid,
        |                list_dot_product(e.v, c.cv) /
        |                  (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |         FROM e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim) WHERE rn = 1),
        |ex AS (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM assigned)
        |SELECT CAST(cid AS BIGINT) AS cluster_id,
        |       CAST(dim - 1 AS BIGINT) AS dim,
        |       count(*) AS n_members,
        |       round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS centroid
        |FROM ex GROUP BY cid, dim
        |ORDER BY cluster_id, dim""".stripMargin,

    "q88_histogram" ->
      """WITH v AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT min(x) AS mn, max(x) AS mx FROM v),
        |bk AS (SELECT CASE WHEN mx = mn THEN 0
        |                   ELSE least(CAST(floor((x - mn) * 20 / (mx - mn)) AS BIGINT), 19) END AS bucket,
        |              mn, mx
        |       FROM v CROSS JOIN b)
        |SELECT bucket,
        |       round(mn + bucket * ((mx - mn) / 20), 4) AS lo_edge,
        |       round(mn + (bucket + 1) * ((mx - mn) / 20), 4) AS hi_edge,
        |       count(*) AS n_rows
        |FROM bk GROUP BY bucket, mn, mx ORDER BY bucket""".stripMargin,

    // BM25: same arithmetic tree as Index.bm25TopK — constants appear as
    // (1.2 + 1.0)-style runtime sums because the Scala side folds
    // k1 + 1.0 in Double space and the literal 2.2 is a DIFFERENT double
    "q89_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS tf_spark,
        |         sum(CASE WHEN term = 'shuffle' THEN 1 ELSE 0 END) AS tf_shuffle,
        |         sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS tf_join
        |  FROM toks GROUP BY 1),
        |c AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |         sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |         sum(CASE WHEN tf_shuffle > 0 THEN 1 ELSE 0 END) AS df_shuffle,
        |         sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join
        |  FROM perdoc)
        |SELECT doc_id, n_tokens, score FROM (
        |  SELECT doc_id, dl AS n_tokens,
        |         round(
        |           (CASE WHEN tf_spark > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_spark + 0.5) / (df_spark + 0.5))
        |                * CAST(tf_spark AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_spark AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END)
        |           + (CASE WHEN tf_shuffle > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_shuffle + 0.5) / (df_shuffle + 0.5))
        |                * CAST(tf_shuffle AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_shuffle AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END)
        |           + (CASE WHEN tf_join > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_join + 0.5) / (df_join + 0.5))
        |                * CAST(tf_join AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_join AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END), 4) AS score
        |  FROM perdoc CROSS JOIN c)
        |WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    "q90_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 3),
        |n AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |         CASE WHEN o_orderkey % 5 = 0 THEN '0-RUSHED' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 <> 7),
        |d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |              WHEN n.o_orderkey IS NULL THEN 'removed'
        |              WHEN o.o_orderstatus <> n.o_orderstatus
        |                OR o.o_totalprice <> n.o_totalprice
        |                OR o.o_orderpriority <> n.o_orderpriority THEN 'changed'
        |              ELSE 'unchanged' END AS change
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT change, count(*) AS n, min(k) AS min_key, max(k) AS max_key
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q91_source_overlap" ->
      """WITH w AS (SELECT source, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT DISTINCT source, shingle FROM (
        |         SELECT source, unnest(list_transform(
        |           generate_series(1, greatest(len(w) - 4, 1)),
        |           i -> array_to_string(w[i:i+4], ' '))) AS shingle
        |         FROM w)),
        |sizes AS (SELECT source, count(*) AS n_a FROM sh GROUP BY 1),
        |inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
        |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source <> b.source
        |          GROUP BY 1, 2)
        |SELECT src_a, src_b, n_a, n_shared,
        |       round(CAST(n_shared AS DOUBLE) / n_a, 4) AS containment
        |FROM inter JOIN sizes ON sizes.source = inter.src_a
        |ORDER BY src_a, src_b""".stripMargin,

    "q92_length_outliers" ->
      """WITH f AS (
        |  SELECT source,
        |         quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS p25,
        |         quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS p75
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |b AS (SELECT source, p25 - 1.5 * (p75 - p25) AS lo, p75 + 1.5 * (p75 - p25) AS hi FROM f)
        |SELECT d.source, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) < b.lo
        |                  OR CAST(d.n_chars AS DOUBLE) > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(min(b.lo), 4) AS lo_fence,
        |       round(min(b.hi), 4) AS hi_fence
        |FROM documents d JOIN b ON b.source = d.source
        |WHERE d.n_chars IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Efraimidis–Spirakis keys: identical md5-uniform + ln arithmetic on
    // both engines; selection orders by the RAW key, output rounds it
    "q93_weighted_sample" ->
      """SELECT doc_id, n_chars, round(k, 6) AS es_key FROM (
        |  SELECT doc_id, n_chars,
        |         ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
        |            / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
        |  ORDER BY k DESC, doc_id LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

    "q94_dim_stats" ->
      """WITH ex AS (SELECT unnest(CAST(embedding AS DOUBLE[])) AS val,
        |                   generate_subscripts(embedding, 1) AS dim
        |            FROM embeddings)
        |SELECT CAST(dim - 1 AS BIGINT) AS dim, count(*) AS n_vals,
        |       round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_val,
        |       round(min(val), 6) AS min_val,
        |       round(max(val), 6) AS max_val
        |FROM ex GROUP BY dim ORDER BY dim""".stripMargin,

    "q131_pca_top_component" -> pcaSql(64, 3),

    "q132_random_projection" -> randomProjectionSql(64, 16),

    "q135_pca_projection" -> pcaScoreSql(64, 3),

    // TextAnalysis.noveltyScore replayed: the q49 shingle kernel on both
    // halves, reference reduced to its distinct shingle set, left-join
    // seen fraction per incoming document
    "q138_novelty_score" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, greatest(len(w) - 4, 1)),
        |         i -> array_to_string(w[i:i+4], ' ')))) AS shingle
        |       FROM w),
        |d AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
        |r AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0)
        |SELECT d.doc_id, count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
        |       round(1.0 - CAST(sum(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE), 9) AS novelty
        |FROM d LEFT JOIN r ON d.shingle = r.shingle
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // Bloom.build + Bloom.probe replayed: salted-md5 bit positions of the
    // ordering customers (k=3, m=4096), probed with every customer key;
    // member = all 3 positions set, truth joined back for FP visibility
    "q139_bloom_membership" ->
      """WITH keys AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key FROM orders),
        |bits AS (
        |  SELECT DISTINCT CAST(concat('0x', substr(md5(i.i || '_' || key), 1, 12)) AS BIGINT) % 4096 AS pos
        |  FROM keys CROSS JOIN range(3) i(i)),
        |fan AS (
        |  SELECT c_custkey, CAST(concat('0x', substr(md5(i.i || '_' || CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) % 4096 AS pos
        |  FROM (SELECT DISTINCT c_custkey FROM customer) CROSS JOIN range(3) i(i)),
        |hits AS (
        |  SELECT c_custkey, sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM fan LEFT JOIN bits b ON fan.pos = b.pos GROUP BY 1),
        |act AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT CAST(h.c_custkey AS BIGINT) AS c_custkey,
        |       CAST(n_hit AS BIGINT) AS n_hit,
        |       CAST(CASE WHEN n_hit = 3 THEN 1 ELSE 0 END AS BIGINT) AS member,
        |       CAST(CASE WHEN act.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS actual
        |FROM hits h LEFT JOIN act ON h.c_custkey = act.o_custkey
        |ORDER BY c_custkey""".stripMargin,

    // Bloom-prefiltered decontamination replayed: q49's shingle kernel on
    // both fences, the benchmark's k=2/m=2^11 bit table (undersized by
    // design so the FP tail shows), per-shingle all-positions-set
    // verdict, exact confirm, per-doc counts
    "q140_bloom_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, greatest(len(w) - 4, 1)),
        |         i -> array_to_string(w[i:i+4], ' ')))) AS shingle
        |       FROM w),
        |bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        |bits AS (
        |  SELECT DISTINCT CAST(concat('0x', substr(md5(i.i || '_' || shingle), 1, 12)) AS BIGINT) % 2048 AS pos
        |  FROM bsh CROSS JOIN range(2) i(i)),
        |fan AS (
        |  SELECT doc_id, shingle,
        |         CAST(concat('0x', substr(md5(i.i || '_' || shingle), 1, 12)) AS BIGINT) % 2048 AS pos
        |  FROM (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0) CROSS JOIN range(2) i(i)),
        |ps AS (
        |  SELECT doc_id, shingle,
        |         CASE WHEN sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) = 2 THEN 1 ELSE 0 END AS bloom_hit
        |  FROM fan LEFT JOIN bits b ON fan.pos = b.pos GROUP BY 1, 2),
        |pe AS (
        |  SELECT ps.doc_id, ps.bloom_hit,
        |         CASE WHEN bsh.shingle IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
        |  FROM ps LEFT JOIN bsh ON ps.shingle = bsh.shingle)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |       CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
        |       CAST(sum(exact_hit) AS BIGINT) AS n_exact_hits
        |FROM pe GROUP BY 1 HAVING sum(bloom_hit) > 0 ORDER BY doc_id""".stripMargin,

    // Zipf fit replayed: q47's token counts, frequency-ranked top 1000,
    // ln-ln least squares via the same moment-based regr_* closed forms
    "q141_zipf_fit" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word FROM documents),
        |tc AS (SELECT word, count(*) AS freq FROM toks WHERE length(word) > 0 GROUP BY 1),
        |head AS (SELECT word, freq FROM tc ORDER BY freq DESC, word LIMIT 1000),
        |ranked AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank, freq
        |           FROM head)
        |SELECT CAST(count(*) AS BIGINT) AS n_words,
        |       round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope,
        |       round(regr_intercept(ln(freq), ln(rank)), 6) AS zipf_intercept,
        |       round(regr_r2(ln(freq), ln(rank)), 6) AS r2
        |FROM ranked""".stripMargin,

    // Drift.categoricalDrift replayed: per-side category counts,
    // contingency-table chi-square, JS divergence with 0·ln0=0, per-term
    // 9-decimal rounds before the decimal sums
    "q151_categorical_drift" ->
      """WITH b AS (SELECT coalesce(CAST(p_brand AS VARCHAR), '__null__') AS c, count(*) AS cb
        |           FROM part WHERE p_partkey % 2 = 0 GROUP BY 1),
        |c AS (SELECT coalesce(CAST(p_brand AS VARCHAR), '__null__') AS c, count(*) AS cc
        |      FROM part WHERE p_partkey % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(b.c, c.c) AS c, coalesce(cb, 0) AS cb, coalesce(cc, 0) AS cc
        |      FROM b FULL OUTER JOIN c ON b.c = c.c),
        |t AS (SELECT sum(cb) AS nb, sum(cc) AS nc, count(*) AS k FROM j),
        |chi AS (
        |  SELECT round(CAST(sum(CAST(round(
        |    (CAST(cb AS DOUBLE) - CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
        |      * (CAST(cb AS DOUBLE) - CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
        |      / (CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
        |    + (CAST(cc AS DOUBLE) - CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE))
        |      * (CAST(cc AS DOUBLE) - CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE))
        |      / (CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE)), 9) AS DECIMAL(28,12)))
        |    AS DOUBLE), 9) AS chi2
        |  FROM j, t),
        |js AS (
        |  SELECT round(CAST(sum(CAST(round(
        |    CASE WHEN CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) > 0
        |      THEN 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        |           * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        |                / ((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) + CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)) / 2))
        |      ELSE 0 END
        |    + CASE WHEN CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE) > 0
        |      THEN 0.5 * (CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
        |           * ln((CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
        |                / ((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) + CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)) / 2))
        |      ELSE 0 END, 9) AS DECIMAL(28,12))) AS DOUBLE), 9) AS js_divergence
        |  FROM j, t)
        |SELECT CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
        |       CAST(k AS BIGINT) AS n_categories, chi2, js_divergence
        |FROM t, chi, js""".stripMargin,

    // TargetEncode.outOfFold replayed: md5 fold deal, (cat, fold) decimal
    // sums, global prior, leave-fold-out smoothing per row
    "q152_target_encoding" ->
      """WITH rows_ AS (
        |  SELECT o_orderkey, coalesce(CAST(o_orderpriority AS VARCHAR), '__null__') AS cat,
        |         CAST(o_totalprice AS DOUBLE) AS y,
        |         CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) % 5 AS fold
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |bcf AS (SELECT cat, fold, sum(CAST(y AS DECIMAL(28,9))) AS fs, count(*) AS fc
        |        FROM rows_ GROUP BY 1, 2),
        |bc AS (SELECT cat, sum(fs) AS cs, sum(fc) AS cc FROM bcf GROUP BY 1),
        |pr AS (SELECT CAST(sum(CAST(y AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS prior FROM rows_)
        |SELECT r.o_orderkey, r.cat AS o_orderpriority, CAST(r.fold AS BIGINT) AS fold,
        |       round((CAST(cs - fs AS DOUBLE) + prior * 20.0)
        |             / (CAST(cc - fc AS DOUBLE) + 20.0), 9) AS encoded
        |FROM rows_ r JOIN bcf USING (cat, fold) JOIN bc USING (cat) CROSS JOIN pr
        |ORDER BY o_orderkey""".stripMargin,

    // Sketch.kmvPerGroup replayed: q58's md5 hash family, per-group
    // row_number rank <= k, the (k-1)*2^60/kth estimate, exact joined back
    "q144_kmv_per_group" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS grp,
        |         CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
        |kmv AS (SELECT grp, max(h) AS kth_hash, count(*) AS k_seen FROM r WHERE rn <= 64 GROUP BY 1),
        |ex AS (SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_nd
        |       FROM lineitem GROUP BY 1)
        |SELECT kmv.grp AS grp, CAST(k_seen AS BIGINT) AS k_seen, kth_hash,
        |       CASE WHEN k_seen < 64 THEN CAST(k_seen AS DOUBLE)
        |            ELSE round(63.0 * 1152921504606846976.0 / kth_hash, 2) END AS est_nd,
        |       CAST(exact_nd AS BIGINT) AS exact_nd
        |FROM kmv JOIN ex ON kmv.grp = ex.grp ORDER BY 1""".stripMargin,

    // Privacy.lDiversityClasses replayed: class size + distinct
    // sensitive values per quasi combination, verdict at l=3
    "q158_l_diversity" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
        |       CAST(CASE WHEN count(DISTINCT c_mktsegment) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS diverse
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    // TextAnalysis.mergeCollocations replayed: ordered-bigram inventory
    // (support + rounded-PMI gates), gaps-and-islands run resolution with
    // even-offset greedy merges, ordered string_agg rebuild. Positions
    // are 1-based here vs Spark's 0-based posexplode — the run identity
    // pos - row_number() is shift-invariant, so the replay is exact.
    "q167_merge_collocations" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
        |         FROM words),
        |bg AS (SELECT doc_id, pos, tok,
        |              lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |       FROM toks),
        |pc AS (SELECT tok AS a, nxt AS b, count(*) AS nab
        |       FROM bg WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |uc AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM toks),
        |ptot AS (SELECT sum(nab) AS np FROM pc),
        |inv AS (SELECT a, b FROM pc
        |        JOIN uc ua ON pc.a = ua.tok JOIN uc ub ON pc.b = ub.tok
        |        CROSS JOIN tot CROSS JOIN ptot
        |        WHERE nab >= 10
        |          AND round(ln(CAST(nab AS DOUBLE) * nt * nt
        |                       / (CAST(np AS DOUBLE) * ua.n * ub.n)), 9) >= 2.0),
        |cand AS (SELECT bg.doc_id, bg.pos FROM bg
        |         JOIN inv ON bg.tok = inv.a AND bg.nxt = inv.b),
        |runs AS (SELECT doc_id, pos,
        |                pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |         FROM cand),
        |starts AS (SELECT doc_id, pos FROM (
        |  SELECT doc_id, pos, row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos) - 1 AS off
        |  FROM runs) WHERE off % 2 = 0),
        |marked AS (SELECT t.doc_id, t.pos, t.tok,
        |                  CASE WHEN s.pos IS NOT NULL THEN 1 END AS m,
        |                  lag(CASE WHEN s.pos IS NOT NULL THEN 1 END)
        |                    OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS prev_m,
        |                  lead(t.tok) OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS nxt
        |           FROM toks t LEFT JOIN starts s
        |           ON t.doc_id = s.doc_id AND t.pos = s.pos),
        |kept AS (SELECT doc_id, pos,
        |                CASE WHEN m = 1 THEN tok || '_' || nxt ELSE tok END AS outtok,
        |                coalesce(m, 0) AS m
        |         FROM marked WHERE prev_m IS NULL)
        |SELECT doc_id, CAST(count(*) + sum(m) AS BIGINT) AS n_tokens,
        |       CAST(sum(m) AS BIGINT) AS n_merged,
        |       string_agg(outtok, ' ' ORDER BY pos) AS text
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q165's PMI chain re-keyed per anchor: both orientations, one
    // anchor-partitioned rank window, top-3 associates
    "q174_term_associations" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
        |         FROM words),
        |pairs AS (SELECT least(t1.tok, t2.tok) AS a, greatest(t1.tok, t2.tok) AS b
        |          FROM toks t1 JOIN toks t2
        |          ON t1.doc_id = t2.doc_id AND t2.pos > t1.pos AND t2.pos <= t1.pos + 3),
        |pc AS MATERIALIZED (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY 1, 2),
        |uc AS MATERIALIZED (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM toks),
        |ptot AS (SELECT sum(n_ab) AS np FROM pc),
        |pmi AS MATERIALIZED (
        |  SELECT a, b, CAST(n_ab AS BIGINT) AS n_pair,
        |         round(ln(CAST(n_ab AS DOUBLE) * nt * nt
        |                  / (CAST(np AS DOUBLE) * ua.n * ub.n)), 9) AS pmi
        |  FROM pc JOIN uc ua ON pc.a = ua.tok JOIN uc ub ON pc.b = ub.tok
        |  CROSS JOIN tot CROSS JOIN ptot
        |  WHERE n_ab >= 10),
        |directed AS (
        |  SELECT a AS anchor, b AS associate, n_pair, pmi FROM pmi
        |  UNION ALL
        |  SELECT b, a, n_pair, pmi FROM pmi WHERE a <> b),
        |ranked AS (
        |  SELECT anchor, associate, n_pair, pmi,
        |         CAST(row_number() OVER (PARTITION BY anchor
        |           ORDER BY pmi DESC, associate) AS BIGINT) AS rank
        |  FROM directed)
        |SELECT anchor, associate, n_pair, pmi, rank
        |FROM ranked WHERE rank <= 3 ORDER BY anchor, rank""".stripMargin,

    // q165's PMI chain → decimal-rounded PPMI → symmetrized matrix →
    // q155's two unrolled power iterations, end-to-end
    "q173_ppmi_lsa" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
        |         FROM words),
        |pairs AS (SELECT least(t1.tok, t2.tok) AS a, greatest(t1.tok, t2.tok) AS b
        |          FROM toks t1 JOIN toks t2
        |          ON t1.doc_id = t2.doc_id AND t2.pos > t1.pos AND t2.pos <= t1.pos + 3),
        |pc AS MATERIALIZED (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY 1, 2),
        |uc AS MATERIALIZED (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM toks),
        |ptot AS (SELECT sum(n_ab) AS np FROM pc),
        |pmi9 AS MATERIALIZED (
        |  SELECT a, b, round(ln(CAST(n_ab AS DOUBLE) * nt * nt
        |                        / (CAST(np AS DOUBLE) * ua.n * ub.n)), 9) AS pmi
        |  FROM pc JOIN uc ua ON pc.a = ua.tok JOIN uc ub ON pc.b = ub.tok
        |  CROSS JOIN tot CROSS JOIN ptot
        |  WHERE n_ab >= 10),
        |pv AS MATERIALIZED (
        |  SELECT a, b, CAST(round(greatest(CAST(pmi AS DECIMAL(20,9)),
        |                                   CAST(0 AS DECIMAL(20,9))), 4) AS DOUBLE) AS v
        |  FROM pmi9),
        |mat AS MATERIALIZED (
        |  SELECT a AS r, b AS c, v FROM pv WHERE a <> b
        |  UNION ALL SELECT b, a, v FROM pv WHERE a <> b
        |  UNION ALL SELECT a, b, v FROM pv WHERE a = b),
        |u1r AS (SELECT r, CAST(round(sum(CAST(v AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM mat GROUP BY r),
        |n1 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u1r),
        |u1 AS MATERIALIZED (SELECT r, round(u / nm, 9) AS u FROM u1r, n1),
        |w1r AS (SELECT c, CAST(round(sum(CAST(mat.v AS DECIMAL(18,4)) * CAST(u1.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM mat JOIN u1 USING (r) GROUP BY c),
        |m1 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w1r),
        |v1 AS MATERIALIZED (SELECT c, round(w / nm, 9) AS x FROM w1r, m1),
        |u2r AS (SELECT r, CAST(round(sum(CAST(mat.v AS DECIMAL(18,4)) * CAST(v1.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM mat JOIN v1 USING (c) GROUP BY r),
        |n2 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u2r),
        |u2 AS MATERIALIZED (SELECT r, round(u / nm, 9) AS u FROM u2r, n2),
        |w2r AS (SELECT c, CAST(round(sum(CAST(mat.v AS DECIMAL(18,4)) * CAST(u2.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM mat JOIN u2 USING (r) GROUP BY c),
        |m2 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w2r),
        |v2 AS (SELECT c, round(w / nm, 9) AS x FROM w2r, m2)
        |SELECT c AS term, x AS loading FROM v2 ORDER BY loading DESC, term LIMIT 20""".stripMargin,

    // TextAnalysis.sentenceChunks replayed: same terminator-run split,
    // trailing-punctuation strip, token counts, exclusive cumsum,
    // floor(before/budget) assignment, ordered rebuild
    "q172_sentence_chunks" ->
      """WITH sent AS (
        |  SELECT doc_id,
        |         generate_subscripts(string_split_regex(trim(text), '[.!?]+\s+'), 1) AS sidx,
        |         unnest(string_split_regex(trim(text), '[.!?]+\s+')) AS s0
        |  FROM documents WHERE text IS NOT NULL),
        |cleaned AS (
        |  SELECT doc_id, sidx,
        |         trim(regexp_replace(s0, '[.!?]+$', '')) AS sent
        |  FROM sent WHERE trim(s0) <> ''),
        |counted AS (
        |  SELECT doc_id, sidx, sent,
        |         CAST(len(string_split_regex(sent, '\s+')) AS BIGINT) AS ntok
        |  FROM cleaned),
        |assigned AS (
        |  SELECT doc_id, sidx, sent, ntok,
        |         CAST(floor(coalesce(sum(ntok) OVER (PARTITION BY doc_id ORDER BY sidx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 48.0) AS BIGINT) AS chunk_id
        |  FROM counted)
        |SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_sentences,
        |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |       string_agg(sent, ' ' ORDER BY sidx) AS text
        |FROM assigned GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // TextAnalysis.stripHtml replayed: identical shell construction +
    // the identical six-stage regexp chain ((?is)/(?s) inline flags map
    // to DuckDB's 'gis'/'gs' options; &amp; decodes LAST so double-
    // encoded entities decode exactly one level)
    "q171_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         '<html><head><script type="text/javascript">var t = 1 &lt; 2;</script>'
        |         || '<style>body { color: red; }</style></head><body><!-- doc '
        |         || CAST(doc_id AS VARCHAR) || ' --><h1>Doc &amp; friends</h1><p>'
        |         || text || '</p><br/>&nbsp;tail &amp;lt;x&amp;gt;</body></html>' AS html
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gis'),
        |              '<style[^>]*>.*?</style>', ' ', 'gis'),
        |            '<!--.*?-->', ' ', 'gs'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS text
        |  FROM h WHERE html IS NOT NULL)
        |SELECT doc_id, text,
        |       CAST(length(html) AS BIGINT) AS n_chars_in,
        |       CAST(length(text) AS BIGINT) AS n_chars_out
        |FROM s ORDER BY doc_id""".stripMargin,

    // Profile.robustScale replayed: two quantile_cont passes (the q19
    // identity), z rounded to 9, the UNROUNDED |z| drives the fence
    // compare exactly as the engine computes it
    "q168_robust_scale" ->
      """WITH base AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS v
        |              FROM orders WHERE o_totalprice IS NOT NULL),
        |med AS (SELECT quantile_cont(v, 0.5) AS m FROM base),
        |mad AS (SELECT quantile_cont(abs(v - m), 0.5) AS d FROM base, med)
        |SELECT o_orderkey, v AS value,
        |       CASE WHEN d <> 0 THEN round((v - m) / d, 9) END AS z,
        |       CAST(CASE WHEN d <> 0 AND abs((v - m) / d) > 2.0 THEN 1 ELSE 0 END AS BIGINT) AS outlier
        |FROM base, med, mad ORDER BY o_orderkey""".stripMargin,

    // Skew.keySkewReport replayed: count per key, ascending rank-weighted
    // Gini (exact integer S1), top-10 with shares, identical double
    // expression shapes
    "q166_key_skew" ->
      """WITH counts AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
        |                FROM events GROUP BY 1),
        |asc_r AS (SELECT key, n, row_number() OVER (ORDER BY n, key) AS r FROM counts),
        |summ AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |                CAST(sum(n) AS BIGINT) AS n_rows,
        |                sum(r * n) AS s1 FROM asc_r),
        |top AS (SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rank FROM counts)
        |SELECT CAST(rank AS BIGINT) AS rank, key, CAST(n AS BIGINT) AS n,
        |       round(CAST(n AS DOUBLE) / CAST(n_rows AS DOUBLE), 9) AS share,
        |       n_keys, n_rows,
        |       round(2.0 * CAST(s1 AS DOUBLE)
        |               / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
        |             - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE), 9) AS gini
        |FROM top CROSS JOIN summ WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // TextAnalysis.pmiCooccurrence replayed: same tokenization, window
    // pairing by positions i < j <= i+3, unordered least/greatest
    // canonicalization, exact integer counts, one left-associated ln
    // rounded to 9
    "q165_pmi" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos
        |         FROM words),
        |pairs AS (SELECT least(t1.tok, t2.tok) AS a, greatest(t1.tok, t2.tok) AS b
        |          FROM toks t1 JOIN toks t2
        |          ON t1.doc_id = t2.doc_id AND t2.pos > t1.pos AND t2.pos <= t1.pos + 3),
        |pc AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY 1, 2),
        |uc AS (SELECT tok, count(*) AS n FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM toks),
        |ptot AS (SELECT count(*) AS np FROM pairs)
        |SELECT a AS term_a, b AS term_b, CAST(n_ab AS BIGINT) AS n_pair,
        |       round(ln(CAST(n_ab AS DOUBLE) * nt * nt
        |                / (CAST(np AS DOUBLE) * ua.n * ub.n)), 9) AS pmi
        |FROM pc JOIN uc ua ON pc.a = ua.tok JOIN uc ub ON pc.b = ub.tok
        |CROSS JOIN tot CROSS JOIN ptot
        |WHERE n_ab >= 10
        |ORDER BY pmi DESC, term_a, term_b LIMIT 100""".stripMargin,

    // Scd2.initial + merge replayed: one full-outer key join, the four
    // categories as filtered unions, validity dates as strings
    "q164_scd2" ->
      """WITH s1 AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal
        |            FROM customer WHERE c_custkey % 2 = 0),
        |s2 AS (SELECT c_custkey AS k,
        |              CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END AS seg,
        |              c_acctbal AS bal
        |       FROM customer WHERE c_custkey % 13 <> 0),
        |j AS (SELECT s1.k AS ok, s1.seg AS oseg, s1.bal AS obal,
        |             s2.k AS sk, s2.seg AS sseg, s2.bal AS sbal
        |      FROM s1 FULL JOIN s2 ON s1.k = s2.k),
        |merged AS (
        |  SELECT ok AS k, oseg AS seg, obal AS bal, '2026-01-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM j WHERE ok IS NOT NULL AND sk IS NOT NULL
        |    AND oseg IS NOT DISTINCT FROM sseg AND obal IS NOT DISTINCT FROM sbal
        |  UNION ALL
        |  SELECT ok, oseg, obal, '2026-01-01', '2026-02-01', 0
        |  FROM j WHERE ok IS NOT NULL AND sk IS NOT NULL
        |    AND NOT (oseg IS NOT DISTINCT FROM sseg AND obal IS NOT DISTINCT FROM sbal)
        |  UNION ALL
        |  SELECT sk, sseg, sbal, '2026-02-01', NULL, 1
        |  FROM j WHERE ok IS NOT NULL AND sk IS NOT NULL
        |    AND NOT (oseg IS NOT DISTINCT FROM sseg AND obal IS NOT DISTINCT FROM sbal)
        |  UNION ALL
        |  SELECT sk, sseg, sbal, '2026-02-01', NULL, 1 FROM j WHERE ok IS NULL
        |  UNION ALL
        |  SELECT ok, oseg, obal, '2026-01-01', '2026-02-01', 0 FROM j WHERE sk IS NULL)
        |SELECT k AS c_custkey, seg AS c_mktsegment, bal AS c_acctbal,
        |       valid_from, valid_to, CAST(is_current AS BIGINT) AS is_current
        |FROM merged ORDER BY c_custkey, valid_from""".stripMargin,

    // Hits.hits replayed: 2 unrolled mutual-reinforcement rounds over the
    // distinct customer→part purchase edges — exact decimal sums of
    // 9-decimal-grid scores, L1 normalizer as an exact decimal sum, one
    // rounded double division per half-step
    "q162_hits" ->
      """WITH e AS (SELECT DISTINCT o_custkey AS s, l_partkey AS d
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h0 AS (SELECT DISTINCT s, CAST(1.0 AS DOUBLE) AS h FROM e),
        |a1r AS (SELECT d, sum(CAST(h AS DECIMAL(20,9))) AS ar
        |        FROM e JOIN h0 USING (s) GROUP BY d),
        |a1n AS (SELECT sum(ar) AS n FROM a1r),
        |a1 AS (SELECT d, round(CAST(ar AS DOUBLE) / CAST(n AS DOUBLE), 9) AS a FROM a1r, a1n),
        |h1r AS (SELECT s, sum(CAST(a AS DECIMAL(20,9))) AS hr
        |        FROM e JOIN a1 USING (d) GROUP BY s),
        |h1n AS (SELECT sum(hr) AS n FROM h1r),
        |h1 AS (SELECT s, round(CAST(hr AS DOUBLE) / CAST(n AS DOUBLE), 9) AS h FROM h1r, h1n),
        |a2r AS (SELECT d, sum(CAST(h AS DECIMAL(20,9))) AS ar
        |        FROM e JOIN h1 USING (s) GROUP BY d),
        |a2n AS (SELECT sum(ar) AS n FROM a2r),
        |a2 AS (SELECT d, round(CAST(ar AS DOUBLE) / CAST(n AS DOUBLE), 9) AS a FROM a2r, a2n),
        |h2r AS (SELECT s, sum(CAST(a AS DECIMAL(20,9))) AS hr
        |        FROM e JOIN a2 USING (d) GROUP BY s),
        |h2n AS (SELECT sum(hr) AS n FROM h2r),
        |h2 AS (SELECT s, round(CAST(hr AS DOUBLE) / CAST(n AS DOUBLE), 9) AS h FROM h2r, h2n)
        |SELECT 'hub' AS kind, s AS id, h AS score FROM h2
        |UNION ALL
        |SELECT 'authority', d, a FROM a2
        |ORDER BY kind, id""".stripMargin,

    // Privacy.tClosenessClasses replayed: the all-integer prefix-sum EMD
    // (cnt_cv*n - cnt_v*n_c over the classes x bands grid), one unrounded
    // double division, verdict via the exact integer compare
    // 20*emd_int <= 1*n_c*n*(m-1)  (t = 0.05 = 1/20)
    "q160_t_closeness" ->
      """WITH nn AS (
        |  SELECT c_nationkey AS q, CAST(floor(c_acctbal/1000) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |corpus AS (SELECT v, count(*) AS cv FROM nn GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM nn),
        |cls AS (SELECT q, count(*) AS nc FROM nn GROUP BY 1),
        |cv2 AS (SELECT q, v, count(*) AS ccv FROM nn GROUP BY 1, 2),
        |grid AS (SELECT cls.q, corpus.v, cls.nc, corpus.cv, tot.n,
        |                coalesce(cv2.ccv, 0) AS ccv
        |         FROM cls CROSS JOIN corpus CROSS JOIN tot
        |         LEFT JOIN cv2 ON cv2.q = cls.q AND cv2.v = corpus.v),
        |pre AS (SELECT q, nc, n, v, ccv*n - cv*nc AS d,
        |               sum(ccv*n - cv*nc) OVER (PARTITION BY q ORDER BY v) AS pfx
        |        FROM grid),
        |agg AS (SELECT q, nc, n, count(*) AS m,
        |               sum(abs(pfx)) AS emd_int, sum(abs(d)) AS tvd_int
        |        FROM pre GROUP BY 1, 2, 3)
        |SELECT q AS c_nationkey, CAST(nc AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |       CASE WHEN m > 1 THEN CAST(emd_int AS DOUBLE) / CAST(nc*n*(m-1) AS DOUBLE)
        |            ELSE 0.0 END AS emd,
        |       CAST(tvd_int AS DOUBLE) / CAST(2*nc*n AS DOUBLE) AS tvd,
        |       CAST(CASE WHEN 20*emd_int <= nc*n*(m-1) THEN 1 ELSE 0 END AS BIGINT) AS close
        |FROM agg ORDER BY 1""".stripMargin,

    // Privacy.kAnonymityClasses replayed: one aggregation per quasi
    // combination, verdict at k=10
    "q145_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(CASE WHEN count(*) >= 10 THEN 1 ELSE 0 END AS BIGINT) AS anonymous
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Perceptual aHash over the planted block corpus: the oracle
    // recomputes every hash from the plant formula alone (forced blocks
    // 0/63, md5 nibble bit elsewhere, sibling flips on blocks 1-2,
    // LSB-first pack) — no pixel ever touched oracle-side
    "q147_image_ahash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b))
        |SELECT media_id, CAST(1 AS BIGINT) AS decoded,
        |       CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |FROM bits GROUP BY 1 ORDER BY media_id""".stripMargin,

    // Perceptual near-dup pairs: plant-formula hashes + the documented
    // O(n^2) xor/bit_count pair scan as the exact baseline the banded
    // engine plan must reproduce
    "q148_image_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b)),
        |h AS (
        |  SELECT media_id,
        |         CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |  FROM bits GROUP BY 1)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY 1, 2""".stripMargin,

    // Audio fingerprint + near-dup: the SAME plant formula as
    // q147/q148 (deliberate: two independent codec kernels — PPM pixel
    // averaging vs PCM energy windows — must land on the identical
    // planted truth)
"q149_audio_fingerprint" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b))
        |SELECT media_id, CAST(1 AS BIGINT) AS decoded,
        |       CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |FROM bits GROUP BY 1 ORDER BY media_id""".stripMargin,

    // Perceptual near-dup pairs: plant-formula hashes + the documented
    // O(n^2) xor/bit_count pair scan as the exact baseline the banded
    // engine plan must reproduce
    "q150_audio_neardup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b)),
        |h AS (
        |  SELECT media_id,
        |         CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |  FROM bits GROUP BY 1)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |       CAST(bit_count(xor(a.ahash, b.ahash)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
        |ORDER BY 1, 2""".stripMargin,

    // Lsa.topTermVector replayed: q43's TF-IDF matrix, two unrolled power
    // steps, each half-step a join+sum matvec with the decimal
    // quantization and per-half-step normalization
    "q155_lsa_topic" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |a AS (SELECT tf.doc_id AS r, tf.term AS c,
        |             round(tf.tf * ln(CAST(nn.n AS DOUBLE) / docfreq.df), 4) AS v
        |      FROM tf JOIN docfreq USING (term) CROSS JOIN nn),
        |u1r AS (SELECT r, CAST(round(sum(CAST(v AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a GROUP BY r),
        |n1 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u1r),
        |u1 AS (SELECT r, round(u / nm, 9) AS u FROM u1r, n1),
        |w1r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u1.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u1 USING (r) GROUP BY c),
        |m1 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w1r),
        |v1 AS (SELECT c, round(w / nm, 9) AS x FROM w1r, m1),
        |u2r AS (SELECT r, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(v1.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a JOIN v1 USING (c) GROUP BY r),
        |n2 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u2r),
        |u2 AS (SELECT r, round(u / nm, 9) AS u FROM u2r, n2),
        |w2r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u2.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u2 USING (r) GROUP BY c),
        |m2 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w2r),
        |v2 AS (SELECT c, round(w / nm, 9) AS x FROM w2r, m2)
        |SELECT c AS term, x AS loading FROM v2 ORDER BY loading DESC, term LIMIT 20""".stripMargin,

    // Lsa.topTopicVectors replayed: q155's unrolled topic-1 chain, then
    // topic 2 — same all-ones start (so u1r/w1r reuse verbatim), with the
    // Hotelling deflation (broadcast dot against topic 1's FINAL v2, then
    // the rounded subtraction) applied to each raw column iterate before
    // its normalization, exactly as Lsa.powerIterate orders the steps
    "q159_lsa_topics" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |a AS (SELECT tf.doc_id AS r, tf.term AS c,
        |             round(tf.tf * ln(CAST(nn.n AS DOUBLE) / docfreq.df), 4) AS v
        |      FROM tf JOIN docfreq USING (term) CROSS JOIN nn),
        |u1r AS (SELECT r, CAST(round(sum(CAST(v AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a GROUP BY r),
        |n1 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u1r),
        |u1 AS (SELECT r, round(u / nm, 9) AS u FROM u1r, n1),
        |w1r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u1.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u1 USING (r) GROUP BY c),
        |m1 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w1r),
        |v1 AS (SELECT c, round(w / nm, 9) AS x FROM w1r, m1),
        |u2r AS (SELECT r, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(v1.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a JOIN v1 USING (c) GROUP BY r),
        |n2 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u2r),
        |u2 AS (SELECT r, round(u / nm, 9) AS u FROM u2r, n2),
        |w2r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u2.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u2 USING (r) GROUP BY c),
        |m2 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w2r),
        |v2 AS (SELECT c, round(w / nm, 9) AS x FROM w2r, m2),
        |d11 AS (SELECT CAST(round(sum(CAST(w1r.w AS DECIMAL(20,9)) * CAST(v2.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS d
        |        FROM w1r JOIN v2 USING (c)),
        |bw1 AS (SELECT w1r.c AS c,
        |               CAST(round(CAST(w1r.w AS DECIMAL(20,9))
        |                 - CAST(d11.d AS DECIMAL(20,9)) * CAST(v2.x AS DECIMAL(10,9)), 9) AS DOUBLE) AS w
        |        FROM w1r JOIN v2 USING (c), d11),
        |bm1 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM bw1),
        |bv1 AS (SELECT c, round(w / nm, 9) AS x FROM bw1, bm1),
        |bu2r AS (SELECT r, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(bv1.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |         FROM a JOIN bv1 USING (c) GROUP BY r),
        |bn2 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM bu2r),
        |bu2 AS (SELECT r, round(u / nm, 9) AS u FROM bu2r, bn2),
        |bw2r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(bu2.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |         FROM a JOIN bu2 USING (r) GROUP BY c),
        |d21 AS (SELECT CAST(round(sum(CAST(bw2r.w AS DECIMAL(20,9)) * CAST(v2.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS d
        |        FROM bw2r JOIN v2 USING (c)),
        |bw2 AS (SELECT bw2r.c AS c,
        |               CAST(round(CAST(bw2r.w AS DECIMAL(20,9))
        |                 - CAST(d21.d AS DECIMAL(20,9)) * CAST(v2.x AS DECIMAL(10,9)), 9) AS DOUBLE) AS w
        |        FROM bw2r JOIN v2 USING (c), d21),
        |bm2 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM bw2),
        |bv2 AS (SELECT c, round(w / nm, 9) AS x FROM bw2, bm2),
        |uni AS (
        |  SELECT CAST(1 AS BIGINT) AS topic, c AS term, x AS loading FROM v2
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), c, x FROM bv2),
        |rk AS (SELECT topic, term, loading,
        |              row_number() OVER (PARTITION BY topic ORDER BY loading DESC, term) AS rnk
        |       FROM uni)
        |SELECT topic, term, loading FROM rk WHERE rnk <= 10
        |ORDER BY topic, loading DESC, term""".stripMargin,

    // Lsa.docScores replayed: q155's unrolled iteration plus the
    // fold-in projection matvec and the doc top-20
"q156_lsa_doc_scores" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |a AS (SELECT tf.doc_id AS r, tf.term AS c,
        |             round(tf.tf * ln(CAST(nn.n AS DOUBLE) / docfreq.df), 4) AS v
        |      FROM tf JOIN docfreq USING (term) CROSS JOIN nn),
        |u1r AS (SELECT r, CAST(round(sum(CAST(v AS DECIMAL(18,4)) * CAST(1.0 AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a GROUP BY r),
        |n1 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u1r),
        |u1 AS (SELECT r, round(u / nm, 9) AS u FROM u1r, n1),
        |w1r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u1.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u1 USING (r) GROUP BY c),
        |m1 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w1r),
        |v1 AS (SELECT c, round(w / nm, 9) AS x FROM w1r, m1),
        |u2r AS (SELECT r, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(v1.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS u
        |        FROM a JOIN v1 USING (c) GROUP BY r),
        |n2 AS (SELECT sqrt(CAST(sum(CAST(round(u * u, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM u2r),
        |u2 AS (SELECT r, round(u / nm, 9) AS u FROM u2r, n2),
        |w2r AS (SELECT c, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(u2.u AS DECIMAL(10,9))), 9) AS DOUBLE) AS w
        |        FROM a JOIN u2 USING (r) GROUP BY c),
        |m2 AS (SELECT sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(38,12))) AS DOUBLE)) AS nm FROM w2r),
        |v2 AS (SELECT c, round(w / nm, 9) AS x FROM w2r, m2),
        |ds AS (SELECT r, CAST(round(sum(CAST(a.v AS DECIMAL(18,4)) * CAST(v2.x AS DECIMAL(10,9))), 9) AS DOUBLE) AS topic_score
        |       FROM a JOIN v2 USING (c) GROUP BY r)
        |SELECT r AS doc_id, topic_score FROM ds
        |ORDER BY topic_score DESC, doc_id LIMIT 20""".stripMargin,

    // Incremental media retention: the oracle is the FULL retention
    // (q154's image half) — the engine answers from stored index +
    // stored verdicts + an O(increment) join; a hash match is the
    // incremental==full theorem for the media family
    "q157_incremental_media_retention" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b)),
        |h AS (
        |  SELECT media_id,
        |         CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |  FROM bits GROUP BY 1),
        |p AS (SELECT a.media_id AS id_a, b.media_id AS id_b
        |      FROM h a JOIN h b ON a.media_id < b.media_id
        |      WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
        |d AS (SELECT id_b AS media_id, min(id_a) AS dup_of FROM p GROUP BY 1)
        |SELECT h.media_id,
        |       CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep,
        |       CAST(coalesce(d.dup_of, -1) AS BIGINT) AS dup_of
        |FROM h LEFT JOIN d USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // Media dedup retention: plant-formula hashes, the O(n^2) pair-scan
    // baseline, keep-lowest-id retention with dup_of; both modalities
    // share the plant so the verdict table doubles under the labels
    "q154_media_dedup_retention" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS sib FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 10 = 0),
        |bits AS (
        |  SELECT media_id, g.b AS b,
        |         CASE WHEN g.b = 0 THEN 1 WHEN g.b = 63 THEN 0
        |              WHEN sib = 1 AND g.b IN (1, 2)
        |                THEN 1 - (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |              ELSE (CAST(concat('0x', substr(md5(base || '_' || g.b), 1, 1)) AS INT) % 2)
        |         END AS bit
        |  FROM m CROSS JOIN range(64) g(b)),
        |h AS (
        |  SELECT media_id,
        |         CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
        |  FROM bits GROUP BY 1),
        |p AS (SELECT a.media_id AS id_a, b.media_id AS id_b
        |      FROM h a JOIN h b ON a.media_id < b.media_id
        |      WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
        |d AS (SELECT id_b AS media_id, min(id_a) AS dup_of FROM p GROUP BY 1),
        |r AS (SELECT h.media_id, coalesce(d.dup_of, -1) AS dup_of,
        |             CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS keep
        |      FROM h LEFT JOIN d USING (media_id))
        |SELECT md.modality, r.media_id, CAST(keep AS BIGINT) AS keep,
        |       CAST(dup_of AS BIGINT) AS dup_of
        |FROM r CROSS JOIN (SELECT unnest(['image', 'audio']) AS modality) md
        |ORDER BY modality, media_id""".stripMargin,

    // Incremental entity resolution: the oracle is the FULL resolve over
    // the whole key range (q142's pair+reach chain, no election) — the
    // engine computes it incrementally from the even-key generation's
    // stored index + assignments, so a hash match IS the
    // incremental==full theorem
    "q146_incremental_entity_resolution" ->
      """WITH RECURSIVE
        |base AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |         WHERE c_custkey < 2500 AND c_name IS NOT NULL),
        |dels AS (SELECT id, s, unnest(generate_series(1, length(s))) AS i FROM base),
        |vars AS (SELECT id, s, s AS var FROM base
        |         UNION ALL
        |         SELECT id, s, substr(s, 1, i - 1) || substr(s, i + 1) AS var FROM dels),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |      FROM vars a JOIN vars b ON a.var = b.var AND a.id < b.id
        |      WHERE levenshtein(a.s, b.s) <= 1),
        |ed AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT src AS id FROM ed),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
        |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY 1)
        |SELECT CAST(b.c_custkey AS BIGINT) AS c_custkey,
        |       CAST(coalesce(c.component, b.c_custkey) AS BIGINT) AS entity
        |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 2500) b
        |LEFT JOIN comp c ON b.c_custkey = c.id
        |ORDER BY c_custkey""".stripMargin,

    // Entity resolution replayed: q123's deletion-variant pair blocking
    // (t=1 confirm), q57's recursive-CTE reachability with min-label
    // components, singleton entities via the left join, and the
    // golden-record window election
    "q142_entity_resolution" ->
      """WITH RECURSIVE
        |base AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |         WHERE c_custkey < 2500 AND c_name IS NOT NULL),
        |dels AS (SELECT id, s, unnest(generate_series(1, length(s))) AS i FROM base),
        |vars AS (SELECT id, s, s AS var FROM base
        |         UNION ALL
        |         SELECT id, s, substr(s, 1, i - 1) || substr(s, i + 1) AS var FROM dels),
        |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |      FROM vars a JOIN vars b ON a.var = b.var AND a.id < b.id
        |      WHERE levenshtein(a.s, b.s) <= 1),
        |ed AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT src AS id FROM ed),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
        |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY 1),
        |asg AS (
        |  SELECT b.c_custkey AS id, b.c_acctbal, coalesce(c.component, b.c_custkey) AS entity
        |  FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey < 2500) b
        |  LEFT JOIN comp c ON b.c_custkey = c.id)
        |SELECT CAST(id AS BIGINT) AS c_custkey, CAST(entity AS BIGINT) AS entity,
        |       CAST(CASE WHEN row_number() OVER (PARTITION BY entity ORDER BY c_acctbal DESC, id) = 1
        |            THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
        |FROM asg ORDER BY c_custkey""".stripMargin,

    // Sketch.countMinSketch replayed: token counts, then the salted-md5
    // cell fan-out (the Sampling.bucket conv <-> 0x-cast parity) summed
    // per (depth, bucket)
    "q137_count_min_sketch" ->
      s"""WITH toks AS (
         |  SELECT unnest(string_split_regex(trim(lower(text)), '${"\\"}s+')) AS tok
         |  FROM documents),
         |tc AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
         |cells AS (
         |  SELECT r.d AS depth,
         |         CAST(concat('0x', substr(md5(r.d || '_' || tok), 1, 12)) AS BIGINT) % 256 AS bucket,
         |         cnt
         |  FROM tc CROSS JOIN range(4) r(d))
         |SELECT CAST(depth AS BIGINT) AS depth, CAST(bucket AS BIGINT) AS bucket,
         |       CAST(sum(cnt) AS BIGINT) AS cnt
         |FROM cells GROUP BY 1, 2 ORDER BY depth, bucket""".stripMargin,

    // Clustering.prototypeDrift replayed: q110's decimal centroid build
    // per snapshot half, then the unrolled L2 chain and the
    // list_dot_product cosine (the q110 parity) between prototypes
    "q136_prototype_drift" -> {
      val l2 = (1 to 64).map(j => s"(va[$j] - vb[$j])*(va[$j] - vb[$j])").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |xa AS (SELECT label, t.d AS dim, v[t.d + 1] AS val
         |       FROM e CROSS JOIN range(64) t(d) WHERE vec_id % 2 = 0),
         |xb AS (SELECT label, t.d AS dim, v[t.d + 1] AS val
         |       FROM e CROSS JOIN range(64) t(d) WHERE vec_id % 2 = 1),
         |ma AS (SELECT label, dim, count(*) AS nm,
         |              round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE)/count(*), 6) AS c
         |       FROM xa GROUP BY 1, 2),
         |mb AS (SELECT label, dim, count(*) AS nm,
         |              round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE)/count(*), 6) AS c
         |       FROM xb GROUP BY 1, 2),
         |pa AS (SELECT label, max(nm) AS n_a, list(c ORDER BY dim) AS va FROM ma GROUP BY 1),
         |pb AS (SELECT label, max(nm) AS n_b, list(c ORDER BY dim) AS vb FROM mb GROUP BY 1)
         |SELECT label, n_a, n_b,
         |       round(sqrt($l2), 9) AS l2_dist,
         |       round(list_dot_product(va, vb) /
         |         (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 9) AS cos_sim
         |FROM pa JOIN pb USING (label) ORDER BY label""".stripMargin
    },

    // Drift.numericDrift replayed: one (value -> per-side counts) table,
    // baseline-decile fences via quantile_cont (== Spark's exact
    // interpolated percentile, the q92 parity), unrolled bucket fold,
    // eps-smoothed PSI terms rounded per bucket before the decimal sum,
    // ECDF window KS off the distinct-value table
    "q134_snapshot_drift" -> {
      val ps = (1 to 9).map(i => s"0.$i").mkString(", ")
      val bucketCase = (1 to 9).map(i =>
        s"CASE WHEN v > fences[$i] THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH b0 AS (
         |  SELECT round(CAST(l_extendedprice AS DOUBLE), 6) AS v FROM lineitem
         |  WHERE l_shipdate < DATE '1998-01-01' AND l_extendedprice IS NOT NULL),
         |c0 AS (
         |  SELECT round(CAST(l_extendedprice AS DOUBLE), 6) AS v FROM lineitem
         |  WHERE l_shipdate >= DATE '1998-01-01' AND l_extendedprice IS NOT NULL),
         |u AS (SELECT v, 0 AS side FROM b0 UNION ALL SELECT v, 1 AS side FROM c0),
         |byv AS (
         |  SELECT v, sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cb,
         |         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cc
         |  FROM u GROUP BY v),
         |tot AS (SELECT CAST(sum(cb) AS BIGINT) AS nb, CAST(sum(cc) AS BIGINT) AS nc,
         |               count(*) AS nd FROM byv),
         |kss AS (
         |  SELECT round(max(abs(CAST(ab AS DOUBLE)/CAST(nb AS DOUBLE)
         |    - CAST(ac AS DOUBLE)/CAST(nc AS DOUBLE))), 9) AS ks
         |  FROM (SELECT
         |      sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ab,
         |      sum(cc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ac
         |    FROM byv) CROSS JOIN tot),
         |f AS (SELECT quantile_cont(v, [$ps]) AS fences FROM b0),
         |bg AS (
         |  SELECT $bucketCase AS b, sum(cb) AS bb, sum(cc) AS bc
         |  FROM byv CROSS JOIN f GROUP BY 1),
         |pp AS (
         |  SELECT greatest(CAST(bb AS DOUBLE)/CAST(nb AS DOUBLE), 1e-6) AS pb,
         |         greatest(CAST(bc AS DOUBLE)/CAST(nc AS DOUBLE), 1e-6) AS pc
         |  FROM bg CROSS JOIN tot),
         |psis AS (
         |  SELECT round(CAST(sum(CAST(round((pc - pb) * ln(pc/pb), 9)
         |    AS DECIMAL(28,12))) AS DOUBLE), 9) AS psi
         |  FROM pp)
         |SELECT nb AS n_base, nc AS n_cur, nd AS n_distinct, psi, ks
         |FROM tot CROSS JOIN psis CROSS JOIN kss""".stripMargin
    },

    "q95_vocab_encode" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos FROM w),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |vocab AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS tid
        |          FROM (SELECT * FROM freq ORDER BY cnt DESC, tok LIMIT 256))
        |SELECT doc_id, count(*) AS n_tokens,
        |       array_to_string(list(coalesce(tid, 0) ORDER BY pos), ',') AS token_ids
        |FROM toks LEFT JOIN vocab USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // BM25 side is q89's arithmetic at top-50; dense side is q25's cosine
    // against vec 0; fusion ranks are ints, 1/(rank+60) the same double op
    "q96_hybrid_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END) AS tf_spark,
        |         sum(CASE WHEN term = 'shuffle' THEN 1 ELSE 0 END) AS tf_shuffle,
        |         sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS tf_join
        |  FROM toks GROUP BY 1),
        |c AS (
        |  SELECT count(*) AS n, avg(dl) AS avgdl,
        |         sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |         sum(CASE WHEN tf_shuffle > 0 THEN 1 ELSE 0 END) AS df_shuffle,
        |         sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS df_join
        |  FROM perdoc),
        |bm AS (SELECT doc_id, score FROM (
        |  SELECT doc_id,
        |         round(
        |           (CASE WHEN tf_spark > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_spark + 0.5) / (df_spark + 0.5))
        |                * CAST(tf_spark AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_spark AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END)
        |           + (CASE WHEN tf_shuffle > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_shuffle + 0.5) / (df_shuffle + 0.5))
        |                * CAST(tf_shuffle AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_shuffle AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END)
        |           + (CASE WHEN tf_join > 0 THEN
        |              ln(1.0 + (CAST(n AS DOUBLE) - df_join + 0.5) / (df_join + 0.5))
        |                * CAST(tf_join AS DOUBLE) * (1.2 + 1.0)
        |                / (CAST(tf_join AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |            ELSE 0.0 END), 4) AS score
        |  FROM perdoc CROSS JOIN c)
        |  WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 50),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |dense AS (SELECT doc_id, cos_sim FROM (
        |  SELECT vec_id AS doc_id,
        |         list_dot_product(nv, qv) /
        |           (sqrt(list_dot_product(nv, nv)) * sqrt(list_dot_product(qv, qv))) AS cos_sim
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS nv
        |        FROM embeddings WHERE vec_id <> 0) CROSS JOIN q)
        |  ORDER BY cos_sim DESC, doc_id LIMIT 50),
        |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_a FROM bm),
        |rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_b FROM dense),
        |f AS (SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |             coalesce(rank_a, 0) AS rank_a, coalesce(rank_b, 0) AS rank_b,
        |             round((CASE WHEN rank_a IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (rank_a + 60) ELSE 0.0 END)
        |                 + (CASE WHEN rank_b IS NOT NULL THEN CAST(1.0 AS DOUBLE) / (rank_b + 60) ELSE 0.0 END), 6) AS rrf
        |      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
        |SELECT doc_id, rank_a, rank_b, rrf
        |FROM (SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 20)
        |ORDER BY doc_id""".stripMargin,

    // H = ln(n) - sum(c*ln c)/n over [a-z] counts; the c*ln(c) terms are
    // decimal-quantized before summing on both engines (the q71 rule)
    "q97_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]')) AS ch
        |            FROM documents),
        |cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_alpha,
        |       round(ln(CAST(sum(c) AS DOUBLE)) -
        |             CAST(sum(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,9))) AS DOUBLE)
        |               / CAST(sum(c) AS DOUBLE), 4) AS char_entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q93's key arithmetic, ranked within source instead of globally
    "q98_group_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |         ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 0.5)
        |            / 281474976710656.0) / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0)
        |SELECT doc_id, source, n_chars, round(k, 6) AS es_key FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rn
        |  FROM k)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin,

    // batch BM25 replays bm25TopKBatch stage for stage: the (doc, term)
    // index, doc lengths + constants derived FROM it, per-term Lucene idf
    // with the same (1.2 + 1.0)-style double tree as q89, per-term scores
    // quantized to DECIMAL(28,9) before the per-(query, doc) sum
    "q99_bm25_batch" ->
      """WITH q AS (
        |  SELECT CAST(v.query_id AS BIGINT) AS query_id, v.term
        |  FROM (VALUES (1, 'spark'), (1, 'shuffle'), (1, 'join'),
        |               (2, 'data'), (2, 'parquet'),
        |               (3, 'the'), (3, 'of'), (3, 'and')) AS v(query_id, term)),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |dft AS (SELECT term, count(*) AS df FROM tf
        |        WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
        |hits AS (
        |  SELECT q.query_id, tf.doc_id, dl.dl,
        |         CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
        |              * CAST(tf AS DOUBLE) * (1.2 + 1.0)
        |              / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))
        |            AS DECIMAL(28,9)) AS ts
        |  FROM tf JOIN q USING (term) JOIN dft USING (term)
        |       JOIN dl USING (doc_id) CROSS JOIN c),
        |scored AS (
        |  SELECT query_id, doc_id, max(dl) AS n_tokens,
        |         round(CAST(sum(ts) AS DOUBLE), 4) AS score
        |  FROM hits GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_tokens, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY query_id, doc_id""".stripMargin,

    // PQ family: generated SQL (the zOrder/SimHash precedent) replaying
    // training, assignment, and ADC scoring with Quantize.l2Sq's exact
    // unrolled association order
    // packing plan replays q79's md5 shard/pos addressing plus a per-shard
    // running token sum and the floor-division sequence boundaries
    "q104_seq_pack" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens, key, key % 8 AS shard
        |  FROM k WHERE n_tokens > 0),
        |p AS (
        |  SELECT doc_id, n_tokens, shard,
        |         CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS BIGINT) AS pos,
        |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY key, doc_id) AS BIGINT) AS cum
        |  FROM s)
        |SELECT doc_id, shard, pos,
        |       cum - n_tokens AS start_offset,
        |       CAST(floor((cum - n_tokens) / 128.0) AS BIGINT) AS start_seq,
        |       CAST(floor((cum - 1) / 128.0) AS BIGINT) AS end_seq,
        |       CAST(floor((cum - 1) / 128.0) AS BIGINT)
        |         - CAST(floor((cum - n_tokens) / 128.0) AS BIGINT) + 1 AS n_seqs
        |FROM p ORDER BY doc_id""".stripMargin,

    // the export composes q95's encoding, q104's addressing, and the
    // (shard, seq) regrouping; token order inside a sequence is pinned by
    // the carried global offset in both engines
    "q105_packed_sequences" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos FROM w),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        |vocab AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS tid
        |          FROM (SELECT * FROM freq ORDER BY cnt DESC, tok LIMIT 256)),
        |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |               list(coalesce(tid, 0) ORDER BY pos) AS ids
        |        FROM toks LEFT JOIN vocab USING (tok) GROUP BY doc_id),
        |k AS (SELECT doc_id, n_tokens, ids,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
        |      FROM enc WHERE n_tokens > 0),
        |p AS (SELECT doc_id, ids, key % 8 AS shard,
        |             CAST(sum(n_tokens) OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS BIGINT)
        |               - n_tokens AS start_offset
        |      FROM k),
        |t AS (SELECT shard, start_offset + generate_subscripts(ids, 1) - 1 AS gpos,
        |             unnest(ids) AS tid
        |      FROM p),
        |s AS (SELECT CAST(shard AS BIGINT) AS shard,
        |             CAST(floor(gpos / 128.0) AS BIGINT) AS seq_idx,
        |             gpos % 128 AS off, tid
        |      FROM t)
        |SELECT shard, seq_idx, array_to_string(list(tid ORDER BY off), ',') AS token_ids
        |FROM s GROUP BY 1, 2 HAVING count(*) = 128
        |ORDER BY shard, seq_idx""".stripMargin,

    // q106 replays the EXACT-join semantics (the hashed prefilter is a
    // plan optimization that cannot change the result — collisions are
    // eliminated by the confirm join on the shingle string, so the oracle
    // needs no hashing at all); 7-gram shingles, % 89 bench split
    "q106_decontaminate" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, greatest(len(w) - 6, 1)),
        |         i -> array_to_string(w[i:i+6], ' ')))) AS shingle
        |       FROM w),
        |b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 89 = 0)
        |SELECT s.doc_id, b.bench_id, count(*) AS n_shared
        |FROM sh s JOIN b ON s.shingle = b.shingle AND s.doc_id <> b.bench_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the incremental merge must equal a FULL REBUILD over the whole
    // corpus — so the oracle IS the full rebuild (q85's shape, minDf=3,
    // postings truncated to 12); the split/merge is a Spark-side plan
    // detail that cannot change the result
    "q107_incremental_index" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |              FROM documents)
        |SELECT term,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        |       count(*) AS term_freq,
        |       array_to_string(list_sort(list(DISTINCT doc_id))[1:12], ',') AS postings
        |FROM toks GROUP BY term
        |HAVING count(DISTINCT doc_id) >= 3
        |ORDER BY term""".stripMargin,

    // BPE pair statistics replay: distinct words with corpus counts, then
    // character-adjacent pairs weighted by the word count — substr is
    // character-based in both engines, so multibyte text agrees
    "q108_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |           FROM documents WHERE text IS NOT NULL),
        |wc AS (SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY 1),
        |p AS (SELECT unnest(list_transform(generate_series(1, len(word) - 1),
        |                    i -> {'lhs': substr(word, i, 1), 'rhs': substr(word, i + 1, 1)})) AS pr,
        |             cnt
        |      FROM wc WHERE len(word) >= 2)
        |SELECT pr.lhs AS lhs, pr.rhs AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_count
        |FROM p GROUP BY 1, 2
        |ORDER BY pair_count DESC, lhs, rhs LIMIT 50""".stripMargin,

    "q109_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS anchor_id, label AS anchor_label,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS negative_id, label AS negative_label,
        |             CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |             list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
        |      FROM q CROSS JOIN c
        |      WHERE anchor_id <> negative_id AND anchor_label <> negative_label),
        |r AS (SELECT anchor_id, anchor_label, negative_id, negative_label,
        |             CAST(row_number() OVER (PARTITION BY anchor_id
        |                                     ORDER BY sim DESC, negative_id) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT anchor_id, anchor_label, rnk, negative_id, negative_label
        |FROM r WHERE rnk <= 5 ORDER BY anchor_id, rnk""".stripMargin,

    "q110_prototype_eval" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT label, t.d AS dim, v[t.d + 1] AS val
        |      FROM e CROSS JOIN range(64) t(d)),
        |m AS (SELECT label AS proto_label, dim,
        |             round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS c
        |      FROM x GROUP BY 1, 2),
        |p AS (SELECT proto_label, list(c ORDER BY dim) AS pv FROM m GROUP BY 1),
        |s AS (SELECT e.vec_id, e.label AS true_label, p.proto_label,
        |             list_dot_product(e.v, p.pv) /
        |               (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(p.pv, p.pv))) AS sim
        |      FROM e CROSS JOIN p),
        |a AS (SELECT vec_id, true_label, proto_label,
        |             row_number() OVER (PARTITION BY vec_id
        |                                ORDER BY sim DESC, proto_label) AS rn
        |      FROM s)
        |SELECT true_label, proto_label AS pred_label, CAST(count(*) AS BIGINT) AS n
        |FROM a WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY true_label, pred_label""".stripMargin,

    "q111_split_manifest" ->
      """WITH d AS (SELECT source, n_chars,
        |                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |                    % 10000 AS b
        |           FROM documents)
        |SELECT CASE WHEN b < 8000 THEN 'train'
        |            WHEN b < 9000 THEN 'validation'
        |            ELSE 'test' END AS split,
        |       source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM d GROUP BY 1, 2 ORDER BY split, source""".stripMargin,

    "q114_curriculum" ->
      """WITH f AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS fences
        |           FROM documents WHERE n_chars IS NOT NULL)
        |SELECT doc_id,
        |       1 + len(list_filter(f.fences, x -> CAST(n_chars AS DOUBLE) > x)) AS phase,
        |       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |         AS shuffle_key
        |FROM documents, f WHERE n_chars IS NOT NULL
        |ORDER BY phase, shuffle_key, doc_id""".stripMargin,

    "q115_budget_select" ->
      """SELECT doc_id, score, cost, running_total FROM (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
        |         CAST(n_chars AS BIGINT) AS cost,
        |         CAST(sum(n_chars) OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total
        |  FROM documents WHERE n_chars IS NOT NULL)
        |WHERE running_total <= 50000
        |ORDER BY running_total""".stripMargin,

    "q100_pq_codebooks" -> pqCodebooksSql,
    "q101_pq_codes" -> pqCodesSql,
    "q102_pq_adc_topk" -> pqAdcTopKSql,
    "q103_pq_rerank" -> pqRerankSql,

    "q87_source_quota" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

    "q71_unigram_lm" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |              FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |       round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / (SELECT n FROM n)) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 4) AS avg_logprob
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 64-token windows every 56 tokens; DuckDB list slice w[s:e] is
    // inclusive, Spark slice(arr, start, len) length-based — aligned via
    // e = s + 63 capped at len(w)
    "q73_chunk_docs" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |starts AS (
        |  SELECT doc_id, w,
        |         unnest(generate_series(1, greatest(len(w) - 8, 1), 56)) AS s,
        |         generate_subscripts(generate_series(1, greatest(len(w) - 8, 1), 56), 1) AS ci
        |  FROM words)
        |SELECT doc_id, CAST(ci - 1 AS BIGINT) AS chunk_idx,
        |       CAST(least(64, len(w) - s + 1) AS BIGINT) AS chunk_tokens,
        |       array_to_string(w[s:least(s + 63, len(w))], ' ') AS chunk_text
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,

    // full-corpus candidates restricted to pairs touching the odd-id
    // increment — band membership is per-doc, so this equals the
    // incremental index-join computation
    "q72_incremental_dedup" ->
      s"""WITH $minhashCandCtes
         |SELECT id_a, id_b FROM cand
         |WHERE id_a % 2 = 1 OR id_b % 2 = 1
         |ORDER BY id_a, id_b""".stripMargin,
    "q28_simhash" -> simhashPairsSql,
    "q29_ann_lsh" -> annLshDetSql,
    "q178_hard_negatives_lsh" -> hardNegativesLshSql,
    "q179_mmr_lsh" -> mmrLshSql,
    "q180_dedup_clusters_lsh" -> dedupClustersLshSql,
    "q32_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_dot_product(a.v, b.v) /
        |             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "q33_simhash_md5" -> simhashMd5Sql,

    "q44_det_sample" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 < 2500
        |ORDER BY doc_id""".stripMargin,

    "q43_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |docfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
        |SELECT tf.doc_id, tf.term, tf.tf, docfreq.df,
        |       round(tf.tf * ln(CAST(n.n AS DOUBLE) / docfreq.df), 4) AS tfidf
        |FROM tf JOIN docfreq USING (term) CROSS JOIN n
        |WHERE tf.doc_id < 20
        |ORDER BY doc_id, term""".stripMargin,

    "q39_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q40_string_funcs" ->
      """SELECT c_custkey AS ck,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |       CAST(instr(c_name, '0') AS BIGINT) AS zero_pos,
        |       regexp_replace(c_name, 'Customer', 'C', 'g') AS short_name,
        |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_dist,
        |       right(c_name, 4) AS tail4
        |FROM customer ORDER BY ck""".stripMargin,

    "q41_array_agg" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_partkey)), ',') AS parts,
        |       CAST(len(list(l_partkey)) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q42_date_math" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS d,
        |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
        |       CAST(date_diff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the FULL REBUILD replay of the engine's stored+incremental path:
    // centroids from the base slice only (the stored model), assignment
    // over the whole corpus — per-row independence of assignment makes
    // this exactly the engine's base ∪ increment union
    "q175_ivf_stored_index" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 10 <> 0
        |          ORDER BY vec_id LIMIT 16),
        |csim AS (SELECT e.vec_id, e.v, c.cid,
        |                list_dot_product(e.v, c.cv) /
        |                  (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |         FROM e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id AS nid, v AS nv, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, v AS qv, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim WHERE vec_id % 50 = 0) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.qid, a.nid,
        |         list_dot_product(p.qv, a.nv) /
        |           (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.nv, a.nv))) AS sim
        |  FROM probes p JOIN assigned a USING (cid)
        |  WHERE p.qid <> a.nid),
        |ranked AS (
        |  SELECT qid, nid,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, nid FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    // byte-identical regex chain + the identical synthesized input concat;
    // DuckDB regexp_* are RE2, Spark's are java.util.regex — the patterns
    // are restricted to the common subset so both engines match the same
    // spans (see TextAnalysis.piiEmailPattern scaladoc)
    "q176_redact_pii" ->
      """WITH raw AS (
        |  SELECT c_custkey AS ck,
        |         'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
        |           || '@mail' || CAST(c_custkey % 7 AS VARCHAR)
        |           || '.org or +1-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |           || ' from 10.' || CAST(c_custkey % 256 AS VARCHAR)
        |           || '.' || CAST((c_custkey * 7) % 256 AS VARCHAR)
        |           || '.' || CAST((c_custkey * 13) % 256 AS VARCHAR)
        |           || ' account ' || CAST(c_custkey + 100000 AS VARCHAR) AS r
        |  FROM customer)
        |SELECT ck,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(r,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
        |    '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{4})?', '[PHONE]', 'g'),
        |    '[0-9]{4,}', '[ID]', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(r, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(r, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(r, '\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{4})?')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(r, '[0-9]{4,}')) AS BIGINT) AS n_id_runs
        |FROM raw ORDER BY ck""".stripMargin,

    "q38_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16),
        |csim AS (SELECT e.vec_id, e.v, c.cid,
        |                list_dot_product(e.v, c.cv) /
        |                  (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |         FROM e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id AS nid, v AS nv, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, v AS qv, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim WHERE vec_id % 50 = 0) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.qid, a.nid,
        |         list_dot_product(p.qv, a.nv) /
        |           (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.nv, a.nv))) AS sim
        |  FROM probes p JOIN assigned a USING (cid)
        |  WHERE p.qid <> a.nid),
        |ranked AS (
        |  SELECT qid, nid,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, nid FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "q37_range_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |err AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, count(err.ts) AS n_errors
        |FROM p LEFT JOIN err
        |  ON p.user_id = err.user_id
        | AND epoch(err.ts) <= epoch(p.ts)
        | AND epoch(err.ts) >= epoch(p.ts) - 3600
        |GROUP BY p.event_id, p.user_id
        |ORDER BY event_id""".stripMargin,

    "q36_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts, event_id AS signup_event FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |       s.signup_event,
        |       round(p.value, 2) AS value
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin,

    "q35_sql_star_join" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       count(*) AS n,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q34_subword_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q01_scalar_agg" ->
      """SELECT count(*) AS n_orders,
        |       count(DISTINCT o_custkey) AS n_custs,
        |       strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
        |       strftime(max(o_orderdate), '%Y-%m-%d') AS max_date,
        |       round(sum(o_totalprice), 2) AS sum_price,
        |       round(avg(o_totalprice), 2) AS avg_price
        |FROM orders""".stripMargin,

    "q02_group_agg" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS anio,
        |       count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total,
        |       round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_cond_agg" ->
      """SELECT count(*) AS n,
        |       count(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_disc,
        |       count(CASE WHEN l_tax IS NULL THEN 1 END) AS null_tax,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem""".stripMargin,

    "q04_join_lookup" ->
      """SELECT coalesce(p.p_brand, 'NONE') AS brand,
        |       count(*) AS n,
        |       round(sum(l.l_extendedprice), 2) AS revenue
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_star_join" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |       count(*) AS n,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q06_topk" ->
      """SELECT p.p_brand AS brand,
        |       count(*) AS total_registros,
        |       round(sum(l.l_extendedprice), 2) AS monto
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY total_registros DESC, brand LIMIT 10""".stripMargin,

    "q07_dim_dedup_key" ->
      """SELECT CAST(row_number() OVER (ORDER BY p_brand, p_type) AS BIGINT) AS id_dim,
        |       p_brand AS brand, p_type AS ptype
        |FROM (SELECT DISTINCT p_brand, p_type FROM part) t
        |ORDER BY id_dim""".stripMargin,

    "q08_calendar_dim" ->
      """SELECT CAST(date_diff('day', DATE '2020-01-01', d) + 1 AS BIGINT) AS id_tiempo,
        |       strftime(d, '%Y-%m-%d') AS fecha,
        |       CAST(year(d) AS BIGINT) AS anio,
        |       CAST(quarter(d) AS BIGINT) AS trimestre,
        |       CAST(month(d) AS BIGINT) AS mes,
        |       CAST(day(d) AS BIGINT) AS dia,
        |       CASE month(d) WHEN 1 THEN 'Enero' WHEN 2 THEN 'Febrero' WHEN 3 THEN 'Marzo'
        |         WHEN 4 THEN 'Abril' WHEN 5 THEN 'Mayo' WHEN 6 THEN 'Junio' WHEN 7 THEN 'Julio'
        |         WHEN 8 THEN 'Agosto' WHEN 9 THEN 'Septiembre' WHEN 10 THEN 'Octubre'
        |         WHEN 11 THEN 'Noviembre' ELSE 'Diciembre' END AS nombre_mes,
        |       CASE isodow(d) WHEN 1 THEN 'Lunes' WHEN 2 THEN 'Martes' WHEN 3 THEN 'Miércoles'
        |         WHEN 4 THEN 'Jueves' WHEN 5 THEN 'Viernes' WHEN 6 THEN 'Sábado'
        |         ELSE 'Domingo' END AS nombre_dia
        |FROM (SELECT CAST(range AS DATE) AS d
        |      FROM range(DATE '2020-01-01', DATE '2026-01-01', INTERVAL 1 DAY))
        |ORDER BY id_tiempo""".stripMargin,

    "q09_null_fill" ->
      """SELECT coalesce(s.s_name, 'N/A') AS supplier_name,
        |       count(*) AS n,
        |       round(sum(coalesce(s.s_acctbal, 0)), 2) AS acct
        |FROM lineitem l
        |LEFT JOIN (SELECT * FROM supplier WHERE s_suppkey <= 5) s
        |  ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_string_clean" ->
      """SELECT c_custkey AS ck,
        |       CAST(c_custkey AS VARCHAR) AS ck_str,
        |       upper(trim(c_name)) AS name_up,
        |       lower(c_mktsegment) AS seg_lo
        |FROM customer ORDER BY ck""".stripMargin,

    "q11_distinct" ->
      """SELECT DISTINCT l_returnflag AS flag FROM lineitem
        |WHERE l_returnflag IS NOT NULL ORDER BY 1""".stripMargin,

    "q12_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q13_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
        |       event_type,
        |       count(*) AS n,
        |       round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q14_sessionize" ->
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM gaps
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q15_case_bucket" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bucket,
        |       count(*) AS n,
        |       round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_set_ops" ->
      """SELECT * FROM (
        |  SELECT 'both' AS tag, nk FROM
        |    (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |     INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) a
        |  UNION ALL
        |  SELECT 'cust_only' AS tag, nk FROM
        |    (SELECT CAST(c_nationkey AS BIGINT) AS nk FROM customer
        |     EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier) b
        |  UNION ALL
        |  SELECT 'supp_only' AS tag, nk FROM
        |    (SELECT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
        |     EXCEPT SELECT CAST(c_nationkey AS BIGINT) FROM customer) c
        |) ORDER BY tag, nk""".stripMargin,

    "q17_semi_anti" ->
      """SELECT 'with_orders' AS tag, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS tag, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag""".stripMargin,

    "q18_rollup" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       CAST(grouping(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
        |       count(*) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
        |ORDER BY gid, seg, status""".stripMargin,

    "q19_percentiles" ->
      """SELECT o_orderstatus AS status,
        |       round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |       count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_json_extract" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS content_hash,
        |       min(doc_id) AS keep_id,
        |       count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q21_token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q22_quality" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS n_chars,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |         CAST(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
        |         CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|in)\b')) AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
        |       CASE WHEN n_tokens = 0 OR n_chars = 0 THEN NULL
        |            ELSE round(CAST(n_stop AS DOUBLE) / n_tokens - CAST(n_punct AS DOUBLE) / n_chars, 4)
        |       END AS quality_score
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q23_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT) AS score_en,
        |         CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|y)\b')) AS BIGINT) AS score_es,
        |         CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS BIGINT) AS score_de,
        |         CAST(len(regexp_extract_all(lower(text), '\b(le|les|et|des|une)\b')) AS BIGINT) AS score_fr
        |  FROM documents)
        |SELECT doc_id, score_en, score_es, score_de, score_fr,
        |       CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |            WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
        |            WHEN score_de >= score_fr THEN 'de'
        |            ELSE 'fr' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "q24_fingerprint" ->
      """SELECT doc_id,
        |       list_min(list_transform(
        |         generate_series(1, greatest(len(w) - 4, 1)),
        |         i -> md5(array_to_string(w[i:i+4], ' ')))) AS fingerprint
        |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |      FROM documents WHERE text IS NOT NULL)
        |ORDER BY doc_id""".stripMargin,

    "q25_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
        |s AS (SELECT qid, nid,
        |             list_dot_product(qv, nv) /
        |               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS sim
        |      FROM q CROSS JOIN c WHERE qid <> nid),
        |r AS (SELECT qid, nid,
        |             CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS BIGINT) AS rnk
        |      FROM s)
        |SELECT qid, rnk, nid FROM r WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "q26_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(
        |           generate_series(1, greatest(len(w) - 2, 1)),
        |           i -> array_to_string(w[i:i+2], ' '))) AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |        FROM documents WHERE doc_id < 40))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |             len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,

    "q63_cohort_retention" ->
      """WITH first AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |               FROM events GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events)
        |SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort,
        |       CAST(date_diff('day', CAST(f.cohort_week AS DATE), CAST(a.act_week AS DATE)) // 7 AS BIGINT) AS week_offset,
        |       CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
        |FROM first f JOIN active a USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin,

    "q65_gap_fill" ->
      """WITH base AS (
        |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
        |         round(sum(o_totalprice), 2) AS day_total
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1996-02-01'
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT ck, CAST(unnest(generate_series(DATE '1996-01-01', DATE '1996-01-31',
        |                                         INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM (SELECT DISTINCT ck FROM base))
        |SELECT ck, strftime(g.d, '%Y-%m-%d') AS d,
        |       coalesce(last_value(b.day_total IGNORE NULLS) OVER
        |         (PARTITION BY ck ORDER BY g.d ROWS UNBOUNDED PRECEDING), 0.0) AS filled
        |FROM grid g LEFT JOIN base b USING (ck, d)
        |ORDER BY ck, d""".stripMargin,

    "q66_unpivot" ->
      """WITH agg AS (
        |  SELECT l_returnflag AS flag,
        |         round(sum(l_quantity), 2) AS sum_qty,
        |         round(sum(l_extendedprice), 2) AS sum_price,
        |         CAST(count(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT flag, metric, value FROM (
        |  SELECT flag, 'sum_qty' AS metric, sum_qty AS value FROM agg
        |  UNION ALL SELECT flag, 'sum_price', sum_price FROM agg
        |  UNION ALL SELECT flag, 'n_rows', n_rows FROM agg)
        |ORDER BY flag, metric""".stripMargin,

    "q67_ratio_to_report" ->
      """WITH agg AS (
        |  SELECT r_name AS region, n_name AS nation, sum(c_acctbal) AS bal
        |  FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation, round(bal, 2) AS bal,
        |       round(bal / sum(bal) OVER (PARTITION BY region), 4) AS share
        |FROM agg ORDER BY region, nation""".stripMargin,

    "q64_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
        |SELECT stage, CAST(n_users AS BIGINT) AS n_users FROM (
        |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click', count(*) FROM c
        |  UNION ALL SELECT '3_purchase', count(*) FROM p)
        |ORDER BY stage""".stripMargin,

    "q62_window_nav" ->
      """SELECT o_custkey AS ck, o_orderkey,
        |       first_value(o_orderkey) OVER full_f AS first_key,
        |       last_value(o_orderkey) OVER full_f AS last_key,
        |       nth_value(o_orderkey, 2) OVER full_f AS second_key,
        |       round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 4) AS cd_price
        |FROM orders
        |WINDOW full_f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY ck, o_orderkey""".stripMargin,

    // Connected components replayed with a recursive CTE: labels propagate
    // along edges until the UNION (set-semantics) fixpoint; min reachable
    // label per node == component min == Spark's propagation fixpoint.
    "q57_dedup_clusters" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id
        |      WHERE list_dot_product(a.v, b.v) /
        |            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
        |ed AS (SELECT id_a AS src, id_b AS dst FROM p
        |       UNION SELECT id_b, id_a FROM p),
        |nodes AS (SELECT DISTINCT src AS id FROM ed),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id
        |)
        |SELECT CAST(id AS BIGINT) AS vid, CAST(min(lbl) AS BIGINT) AS comp,
        |       CAST(CASE WHEN id = min(lbl) THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM reach GROUP BY id ORDER BY vid""".stripMargin,

    "q58_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |kmv AS (SELECT max(h) AS kth_hash, count(*) AS k_seen
        |        FROM (SELECT h FROM h ORDER BY h LIMIT 128)),
        |ex AS (SELECT count(DISTINCT l_partkey) AS exact_nd FROM lineitem)
        |SELECT CAST(128 AS BIGINT) AS k,
        |       CAST(k_seen AS BIGINT) AS k_seen,
        |       kth_hash,
        |       CASE WHEN k_seen < 128 THEN CAST(k_seen AS DOUBLE)
        |            ELSE round(127.0 * 1152921504606846976.0 / kth_hash, 2) END AS est_nd,
        |       CAST(exact_nd AS BIGINT) AS exact_nd
        |FROM kmv, ex""".stripMargin,

    "q59_scd2" ->
      """WITH t AS (
        |  SELECT o_custkey AS ck, o_orderkey, round(o_totalprice, 2) AS price,
        |         strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |         lead(CAST(o_orderdate AS DATE)) OVER
        |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_d
        |  FROM orders)
        |SELECT ck, o_orderkey, price, valid_from,
        |       coalesce(strftime(next_d - INTERVAL 1 DAY, '%Y-%m-%d'), '9999-12-31') AS valid_to,
        |       CAST(CASE WHEN next_d IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM t ORDER BY ck, o_orderkey""".stripMargin,

    "q60_merge_upsert" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, concat('NEW ', c_name), 0.0
        |  FROM base WHERE c_custkey % 11 = 0)
        |SELECT coalesce(u.c_custkey, b.c_custkey) AS ck,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS name,
        |       round(CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END, 2) AS bal
        |FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
        |ORDER BY ck""".stripMargin,

    "q30_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS modality,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS content_digest
        |FROM documents ORDER BY media_id""".stripMargin,

    // same shingling contract as the minhash CTEs (truncated span at
    // position 1 for documents shorter than k words)
    "q74_repeated_spans" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, greatest(len(w) - 7, 1)),
        |      i -> array_to_string(w[i:i+7], ' '))) AS span
        |  FROM words)
        |SELECT span, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM sh GROUP BY span HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY span""".stripMargin,

    "q75_bigram_lm" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |starts AS (
        |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |  FROM words WHERE len(w) >= 2),
        |bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2 FROM starts),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       round(CAST(sum(CAST(ln(CAST(c12 AS DOUBLE) / c1) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 4) AS avg_logprob
        |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q38's centroid-assignment CTEs with 8 seeds, then the SemDeDup
    // within-cluster lower-id dominance test
    "q76_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        |csim AS (SELECT e.vec_id, e.v, c.cid,
        |                list_dot_product(e.v, c.cv) /
        |                  (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS s
        |         FROM e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT vec_id, v, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
        |    FROM csim) WHERE rn = 1),
        |dups AS (
        |  SELECT DISTINCT b.vec_id AS dup_id
        |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.5)
        |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
        |       CAST(CASE WHEN d.dup_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
        |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.dup_id
        |ORDER BY vec_id""".stripMargin,

    "q77_column_profile" -> columnProfileSql,
    "q78_zorder" -> zOrderSql,

    // Sharding.shuffleKey's md5-derived 60-bit key, replayed verbatim
    "q79_train_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS key
        |  FROM documents)
        |SELECT doc_id, key % 8 AS shard,
        |       CAST(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY doc_id""".stripMargin,

    // sqrt-smoothed masses quantized to DECIMAL(38,9) before the
    // normalizing sum — the same order-independence device as q71/q75
    "q80_mixture_weights" ->
      """WITH g AS (
        |  SELECT lang, count(*) AS n_docs,
        |         CAST(sum(CASE WHEN text IS NOT NULL
        |                       THEN len(string_split_regex(trim(text), '\s+'))
        |                       ELSE 0 END) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY lang),
        |m AS (SELECT g.*, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(38,9)) AS mass FROM g),
        |t AS (SELECT sum(mass) AS total FROM m)
        |SELECT lang, n_docs, n_tokens,
        |       round(CAST(mass AS DOUBLE) / CAST(total AS DOUBLE), 6) AS weight,
        |       CAST(round(CAST(mass AS DOUBLE) / CAST(total AS DOUBLE) * 1000000000, 0) AS BIGINT) AS budget_tokens
        |FROM m, t ORDER BY lang""".stripMargin,

    // Quantize.int8Profile's affine map replayed element-wise; error terms
    // accumulate in list order on both engines
    "q81_int8_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |mm AS (SELECT vec_id, v,
        |              list_aggregate(v, 'min') AS mn, list_aggregate(v, 'max') AS mx
        |       FROM e),
        |q AS (SELECT vec_id, v, mn, mx,
        |             CASE WHEN mx = mn THEN list_transform(v, x -> 0)
        |                  ELSE list_transform(v, x -> CAST(round((x - mn) / (mx - mn) * 255, 0) AS INT) - 128)
        |             END AS qc
        |      FROM mm)
        |SELECT vec_id,
        |       CAST(len(v) AS BIGINT) AS n_dims,
        |       CAST(list_aggregate(qc, 'min') AS BIGINT) AS q_min,
        |       CAST(list_aggregate(qc, 'max') AS BIGINT) AS q_max,
        |       CAST(list_aggregate(qc, 'sum') AS BIGINT) AS q_sum,
        |       round(list_aggregate(
        |               list_transform(generate_series(1, len(v)),
        |                 i -> (v[i] - (mn + (qc[i] + 128) * (mx - mn) / 255))
        |                    * (v[i] - (mn + (qc[i] + 128) * (mx - mn) / 255))),
        |               'sum') / len(v), 8) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,

    // q71's decimal-deterministic unigram LM, then ntile(3) quality split
    "q82_lm_buckets" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |              FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM toks),
        |lm AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / (SELECT n FROM n)) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 4) AS avg_logprob
        |  FROM toks JOIN freq USING (tok)
        |  GROUP BY doc_id),
        |b AS (SELECT lm.*, ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS bucket FROM lm)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       min(avg_logprob) AS min_logprob, max(avg_logprob) AS max_logprob
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // q177's approx-quantile bucketing replayed EXACTLY: at every verified
    // scale (≤5k docs) percentile_approx's GK sketch never compresses
    // (merge needs 2·ε·n ≥ 2, i.e. n ≥ accuracy=10000), so Spark's cutoff
    // is the element at ascending rank ceil(p·n) — a deterministic list
    // index here. Bucket = 1 + #cutoffs the value falls below, exactly
    // Bucketing.byApproxQuantilesDesc's comparison.
    "q177_lm_buckets_approx" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |              FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM toks),
        |lm AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         round(CAST(sum(CAST(ln(CAST(cnt AS DOUBLE) / (SELECT n FROM n)) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 4) AS avg_logprob
        |  FROM toks JOIN freq USING (tok)
        |  GROUP BY doc_id),
        |srt AS (SELECT list(avg_logprob ORDER BY avg_logprob) AS vs, count(*) AS nd FROM lm),
        |cut AS (SELECT vs[CAST(ceil(2.0/3.0 * nd) AS BIGINT)] AS hi,
        |               vs[CAST(ceil(1.0/3.0 * nd) AS BIGINT)] AS lo FROM srt),
        |b AS (SELECT lm.*,
        |             1 + CASE WHEN avg_logprob < hi THEN 1 ELSE 0 END
        |               + CASE WHEN avg_logprob < lo THEN 1 ELSE 0 END AS bucket
        |      FROM lm, cut)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |       min(avg_logprob) AS min_value, max(avg_logprob) AS max_value
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // SuffixDedup's relational bounded-depth suffix array replayed in
    // full: suffix slices (depth=30, minLen=5), minLen-prefix blocks,
    // block-sorted lag/lead adjacency, token-wise LCP (nullif: DuckDB's
    // list_position signals not-found as 0), per-doc threshold rollup.
    // hot-block routing (df_blk > 1048576, the engine's default
    // maxBlockDf): rows in a pathologically frequent minLen-gram block
    // skip the sorted-neighbor formula — an identical-suffix twin pins
    // dup_len = len(sfx) exactly; a unique suffix reports the proven
    // minLen lower bound, counted in n_capped_starts. At oracle scales
    // no block is hot, so the CASE routing exercises the cold branch.
    "q181_longest_dup_span" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |st AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 4)) AS pos
        |       FROM d WHERE len(toks) >= 5),
        |s AS (SELECT doc_id, pos, toks[pos : least(pos + 29, len(toks))] AS sfx FROM st),
        |b AS (SELECT doc_id, pos, sfx, array_to_string(sfx[1:5], ' ') AS blk FROM s),
        |n AS (SELECT doc_id, pos, sfx,
        |             lag(sfx) OVER w AS prv, lead(sfx) OVER w AS nxt,
        |             count(*) OVER (PARTITION BY blk) AS df_blk,
        |             count(*) OVER (PARTITION BY sfx) AS df_sfx
        |      FROM b WINDOW w AS (PARTITION BY blk ORDER BY sfx, doc_id, pos)),
        |r AS (SELECT doc_id, pos,
        |        CASE WHEN df_blk > 1048576 THEN
        |          CASE WHEN df_sfx >= 2 THEN len(sfx) ELSE 5 END
        |        ELSE greatest(
        |          CASE WHEN prv IS NULL THEN 0
        |               ELSE coalesce(nullif(list_position(list_transform(generate_series(1, greatest(len(sfx), len(prv))), i -> sfx[i] IS DISTINCT FROM prv[i]), true), 0) - 1, least(len(sfx), len(prv))) END,
        |          CASE WHEN nxt IS NULL THEN 0
        |               ELSE coalesce(nullif(list_position(list_transform(generate_series(1, greatest(len(sfx), len(nxt))), i -> sfx[i] IS DISTINCT FROM nxt[i]), true), 0) - 1, least(len(sfx), len(nxt))) END
        |        ) END AS dup_len,
        |        (df_blk > 1048576 AND df_sfx < 2) AS capped
        |      FROM n),
        |agg AS (SELECT doc_id, max(dup_len) AS longest, count(*) AS starts,
        |               sum(CASE WHEN capped THEN 1 ELSE 0 END) AS n_capped
        |        FROM r WHERE dup_len >= 5 GROUP BY doc_id)
        |SELECT d0.doc_id,
        |       CAST(coalesce(agg.longest, 0) AS BIGINT) AS longest_dup_tokens,
        |       CAST(coalesce(agg.starts, 0) AS BIGINT) AS n_dup_starts,
        |       CAST(coalesce(agg.n_capped, 0) AS BIGINT) AS n_capped_starts
        |FROM documents d0 LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    // the strip half, replayed from the TRUE keep-first definition — NOT
    // the engine's run-segmentation algorithm: a position is a loser iff
    // its suffix shares >= minLen leading tokens with ANY strictly
    // earlier (doc_id, pos) suffix, found by a within-block self-join
    // (cross-block pairs share < minLen by construction), and it strips
    // its FULL max shared-prefix length. The engine instead strips
    // exactly minLen per loser; the covered-position UNIONS coincide
    // (every q inside a true shared span has a loser window
    // [q-minLen+1, q] inside the span — see SuffixDedup.stripAllButFirst
    // scaladoc), so this is an independent derivation of the same rows.
    "q186_strip_dup_spans" -> stripDupSpansSql("TRUE"),

    // q188: the SAME full-corpus keep-first computation restricted to the
    // odd-key increment — the engine's stripIncrement must match it from
    // the stored even-key gram-firsts alone (incremental == full)
    "q188_strip_increment" -> stripDupSpansSql("d0.doc_id % 2 = 1"),

    // q189/q190: DBSCAN over exact and sign-plane-bucketed neighbor graphs
    "q189_dbscan" -> dbscanSql,
    "q190_dbscan_lsh" -> dbscanLshSql,
    // q193: the oracle IS q190's full recompute — a hash match proves
    // incremental (increment-only pair generation + stored edge state)
    // == full, the DBSCAN member of the q72/q146/q157/q188 family
    "q193_incremental_dbscan" -> dbscanLshSql,

    // q191/q192: WordPiece vocab induction + maximal-munch encode replay
    "q191_wordpiece_vocab" ->
      s"""WITH $wordpieceVocabCtes
         |SELECT piece, cnt, rank FROM vocab ORDER BY rank""".stripMargin,
    "q192_wordpiece_encode" -> wordpieceEncodeSql,
    "q195_wordpiece_fertility" -> wordpieceFertilitySql,

    // q196: q49's overlap counts (3-shingles for sensitivity) -> top-3
    // corpus docs per benchmark item
    "q196_contamination_attribution" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        |           FROM documents WHERE text IS NOT NULL),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         generate_series(1, greatest(len(w) - 2, 1)),
        |         i -> array_to_string(w[i:i+2], ' ')))) AS shingle
        |       FROM w),
        |b AS (SELECT doc_id AS bench_id, shingle FROM sh WHERE doc_id % 97 = 0),
        |ov AS (SELECT s.doc_id, b.bench_id, count(*) AS n_shared
        |       FROM sh s JOIN b ON s.shingle = b.shingle AND s.doc_id <> b.bench_id
        |       GROUP BY 1, 2),
        |r AS (SELECT bench_id, doc_id, n_shared,
        |             row_number() OVER (PARTITION BY bench_id
        |                                ORDER BY n_shared DESC, doc_id) AS rn
        |      FROM ov)
        |SELECT bench_id, doc_id, n_shared FROM r WHERE rn <= 3
        |ORDER BY bench_id, doc_id""".stripMargin,

    // q197: the oracle IS q191's full recompute — substring counts are
    // additive over document partitions, so merged state top-k == full
    // retrain (the tokenizer-shelf incremental==full theorem)
    "q197_incremental_wordpiece_vocab" ->
      s"""WITH $wordpieceVocabCtes
         |SELECT piece, cnt, rank FROM vocab ORDER BY rank""".stripMargin,

    // q198: optimal segmentation — the backward DP unrolled per layer
    "q198_viterbi_encode" -> viterbiEncodeSql,
    // q199/q200: unigram-LM EM training (2 iterations unrolled in
    // HUGEINT) + the coverage-preserving pruning tail
    "q199_unigram_train" -> unigramTrainSql,
    "q200_unigram_prune" -> unigramPruneSql,
    // q201: max-probability serving against the trained+pruned LM — the
    // chosen segmentation replayed position by position
    "q201_unigram_encode" -> unigramEncodeSql,
    // q202: incremental unigram retrain — the oracle IS the full
    // recompute (q199's), the incremental==full theorem for EM training
    "q202_incremental_unigram_train" -> unigramTrainSql,
    // q203: exact heavy hitters — the Misra–Gries candidate pass is pure
    // pruning (candidates ⊇ truth under any partitioning, pigeonhole),
    // so the data-defined output replays as GROUP BY + HAVING with the
    // same integer threshold cnt·(k+1) > n (k = 32)
    "q203_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |             FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT tok FROM toks WHERE tok <> ''),
         |n AS (SELECT count(*) AS n FROM t),
         |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1)
         |SELECT tok, CAST(cnt AS BIGINT) AS cnt,
         |       CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank
         |FROM c WHERE cnt * 33 > (SELECT n FROM n)
         |ORDER BY rank""".stripMargin,

    // q204: incremental heavy hitters — the oracle IS the full recompute
    // (q203's): the segment-pigeonhole candidate filter is pure pruning
    // (candidates ⊇ truth over any segmentation) and the verify sum of
    // exact additive counts recounts exactly, so incremental == full is
    // a theorem, replayed as the same GROUP BY … HAVING
    "q204_incremental_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |             FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT tok FROM toks WHERE tok <> ''),
         |n AS (SELECT count(*) AS n FROM t),
         |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1)
         |SELECT tok, CAST(cnt AS BIGINT) AS cnt,
         |       CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank
         |FROM c WHERE cnt * 33 > (SELECT n FROM n)
         |ORDER BY rank""".stripMargin,

    // q205: multi-pattern substring counts — the Aho–Corasick automaton
    // replayed by brute force: every (position, pattern) pair compared
    // (scalar generate_series is the q194 list-comprehension device), so
    // overlapping occurrences AND dictionary-suffix outputs ("scan"
    // ending => "can"/"an" end there too) are position-checked
    "q205_phrase_match" ->
      s"""WITH pats(pat) AS (VALUES ('scan'),('can'),('an'),('sort merge'),('merge'),('window w')),
         |d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL),
         |m AS (
         |  SELECT d.doc_id, p.pat,
         |         len(list_filter(generate_series(1, length(d.t) - length(p.pat) + 1),
         |             i -> substr(d.t, i, length(p.pat)) = p.pat)) AS cnt
         |  FROM d CROSS JOIN pats p)
         |SELECT doc_id, pat, CAST(cnt AS BIGINT) AS cnt
         |FROM m WHERE cnt > 0
         |ORDER BY doc_id, pat""".stripMargin,

    // q206: the blocklist curation verdict — survivors are the anti-join
    // of documents against any-hit docs (position(pat IN t) replays the
    // automaton's "any occurrence" decision)
    "q206_blocklist_filter" ->
      s"""WITH pats(pat) AS (VALUES ('sort merge'),('vector join'),('dup')),
         |d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE text IS NOT NULL),
         |hit AS (SELECT DISTINCT d.doc_id
         |        FROM d CROSS JOIN pats p WHERE position(p.pat IN d.t) > 0)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM hit)
         |ORDER BY doc_id""".stripMargin,

    // q207: per-language heavy hitters — the q203 replay grouped by
    // lang: GROUP BY lang, tok HAVING cnt·33 > that language's total,
    // rank partitioned by lang (the per-group pigeonhole is pure
    // pruning, invisible to the data-defined result)
    "q207_lang_heavy_hitters" ->
      s"""WITH toks AS (SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
         |             FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
         |t AS (SELECT lang, tok FROM toks WHERE tok <> ''),
         |n AS (SELECT lang, count(*) AS n FROM t GROUP BY 1),
         |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2)
         |SELECT c.lang, c.tok, CAST(c.cnt AS BIGINT) AS cnt,
         |       CAST(row_number() OVER (PARTITION BY c.lang ORDER BY c.cnt DESC, c.tok) AS BIGINT) AS rank
         |FROM c JOIN n ON n.lang = c.lang
         |WHERE c.cnt * 33 > n.n
         |ORDER BY c.lang, rank""".stripMargin,

    // q208: content-defined chunking — the 8-term polynomial rolling
    // hash (B=101, D=61) and the boundary slicing replayed position by
    // position; `aguard` error()s on non-ASCII text (the documented
    // ascii() cross-engine parity assumption) instead of diverging
    "q208_cdc_chunks" ->
      s"""WITH $cdcCtes
         |SELECT doc_id, chunk_ix, chunk FROM ch
         |ORDER BY doc_id, chunk_ix""".stripMargin,

    // q209: chunk-level dedup accounting — a chunk is shared iff its
    // text occurs in >= 2 distinct documents (the engine groups md5
    // digests; grouping the text itself is the same data-defined count)
    "q209_cdc_dedup_stats" ->
      s"""WITH $cdcCtes,
         |s AS (SELECT chunk, count(DISTINCT doc_id) AS docs FROM ch GROUP BY 1)
         |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN s.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |FROM ch JOIN s USING (chunk) GROUP BY 1
         |ORDER BY doc_id""".stripMargin,

    // q194: q61's near-dup chain -> components -> md5 split keyed on the
    // cluster canonical (singletons key on themselves), so near-dups can
    // never straddle splits
    "q194_cluster_split" ->
      s"""WITH RECURSIVE $minhashCandCtes,
         |shd AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |      generate_series(1, greatest(len(w) - 4, 1)),
         |      i -> array_to_string(w[i:i+4], ' '))) AS shs
         |  FROM words),
         |nd AS (
         |  SELECT id_a, id_b
         |  FROM cand
         |  JOIN shd da ON da.doc_id = cand.id_a
         |  JOIN shd db ON db.doc_id = cand.id_b
         |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE) /
         |        len(list_distinct(list_concat(da.shs, db.shs))) >= 0.8),
         |ed AS (SELECT id_a AS src, id_b AS dst FROM nd
         |       UNION SELECT id_b, id_a FROM nd),
         |nodes AS (SELECT DISTINCT src AS id FROM ed),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT ed.dst, reach.lbl FROM reach JOIN ed ON ed.src = reach.id),
         |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
         |keyed AS (SELECT d.doc_id, CAST(coalesce(c.lbl, d.doc_id) AS BIGINT) AS split_key
         |          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
         |SELECT doc_id, split_key,
         |       CASE WHEN CAST(concat('0x', substr(md5(CAST(split_key AS VARCHAR)), 1, 6)) AS BIGINT)
         |                 % 10000 < 8000 THEN 'train'
         |            WHEN CAST(concat('0x', substr(md5(CAST(split_key AS VARCHAR)), 1, 6)) AS BIGINT)
         |                 % 10000 < 9000 THEN 'validation'
         |            ELSE 'test' END AS split
         |FROM keyed ORDER BY doc_id""".stripMargin,

    "q182_url_normalize" ->
      s"""WITH $urlCtes
         |SELECT doc_id, url, url_norm, domain FROM dm ORDER BY doc_id""".stripMargin,

    "q183_domain_quota" ->
      s"""WITH $urlCtes
         |SELECT doc_id, domain, n_chars FROM (
         |  SELECT doc_id, domain, n_chars,
         |         row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM dm)
         |WHERE rn <= 25 ORDER BY doc_id""".stripMargin,

    "q184_domain_stats" ->
      s"""WITH $urlCtes
         |SELECT domain, count(*) AS n_docs,
         |       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars
         |FROM dm GROUP BY domain ORDER BY domain""".stripMargin,

    // q151's chi2/JS machinery keyed by the registered domain; mod-3
    // snapshot split (co-prime with the generator moduli, so the halves
    // share domains and the statistics are non-degenerate)
    "q185_domain_drift" ->
      s"""WITH $urlCtes,
         |b AS (SELECT coalesce(domain, '__null__') AS c, count(*) AS cb FROM dm WHERE doc_id % 3 = 0 GROUP BY 1),
         |c AS (SELECT coalesce(domain, '__null__') AS c, count(*) AS cc FROM dm WHERE doc_id % 3 <> 0 GROUP BY 1),
         |j AS (SELECT coalesce(b.c, c.c) AS c, coalesce(cb, 0) AS cb, coalesce(cc, 0) AS cc
         |      FROM b FULL OUTER JOIN c ON b.c = c.c),
         |t AS (SELECT sum(cb) AS nb, sum(cc) AS nc, count(*) AS k FROM j),
         |chi AS (
         |  SELECT round(CAST(sum(CAST(round(
         |    (CAST(cb AS DOUBLE) - CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
         |      * (CAST(cb AS DOUBLE) - CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
         |      / (CAST((cb + cc) * nb AS DOUBLE) / CAST(nb + nc AS DOUBLE))
         |    + (CAST(cc AS DOUBLE) - CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE))
         |      * (CAST(cc AS DOUBLE) - CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE))
         |      / (CAST((cb + cc) * nc AS DOUBLE) / CAST(nb + nc AS DOUBLE)), 9) AS DECIMAL(28,12)))
         |    AS DOUBLE), 9) AS chi2
         |  FROM j, t),
         |js AS (
         |  SELECT round(CAST(sum(CAST(round(
         |    CASE WHEN CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) > 0
         |      THEN 0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
         |           * ln((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
         |                / ((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) + CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)) / 2))
         |      ELSE 0 END
         |    + CASE WHEN CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE) > 0
         |      THEN 0.5 * (CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
         |           * ln((CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE))
         |                / ((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) + CAST(cc AS DOUBLE) / CAST(nc AS DOUBLE)) / 2))
         |      ELSE 0 END, 9) AS DECIMAL(28,12))) AS DOUBLE), 9) AS js_divergence
         |  FROM j, t)
         |SELECT CAST(nb AS BIGINT) AS n_base, CAST(nc AS BIGINT) AS n_cur,
         |       CAST(k AS BIGINT) AS n_categories, chi2, js_divergence
         |FROM t, chi, js""".stripMargin
  )

  /** Unrolled squared-L2 over `dim` list elements with the SAME left
    * association as Quantize.l2Sq's reduce — bit-identical doubles on both
    * engines (the zOrderSql unroll precedent).
    */
  private def l2SqSql(a: String, b: String, dim: Int): String =
    (0 until dim).map(j => s"($a[${j + 1}] - $b[${j + 1}]) * ($a[${j + 1}] - $b[${j + 1}])")
      .mkString(" + ")

  /** Shared URL-curation CTE chain: rebuilds DocQueries.withSyntheticUrls
    * byte-for-byte (pure modular arithmetic + concat), then replays
    * UrlCuration.normalizeUrl (scheme/host lowering, www strip, default
    * ports, fragment/empty-query drop, one trailing slash) and
    * registeredDomain (PSL-subset multi-label suffixes) with DuckDB
    * string ops. `dm` carries (doc_id, url, url_norm, host, domain,
    * n_chars, source).
    */
  private def urlCtes: String =
    """u AS (SELECT doc_id, source, n_chars,
      |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
      |  (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END) ||
      |  (CASE WHEN doc_id % 8 = 0 THEN 'cdn.' ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END) || CAST(doc_id % 7 AS VARCHAR) || '.' ||
      |  (CASE WHEN doc_id % 5 = 0 THEN 'com' WHEN doc_id % 5 = 1 THEN 'org' WHEN doc_id % 5 = 2 THEN 'co.uk' WHEN doc_id % 5 = 3 THEN 'com.au' ELSE 'net' END) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN ':443' WHEN doc_id % 6 = 1 THEN ':80' WHEN doc_id % 6 = 2 THEN ':8080' ELSE '' END) ||
      |  (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '/a/b' || CAST(doc_id % 10 AS VARCHAR) || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) END) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN '?x=' || CAST(doc_id % 4 AS VARCHAR) WHEN doc_id % 9 = 1 THEN '?' ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END) AS url
      |FROM documents),
      |up AS (SELECT *, lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |              regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth
      |       FROM u),
      |up2 AS (SELECT *,
      |  regexp_replace(lower(regexp_replace(auth, ':[0-9]+$', '')), '^www\.', '') AS host,
      |  regexp_extract(auth, ':([0-9]+)$', 1) AS port,
      |  regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/$', '') AS path,
      |  CASE WHEN url LIKE '%?%' THEN regexp_extract(url, '\?([^#]*)', 1) ELSE NULL END AS query
      |  FROM up),
      |nrm AS (SELECT doc_id, url, source, n_chars, host,
      |  scheme || '://' || host ||
      |  (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80') AND NOT (scheme = 'https' AND port = '443') THEN ':' || port ELSE '' END) ||
      |  path ||
      |  (CASE WHEN query IS NOT NULL AND query <> '' THEN '?' || query ELSE '' END) AS url_norm
      |  FROM up2),
      |dm AS (SELECT *,
      |  CASE WHEN len(string_split(host, '.')) >= 3 AND array_to_string(string_split(host, '.')[-2:], '.') IN ('co.uk','org.uk','gov.uk','ac.uk','com.au','net.au','org.au','co.jp','ne.jp','or.jp','com.br','com.mx','co.in','co.nz','com.sg','com.cn') THEN array_to_string(string_split(host, '.')[-3:], '.')
      |       WHEN len(string_split(host, '.')) >= 2 THEN array_to_string(string_split(host, '.')[-2:], '.')
      |       ELSE host END AS domain
      |  FROM nrm)""".stripMargin

  /** Shared PQ CTE chain replaying Quantize.pqCodebooks (m=4, subDim=16,
    * k=8): slice → lowest-id seeds with dense 0-based cids → unrolled-L2
    * argmin (dist, cid tiebreak — the min(struct) order) → decimal-exact
    * member means. `cb` is the flat codebook, `cbsub`/`codes` replay
    * pqCodebookArrays + pqCodes for the downstream queries.
    */
  private def pqCtes: String = {
    val seedDist = l2SqSql("sl.sv", "seeds.cv", 16)
    val codeDist = l2SqSql("sl.sv", "cbsub.cv", 16)
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sl AS (SELECT vec_id AS vid, t.s AS ss, v[(t.s*16+1):(t.s*16+16)] AS sv
       |       FROM e CROSS JOIN range(4) t(s)),
       |seedv AS (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cid
       |          FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)),
       |seeds AS (SELECT cid, t.s AS ss, v[(t.s*16+1):(t.s*16+16)] AS cv
       |          FROM seedv CROSS JOIN range(4) t(s)),
       |assigned AS (SELECT vid, ss, cid, sv FROM (
       |    SELECT sl.vid, sl.ss, seeds.cid, sl.sv,
       |           row_number() OVER (PARTITION BY sl.vid, sl.ss
       |                              ORDER BY $seedDist, seeds.cid) AS rn
       |    FROM sl JOIN seeds ON sl.ss = seeds.ss)
       |  WHERE rn = 1),
       |exm AS (SELECT ss, cid, unnest(sv) AS val, generate_subscripts(sv, 1) AS dim
       |        FROM assigned),
       |cb AS (SELECT CAST(ss AS BIGINT) AS subspace, cid AS centroid_id,
       |              CAST(dim - 1 AS BIGINT) AS dim, count(*) AS n_members,
       |              round(CAST(sum(CAST(val AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS value
       |       FROM exm GROUP BY ss, cid, dim),
       |cbsub AS (SELECT subspace AS ss, centroid_id AS cid, list(value ORDER BY dim) AS cv
       |          FROM cb GROUP BY 1, 2),
       |codes AS (SELECT vid, ss, cid AS code FROM (
       |    SELECT sl.vid, sl.ss, cbsub.cid,
       |           row_number() OVER (PARTITION BY sl.vid, sl.ss
       |                              ORDER BY $codeDist, cbsub.cid) AS rn
       |    FROM sl JOIN cbsub ON sl.ss = cbsub.ss)
       |  WHERE rn = 1)""".stripMargin
  }

  private def pqCodebooksSql: String =
    s"""WITH $pqCtes
       |SELECT subspace, centroid_id, dim, n_members, value
       |FROM cb ORDER BY subspace, centroid_id, dim""".stripMargin

  private def pqCodesSql: String =
    s"""WITH $pqCtes
       |SELECT vid AS vec_id, CAST(ss AS BIGINT) AS subspace, code
       |FROM codes ORDER BY vec_id, subspace""".stripMargin

  /** The ADC scoring CTEs shared by q102/q103: query slices, per-(query,
    * subspace, centroid) distance table, per-(query, vector) decimal sum.
    */
  private def pqAdcCtes: String = {
    val adcDist = l2SqSql("qsl.sv", "cbsub.cv", 16)
    s"""qsl AS (SELECT vid AS qid, ss, sv FROM sl WHERE vid < 3),
       |dt AS (SELECT qid, cbsub.ss, cbsub.cid, CAST($adcDist AS DECIMAL(28,9)) AS qd
       |       FROM qsl JOIN cbsub ON qsl.ss = cbsub.ss),
       |scored AS (SELECT dt.qid, codes.vid,
       |                  round(CAST(sum(qd) AS DOUBLE), 6) AS adc_dist
       |           FROM codes JOIN dt ON codes.ss = dt.ss AND codes.code = dt.cid
       |           WHERE dt.qid <> codes.vid
       |           GROUP BY 1, 2)""".stripMargin
  }

  private def pqAdcTopKSql: String =
    s"""WITH $pqCtes,
       |$pqAdcCtes
       |SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vid AS neighbor_id, adc_dist
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rn
       |      FROM scored)
       |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin

  private def pqRerankSql: String = {
    val exact = l2SqSql("qe.v", "ne.v", 64)
    s"""WITH $pqCtes,
       |$pqAdcCtes,
       |short AS (SELECT qid, vid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc_dist, vid) AS rn
       |    FROM scored)
       |  WHERE rn <= 50),
       |rr AS (SELECT s.qid, s.vid, round($exact, 6) AS l2_dist
       |       FROM short s JOIN e qe ON qe.vec_id = s.qid JOIN e ne ON ne.vec_id = s.vid)
       |SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vid AS neighbor_id, l2_dist
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY l2_dist, vid) AS rn
       |      FROM rr)
       |WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** q77's per-column UNION ALL branches, generated from the same column
    * list the Spark query profiles.
    */
  private def columnProfileSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val branches = cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |       count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (\n$branches\n) ORDER BY "column""""
  }

  /** q78's bit-interleave chain, generated with the same unroll as
    * Layout.zValue (bit i of a → output bit 2i+1, of b → 2i).
    */
  private def zOrderSql: String = {
    val terms = (0 until 16).map { i =>
      s"((((a >> $i) & 1) << ${2 * i + 1}) | (((b >> $i) & 1) << ${2 * i}))"
    }.mkString(" | ")
    s"""WITH m AS (
       |  SELECT l_orderkey, l_partkey,
       |         CAST(l_orderkey % 65536 AS BIGINT) AS a,
       |         CAST(l_partkey % 65536 AS BIGINT) AS b
       |  FROM lineitem)
       |SELECT l_orderkey, l_partkey, CAST($terms AS BIGINT) AS z
       |FROM m ORDER BY z, l_orderkey, l_partkey LIMIT 100""".stripMargin
  }
}
