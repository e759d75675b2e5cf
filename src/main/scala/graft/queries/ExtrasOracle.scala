package graft.queries

/** DuckDB oracle twins for [[Extras]]. Shares the constants (MinHash
  * permutations, thresholds, hash modulus) with the Spark side so the
  * two can never drift.
  */
object ExtrasOracle {

  private val P = graft.functions.TextFns.HashMod
  private val permsValues = Extras.Perms
    .map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")

  /** Portable token hash, DuckDB form. */
  private val TH = s"CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % $P"

  /** Deterministic 0–99 doc-id bucket, DuckDB twin of
    * [[Extras]]'s `idBucket` (sampling / split assignment).
    */
  private val Bucket =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100"

  /** Exact decimal dot product over duckdb list columns a·b (64 dims),
    * VARCHAR-routed for bit parity with Spark (see OracleSql notes).
    */
  private def dot(a: String, b: String): String =
    s"CAST(CAST(SUM(CAST(CAST(CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) AS VARCHAR)" +
      s" AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE)"

  /** Shared AnnIndex maintenance replay (x65c / x76b): the
    * build→optimize lifecycle expressed relationally over the corpus
    * rows `vec_id <corpusPred>` — 16-seed decimal-argmax assignment,
    * occupancy threshold t = `thrExpr` over the corpus (default the
    * mean ⌊n/16⌋ that mirrors x65c's fixed cap; x65d passes the
    * ⌈√n⌉ policy `optimizeIfOutgrown` applies), then the r16 one-pass
    * split of every cell with n > t:
    *  - TWO-ANCHOR seeds (k = ⌈n/t⌉): seed 0 at rank 1 of the
    *    (parent score DESC NULLS LAST, vec_id) order; seed i ≥ 1 at
    *    rank 1 + (n−1)(i−1) // (k−1) of the DIVERSITY order — exact-
    *    decimal L2 distance² to seed 0 (|x|² − 2·x·s₀ + |s₀|²) DESC
    *    NULLS LAST, vec_id. Seed 0 keeps the cell id, seed i ≥ 1
    *    numbers after 16 by running (k−1) offset.
    *  - nearest-seed Voronoi (L2: 2·x·s − |s|², ties → lowest si),
    *  - TWO unrolled Lloyd sweeps: per live (cell, child) the
    *    DECIMAL(30,12) per-dimension sum vector → double; members
    *    re-join the live child of max exact cosine (decimal dots,
    *    double sqrt/divide, degenerate → −2, ties → smaller child);
    *  - seed members PINNED to their lowest-si child through Voronoi
    *    and both sweeps;
    *  - rank-slice overflow by plain vec_id order (slices of ≤ t
    *    rows; slice 0 keeps the child id, later slices number after
    *    the Voronoi block by (child, slice)).
    * Leaves the final assignment `na(vec_id, cell)`, the refreshed
    * centroids `newcents(cid, c)` (NORMALIZED decimal-mean per
    * materialized rewritten cell — no phantom children), and the
    * intermediate `assign(vec_id, cell)` (the PRE-optimize layout) in
    * scope. No leading WITH.
    *
    * Every CTE is `AS MATERIALIZED`: the chain is ~30 levels deep with
    * multi-referenced stages (a0 → mu1/l1 → a1 → mu2/l2 → a2 …), and
    * DuckDB's default CTE inlining re-evaluates each reference —
    * measured ~2× per level, turning a 1.6 s replay into minutes.
    */
  private def annMaintCtes(corpusPred: String,
      thrExpr: String = "COUNT(*) // 16"): String =
    s"""cents AS MATERIALIZED (SELECT vec_id AS cid, embedding AS c FROM embeddings
       |  WHERE vec_id BETWEEN 1 AND 16),
       |sc AS MATERIALIZED (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS d
       |  FROM embeddings e, cents s, generate_series(1, 64) t(i)
       |  WHERE e.vec_id $corpusPred
       |  GROUP BY e.vec_id, s.cid),
       |assign AS MATERIALIZED (SELECT vec_id, cid AS cell FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d DESC, cid) AS rn FROM sc) WHERE rn = 1),
       |occ AS MATERIALIZED (SELECT cell, COUNT(*) AS n FROM assign GROUP BY cell),
       |thr AS MATERIALIZED (SELECT GREATEST(1, $thrExpr) AS t FROM embeddings
       |  WHERE vec_id $corpusPred),
       |hot AS MATERIALIZED (SELECT cell, n, (n + t - 1) // t AS k
       |  FROM occ, thr WHERE n > t),
       |hoff AS MATERIALIZED (SELECT cell, n, k,
       |    16 + COALESCE(SUM(k - 1) OVER (ORDER BY cell
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
       |  FROM hot),
       |md AS MATERIALIZED (SELECT a.vec_id, a.cell, sc.d, row_number() OVER (
       |      PARTITION BY a.cell
       |      ORDER BY sc.d DESC NULLS LAST, a.vec_id) AS rn
       |  FROM assign a JOIN hot h ON h.cell = a.cell
       |  JOIN sc ON sc.vec_id = a.vec_id AND sc.cid = a.cell),
       |n2m AS MATERIALIZED (SELECT m.vec_id, ${dot("e.embedding", "e.embedding")} AS n2
       |  FROM md m JOIN embeddings e ON e.vec_id = m.vec_id,
       |    generate_series(1, 64) t(i)
       |  GROUP BY m.vec_id),
       |s0 AS MATERIALIZED (SELECT cell, vec_id AS svid0 FROM md WHERE rn = 1),
       |f0 AS MATERIALIZED (SELECT m.vec_id, m.cell,
       |    n2m.n2 - 2 * ${dot("e.embedding", "es.embedding")} + s0n.n2 AS f0
       |  FROM md m JOIN s0 ON s0.cell = m.cell
       |    JOIN embeddings e ON e.vec_id = m.vec_id
       |    JOIN embeddings es ON es.vec_id = s0.svid0
       |    JOIN n2m ON n2m.vec_id = m.vec_id
       |    JOIN n2m s0n ON s0n.vec_id = s0.svid0,
       |    generate_series(1, 64) t(i)
       |  GROUP BY m.vec_id, m.cell, n2m.n2, s0n.n2),
       |fr AS MATERIALIZED (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
       |    ORDER BY f0 DESC NULLS LAST, vec_id) AS frn FROM f0),
       |sdef AS MATERIALIZED (SELECT cell, base, n, k,
       |    unnest(generate_series(0, k - 1)) AS si FROM hoff),
       |seeds AS MATERIALIZED (
       |  SELECT cell, 0 AS si, cell AS child, svid0 AS svid FROM s0
       |  UNION ALL
       |  SELECT sd.cell, sd.si, sd.base + sd.si AS child, fr.vec_id AS svid
       |  FROM (SELECT cell, base, si,
       |      1 + ((n - 1) * (si - 1)) // (k - 1) AS srank
       |    FROM sdef WHERE si >= 1) sd
       |  JOIN fr ON fr.cell = sd.cell AND fr.frn = sd.srank),
       |pins AS MATERIALIZED (SELECT cell, svid AS vec_id, child FROM (
       |    SELECT cell, svid, child, row_number() OVER (
       |      PARTITION BY cell, svid ORDER BY si) AS prn FROM seeds)
       |  WHERE prn = 1),
       |rd AS MATERIALIZED (SELECT m.vec_id, m.cell, s.si, s.child,
       |    2 * ${dot("e.embedding", "es.embedding")}
       |      - ${dot("es.embedding", "es.embedding")} AS score
       |  FROM md m JOIN seeds s ON s.cell = m.cell
       |    JOIN embeddings e ON e.vec_id = m.vec_id
       |    JOIN embeddings es ON es.vec_id = s.svid,
       |    generate_series(1, 64) t(i)
       |  GROUP BY m.vec_id, m.cell, s.si, s.child),
       |a0 AS MATERIALIZED (SELECT r.vec_id, r.cell, COALESCE(p.child, r.child) AS child
       |  FROM (SELECT vec_id, cell, child FROM (
       |      SELECT vec_id, cell, child, row_number() OVER (
       |        PARTITION BY vec_id
       |        ORDER BY score DESC NULLS LAST, si) AS rn FROM rd)
       |    WHERE rn = 1) r
       |  LEFT JOIN pins p ON p.cell = r.cell AND p.vec_id = r.vec_id),
       |mu1 AS MATERIALIZED (SELECT a.cell, a.child, i,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[i] AS DOUBLE) AS VARCHAR)
       |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS cc
       |  FROM a0 a JOIN embeddings e ON e.vec_id = a.vec_id,
       |    generate_series(1, 64) t(i)
       |  GROUP BY a.cell, a.child, i),
       |mn1 AS MATERIALIZED (SELECT cell, child,
       |    CAST(CAST(SUM(CAST(CAST(cc*cc AS VARCHAR) AS DECIMAL(30,20)))
       |      AS VARCHAR) AS DOUBLE) AS mn
       |  FROM mu1 GROUP BY cell, child),
       |l1 AS MATERIALIZED (SELECT a.vec_id, a.cell, m.child,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[m.i] AS DOUBLE) * m.cc
       |      AS VARCHAR) AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS dt
       |  FROM a0 a JOIN embeddings e ON e.vec_id = a.vec_id
       |    JOIN mu1 m ON m.cell = a.cell
       |  GROUP BY a.vec_id, a.cell, m.child),
       |a1 AS MATERIALIZED (SELECT w.vec_id, w.cell, COALESCE(p.child, w.child) AS child
       |  FROM (SELECT vec_id, cell, child FROM (
       |      SELECT l.vec_id, l.cell, l.child, row_number() OVER (
       |        PARTITION BY l.vec_id ORDER BY COALESCE(CASE
       |          WHEN n2m.n2 > 0 AND mn.mn > 0
       |          THEN l.dt / (sqrt(n2m.n2) * sqrt(mn.mn)) END, -2.0) DESC,
       |        l.child) AS rn
       |      FROM l1 l JOIN n2m ON n2m.vec_id = l.vec_id
       |        JOIN mn1 mn ON mn.cell = l.cell AND mn.child = l.child)
       |    WHERE rn = 1) w
       |  LEFT JOIN pins p ON p.cell = w.cell AND p.vec_id = w.vec_id),
       |mu2 AS MATERIALIZED (SELECT a.cell, a.child, i,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[i] AS DOUBLE) AS VARCHAR)
       |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS cc
       |  FROM a1 a JOIN embeddings e ON e.vec_id = a.vec_id,
       |    generate_series(1, 64) t(i)
       |  GROUP BY a.cell, a.child, i),
       |mn2 AS MATERIALIZED (SELECT cell, child,
       |    CAST(CAST(SUM(CAST(CAST(cc*cc AS VARCHAR) AS DECIMAL(30,20)))
       |      AS VARCHAR) AS DOUBLE) AS mn
       |  FROM mu2 GROUP BY cell, child),
       |l2 AS MATERIALIZED (SELECT a.vec_id, a.cell, m.child,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[m.i] AS DOUBLE) * m.cc
       |      AS VARCHAR) AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS dt
       |  FROM a1 a JOIN embeddings e ON e.vec_id = a.vec_id
       |    JOIN mu2 m ON m.cell = a.cell
       |  GROUP BY a.vec_id, a.cell, m.child),
       |a2 AS MATERIALIZED (SELECT w.vec_id, w.cell, COALESCE(p.child, w.child) AS child
       |  FROM (SELECT vec_id, cell, child FROM (
       |      SELECT l.vec_id, l.cell, l.child, row_number() OVER (
       |        PARTITION BY l.vec_id ORDER BY COALESCE(CASE
       |          WHEN n2m.n2 > 0 AND mn.mn > 0
       |          THEN l.dt / (sqrt(n2m.n2) * sqrt(mn.mn)) END, -2.0) DESC,
       |        l.child) AS rn
       |      FROM l2 l JOIN n2m ON n2m.vec_id = l.vec_id
       |        JOIN mn2 mn ON mn.cell = l.cell AND mn.child = l.child)
       |    WHERE rn = 1) w
       |  LEFT JOIN pins p ON p.cell = w.cell AND p.vec_id = w.vec_id),
       |slice AS MATERIALIZED (SELECT a.vec_id, a.child,
       |    (row_number() OVER (PARTITION BY a.child
       |      ORDER BY a.vec_id) - 1) // t AS sub
       |  FROM a2 a, thr),
       |subsd AS MATERIALIZED (SELECT DISTINCT child, sub FROM slice),
       |subs AS MATERIALIZED (SELECT child, sub, child AS fcell FROM subsd WHERE sub = 0
       |  UNION ALL SELECT child, sub,
       |    (SELECT 16 + SUM(k - 1) FROM hot) + row_number() OVER (
       |      ORDER BY child, sub) AS fcell
       |  FROM subsd WHERE sub > 0),
       |na AS MATERIALIZED (SELECT a.vec_id, COALESCE(sb.fcell, a.cell) AS cell
       |  FROM assign a
       |    LEFT JOIN slice s ON s.vec_id = a.vec_id
       |    LEFT JOIN subs sb ON sb.child = s.child AND sb.sub = s.sub),
       |ncm AS MATERIALIZED (SELECT n.cell, i,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[i] AS DOUBLE) AS VARCHAR)
       |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS cc
       |  FROM na n JOIN slice s ON s.vec_id = n.vec_id
       |    JOIN embeddings e ON e.vec_id = n.vec_id,
       |    generate_series(1, 64) t(i)
       |  GROUP BY n.cell, i),
       |ncn AS MATERIALIZED (SELECT cell,
       |    CAST(CAST(SUM(CAST(CAST(cc*cc AS VARCHAR) AS DECIMAL(30,20)))
       |      AS VARCHAR) AS DOUBLE) AS nn
       |  FROM ncm GROUP BY cell),
       |newcents AS MATERIALIZED (
       |  SELECT cid, c FROM cents WHERE cid NOT IN (SELECT cell FROM hot)
       |  UNION ALL
       |  SELECT m.cell AS cid,
       |    list(CASE WHEN n.nn > 0 THEN m.cc / sqrt(n.nn) ELSE m.cc END
       |      ORDER BY m.i) AS c
       |  FROM ncm m JOIN ncn n ON n.cell = m.cell GROUP BY m.cell, n.nn)""".stripMargin

  /** Shared recursive-CTE clustering prefix (x14 / x29): simhash- and
    * leading-8-token-fingerprint identity edges, min-label connected
    * components, ending at `lab(doc_id, cluster_id)`.
    */
  /** Shared 2-iteration Lloyd k-means prefix (x61 / x62): seeds are
    * vectors 1..8, assignment by exact-decimal cosine with a
    * smallest-cid tie-break, centroid update as the UNDIVIDED
    * per-dimension decimal-sum vector (cosine is scale-invariant, so
    * the sum ranks identically to the mean and sidesteps decimal
    * division's engine-specific rounding). Ends at
    * `a2(vec_id, cell, cos)`; also leaves `n1(vec_id, n1)` in scope.
    */
  private lazy val KmeansA2: String =
    s"""WITH n1 AS (SELECT vec_id, ${dot("embedding", "embedding")} AS n1
       |  FROM embeddings, generate_series(1, 64) t(i) GROUP BY vec_id),
       |seeds AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
       |  WHERE vec_id BETWEEN 1 AND (SELECT GREATEST(8, LEAST(1024,
       |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))) FROM embeddings)),
       |cn1 AS (SELECT cid, ${dot("s.c", "s.c")} AS cn FROM seeds s,
       |  generate_series(1, 64) t(i) GROUP BY cid),
       |sc1 AS (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS dot
       |  FROM embeddings e, seeds s, generate_series(1, 64) t(i)
       |  GROUP BY e.vec_id, s.cid),
       |a1 AS (SELECT vec_id, cid AS cell FROM (
       |    SELECT s.vec_id, s.cid, row_number() OVER (PARTITION BY s.vec_id
       |      ORDER BY COALESCE(s.dot/(sqrt(n1.n1)*sqrt(cn1.cn)), -2.0) DESC,
       |        s.cid) AS rn
       |    FROM sc1 s JOIN n1 ON n1.vec_id = s.vec_id
       |               JOIN cn1 ON cn1.cid = s.cid) WHERE rn = 1),
       |cent AS (SELECT a1.cell, i,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[i] AS DOUBLE) AS VARCHAR)
       |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS cc
       |  FROM embeddings e JOIN a1 ON a1.vec_id = e.vec_id,
       |    generate_series(1, 64) t(i)
       |  GROUP BY a1.cell, i),
       |cn2 AS (SELECT cell,
       |    CAST(CAST(SUM(CAST(CAST(cc*cc AS VARCHAR) AS DECIMAL(30,20)))
       |      AS VARCHAR) AS DOUBLE) AS cn
       |  FROM cent GROUP BY cell),
       |dots2 AS (SELECT e.vec_id, c.cell,
       |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[c.i] AS DOUBLE)*c.cc
       |      AS VARCHAR) AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS dot
       |  FROM embeddings e, cent c GROUP BY e.vec_id, c.cell),
       |a2 AS (SELECT vec_id, cell, cos FROM (
       |    SELECT d.vec_id, d.cell, d.dot/(sqrt(n1.n1)*sqrt(cn2.cn)) AS cos,
       |      row_number() OVER (PARTITION BY d.vec_id
       |        ORDER BY COALESCE(d.dot/(sqrt(n1.n1)*sqrt(cn2.cn)), -2.0) DESC,
       |          d.cell) AS rn
       |    FROM dots2 d JOIN n1 ON n1.vec_id = d.vec_id
       |                 JOIN cn2 ON cn2.cell = d.cell) WHERE rn = 1)""".stripMargin

  private val CcLab: String =
    s"""WITH RECURSIVE
       |toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |th AS (SELECT doc_id, $TH AS th FROM toks),
       |bits AS (SELECT doc_id, bit, SUM(((th >> bit) & 1)*2 - 1) AS s
       |  FROM th, generate_series(0, 31) t(bit) GROUP BY doc_id, bit),
       |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0
       |    THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT)
       |  AS simhash FROM bits GROUP BY doc_id),
       |r1 AS (SELECT a.doc_id AS u, m.v FROM sh a
       |  JOIN (SELECT simhash, MIN(doc_id) AS v FROM sh GROUP BY 1) m
       |  USING(simhash) WHERE a.doc_id <> m.v),
       |fp AS (SELECT doc_id,
       |    md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS sig
       |  FROM documents),
       |r2 AS (SELECT a.doc_id AS u, m.v FROM fp a
       |  JOIN (SELECT sig, MIN(doc_id) AS v FROM fp GROUP BY 1) m
       |  USING(sig) WHERE a.doc_id <> m.v),
       |edges AS (SELECT u, v FROM r1 UNION SELECT u, v FROM r2),
       |sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
       |cc(node, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT s.v, c.lab FROM cc c JOIN sym s ON s.u = c.node),
       |lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM cc GROUP BY node)""".stripMargin

  val sql: Map[String, String] = Map(
    // Recomputes each snapshot version's digest straight from the raw
    // table: v1 = status F, v2 = +O, v3 = minus o_orderkey%7==0 keys,
    // v4 = compaction (data-identical to v3 by contract). A broken
    // commit swap / delete / compaction hash-mismatches here.
    "x52_time_travel" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""WITH d2 AS (SELECT * FROM orders WHERE o_orderstatus IN ('F','O')),
         |d3 AS (SELECT * FROM d2 WHERE o_orderkey % 7 <> 0),
         |dig AS (
         |  SELECT CAST(1 AS BIGINT) AS version, $dig FROM orders
         |    WHERE o_orderstatus = 'F'
         |  UNION ALL SELECT CAST(2 AS BIGINT), $dig FROM d2
         |  UNION ALL SELECT CAST(3 AS BIGINT), $dig FROM d3
         |  UNION ALL SELECT CAST(4 AS BIGINT), $dig FROM d3)
         |SELECT version, n_rows, total_price, min_key, max_key
         |FROM dig ORDER BY version""".stripMargin
    },
    // Recomputes x53's merge relationally: survivors (keys not in the
    // delta) ∪ re-priced/status-moved updates ∪ fresh-key inserts,
    // then the same per-status digest. Decimal sum routes through
    // VARCHAR (float parity with Spark's double→decimal cast).
    "x53_merge_upsert" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""WITH cols AS (SELECT o_orderkey, o_orderstatus, o_totalprice
         |  FROM orders),
         |upd AS (SELECT o_orderkey, 'P' AS o_orderstatus,
         |    o_totalprice + 100 AS o_totalprice
         |  FROM cols WHERE o_orderkey % 10 = 0),
         |ins AS (SELECT o_orderkey + 10000000 AS o_orderkey,
         |    o_orderstatus, o_totalprice
         |  FROM cols WHERE o_orderkey % 97 = 0),
         |merged AS (
         |  SELECT * FROM cols WHERE o_orderkey % 10 <> 0
         |  UNION ALL SELECT * FROM upd
         |  UNION ALL SELECT * FROM ins)
         |SELECT o_orderstatus, $dig
         |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    // x54's range digest recomputed relationally — a wrongly-pruned
    // file (lost rows) on the Spark side hash-mismatches here.
    "x54_data_skipping" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""SELECT o_orderstatus, $dig
         |FROM orders WHERE o_orderkey BETWEEN 1000 AND 60000
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    // x55's per-commit digests from the same modulus split: v1 = keys
    // %3=0 (not in the (1,3] window), v2 = %3=1, v3 = %3=2.
    "x55_change_feed" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""SELECT CAST(2 AS BIGINT) AS _commit_version, $dig
         |  FROM orders WHERE o_orderkey % 3 = 1
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), $dig
         |  FROM orders WHERE o_orderkey % 3 = 2
         |ORDER BY _commit_version""".stripMargin
    },

    // x58: v1 = all orders; v2 = minus multiples of 5 (MoR DV); v3 =
    // minus multiples of 5 or 7 (overlapping DV union); v4 = compacted,
    // data-identical to v3.
    "x58_deletion_vectors" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""WITH d2 AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
         |d3 AS (SELECT * FROM d2 WHERE o_orderkey % 7 <> 0),
         |dig AS (
         |  SELECT CAST(1 AS BIGINT) AS version, $dig FROM orders
         |  UNION ALL SELECT CAST(2 AS BIGINT), $dig FROM d2
         |  UNION ALL SELECT CAST(3 AS BIGINT), $dig FROM d3
         |  UNION ALL SELECT CAST(4 AS BIGINT), $dig FROM d3)
         |SELECT version, n_rows, total_price, min_key, max_key
         |FROM dig ORDER BY version""".stripMargin
    },

    // x59: the incrementally-maintained MV must equal a from-scratch
    // recompute over the whole table — the feed dropping or
    // double-feeding a commit, or a lossy partial combine, all
    // hash-mismatch here.
    "x59_incremental_mv" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""SELECT o_orderstatus, $dig
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    // x60: three unrolled BPE training rounds — pair counts, argmax
    // (ties broken lexicographically), double-space merge application
    // (identical left-to-right replace semantics in both engines).
    "x60_bpe_train" -> {
      def cnts(i: Int, src: String) =
        s"c$i AS (SELECT concat_ws(' ', toks[j], toks[j+1]) AS pair, " +
        "CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS j " +
        s"FROM (SELECT string_split(text, ' ') AS toks FROM $src) " +
        "WHERE len(toks) >= 2) GROUP BY 1)"
      def pick(i: Int) =
        s"p$i AS (SELECT pair, n FROM c$i ORDER BY n DESC, pair LIMIT 1)"
      def merge(i: Int, src: String) =
        s"d$i AS (SELECT doc_id, trim(replace(replace(" +
        "' ' || array_to_string(string_split(text, ' '), '  ') || ' ', " +
        s"' ' || split_part((SELECT pair FROM p$i), ' ', 1) || '  ' || " +
        s"split_part((SELECT pair FROM p$i), ' ', 2) || ' ', " +
        s"' ' || split_part((SELECT pair FROM p$i), ' ', 1) || '_' || " +
        s"split_part((SELECT pair FROM p$i), ' ', 2) || ' '), " +
        s"'  ', ' ')) AS text FROM $src)"
      def toksAfter(i: Int) =
        s"t$i AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)" +
        s" AS nt FROM d$i)"
      def row(i: Int) =
        s"SELECT CAST($i AS BIGINT) AS round, (SELECT pair FROM p$i) AS pair," +
        s" (SELECT n FROM p$i) AS n, (SELECT nt FROM t$i) AS corpus_tokens_after"
      "WITH d0 AS (SELECT doc_id, text FROM documents), " +
        (1 to 3).map(i => Seq(cnts(i, s"d${i - 1}"), pick(i),
          merge(i, s"d${i - 1}"), toksAfter(i)).mkString(", ")).mkString(", ") +
        " " + (1 to 3).map(row).mkString(" UNION ALL ") + " ORDER BY round"
    },

    "x31_seq_pack" -> {
      val b = Extras.SeqPackBudget
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (SELECT doc_id, n_toks,
         |    CAST(SUM(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d)
         |SELECT doc_id, n_toks,
         |  CAST((cum - n_toks) // $b AS BIGINT) AS seq_first,
         |  CAST((cum - n_toks) % $b AS BIGINT) AS seq_off,
         |  CAST(CASE WHEN n_toks = 0 THEN 0
         |    ELSE (cum - 1) // $b - (cum - n_toks) // $b + 1 END AS BIGINT)
         |    AS n_seqs
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "x35_seq_stats" -> {
      val b = Extras.SeqPackBudget
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |c AS (SELECT doc_id, n_toks,
         |    CAST(SUM(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d),
         |p AS (SELECT cum - n_toks AS start_off, cum AS end_off,
         |    (cum - n_toks) // $b AS seq_first, (cum - 1) // $b AS seq_last
         |  FROM c WHERE n_toks > 0),
         |e AS (SELECT start_off, end_off,
         |    unnest(generate_series(seq_first, seq_last)) AS seq_id FROM p),
         |agg AS (SELECT CAST(seq_id AS BIGINT) AS seq_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(least(end_off, (seq_id + 1) * $b)
         |      - greatest(start_off, seq_id * $b)) AS BIGINT) AS n_tokens
         |  FROM e GROUP BY 1)
         |SELECT seq_id, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / $b.0 AS fill
         |FROM agg ORDER BY seq_id""".stripMargin
    },

    "x32_scd2" ->
      """SELECT user_id, event_type,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        |  strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current,
        |  value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |ORDER BY user_id, event_type, version""".stripMargin,

    "x33_snapshot_diff" ->
      """WITH a AS (SELECT user_id, event_type, event_id AS old_event_id
        |  FROM (SELECT user_id, event_type, event_id, row_number() OVER
        |      (PARTITION BY user_id, event_type
        |       ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-01'
        |      AND ts < TIMESTAMP '2024-01-04') WHERE rn = 1),
        |b AS (SELECT user_id, event_type, event_id AS new_event_id
        |  FROM (SELECT user_id, event_type, event_id, row_number() OVER
        |      (PARTITION BY user_id, event_type
        |       ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-27'
        |      AND ts < TIMESTAMP '2024-01-30') WHERE rn = 1),
        |j AS (SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |    COALESCE(a.event_type, b.event_type) AS event_type,
        |    a.old_event_id, b.new_event_id,
        |    CASE WHEN b.new_event_id IS NULL THEN 'removed'
        |         WHEN a.old_event_id IS NULL THEN 'added'
        |         WHEN a.old_event_id <> b.new_event_id THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM a FULL OUTER JOIN b
        |    ON a.user_id = b.user_id AND a.event_type = b.event_type)
        |SELECT user_id, event_type, change_type, old_event_id, new_event_id
        |FROM j WHERE change_type <> 'unchanged'
        |ORDER BY user_id, event_type""".stripMargin,

    // priority = exactly-rounded IEEE ops only (int64→double cast,
    // one division) — bit-identical on both engines by construction
    "x34_weighted_sample" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) AS DOUBLE)
        |      / CAST(n_chars AS DOUBLE) AS priority
        |  FROM documents)
        |SELECT CAST(rn AS BIGINT) AS rank, doc_id, n_chars, priority
        |FROM (SELECT *, row_number() OVER (ORDER BY priority, doc_id) AS rn
        |      FROM d)
        |WHERE rn <= 50 ORDER BY rank""".stripMargin,

    // the merged-sketch estimate is approximate by design; the
    // checkable contract is the BOUND (within 5% of exact), emitted by
    // the Spark side as a boolean the oracle asserts constant-true
    "x36_sketch_store" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
        |    AS n_days,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Aggregator float-sum order differs from the decimal-exact path
    // in the last ulps by design; the checkable contract is the 1e-9
    // closeness bound per (label, dim)
    "q26_centroid_agg" ->
      """SELECT DISTINCT label, CAST(i AS BIGINT) AS dim, true AS agg_close
        |FROM embeddings, generate_series(1, 64) t(i)
        |ORDER BY label, dim""".stripMargin,

    "x37_source_overlap" ->
      """WITH d AS (SELECT source, string_split(text, ' ') AS toks
        |  FROM documents),
        |shg AS (
        |  SELECT DISTINCT source,
        |      md5(array_to_string(toks[i:i+7], ' ')) AS sh
        |    FROM (SELECT source, toks,
        |            unnest(generate_series(1, len(toks) - 7)) AS i
        |          FROM d WHERE len(toks) >= 8)
        |  UNION
        |  SELECT DISTINCT source, md5(array_to_string(toks, ' ')) AS sh
        |    FROM d WHERE len(toks) < 8),
        |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
        |  FROM shg GROUP BY 1),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM shg a JOIN shg b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.shared,
        |  CAST(p.shared AS DOUBLE) / (ta.n_sh + tb.n_sh - p.shared) AS jaccard
        |FROM pairs p
        |JOIN tot ta ON ta.source = p.src_a
        |JOIN tot tb ON tb.source = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    "x38_filter_cascade" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks, n_chars
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    (CAST(n_chars AS DOUBLE) - (len(toks) - 1)) / len(toks) AS avg_tok_len,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
        |    CAST(len(list_filter(toks, t -> t IN ('a', 'the', 'of', 'and')))
        |      AS DOUBLE) / len(toks) AS stop_ratio
        |  FROM d)
        |SELECT doc_id, n_toks, avg_tok_len, diversity, stop_ratio,
        |  CASE WHEN n_toks < 16 THEN 'too_short'
        |       WHEN avg_tok_len < 3.8 OR avg_tok_len > 5.2 THEN 'tok_shape'
        |       WHEN diversity < 0.32 THEN 'low_diversity'
        |       WHEN stop_ratio > 0.125 THEN 'high_stopword' END AS fail_rule,
        |  CAST(CASE WHEN n_toks < 16 OR avg_tok_len < 3.8 OR avg_tok_len > 5.2
        |         OR diversity < 0.32 OR stop_ratio > 0.125
        |       THEN 0 ELSE 1 END AS INTEGER) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "x39_data_card" ->
      """WITH d AS (SELECT source, lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    md5(text) AS h
        |  FROM documents),
        |card AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS total_toks,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS uniq,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    SUM(n_chars) AS sum_chars,
        |    quantile_cont(n_chars, 0.5) AS p50_chars,
        |    quantile_cont(n_chars, 0.9) AS p90_chars
        |  FROM d GROUP BY 1),
        |lc AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1, 2),
        |top AS (SELECT source, lang AS top_lang FROM (
        |    SELECT source, lang,
        |      row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
        |    FROM lc) WHERE rn = 1)
        |SELECT c.source, c.n_docs, c.total_toks, c.n_langs, t.top_lang,
        |  1.0 - CAST(c.uniq AS DOUBLE) / c.n_docs AS dup_rate,
        |  CAST(c.sum_chars AS DOUBLE) / c.n_docs AS mean_chars,
        |  c.p50_chars, c.p90_chars
        |FROM card c JOIN top t ON t.source = c.source
        |ORDER BY c.source""".stripMargin,

    "x40_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |e AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0,
        |      CAST(ceil(greatest(n - 32, 0) / 24.0) AS BIGINT))) AS k
        |  FROM d)
        |SELECT doc_id, k AS chunk_idx, k * 24 + 1 AS start_pos,
        |  least(32, n - k * 24) AS chunk_toks,
        |  md5(array_to_string(toks[k*24+1 : k*24+32], ' ')) AS chunk_hash
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "x41_curriculum" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('a', 'the', 'of', 'and'))) AS BIGINT) AS n_stop
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |    0.4 * LEAST(n_toks / 100.0, 1.0)
        |      + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_toks)
        |      + 0.3 * LEAST(((CAST(len AS DOUBLE) - (n_toks - 1)) / n_toks) / 8.0, 1.0)
        |      AS score
        |  FROM b),
        |k AS (SELECT doc_id,
        |    CAST(CASE WHEN score >= 0.75 THEN 0 WHEN score >= 0.67 THEN 1
        |              WHEN score >= 0.58 THEN 2 ELSE 3 END AS BIGINT) AS tier,
        |    md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS skey
        |  FROM sc)
        |SELECT CAST(row_number() OVER (ORDER BY tier, skey, doc_id) AS BIGINT)
        |    AS pos, doc_id, tier, skey
        |FROM k ORDER BY pos""".stripMargin,

    "x42_funnel" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,

    "x43_retention" ->
      """WITH wk AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |first AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1)
        |SELECT cohort,
        |  CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_n,
        |  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS users
        |FROM wk w JOIN first f ON f.user_id = w.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x44_boilerplate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    md5(array_to_string(toks[i:i+2], ' ')) AS sh
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 2)) AS i
        |        FROM d WHERE len(toks) >= 3)),
        |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM d),
        |b AS (SELECT sh FROM
        |    (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1), nd
        |  WHERE df >= greatest(2, CAST(ceil(n_docs * 0.01) AS BIGINT)))
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrases,
        |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boiler,
        |  CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS boiler_frac
        |FROM sh s LEFT JOIN b ON b.sh = s.sh
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "x45_tfidf_keywords" ->
      """WITH tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tok, tf, df,
        |    CAST(tf * n_docs AS DOUBLE) / df AS score
        |  FROM tf JOIN dfs USING (tok), nd),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rk
        |  FROM sc)
        |SELECT doc_id, rk, tok, tf, df, score FROM r
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "x46_volume_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
        |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q
        |  FROM daily GROUP BY 1),
        |m AS (SELECT daily.event_type, day, n, d, s, q,
        |    CAST(s AS DOUBLE) / d AS mean,
        |    CASE WHEN d > 1
        |      THEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / d) / (d - 1)
        |      ELSE 0.0 END AS variance
        |  FROM daily JOIN st ON st.event_type = daily.event_type)
        |SELECT event_type, day, n, mean,
        |  CASE WHEN variance > 0.0 THEN (n - mean) / sqrt(variance)
        |       ELSE 0.0 END AS z,
        |  CAST(CASE WHEN abs(CASE WHEN variance > 0.0
        |          THEN (n - mean) / sqrt(variance) ELSE 0.0 END) > 2.0
        |        THEN 1 ELSE 0 END AS INTEGER) AS is_spike
        |FROM m ORDER BY event_type, day""".stripMargin,

    "x47_containment" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |      md5(array_to_string(toks[i:i+7], ' ')) AS sh
        |    FROM (SELECT doc_id, toks,
        |            unnest(generate_series(1, len(toks) - 7)) AS i
        |          FROM d WHERE len(toks) >= 8)
        |  UNION
        |  SELECT DISTINCT doc_id, md5(array_to_string(toks, ' ')) AS sh
        |    FROM d WHERE len(toks) < 8),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM sh GROUP BY 1),
        |rare AS (SELECT sh FROM
        |  (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1) WHERE df <= 100),
        |ix AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON r.sh = s.sh),
        |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(COUNT(*) AS BIGINT) AS shared
        |  FROM ix a JOIN ix b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.d1, p.d2, za.n AS n1, zb.n AS n2, p.shared,
        |  CAST(p.shared AS DOUBLE) / least(za.n, zb.n) AS containment
        |FROM pairs p
        |JOIN sz za ON za.doc_id = p.d1
        |JOIN sz zb ON zb.doc_id = p.d2
        |WHERE CAST(p.shared AS DOUBLE) / least(za.n, zb.n) >= 0.5
        |ORDER BY p.d1, p.d2""".stripMargin,

    "x48_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id AS c_user, ts AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |j AS (SELECT p.purchase_id, c.click_id, p.user_id, p.value, c.c_ts
        |  FROM p JOIN c ON c.c_user = p.user_id
        |    AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
        |    AND c.c_ts <= p.p_ts),
        |n AS (SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
        |  FROM j GROUP BY 1),
        |r AS (SELECT j.*, n.n_clicks,
        |    row_number() OVER (PARTITION BY j.purchase_id
        |      ORDER BY j.c_ts DESC, j.click_id DESC) AS rn
        |  FROM j JOIN n USING (purchase_id))
        |SELECT purchase_id, click_id, user_id, n_clicks,
        |  value / n_clicks AS credit,
        |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_last
        |FROM r ORDER BY purchase_id, click_id""".stripMargin,

    "x49_pipeline_funnel" ->
      """WITH base AS (SELECT doc_id, lang, source, text,
        |    string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    (CAST(n_chars AS DOUBLE) - (len(string_split(text, ' ')) - 1))
        |      / len(string_split(text, ' ')) AS avg_tok_len,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS diversity,
        |    CAST(len(list_filter(string_split(text, ' '),
        |        t -> t IN ('a', 'the', 'of', 'and'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS stop_ratio,
        |    0.4 * LEAST(len(string_split(text, ' ')) / 100.0, 1.0)
        |      + 0.3 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |          t -> t IN ('a', 'the', 'of', 'and'))) AS DOUBLE)
        |          / len(string_split(text, ' ')))
        |      + 0.3 * LEAST(((CAST(n_chars AS DOUBLE)
        |          - (len(string_split(text, ' ')) - 1))
        |          / len(string_split(text, ' '))) / 8.0, 1.0) AS score
        |  FROM documents),
        |s1 AS (SELECT * FROM base WHERE n_toks >= 16
        |  AND avg_tok_len >= 3.8 AND avg_tok_len <= 5.2
        |  AND diversity >= 0.32 AND stop_ratio <= 0.125),
        |s2 AS (SELECT s1.* FROM s1 JOIN
        |  (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM s1 GROUP BY 1) k
        |  ON k.doc_id = s1.doc_id),
        |sh AS (
        |  SELECT DISTINCT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS sh
        |    FROM (SELECT doc_id, toks,
        |            unnest(generate_series(1, len(toks) - 7)) AS i
        |          FROM s2 WHERE len(toks) >= 8)
        |  UNION
        |  SELECT DISTINCT doc_id, md5(array_to_string(toks, ' ')) AS sh
        |    FROM s2 WHERE len(toks) < 8),
        |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |rare AS (SELECT sh FROM
        |  (SELECT sh, COUNT(*) AS df FROM sh GROUP BY 1) WHERE df <= 100),
        |ix AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare r ON r.sh = s.sh),
        |losers AS (SELECT DISTINCT
        |    CASE WHEN za.n < zb.n THEN p.d1
        |         WHEN zb.n < za.n THEN p.d2
        |         ELSE greatest(p.d1, p.d2) END AS doc_id
        |  FROM (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |          CAST(COUNT(*) AS BIGINT) AS shared
        |        FROM ix a JOIN ix b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2) p
        |  JOIN sz za ON za.doc_id = p.d1
        |  JOIN sz zb ON zb.doc_id = p.d2
        |  WHERE CAST(p.shared AS DOUBLE) / least(za.n, zb.n) >= 0.5),
        |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |s4 AS (SELECT * FROM (SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY score DESC, doc_id) AS rk FROM s3)
        |  WHERE rk <= 20),
        |pl AS (SELECT lang, SUM(n_toks) AS lang_toks FROM s4 GROUP BY 1),
        |tot AS (SELECT SUM(lang_toks) AS total_toks FROM pl),
        |w(lang, w) AS (VALUES ('en', 0.40), ('es', 0.15), ('de', 0.15),
        |  ('fr', 0.15), ('zh', 0.15)),
        |rates AS (SELECT pl.lang,
        |    greatest(1, CAST(floor(LEAST(1.0,
        |      0.5 * CAST(tot.total_toks AS DOUBLE) * w.w
        |        / CAST(pl.lang_toks AS DOUBLE)) * 100.0) AS BIGINT)) AS keep_pct
        |  FROM pl JOIN w ON w.lang = pl.lang, tot),
        |s5 AS (SELECT s4.* FROM s4 JOIN rates ON rates.lang = s4.lang
        |  WHERE CAST(('0x' || substr(md5(CAST(s4.doc_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 100 < rates.keep_pct)
        |SELECT stage, n_docs, n_toks FROM (
        |  SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_toks FROM base
        |  UNION ALL SELECT '1_quality', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s1
        |  UNION ALL SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s2
        |  UNION ALL SELECT '3_containment', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s3
        |  UNION ALL SELECT '4_source_cap', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s4
        |  UNION ALL SELECT '5_mixture', CAST(COUNT(*) AS BIGINT),
        |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s5)
        |ORDER BY stage""".stripMargin,

    "x51_token_drift" ->
      """WITH toks AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 100 < 50 AS in_a,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok,
        |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
        |    CAST(SUM(n_b) AS BIGINT) AS t_b FROM c),
        |sc AS (SELECT tok, n_a, n_b,
        |    CAST(n_a AS DOUBLE) / t_a AS p_a,
        |    CAST(n_b AS DOUBLE) / t_b AS p_b,
        |    abs(CAST(n_a AS DOUBLE) / t_a - CAST(n_b AS DOUBLE) / t_b) AS drift
        |  FROM c, tot),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY drift DESC, tok)
        |    AS BIGINT) AS rank FROM sc)
        |SELECT rank, tok, n_a, n_b, p_a, p_b, drift FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // x56: non-overlapping 3-token segments; a segment with distinct-doc
    // frequency >= 2 is boilerplate; docs reassemble from kept segments
    // in order (string_agg ORDER BY k twins Spark's sort_array).
    "x56_segment_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |seg AS (SELECT doc_id, k,
        |    array_to_string(toks[k*3+1 : k*3+3], ' ') AS seg_txt
        |  FROM (SELECT doc_id, toks, unnest(generate_series(0,
        |      CAST(ceil(len(toks) / 3.0) AS BIGINT) - 1)) AS k FROM d)),
        |boiler AS (SELECT seg_txt FROM
        |    (SELECT seg_txt, COUNT(DISTINCT doc_id) AS df FROM seg GROUP BY 1)
        |  WHERE df >= 2),
        |fl AS (SELECT s.doc_id, s.k, s.seg_txt, b.seg_txt IS NULL AS keep
        |  FROM seg s LEFT JOIN boiler b USING (seg_txt))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
        |  coalesce(string_agg(CASE WHEN keep THEN seg_txt END, ' '
        |    ORDER BY k), '') AS clean_text
        |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x57: bigram familiarity — exact-integer corpus counts, doc-side
    // multiplicity pre-agg, integer cross-multiplied buckets.
    "x57_lm_quality" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id, array_to_string(toks[i : i+1], ' ') AS big
        |  FROM (SELECT doc_id, toks,
        |      unnest(generate_series(1, len(toks) - 1)) AS i
        |    FROM d WHERE len(toks) >= 2)),
        |m AS (SELECT doc_id, big, CAST(COUNT(*) AS BIGINT) AS m
        |  FROM bg GROUP BY 1, 2),
        |c AS (SELECT big, CAST(SUM(m) AS BIGINT) AS c FROM m GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(SUM(m.m) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(m.m * c.c) AS BIGINT) AS sum_freq
        |  FROM m JOIN c USING (big) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_bigrams) AS BIGINT) AS t_n,
        |    CAST(SUM(sum_freq) AS BIGINT) AS t_s FROM sc)
        |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
        |  coalesce(sum_freq, 0) AS sum_freq,
        |  CAST(sum_freq AS DOUBLE) / n_bigrams AS avg_freq,
        |  CASE WHEN sum_freq::HUGEINT * t_n > n_bigrams::HUGEINT * t_s
        |       THEN 'familiar'
        |       WHEN n_bigrams > 0 THEN 'unfamiliar'
        |       ELSE 'empty' END AS bucket
        |FROM d LEFT JOIN sc ON d.doc_id = sc.doc_id, tot
        |ORDER BY d.doc_id""".stripMargin,

    "x01_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n_dups,
        |  MIN(doc_id) AS keeper
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin,

    "x02_dedup_minhash_lsh" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |th AS (SELECT doc_id, $TH AS th FROM toks),
         |perms(j, a, b) AS (VALUES $permsValues),
         |nb AS (SELECT CASE WHEN COUNT(*) <= 100000 THEN 4
         |         WHEN COUNT(*) <= 16777216 THEN 6 ELSE 8 END AS r,
         |       CASE WHEN COUNT(*) <= 100000 THEN 16
         |         WHEN COUNT(*) <= 16777216 THEN 48 ELSE 128 END AS nh
         |  FROM documents),
         |mh AS (SELECT doc_id, j, MIN((a*th + b) % $P) AS mh
         |  FROM th, perms, nb WHERE j < nb.nh GROUP BY doc_id, j),
         |sigs AS (SELECT doc_id, j // r AS band,
         |    string_agg(CAST(mh AS VARCHAR), '-' ORDER BY j) AS sig
         |  FROM mh, nb GROUP BY doc_id, band),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM sigs x JOIN sigs y
         |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
         |inter AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM cand JOIN toks ta ON ta.doc_id = d1
         |            JOIN toks tb ON tb.doc_id = d2 AND ta.tok = tb.tok
         |  GROUP BY d1, d2)
         |SELECT d1, d2, CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
         |WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= ${Extras.MinhashJaccardThreshold}
         |ORDER BY d1, d2""".stripMargin,

    "x03_dedup_simhash" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |th AS (SELECT doc_id, $TH AS th FROM toks),
         |bits AS (SELECT doc_id, bit, SUM(((th >> bit) & 1)*2 - 1) AS s
         |  FROM th, generate_series(0, 31) t(bit) GROUP BY doc_id, bit)
         |SELECT doc_id, CAST(SUM(CASE WHEN s > 0
         |    THEN (CAST(1 AS BIGINT) << CAST(bit AS INT)) ELSE 0 END) AS BIGINT)
         |  AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x04_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |sg AS (SELECT DISTINCT doc_id,
         |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tok
         |  FROM (SELECT doc_id, toks,
         |          unnest(generate_series(1, len(toks) - 2)) AS i FROM d)),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM sg a JOIN sg b ON a.tok = b.tok AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sg GROUP BY 1),
         |inter AS (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM cand JOIN sg ta ON ta.doc_id = d1
         |            JOIN sg tb ON tb.doc_id = d2 AND ta.tok = tb.tok
         |  GROUP BY d1, d2)
         |SELECT d1, d2, CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
         |WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= ${Extras.NgramJaccardThreshold}
         |ORDER BY d1, d2""".stripMargin,

    // Recursive CTE = the clustering ground truth: min label reachable
    // over the symmetrized star-edge union (UNION dedups, so the
    // fixpoint terminates). Mirrors x14's two signature relations.
    "x14_dedup_clusters" ->
      s"""$CcLab,
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |  FROM lab GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, s.cluster_size
         |FROM lab l JOIN sz s USING(cluster_id) ORDER BY doc_id""".stripMargin,

    // Same clustering fixpoint, with the split bucket computed on the
    // CLUSTER label so near-dup members always share a split.
    "x50_leak_safe_split" ->
      s"""$CcLab,
         |b AS (SELECT doc_id, cluster_id,
         |    CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))
         |      AS BIGINT) % 100 AS bucket
         |  FROM lab)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    // Same clustering fixpoint, resolved to the keep-min-id survivor
    // and rolled up to per-language corpus savings (mirrors x29).
    "x29_dedup_survivors" ->
      s"""$CcLab
         |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN d.doc_id = l.cluster_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(d.n_chars) AS BIGINT) AS chars_total,
         |  CAST(SUM(CASE WHEN d.doc_id = l.cluster_id THEN d.n_chars ELSE 0 END)
         |    AS BIGINT) AS chars_kept
         |FROM documents d JOIN lab l USING(doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // Mirrors x27: exact-decimal per-label centroids (q26 arithmetic),
    // nearest-centroid assignment with the (cos DESC, clabel) tie
    // order, confusion-matrix rollup.
    "x27_classify_centroid" ->
      s"""WITH cent AS (SELECT label AS clabel, i,
         |    CAST(CAST(SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR)
         |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS c
         |  FROM embeddings, generate_series(1, 64) t(i) GROUP BY label, i),
         |cn AS (SELECT clabel,
         |    CAST(CAST(SUM(CAST(CAST(c*c AS VARCHAR) AS DECIMAL(30,20)))
         |      AS VARCHAR) AS DOUBLE) AS cn
         |  FROM cent GROUP BY clabel),
         |n1 AS (SELECT vec_id, label, ${dot("embedding", "embedding")} AS n1
         |  FROM embeddings, generate_series(1, 64) t(i) GROUP BY vec_id, label),
         |dots AS (SELECT e.vec_id, c.clabel,
         |    CAST(CAST(SUM(CAST(CAST(CAST(e.embedding[c.i] AS DOUBLE)*c.c AS VARCHAR)
         |      AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS dot
         |  FROM embeddings e, cent c GROUP BY e.vec_id, c.clabel),
         |cos AS (SELECT n1.vec_id, n1.label, d.clabel,
         |    d.dot/(sqrt(n1.n1)*sqrt(cn.cn)) AS cos
         |  FROM dots d JOIN n1 ON n1.vec_id = d.vec_id
         |              JOIN cn ON cn.clabel = d.clabel),
         |assign AS (SELECT vec_id, label, clabel AS pred FROM (
         |    SELECT vec_id, label, clabel, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY COALESCE(cos, -2.0) DESC, clabel) AS rn
         |    FROM cos) WHERE rn = 1)
         |SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
         |FROM assign GROUP BY label, pred ORDER BY label, pred""".stripMargin,

    // Mirrors x28: probe-vs-index exact cosine, top-5 per probe
    // (cosine DESC, vec_id), majority vote (votes DESC, label).
    "x28_knn_vote" ->
      s"""WITH p AS (SELECT vec_id AS p_id, label AS true_label, embedding AS pe
         |  FROM embeddings WHERE vec_id < 10),
         |sc AS (SELECT e.vec_id, e.label, p.p_id, p.true_label,
         |    ${dot("e.embedding", "p.pe")} AS dot,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("p.pe", "p.pe")} AS n2
         |  FROM embeddings e, p, generate_series(1, 64) t(i)
         |  WHERE e.vec_id >= 10
         |  GROUP BY e.vec_id, e.label, p.p_id, p.true_label),
         |knn AS (SELECT p_id, true_label, label FROM (
         |    SELECT p_id, true_label, label, vec_id,
         |      row_number() OVER (PARTITION BY p_id
         |        ORDER BY dot/(sqrt(n1)*sqrt(n2)) DESC, vec_id) AS rk
         |    FROM sc) WHERE rk <= 5),
         |votes AS (SELECT p_id, true_label, label, CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM knn GROUP BY 1, 2, 3)
         |SELECT p_id, true_label, label AS pred_label, votes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY p_id
         |    ORDER BY votes DESC, label) AS rn FROM votes) WHERE rn = 1
         |ORDER BY p_id""".stripMargin,

    // Mirrors x30: the x08 score formula ranked per source, cap 3.
    "x30_source_caps" ->
      """WITH b AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('a', 'the', 'of', 'and'))) AS BIGINT) AS n_stop
        |  FROM documents),
        |sc AS (SELECT doc_id, source,
        |    0.4 * LEAST(n_toks / 100.0, 1.0)
        |      + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_toks)
        |      + 0.3 * LEAST(((CAST(len AS DOUBLE) - (n_toks - 1)) / n_toks) / 8.0, 1.0)
        |      AS score
        |  FROM b)
        |SELECT source, rk, doc_id, score FROM (
        |  SELECT source, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS BIGINT) AS rk
        |  FROM sc) WHERE rk <= 3
        |ORDER BY source, rk""".stripMargin,

    "x05_ann_brute" ->
      s"""WITH pr AS (SELECT e1.vec_id AS p_id, e2.vec_id AS vec_id,
         |    ${dot("e2.embedding", "e1.embedding")} AS dot,
         |    ${dot("e2.embedding", "e2.embedding")} AS n1,
         |    ${dot("e1.embedding", "e1.embedding")} AS n2
         |  FROM embeddings e1, embeddings e2, generate_series(1, 64) t(i)
         |  WHERE e1.vec_id < 10 AND e2.vec_id <> e1.vec_id
         |  GROUP BY e1.vec_id, e2.vec_id),
         |sc AS (SELECT p_id, vec_id, dot/(sqrt(n1)*sqrt(n2)) AS cosine FROM pr)
         |SELECT p_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY p_id
         |        ORDER BY cosine DESC, vec_id) AS rn FROM sc)
         |WHERE rn <= 3 ORDER BY p_id, rank""".stripMargin,

    "x06_ann_lsh" ->
      s"""WITH planes AS (SELECT vec_id AS j, (vec_id - 1) // 8 AS tbl,
         |    embedding AS pe FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |dots AS (SELECT e.vec_id, p.j, p.tbl, ${dot("e.embedding", "p.pe")} AS dot
         |  FROM embeddings e, planes p, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id, p.j, p.tbl),
         |buckets AS (SELECT vec_id, tbl, CAST(SUM(CASE WHEN dot > 0.0
         |    THEN (CAST(1 AS BIGINT) << CAST((j - 1) % 8 AS INT)) ELSE 0 END)
         |    AS BIGINT) AS bucket FROM dots GROUP BY vec_id, tbl),
         |pb AS (SELECT tbl, bucket FROM buckets WHERE vec_id = 0),
         |masks AS (SELECT CAST(0 AS BIGINT) AS mask
         |  UNION ALL SELECT (CAST(1 AS BIGINT) << j) FROM generate_series(0, 7) t(j)
         |  UNION ALL SELECT (CAST(1 AS BIGINT) << i) | (CAST(1 AS BIGINT) << j)
         |    FROM generate_series(0, 7) s(i), generate_series(0, 7) t(j)
         |    WHERE i < j),
         |pbuckets AS (SELECT DISTINCT pb.tbl, xor(pb.bucket, masks.mask) AS bucket
         |  FROM pb, masks),
         |cand AS (SELECT DISTINCT b.vec_id FROM buckets b JOIN pbuckets p
         |  ON b.tbl = p.tbl AND b.bucket = p.bucket WHERE b.vec_id <> 0),
         |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |cos AS (SELECT e.vec_id, ${dot("e.embedding", "probe.pe")} AS dot,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("probe.pe", "probe.pe")} AS n2
         |  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id)
         |SELECT vec_id, dot/(sqrt(n1)*sqrt(n2)) AS cosine
         |FROM cos ORDER BY cosine DESC, vec_id LIMIT 3""".stripMargin,

    "x13_ann_ivf" ->
      s"""WITH seeds AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 16),
         |sc AS (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS dot,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("s.c", "s.c")} AS cn
         |  FROM embeddings e, seeds s, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id, s.cid),
         |cos AS (SELECT vec_id, cid, dot/(sqrt(n1)*sqrt(cn)) AS cos FROM sc),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos DESC, cid) AS rn FROM cos) WHERE rn = 1),
         |pcells AS (SELECT cid AS cell FROM cos WHERE vec_id = 0
         |  ORDER BY cos DESC, cid LIMIT 2),
         |cand AS (SELECT a.vec_id FROM assign a JOIN pcells USING(cell)
         |  WHERE a.vec_id <> 0),
         |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |fin AS (SELECT e.vec_id, ${dot("e.embedding", "probe.pe")} AS dot,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("probe.pe", "probe.pe")} AS n2
         |  FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id)
         |SELECT vec_id, dot/(sqrt(n1)*sqrt(n2)) AS cosine FROM fin
         |ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,

    "x07_lang_id" ->
      """WITH sc AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the', 'a', 'of'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('el', 'la', 'los'))) AS BIGINT) AS s_es,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('der', 'die', 'das'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('le', 'les', 'une'))) AS BIGINT) AS s_fr,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('de5', 'shi4', 'le5'))) AS BIGINT) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
        |  CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr
        |         AND s_en >= s_zh THEN 'en'
        |       WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh
        |         THEN 'es'
        |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
        |       WHEN s_zh > 0 THEN 'zh'
        |       ELSE 'und' END AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin,

    "x08_quality_score" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  CAST(length(text) AS BIGINT) AS len,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('a', 'the', 'of', 'and'))) AS BIGINT) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_toks,
        |  (CAST(len AS DOUBLE) - (n_toks - 1)) / n_toks AS avg_tok_len,
        |  CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
        |  0.4 * LEAST(n_toks / 100.0, 1.0)
        |    + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_toks)
        |    + 0.3 * LEAST(((CAST(len AS DOUBLE) - (n_toks - 1)) / n_toks) / 8.0, 1.0)
        |    AS score
        |FROM b ORDER BY doc_id""".stripMargin,

    "x09_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |    AS re_tokens,
        |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x10_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pos AS (SELECT doc_id, i - 1 AS pos0, toks[i] AS tok
        |  FROM (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks))) AS i FROM d)),
        |term AS (SELECT doc_id,
        |  ((CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1000000)
        |    * (CASE (pos0 % 4) WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961
        |       ELSE 29791 END)) AS v
        |  FROM pos),
        |roll AS (SELECT doc_id, CAST(SUM(v) % 1000000007 AS BIGINT) AS rolling
        |  FROM term GROUP BY doc_id)
        |SELECT d.doc_id AS doc_id, md5(array_to_string(toks[1:8], ' ')) AS fp8, rolling
        |FROM d JOIN roll ON d.doc_id = roll.doc_id ORDER BY doc_id""".stripMargin,

    "x15_sample_uniform" ->
      s"""SELECT doc_id, lang, $Bucket AS bucket FROM documents
         |WHERE $Bucket < 10 ORDER BY doc_id""".stripMargin,

    "x15_sample_stratified" ->
      s"""SELECT doc_id, lang, $Bucket AS bucket FROM documents
         |WHERE $Bucket < (CASE WHEN lang = 'en' THEN 10 ELSE 40 END)
         |ORDER BY doc_id""".stripMargin,

    "x16_contamination" ->
      s"""WITH d AS (SELECT doc_id, $Bucket AS bucket,
         |    string_split(text, ' ') AS toks FROM documents),
         |shg AS (
         |  SELECT DISTINCT doc_id, bucket,
         |      md5(array_to_string(toks[i:i+7], ' ')) AS sh
         |    FROM (SELECT doc_id, bucket, toks,
         |            unnest(generate_series(1, len(toks) - 7)) AS i
         |          FROM d WHERE len(toks) >= 8)
         |  UNION
         |  SELECT doc_id, bucket, md5(array_to_string(toks, ' ')) AS sh
         |    FROM d WHERE len(toks) < 8),
         |tr AS (SELECT DISTINCT sh FROM shg WHERE bucket >= 10),
         |ev AS (SELECT doc_id, sh FROM shg WHERE bucket < 10),
         |hits AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit FROM ev
         |  WHERE sh IN (SELECT sh FROM tr) GROUP BY 1),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
         |  FROM ev GROUP BY 1)
         |SELECT t.doc_id, t.n_shingles, COALESCE(h.n_hit, 0) AS n_hit,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / t.n_shingles AS contamination
         |FROM tot t LEFT JOIN hits h USING(doc_id) ORDER BY doc_id""".stripMargin,

    "x17_vocab_topk" ->
      """WITH tk AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tk GROUP BY 1, 2),
        |st AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS lang_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS lang_vocab FROM c GROUP BY 1),
        |r AS (SELECT lang, tok, cnt, row_number() OVER (PARTITION BY lang
        |    ORDER BY cnt DESC, tok) AS rn FROM c)
        |SELECT r.lang, CAST(r.rn AS BIGINT) AS rank, r.tok, r.cnt,
        |  st.lang_tokens, st.lang_vocab
        |FROM r JOIN st USING(lang) WHERE r.rn <= 10
        |ORDER BY lang, rank""".stripMargin,

    // PQ twin: the 8-term chains are the same left-associated
    // expressions as the Spark side (identical IEEE doubles), ties by
    // cid, ADC sum decimal-routed — the top-20 cut matches exactly.
    "x25_ann_pq" -> {
      def sq(k: Int) =
        s"(CAST(a.embedding[8*cb.s+$k] AS DOUBLE) - CAST(cb.c[8*cb.s+$k] AS DOUBLE))" +
          s" * (CAST(a.embedding[8*cb.s+$k] AS DOUBLE) - CAST(cb.c[8*cb.s+$k] AS DOUBLE))"
      def pd(k: Int) =
        s"CAST(p.embedding[8*cb.s+$k] AS DOUBLE) * CAST(cb.c[8*cb.s+$k] AS DOUBLE)"
      s"""WITH sub AS (SELECT unnest(generate_series(0, 7)) AS s),
         |cb AS (SELECT e.vec_id AS cid, e.embedding AS c, sub.s
         |  FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 16),
         |d AS (SELECT a.vec_id, cb.s, cb.cid,
         |    ${(1 to 8).map(sq).mkString(" + ")} AS dist
         |  FROM embeddings a, cb WHERE a.vec_id <> 0),
         |assign AS (SELECT vec_id, s, cid FROM (SELECT *, row_number()
         |    OVER (PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
         |  FROM d) WHERE rn = 1),
         |adc AS (SELECT cb.cid, cb.s,
         |    ${(1 to 8).map(pd).mkString(" + ")} AS pd
         |  FROM cb JOIN embeddings p ON p.vec_id = 0),
         |ap AS (SELECT a.vec_id,
         |    CAST(CAST(SUM(CAST(CAST(pd AS VARCHAR) AS DECIMAL(28,10)))
         |      AS VARCHAR) AS DOUBLE) AS approx
         |  FROM assign a JOIN adc USING(cid, s) GROUP BY a.vec_id),
         |cand AS (SELECT vec_id, approx FROM (SELECT *, row_number()
         |    OVER (ORDER BY approx DESC, vec_id) AS rn FROM ap) WHERE rn <= 20),
         |rr AS (SELECT c.vec_id, c.approx,
         |    ${dot("e.embedding", "p.embedding")} AS dt,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("p.embedding", "p.embedding")} AS n2
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN embeddings p ON p.vec_id = 0, generate_series(1, 64) t(i)
         |  GROUP BY c.vec_id, c.approx)
         |SELECT vec_id, approx, dt/(sqrt(n1)*sqrt(n2)) AS cosine
         |FROM rr ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin
    },

    // Floor quantization and i64 dots are exactly reproducible; the
    // double approx score and the decimal re-rank reuse the
    // established parity routes, so even the top-20 candidate CUT
    // matches the Spark side.
    "x21_ann_sq" ->
      s"""WITH sc AS (SELECT vec_id, embedding AS v,
         |    (SELECT MAX(abs(CAST(x AS DOUBLE))) FROM unnest(embedding) u(x)) AS m
         |  FROM embeddings),
         |qq AS (SELECT vec_id, v,
         |    CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS qsc FROM sc),
         |-- COUNT(v[i]) = 64 guards null elements: SUM silently skips a
         |-- null product where Spark's int_dot nulls the whole dot; the
         |-- guard reproduces that null-poisoning
         |qn AS (SELECT a.vec_id,
         |    CASE WHEN COUNT(a.v[i]) = 64 THEN
         |      SUM(CAST(floor(CAST(a.v[i] AS DOUBLE) * a.qsc) AS BIGINT)
         |        * CAST(floor(CAST(a.v[i] AS DOUBLE) * a.qsc) AS BIGINT))
         |    END AS qn
         |  FROM qq a, generate_series(1, 64) t(i) GROUP BY a.vec_id),
         |qd AS (SELECT a.vec_id,
         |    CASE WHEN COUNT(a.v[i]) = 64 AND COUNT(p.v[i]) = 64 THEN
         |      SUM(CAST(floor(CAST(a.v[i] AS DOUBLE) * a.qsc) AS BIGINT)
         |        * CAST(floor(CAST(p.v[i] AS DOUBLE) * p.qsc) AS BIGINT))
         |    END AS qdot
         |  FROM qq a, qq p, generate_series(1, 64) t(i)
         |  WHERE p.vec_id = 0 AND a.vec_id <> 0 GROUP BY a.vec_id),
         |ap AS (SELECT qd.vec_id,
         |    CASE WHEN qn.qn > 0 AND pn.qn > 0
         |      THEN CAST(qd.qdot AS DOUBLE)
         |        / (sqrt(CAST(qn.qn AS DOUBLE)) * sqrt(CAST(pn.qn AS DOUBLE)))
         |      ELSE -2.0 END AS approx
         |  FROM qd JOIN qn ON qn.vec_id = qd.vec_id
         |  JOIN qn pn ON pn.vec_id = 0),
         |cand AS (SELECT vec_id, approx FROM (SELECT *, row_number()
         |    OVER (ORDER BY approx DESC, vec_id) AS rn FROM ap) WHERE rn <= 20),
         |rr AS (SELECT c.vec_id, c.approx,
         |    ${dot("e.embedding", "p.embedding")} AS d,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("p.embedding", "p.embedding")} AS n2
         |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN embeddings p ON p.vec_id = 0, generate_series(1, 64) t(i)
         |  GROUP BY c.vec_id, c.approx)
         |SELECT vec_id, approx, d/(sqrt(n1)*sqrt(n2)) AS cosine
         |FROM rr ORDER BY cosine DESC, vec_id LIMIT 5""".stripMargin,

    // Rational idf (log-free), decimal-routed tf*idf sum, and the
    // same RRF constant — every ranked double is bit-identical.
    "x24_hybrid_search" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |qt AS (SELECT DISTINCT tok FROM
         |    (SELECT unnest(toks) AS tok FROM d WHERE doc_id = 0)
         |  ORDER BY tok LIMIT 4),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
         |dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |lex AS (SELECT doc_id,
         |    CAST(CAST(SUM(CAST(CAST((CAST(tf AS DOUBLE)
         |        * ((n - df + 0.5) / (df + 0.5))) AS VARCHAR)
         |      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS score
         |  FROM tf JOIN qt USING(tok) JOIN dfreq USING(tok) CROSS JOIN tot
         |  WHERE doc_id <> 0 GROUP BY doc_id),
         |lexr AS (SELECT doc_id, CAST(rn AS BIGINT) AS lex_rank
         |  FROM (SELECT doc_id, row_number()
         |      OVER (ORDER BY score DESC, doc_id) AS rn FROM lex)
         |  WHERE rn <= 10),
         |pr AS (SELECT e.vec_id AS doc_id,
         |    ${dot("e.embedding", "p.embedding")} AS dt,
         |    ${dot("e.embedding", "e.embedding")} AS n1,
         |    ${dot("p.embedding", "p.embedding")} AS n2
         |  FROM embeddings e JOIN embeddings p ON p.vec_id = 0,
         |    generate_series(1, 64) t(i)
         |  WHERE e.vec_id <> 0 GROUP BY e.vec_id),
         |vecr AS (SELECT doc_id, CAST(rn AS BIGINT) AS vec_rank
         |  FROM (SELECT doc_id, row_number()
         |      OVER (ORDER BY dt/(sqrt(n1)*sqrt(n2)) DESC, doc_id) AS rn FROM pr)
         |  WHERE rn <= 10)
         |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         |  COALESCE(1.0/(60 + l.lex_rank), 0.0)
         |    + COALESCE(1.0/(60 + v.vec_rank), 0.0) AS rrf
         |FROM lexr l FULL OUTER JOIN vecr v ON v.doc_id = l.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    // Same rate arithmetic (doubles, floor to the 0-99 bucket grid)
    // and the same md5 bucket — the sample replays exactly.
    "x26_mixture" -> {
      val weightRows = Extras.MixtureWeights
        .map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |pl AS (SELECT lang, SUM(n_toks) AS lang_toks FROM d GROUP BY 1),
         |tot AS (SELECT SUM(lang_toks) AS total_toks FROM pl),
         |w(lang, w) AS (VALUES $weightRows),
         |rates AS (SELECT pl.lang,
         |    greatest(1.0, floor(least(1.0, 0.5 * CAST(total_toks AS DOUBLE) * w.w
         |      / CAST(lang_toks AS DOUBLE)) * 100.0)) AS keep_pct
         |  FROM pl JOIN w USING(lang) CROSS JOIN tot)
         |SELECT d.doc_id, d.lang, d.n_toks,
         |  CAST(r.keep_pct AS BIGINT) AS keep_pct
         |FROM d JOIN rates r USING(lang)
         |WHERE $Bucket < r.keep_pct
         |ORDER BY d.doc_id""".stripMargin
    },

    "x23_bpe_pairs" ->
      """WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |pr AS (SELECT toks[i] || ' ' || toks[i+1] AS pair
        |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM d WHERE len(toks) >= 2)),
        |c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pr GROUP BY 1)
        |SELECT CAST(rn AS BIGINT) AS rank, pair, cnt
        |FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, pair) AS rn FROM c)
        |WHERE rn <= 20 ORDER BY rank""".stripMargin,

    // Spark's exact `percentile` and DuckDB's `quantile_cont` share
    // the same definition (linear interpolation at p*(n-1)).
    "x22_length_quantiles" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // Spark computes 2-gram stats row-locally (transform over an index
    // sequence); the twin unnests — different shapes, same arithmetic.
    "x18_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_2g,
        |    CAST(COUNT(*) - COUNT(DISTINCT g) AS BIGINT) AS n_dup_2g
        |  FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |        FROM (SELECT doc_id, toks,
        |                unnest(generate_series(1, len(toks) - 1)) AS i FROM d))
        |  GROUP BY doc_id),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS n
        |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d) GROUP BY 1, 2),
        |ts AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks,
        |    CAST(MAX(n) AS BIGINT) AS top_tok_n FROM tc GROUP BY 1)
        |-- ts covers every doc (>=1 token always); bg only docs with >=2
        |-- tokens, so LEFT JOIN + COALESCE keeps short docs with n_2g=0,
        |-- matching Spark's otherwise(empty-array) branch
        |SELECT ts.doc_id, COALESCE(n_2g, 0) AS n_2g,
        |  COALESCE(n_dup_2g, 0) AS n_dup_2g, n_toks, top_tok_n,
        |  CASE WHEN COALESCE(n_2g, 0) > 0
        |       THEN CAST(n_dup_2g AS DOUBLE) / n_2g
        |       ELSE 0.0 END AS dup_2gram_ratio,
        |  CAST(top_tok_n AS DOUBLE) / n_toks AS top_tok_ratio,
        |  CAST((CASE WHEN COALESCE(n_2g, 0) > 0
        |             THEN CAST(n_dup_2g AS DOUBLE) / n_2g
        |             ELSE 0.0 END) > 0.2
        |    OR (CAST(top_tok_n AS DOUBLE) / n_toks) > 0.2 AS BIGINT)
        |  AS repetition_flag
        |FROM ts LEFT JOIN bg ON bg.doc_id = ts.doc_id ORDER BY ts.doc_id""".stripMargin,

    // Same construct + scrub chain as the Spark side; patterns are
    // shared via Sanitize's regex constants (lookaround-free so Java
    // regex and RE2 agree).
    "x19_pii_scrub" -> {
      import graft.functions.Sanitize._
      s"""WITH base AS (SELECT c_custkey,
         |    'user' || CAST(c_custkey AS VARCHAR) || '@example.com said call +1-555-'
         |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |    || ' or pay 4242 4242 4242 '
         |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |    || ' from 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.99 re '
         |    || c_mktsegment AS dirty
         |  FROM customer),
         |scr AS (SELECT c_custkey, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(dirty,
         |      '$EmailRe', '<EMAIL>', 'g'),
         |      '$CardRe', '<CARD>', 'g'),
         |      '$Ipv4Re', '<IP>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |  FROM base)
         |SELECT c_custkey, scrubbed,
         |  CAST(len(regexp_extract_all(scrubbed, '<EMAIL>')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(scrubbed, '<CARD>')) AS BIGINT) AS n_cards,
         |  CAST(len(regexp_extract_all(scrubbed, '<IP>')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(scrubbed, '<PHONE>')) AS BIGINT) AS n_phones
         |FROM scr ORDER BY c_custkey""".stripMargin
    },

    // The bloom filter is only a router; the exact answer is a plain
    // NOT IN on the fingerprint.
    "x20_bloom_dedup" ->
      s"""WITH d AS (SELECT doc_id, $Bucket AS b,
         |    md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS fp8
         |  FROM documents)
         |SELECT doc_id, fp8 FROM d
         |WHERE b < 50 AND fp8 NOT IN (SELECT fp8 FROM d WHERE b >= 50)
         |ORDER BY doc_id""".stripMargin,

    "x11_multimodal" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_hash,
        |  (CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 640) + 1 AS fake_width,
        |  (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 480) + 1 AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // x11's digest restricted to the fixture cap, with the parity-based
    // mime the file extensions encode.
    "x11b_binary_assets" -> binaryAssetSql,

    // x69 drains the SAME fixture through the binaryFile readStream:
    // the decode is stateless and per-file, so the completed stream
    // must equal the batch decode — the oracle is x11b's verbatim
    "x69_asset_stream" -> binaryAssetSql,

    // frame count = bytes // 40 + 1; stride = ceil(n/8). DuckDB's
    // generate_series takes constants only (no lateral column bounds),
    // but the sampled indices are exactly k·stride for k = 0..7 with
    // k·stride < n — the ≤-8-frames cap makes the constant 0..7 series
    // replay Scala's `0L until n by stride` index set precisely
    "x66_frame_sample" ->
      """WITH a AS (SELECT doc_id, md5(text) AS h,
        |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) // 40 + 1 AS n_frames
        |  FROM documents),
        |s AS (SELECT doc_id, h, n_frames, (n_frames + 7) // 8 AS stride FROM a)
        |SELECT s.doc_id, k.k * s.stride AS frame_idx,
        |  k.k * s.stride * 40 AS ts_ms,
        |  md5(s.h || ':' || CAST(k.k * s.stride AS VARCHAR)) AS frame_hash
        |FROM s JOIN generate_series(0, 7) k(k) ON k.k * s.stride < s.n_frames
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // audio stub replay: windows = ceil(bytes/100); the constant 0..63
    // series bounds clips to 6.4 KB — driver docs max ~600 bytes and
    // ScaleUp replicas preserve text length. The bound is ASSERTED in
    // the oracle itself (error() on any larger clip), so outgrowing it
    // fails with a named message instead of a mysterious silence
    // undercount (code-review r11)
    "x68_audio_features" ->
      """WITH a AS (SELECT doc_id, md5(text) AS h,
        |    CASE WHEN octet_length(CAST(text AS BLOB)) > 6400
        |      THEN error('x68 oracle window-series bound (64 windows = 6400 bytes) exceeded')
        |      ELSE CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) END AS n
        |  FROM documents),
        |w AS (SELECT a.doc_id,
        |    CAST(SUM(CASE WHEN (CAST(('0x' || substr(md5(a.h || ':w' ||
        |      CAST(k.k AS VARCHAR)), 1, 4)) AS BIGINT) % 100) < 10
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
        |  FROM a JOIN generate_series(0, 63) k(k)
        |    ON k.k < (a.n + 99) // 100
        |  GROUP BY a.doc_id)
        |SELECT a.doc_id, a.n AS n_samples, a.n * 1000 // 8000 AS duration_ms,
        |  (a.n + 3) // 4 AS n_rs,
        |  md5(a.h || ':rs:' || CAST((a.n + 3) // 4 AS VARCHAR)) AS rs_hash,
        |  (a.n + 99) // 100 AS n_windows, COALESCE(w.n_silent, 0) AS n_silent
        |FROM a LEFT JOIN w ON a.doc_id = w.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    // aspect-fit into 224×224 with floor division, floor >= 1 — the
    // exact integer arithmetic of Multimodal.resizeStub
    "x67_resize" ->
      """WITH f AS (SELECT doc_id, md5(text) AS h,
        |    (CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 640) + 1 AS fake_width,
        |    (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 480) + 1 AS fake_height
        |  FROM documents),
        |r AS (SELECT doc_id, h, fake_width, fake_height,
        |    GREATEST(CAST(1 AS BIGINT),
        |      fake_width * 224 // GREATEST(fake_width, fake_height)) AS out_w,
        |    GREATEST(CAST(1 AS BIGINT),
        |      fake_height * 224 // GREATEST(fake_width, fake_height)) AS out_h
        |  FROM f)
        |SELECT doc_id, fake_width, fake_height, out_w, out_h,
        |  md5(h || ':' || CAST(out_w AS VARCHAR) || 'x' ||
        |    CAST(out_h AS VARCHAR)) AS thumb_hash
        |FROM r ORDER BY doc_id""".stripMargin,

    // bits replays Extras.lshBitsFor integer-exactly: smallest b in
    // [8,24] with (1<<b)*16 >= count(*) — occupancy-constant buckets.
    // COALESCE mirrors the Scala getOrElse(24) fallback: above
    // 2^24*16 embeddings the filtered series is empty and a bare MIN
    // would yield NULL → zero planes → silent divergence (ADVICE r10).
    "x12_embed_neardup" ->
      s"""WITH bits AS (SELECT COALESCE(MIN(b), 24) AS b
         |  FROM generate_series(8, 24) t(b), (SELECT COUNT(*) AS n FROM embeddings)
         |  WHERE (CAST(1 AS BIGINT) << b) * 16 >= n),
         |planes AS (SELECT vec_id AS j, embedding AS pe FROM embeddings, bits
         |  WHERE vec_id BETWEEN 1 AND bits.b),
         |dots AS (SELECT e.vec_id, p.j, ${dot("e.embedding", "p.pe")} AS dot
         |  FROM embeddings e, planes p, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id, p.j),
         |buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dot > 0.0
         |    THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END) AS BIGINT)
         |  AS bucket FROM dots GROUP BY vec_id),
         |pairs AS (SELECT x.vec_id AS d1, y.vec_id AS d2 FROM buckets x
         |  JOIN buckets y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |cos AS (SELECT d1, d2, ${dot("e1.embedding", "e2.embedding")} AS dot,
         |    ${dot("e1.embedding", "e1.embedding")} AS n1,
         |    ${dot("e2.embedding", "e2.embedding")} AS n2
         |  FROM pairs JOIN embeddings e1 ON e1.vec_id = d1
         |             JOIN embeddings e2 ON e2.vec_id = d2,
         |    generate_series(1, 64) t(i)
         |  GROUP BY d1, d2)
         |SELECT d1, d2, dot/(sqrt(n1)*sqrt(n2)) AS cosine FROM cos
         |WHERE dot/(sqrt(n1)*sqrt(n2)) >= ${Extras.EmbedCosThreshold}
         |ORDER BY d1, d2""".stripMargin,

    // The clone starts as the source head (F∪O), its delete drops the
    // %5 keys, its compact is content-neutral; the source head is the
    // untouched F∪O. Decimal sum routes through VARCHAR (float parity
    // with Spark's double→decimal cast).
    "x63_shallow_clone" -> {
      val dig = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(CAST(SUM(CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_price, " +
        "MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key"
      s"""WITH d2 AS (SELECT * FROM orders WHERE o_orderstatus IN ('F','O')),
         |d3 AS (SELECT * FROM d2 WHERE o_orderkey % 5 <> 0),
         |dig AS (
         |  SELECT 'clone' AS side, CAST(1 AS BIGINT) AS version, $dig FROM d2
         |  UNION ALL SELECT 'clone', CAST(2 AS BIGINT), $dig FROM d3
         |  UNION ALL SELECT 'clone', CAST(3 AS BIGINT), $dig FROM d3
         |  UNION ALL SELECT 'source', CAST(2 AS BIGINT), $dig FROM d2)
         |SELECT side, version, n_rows, total_price, min_key, max_key
         |FROM dig ORDER BY side, version""".stripMargin
    },

    "x61_kmeans_embed" ->
      s"""$KmeansA2
         |SELECT vec_id, cell, cos FROM a2 ORDER BY vec_id""".stripMargin,

    "x62_semantic_dedup" ->
      s"""$KmeansA2,
         |pd AS (SELECT x.vec_id AS v1, y.vec_id AS v2, x.cell,
         |    ${dot("ex.embedding", "ey.embedding")} AS dot
         |  FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |    JOIN embeddings ex ON ex.vec_id = x.vec_id
         |    JOIN embeddings ey ON ey.vec_id = y.vec_id,
         |    generate_series(1, 64) t(i)
         |  GROUP BY x.vec_id, y.vec_id, x.cell),
         |dropped AS (SELECT DISTINCT pd.v2 AS vec_id FROM pd
         |  JOIN n1 nx ON nx.vec_id = pd.v1
         |  JOIN n1 ny ON ny.vec_id = pd.v2
         |  WHERE pd.dot/(sqrt(nx.n1)*sqrt(ny.n1))
         |    >= ${Extras.SemanticDupCosThreshold})
         |SELECT a2.vec_id, a2.cell,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM a2 LEFT JOIN dropped d ON d.vec_id = a2.vec_id
         |ORDER BY a2.vec_id""".stripMargin,

    // Recomputes x64's two tables relationally per version: the
    // committed multi-table txn completes both (v2 = full table), the
    // aborted txn contributes nothing anywhere (orders v3 ≡ v2; the
    // customer side never even prepares), customer's v3 is the
    // metadata-only constraint commit and v4 the post-abort append of
    // custkey 1. Decimal sums route through VARCHAR (float parity).
    "x64_multi_txn" -> {
      def dig(amt: String, key: String) = "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(CAST(SUM(CAST(CAST($amt AS VARCHAR) AS DECIMAL(28,10)))" +
        " AS VARCHAR) AS DOUBLE) AS total_amt, " +
        s"MIN($key) AS min_key, MAX($key) AS max_key"
      val od = dig("o_totalprice", "o_orderkey")
      val cd = dig("c_acctbal", "c_custkey")
      s"""WITH c4 AS (SELECT * FROM customer
         |    UNION ALL SELECT * FROM customer WHERE c_custkey = 1),
         |dig AS (
         |  SELECT 'orders' AS tbl, CAST(1 AS BIGINT) AS version, $od
         |    FROM orders WHERE o_orderkey % 2 = 0
         |  UNION ALL SELECT 'orders', CAST(2 AS BIGINT), $od FROM orders
         |  UNION ALL SELECT 'orders', CAST(3 AS BIGINT), $od FROM orders
         |  UNION ALL SELECT 'customer', CAST(1 AS BIGINT), $cd
         |    FROM customer WHERE c_custkey % 2 = 0
         |  UNION ALL SELECT 'customer', CAST(2 AS BIGINT), $cd FROM customer
         |  UNION ALL SELECT 'customer', CAST(3 AS BIGINT), $cd FROM customer
         |  UNION ALL SELECT 'customer', CAST(4 AS BIGINT), $cd FROM c4)
         |SELECT tbl, version, n_rows, total_amt, min_key, max_key
         |FROM dig ORDER BY tbl, version""".stripMargin
    },

    // x65: persistent IVF index probe — assignment (argmax inner
    // product over the 16 seed centroids, tie -> smaller cid, probe
    // vector 0 excluded from the layout), probe's top-2 cells, then
    // inner-product top-5 within them. Mirrors AnnIndex.build/probe
    // exactly: every dot is the decimal-exact macro.
    "x65_ann_index" -> annProbeSql,

    // x65b: build-minus-batch followed by append produces the identical
    // unioned cell layout (same assignment rule, same centroids), so
    // the post-append probe must hash-match the same oracle — any
    // dropped, duplicated, or mis-assigned appended vector diverges
    "x65b_ann_append" -> annProbeSql,

    // x70: the refresh batch arrives as a stream of micro-batches
    // through the ledgered foreachBatch append — batching is
    // layout-irrelevant (x65b's argument), so the drained index probes
    // identically to the batch-built one: the SAME oracle again
    "x70_ann_index_stream" -> annProbeSql,

    // x82: covering two-level descent ≡ the flat ranking bit-for-bit —
    // the oracle IS x65's SQL (the candidate cell set is complete and
    // the tie rules are shared, so only the plan differs), plus the
    // routed flag the Spark side captures from the router
    "x82_ann_twolevel" ->
      s"""SELECT p_id, rank, vec_id, score, TRUE AS routed
         |FROM ($annProbeSql) ORDER BY p_id, rank""".stripMargin,

    // x83: the narrow descent (nsuper = 1) replayed relationally —
    // super-seeds are the 4 smallest cell ids, membership is the
    // exact-decimal dot argmax (tie → smaller sid), the super-centroid
    // is the per-dim DECIMAL(30,12) sum of member centroids
    // (un-normalized: cosine/dot ranking is what level 1 does and the
    // Spark side ranks the sum vector), the probe's super is the top-1
    // by the decimal double-array dot (the l1/l2 cast chain), and
    // x65's cell ranking + top-k run over ONLY that super's cells
    "x83_ann_twolevel_narrow" ->
      s"""WITH seeds AS MATERIALIZED (SELECT vec_id AS cid, embedding AS c
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |sc AS MATERIALIZED (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS d
         |  FROM embeddings e, seeds s, generate_series(1, 64) t(i)
         |  WHERE e.vec_id <> 0
         |  GROUP BY e.vec_id, s.cid),
         |assign AS MATERIALIZED (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d DESC, cid) AS rn FROM sc) WHERE rn = 1),
         |supseeds AS MATERIALIZED (SELECT vec_id AS sid, embedding AS sv
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
         |ssc AS MATERIALIZED (SELECT c.cid, s2.sid, ${dot("c.c", "s2.sv")} AS d
         |  FROM seeds c, supseeds s2, generate_series(1, 64) t(i)
         |  GROUP BY c.cid, s2.sid),
         |sof AS MATERIALIZED (SELECT cid, sid FROM (
         |    SELECT cid, sid, row_number() OVER (PARTITION BY cid
         |      ORDER BY d DESC, sid) AS rn FROM ssc) WHERE rn = 1),
         |supc AS MATERIALIZED (SELECT sof.sid, i,
         |    CAST(CAST(SUM(CAST(CAST(CAST(c.c[i] AS DOUBLE) AS VARCHAR)
         |      AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS cc
         |  FROM seeds c JOIN sof ON sof.cid = c.cid,
         |    generate_series(1, 64) t(i)
         |  GROUP BY sof.sid, i),
         |probe AS MATERIALIZED (SELECT embedding AS pe FROM embeddings
         |  WHERE vec_id = 0),
         |psup AS MATERIALIZED (SELECT m.sid,
         |    CAST(CAST(SUM(CAST(CAST(CAST(probe.pe[m.i] AS DOUBLE) * m.cc
         |      AS VARCHAR) AS DECIMAL(30,20))) AS VARCHAR) AS DOUBLE) AS d
         |  FROM supc m, probe GROUP BY m.sid),
         |chosen AS MATERIALIZED (SELECT sid FROM psup ORDER BY d DESC, sid LIMIT 1),
         |psc AS MATERIALIZED (SELECT s.cid, ${dot("p.embedding", "s.c")} AS d
         |  FROM embeddings p, seeds s JOIN sof ON sof.cid = s.cid
         |    JOIN chosen ON chosen.sid = sof.sid,
         |    generate_series(1, 64) t(i)
         |  WHERE p.vec_id = 0 GROUP BY s.cid),
         |pcells AS MATERIALIZED (SELECT cid AS cell FROM psc
         |  ORDER BY d DESC, cid LIMIT 2),
         |fin AS MATERIALIZED (SELECT e.vec_id,
         |    ${dot("e.embedding", "probe.pe")} AS score
         |  FROM embeddings e
         |    JOIN assign a ON e.vec_id = a.vec_id
         |    JOIN pcells ON a.cell = pcells.cell,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id)
         |SELECT CAST(0 AS BIGINT) AS p_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, score, TRUE AS routed
         |FROM (SELECT * FROM fin ORDER BY score DESC, vec_id LIMIT 5)
         |ORDER BY p_id, rank""".stripMargin,

    // x71: the signature-store lifecycle replayed declaratively. The
    // scheme derives from the EVEN-id (history) count — the store pins
    // it at build. Round 1: batch (id ≡ 1 mod 4) vs history ∪
    // earlier-in-batch; round 2: batch (≡ 3) vs history ∪ round-1
    // KEEPERS ∪ earlier-in-batch — dropped round-1 docs never entered
    // the store, the semantics the Spark side's materialize-then-append
    // ordering enforces. Verify is exact set Jaccard on band-collision
    // candidates, x02's machinery verbatim.
    "x71_incremental_minhash" -> incrementalMinhashSql,

    // x75: the SAME lifecycle driven through Structured Streaming —
    // batching is semantics-irrelevant (each micro-batch probes
    // history ∪ earlier kept batches, exactly the x71 rule), so the
    // drained stream's verdicts replay against the identical SQL
    "x75_stream_dedup" -> incrementalMinhashSql,

    // x78: the verdict-only short-circuit mode — keep/drop must equal
    // the census lifecycle's decisions exactly, so the oracle is x71's
    // SQL projected to the keep column (the census statistics are the
    // only thing the mode drops)
    "x78_dedup_verdicts" ->
      s"""SELECT doc_id, batch, keep FROM ($incrementalMinhashSql)
         |ORDER BY doc_id""".stripMargin,

    // x79: cross-run incremental SEMANTIC dedup — replay the x65 IVF
    // rules exactly (argmax cell assignment, top-2 probe cells, both
    // by exact decimal dot with smaller-cid ties), then the
    // thresholded cosine census per batch against history (batch 1)
    // and history ∪ batch-1 keepers (batch 2: the append assigns by
    // the same argmax rule, so one shared `assign` serves both runs).
    // Dropped batch-1 vectors never enter the index. Zero-norm guard
    // on both sides mirrors the operator (no cosine, never a match).
    "x79_semdedup_incremental" -> semdedupIncrementalSql,

    // x80: the SAME lifecycle driven through Structured Streaming —
    // batching is semantics-irrelevant (each micro-batch probes
    // history ∪ earlier kept batches, exactly the x79 rule), so the
    // drained stream's verdicts replay against the identical SQL
    "x80_semdedup_stream" -> semdedupIncrementalSql,

    // x81: the verdict-only mode — keep/drop must equal the census
    // lifecycle exactly (the x78 rule applied to embeddings), so the
    // oracle is x79's SQL projected to the keep column
    "x81_semdedup_verdicts" ->
      s"""SELECT vec_id, batch, keep FROM ($semdedupIncrementalSql)
         |ORDER BY vec_id""".stripMargin,

    // x77: snapshot drift — per-(label, half, dim) decimal sums, the
    // cross-multiplied per-dim comparison (exact, division-free), the
    // per-label rollup and top-drifting dimension
    "x77_embedding_drift" ->
      """WITH per AS (SELECT label, (vec_id % 2 = 0) AS old, i AS pos,
        |    SUM(CAST(CAST(CAST(embedding[i] AS DOUBLE) AS VARCHAR)
        |      AS DECIMAL(30,12))) AS sv,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM embeddings, generate_series(1, 64) t(i)
        |  GROUP BY 1, 2, 3),
        |d AS (SELECT a.label, a.pos, abs(a.sv * b.n - b.sv * a.n) AS dd,
        |    a.n AS na, b.n AS nb
        |  FROM per a JOIN per b ON a.label = b.label AND a.pos = b.pos
        |    AND a.old AND NOT b.old),
        |top AS (SELECT label, CAST(pos AS BIGINT) AS top_dim, dd AS tdd,
        |    na, nb FROM (
        |    SELECT label, pos, dd, na, nb, row_number() OVER (
        |      PARTITION BY label ORDER BY dd DESC, pos) AS rn FROM d)
        |  WHERE rn = 1)
        |SELECT d.label AS label,
        |  CAST(MAX(d.na) AS BIGINT) AS n_old,
        |  CAST(MAX(d.nb) AS BIGINT) AS n_new,
        |  round(CAST(CAST(SUM(d.dd) AS VARCHAR) AS DOUBLE)
        |    / (MAX(d.na) * MAX(d.nb)), 6) AS drift,
        |  MAX(t.top_dim) AS top_dim,
        |  round(CAST(CAST(MAX(t.tdd) AS VARCHAR) AS DOUBLE)
        |    / (MAX(d.na) * MAX(d.nb)), 6) AS top_drift
        |FROM d JOIN top t ON d.label = t.label
        |GROUP BY 1 ORDER BY label""".stripMargin,

    // x76: both arms replayed exactly — assignment/probe-cell argmax
    // with the (score DESC, id ASC) tie rule, exhaustive truth top-3,
    // cell-pruned top-3 per nprobe, recall + scanned count per row
    "x76_ann_recall" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS c
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |corpus AS (SELECT vec_id, embedding AS v FROM embeddings
         |  WHERE vec_id >= 10),
         |probes AS (SELECT vec_id AS p_id, embedding AS p FROM embeddings
         |  WHERE vec_id < 10),
         |ad AS (SELECT corpus.vec_id, cents.cid, ${dot("corpus.v", "cents.c")} AS d
         |  FROM corpus, cents, generate_series(1, 64) t(i)
         |  GROUP BY corpus.vec_id, cents.cid),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d DESC, cid) AS rn FROM ad) WHERE rn = 1),
         |pd AS (SELECT p_id, cid, ${dot("probes.p", "cents.c")} AS d
         |  FROM probes, cents, generate_series(1, 64) t(i)
         |  GROUP BY p_id, cid),
         |pcells AS (SELECT p_id, cid AS cell, pcrank FROM (
         |    SELECT p_id, cid, row_number() OVER (PARTITION BY p_id
         |      ORDER BY d DESC, cid) AS pcrank FROM pd) WHERE pcrank <= 4),
         |sc AS (SELECT p_id, corpus.vec_id, ${dot("corpus.v", "probes.p")} AS score
         |  FROM corpus, probes, generate_series(1, 64) t(i)
         |  GROUP BY p_id, corpus.vec_id),
         |truth AS (SELECT p_id, vec_id FROM (
         |    SELECT p_id, vec_id, row_number() OVER (PARTITION BY p_id
         |      ORDER BY score DESC, vec_id) AS rk FROM sc) WHERE rk <= 3),
         |np(nprobe) AS (VALUES (1), (2), (4)),
         |cand AS (SELECT sc.p_id, sc.vec_id, sc.score, np.nprobe
         |  FROM sc JOIN assign a ON sc.vec_id = a.vec_id
         |    JOIN pcells pc ON sc.p_id = pc.p_id AND a.cell = pc.cell, np
         |  WHERE pc.pcrank <= np.nprobe),
         |scanned AS (SELECT p_id, nprobe, CAST(COUNT(*) AS BIGINT) AS n_scanned
         |  FROM cand GROUP BY 1, 2),
         |ivf3 AS (SELECT p_id, nprobe, vec_id FROM (
         |    SELECT p_id, nprobe, vec_id, row_number() OVER (
         |      PARTITION BY p_id, nprobe ORDER BY score DESC, vec_id) AS rk
         |    FROM cand) WHERE rk <= 3),
         |hits AS (SELECT i.p_id, i.nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM ivf3 i JOIN truth t ON i.p_id = t.p_id AND i.vec_id = t.vec_id
         |  GROUP BY 1, 2)
         |SELECT b.p_id, CAST(b.nprobe AS BIGINT) AS nprobe,
         |  CAST(coalesce(s.n_scanned, 0) AS BIGINT) AS n_scanned,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  round(coalesce(h.n_hits, 0) / 3.0, 6) AS recall
         |FROM (SELECT p_id, nprobe FROM probes, np) b
         |LEFT JOIN scanned s ON b.p_id = s.p_id AND b.nprobe = s.nprobe
         |LEFT JOIN hits h ON b.p_id = h.p_id AND b.nprobe = h.nprobe
         |ORDER BY b.p_id, b.nprobe""".stripMargin,


    // x72: the x60 training chain replayed (same CTE algebra) up to the
    // fully merged corpus d3, then per-doc before/after stats plus the
    // x10-idiom fingerprint of the first 8 ENCODED tokens
    "x72_bpe_encode" -> {
      def cnts(i: Int, src: String) =
        s"c$i AS (SELECT concat_ws(' ', toks[j], toks[j+1]) AS pair, " +
        "CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS j " +
        s"FROM (SELECT string_split(text, ' ') AS toks FROM $src) " +
        "WHERE len(toks) >= 2) GROUP BY 1)"
      def pick(i: Int) =
        s"p$i AS (SELECT pair, n FROM c$i ORDER BY n DESC, pair LIMIT 1)"
      def merge(i: Int, src: String) =
        s"d$i AS (SELECT doc_id, trim(replace(replace(" +
        "' ' || array_to_string(string_split(text, ' '), '  ') || ' ', " +
        s"' ' || split_part((SELECT pair FROM p$i), ' ', 1) || '  ' || " +
        s"split_part((SELECT pair FROM p$i), ' ', 2) || ' ', " +
        s"' ' || split_part((SELECT pair FROM p$i), ' ', 1) || '_' || " +
        s"split_part((SELECT pair FROM p$i), ' ', 2) || ' '), " +
        s"'  ', ' ')) AS text FROM $src)"
      "WITH d0 AS (SELECT doc_id, text FROM documents), " +
        (1 to 3).map(i =>
          Seq(cnts(i, s"d${i - 1}"), pick(i), merge(i, s"d${i - 1}"))
            .mkString(", ")).mkString(", ") +
        """ SELECT a.doc_id AS doc_id,
          |  CAST(len(string_split(a.text, ' ')) AS BIGINT) AS n_before,
          |  CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_after,
          |  CAST(len(string_split(a.text, ' '))
          |    - len(string_split(b.text, ' ')) AS BIGINT) AS n_merged,
          |  md5(array_to_string((string_split(b.text, ' '))[1:8], ' '))
          |    AS enc_fp
          |FROM d0 a JOIN d3 b ON a.doc_id = b.doc_id
          |ORDER BY doc_id""".stripMargin
    },

    // x73: the deterministic-shuffle prefix sum is declarative in
    // DuckDB (one ordered window); the Spark side's bucketed two-phase
    // sum must produce the identical cumulative offsets
    "x73_shard_pack" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         |    md5(CAST(doc_id AS VARCHAR)) AS sk FROM documents),
         |c AS (SELECT doc_id, n_toks,
         |    CAST(SUM(n_toks) OVER (ORDER BY sk, doc_id) AS BIGINT) AS cum
         |  FROM d)
         |SELECT doc_id, n_toks,
         |  CAST((cum - n_toks) // ${Extras.ShardBudget} AS BIGINT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin,

    // x74: train on even ids (bucket×lang counts → integer posterior
    // weights), score everything, argmax with the shared (score DESC,
    // lang ASC) tie rule — all-BIGINT arithmetic so the trained model
    // replays exactly
    "x74_lang_classifier" ->
      s"""WITH tok AS (SELECT doc_id, lang,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |tb AS (SELECT doc_id, lang, ($TH) % ${Extras.LangBuckets} AS b
         |  FROM tok),
         |tr AS (SELECT b, lang, CAST(COUNT(*) AS BIGINT) AS cbl
         |  FROM tb WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         |tot AS (SELECT b, CAST(SUM(cbl) AS BIGINT) AS cb FROM tr GROUP BY 1),
         |w AS (SELECT tr.b, tr.lang AS plang,
         |    CAST(cbl * 1000000 // cb AS BIGINT) AS w
         |  FROM tr JOIN tot ON tr.b = tot.b),
         |dc AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tb GROUP BY 1, 2),
         |sc AS (SELECT doc_id, plang, CAST(SUM(n * w) AS BIGINT) AS score
         |  FROM dc JOIN w ON dc.b = w.b GROUP BY 1, 2),
         |pick AS (SELECT doc_id, plang FROM (
         |    SELECT doc_id, plang, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, plang ASC) AS rn FROM sc) WHERE rn = 1)
         |SELECT d.doc_id, d.lang, coalesce(p.plang, 'und') AS pred_lang,
         |  d.doc_id % 2 = 0 AS is_train,
         |  coalesce(p.plang, '') = d.lang AS correct
         |FROM documents d LEFT JOIN pick p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // x65c: the full maintenance lifecycle — assignment over the 16
    // seeds, mean-occupancy threshold (⌊n/16⌋), each hot cell split
    // K-WAY in one pass by the r16 scheme (see annMaintCtes: two-
    // anchor seeds, pinned Voronoi, two unrolled Lloyd sweeps,
    // vec_id rank-slice overflow, normalized decimal-mean refreshed
    // centroids). Probe over the REFRESHED centroid set, plus the
    // layout digest (n_cells / max_occ / n_rows) on every row.
    // Mirrors AnnIndex.optimize exactly: every dot decimal-exact,
    // every Lloyd arithmetic step IEEE-double-deterministic, every
    // tie broken on (score, id).
    "x65c_ann_optimize" ->
      s"""WITH ${annMaintCtes("<> 0")},
         |psc AS (SELECT nc.cid, ${dot("p.embedding", "nc.c")} AS d
         |  FROM embeddings p, newcents nc, generate_series(1, 64) t(i)
         |  WHERE p.vec_id = 0 GROUP BY nc.cid),
         |pcells AS (SELECT cid AS cell FROM psc ORDER BY d DESC, cid LIMIT 2),
         |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |fin AS (SELECT e.vec_id, ${dot("e.embedding", "probe.pe")} AS score
         |  FROM embeddings e
         |    JOIN na ON na.vec_id = e.vec_id
         |    JOIN pcells ON na.cell = pcells.cell,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id),
         |digest AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         |    CAST(MAX(n) AS BIGINT) AS max_occ, CAST(SUM(n) AS BIGINT) AS n_rows
         |  FROM (SELECT cell, COUNT(*) AS n FROM na GROUP BY cell))
         |SELECT CAST(0 AS BIGINT) AS p_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, score, n_cells, max_occ, n_rows
         |FROM (SELECT * FROM fin ORDER BY score DESC, vec_id LIMIT 5), digest
         |ORDER BY p_id, rank""".stripMargin,

    // x65d: x65c's lifecycle under the PRODUCTION-DEFAULT
    // optimizeIfOutgrown — identical replay with the one honest
    // delta: thr = ⌈√n⌉ (the recounted-index occupancy policy)
    // instead of the fixed ⌊n/16⌋ cap. Same probe + digest tail.
    "x65d_ann_policy" ->
      s"""WITH ${annMaintCtes("<> 0",
             "CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)")},
         |psc AS (SELECT nc.cid, ${dot("p.embedding", "nc.c")} AS d
         |  FROM embeddings p, newcents nc, generate_series(1, 64) t(i)
         |  WHERE p.vec_id = 0 GROUP BY nc.cid),
         |pcells AS (SELECT cid AS cell FROM psc ORDER BY d DESC, cid LIMIT 2),
         |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |fin AS (SELECT e.vec_id, ${dot("e.embedding", "probe.pe")} AS score
         |  FROM embeddings e
         |    JOIN na ON na.vec_id = e.vec_id
         |    JOIN pcells ON na.cell = pcells.cell,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id),
         |digest AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         |    CAST(MAX(n) AS BIGINT) AS max_occ, CAST(SUM(n) AS BIGINT) AS n_rows
         |  FROM (SELECT cell, COUNT(*) AS n FROM na GROUP BY cell))
         |SELECT CAST(0 AS BIGINT) AS p_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, score, n_cells, max_occ, n_rows
         |FROM (SELECT * FROM fin ORDER BY score DESC, vec_id LIMIT 5), digest
         |ORDER BY p_id, rank""".stripMargin,

    // x76b: x76's recall/cost audit replayed across the x65c
    // maintenance chain — `assign`/`cents` are the PRE-optimize
    // layout, `na`/`newcents` the POST one; both phases share the
    // exhaustive decimal truth, so the output hash-pins the recall
    // delta one optimize pass causes at each nprobe
    "x76b_ann_recall_maintained" ->
      s"""WITH ${annMaintCtes(">= 10")},
         |scq AS (SELECT p.vec_id AS p_id, c.vec_id,
         |    ${dot("c.embedding", "p.embedding")} AS score
         |  FROM embeddings c, embeddings p, generate_series(1, 64) t(i)
         |  WHERE c.vec_id >= 10 AND p.vec_id < 10
         |  GROUP BY p.vec_id, c.vec_id),
         |truth AS (SELECT p_id, vec_id FROM (
         |    SELECT p_id, vec_id, row_number() OVER (PARTITION BY p_id
         |      ORDER BY score DESC, vec_id) AS rk FROM scq) WHERE rk <= 3),
         |pd0 AS (SELECT p.vec_id AS p_id, s.cid,
         |    ${dot("p.embedding", "s.c")} AS d
         |  FROM embeddings p, cents s, generate_series(1, 64) t(i)
         |  WHERE p.vec_id < 10 GROUP BY p.vec_id, s.cid),
         |pc0 AS (SELECT p_id, cid AS cell, pcrank FROM (
         |    SELECT p_id, cid, row_number() OVER (PARTITION BY p_id
         |      ORDER BY d DESC, cid) AS pcrank FROM pd0) WHERE pcrank <= 4),
         |pd1 AS (SELECT p.vec_id AS p_id, nc.cid,
         |    ${dot("p.embedding", "nc.c")} AS d
         |  FROM embeddings p, newcents nc, generate_series(1, 64) t(i)
         |  WHERE p.vec_id < 10 GROUP BY p.vec_id, nc.cid),
         |pc1 AS (SELECT p_id, cid AS cell, pcrank FROM (
         |    SELECT p_id, cid, row_number() OVER (PARTITION BY p_id
         |      ORDER BY d DESC, cid) AS pcrank FROM pd1) WHERE pcrank <= 4),
         |np(nprobe) AS (VALUES (1), (2), (4)),
         |cand AS (
         |  SELECT 'pre' AS phase, s.p_id, s.vec_id, s.score, np.nprobe
         |    FROM scq s JOIN assign a ON s.vec_id = a.vec_id
         |      JOIN pc0 pc ON s.p_id = pc.p_id AND a.cell = pc.cell, np
         |    WHERE pc.pcrank <= np.nprobe
         |  UNION ALL
         |  SELECT 'post' AS phase, s.p_id, s.vec_id, s.score, np.nprobe
         |    FROM scq s JOIN na a ON s.vec_id = a.vec_id
         |      JOIN pc1 pc ON s.p_id = pc.p_id AND a.cell = pc.cell, np
         |    WHERE pc.pcrank <= np.nprobe),
         |scanned AS (SELECT phase, p_id, nprobe,
         |    CAST(COUNT(*) AS BIGINT) AS n_scanned
         |  FROM cand GROUP BY 1, 2, 3),
         |ivf3 AS (SELECT phase, p_id, nprobe, vec_id FROM (
         |    SELECT phase, p_id, nprobe, vec_id, row_number() OVER (
         |      PARTITION BY phase, p_id, nprobe
         |      ORDER BY score DESC, vec_id) AS rk FROM cand) WHERE rk <= 3),
         |hits AS (SELECT i.phase, i.p_id, i.nprobe,
         |    CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM ivf3 i JOIN truth t ON i.p_id = t.p_id AND i.vec_id = t.vec_id
         |  GROUP BY 1, 2, 3)
         |SELECT b.p_id, b.phase, CAST(b.nprobe AS BIGINT) AS nprobe,
         |  CAST(coalesce(s.n_scanned, 0) AS BIGINT) AS n_scanned,
         |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  round(coalesce(h.n_hits, 0) / 3.0, 6) AS recall
         |FROM (SELECT p.vec_id AS p_id, ph.phase, np.nprobe
         |  FROM embeddings p, (VALUES ('pre'), ('post')) ph(phase), np
         |  WHERE p.vec_id < 10) b
         |LEFT JOIN scanned s ON b.p_id = s.p_id AND b.phase = s.phase
         |  AND b.nprobe = s.nprobe
         |LEFT JOIN hits h ON b.p_id = h.p_id AND b.phase = h.phase
         |  AND b.nprobe = h.nprobe
         |ORDER BY b.p_id, b.phase, b.nprobe""".stripMargin
  )

  /** Shared by x11b (batch binaryFile decode) and x69 (the same
    * fixture drained through the binaryFile readStream): the decode is
    * stateless and per-file, so both paths must produce this digest.
    */
  private lazy val binaryAssetSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'application/octet-stream'
      |       ELSE 'text/plain' END AS mime,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  md5(text) AS content_hash,
      |  (CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 640) + 1 AS fake_width,
      |  (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 480) + 1 AS fake_height
      |FROM documents WHERE doc_id <= 200 ORDER BY doc_id""".stripMargin

  /** The incremental near-dup lifecycle oracle shared by x71 (batch)
    * and x75 (streaming): scheme from the even-id history count, round
    * 1 probes history ∪ earlier-in-batch, round 2 additionally sees
    * round 1's keepers; verify is exact set Jaccard on band-collision
    * candidates, x02's machinery verbatim.
    */
  /** Shared by x79 (batch lifecycle) and x80 (streaming): the IVF
    * replay + two-batch thresholded cosine census, see the x79 map
    * entry's comment.
    */
  private lazy val semdedupIncrementalSql: String =
    s"""WITH seeds AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 16),
         |pool AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 17),
         |sc AS (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS d
         |  FROM pool e, seeds s, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id, s.cid),
         |ranked AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY d DESC, cid) AS rn FROM sc),
         |assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
         |pcells AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn <= 2),
         |norms AS (SELECT e.vec_id, ${dot("e.embedding", "e.embedding")} AS nn
         |  FROM pool e, generate_series(1, 64) t(i) GROUP BY e.vec_id),
         |hist AS (SELECT vec_id FROM pool WHERE vec_id % 2 = 0),
         |b1 AS (SELECT vec_id FROM pool WHERE vec_id % 4 = 1),
         |b2 AS (SELECT vec_id FROM pool WHERE vec_id % 4 = 3),
         |cos1 AS (SELECT b.vec_id AS d2, h.vec_id AS d1,
         |    ${dot("e2.embedding", "e1.embedding")} AS dt
         |  FROM b1 b JOIN pcells pc ON pc.vec_id = b.vec_id
         |    JOIN assign a ON a.cell = pc.cell
         |    JOIN hist h ON h.vec_id = a.vec_id
         |    JOIN pool e1 ON e1.vec_id = h.vec_id
         |    JOIN pool e2 ON e2.vec_id = b.vec_id,
         |    generate_series(1, 64) t(i)
         |  GROUP BY b.vec_id, h.vec_id),
         |m1 AS (SELECT c.d2 AS vec_id, CAST(COUNT(DISTINCT c.d1) AS BIGINT)
         |      AS n_dups, MAX(c.dt / (sqrt(n1.nn) * sqrt(n2.nn))) AS max_cos
         |  FROM cos1 c JOIN norms n1 ON n1.vec_id = c.d1
         |    JOIN norms n2 ON n2.vec_id = c.d2
         |  WHERE n1.nn > 0 AND n2.nn > 0
         |    AND c.dt / (sqrt(n1.nn) * sqrt(n2.nn)) >= ${Extras.EmbedCosThreshold}
         |  GROUP BY c.d2),
         |v1 AS (SELECT b.vec_id, m1.n_dups IS NULL AS keep,
         |    COALESCE(m1.n_dups, 0) AS n_dups,
         |    COALESCE(m1.max_cos, 0.0) AS max_cos
         |  FROM b1 b LEFT JOIN m1 ON m1.vec_id = b.vec_id),
         |store2 AS (SELECT vec_id FROM hist
         |  UNION ALL SELECT vec_id FROM v1 WHERE keep),
         |cos2 AS (SELECT b.vec_id AS d2, h.vec_id AS d1,
         |    ${dot("e2.embedding", "e1.embedding")} AS dt
         |  FROM b2 b JOIN pcells pc ON pc.vec_id = b.vec_id
         |    JOIN assign a ON a.cell = pc.cell
         |    JOIN store2 h ON h.vec_id = a.vec_id
         |    JOIN pool e1 ON e1.vec_id = h.vec_id
         |    JOIN pool e2 ON e2.vec_id = b.vec_id,
         |    generate_series(1, 64) t(i)
         |  GROUP BY b.vec_id, h.vec_id),
         |m2 AS (SELECT c.d2 AS vec_id, CAST(COUNT(DISTINCT c.d1) AS BIGINT)
         |      AS n_dups, MAX(c.dt / (sqrt(n1.nn) * sqrt(n2.nn))) AS max_cos
         |  FROM cos2 c JOIN norms n1 ON n1.vec_id = c.d1
         |    JOIN norms n2 ON n2.vec_id = c.d2
         |  WHERE n1.nn > 0 AND n2.nn > 0
         |    AND c.dt / (sqrt(n1.nn) * sqrt(n2.nn)) >= ${Extras.EmbedCosThreshold}
         |  GROUP BY c.d2),
         |v2 AS (SELECT b.vec_id, m2.n_dups IS NULL AS keep,
         |    COALESCE(m2.n_dups, 0) AS n_dups,
         |    COALESCE(m2.max_cos, 0.0) AS max_cos
         |  FROM b2 b LEFT JOIN m2 ON m2.vec_id = b.vec_id)
         |SELECT vec_id, 'b1' AS batch, keep, n_dups, max_cos FROM v1
         |UNION ALL
         |SELECT vec_id, 'b2' AS batch, keep, n_dups, max_cos FROM v2
         |ORDER BY vec_id""".stripMargin

  private lazy val incrementalMinhashSql: String =
    s"""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |th AS (SELECT doc_id, $TH AS th FROM toks),
         |perms(j, a, b) AS (VALUES $permsValues),
         |nb AS (SELECT CASE WHEN COUNT(*) <= 100000 THEN 4
         |         WHEN COUNT(*) <= 16777216 THEN 6 ELSE 8 END AS r,
         |       CASE WHEN COUNT(*) <= 100000 THEN 16
         |         WHEN COUNT(*) <= 16777216 THEN 48 ELSE 128 END AS nh
         |  FROM documents WHERE doc_id % 4 = 0),
         |mh AS (SELECT doc_id, j, MIN((a*th + b) % $P) AS mh
         |  FROM th, perms, nb WHERE j < nb.nh GROUP BY doc_id, j),
         |sigs AS (SELECT doc_id, j // r AS band,
         |    string_agg(CAST(mh AS VARCHAR), '-' ORDER BY j) AS sig
         |  FROM mh, nb GROUP BY doc_id, band),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY 1),
         |cand1 AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
         |  WHERE y.doc_id % 8 = 1
         |    AND (x.doc_id % 4 = 0 OR (x.doc_id % 8 = 1 AND x.doc_id < y.doc_id))),
         |m1 AS (SELECT d2 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |    MAX(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter)) AS mx
         |  FROM (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS inter
         |      FROM cand1 JOIN toks ta ON ta.doc_id = d1
         |                 JOIN toks tb ON tb.doc_id = d2 AND ta.tok = tb.tok
         |      GROUP BY d1, d2) i
         |    JOIN sz sa ON sa.doc_id = i.d1 JOIN sz sb ON sb.doc_id = i.d2
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= ${Extras.MinhashJaccardThreshold}
         |  GROUP BY d2),
         |kept1 AS (SELECT d.doc_id FROM documents d
         |  WHERE d.doc_id % 8 = 1 AND d.doc_id NOT IN (SELECT doc_id FROM m1)),
         |cand2 AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
         |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
         |  WHERE y.doc_id % 8 = 5
         |    AND (x.doc_id % 4 = 0
         |      OR x.doc_id IN (SELECT doc_id FROM kept1)
         |      OR (x.doc_id % 8 = 5 AND x.doc_id < y.doc_id))),
         |m2 AS (SELECT d2 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |    MAX(CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter)) AS mx
         |  FROM (SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS inter
         |      FROM cand2 JOIN toks ta ON ta.doc_id = d1
         |                 JOIN toks tb ON tb.doc_id = d2 AND ta.tok = tb.tok
         |      GROUP BY d1, d2) i
         |    JOIN sz sa ON sa.doc_id = i.d1 JOIN sz sb ON sb.doc_id = i.d2
         |  WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= ${Extras.MinhashJaccardThreshold}
         |  GROUP BY d2)
         |SELECT d.doc_id, 'b1' AS batch, m.doc_id IS NULL AS keep,
         |  coalesce(m.n_dups, 0) AS n_dups, coalesce(m.mx, 0.0) AS max_jaccard
         |FROM documents d LEFT JOIN m1 m ON d.doc_id = m.doc_id
         |WHERE d.doc_id % 8 = 1
         |UNION ALL
         |SELECT d.doc_id, 'b2' AS batch, m.doc_id IS NULL AS keep,
         |  coalesce(m.n_dups, 0) AS n_dups, coalesce(m.mx, 0.0) AS max_jaccard
         |FROM documents d LEFT JOIN m2 m ON d.doc_id = m.doc_id
         |WHERE d.doc_id % 8 = 5
         |ORDER BY doc_id""".stripMargin

  /** The IVF probe oracle shared by x65 (full build) and x65b
    * (build + incremental append of the same vector set).
    */
  private lazy val annProbeSql: String =
      s"""WITH seeds AS (SELECT vec_id AS cid, embedding AS c FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 16),
         |sc AS (SELECT e.vec_id, s.cid, ${dot("e.embedding", "s.c")} AS d
         |  FROM embeddings e, seeds s, generate_series(1, 64) t(i)
         |  WHERE e.vec_id <> 0
         |  GROUP BY e.vec_id, s.cid),
         |assign AS (SELECT vec_id, cid AS cell FROM (
         |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d DESC, cid) AS rn FROM sc) WHERE rn = 1),
         |psc AS (SELECT s.cid, ${dot("p.embedding", "s.c")} AS d
         |  FROM embeddings p, seeds s, generate_series(1, 64) t(i)
         |  WHERE p.vec_id = 0 GROUP BY s.cid),
         |pcells AS (SELECT cid AS cell FROM psc ORDER BY d DESC, cid LIMIT 2),
         |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         |fin AS (SELECT e.vec_id, ${dot("e.embedding", "probe.pe")} AS score
         |  FROM embeddings e
         |    JOIN assign a ON e.vec_id = a.vec_id
         |    JOIN pcells ON a.cell = pcells.cell,
         |    probe, generate_series(1, 64) t(i)
         |  GROUP BY e.vec_id)
         |SELECT CAST(0 AS BIGINT) AS p_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
         |  vec_id, score
         |FROM (SELECT * FROM fin ORDER BY score DESC, vec_id LIMIT 5)
         |ORDER BY p_id, rank""".stripMargin
}
