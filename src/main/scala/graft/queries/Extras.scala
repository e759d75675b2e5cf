package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Sanitize, TextFns, VectorFns}
import graft.operators.Multimodal
import Inventory.{t, cnt, dsum, events, F6}

/** LLM-training-data pipeline operators beyond the reference's own
  * surface (BASELINE.json north star): deduplication (exact, MinHash/
  * LSH, SimHash, n-gram Jaccard, embedding near-dup), similarity
  * search (brute-force + LSH-bucketed ANN), text analysis (language
  * ID, quality scoring, token counting, fingerprinting), and
  * multimodal binary-column plumbing.
  *
  * Design rule for 100 TB: **no all-pairs stage is ever a cross
  * join**. Candidate pairs only materialize through an index the
  * engine can shuffle on — shared token, MinHash band signature, or
  * LSH bucket — and the exact verification (Jaccard / cosine) runs on
  * candidates only. The brute-force forms (x05, Q26b) are probe-vs-all:
  * a broadcast probe against one scan, which scales linearly.
  *
  * All hashes are portable (md5-derived, [[TextFns.tokHash]]) so every
  * query here has an exact DuckDB oracle twin ([[ExtrasOracle]]).
  */
object Extras {

  /** MinHash permutations: (j, a, b) for h_j(x) = (a*x + b) mod P.
    * 128 are defined; [[minhashSchemeFor]] picks how many a corpus
    * uses (16 banded 4×4 at the gate scales → candidate recall
    * ~ 1-(1-J^4)^4).
    */
  val Perms: Seq[(Int, Long, Long)] =
    Seq.tabulate(128)(j => (j, 1000003L + 97L * j, 271L + 7919L * j))

  val MinhashJaccardThreshold = 0.7

  /** Corpus-scaled LSH scheme for x02: (total min-hashes, band count).
    * The published large-corpus recipe (ADVICE r11): GROW the hash
    * count with corpus size, keeping the S-curve threshold
    * (1/b)^(1/r) pinned at ~0.71 — the banding gets steeper (b and r
    * both rise), so moderate-J false-candidate volume (which grows
    * quadratically with duplication on dup-heavy corpora) collapses
    * while recall at the declared J=0.7 contract stays ≥ ~61% at
    * EVERY scale:
    *
    *   regime        b×r     threshold   recall@0.7   cand@0.3
    *   ≤ 100k docs   4×4     0.707       66.7%        3.2%
    *   ≤ 2^24        8×6     0.707       63.3%        0.58%
    *   beyond        16×8    0.707       61.3%        0.10%
    *
    * (r11's previous scheme shrank band count at FIXED 16 hashes —
    * 2×8 then 1×16 — which silently collapsed recall@0.7 to 39% then
    * 0.33%: the operator's contract changed with corpus size. The
    * regime steps are now smooth: 66.7 → 63.3 → 61.3%, and
    * MinhashBandScalingSpec pins the schedule analytically.)
    * The ≤100k regime is bit-unchanged from every earlier round, so
    * all driver correctness scales (sf0.01–sf1, ≤ 64k docs) keep
    * their hashes. Integer-exact so the DuckDB oracle derives the
    * same scheme from COUNT(documents).
    */
  def minhashSchemeFor(nDocs: Long): (Int, Int) =
    if (nDocs <= 100000L) (16, 4)
    else if (nDocs <= (1L << 24)) (48, 8)
    else (128, 16)

  /** Candidate pairs from a per-doc min-hash signature frame
    * (doc_id, mh0..mh{nHashes-1}) banded as `nBands` slices of
    * nHashes/nBands rows.
    * Lossless pack: each min-hash is in [0, P) with P < 2^30, so two
    * fit in one long (mh_a·P + mh_b) — band signatures are structs of
    * longs, and the candidate join hashes/compares longs, not
    * strings. The struct carries ALL band signatures so a pair
    * colliding in several bands is kept only at its FIRST colliding
    * band — an in-join filter replacing the full distinct() shuffle
    * of the duplicated candidate stream. Package-visible so the spec
    * can pin the generalized first-match logic for every scheme
    * against a brute-force reference.
    */
  private[graft] def minhashBandCandidates(sig: DataFrame,
      nHashes: Int, nBands: Int): DataFrame = {
    require(nHashes % nBands == 0 && (nHashes / nBands) % 2 == 0,
      s"nBands must divide $nHashes into even slices, got $nBands")
    val rowsPer = nHashes / nBands
    def bandStruct(b: Int) = struct((0 until rowsPer / 2).map { l =>
      (col(s"mh${rowsPer * b + 2 * l}") * lit(P) +
        col(s"mh${rowsPer * b + 2 * l + 1}")).as(s"w$l")
    }: _*).as(s"s$b")
    val sCols = (0 until nBands).map(b => col(s"s$b"))
    val withBands = sig.select(col("doc_id") +: (0 until nBands).map(bandStruct): _*)
    val bands = withBands.select((col("doc_id") +: sCols) :+
      posexplode(array(sCols: _*)).as(Seq("band", "sig")): _*)
    // keep a multi-band collision at its first equal band: all
    // earlier bands must differ
    def earlierDiffer(b: Int): Column = (0 until b)
      .map(i => col(s"x.s$i") =!= col(s"y.s$i"))
      .foldLeft(lit(true))(_ && _)
    val firstMatch = (0 until nBands).foldLeft(lit(null).cast("boolean")) {
      (acc, b) => when(col("x.band") === b, earlierDiffer(b)).otherwise(acc)
    }
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(firstMatch)
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
  }

  val NgramJaccardThreshold = 0.5
  val EmbedCosThreshold = 0.3
  val SemanticDupCosThreshold = 0.3

  private val P = TextFns.HashMod

  /** Deterministic per-(query, input-dir) scratch directory for the
    * fixture-building queries (x11b asset files, x52 snapshot table),
    * wiped on entry so every call rebuilds from zero — idempotent
    * under re-runs, and concurrent sf dirs can't collide.
    */
  private def scratchDir(s: SparkSession, name: String, dir: String): String = {
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${name}_" + graft.Hashing.md5hex(dir).take(6)).getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  /** Distinct (doc_id, tok) pairs — the token index every dedup path
    * shares. At scale this is the one shuffle all candidates flow
    * through. Multi-consumer callers (x02: signatures + masks + vocab)
    * persist it through [[graft.Caching.withPersisted]]; single-consumer
    * callers read it straight through.
    */
  private def tokIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", explode(TextFns.tokenize($"text")).as("tok"))
      .distinct()
  }

  /** embeddings as (vec_id, v: array<double>). */
  private def emb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expressions.DecimalDot.register(s)
    graft.expressions.DoubleDot.register(s)
    t(s, dir, "embeddings")
      .select($"vec_id", VectorFns.asDoubleArray("embedding").as("v"))
  }

  /** Random-hyperplane LSH buckets: sign bits of the dot product
    * against `bits` fixed planes (vectors firstPlane..firstPlane+bits-1
    * of the table itself, so the oracle shares them). One broadcast of
    * the planes + one scan.
    */
  private def lshBuckets(e: DataFrame, firstPlane: Int = 1,
      bits: Int = 8): DataFrame = {
    val planes = e.filter(col("vec_id").between(firstPlane, firstPlane + bits - 1))
      .select(col("vec_id").as("j"), col("v").as("p"))
    e.crossJoin(broadcast(planes))
      .withColumn("dot", VectorFns.dotDec("v", "p"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dot") > 0.0,
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(j - $firstPlane AS INT))"))
        .otherwise(lit(0L))).as("bucket"))
  }

  // ---------------------------------------------------------------- dedup family

  /** x01 — exact dedup: hash-groupBy on content (keep-min-id policy). */
  def x01DedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy(md5($"text").as("h"))
      .agg(cnt.as("n_dups"), min($"doc_id").as("keeper"))
      .orderBy($"h")
  }

  /** x02 — MinHash + LSH banded near-dup: token hash → corpus-scaled
    * min-hash signature ([[minhashSchemeFor]]: 16 hashes banded 4×4 at
    * the gate scales, growing to 48/8 then 128/16 with the S-curve
    * threshold pinned at ~0.71) → bucket-join for candidates → exact
    * Jaccard verify ≥ 0.7. The scale path for Q27: candidate volume is
    * bounded by band collisions, never |docs|².
    */
  def x02DedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // token index fans out to vocab probe + signatures + masks/verify —
    // persisted for exactly one terminal action (SCALE.md "Unpersist
    // discipline")
    graft.Caching.withPersisted(tokIndex(s, dir)) { toks =>
    // The scheme (total hashes, band count) is corpus-scaled with the
    // S-curve threshold pinned at ~0.71 — see minhashSchemeFor. The
    // count is one driver-side scalar the DuckDB oracle re-derives.
    val nDocs = t(s, dir, "documents").count()
    val (nHashes, nBands) = minhashSchemeFor(nDocs)
    // The permutations are compile-time constants, so all nHashes
    // min-hashes come out of ONE hash aggregate (no ×k row explode, no
    // second shuffle — the doc_id shuffle is the only one).
    val mhCols = Perms.take(nHashes).map { case (j, a, b) =>
      min((lit(a) * $"th" + lit(b)) % P).as(s"mh$j")
    }
    // Band candidates from a per-doc signature frame. Lossless pack:
    // each min-hash is in [0, P) with P < 2^30, so two fit in one long
    // (mh_a·P + mh_b) — band signatures are structs of longs, and the
    // candidate join hashes/compares longs, not strings. The struct
    // form carries ALL band signatures so a pair colliding in several
    // bands is kept only at its FIRST colliding band — an in-join
    // filter replacing the full distinct() shuffle of the duplicated
    // candidate stream.
    def bandCandidates(sig: DataFrame): DataFrame =
      minhashBandCandidates(sig, nHashes, nBands)
    // short-circuit strategy probe — see verifyJaccard; 1024 is the
    // same MaxMaskBits cap as SetSimilarityJoin's mask strategies
    val vocab = toks.select($"tok").distinct()
    val vCount = vocab.limit(1025).count()
    if (vCount <= 64) {
      // Tiny vocabulary: ONE per-doc aggregate computes the nHashes
      // min-hashes AND a single-long set mask (= exact set identity).
      // Kept as its own strategy below the multi-word path: the plain
      // long groups/joins/bit_counts measurably beat the 1-element
      // array form at this width (7.6 s vs 13.5 s on the sf0.1 sweep).
      val varr = vocab.agg(sort_array(collect_list($"tok")).as("varr"))
      val per = toks.crossJoin(broadcast(varr))
        .withColumn("th", TextFns.tokHash($"tok"))
        .groupBy($"doc_id")
        .agg(mhCols.head, (mhCols.tail :+
          sum(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(array_position(varr, tok) - 1 AS INT))"))
            .as("mask")): _*)
      val gCols = (0 until nHashes).map(j => min(col(s"mh$j")).as(s"mh$j")) ++ Seq(
        min($"doc_id").as("doc_id"), collect_list($"doc_id").as("members"))
      val groupsRaw = per.groupBy($"mask").agg(gCols.head, gCols.tail: _*)
      // groups feeds FOUR subtrees (band join + both verify sides +
      // within-group pairs) — persist like the other two strategies so
      // the per-doc signature aggregate runs once (ADVICE r10)
      graft.Caching.withPersisted(groupsRaw) { groups =>
      val cand = bandCandidates(groups)
      val gsel = groups.select($"doc_id".as("rid"), $"mask", $"members")
      val cross = cand
        .join(gsel.select($"rid".as("d1"), $"mask".as("m1"), $"members".as("mem1")), Seq("d1"))
        .join(gsel.select($"rid".as("d2"), $"mask".as("m2"), $"members".as("mem2")), Seq("d2"))
        .withColumn("jaccard",
          expr("bit_count(m1 & m2)").cast(DoubleType) / expr("bit_count(m1 | m2)"))
        .filter($"jaccard" >= MinhashJaccardThreshold)
        .select(explode($"mem1").as("a"), $"mem2", $"jaccard")
        .select($"a", explode($"mem2").as("b"), $"jaccard")
        .select(least($"a", $"b").as("d1"), greatest($"a", $"b").as("d2"), $"jaccard")
      val within = groups.filter(size($"members") > 1)
        .select(explode($"members").as("a"), $"members")
        .select($"a", explode($"members").as("b"))
        .filter($"a" < $"b")
        .select($"a".as("d1"), $"b".as("d2"), lit(1.0).as("jaccard"))
      cross.unionByName(within).orderBy($"d1", $"d2")
      }
    } else if (vCount <= 1024) {
      // Mask-width vocabulary (64 < V ≤ 1024 ⇒ 2..16 longs per set):
      // ONE per-doc aggregate computes the nHashes min-hashes AND the
      // multi-word bit mask (= exact set identity). The bit index is a
      // broadcast (rank, tok) table from one sorted-vocab aggregate
      // row — a hash-join lookup per item row, not an O(V)
      // array_position scan.
      val words = ((vCount + 63) / 64).toInt
      val ranks = vocab.agg(sort_array(collect_list($"tok")).as("varr"))
        .select(posexplode($"varr").as(Seq("p", "tok")))
      val wordCols = (0 until words).map { w =>
        sum(expr(s"CASE WHEN p DIV 64 = $w THEN " +
          "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) ELSE 0 END"))
          .as(s"_w$w")
      }
      val per = toks.join(broadcast(ranks), Seq("tok"))
        .withColumn("th", TextFns.tokHash($"tok"))
        .groupBy($"doc_id")
        .agg(mhCols.head, (mhCols.tail ++ wordCols): _*)
        .withColumn("mask", array((0 until words).map(w => col(s"_w$w")): _*))
      // Compress identical token sets BEFORE the quadratic stage: docs
      // sharing a mask share the whole signature vector, so the band
      // join runs on distinct-set representatives (~0.6x the quadratic
      // volume at sf0.1) and member lists expand back afterwards.
      // Equivalence: same-set docs collide in every band (J=1 always
      // passes); a cross-set pair collides iff its representatives do.
      // The sf1 rehearsal measured why this compression must not be
      // skipped on a dense corpus: the per-doc open-vocab path banded
      // 64k docs from a 310-token vocabulary into 65M candidate pairs.
      val gCols = (0 until nHashes).map(j => min(col(s"mh$j")).as(s"mh$j")) ++ Seq(
        min($"doc_id").as("doc_id"), collect_list($"doc_id").as("members"))
      val groupsRaw = per.groupBy($"mask").agg(gCols.head, gCols.tail: _*)
      // groups feeds FOUR subtrees of the returned plan (band join +
      // both verify sides + within-group pairs) — persist the ~|distinct
      // sets| frame so the signature aggregate runs once (SCALE.md
      // "Unpersist discipline")
      graft.Caching.withPersisted(groupsRaw) { groups =>
      val cand = bandCandidates(groups)
      graft.expressions.MaskPairStats.register(s)
      val gsel = groups.select($"doc_id".as("rid"), $"mask", $"members")
      val cross = cand
        .join(gsel.select($"rid".as("d1"), $"mask".as("m1"), $"members".as("mem1")), Seq("d1"))
        .join(gsel.select($"rid".as("d2"), $"mask".as("m2"), $"members".as("mem2")), Seq("d2"))
        // one codegen pass per candidate: inter << 11 | uni (band slot
        // unused at nBands = 1) — the interpreted zip_with/aggregate
        // form was the 70 s q27 tail at the sf1 rehearsal's volume
        .withColumn("mps", graft.expressions.MaskPairStats.maskPairStats(
          $"m1", $"m2", lit(1)))
        .withColumn("jaccard",
          shiftright($"mps", 11).bitwiseAND(lit(0x7ffL)).cast(DoubleType) /
            $"mps".bitwiseAND(lit(0x7ffL)))
        .filter($"jaccard" >= MinhashJaccardThreshold)
        .select(explode($"mem1").as("a"), $"mem2", $"jaccard")
        .select($"a", explode($"mem2").as("b"), $"jaccard")
        .select(least($"a", $"b").as("d1"), greatest($"a", $"b").as("d2"), $"jaccard")
      // within-group pairs: identical sets, Jaccard exactly 1.0 (the
      // double ratio sz/sz the oracle computes). At open-web scale a
      // mega-group of byte-identical docs is possible — the pair
      // explosion is inherent to the query's output, not this plan.
      val within = groups.filter(size($"members") > 1)
        .select(explode($"members").as("a"), $"members")
        .select($"a", explode($"members").as("b"))
        .filter($"a" < $"b")
        .select($"a".as("d1"), $"b".as("d2"), lit(1.0).as("jaccard"))
      cross.unionByName(within).orderBy($"d1", $"d2")
      }
    } else {
      // Open vocabulary (the true 100 TB path): signatures + exact
      // verify via sorted-array merge intersect — with the SAME
      // identical-set compression as the mask paths (set identity =
      // TextFns.setIdentity — injective length-prefixed md5, the
      // x01/x04 precedent). Without it, a k-doc duplicate group — the dominant
      // structure of real open-web corpora — costs k²/2 band-join and
      // verify rows per band; with it, one representative per distinct
      // set and the quadratic stage is driven by distinct-set count.
      val arrs = toks.groupBy($"doc_id")
        .agg(sort_array(collect_list($"tok")).as("arr"), cnt.as("sz"))
        .withColumn("h", TextFns.setIdentity($"arr"))
      val gids = arrs.select($"h", $"doc_id")
        .groupBy($"h")
        .agg(min($"doc_id").as("doc_id"), collect_list($"doc_id").as("members"))
        .drop("h")
      // reps carry the verify arrays; the join reuses arrs' hash(doc_id)
      // partitioning (gids' min(doc_id) side shuffles 8 bytes per set)
      val repsRaw = arrs.drop("h").join(gids, Seq("doc_id"))
      graft.Caching.withPersisted(repsRaw) { reps =>
      graft.expressions.SortedIntersectCount.register(s)
      val sig = toks.join(reps.select($"doc_id"), Seq("doc_id"), "left_semi")
        .withColumn("th", TextFns.tokHash($"tok"))
        .groupBy($"doc_id").agg(mhCols.head, mhCols.tail: _*)
      val cross = bandCandidates(sig)
        .join(reps.select($"doc_id".as("d1"), $"arr".as("a1"), $"sz".as("sz1"),
          $"members".as("mem1")), Seq("d1"))
        .join(reps.select($"doc_id".as("d2"), $"arr".as("a2"), $"sz".as("sz2"),
          $"members".as("mem2")), Seq("d2"))
        .withColumn("inter",
          graft.expressions.SortedIntersectCount.sortedIntersectCount($"a1", $"a2"))
        .withColumn("jaccard",
          $"inter".cast(DoubleType) / ($"sz1" + $"sz2" - $"inter"))
        .filter($"jaccard" >= MinhashJaccardThreshold)
        .select(explode($"mem1").as("a"), $"mem2", $"jaccard")
        .select($"a", explode($"mem2").as("b"), $"jaccard")
        .select(least($"a", $"b").as("d1"), greatest($"a", $"b").as("d2"), $"jaccard")
      val within = reps.filter(size($"members") > 1)
        .select(explode($"members").as("a"), $"members")
        .select($"a", explode($"members").as("b"))
        .filter($"a" < $"b")
        .select($"a".as("d1"), $"b".as("d2"), lit(1.0).as("jaccard"))
      cross.unionByName(within).orderBy($"d1", $"d2")
      }
    }
    }
  }

  /** x02 candidate accounting (VERDICT r11 #1: the sf10 step was
    * undiagnosable because the banded candidate-pair count was never
    * logged): per-corpus driver-side scalars — docs, scheme, distinct
    * token sets, representative-level band candidates, and final
    * result rows. Candidates count at the REPRESENTATIVE level
    * (identical-set compression applied, as the operator runs), so the
    * table separates plan-bound cost (signatures + candidates + verify)
    * from output-bound cost (the member-expanded pair dump).
    * Driven by [[graft.MinhashDiag]]; each value is one count scalar.
    */
  def x02Diag(s: SparkSession, dir: String): Seq[(String, Long)] = {
    import s.implicits._
    // multi-action diagnostic (several counts), so a plain persist
    // scope rather than withPersisted's one-action contract
    val toks = tokIndex(s, dir).persist()
    try {
      val nDocs = t(s, dir, "documents").count()
      val (nHashes, nBands) = minhashSchemeFor(nDocs)
      val arrs = toks.groupBy($"doc_id")
        .agg(sort_array(collect_list($"tok")).as("arr"))
        .withColumn("h", TextFns.setIdentity($"arr"))
      val reps = arrs.groupBy($"h").agg(min($"doc_id").as("doc_id"))
      val nSets = reps.count()
      val mhCols = Perms.take(nHashes).map { case (j, a, b) =>
        min((lit(a) * $"th" + lit(b)) % P).as(s"mh$j")
      }
      val sig = toks.join(reps.select($"doc_id"), Seq("doc_id"), "left_semi")
        .withColumn("th", TextFns.tokHash($"tok"))
        .groupBy($"doc_id").agg(mhCols.head, mhCols.tail: _*)
      val nCand = minhashBandCandidates(sig, nHashes, nBands).count()
      val nRes = x02DedupMinhashLsh(s, dir).count()
      Seq("n_docs" -> nDocs, "n_hashes" -> nHashes.toLong,
        "n_bands" -> nBands.toLong, "n_distinct_sets" -> nSets,
        "n_band_candidates" -> nCand, "n_result_rows" -> nRes)
    } finally toks.unpersist()
  }

  /** Per-doc SimHash signature frame (doc_id, simhash) — shared by x03
    * (the signature dump) and x14 (signature-equality dedup edges).
    *
    * Weighted-bit sum s_b = Σ_tok ((th>>b & 1)*2 - 1) = 2·c_b − n with
    * n = |distinct tokens|, so the sign test is 2·c_b > n. The token
    * SET is per-doc (`array_distinct` ≡ the global (doc_id, tok)
    * distinct restricted to one doc), which makes the whole signature
    * row-local: hash the distinct tokens once into `hs`, then 32
    * constant-shift `aggregate` scans count each bit — zero shuffles,
    * where the former shared-token-index form paid an explode+distinct
    * exchange per call (r6 x03 regression, VERDICT r6 wrong-#1).
    */
  private def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        transform(array_distinct(TextFns.tokenize($"text")),
          tok => TextFns.tokHash(tok)).as("hs"))
      .select($"doc_id",
        (0 until 32).map { b =>
          when(expr(
            s"aggregate(hs, CAST(0 AS BIGINT), (a, h) -> a + (shiftright(h, $b) & 1)) * 2") > size($"hs"),
            lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _).cast(LongType).as("simhash"))
  }

  /** x03 — SimHash signatures: 32-bit sign-of-weighted-bits over token
    * hashes. Near-dups share signatures (or low Hamming distance);
    * grouping by signature is a pure hash-shuffle at any scale.
    */
  def x03DedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    simhashSignatures(s, dir).orderBy($"doc_id")
  }

  /** x04 — n-gram (3-token shingle) Jaccard near-dup ≥ 0.5: stricter
    * than token-set Jaccard (order-sensitive), same shared-shingle
    * candidate join — no cartesian.
    */
  def x04NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .withColumn("toks", TextFns.tokenize($"text"))
      .select($"doc_id", explode(expr(
        // guard: docs with <3 tokens have no shingles (sequence(1, n<1)
        // would count DOWN and element_at(toks, 0) throws)
        "CASE WHEN size(toks) >= 3 THEN" +
          " transform(sequence(1, size(toks) - 2), i -> concat_ws(' '," +
          " element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2)))" +
          " ELSE array() END"))
        .as("tok"))
      .distinct()
    // PPJoin prefix filter + merge-scan verify in one operator: the
    // shingle index is consumed twice (frequency table + the per-doc
    // grouped pass); every downstream fan-out (candidate sides, verify
    // arrays) reads the PERSISTED per-doc frame the operator builds —
    // the r03 form persisted the raw index and still re-derived
    // windows/arrays from it per consumer.
    graft.operators.SetSimilarityJoin
      .prefixJaccardSelfJoin(sh, NgramJaccardThreshold)
      .orderBy($"d1", $"d2")
  }

  /** Hyperplane-bit budget for a corpus of `n` vectors: the smallest
    * b in [8, 24] with 2^b · 16 ≥ n, i.e. expected bucket occupancy
    * ≤ 16. Candidate volume in a bucket self-join is Σ occ²/2 ≈
    * n·occ/2 — CONSTANT occupancy makes it linear in n, while any
    * fixed bit count makes it n²/2^bits (the sf1 rehearsal measured
    * that cliff on x12: 10× data → 56× time at 8 fixed bits).
    * Integer-exact shift compare (no float log2) so the DuckDB oracle
    * computes the identical b from the identical n at every sf.
    */
  private[graft] def lshBitsFor(n: Long): Int =
    (8 to 24).find(b => (1L << b) * 16L >= n).getOrElse(24)

  /** x12 — embedding-cosine near-dup, LSH-bucketed: candidates share a
    * hyperplane sign bucket; exact decimal cosine ≥ 0.3 verifies.
    * (The synthetic embeddings are near-orthogonal, so few/no rows is
    * the honest answer — the oracle checks the same bucketed set.)
    *
    * The bit count scales with the corpus ([[lshBitsFor]]) so the
    * bucket self-join stays linear; the count() that sizes it is one
    * metadata-cheap parquet count — a scheduler-sized strategy probe,
    * same precedent as x02's vocab limit(65). Recall per extra bit
    * drops by the plane-agreement factor 1−θ/π; production compensates
    * with L tables at constant bits-per-table (the x06 dial), which is
    * a recall knob, not a scale knob — here one table matches the
    * declared operator.
    */
  def x12EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val b = lshBuckets(e, 1, lshBitsFor(e.count()))
    val pairs = b.as("x").join(b.as("y"),
        $"x.bucket" === $"y.bucket" && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("d1"), $"y.vec_id".as("d2"))
    val ev = e.withColumn("nn", VectorFns.dotDec("v", "v"))
    pairs
      .join(ev.select($"vec_id".as("d1"), $"v".as("v1"), $"nn".as("n1")), Seq("d1"))
      .join(ev.select($"vec_id".as("d2"), $"v".as("v2"), $"nn".as("n2")), Seq("d2"))
      .withColumn("cosine", VectorFns.dotDec("v1", "v2") / (sqrt($"n1") * sqrt($"n2")))
      .filter($"cosine" >= EmbedCosThreshold)
      .select($"d1", $"d2", $"cosine")
      .orderBy($"d1", $"d2")
  }

  /** x14 — dedup CLUSTERING: the stage after pair generation. Two O(n)
    * signature relations (SimHash equality + leading-8-token
    * fingerprint equality) emit star edges — k duplicates cost k−1
    * edges, never the k²/2 within-group pairs — and
    * [[graft.operators.ConnectedComponents]] (alternating large-star/
    * small-star, O(log) rounds) collapses the union into components, so
    * a doc that matches A on one signature and B on the other lands in
    * ONE cluster. Output: every doc with its canonical keeper (the
    * component's min doc_id) and cluster size — the frame a training
    * pipeline filters to `doc_id = cluster_id` to dedup the corpus.
    */
  /** Near-duplicate cluster labels (doc_id → cluster_id = the smallest
    * doc_id reachable through simhash- or fingerprint-identity edges) —
    * the shared clustering pass behind x14 (the cluster report) and
    * x29 (the survivor / savings report).
    */
  private def dedupClusterLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.ConnectedComponents
    val docs = t(s, dir, "documents")
    val bySimhash = ConnectedComponents.starEdges(
      simhashSignatures(s, dir), "doc_id", "simhash")
    val byFp8 = ConnectedComponents.starEdges(
      docs.select($"doc_id",
        md5(concat_ws(" ", slice(TextFns.tokenize($"text"), 1, 8))).as("sig")),
      "doc_id", "sig")
    val labels = ConnectedComponents.run(bySimhash.unionByName(byFp8))
    docs.select($"doc_id")
      .join(labels, $"doc_id" === $"node", "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("cluster_id"))
  }

  def x14DedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // lab feeds both the size agg and the final join, but stays
    // UNPERSISTED deliberately: the expensive CC run behind it is
    // already localCheckpointed, so each consumer re-runs only the
    // cheap docs-scan + labels join — measured at sf0.1, persisting
    // the 2-column frame is a wash-to-loss (3.75 s vs 4.13 s min;
    // SCALE.md "Unpersist discipline").
    val lab = dedupClusterLabels(s, dir)
    val sizes = lab.groupBy($"cluster_id").agg(cnt.as("cluster_size"))
    lab.join(sizes, Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"cluster_size")
      .orderBy($"doc_id")
  }

  /** x29 — end-to-end dedup resolution: collapse each near-duplicate
    * cluster (x14's labels) to its canonical survivor (the smallest
    * doc_id — exactly the connected-component label) and report the
    * per-language corpus savings: documents and characters before vs
    * after. This is the step that turns pair/cluster DETECTION into an
    * actual deduplicated corpus; the keep-min-id policy is
    * deterministic, so the report is bit-reproducible on any cluster.
    */
  def x29DedupSurvivors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
      .join(dedupClusterLabels(s, dir), Seq("doc_id"))
      .groupBy($"lang")
      .agg(cnt.as("n_docs"),
        sum(when($"doc_id" === $"cluster_id", 1L).otherwise(0L)).as("n_kept"),
        sum($"n_chars").as("chars_total"),
        sum(when($"doc_id" === $"cluster_id", $"n_chars").otherwise(0L))
          .as("chars_kept"))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- similarity search

  /** x05 — brute-force ANN baseline: cosine top-3 for each of 10 probe
    * vectors. Probes broadcast; one scan of the corpus — linear.
    */
  def x05AnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // norms precomputed once per vector (not once per pair)
    val e = emb(s, dir).withColumn("n1", VectorFns.dotDec("v", "v"))
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("p"), $"n1".as("n2"))
    val scored = e.crossJoin(broadcast(probes))
      .filter($"vec_id" =!= $"p_id")
      .withColumn("dot", VectorFns.dotDec("v", "p"))
      .withColumn("cosine", $"dot" / (sqrt($"n1") * sqrt($"n2")))
    val w = Window.partitionBy($"p_id").orderBy($"cosine".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter($"rank" <= 3)
      .select($"p_id", $"vec_id", $"cosine", $"rank")
      .orderBy($"p_id", $"rank")
  }

  /** x06 — LSH-bucketed ANN (the scale path): probe only scores
    * vectors in its own hyperplane bucket (expected corpus/2^bits of
    * the data) instead of the full corpus.
    */
  def x06AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("n1", VectorFns.dotDec("v", "v"))
    // TWO hash tables (planes 1-8 and 9-16) x Hamming<=2 MULTI-probe:
    // searching a single exact bucket forfeits recall (the r7 recall@3
    // gate measured 0/3 — this corpus' true neighbours sit at cosine
    // ~0.33, i.e. Hamming 2-3 from the probe in expectation), and
    // either remedy alone still missed a Hamming-3 neighbour. L tables
    // and the probe radius r are the two standard LSH recall/cost
    // dials: expected scan fraction is L * |Hamming<=r ball| / 2^bits
    // (here 2*37/256 ~ 29%), and each table's candidate pull is one
    // bucket equi-join — no extra shuffle shape at any scale. Measured
    // on this corpus: recall@3 = 1.0 at sf0.001 (the gate), ~2/3 at
    // sf0.1 — the same weak-locality profile as the IVF path.
    val singles = (0 until 8).map(j => 1L << j)
    val pairs = for { i <- 0 until 8; j <- i + 1 until 8 }
      yield (1L << i) | (1L << j)
    val masks = 0L +: (singles ++ pairs)
    val cand = Seq(1, 9).map { firstPlane =>
      val b = lshBuckets(e, firstPlane)
      val pb = b.filter($"vec_id" === 0)
        .select(explode(typedLit(masks)).as("mask"), $"bucket")
        .select($"bucket".bitwiseXOR($"mask").as("pbucket")).distinct()
      b.join(broadcast(pb), $"bucket" === $"pbucket")
        .filter($"vec_id" =!= 0).select($"vec_id")
    }.reduce(_ unionAll _).distinct()
    val probe = e.filter($"vec_id" === 0).select($"v".as("p"), $"n1".as("n2"))
    e.join(cand, Seq("vec_id"))
      .crossJoin(broadcast(probe))
      .withColumn("dot", VectorFns.dotDec("v", "p"))
      .select($"vec_id", ($"dot" / (sqrt($"n1") * sqrt($"n2"))).as("cosine"))
      .orderBy($"cosine".desc, $"vec_id")
      .limit(3)
  }

  /** x13 — IVF-flavored ANN (the other classic scale path next to LSH
    * x06): a coarse quantizer assigns every vector to its nearest of 16
    * fixed seed centroids (vectors 1..16 of the table, so the oracle
    * shares them deterministically — production would k-means-train
    * these offline); the probe searches only the vectors assigned to
    * its `nprobe = 2` nearest cells. One broadcast of 16 centroids +
    * one corpus scan for assignment; probing touches ~nprobe/ncells of
    * the data.
    */
  def x13AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("n1", VectorFns.dotDec("v", "v"))
    val seeds = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"), $"n1".as("cn"))
    // assignment: nearest seed by exact cosine (ties -> smallest cid).
    // argmax is a HASH AGGREGATE (max_by over a (cos, -cid) tie-break
    // struct), not a row_number window — ranking corpus×16 rows through
    // a sort-based window pays a full sort shuffle for a question that
    // only needs the per-key max (VERDICT r03 "What's wrong" #2).
    val scored = e.crossJoin(broadcast(seeds))
      .withColumn("cos", VectorFns.dotDec("v", "c") / (sqrt($"n1") * sqrt($"cn")))
    // coalesce(cos, -2): a zero-norm vector nulls every cosine (decimal
    // division by 0), and max_by over an all-null ordering would yield
    // cell=null, silently dropping the vector from the index — pinning
    // null below the cosine range keeps the assign-anyway semantics of
    // the r03 window form (smallest cid wins the tie) (ADVICE r04)
    val assign = scored.groupBy($"vec_id")
      .agg(max_by($"cid", struct(coalesce($"cos", lit(-2.0)), -$"cid")).as("cell"))
    // probe cells: the 2 seeds nearest to vector 0
    val probeCells = scored.filter($"vec_id" === 0)
      .orderBy($"cos".desc, $"cid").limit(2)
      .select($"cid".as("cell"))
    val probe = e.filter($"vec_id" === 0).select($"v".as("p"), $"n1".as("n2"))
    assign.join(broadcast(probeCells), Seq("cell"))
      .filter($"vec_id" =!= 0)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(probe))
      .withColumn("cosine",
        VectorFns.dotDec("v", "p") / (sqrt($"n1") * sqrt($"n2")))
      .select($"vec_id", $"cosine")
      .orderBy($"cosine".desc, $"vec_id") // TakeOrdered — no global window
      .limit(5)
  }

  /** x27 — nearest-centroid classification + confusion matrix: the
    * embedding-space quality/topic filter every training-data pipeline
    * runs (score each document's embedding against per-class
    * prototypes, route by the nearest one). Centroids are the exact
    * decimal per-dimension means (Q26 arithmetic), assignment is the
    * same broadcast-scored `max_by` hash aggregate as the IVF index
    * (x13) — K centroid rows broadcast against ONE corpus scan, no
    * window, no shuffle beyond the two hash aggregates — and the
    * output is the label×predicted confusion matrix, the standard
    * router-quality audit.
    */
  def x27ClassifyCentroid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expressions.DecimalDot.register(s)
    val e = t(s, dir, "embeddings")
    // per-label exact-decimal centroid, re-assembled into a vector
    val cents = e.select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"pos")
      .agg((sum($"x".cast(DoubleType).cast(DecimalType(30, 12))).cast(DoubleType) / cnt)
        .as("c"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
        p => p.getField("c")).as("cv"))
      .select($"label".as("clabel"), $"cv")
      .withColumn("cn", VectorFns.dotDec("cv", "cv"))
    val v = e.select($"vec_id", $"label", VectorFns.asDoubleArray("embedding").as("v"))
      .withColumn("n1", VectorFns.dotDec("v", "v"))
    // nearest centroid by exact cosine; ties -> smallest class label;
    // zero-norm vectors pin below the cosine range (x13 policy)
    val assign = v.crossJoin(broadcast(cents))
      .withColumn("cos", VectorFns.dotDec("v", "cv") / (sqrt($"n1") * sqrt($"cn")))
      .groupBy($"vec_id", $"label")
      .agg(max_by($"clabel", struct(coalesce($"cos", lit(-2.0)), -$"clabel"))
        .as("pred"))
    assign.groupBy($"label", $"pred").agg(cnt.as("n"))
      .orderBy($"label", $"pred")
  }

  /** x28 — k-NN majority-vote classification: label the 10 probe
    * vectors by the majority label of their 5 nearest neighbours in
    * the rest of the corpus (exact cosine). The neighbour search is
    * probe-vs-all — probes broadcast, ONE corpus scan — with the
    * per-probe top-k going through the salted two-phase rank, and the
    * vote is a pair of hash aggregates (count per candidate label,
    * then `max_by` votes with a smallest-label tie-break). At 100 TB
    * the same plan serves label-propagation QA: the index side streams,
    * nothing but the k survivors per probe ever concentrates.
    */
  def x28KnnVote(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expressions.DecimalDot.register(s)
    val e = t(s, dir, "embeddings")
      .select($"vec_id", $"label", VectorFns.asDoubleArray("embedding").as("v"))
      .withColumn("n1", VectorFns.dotDec("v", "v"))
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"label".as("true_label"),
        $"v".as("p"), $"n1".as("n2"))
    val scored = e.filter($"vec_id" >= 10)
      .crossJoin(broadcast(probes))
      .withColumn("cosine", VectorFns.dotDec("v", "p") / (sqrt($"n1") * sqrt($"n2")))
    saltedTopK(scored, Seq($"p_id"), $"vec_id", $"cosine", "rk", 5)
      .groupBy($"p_id", $"true_label", $"label").agg(cnt.as("votes"))
      .groupBy($"p_id", $"true_label")
      .agg(max_by(struct($"label", $"votes"), struct($"votes", -$"label")).as("w"))
      .select($"p_id", $"true_label",
        $"w.label".as("pred_label"), $"w.votes".as("votes"))
      .orderBy($"p_id")
  }

  /** x21 — scalar-quantized ANN (the memory-bound regime's scale path,
    * complementing LSH x06 / IVF x13): each vector quantizes
    * symmetrically to ints in [-127, 127] (4-8x smaller than floats —
    * at 100 TB of embeddings the quantized corpus is what fits in
    * cluster RAM), candidates are scored with the exact-integer
    * [[graft.expressions.IntDot]] codegen kernel, and only the top-20
    * approx candidates pay the exact decimal re-rank.
    *
    * Every stage is deterministic (floor quantization — no rounding
    * ties; i64 dot — no float accumulation order), so the DuckDB twin
    * reproduces the whole pipeline including the candidate cut.
    */
  def x21AnnSq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.expressions.IntDot.register(s)
    val q = emb(s, dir)
      .withColumn("m", array_max(expr("transform(v, x -> abs(x))")))
      // zero vector: scale 0 -> all-zero q -> qn = 0 (guarded below)
      .withColumn("qsc", when($"m" > 0, lit(127.0) / $"m").otherwise(lit(0.0)))
      .withColumn("qv", expr("transform(v, x -> CAST(floor(x * qsc) AS INT))"))
      .withColumn("qn", graft.expressions.IntDot.intDot($"qv", $"qv"))
    val probe = q.filter($"vec_id" === 0)
      .select($"qv".as("pq"), $"qn".as("pn"), $"v".as("pv"))
    val scored = q.filter($"vec_id" =!= 0).crossJoin(broadcast(probe))
      .withColumn("qdot", graft.expressions.IntDot.intDot($"qv", $"pq"))
      .withColumn("approx", when($"qn" > 0 && $"pn" > 0,
        $"qdot".cast(DoubleType) /
          (sqrt($"qn".cast(DoubleType)) * sqrt($"pn".cast(DoubleType))))
        .otherwise(lit(-2.0)))
    // TakeOrdered candidate cut, then exact re-rank on 20 rows only
    scored.orderBy($"approx".desc, $"vec_id").limit(20)
      .withColumn("cosine", VectorFns.dotDec("v", "pv") /
        (sqrt(VectorFns.dotDec("v", "v")) * sqrt(VectorFns.dotDec("pv", "pv"))))
      .select($"vec_id", $"approx", $"cosine")
      .orderBy($"cosine".desc, $"vec_id").limit(5)
  }

  /** x24 — hybrid retrieval: lexical tf·idf and vector cosine ranked
    * independently, fused by Reciprocal Rank Fusion
    * (rrf = Σ 1/(60+rank) over the lists that contain the doc) — the
    * standard composition a retrieval-augmented pipeline runs over a
    * corpus that has both text and embeddings. Query = doc 0 (its 4
    * alphabetically-first distinct tokens + its embedding).
    *
    * Parity/scale notes: idf is the RATIONAL form (N−df+0.5)/(df+0.5)
    * — log-free, so both engines compute identical doubles (ln is not
    * correctly-rounded in either); per-doc tf·idf sums route through
    * the decimal `dsum` (order-independent); both top-10 rankings use
    * the x17 salted two-phase pattern; lexical candidates are bounded
    * by the query terms' posting lists (the broadcast `qt` semi-join),
    * never the corpus.
    */
  def x24HybridSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
    val n = docs.agg(cnt.as("n"))
    val qt = docs.filter($"doc_id" === 0)
      .select(explode($"toks").as("tok")).distinct()
      .orderBy($"tok").limit(4)
    val tf = docs.select($"doc_id", explode($"toks").as("tok"))
      .groupBy($"doc_id", $"tok").agg(cnt.as("tf"))
    val dfreq = tf.groupBy($"tok").agg(cnt.as("df"))
    val lexScores = tf.join(broadcast(qt), Seq("tok"))
      .join(dfreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .filter($"doc_id" =!= 0)
      .groupBy($"doc_id")
      .agg(dsum($"tf".cast(DoubleType) *
        (($"n" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))).as("score"))
    def topK(df: DataFrame, id: String, key: Column, rankName: String,
        k: Int): DataFrame =
      saltedTopK(df, Nil, col(id), key, rankName, k)
        .select(col(id).as("doc_id"), col(rankName))
    val lexTop = topK(lexScores, "doc_id", $"score", "lex_rank", 10)
    val e = emb(s, dir).withColumn("nn", VectorFns.dotDec("v", "v"))
    val probe = e.filter($"vec_id" === 0).select($"v".as("pv"), $"nn".as("pn"))
    val cos = e.filter($"vec_id" =!= 0).crossJoin(broadcast(probe))
      .withColumn("cosine",
        VectorFns.dotDec("v", "pv") / (sqrt($"nn") * sqrt($"pn")))
    val vecTop = topK(cos, "vec_id", $"cosine", "vec_rank", 10)
    lexTop.join(vecTop, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + $"lex_rank"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + $"vec_rank"), lit(0.0)))
      .select($"doc_id", $"lex_rank", $"vec_rank", $"rrf")
      .orderBy($"rrf".desc, $"doc_id").limit(10)
  }

  /** x25 — product-quantization ANN (completing the taxonomy: x05
    * brute, x06 LSH, x13 IVF, x21 scalar-quant): the 64-dim space
    * splits into 8 subspaces of 8 dims; each corpus subvector is
    * assigned to its nearest of 16 codewords (subvectors of seed
    * vectors 1..16 — production trains these by k-means offline), so a
    * vector stores as 8 bytes of codes. Probe scoring is ADC
    * (asymmetric distance computation): the probe's dot with every
    * codeword is precomputed (128 values), and a vector's approx
    * score is just 8 table lookups summed — no float math per corpus
    * vector at query time, the property that makes PQ the
    * memory-bound standard at billions of vectors.
    *
    * Determinism for the oracle: the 8-term distance/dot sums are
    * FIXED left-associated expression chains (identical IEEE result in
    * both engines — never an aggregate whose order can float),
    * assignment ties break by codeword id, and the 8-lookup ADC sum
    * routes through the decimal `dsum`. Exact decimal re-rank on the
    * top-20 candidates only.
    */
  def x25AnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val sub = s.range(8).select($"id".cast(IntegerType).as("s"))
    val cb = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".cast(IntegerType).as("cid"), $"v".as("c"))
      .crossJoin(sub) // 16 codewords x 8 subspaces = 128 rows
    def sqTerm(k: Int) =
      s"(element_at(v, 8*s+$k) - element_at(c, 8*s+$k))" +
        s" * (element_at(v, 8*s+$k) - element_at(c, 8*s+$k))"
    val assign = e.filter($"vec_id" =!= 0).crossJoin(broadcast(cb))
      .withColumn("dist", expr((1 to 8).map(sqTerm).mkString(" + ")))
      .groupBy($"vec_id", $"s")
      .agg(max_by($"cid", struct(-$"dist", -$"cid")).as("cid"))
    def pdTerm(k: Int) = s"element_at(p, 8*s+$k) * element_at(c, 8*s+$k)"
    val adc = cb
      .crossJoin(broadcast(e.filter($"vec_id" === 0).select($"v".as("p"))))
      .withColumn("pd", expr((1 to 8).map(pdTerm).mkString(" + ")))
      .select($"cid", $"s", $"pd")
    val approx = assign.join(broadcast(adc), Seq("cid", "s"))
      .groupBy($"vec_id").agg(dsum($"pd").as("approx"))
    val probe = e.filter($"vec_id" === 0)
      .select($"v".as("pv"), VectorFns.dotDec("v", "v").as("pn"))
    approx.orderBy($"approx".desc, $"vec_id").limit(20)
      .join(e, Seq("vec_id"))
      .crossJoin(broadcast(probe))
      .withColumn("cosine", VectorFns.dotDec("v", "pv") /
        (sqrt(VectorFns.dotDec("v", "v")) * sqrt($"pn")))
      .select($"vec_id", $"approx", $"cosine")
      .orderBy($"cosine".desc, $"vec_id").limit(5)
  }

  // ---------------------------------------------------------------- text analysis

  /** x07 — language ID via marker-token counts (n-gram heuristic
    * shape; real marker sets drop in unchanged).
    */
  def x07LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = TextFns.LangMarkers.map { case (l, _) => s"s_$l" }
    var d = t(s, dir, "documents").withColumn("toks", TextFns.tokenize($"text"))
    TextFns.LangMarkers.foreach { case (l, markers) =>
      d = d.withColumn(s"s_$l", TextFns.markerCount("toks", markers))
    }
    val Seq(en, es, de, fr, zh) = names.map(col)
    d.withColumn("predicted",
        when(en > 0 && en >= es && en >= de && en >= fr && en >= zh, "en")
          .when(es > 0 && es >= de && es >= fr && es >= zh, "es")
          .when(de > 0 && de >= fr && de >= zh, "de")
          .when(fr > 0 && fr >= zh, "fr")
          .when(zh > 0, "zh")
          .otherwise("und"))
      .select(($"doc_id" +: $"lang" +: names.map(col) :+ $"predicted"): _*)
      .orderBy($"doc_id")
  }

  /** Per-document quality features + bounded [0,1] score — the shared
    * row-local feature pass behind x08 (the audit view) and x30 (the
    * per-source cap policy). Carries `source` so cap consumers don't
    * pay a second documents join.
    */
  private def qualityScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stop = TextFns.Stopwords
    val b = t(s, dir, "documents")
      .withColumn("toks", TextFns.tokenize($"text"))
      .select($"doc_id", $"source",
        size($"toks").cast(LongType).as("n_toks"),
        length($"text").cast(LongType).as("len"),
        TextFns.markerCount("toks", stop).as("n_stop"))
    b.select($"doc_id", $"source", $"n_toks",
      (($"len".cast(DoubleType) - ($"n_toks" - 1)) / $"n_toks").as("avg_tok_len"),
      ($"n_stop".cast(DoubleType) / $"n_toks").as("stop_ratio"),
      (lit(0.4) * least($"n_toks" / 100.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - $"n_stop".cast(DoubleType) / $"n_toks") +
        lit(0.3) * least((($"len".cast(DoubleType) - ($"n_toks" - 1)) / $"n_toks") / 8.0,
          lit(1.0))).as("score"))
  }

  /** x08 — quality scoring: length / stopword-ratio / token-shape
    * features combined into a bounded [0,1] score.
    */
  def x08QualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qualityScored(s, dir)
      .select($"doc_id", $"n_toks", $"avg_tok_len", $"stop_ratio", $"score")
      .orderBy($"doc_id")
  }

  /** x30 — per-source document caps: keep only the top-3 documents per
    * source by quality score (the "domain cap" every web-scale corpus
    * applies so no single domain dominates the training mix). Ranking
    * uses the two-phase salted top-k (32-way partial rank inside each
    * source, then the exact rank over ≤3·32 survivors), so a mega-domain
    * with billions of documents never funnels through one reducer.
    */
  def x30SourceCaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    saltedTopK(qualityScored(s, dir), Seq($"source"), $"doc_id", $"score", "rk", 3)
      .select($"source", $"rk", $"doc_id", $"score")
      .orderBy($"source", $"rk")
  }

  /** x09 — token counting: whitespace tokens + BPE-ish regex tokens. */
  def x09TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        size(TextFns.tokenize($"text")).cast(LongType).as("ws_tokens"),
        expr(s"CAST(size(regexp_extract_all(text, '${TextFns.TokenRe}', 0)) AS BIGINT)")
          .as("re_tokens"),
        ($"n_chars".cast(DoubleType) / size(TextFns.tokenize($"text")))
          .as("chars_per_token"))
      .orderBy($"doc_id")
  }

  /** x10 — document fingerprinting: md5 of the leading 8-token shingle
    * + a positional rolling-style hash (portable arithmetic).
    */
  def x10Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").withColumn("toks", TextFns.tokenize($"text"))
    val pos = d.select($"doc_id", posexplode($"toks").as(Seq("pos0", "tok")))
    val term = pos.select($"doc_id",
      ((conv(substring(md5($"tok"), 1, 15), 16, 10).cast(LongType) % 1000000L) *
        when(pmod($"pos0", lit(4)) === 0, 1L)
          .when(pmod($"pos0", lit(4)) === 1, 31L)
          .when(pmod($"pos0", lit(4)) === 2, 961L)
          .otherwise(29791L)).as("v"))
    val roll = term.groupBy($"doc_id").agg((sum($"v") % lit(1000000007L)).as("rolling"))
    d.select($"doc_id", md5(concat_ws(" ", slice($"toks", 1, 8))).as("fp8"))
      .join(roll, Seq("doc_id"))
      .orderBy($"doc_id")
  }

  /** Deterministic 0–99 bucket from a doc id: md5-derived, so (a) the
    * same doc lands in the same bucket on any cluster size, any run —
    * sampling and splits are REPRODUCIBLE, the property `rand()`-based
    * sampling loses the moment a partition boundary moves — and (b)
    * the DuckDB oracle recomputes it exactly.
    */
  private def idBucket(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 4), 16, 10)
      .cast(LongType) % 100

  /** x15a — uniform deterministic sample: keep the 10% of docs whose
    * id-hash bucket < 10. A pure filter — no shuffle, no state, pushes
    * into the scan's output pipeline; at 100 TB it is exactly one pass.
    */
  def x15SampleUniform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"lang", idBucket($"doc_id").as("bucket"))
      .filter($"bucket" < 10)
      .orderBy($"doc_id")
  }

  /** x15b — stratified deterministic sample: per-language rates
    * (downsample the dominant `en`, keep more of the long-tail
    * languages — the standard rebalancing move for multilingual
    * training mixes). Same hash-bucket mechanism, still a pure filter.
    */
  def x15SampleStratified(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when($"lang" === "en", lit(10L)).otherwise(lit(40L))
    t(s, dir, "documents")
      .select($"doc_id", $"lang", idBucket($"doc_id").as("bucket"))
      .filter($"bucket" < rate)
      .orderBy($"doc_id")
  }

  /** x34 — weighted sample without replacement, k=50, weight =
    * `n_chars` (sequential Poisson sampling, Ohlsson 1998): each doc
    * gets priority u/w where u is its deterministic 60-bit id hash,
    * and the k SMALLEST priorities win — inclusion probability is
    * approximately proportional to the weight. The
    * sample-long-documents-more-often knob that complements x15's
    * uniform/stratified filters and x26's mixture rates.
    *
    * Determinism at 100 TB: u is the same md5-derived integer as
    * [[idBucket]] (reproducible on any cluster size / partitioning),
    * and the priority is a single int64→double cast + one IEEE
    * division — both exactly-rounded operations, so Spark and the
    * oracle agree bit-for-bit (never route rank keys through libm
    * ln/exp, which vary by implementation). Top-k runs through the
    * same salted two-phase ranking as x17 — no single reducer sees the
    * corpus.
    */
  def x34WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", $"n_chars",
        (conv(substring(md5($"doc_id".cast(StringType)), 1, 15), 16, 10)
          .cast(LongType).cast(DoubleType) /
          $"n_chars".cast(DoubleType)).as("priority"))
    saltedTopK(d, Seq.empty, $"doc_id", -$"priority", "rank", 50)
      .select($"rank", $"doc_id", $"n_chars", $"priority")
      .orderBy($"rank")
  }

  /** Mixture targets for x26 (sum 1.0): the rebalancing recipe every
    * multilingual training mix runs — upweight the long tail, cap the
    * dominant language.
    */
  val MixtureWeights: Seq[(String, Double)] = Seq(
    "en" -> 0.40, "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  /** x26 — data-mixture rebalancing: given per-language target weights
    * and a total token budget (here 50% of the corpus), derive each
    * language's sampling rate `min(1, budget·w_l / tokens_l)` and keep
    * the deterministic id-hash sample at that rate. One aggregate
    * computes the per-language token counts; the rates quantize to the
    * same 0–99 bucket grid as x15, so the sample is reproducible on
    * any cluster size and the oracle replays it exactly. The dominant
    * language downsamples toward its weight; a language whose corpus
    * is smaller than its budget share keeps everything (rate caps
    * at 1).
    */
  /** x26's keep-percent grid from (lang, n_toks) rows + the target
    * weights: floor(min(1, 0.5·total·w / lang_toks)·100), floored at 1
    * — the 0-99 grid must down-sample a tiny-weight language, never
    * silently drop it from the mix. Shared with x49's final stage.
    */
  private def mixtureRates(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val perLang = d.groupBy(col("lang")).agg(sum(col("n_toks")).as("lang_toks"))
    val total = perLang.agg(sum(col("lang_toks")).as("total_toks"))
    perLang.join(broadcast(MixtureWeights.toDF("lang", "w")), Seq("lang"))
      .crossJoin(broadcast(total))
      .select(col("lang"),
        greatest(lit(1L), floor(least(lit(1.0),
          lit(0.5) * col("total_toks").cast(DoubleType) * col("w") /
            col("lang_toks").cast(DoubleType)) * 100.0)).as("keep_pct"))
  }

  def x26Mixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", $"lang",
        size(TextFns.tokenize($"text")).cast(LongType).as("n_toks"))
    d.join(broadcast(mixtureRates(d.select($"lang", $"n_toks"))), Seq("lang"))
      .filter(idBucket($"doc_id") < $"keep_pct")
      .select($"doc_id", $"lang", $"n_toks", $"keep_pct")
      .orderBy($"doc_id")
  }

  /** x16 — train/eval contamination check: split the corpus
    * deterministically (id-hash bucket < 10 ⇒ eval), hash every
    * 8-token shingle, and report, per eval doc, how many of its
    * shingles appear anywhere in train. The decontamination gate every
    * LLM data pipeline runs before training.
    *
    * Scale shape: distinct train shingles are one hash shuffle; the
    * eval⋉train probe is a LEFT SEMI equi-join on the shingle hash
    * (bounded by eval's shingle count, never |eval|×|train|); the
    * per-doc rollup is one more hash aggregate. Docs shorter than the
    * shingle width contribute their full text as one shingle, so every
    * eval doc is scored (zero-hit docs included via left join).
    */
  def x16Contamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", idBucket($"doc_id").as("bucket"),
        TextFns.tokenize($"text").as("toks"))
    val sh = d.select($"doc_id", $"bucket", explode(expr(
        "CASE WHEN size(toks) >= 8 THEN" +
          " transform(sequence(1, size(toks) - 7), i -> md5(concat_ws(' ', slice(toks, i, 8))))" +
          " ELSE array(md5(concat_ws(' ', toks))) END")).as("sh"))
      .distinct()
    val trainSh = sh.filter($"bucket" >= 10).select($"sh").distinct()
    val evalSh = sh.filter($"bucket" < 10).select($"doc_id", $"sh")
    val hits = evalSh.join(trainSh, Seq("sh"), "left_semi")
      .groupBy($"doc_id").agg(cnt.as("n_hit"))
    evalSh.groupBy($"doc_id").agg(cnt.as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id", $"n_shingles",
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        (coalesce($"n_hit", lit(0L)).cast(DoubleType) / $"n_shingles")
          .as("contamination"))
      .orderBy($"doc_id")
  }

  /** x37 — inter-source overlap matrix: for every source pair, how
    * many distinct 8-token shingles they share and the Jaccard of
    * their shingle sets — the crawl-redundancy audit that decides
    * which sources to drop or down-weight before paying dedup over the
    * union (two crawls of the same site show up here long before
    * MinHash runs).
    *
    * Scale shape: distinct (source, shingle) pairs are one hash
    * shuffle; the pair counts come from a self-equi-join ON THE
    * SHINGLE HASH (bounded by shingle multiplicity across sources,
    * never |A|×|B| rows), and the output is O(sources²) — scheduler
    * sized. Same shingle transform as x16, so the two audits share
    * semantics.
    */
  def x37SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .select($"source", TextFns.tokenize($"text").as("toks"))
      .select($"source", explode(expr(Shingle8Sql)).as("sh"))
      .distinct()
    graft.Caching.withPersisted(sh) { ss =>
      val totals = ss.groupBy($"source").agg(cnt.as("n_sh"))
      val shared = ss.as("a")
        .join(ss.as("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(cnt.as("shared"))
      shared
        .join(totals.select($"source".as("src_a"), $"n_sh".as("n_a")), Seq("src_a"))
        .join(totals.select($"source".as("src_b"), $"n_sh".as("n_b")), Seq("src_b"))
        .select($"src_a", $"src_b", $"shared",
          ($"shared".cast(DoubleType) /
            ($"n_a" + $"n_b" - $"shared").cast(DoubleType)).as("jaccard"))
        .orderBy($"src_a", $"src_b")
    }
  }

  /** x17 — vocabulary stats: top-10 tokens per language by frequency,
    * with per-language token and vocab totals (the tokenizer-training
    * / corpus-audit view).
    *
    * Top-k is TWO-PHASE: counts first rank within (lang, salt) groups
    * — 32-way parallel, no single reducer sees a whole language — and
    * only the ≤ 32·k salt winners meet the final per-lang ranking. A
    * single window over `lang` would sort every (lang, token) count
    * row through 5 reducers at a billion-token vocabulary; the salted
    * pre-rank is equivalent because a global top-k row is necessarily
    * in its salt group's top-k (same total order).
    */
  def x17VocabTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "documents")
      .select($"lang", explode(TextFns.tokenize($"text")).as("tok"))
      .groupBy($"lang", $"tok").agg(cnt.as("cnt"))
    val stats = counts.groupBy($"lang")
      .agg(sum($"cnt").cast(LongType).as("lang_tokens"), cnt.as("lang_vocab"))
    saltedTopK(counts, Seq($"lang"), $"tok", $"cnt", "rank", 10)
      .join(stats, Seq("lang"))
      .select($"lang", $"rank", $"tok", $"cnt", $"lang_tokens", $"lang_vocab")
      .orderBy($"lang", $"rank")
  }

  /** Salted two-phase top-k (shared by x17/x23/x24): counts first rank
    * within (partCols, salt) groups — 32-way parallel, no single
    * reducer sees a whole partition's item space — and only the
    * ≤ 32·k salt winners meet the final ranking. Equivalent to the
    * single-window form because a global top-k row is necessarily in
    * its salt group's top-k (same total order: key desc, id asc).
    */
  private def saltedTopK(df: DataFrame, partCols: Seq[Column], id: Column,
      key: Column, rankName: String, k: Int): DataFrame = {
    val localW = Window
      .partitionBy(partCols :+ pmod(hash(id), lit(32)): _*)
      .orderBy(key.desc, id)
    // the final ranking sees ≤ 32·k salt winners — a deliberate
    // small-table global window; the constant-valued but non-foldable
    // partition key (pmod(hash,1) ≡ 0) keeps the semantics and
    // silences the WindowExec single-partition warning, so an
    // engine-side CORPUS-wide window can never hide in noisy logs
    val globalW =
      if (partCols.isEmpty)
        Window.partitionBy(pmod(hash(id), lit(1))).orderBy(key.desc, id)
      else Window.partitionBy(partCols: _*).orderBy(key.desc, id)
    df.withColumn("_lr", row_number().over(localW)).filter(col("_lr") <= k)
      .withColumn(rankName, row_number().over(globalW).cast(LongType))
      .filter(col(rankName) <= k)
      .drop("_lr")
  }

  /** x22 — corpus length distribution: exact per-language p50/p90/p99
    * of document length (chars), the audit view behind every length
    * filter threshold. Exact `percentile` is a sort-based aggregate —
    * fine per language group; the sketch alternative for truly
    * unbounded groups is `approx_percentile` (same shape as Q10's
    * exact/approx distinct pair).
    */
  def x22LengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy($"lang")
      .agg(cnt.as("n_docs"),
        expr("percentile(n_chars, array(0.5D, 0.9D, 0.99D))").as("q"))
      .select($"lang", $"n_docs",
        element_at($"q", 1).as("p50"),
        element_at($"q", 2).as("p90"),
        element_at($"q", 3).as("p99"))
      .orderBy($"lang")
  }

  /** x23 — BPE merge-candidate mining: corpus-wide adjacent-pair
    * frequencies, the statistic every byte-pair-encoding tokenizer
    * training round maximizes. Pairs are built INSIDE the row (same
    * index-transform as x18 — no self-join of a positional token
    * table), then one map-side-combined count and the salted two-phase
    * top-k from x17 (no single reducer ever sees the full pair
    * vocabulary).
    */
  def x23BpePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "documents")
      .select(TextFns.tokenize($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat_ws(' ', toks[i-1], toks[i]))")).as("pair"))
      .groupBy($"pair").agg(cnt.as("cnt"))
    saltedTopK(counts, Nil, $"pair", $"cnt", "rank", 20)
      .select($"rank", $"pair", $"cnt")
      .orderBy($"rank")
  }

  /** x18 — intra-document repetition scoring (the Gopher/MassiveText
    * repetition-filter family): fraction of duplicate 2-grams and the
    * most-frequent-token share, per document. Catches the
    * boilerplate/spam pages inter-document dedup can't (a UNIQUE page
    * that repeats its own nav bar 50 times).
    *
    * Scale shape: the 2-gram stats are computed INSIDE the row
    * (transform over an index sequence + array_distinct — no explode,
    * no shuffle); the token-frequency stats go through two hash
    * aggregates with map-side combine. Nothing is quadratic in
    * document length except the row-local distinct.
    */
  def x18Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
    val bigr = d.withColumn("bg",
        when(size($"toks") >= 2, expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> concat_ws(' ', toks[i-1], toks[i]))"))
          .otherwise(expr("CAST(array() AS array<string>)")))
      .select($"doc_id",
        size($"bg").cast(LongType).as("n_2g"),
        (size($"bg") - size(array_distinct($"bg"))).cast(LongType).as("n_dup_2g"))
    val tokStats = d.select($"doc_id", explode($"toks").as("tok"))
      .groupBy($"doc_id", $"tok").agg(cnt.as("n"))
      .groupBy($"doc_id").agg(
        sum($"n").cast(LongType).as("n_toks"),
        max($"n").cast(LongType).as("top_tok_n"))
    val dup2gRatio =
      when($"n_2g" > 0, $"n_dup_2g".cast(DoubleType) / $"n_2g").otherwise(lit(0.0))
    val topTokRatio = $"top_tok_n".cast(DoubleType) / $"n_toks"
    bigr.join(tokStats, Seq("doc_id"))
      .select($"doc_id", $"n_2g", $"n_dup_2g", $"n_toks", $"top_tok_n",
        dup2gRatio.as("dup_2gram_ratio"),
        topTokRatio.as("top_tok_ratio"),
        (dup2gRatio > 0.2 || topTokRatio > 0.2).cast(LongType)
          .as("repetition_flag"))
      .orderBy($"doc_id")
  }

  /** x19 — PII scrubbing battery over [[graft.functions.Sanitize.scrubPii]]:
    * emails, card numbers, IPv4s, phone numbers → typed placeholders,
    * plus per-row redaction counts. The synthetic corpus carries no
    * PII, so (q23-style) the dirty text is CONSTRUCTED
    * deterministically from customer rows — the scrubber itself is the
    * operator under test, and it is a pure row-local regexp chain
    * (codegen'd, no shuffle, linear in bytes — the only shape that
    * survives 100 TB of raw text).
    */
  def x19PiiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val id4 = lpad(pmod($"c_custkey", lit(10000)).cast(StringType), 4, "0")
    val dirty = concat(
      lit("user"), $"c_custkey".cast(StringType),
      lit("@example.com said call +1-555-"), id4,
      lit(" or pay 4242 4242 4242 "), id4,
      lit(" from 10.0."), pmod($"c_custkey", lit(256)).cast(StringType),
      lit(".99 re "), $"c_mktsegment")
    c.select($"c_custkey", Sanitize.scrubPii(dirty).as("scrubbed"))
      .select($"c_custkey", $"scrubbed",
        regexp_count($"scrubbed", lit("<EMAIL>")).cast(LongType).as("n_emails"),
        regexp_count($"scrubbed", lit("<CARD>")).cast(LongType).as("n_cards"),
        regexp_count($"scrubbed", lit("<IP>")).cast(LongType).as("n_ips"),
        regexp_count($"scrubbed", lit("<PHONE>")).cast(LongType).as("n_phones"))
      .orderBy($"c_custkey")
  }

  /** x20 — incremental (cross-run) dedup via
    * [[graft.operators.BloomIncrementalDedup]]: the corpus splits
    * deterministically into "history" (id bucket ≥ 50) and "incoming"
    * (bucket < 50); incoming docs whose 8-token-prefix fingerprint
    * already exists in history are dropped. Bloom-route + exact
    * verify — result is exact (oracle = plain NOT IN), the sketch only
    * decides which rows pay the anti-join shuffle.
    */
  def x20BloomDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", idBucket($"doc_id").as("bucket"),
        md5(concat_ws(" ", slice(TextFns.tokenize($"text"), 1, 8))).as("fp8"))
    val hist = d.filter($"bucket" >= 50).select($"fp8")
    val inc = d.filter($"bucket" < 50).select($"doc_id", $"fp8")
    graft.operators.BloomIncrementalDedup.newRows(inc, hist, "fp8")
      .orderBy($"doc_id")
  }

  // --------------------------------------------- packing & lake history

  /** Tokens per packed training sequence (x31). */
  val SeqPackBudget = 512L

  /** Doc-id range width for the x31 two-phase prefix sum: buckets are
    * `doc_id DIV 4096`, so the bucket-totals table is 4096× smaller
    * than the corpus.
    */
  val SeqPackBucketWidth = 4096L

  /** x31 — sequence packing: assign every document its slice of the
    * fixed-length training sequences produced by concatenating the
    * corpus in doc_id order and chunking every [[SeqPackBudget]]
    * tokens — the standard "concat-then-chunk" batch layout for LLM
    * pre-training (documents may span sequence boundaries). Output per
    * doc: its token count, the first sequence it lands in, the offset
    * inside that sequence, and how many sequences it touches.
    *
    * The global token prefix-sum is TWO-PHASE, never a global sort:
    * docs prefix-sum inside fixed doc_id ranges ([[SeqPackBucketWidth]]
    * ids per bucket — a partition-parallel window), and the per-bucket
    * totals, 4096× fewer rows than the corpus, roll up through one
    * small ordered window whose result broadcast-joins back by bucket
    * id. At 1e9 docs the bucket table is ~250k rows (one executor's
    * window); recurse the same split once more if even that is too
    * wide. The naive `Window.orderBy(doc_id)` over the corpus would
    * funnel all 100 TB through a single reducer. All arithmetic is
    * integer `DIV`/`%` — no double division that could lose precision
    * past 2^53 tokens.
    */
  def x31SeqPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packedDocs(s, dir)
      .select($"doc_id", $"n_toks",
        expr(s"start_off DIV $SeqPackBudget").as("seq_first"),
        ($"start_off" % SeqPackBudget).as("seq_off"),
        when($"n_toks" === 0L, lit(0L)).otherwise(
          expr(s"(cum - 1) DIV $SeqPackBudget") -
            expr(s"start_off DIV $SeqPackBudget") + 1L).as("n_seqs"))
      .orderBy($"doc_id")
  }

  /** The x31/x35 packing core: every doc with its token count and
    * global [start_off, cum) token span, via the two-phase prefix sum
    * (see [[x31SeqPack]]'s scaladoc for the 100 TB rationale). No
    * output ordering — callers aggregate or sort as they need.
    */
  private def packedDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id",
        size(TextFns.tokenize($"text")).cast(LongType).as("n_toks"),
        expr(s"doc_id DIV $SeqPackBucketWidth").as("bucket"))
    // two consumers of the tokenized frame (local windows + offsets
    // rollup) — persist for one action so the scan+tokenize pass runs
    // once, not twice (the tokIndex/x02 convention)
    graft.Caching.withPersisted(d) { dd =>
      val localW = Window.partitionBy($"bucket").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // bucket-offset rollup: corpus/4096 rows through one ordered
      // window, constant-partitioned (see saltedTopK note)
      val offW = Window.partitionBy(pmod(hash($"bucket"), lit(1)))
        .orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = dd.groupBy($"bucket").agg(sum($"n_toks").as("btoks"))
        .withColumn("off", coalesce(sum($"btoks").over(offW), lit(0L)))
        .select($"bucket", $"off")
      dd.withColumn("local_cum", sum($"n_toks").over(localW))
        .join(broadcast(offsets), Seq("bucket"))
        .withColumn("cum", $"local_cum" + $"off")
        .withColumn("start_off", $"cum" - $"n_toks")
        .select($"doc_id", $"n_toks", $"start_off", $"cum")
    }
  }

  /** x35 — packed-sequence assembly stats: x31's doc→sequence map
    * aggregated per training sequence — how many docs land in each
    * sequence, how many tokens it holds, and its fill ratio. Proves
    * the packing end-to-end: every sequence is exactly
    * [[SeqPackBudget]] tokens except the final partial one (the
    * QueriesSpec invariant).
    *
    * Each doc explodes into only the sequences it touches (n_seqs is
    * 1–2 for typical doc lengths — the explode is O(corpus tokens /
    * budget), never quadratic); the per-sequence rollup is one hash
    * aggregate keyed by seq_id. The fill division is long→double by a
    * power of two — exactly-rounded IEEE, oracle-safe.
    */
  def x35SeqStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = SeqPackBudget
    packedDocs(s, dir)
      .filter($"n_toks" > 0L)
      .select($"start_off", $"cum".as("end_off"),
        explode(sequence(expr(s"start_off DIV $b"), expr(s"(cum - 1) DIV $b")))
          .as("seq_id"))
      .withColumn("contrib",
        least($"end_off", ($"seq_id" + 1L) * b) -
          greatest($"start_off", $"seq_id" * b))
      .groupBy($"seq_id")
      .agg(cnt.as("n_docs"), sum($"contrib").as("n_tokens"))
      .withColumn("fill", $"n_tokens".cast(DoubleType) / b.toDouble)
      .orderBy($"seq_id")
  }

  /** x32 — SCD2 change history: every (user_id, event_type) key's
    * event versions as slowly-changing-dimension rows with
    * [valid_from, valid_to) ranges — valid_to is the next version's
    * timestamp, NULL while current. The lake-history view of the
    * reference's daily keep-latest upsert (H5, `main_extractor.py`
    * daily mode): Q19 keeps only the winner, x32 keeps the full
    * lineage (time travel / audit).
    *
    * One key-partitioned window — a single shuffle on the upsert key,
    * per-key bounded state, no global ordering anywhere (the final
    * ORDER BY is the determinism contract, not the algorithm).
    */
  def x32Scd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts", $"event_id")
    events(s, dir)
      .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .select($"user_id", $"event_type", $"version", $"event_id",
        date_format($"ts", F6).as("valid_from"),
        date_format($"valid_to", F6).as("valid_to"),
        $"valid_to".isNull.as("is_current"), $"value")
      .orderBy($"user_id", $"event_type", $"version")
  }

  /** x33 — snapshot diff: what changed between two builds of a
    * 3-day-retention hot view of the lake (only keys active in the
    * trailing window survive a build — the TTL'd serving-cache shape).
    * Snapshot A = keep-latest over events in [Jan 1, Jan 4); snapshot
    * B = the same view rebuilt for [Jan 27, Jan 30). A FULL OUTER join
    * on the entity key classifies every key: `added` (B only),
    * `removed` (A only — aged out), `changed` (both sides present,
    * different winning row); `unchanged` keys are dropped. This is the
    * CDC view an incremental consumer diffs against, and the audit for
    * the reference's H5 re-fetch-updated-entities mode.
    *
    * Each snapshot is one key-partitioned keep-latest window (Q19's
    * shape) over a partition-pruned slice of the lake; the diff is a
    * single equi-join on the same key, so the join reuses the windows'
    * hash partitioning — no extra shuffle, no global sort, nothing on
    * the driver.
    */
  def x33SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def snap(from: String, until: String, tag: String): DataFrame = {
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      events(s, dir)
        .filter($"ts" >= lit(from).cast(TimestampType) &&
          $"ts" < lit(until).cast(TimestampType))
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id".as(s"${tag}_event_id"))
    }
    val a = snap("2024-01-01", "2024-01-04", "old")
    val b = snap("2024-01-27", "2024-01-30", "new")
    a.join(b, Seq("user_id", "event_type"), "full_outer")
      .withColumn("change_type",
        when($"new_event_id".isNull, lit("removed"))
          .when($"old_event_id".isNull, lit("added"))
          .when($"old_event_id" =!= $"new_event_id", lit("changed"))
          .otherwise(lit("unchanged")))
      .filter($"change_type" =!= "unchanged")
      .select($"user_id", $"event_type", $"change_type",
        $"old_event_id", $"new_event_id")
      .orderBy($"user_id", $"event_type")
  }

  /** x36 — mergeable distinct-count sketch store: per-(day, type) HLL
    * sketches (the storable daily granule), unioned per event_type and
    * estimated — "distinct users over any day range" WITHOUT
    * rescanning raw events. q10 shows one approx aggregate; x36 is the
    * lakehouse pattern around it: daily sketch partials persist next
    * to the partition they summarize, and any range query is a
    * sketch merge — O(days × types) sketch BYTES instead of a full
    * shuffle of raw user ids. At 100 TB that is the difference between
    * answering a 90-day distinct query from ~KBs of sketches and
    * re-aggregating three months of events.
    *
    * The estimate is approximate by design, so the driver-checkable
    * output carries the BOUND: `approx_ok` asserts the merged-sketch
    * estimate lands within 5% of the exact distinct — hash-matchable
    * by a constant-true oracle column (the exact twin join is the
    * correctness harness only; production range queries read the
    * sketch estimate and never touch raw events). QueriesSpec pins
    * the same error bound.
    */
  def x36SketchStore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val merged = daily.groupBy($"event_type")
      .agg(cnt.as("n_days"),
        hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"))
    val exact = events(s, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select($"event_type", $"n_days",
        (abs($"approx_users" - $"exact_users") <=
          lit(0.05) * $"exact_users").as("approx_ok"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- multimodal

  /** x11 — multimodal binary-column plumbing: documents → binary assets
    * → partition-mapped (stub) decode → typed features. See
    * [[graft.operators.Multimodal]].
    */
  def x11Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(t(s, dir, "documents"))
      .toDF()
      .select($"doc_id", $"mime", $"byte_len", $"content_hash",
        $"fake_width", $"fake_height")
      .orderBy($"doc_id")
  }

  /** x11b — A8 end-to-end with a REAL `binaryFile` read: write an
    * on-disk asset fixture from the documents table (executor-side),
    * ingest it back through `spark.read.format("binaryFile")`, and run
    * the same partition-mapped decode as x11. Features are
    * deterministic functions of the content bytes, so the oracle
    * recomputes them straight from `documents` — a broken file write,
    * listing, or content round-trip hash-mismatches.
    */
  def x11bBinaryAssets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fixture = scratchDir(s, "x11b", dir)
    Multimodal.writeAssetFiles(t(s, dir, "documents"), fixture)
    Multimodal.extractFeaturesFromFiles(s, fixture)
      .toDF()
      .select($"doc_id", $"mime", $"byte_len", $"content_hash",
        $"fake_width", $"fake_height")
      .orderBy($"doc_id")
  }

  /** x66 — frame sampling over the binary asset column (the video leg
    * of the multimodal surface): each payload decodes (stub) to a
    * deterministic frame count and a uniform stride keeps ≤ 8 frames
    * per asset — the bounded 1-to-N fan-out a clip sampler must
    * guarantee so stage output stays ≤ 8 × assets at any clip length.
    * Runs as a typed `mapPartitions` (codec context per PARTITION);
    * the oracle replays count/stride/hash integer-exactly.
    */
  def x66FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.assetsFromDocuments(t(s, dir, "documents"))
      .mapPartitions(Multimodal.frameSampleStub(8))
      .toDF()
      .select($"doc_id", $"frame_idx", $"ts_ms", $"frame_hash")
      .orderBy($"doc_id", $"frame_idx")
  }

  /** x67 — aspect-fit resize over decoded asset features (the image
    * leg): integer-exact fit of the stub dimensions into 224×224, the
    * training-resolution normalize step. Chains decode → resize as two
    * partition-mapped typed stages with no shuffle between them (both
    * are row-local; only the output ORDER BY exchanges).
    */
  def x67Resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.extractFeatures(t(s, dir, "documents"))
      .mapPartitions(Multimodal.resizeStub(224L))
      .toDF()
      .select($"doc_id", $"fake_width", $"fake_height",
        $"out_w", $"out_h", $"thumb_hash")
      .orderBy($"doc_id")
  }

  /** x69 — STREAMING asset ingest (multimodal × H): the x11b fixture
    * is consumed as an unbounded `binaryFile` readStream decoding
    * through the SAME partition-mapped stub as the batch path, 64
    * files per trigger (so the 200-file fixture takes 4 micro-batches
    * — the incremental path is actually exercised, not a single-batch
    * degenerate). Q28's run-to-completion pattern makes it
    * oracle-gated: the decode is stateless and per-file, so the
    * drained stream must equal the batch decode row-for-row — the
    * oracle is x11b's SQL verbatim. StreamingSpec additionally pins
    * true INCREMENTAL arrival (files appearing between triggers,
    * seen-path exactly-once).
    */
  def x69AssetStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fixture = scratchDir(s, "x69", dir)
    Multimodal.writeAssetFiles(t(s, dir, "documents"), fixture)
    val name = "x69_sink_" + System.nanoTime()
    val q = Multimodal.streamAssetFeatures(s, fixture, maxFilesPerTrigger = 64)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try { q.processAllAvailable() } finally { q.stop() }
    // copy the drained sink out and DROP the uniquely-named temp view —
    // otherwise every invocation (Bench runs each key 4x per sweep)
    // leaks a catalog entry + MemorySink for the session's lifetime.
    // The copy is harness-sized (one row per fixture asset, cap 200).
    val drained = s.table(name)
    val local = s.createDataFrame(
      java.util.Arrays.asList(drained.collect(): _*), drained.schema)
    s.catalog.dropTempView(name)
    local
      .select($"doc_id", $"mime", $"byte_len", $"content_hash",
        $"fake_width", $"fake_height")
      .orderBy($"doc_id")
  }

  /** x68 — audio features over the binary asset column (the audio leg,
    * completing image/audio/video): duration, 4:1 resample geometry,
    * and a VAD-shaped windowed silence rollup, one row per clip.
    * Unlike x66's bounded 1-to-N explosion, the window sweep stays
    * INSIDE the row (only CPU grows with clip length; output is sized
    * by input rows) — the two shapes bracket how multimodal stages
    * scale. Typed mapPartitions; integer-exact oracle replay.
    */
  def x68AudioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.assetsFromDocuments(t(s, dir, "documents"))
      .mapPartitions(Multimodal.audioFeatureStub)
      .toDF()
      .select($"doc_id", $"n_samples", $"duration_ms", $"n_rs", $"rs_hash",
        $"n_windows", $"n_silent")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- corpus curation & analytics

  /** x38 — C4/Gopher-style quality filter cascade: every document gets
    * a keep/drop verdict plus the FIRST failing rule (the audit trail a
    * curation pipeline needs to explain "why did this doc drop" and to
    * tune one rule without re-running the rest). Rules, in order:
    * too_short (<16 tokens), tok_shape (mean token length outside
    * [3.8, 5.2]), low_diversity (distinct-token ratio < 0.32),
    * high_stopword (stopword ratio > 0.125) — thresholds sit at the
    * ~5% tails of the corpus distributions.
    *
    * Scale shape: every feature is row-local (array ops inside
    * whole-stage codegen) — no join, no aggregate, ONE pass that
    * pipelines with the scan; at 100 TB this is pure map throughput.
    */
  /** Cascade feature columns over a frame carrying (toks, n_chars):
    * adds n_toks / avg_tok_len / diversity / stop_ratio. Shared by
    * x38's rule battery and x49's stage-1 predicate so the two can
    * never drift.
    */
  private def withCascadeFeatures(df: DataFrame): DataFrame =
    df.withColumn("n_toks", size(col("toks")).cast(LongType))
      .withColumn("avg_tok_len",
        (col("n_chars").cast(DoubleType) - (size(col("toks")) - 1)) /
          size(col("toks")))
      .withColumn("diversity",
        size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks")))
      .withColumn("stop_ratio",
        TextFns.markerCount("toks", TextFns.Stopwords).cast(DoubleType) /
          size(col("toks")))

  /** x38's keep predicate (the conjunction of every rule passing). */
  private def cascadeKeep: Column =
    col("n_toks") >= 16 &&
      col("avg_tok_len") >= 3.8 && col("avg_tok_len") <= 5.2 &&
      col("diversity") >= 0.32 && col("stop_ratio") <= 0.125

  def x38FilterCascade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withCascadeFeatures(t(s, dir, "documents")
        .withColumn("toks", TextFns.tokenize($"text")))
      .select($"doc_id", $"n_toks", $"avg_tok_len", $"diversity", $"stop_ratio")
      .withColumn("fail_rule",
        when($"n_toks" < 16, "too_short")
          .when($"avg_tok_len" < 3.8 || $"avg_tok_len" > 5.2, "tok_shape")
          .when($"diversity" < 0.32, "low_diversity")
          .when($"stop_ratio" > 0.125, "high_stopword"))
      .withColumn("keep", $"fail_rule".isNull.cast(IntegerType))
      .orderBy($"doc_id")
  }

  /** x39 — per-source data card: the datasheet row every corpus audit
    * publishes per source — volume (docs, tokens), language profile
    * (distinct langs + dominant lang), exact duplicate rate, and length
    * shape (mean + p50/p90 chars).
    *
    * Scale shape: one hash aggregate keyed on source carries all the
    * distributive stats (count / sum / two exact COUNT DISTINCTs /
    * exact percentiles); the dominant language is a second tiny
    * aggregate over (source, lang) reduced with `min_by` and broadcast
    * back. Output is O(sources).
    */
  def x39DataCard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"source", $"lang", $"n_chars",
        size(TextFns.tokenize($"text")).cast(LongType).as("n_toks"),
        md5($"text").as("h"))
    val card = d.groupBy($"source").agg(
      cnt.as("n_docs"),
      sum($"n_toks").as("total_toks"),
      countDistinct($"h").as("uniq"),
      countDistinct($"lang").as("n_langs"),
      sum($"n_chars").as("sum_chars"),
      expr("percentile(n_chars, array(0.5D, 0.9D))").as("q"))
    // dominant language: highest doc count, ties to the smallest lang
    // code (min_by over (-n, lang) needs no window)
    val topLang = d.groupBy($"source", $"lang").agg(cnt.as("n"))
      .groupBy($"source")
      .agg(min_by($"lang", struct((-$"n").as("nn"), $"lang")).as("top_lang"))
    card.join(broadcast(topLang), Seq("source"))
      .select($"source", $"n_docs", $"total_toks", $"n_langs", $"top_lang",
        (lit(1.0) - $"uniq".cast(DoubleType) / $"n_docs").as("dup_rate"),
        ($"sum_chars".cast(DoubleType) / $"n_docs").as("mean_chars"),
        element_at($"q", 1).as("p50_chars"),
        element_at($"q", 2).as("p90_chars"))
      .orderBy($"source")
  }

  /** Chunking geometry for x40: 32-token windows advancing by 24
    * (8-token overlap so a fact spanning a boundary survives in one
    * chunk whole — the standard RAG/pretrain chunking trade).
    */
  val ChunkWindow = 32
  val ChunkStride = 24

  /** x40 — overlapping chunk extraction: split every document into
    * fixed-size token windows with overlap and emit (chunk index,
    * start, actual length, content hash) — the doc→chunk explosion
    * that fronts embedding-index builds and context-window packing.
    * The chunk count is 1 + ceil(max(n-W,0)/S), so the tail is always
    * covered and a short doc yields exactly one partial chunk.
    *
    * Scale shape: row-local `sequence`+`explode` — no shuffle, no
    * state; output is ~n/S rows per doc, produced in the same pass
    * that scanned it.
    */
  def x40ChunkOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (w, st) = (ChunkWindow, ChunkStride)
    t(s, dir, "documents")
      .withColumn("toks", TextFns.tokenize($"text"))
      .withColumn("n", size($"toks"))
      .select($"doc_id", $"toks", $"n", explode(expr(
        s"sequence(0L, CAST(ceil(greatest(n - $w, 0) / $st.0) AS BIGINT))")).as("k"))
      .select($"doc_id", $"k".as("chunk_idx"),
        ($"k" * st + 1).as("start_pos"),
        least(lit(w.toLong), $"n" - $"k" * st).as("chunk_toks"),
        md5(concat_ws(" ", expr(s"slice(toks, CAST(k AS INT) * $st + 1, $w)")))
          .as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Curriculum tier cutpoints for x41 (the corpus quality-score
    * quartiles, pinned as config so the tiering is reproducible and
    * fp-exact on any engine — recompute offline when the corpus moves).
    */
  val CurriculumCuts: (Double, Double, Double) = (0.75, 0.67, 0.58)

  /** x41 — curriculum training order: a deterministic epoch shuffle
    * that serves the best-quality quartile first (tier 0) and within
    * each tier a seeded pseudo-random order — every doc gets a GLOBAL
    * position 1..N via [[graft.operators.GlobalOrder]] (bucket-offset
    * global index; never a single-partition `row_number` window —
    * PropertySpec proves the pattern equals the naive form on random
    * frames).
    */
  def x41Curriculum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (q3, q2, q1) = CurriculumCuts
    val keyed = qualityScored(s, dir)
      .select($"doc_id",
        when($"score" >= q3, 0L).when($"score" >= q2, 1L)
          .when($"score" >= q1, 2L).otherwise(3L).as("tier"),
        md5(concat(lit("epoch1:"), $"doc_id".cast(StringType))).as("skey"))
    graft.operators.GlobalOrder.withPosition(keyed, "tier", "skey", "doc_id")
      .select($"pos", $"doc_id", $"tier", $"skey")
      .orderBy($"pos")
  }

  /** x42 — ordered funnel (view → click → purchase): per user, the
    * first view, the first click AT OR AFTER that view, and the first
    * purchase at or after that click — the strict-ordering semantics
    * that separate a funnel from three independent mins (a click
    * before any view does not count).
    *
    * Scale shape: each stage is one filtered aggregate joined to the
    * previous stage's (user, ts) frame — all shuffles share the
    * user_id key, so AQE co-partitions the chain; no windows, no
    * event-list collection per user.
    */
  def x42Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir).select($"user_id", $"event_type", $"ts")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id"))
      .filter($"ts" >= $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts" >= $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .orderBy($"user_id")
  }

  /** x43 — weekly cohort retention: users grouped by first-activity
    * week, counted once per later activity week — the
    * (cohort, weeks-since) matrix behind every retention curve.
    *
    * Scale shape: first-seen week is one aggregate on user_id; the
    * join back is user_id-co-partitioned; the distinct + count is one
    * more hash shuffle on (cohort, week). No windows.
    */
  def x43Retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wk = events(s, dir)
      .select($"user_id", date_trunc("week", $"ts").as("wk"))
    val first = wk.groupBy($"user_id").agg(min($"wk").as("cohort"))
    wk.join(first, Seq("user_id"))
      .select($"cohort",
        expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").as("week_n"),
        $"user_id")
      .distinct()
      .groupBy($"cohort", $"week_n").agg(cnt.as("users"))
      .orderBy($"cohort", $"week_n")
  }

  /** x44 — boilerplate-phrase audit: the fraction of each document's
    * distinct 3-gram phrases that also appear in at least
    * max(2, 1% of corpus) OTHER documents — the repeated-content
    * signal (headers, footers, licence blurbs, nav text) that
    * line-level dedup pipelines strip before training. Phrase length
    * and the document-frequency threshold are the two knobs.
    *
    * Scale shape: distinct (doc, phrase) pairs are one hash shuffle;
    * document frequencies one more keyed on the phrase hash; the
    * boilerplate set joins back BY PHRASE (skew bounded by the df
    * threshold itself — a phrase's fan-out is its df), and the final
    * per-doc count re-shuffles on doc_id. No windows, no all-pairs.
    */
  def x44Boilerplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
    val sh = d.filter(size($"toks") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 2)," +
          " i -> md5(concat_ws(' ', slice(toks, i, 3))))")).as("sh"))
      .distinct()
    graft.Caching.withPersisted(sh) { ss =>
      val ndocs = d.agg(countDistinct($"doc_id").as("n_docs"))
      val boiler = ss.groupBy($"sh").agg(cnt.as("df"))
        .crossJoin(broadcast(ndocs))
        .filter($"df" >= greatest(lit(2L), ceil($"n_docs" * 0.01)))
        .select($"sh", lit(1L).as("is_b"))
      ss.join(boiler, Seq("sh"), "left")
        .groupBy($"doc_id")
        .agg(cnt.as("n_phrases"), sum(coalesce($"is_b", lit(0L))).as("n_boiler"))
        .select($"doc_id", $"n_phrases", $"n_boiler",
          ($"n_boiler".cast(DoubleType) / $"n_phrases").as("boiler_frac"))
        .orderBy($"doc_id")
    }
  }

  /** x45 — TF-IDF keyword extraction: top-3 terms per document by
    * tf · N/df. The idf is the RATIONAL form N/df, not log(N/df):
    * log goes through libm (whose last-ulp rounding differs between
    * engines and platforms) while tf·N is exact int64 and one IEEE
    * division is exactly rounded everywhere — same ranking, portable
    * bit-for-bit. Ties break on the term string.
    *
    * Scale shape: term frequencies and document frequencies are two
    * hash aggregates; the df join is keyed on the term (its fan-out is
    * the df itself); the per-doc top-3 window is PARTITIONED by doc_id
    * so WindowGroupLimit keeps 3 rows per group map-side — no global
    * sort, no single-partition stage.
    */
  def x45TfidfKeywords(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val tf = docs
      .select($"doc_id", explode(TextFns.tokenize($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(cnt.as("tf"))
    val dfs = tf.groupBy($"tok").agg(cnt.as("df"))
    val ndocs = docs.agg(cnt.as("n_docs"))
    val rk = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"score".desc, $"tok"))
    tf.join(dfs, Seq("tok"))
      .crossJoin(broadcast(ndocs))
      .withColumn("score", ($"tf" * $"n_docs").cast(DoubleType) / $"df")
      .withColumn("rk", rk.cast(LongType))
      .filter($"rk" <= 3)
      .select($"doc_id", $"rk", $"tok", $"tf", $"df", $"score")
      .orderBy($"doc_id", $"rk")
  }

  /** x46 — event-volume anomaly detection: per event type, flag days
    * whose count sits more than 2 standard deviations from that type's
    * daily mean — the ingest-health tripwire that catches a broken
    * emitter or a replayed day before it poisons downstream stats.
    *
    * Portability shape: mean and variance come from the EXACT integer
    * (count, sum, sum-of-squares) triple — never a streaming stddev
    * whose float accumulation order varies with partitioning — and the
    * double arithmetic on top is the same expression tree the oracle
    * runs, so the z-scores hash-match. Degenerate groups (one day, or
    * zero variance) report z = 0 rather than dividing by zero.
    *
    * Scale shape: daily counts are one hash aggregate; the per-type
    * stats reduce ~365 rows per type and broadcast back. Nothing else
    * moves.
    */
  def x46VolumeAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = events(s, dir)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(cnt.as("n"))
    val stats = daily.groupBy($"event_type")
      .agg(cnt.as("d"), sum($"n").as("s"), sum($"n" * $"n").as("q"))
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("mean", $"s".cast(DoubleType) / $"d")
      .withColumn("variance",
        when($"d" > 1,
          ($"q".cast(DoubleType) - $"s".cast(DoubleType) * $"s" / $"d") /
            ($"d" - 1))
          .otherwise(lit(0.0)))
      .withColumn("z",
        when($"variance" > 0.0, ($"n" - $"mean") / sqrt($"variance"))
          .otherwise(lit(0.0)))
      .select($"event_type", $"day", $"n", $"mean", $"z",
        (abs($"z") > 2.0).cast(IntegerType).as("is_spike"))
      .orderBy($"event_type", $"day")
  }

  /** Document-frequency cap for x47: shingles present in more than
    * this many documents are dropped before pairing. A ubiquitous
    * shingle contributes df² candidate pairs; capping df bounds the
    * self-join's output per key — the standard trick that keeps
    * containment mining sub-quadratic on web corpora.
    */
  val ContainmentDfCap = 100L

  /** 8-token shingle transform over a `toks` column (short docs fall
    * back to one whole-doc shingle) — shared by x37/x47/x49 so the
    * three audits agree on what a "shingle" is.
    */
  private val Shingle8Sql =
    "CASE WHEN size(toks) >= 8 THEN" +
      " transform(sequence(1, size(toks) - 7), i -> md5(concat_ws(' ', slice(toks, i, 8))))" +
      " ELSE array(md5(concat_ws(' ', toks))) END"

  /** Shared x47/x49 core: containment pairs ≥ 0.5 over df-capped
    * 8-token shingles of `docs` (doc_id, toks). Columns:
    * (d1, d2, n1, n2, shared, containment).
    */
  private def containmentPairs(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(expr(Shingle8Sql)).as("sh"))
      .distinct()
    graft.Caching.withPersisted(sh) { ss =>
      val sizes = ss.groupBy(col("doc_id")).agg(cnt.as("n"))
      val rare = ss.groupBy(col("sh")).agg(cnt.as("df"))
        .filter(col("df") <= ContainmentDfCap).select(col("sh"))
      val indexed = ss.join(rare, Seq("sh"))
      indexed.as("a")
        .join(indexed.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(cnt.as("shared"))
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .withColumn("containment",
          col("shared").cast(DoubleType) / least(col("n1"), col("n2")))
        .filter(col("containment") >= 0.5)
    }
  }

  /** x47 — near-containment detection: pairs where the SMALLER
    * document's 8-token shingle set is ≥50% covered by the larger's
    * (overlap coefficient `shared / min(|A|,|B|)`). This is the
    * asymmetric complement to Jaccard dedup (x04): a short doc quoted
    * wholesale inside a long one scores low Jaccard but containment
    * ~1, so MinHash never flags it.
    *
    * Scale shape: same index-join discipline as x37 — pairs only
    * materialize through a shared shingle hash (bounded per key by
    * [[ContainmentDfCap]]²), sizes join back by doc, and the exact
    * coefficient is computed on candidates only. No all-pairs stage.
    */
  def x47Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    containmentPairs(t(s, dir, "documents")
        .select($"doc_id", TextFns.tokenize($"text").as("toks")))
      .select($"d1", $"d2", $"n1", $"n2", $"shared", $"containment")
      .orderBy($"d1", $"d2")
  }

  /** x48 — click attribution: each purchase's value is split linearly
    * across the same user's clicks in the trailing 30 minutes, and the
    * most recent qualifying click is flagged as the last-touch winner —
    * the two attribution models every ads report ships side by side
    * (the batch form of the stream-stream interval join in
    * `streaming/Events.purchaseClickJoin`).
    *
    * Scale shape: the purchase×click pairing is a user_id equi-join
    * with the 30-minute range as a post-condition (never a time-range
    * cartesian); the per-purchase click count is one aggregate joined
    * back on purchase_id, and the last-touch flag is a
    * purchase-partitioned WindowGroupLimit. Credit = value/n is one
    * exactly-rounded IEEE division, so the money column hash-matches.
    */
  def x48Attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("p_ts"), $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"ts".as("c_ts"))
    val joined = purchases.join(clicks,
      $"user_id" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 30 MINUTES") &&
        $"c_ts" <= $"p_ts")
    val counts = joined.groupBy($"purchase_id").agg(cnt.as("n_clicks"))
    val lastW = org.apache.spark.sql.expressions.Window
      .partitionBy($"purchase_id").orderBy($"c_ts".desc, $"click_id".desc)
    joined.join(counts, Seq("purchase_id"))
      .withColumn("is_last", (row_number().over(lastW) === 1).cast(IntegerType))
      .select($"purchase_id", $"click_id", $"user_id", $"n_clicks",
        ($"value" / $"n_clicks").as("credit"), $"is_last")
      .orderBy($"purchase_id", $"click_id")
  }

  /** x49 — curation pipeline funnel: the end-to-end composition every
    * training-data run reports — how many documents and tokens survive
    * each stage of quality filter (x38 rules) → exact dedup (x01
    * policy) → containment dedup (x47 pairs, smaller doc loses) →
    * per-source cap (top-20 by x08 score) → language mixture (x26
    * rates recomputed over the survivors). One row per stage.
    *
    * Beyond the audit itself, this is the composition proof: the six
    * stages chain as plain DataFrames with no materialization between
    * them — Catalyst sees one plan per stage count, each reusing the
    * same scan-side feature block. Every stage's survivor predicate is
    * what the standalone query of the same family asserts, so a
    * mismatch here localizes to one stage.
    */
  def x49PipelineFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = withCascadeFeatures(t(s, dir, "documents")
        .withColumn("toks", TextFns.tokenize($"text")))
      .withColumn("score",
        lit(0.4) * least($"n_toks" / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - $"stop_ratio") +
          lit(0.3) * least($"avg_tok_len" / 8.0, lit(1.0)))
      .select($"doc_id", $"lang", $"source", $"text", $"toks", $"n_toks",
        $"avg_tok_len", $"diversity", $"stop_ratio", $"score")
    // s1: quality filter — x38's rules as the shared predicate
    val s1 = base.filter(cascadeKeep)
    // s2: exact dedup — keep the min doc_id per content hash
    val keepers = s1.groupBy(md5($"text").as("h")).agg(min($"doc_id").as("doc_id"))
    val s2 = s1.join(keepers.select($"doc_id"), Seq("doc_id"), "left_semi")
    // s3: containment dedup — x47's shared pair core among the s2
    // survivors; the doc with FEWER shingles loses (tie: larger id)
    val losers = containmentPairs(s2.select($"doc_id", $"toks"))
      .select(when($"n1" < $"n2", $"d1").when($"n2" < $"n1", $"d2")
        .otherwise(greatest($"d1", $"d2")).as("doc_id"))
      .distinct()
    // losers feeds stages 3, 4 AND 5 of the union — persist the tiny
    // id set so the quadratic pair computation runs once, not 3x
    val s3 = graft.Caching.withPersisted(losers) { ls =>
      s2.join(ls, Seq("doc_id"), "left_anti")
    }
    // s4: per-source cap — top-20 by score (ties to the smaller id),
    // via the SAME salted two-phase helper as x30 so a hot source never
    // concentrates on one reducer and the two operators cannot drift
    // (VERDICT r6 wrong-#2)
    val s4 = saltedTopK(s3, Seq($"source"), $"doc_id", $"score", "_rk", 20)
      .drop("_rk")
    // s5: mixture — x26's shared rate grid recomputed over s4
    val s5 = s4.join(broadcast(mixtureRates(s4.select($"lang", $"n_toks"))),
        Seq("lang"))
      .filter(idBucket($"doc_id") < $"keep_pct")
    def stage(name: String, df: DataFrame) =
      df.agg(cnt.as("n_docs"), coalesce(sum($"n_toks"), lit(0L)).as("n_toks"))
        .select(lit(name).as("stage"), $"n_docs", $"n_toks")
    stage("0_raw", base)
      .unionAll(stage("1_quality", s1))
      .unionAll(stage("2_exact_dedup", s2))
      .unionAll(stage("3_containment", s3))
      .unionAll(stage("4_source_cap", s4))
      .unionAll(stage("5_mixture", s5))
      .orderBy($"stage")
  }

  /** x50 — leakage-safe train/val/test split (90/5/5): the split key is
    * the md5 bucket of the near-dup CLUSTER representative (x14's
    * connected-component label), not the document — so two
    * near-duplicates can never straddle train and eval, the
    * contamination channel a per-doc split leaves wide open. Same
    * deterministic 0–99 grid as x15/x26: reproducible on any cluster
    * size, oracle-replayable.
    *
    * Scale shape: one extra map over the cluster labels (the CC pass
    * is the cost, shared with x14/x29); the split itself is a pure
    * row-local bucket compare.
    */
  def x50LeakSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = conv(substring(md5($"cluster_id".cast(StringType)), 1, 4), 16, 10)
      .cast(LongType) % 100
    dedupClusterLabels(s, dir)
      .withColumn("bucket", bucket)
      .select($"doc_id", $"cluster_id",
        when($"bucket" < 90, "train").when($"bucket" < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  /** x51 — token-distribution drift monitor: split the corpus into two
    * deterministic halves (id-hash bucket < 50 vs rest — the same grid
    * every sampler uses) and surface the 20 tokens whose relative
    * frequency differs most between the halves, plus each side's
    * probabilities. On a healthy corpus the halves agree; a skewed
    * ingest, a bad shard, or train/serve skew shows up as mass moving
    * between specific tokens. Run it A/B on corpus-version pairs or
    * arrival-time halves — the split predicate is the only knob.
    *
    * Portability shape: probabilities are exact-int counts divided
    * once (IEEE-exact); drift = |p_a − p_b| needs no libm. Scale
    * shape: one token-keyed aggregate carrying both halves' counts
    * (two conditional sums — the split never scans twice), then the
    * salted two-phase top-k.
    */
  def x51TokenDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select((idBucket($"doc_id") < 50).as("in_a"),
        explode(TextFns.tokenize($"text")).as("tok"))
    val counts = toks.groupBy($"tok").agg(
      sum(when($"in_a", 1L).otherwise(0L)).as("n_a"),
      sum(when(!$"in_a", 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(sum($"n_a").as("t_a"), sum($"n_b").as("t_b"))
    val scored = counts.crossJoin(broadcast(totals))
      .withColumn("p_a", $"n_a".cast(DoubleType) / $"t_a")
      .withColumn("p_b", $"n_b".cast(DoubleType) / $"t_b")
      .withColumn("drift", abs($"p_a" - $"p_b"))
    saltedTopK(scored, Nil, $"tok", $"drift", "rank", 20)
      .select($"rank", $"tok", $"n_a", $"n_b", $"p_a", $"p_b", $"drift")
      .orderBy($"rank")
  }

  /** Segment geometry for x56: non-overlapping 3-token segments (the
    * "line" unit — this corpus has no newlines, so a fixed token run
    * stands in for C4's line). Doc-frequency ≥ 2 marks a segment as
    * cross-document boilerplate.
    */
  val SegTokens = 3
  val SegMinDf = 2L

  /** x56 — corpus-level segment dedup WITH rewrite (C4/CCNet line
    * dedup): split every document into non-overlapping token segments,
    * drop each segment whose exact text appears in ≥ [[SegMinDf]]
    * distinct documents, and REASSEMBLE the cleaned document in
    * original segment order. x44 only audits the boilerplate fraction;
    * this is the pipeline stage that actually strips it.
    *
    * Scale shape: segments are row-local (`sequence` + explode); the
    * doc-frequency pass is one aggregate keyed on the segment's md5
    * (fixed-width shuffle key); the doom flag joins back BY HASH with
    * fan-out = df (bounded: boilerplate is small relative to corpus);
    * reassembly is a doc_id-keyed aggregate whose per-group state is
    * one document — `sort_array(collect_list(struct(k, seg)))` orders
    * within the group, so there is NO window and no global sort.
    * Every doc survives (possibly with empty clean_text): the flag is
    * a left join, not a filter-then-regroup.
    */
  def x56SegmentDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = SegTokens
    val segs = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
      .select($"doc_id", explode(expr(
        s"sequence(0L, CAST(ceil(size(toks) / $w.0) AS BIGINT) - 1)")).as("k"),
        $"toks")
      .select($"doc_id", $"k",
        concat_ws(" ", expr(s"slice(toks, CAST(k AS INT) * $w + 1, $w)"))
          .as("seg_txt"))
      .withColumn("seg_h", md5($"seg_txt"))
    graft.Caching.withPersisted(segs) { sg =>
      val boiler = sg.groupBy($"seg_h")
        .agg(countDistinct($"doc_id").as("df"))
        .filter($"df" >= SegMinDf)
        .select($"seg_h", lit(true).as("is_b"))
      sg.join(boiler, Seq("seg_h"), "left")
        .withColumn("keep", $"is_b".isNull)
        .groupBy($"doc_id")
        .agg(cnt.as("n_segs"),
          sum(when($"keep", 1L).otherwise(0L)).as("kept_segs"),
          array_join(transform(
            sort_array(collect_list(when($"keep", struct($"k", $"seg_txt")))),
            p => p("seg_txt")), " ").as("clean_text"))
        .orderBy($"doc_id")
    }
  }

  /** x57 — n-gram LM familiarity score (the KenLM-perplexity-filter
    * shape of CCNet/RefinedWeb, exact-integer form): score every
    * document by how familiar its bigrams are to the corpus itself —
    * sum over the doc's bigram occurrences of that bigram's
    * corpus-wide count. Low familiarity ⇒ out-of-distribution or
    * garbled text; the bucket thresholds are the quality knobs.
    *
    * Portability shape: the score is a sum of exact BIGINT counts
    * (no log-probs — libm would break the DuckDB hash twin); the
    * average is one IEEE-exact integer division; the bucket compares
    * each doc to the CORPUS-MEAN familiarity by exact integer
    * cross-multiplication (sum·T_n vs n·T_s — avg familiarity is
    * scale-invariant on this corpus, so an absolute threshold would
    * stop discriminating at another SF). Scale shape: bigrams are
    * row-local; corpus counts are one aggregate keyed on the bigram's
    * md5; the doc side PRE-AGGREGATES to (doc, bigram, multiplicity)
    * before the count join, so join fan-out is document frequency,
    * not occurrence count (the difference on a hot bigram at 100 TB);
    * hot keys beyond that are AQE skew-join territory. Docs with < 2
    * tokens survive with n_bigrams = 0 via the final left join.
    */
  def x57LmQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id", TextFns.tokenize($"text").as("toks"))
    val bigs = d.filter(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat_ws(' ', slice(toks, i, 2)))")).as("big"))
      .withColumn("big_h", md5($"big"))
      .groupBy($"doc_id", $"big_h").agg(cnt.as("m"))
    val counts = bigs.groupBy($"big_h").agg(sum($"m").as("c"))
    val scored = bigs.join(counts, Seq("big_h"))
      .groupBy($"doc_id")
      .agg(sum($"m").as("n_bigrams"), sum($"m" * $"c").as("sum_freq"))
    val totals = scored.agg(sum($"n_bigrams").as("t_n"),
      sum($"sum_freq").as("t_s"))
    d.select($"doc_id").join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(totals))
      .select($"doc_id",
        coalesce($"n_bigrams", lit(0L)).as("n_bigrams"),
        coalesce($"sum_freq", lit(0L)).as("sum_freq"),
        ($"sum_freq".cast(DoubleType) / $"n_bigrams").as("avg_freq"),
        // the cross-multiplication squares already-quadratic totals:
        // decimal(38,0) keeps the comparison exact where BIGINT×BIGINT
        // overflows a few billion bigrams in (DuckDB twin: HUGEINT)
        when($"sum_freq".cast(DecimalType(38, 0)) * $"t_n" >
            $"n_bigrams".cast(DecimalType(38, 0)) * $"t_s", "familiar")
          .when($"n_bigrams" > 0L, "unfamiliar")
          .otherwise("empty").as("bucket"))
      .orderBy($"doc_id")
  }

  /** x52 — snapshot-log time travel end-to-end (the Delta/Iceberg-shaped
    * capability of [[graft.operators.SnapshotLog]], north-star
    * BASELINE.json "spark_approach"): build a versioned orders table in
    * a scratch dir — v1 overwrite (status F), v2 append (status O),
    * v3 targeted delete (o_orderkey % 7 == 0, routed through
    * [[graft.operators.Deletes]]' snapshot delegation), v4 compaction
    * (routed through [[graft.operators.Compaction]], data-identical to
    * v3 by contract) — then digest EVERY version via `readAt`. The
    * oracle recomputes each version's digest from the raw table, so a
    * broken commit swap, delete, or non-data-preserving compaction all
    * hash-mismatch. Deterministic: same input ⇒ same four digests.
    */
  def x52TimeTravel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Compaction, Deletes, SnapshotLog}
    val tbl = scratchDir(s, "x52", dir)
    val orders = t(s, dir, "orders")
    val parts = Seq("o_orderstatus")
    SnapshotLog.overwrite(orders.filter($"o_orderstatus" === "F"), tbl, parts)
    SnapshotLog.append(orders.filter($"o_orderstatus" === "O"), tbl, parts)
    Deletes.deleteByKeys(s, tbl, "o_orderkey",
      orders.filter($"o_orderkey" % 7 === 0).select($"o_orderkey"),
      "o_orderstatus")
    Compaction.compact(s, tbl, targetFileBytes = 1L << 30, maxFiles = 0)
    SnapshotLog.versions(s, tbl).map { v =>
      SnapshotLog.readAt(s, tbl, v).agg(
        cnt.as("n_rows"),
        dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
        .select(lit(v).as("version"), $"n_rows", $"total_price",
          $"min_key", $"max_key")
    }.reduce(_ unionAll _).orderBy($"version")
  }

  /** x53 — atomic MERGE upsert on a snapshot table
    * ([[graft.operators.SnapshotLog.merge]]): the table-level form of
    * the keep-latest upsert the reference's daily
    * re-fetch-and-overwrite mode implies (Q19/H5 and its citations)
    * made transactional. Builds the orders table
    * as a snapshot, merges a delta that RE-PRICES every 10th order
    * and MOVES it to status P (a cross-partition key move — the hard
    * upsert case) plus INSERTS a clone of every 97th order under a
    * fresh key, then digests the merged head per status. The oracle
    * recomputes the merge relationally (anti-join ∪ updates ∪
    * inserts), so a dropped survivor, duplicated key, or missed
    * partition move all hash-mismatch.
    */
  def x53MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val tbl = scratchDir(s, "x53", dir)
    val orders = t(s, dir, "orders")
    SnapshotLog.overwrite(orders, tbl, Seq("o_orderstatus"))
    val updates = orders.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_totalprice", $"o_totalprice" + 100)
      .withColumn("o_orderstatus", lit("P"))
    val inserts = orders.filter($"o_orderkey" % 97 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
    SnapshotLog.merge(s, tbl, updates.unionByName(inserts),
      "o_orderkey", "o_orderstatus")
    SnapshotLog.read(s, tbl)
      .groupBy($"o_orderstatus")
      .agg(cnt.as("n_rows"),
        dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  /** x54 — stats-pruned scan (data skipping) under the hash gate:
    * snapshot the orders table, z-order it on (o_orderkey, o_custkey)
    * ([[graft.operators.SnapshotLog.optimizeZOrder]]), then answer a
    * key-range digest through [[graft.operators.SnapshotLog.readWhere]]
    * — the file list pruned from LOG stats alone. The oracle computes
    * the same range digest relationally from the raw table, so a
    * wrongly-pruned file (lost rows) or stale stats hash-mismatch.
    */
  def x54DataSkipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val tbl = scratchDir(s, "x54", dir)
    val orders = t(s, dir, "orders")
    SnapshotLog.overwrite(orders, tbl, Seq("o_orderstatus"))
    // small target files → many curve segments → real pruning at sf0.01
    SnapshotLog.optimizeZOrder(s, tbl, Seq("o_orderkey", "o_custkey"),
      targetFileBytes = 256L << 10)
    SnapshotLog.readWhere(s, tbl, "o_orderkey", 1000, 60000)
      .groupBy($"o_orderstatus")
      .agg(cnt.as("n_rows"),
        dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  /** x55 — change feed under the hash gate: build the table in three
    * append commits, then digest
    * [[graft.operators.SnapshotLog.changesBetween]] per commit. The
    * oracle recomputes each commit's row set from the same modulus
    * split, so a change feed that leaks prior files, drops a commit,
    * or mis-stamps `_commit_version` hash-mismatches.
    */
  def x55ChangeFeed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val tbl = scratchDir(s, "x55", dir)
    val orders = t(s, dir, "orders")
    val parts = Seq("o_orderstatus")
    SnapshotLog.overwrite(orders.filter($"o_orderkey" % 3 === 0), tbl, parts)
    SnapshotLog.append(orders.filter($"o_orderkey" % 3 === 1), tbl, parts)
    SnapshotLog.append(orders.filter($"o_orderkey" % 3 === 2), tbl, parts)
    SnapshotLog.changesBetween(s, tbl, 1, 3)
      .groupBy($"_commit_version")
      .agg(cnt.as("n_rows"),
        dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"_commit_version")
  }

  /** x58 — deletion vectors under the hash gate (merge-on-read
    * deletes, [[graft.operators.SnapshotLog.deleteWhere]]): v1 loads
    * orders, v2 and v3 are two OVERLAPPING MoR deletes (multiples of
    * 5, then of 7 — no data file rewritten, only KB-scale DV commits),
    * v4 compacts, physically purging the doomed rows. Digesting every
    * version via `readAt` pins the whole contract: v2/v3 subtract
    * exactly their DV row sets (overlap not double-counted), the
    * pre-delete v1 still serves all rows, and v4's purge is
    * data-identical to v3. The oracle recomputes each version
    * relationally from the raw table.
    */
  def x58DeletionVectors(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val tbl = scratchDir(s, "x58", dir)
    val orders = t(s, dir, "orders")
    SnapshotLog.overwrite(orders, tbl, Seq("o_orderstatus"))
    SnapshotLog.deleteWhere(s, tbl, $"o_orderkey" % 5 === 0)
    SnapshotLog.deleteWhere(s, tbl, $"o_orderkey" % 7 === 0)
    SnapshotLog.compact(s, tbl, targetFileBytes = 1L << 30, maxFiles = 0)
    SnapshotLog.versions(s, tbl).map { v =>
      SnapshotLog.readAt(s, tbl, v).agg(
        cnt.as("n_rows"),
        dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
        .select(lit(v).as("version"), $"n_rows", $"total_price",
          $"min_key", $"max_key")
    }.reduce(_ unionAll _).orderBy($"version")
  }

  /** x59 — incremental materialized-view maintenance off the change
    * feed: a per-status digest MV over an append-only snapshot table,
    * refreshed by a [[graft.streaming.SnapshotFeed]] consumer that
    * reads ONLY the files added since its durable cursor — the base
    * table is never re-scanned after its first refresh. The MV stores
    * EXACT partials (BIGINT counts, DECIMAL(28,10) price sums), so
    * combining a delta with the standing MV is associative and the
    * final digest hash-matches a from-scratch recompute — which is
    * exactly what the oracle does, so a feed that drops a commit,
    * double-feeds one, or a combine that loses precision all
    * hash-mismatch. Contract: the MV pattern covers append-only
    * feeds ([[graft.operators.SnapshotLog.changesBetween]] surfaces
    * added files only); rewrite commits need a from-snapshot rebuild.
    *
    * Scale shape: each refresh aggregates only the NEW rows (one
    * map-side-combined hash aggregate), unions with the KB-scale MV,
    * and re-aggregates; the MV write is a KB-scale snapshot commit.
    * At 100 TB the per-refresh cost is bounded by the delta size, not
    * the table size — the whole point of maintaining the view off the
    * log instead of re-scanning.
    */
  def x59IncrementalMv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    import graft.streaming.SnapshotFeed
    val tbl = scratchDir(s, "x59", dir)
    val mv = scratchDir(s, "x59mv", dir) // wiped on entry, like tbl
    val dec = DecimalType(28, 10)
    val orders = t(s, dir, "orders")
    val parts = Seq("o_orderstatus")
    def refresh(): Unit = SnapshotFeed.process(s, tbl, "mv_orders") { batch =>
      val delta = batch.groupBy($"o_orderstatus").agg(
        cnt.as("n_rows"),
        sum($"o_totalprice".cast(dec)).cast(dec).as("price_dec"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      val next = (if (SnapshotLog.latestVersion(s, mv).isDefined)
          SnapshotLog.read(s, mv).unionByName(delta)
        else delta)
        .groupBy($"o_orderstatus").agg(
          sum($"n_rows").as("n_rows"),
          sum($"price_dec").cast(dec).as("price_dec"),
          min($"min_key").as("min_key"),
          max($"max_key").as("max_key"))
      SnapshotLog.overwrite(next, mv)
    }
    SnapshotLog.overwrite(orders.filter($"o_orderkey" % 3 === 0), tbl, parts)
    refresh() // consumes v1
    SnapshotLog.append(orders.filter($"o_orderkey" % 3 === 1), tbl, parts)
    SnapshotLog.append(orders.filter($"o_orderkey" % 3 === 2), tbl, parts)
    refresh() // consumes v2 + v3 in one poll
    SnapshotLog.read(s, mv)
      .select($"o_orderstatus", $"n_rows",
        $"price_dec".cast(DoubleType).as("total_price"),
        $"min_key", $"max_key")
      .orderBy($"o_orderstatus")
  }

  /** x60 — BPE merge-training loop (the iterative half of the
    * tokenizer-training shape whose statistics x23 mines): three
    * rounds of (corpus-wide adjacent-pair count → argmax pair →
    * merge applied everywhere), the Sennrich/GPT-2 training recipe
    * at word granularity. Reports, per round, the merged pair, its
    * count, and the corpus token total after the merge.
    *
    * Merge application is pure string algebra so the DuckDB twin is
    * exact: the corpus is re-spaced with DOUBLE separators
    * (`a␣␣b␣␣c`, single-space padded ends), giving every adjacent
    * pair its own boundary spaces, so one left-to-right literal
    * `replace(" a  b ", " a_b ")` merges exactly the occurrences a
    * greedy left-to-right BPE pass would (identical semantics in
    * Spark and DuckDB, including the `a a a` → `[a_a, a]` overlap
    * case), then separators re-normalize.
    *
    * Scale shape: pair counting is the x23/x18 row-local
    * index-transform (no positional self-join) into one
    * map-side-combined aggregate; the argmax is ONE collected row per
    * round (scheduler-sized, like an AQE stats read); the merge is a
    * row-local map over the corpus. Driver work per round is O(1) —
    * the loop is the driver-side iterative-algorithm pattern (Lloyd's
    * k-means, PageRank) with broadcast state of one pair. The per-
    * round corpus re-derivation is row-local lineage; a production
    * run at 100 TB would checkpoint the corpus every few rounds.
    */
  def x60BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (picks, _) = bpeTrainRounds(s, dir, withCounts = true)
    picks.toDF("round", "pair", "n", "corpus_tokens_after")
      .orderBy($"round")
  }

  /** The x60/x72 BPE training core: three merge rounds over the
    * documents corpus, returning the per-round picks and the final
    * merged (doc_id, text) frame. `withCounts = false` skips the
    * per-round corpus-total action (x72 needs the encoded frame, not
    * the training telemetry — per-round totals come back as 0 and the
    * caller must not read them).
    */
  private def bpeTrainRounds(s: SparkSession, dir: String,
      withCounts: Boolean): (Seq[(Long, String, Long, Long)], DataFrame) = {
    import s.implicits._
    var cur = t(s, dir, "documents").select($"doc_id", $"text")
    val picks = Seq.newBuilder[(Long, String, Long, Long)]
    (1L to 3L).foreach { round =>
      val top = cur
        .select(TextFns.tokenize($"text").as("toks"))
        .filter(size($"toks") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> concat_ws(' ', toks[i-1], toks[i]))")).as("pair"))
        .groupBy($"pair").agg(cnt.as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(1).collect()(0) // the argmax: ONE row, scheduler-sized
      val pair = top.getString(0)
      val n = top.getLong(1)
      // documents are single-space tokenized by construction, so the
      // pair is exactly two space-free symbols
      val Array(a, b) = pair.split(' ')
      cur = cur.withColumn("text",
        trim(replace(
          replace(
            concat(lit(" "),
              expr("array_join(split(text, ' '), '  ')"), lit(" ")),
            lit(s" $a  $b "), lit(s" ${a}_$b ")),
          lit("  "), lit(" "))))
      val tokensAfter = if (withCounts) cur
        .select(sum(size(TextFns.tokenize($"text"))).cast(LongType))
        .as[Long].head()
      else 0L
      picks += ((round, pair, n, tokensAfter))
    }
    (picks.result(), cur)
  }

  /** x72 — tokenizer APPLICATION, closing x60's train → encode loop:
    * the corpus is re-encoded with the three merges x60's recipe
    * learns, and every document reports its token count before and
    * after, the number of merge events it absorbed, and an md5
    * fingerprint of its first 8 encoded tokens (the x10 idiom — the
    * hash gate pins the actual encoded STRINGS, not just counts, so a
    * merge applied at the wrong boundary fails loudly).
    *
    * Scale shape: training is x60's loop (three aggregate+argmax
    * rounds, one collected row each); the encode itself is what a
    * production tokenizer shard does — a ROW-LOCAL map with the merge
    * table as broadcast state (here three literal replaces folded
    * into the plan), one linear pass, no shuffle until the
    * contractual ORDER BY. At 100 TB the encode pass is
    * embarrassingly parallel; the train loop would run on a sample
    * (the Sennrich recipe trains on a slice, encodes everything).
    */
  def x72BpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, encoded) = bpeTrainRounds(s, dir, withCounts = false)
    val before = t(s, dir, "documents")
      .select($"doc_id",
        size(TextFns.tokenize($"text")).cast(LongType).as("n_before"))
    val after = encoded.select($"doc_id",
      TextFns.tokenize($"text").as("toks"))
      .select($"doc_id",
        size($"toks").cast(LongType).as("n_after"),
        md5(concat_ws(" ", slice($"toks", 1, 8))).as("enc_fp"))
    before.join(after, Seq("doc_id"))
      .select($"doc_id", $"n_before", $"n_after",
        ($"n_before" - $"n_after").as("n_merged"), $"enc_fp")
      .orderBy($"doc_id")
  }

  /** Shared 2-iteration Lloyd k-means assignment behind x61/x62:
    * seeds are vectors 1..K, K = clamp(√n, 8, 1024) (deterministic,
    * oracle-shared — production would k-means++ offline like the IVF
    * coarse quantizer x13), one assign → centroid-update → reassign
    * sweep. Two scale choices:
    *  - assignment is the broadcast-scored `max_by` hash aggregate
    *    (x13/x27 idiom) — K tiny centroid rows against ONE corpus
    *    scan, never a window;
    *  - the updated centroid is the per-dimension EXACT DECIMAL SUM
    *    vector, never divided by the member count: cosine is
    *    scale-invariant, so the sum vector ranks identically to the
    *    mean while staying order-independent (bit-identical across
    *    engines) and skipping the one operation (decimal division)
    *    whose rounding rules differ by engine.
    * Returns (vec_id, cell, cos) — cos is the cosine to the final
    * (sum-vector) centroid.
    */
  private def kmeansAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("n1", VectorFns.dotDec("v", "v"))
    // K = clamp(floor(sqrt(n)), 8, 1024): per-cluster population ~sqrt(n),
    // so x62's within-cluster pair volume is ~n^1.5/2 rather than n²/K —
    // the SemDeDup dial (cluster count grows with the corpus). The count
    // is one driver-side scalar (scheduler-sized), shared with the oracle
    // via the same FLOOR(SQRT(COUNT(*))) rule.
    val k = math.max(8L, math.min(1024L,
      math.sqrt(e.count().toDouble).toLong))
    // Assignment is two-stage so the exact-decimal kernel runs n times,
    // not n×K: (1) ALL-DOUBLE cosines pre-select each vector's argmax
    // candidate set — everything within 1e-9 of its double max, ~1
    // centroid since the double/decimal gap is ~64·ε ≈ 1e-13; (2) the
    // exact decimal cosine ranks ONLY those candidates, so the
    // oracle-exact arithmetic still DECIDES (the bloom-route shape:
    // cheap filter, exact verify). Two recompute traps shape the code:
    // the K-row centroid frame is MATERIALIZED (localCheckpoint) so its
    // norm is computed K times, not project-collapsed into the n×K join
    // output; and candidate selection is ONE aggregate (max + the
    // scored list filtered against it), so the n×K scored frame is
    // evaluated once, not once per consumer. Non-finite double scores
    // (zero norms) pin to -2 so the vector keeps x13's assign-anyway
    // semantics through the decimal stage's coalesce.
    // the vector frame is materialized once (2-sweep + verify reuse,
    // and the per-vector double norm would otherwise project-collapse
    // into the n×K join and be re-folded per (vector, centroid) row)
    val ef = e.select($"vec_id", $"v", VectorFns.dotFast("v", "v").as("dn"))
      .localCheckpoint()
    val seeds = ef.filter($"vec_id".between(1, k))
      .select($"vec_id".as("cid"), $"v".as("c"), $"dn".as("cnd"))
    def assign(cents: DataFrame): DataFrame = {
      val scored = ef.crossJoin(broadcast(cents))
        .select($"vec_id", $"cid", {
          // zero-norm guard: ANSI mode makes 0/0 a DIVIDE_BY_ZERO
          // error, not NaN — the null from the unsatisfied `when`
          // falls through the outer otherwise(-2.0) to the same
          // assign-anyway pin the NaN used to take (SemanticDedupSpec
          // plants zero vectors; the driver corpora never do)
          val nprod = sqrt($"dn") * sqrt($"cnd")
          val d = when(nprod > 0d, VectorFns.dotFast("v", "c") / nprod)
          when(abs(nanvl(d, lit(-2.0))) <= 1.5, nanvl(d, lit(-2.0)))
            .otherwise(-2.0).as("dcos")
        })
      val cand = scored.groupBy($"vec_id")
        .agg(max($"dcos").as("mx"),
          collect_list(struct($"dcos", $"cid")).as("cs"))
        .select($"vec_id",
          explode(expr("filter(cs, x -> x.dcos >= mx - 1e-9)")).as("w"))
        .select($"vec_id", $"w.cid".as("cid"))
      cand.join(ef.select($"vec_id", $"v"), Seq("vec_id"))
        .join(broadcast(cents.select($"cid", $"c")), Seq("cid"))
        .withColumn("nprod",
          sqrt(VectorFns.dotDec("v", "v")) * sqrt(VectorFns.dotDec("c", "c")))
        .withColumn("cos",
          when($"nprod" > 0d, VectorFns.dotDec("v", "c") / $"nprod"))
        .groupBy($"vec_id")
        .agg(max(struct(coalesce($"cos", lit(-2.0)).as("k"), (-$"cid").as("nk"),
          $"cid".as("cid"), $"cos".as("cos"))).as("w"))
        .select($"vec_id", $"w.cid".as("cell"), $"w.cos".as("cos"))
    }
    val a1 = assign(seeds).select($"vec_id", $"cell")
    val cents = t(s, dir, "embeddings")
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "x")))
      .join(a1, Seq("vec_id"))
      .groupBy($"cell", $"pos")
      .agg(sum($"x".cast(DoubleType).cast(DecimalType(30, 12)))
        .cast(DoubleType).as("cc"))
      .groupBy($"cell")
      .agg(transform(array_sort(collect_list(struct($"pos", $"cc"))),
        p => p.getField("cc")).as("c"))
      .select($"cell".as("cid"), $"c",
        VectorFns.dotFast("c", "c").as("cnd"))
      .localCheckpoint()
    assign(cents)
  }

  /** x61 — k-means clustering of the embedding corpus (the partition
    * step of SemDeDup-style semantic dedup, and the trainer for the
    * IVF coarse quantizer x13 hard-codes): every vector labeled with
    * its cluster and its cosine to the final centroid. At 100 TB the
    * cluster count scales with the corpus so per-cluster populations
    * stay bounded — each Lloyd sweep stays one broadcast + two hash
    * aggregates per iteration regardless of corpus size.
    */
  def x61KmeansEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    kmeansAssign(s, dir).orderBy($"vec_id")
  }

  /** x62 — semantic near-dedup (SemDeDup shape): all-pairs cosine ONLY
    * within a k-means cluster (x61's partition bounds the quadratic
    * stage — the published algorithm's scale story: grow K with the
    * corpus and the per-cluster candidate set stays constant), drop
    * every vector with an earlier (smaller vec_id) same-cluster
    * neighbour at cosine ≥ [[SemanticDupCosThreshold]]. Output is the
    * full corpus with its keep/drop verdict, the frame a curation
    * pipeline filters to `keep = 1`.
    */
  def x62SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("n1", VectorFns.dotDec("v", "v"))
    // Gate the identical-vector compression on whether it CAN pay
    // (VERDICT r11 #4): one cheap scan-and-aggregate over 16-byte
    // row-local hashes decides if any two embeddings are identical.
    // On a duplicate-free corpus (every driver sf dir) the group-build
    // is pure overhead — r11 measured its premium at +57% of the key
    // (1.90 → 2.98 s at sf0.1) — so the pair scan runs on the vectors
    // directly; the output is identical because on such a corpus every
    // group is a singleton with rep == vec_id. The check is exact, not
    // sampled: it shuffles only hashes (16 bytes/row, vs the
    // group-build's 64-double arrays), and a false "dup-free" is
    // impossible — the compressed path can never be skipped when it
    // would shrink the quadratic stage.
    val hvOf = md5(concat_ws(",",
      expr("transform(v, x -> CAST(x AS STRING))")))
    val dupCheck = e.agg(count(lit(1)).as("n"),
      countDistinct(hvOf).as("nd")).head()
    val hasDups = dupCheck.getLong(0) != dupCheck.getLong(1)
    if (!hasDups) {
      // the assignment lineage feeds BOTH sides of the pair join and
      // the final verdict join — persist it for the one action (the r6
      // x49 lesson: three consumers re-ran the expensive sub-frame)
      val m0 = kmeansAssign(s, dir).select($"vec_id", $"cell")
        .join(e, Seq("vec_id"))
      return graft.Caching.withPersisted(m0) { m =>
        // zero-norm vectors: null cosine never drops and is never
        // dropped — excluded from the pair scan on both sides
        val nz = m.filter($"n1" > 0d).select($"vec_id", $"cell", $"v", $"n1")
        // bloom-route pattern: cheap double dot pre-filters, the
        // exact-decimal cosine alone decides (same as the rep scan)
        val dropped = nz.as("x").join(nz.as("y"),
            $"x.cell" === $"y.cell" && $"x.vec_id" < $"y.vec_id")
          .filter(VectorFns.dotFast("x.v", "y.v") /
            (sqrt($"x.n1") * sqrt($"y.n1")) >= SemanticDupCosThreshold - 1e-9)
          .withColumn("cp", VectorFns.dotDec("x.v", "y.v") /
            (sqrt($"x.n1") * sqrt($"y.n1")))
          .filter($"cp" >= SemanticDupCosThreshold)
          .select($"y.vec_id".as("vec_id")).distinct()
          .withColumn("is_dropped", lit(1L))
        m.join(dropped, Seq("vec_id"), "left")
          .select($"vec_id", $"cell",
            when($"n1" <= 0d, 1L)
              .when($"is_dropped".isNull, 1L).otherwise(0L).as("keep"))
          .orderBy($"vec_id")
      }
    }
    // the two-sweep Lloyd lineage feeds BOTH sides of the pair join and
    // the final verdict join — persist it for the one action (the r6
    // x49 lesson: three consumers re-ran the expensive sub-frame)
    val m0 = kmeansAssign(s, dir).select($"vec_id", $"cell")
      .join(e, Seq("vec_id"))
    // The group key is a row-local md5 over the exact decimal string
    // of each coordinate, not the array itself — the same 16-bytes-
    // through-the-shuffle identity discipline as the text side
    // (TextFns.setIdentity; coordinates cannot contain the ','
    // separator, so plain joining is injective here). Measured cost
    // of the whole compression at sf0.1 (a duplicate-free corpus):
    // ~+1 s of fixed stage overhead on top of the ~2.1 s kmeans
    // assignment — the insurance premium; at sf10 it already nets
    // ~-20%, and on a re-crawl-heavy corpus the pair stage shrinks
    // k²-fold.
    val groupsRaw = m0
      .withColumn("hv", md5(concat_ws(",",
        expr("transform(v, x -> CAST(x AS STRING))"))))
      .groupBy($"cell", $"hv")
      .agg(min($"vec_id").as("rep"), collect_list($"vec_id").as("members"),
        first($"v").as("v"), first($"n1").as("n1"))
      .drop("hv")
    // Identical-vector compression BEFORE the quadratic stage (the
    // sf10 rehearsal's x62 watch item — re-crawled corpora carry
    // byte-identical embeddings, and within-cell pair volume grows
    // quadratically in copies). Identical vectors share a cell (the
    // assignment is a function of v), so grouping by (cell, v) is
    // exact; the pair scan then runs on group REPRESENTATIVES (min
    // vec_id) only. Equivalence, member by member:
    //  - a non-min member of a NONZERO-norm group is always dropped —
    //    its group min is a smaller-id cell-mate at cosine exactly 1;
    //  - a group min is dropped iff some OTHER group in the cell has
    //    min < it and rep-cosine ≥ τ (any qualifying member x implies
    //    its group min also qualifies, and cosine only depends on the
    //    group vector) — exactly the rep-level pair scan;
    //  - ZERO-norm vectors have null cosine against everything
    //    (including their own copies), so they are never dropped and
    //    never drop others: keep = 1 unconditionally, and zero-norm
    //    reps are excluded from the pair scan on both sides.
    // Spec-pinned against a driver-side replay of the declared
    // pairwise rule on a duplicate-heavy fixture (SemanticDedupSpec).
    //
    // The persist sits on the GROUP frame, not the raw (vec_id, cell,
    // v) join: groups is the frame with three consumers (both pair
    // sides + the member expansion), so caching upstream of the
    // grouping would re-run the aggregate per consumer (the r11
    // baseline refresh measured that mistake at 1.68 s → 3.82 s).
    graft.Caching.withPersisted(groupsRaw) { groups =>
      val reps = groups.filter($"n1" > 0d)
        .select($"rep", $"cell", $"v", $"n1")
      // bloom-route pattern for the exact arithmetic: the cheap DOUBLE
      // dot pre-filters candidates (error ~64·ε « the 1e-9 margin), the
      // exact-decimal cosine alone DECIDES — results stay bit-identical
      // to the oracle while the costly decimal kernel runs only on
      // pairs already at the threshold.
      val droppedReps = reps.as("x").join(reps.as("y"),
          $"x.cell" === $"y.cell" && $"x.rep" < $"y.rep")
        .filter(VectorFns.dotFast("x.v", "y.v") / (sqrt($"x.n1") * sqrt($"y.n1"))
          >= SemanticDupCosThreshold - 1e-9)
        .withColumn("cp",
          VectorFns.dotDec("x.v", "y.v") / (sqrt($"x.n1") * sqrt($"y.n1")))
        .filter($"cp" >= SemanticDupCosThreshold)
        .select($"y.rep".as("rep")).distinct()
        .withColumn("rep_dropped", lit(1L))
      groups
        .join(droppedReps, Seq("rep"), "left")
        .select($"cell", $"n1", $"rep",
          when($"rep_dropped".isNull, 1L).otherwise(0L).as("rep_keep"),
          explode($"members").as("vec_id"))
        .select($"vec_id", $"cell",
          when($"n1" <= 0d, 1L) // zero-norm: null cosine never drops
            .when($"vec_id" === $"rep", $"rep_keep")
            .otherwise(0L).as("keep"))
        .orderBy($"vec_id")
    }
  }

  /** x63 — shallow-clone fork-and-diverge (Delta `SHALLOW CLONE`):
    * build the orders snapshot table, fork it ZERO-COPY via
    * [[graft.operators.SnapshotLog.cloneShallow]], then evolve only
    * the fork — delete a key slice (rewriting the touched partitions
    * into the clone's OWN tree) and compact (un-sharing the rest).
    * The digest output proves the two contracts the operator sells at
    * 100 TB: the fork sees the source's data without copying a byte
    * (clone v1 ≡ source head), and divergence is isolated in both
    * directions (source head unchanged after the clone's delete).
    */
  def x63ShallowClone(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val src = scratchDir(s, "x63s", dir)
    val dst = scratchDir(s, "x63c", dir)
    val orders = t(s, dir, "orders")
    val parts = Seq("o_orderstatus")
    SnapshotLog.overwrite(orders.filter($"o_orderstatus" === "F"), src, parts)
    SnapshotLog.append(orders.filter($"o_orderstatus" === "O"), src, parts)
    SnapshotLog.cloneShallow(s, src, dst)
    SnapshotLog.deleteByKeys(s, dst, "o_orderkey",
      orders.filter($"o_orderkey" % 5 === 0).select($"o_orderkey"),
      "o_orderstatus")
    SnapshotLog.compact(s, dst, targetFileBytes = 1L << 30, maxFiles = 0)
    def dig(df: DataFrame, side: String, v: Long) =
      df.agg(cnt.as("n_rows"), dsum($"o_totalprice").as("total_price"),
        min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
        .select(lit(side).as("side"), lit(v).as("version"), $"n_rows",
          $"total_price", $"min_key", $"max_key")
    (dig(SnapshotLog.read(s, src), "source", 2L) +:
      SnapshotLog.versions(s, dst).map(v =>
        dig(SnapshotLog.readAt(s, dst, v), "clone", v)))
      .reduce(_ unionAll _).orderBy($"side", $"version")
  }

  /** x64 — multi-table ACID transaction under the hash gate
    * ([[graft.operators.SnapshotLog.commitAll]], decision-file 2PC):
    * the cross-table atomicity a feature-store or training-manifest
    * pipeline needs when a fact table and its dimension must advance
    * together. Seeds two snapshot tables with half of orders/customer,
    * lands the other halves in ONE transaction (both visible
    * atomically), then drives a second transaction that MUST abort —
    * its first prepare (orders rows key-shifted +20M) lands before the
    * second table's CHECK constraint rejects its rows, so the
    * coordinator's abort has to void an already-landed prepare.
    * Digesting every version of both tables pins the whole contract:
    * the committed txn's rows are all present, the aborted txn
    * contributes NOTHING at any version (a leaked prepare would also
    * surface in max_key via the +20M shift), and the abort leaves both
    * tables writable. The oracle recomputes each version relationally
    * from the raw tables.
    */
  def x64MultiTxn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.SnapshotLog
    val t1 = scratchDir(s, "x64a", dir)
    val t2 = scratchDir(s, "x64b", dir)
    val dec = scratchDir(s, "x64d", dir)
    val orders = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    SnapshotLog.overwrite(orders.filter($"o_orderkey" % 2 === 0), t1,
      Seq("o_orderstatus"))
    SnapshotLog.overwrite(cust.filter($"c_custkey" % 2 === 0), t2)
    SnapshotLog.commitAll(s, Seq(
      (orders.filter($"o_orderkey" % 2 === 1), t1, Seq("o_orderstatus")),
      (cust.filter($"c_custkey" % 2 === 1), t2, Nil)), dec)
    SnapshotLog.addConstraint(s, t2, "nonnegative_keys", "c_custkey >= 0")
    try {
      SnapshotLog.commitAll(s, Seq(
        (orders.filter($"o_orderkey" % 97 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 20000000L), t1,
          Seq("o_orderstatus")),
        (cust.filter($"c_custkey" <= 10)
          .withColumn("c_custkey", -$"c_custkey" - 1L), t2, Nil)), dec)
      sys.error("x64: the constrained transaction must abort")
    } catch { case _: IllegalArgumentException => () }
    // post-abort both tables stay writable (decided head, not stuck)
    SnapshotLog.append(cust.filter($"c_custkey" === 1), t2)
    def dig(df: DataFrame, tbl: String, v: Long, amt: Column, key: Column) =
      df.agg(cnt.as("n_rows"), dsum(amt).as("total_amt"),
        min(key).as("min_key"), max(key).as("max_key"))
        .select(lit(tbl).as("tbl"), lit(v).as("version"), $"n_rows",
          $"total_amt", $"min_key", $"max_key")
    (SnapshotLog.versions(s, t1).map(v => dig(SnapshotLog.readAt(s, t1, v),
        "orders", v, col("o_totalprice"), col("o_orderkey"))) ++
      SnapshotLog.versions(s, t2).map(v => dig(SnapshotLog.readAt(s, t2, v),
        "customer", v, col("c_acctbal"), col("c_custkey"))))
      .reduce(_ unionAll _).orderBy($"tbl", $"version")
  }

  /** x65 — PERSISTENT IVF index ([[graft.operators.AnnIndex]]): the
    * build-once/probe-many complement of the in-query IVF x13. The
    * corpus (minus the probe vector) is laid out into a parquet table
    * PARTITIONED BY its coarse-quantizer cell — 16 deterministic seed
    * centroids, vectors 1..16, x13's quantizer — then vector 0 probes
    * its nprobe=2 best cells for the inner-product top-5. The cell
    * restriction reaches the scan as a STATIC partition filter
    * (PlanAudit pins it), so a probe reads nprobe/n_cells of the data:
    * the serving-path behavior that at 100 TB separates "scan the
    * corpus per query" from "read two directories". Scoring is the
    * exact-decimal kernel end-to-end (assignment AND ranking), which
    * is what makes a persistent layout rebuild-stable and this query
    * hash-checkable against the DuckDB twin.
    */
  def x65AnnIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    // deterministic wiped-on-entry scratch path: repeated invocations
    // (bench warm-up + reps, Verify, PlanAudit) reuse one directory
    // instead of leaking a fresh index copy into /tmp per call
    val path = scratchDir(s, "x65", dir) + "/index"
    graft.operators.AnnIndex.build(e.filter($"vec_id" =!= 0), cents, path)
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    graft.operators.AnnIndex.probe(s, path, probes, cents, nprobe = 2, k = 5)
  }

  /** x65b — the persistent index REFRESH path, oracle-gated: build the
    * layout WITHOUT every fifth vector, [[graft.operators.AnnIndex.append]]
    * those as an incremental batch (the same assignment pass in append
    * mode — new files land only inside their assigned cell directories,
    * AnnIndexSpec pins the file-level claim), then run the identical
    * probe. The oracle is the SAME query over the unioned data, so a
    * dropped, duplicated, or mis-assigned appended vector
    * hash-mismatches the probe result. Ref: A3 incremental batched
    * lookups (src/main_extractor.py:400-436).
    */
  def x65bAnnAppend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val path = scratchDir(s, "x65b", dir) + "/index"
    graft.operators.AnnIndex.build(
      e.filter($"vec_id" =!= 0 && $"vec_id" % 5 =!= 4), cents, path)
    graft.operators.AnnIndex.append(
      e.filter($"vec_id" =!= 0 && $"vec_id" % 5 === 4), cents, path)
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    graft.operators.AnnIndex.probe(s, path, probes, cents, nprobe = 2, k = 5)
  }

  /** x65c — the persistent index MAINTENANCE path, oracle-gated
    * (VERDICT r10 #8): build minus a batch, land the batch as TWO
    * append slices (append has no rebalance, so occupancy drifts with
    * every refresh; two slices exercise the multi-refresh path — the
    * original ten were pure job-count overhead, 9.0 s of the r11
    * sweep, since the final layout is slice-invariant and
    * AnnIndexSpec separately pins per-slice file claims over ten
    * appends), then [[graft.operators.AnnIndex.optimize]] splits
    * every cell above mean occupancy (⌊n/16⌋ — at least one cell must
    * exceed the mean, so the split path always executes, and any cell
    * above 2× the mean exercises the k-way (k ≥ 3) split in one pass)
    * and the probe runs against the REFRESHED centroid set. The output carries the
    * probe's top-5 PLUS a layout digest (cell count, max occupancy,
    * total rows) on every row, so the oracle hash-checks both the
    * serving result under the new centroids and the global layout the
    * split produced — a dropped member, a mis-assigned child, or a
    * wrong child id diverges one or the other. The oracle replays the
    * whole lifecycle relationally (appends are order-irrelevant by
    * x65b's argument; optimize is deterministic end-to-end — decimal
    * seed/diversity rankings, IEEE-double Lloyd cosines, decimal-mean
    * centroids — see [[graft.operators.AnnIndex.optimize]]).
    */
  def x65cAnnOptimize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val path = scratchDir(s, "x65c", dir) + "/index"
    graft.operators.AnnIndex.build(
      e.filter($"vec_id" =!= 0 && $"vec_id" % 5 =!= 4), cents, path)
    // two refresh batches covering vec_id % 5 == 4 between them: the
    // same rows the ten-slice form appended, so the layout (and the
    // oracle hash) is unchanged — appends are order- and
    // slicing-irrelevant by x65b's argument
    (0 until 2).foreach { k =>
      graft.operators.AnnIndex.append(
        e.filter($"vec_id" =!= 0 && $"vec_id" % 10 === (5 * k + 4)), cents, path)
    }
    val nIdx = e.filter($"vec_id" =!= 0).count()
    val refreshed = graft.operators.AnnIndex.optimize(
      s, path, cents, math.max(1L, nIdx / 16))
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    val res = graft.operators.AnnIndex.probe(
      s, path, probes, refreshed, nprobe = 2, k = 5)
    val digest = s.read.parquet(path)
      .groupBy($"cell").agg(cnt.as("n"))
      .agg(cnt.as("n_cells"), max($"n").as("max_occ"),
        sum($"n").cast(LongType).as("n_rows"))
    res.crossJoin(broadcast(digest)).orderBy($"p_id", $"rank")
  }

  /** x65d — the PRODUCTION-DEFAULT maintenance path, hash-gated
    * (VERDICT r16 #2): x65c's exact lifecycle (build + two refresh
    * appends) but the optimize is [[graft.operators.AnnIndex
    * .optimizeIfOutgrown]] — the call a pipeline actually schedules —
    * which RECOUNTS the index (one scheduler-sized job) and applies
    * the ⌈√n⌉ occupancy policy instead of a caller-chosen cap. At
    * sf0.01 that is cap 23 vs x65c's 31, so the two keys split
    * different cells and hash differently: this key pins the policy's
    * recount-then-cap arithmetic AND the full split/Lloyd/slice chain
    * under it against the DuckDB replay (thr = ⌈√n⌉ in
    * annMaintCtes — the only delta from x65c's oracle). The probe +
    * layout digest mirror x65c so the gate covers verdicts, the
    * refreshed centroid set, and the physical layout in one output.
    */
  def x65dAnnPolicy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val path = scratchDir(s, "x65d", dir) + "/index"
    graft.operators.AnnIndex.build(
      e.filter($"vec_id" =!= 0 && $"vec_id" % 5 =!= 4), cents, path)
    (0 until 2).foreach { k =>
      graft.operators.AnnIndex.append(
        e.filter($"vec_id" =!= 0 && $"vec_id" % 10 === (5 * k + 4)), cents, path)
    }
    val refreshed = graft.operators.AnnIndex.optimizeIfOutgrown(s, path, cents)
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    val res = graft.operators.AnnIndex.probe(
      s, path, probes, refreshed, nprobe = 2, k = 5)
    val digest = s.read.parquet(path)
      .groupBy($"cell").agg(cnt.as("n"))
      .agg(cnt.as("n_cells"), max($"n").as("max_occ"),
        sum($"n").cast(LongType).as("n_rows"))
    res.crossJoin(broadcast(digest)).orderBy($"p_id", $"rank")
  }

  /** x82 — the two-level coarse quantizer's IDENTITY contract,
    * hash-gated (r17; the strongest gate in this repo is a
    * CORRECTNESS key): x65's exact index + probe, but with the
    * centroid limit forced under the 16-cell set so the ranking
    * ROUTES two-level, and the descent width set to k₂ = ⌈√16⌉ = 4 —
    * covering, so every cell is a candidate and the probe must be
    * BIT-IDENTICAL to the flat ranking. The oracle is therefore x65's
    * own SQL (plus the constant routed flag, captured at plan
    * construction where the router runs): the plan changed, the
    * contract did not, and DuckDB now gates that sentence. The
    * sysprops are scoped to plan construction — the route decision
    * and the memoized super frames are fixed into the plan, so later
    * re-execution (bench reps, Verify's write) replays the same path.
    */
  def x82AnnTwoLevel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val path = scratchDir(s, "x82", dir) + "/index"
    graft.operators.AnnIndex.build(e.filter($"vec_id" =!= 0), cents, path)
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    val (res, routed) = try {
      System.setProperty("graft.ann.centroid.limit", "4")
      System.setProperty("graft.ann.nsuper", "4")
      val r = graft.operators.AnnIndex.probe(s, path, probes, cents,
        nprobe = 2, k = 5)
      (r, graft.operators.AnnIndex.lastRankingTwoLevel)
    } finally {
      System.clearProperty("graft.ann.centroid.limit")
      System.clearProperty("graft.ann.nsuper")
    }
    res.withColumn("routed", lit(routed))
  }

  /** x83 — the two-level NARROW descent, hash-gated: same forced
    * route but nsuper = 1, so only the probe's best super-cell's
    * members are candidate cells — the level-1 recall contract
    * (level 1's nprobe) exercised for real, and replayed RELATIONALLY:
    * the oracle derives the super layer from scratch — super-seeds =
    * the 4 smallest cell ids, membership by exact-decimal dot argmax
    * (assign's rule, tie → smaller sid), super-centroid = per-dim
    * DECIMAL(30,12) sum of member centroids (un-normalized, the x61
    * idiom), the probe's super ranked by the decimal double-array dot
    * (the l1/l2 cast chain), then x65's cell ranking and top-k
    * restricted to the chosen super's cells. A drift anywhere in the
    * two-level chain — seed choice, membership tie, sum order, level-1
    * rank — hash-mismatches.
    */
  def x83AnnTwoLevelNarrow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val path = scratchDir(s, "x83", dir) + "/index"
    graft.operators.AnnIndex.build(e.filter($"vec_id" =!= 0), cents, path)
    val probes = e.filter($"vec_id" === 0).select($"vec_id".as("p_id"), $"v".as("p"))
    val (res, routed) = try {
      System.setProperty("graft.ann.centroid.limit", "4")
      System.setProperty("graft.ann.nsuper", "1")
      val r = graft.operators.AnnIndex.probe(s, path, probes, cents,
        nprobe = 2, k = 5)
      (r, graft.operators.AnnIndex.lastRankingTwoLevel)
    } finally {
      System.clearProperty("graft.ann.centroid.limit")
      System.clearProperty("graft.ann.nsuper")
    }
    res.withColumn("routed", lit(routed))
  }

  /** x70 — STREAMING index maintenance (ANN × H, VERDICT r11 #7):
    * x65b's refresh batch arrives as an unbounded parquet stream (four
    * slice files, one micro-batch each via maxFilesPerTrigger=1)
    * landing through [[graft.operators.AnnIndex.appendStream]] — the
    * same assignment append behind a batch-id ledger, so replays are
    * idempotent. Q28's run-to-completion pattern makes it
    * oracle-gated: the drained stream's index must equal the
    * batch-built one cell-for-cell, so the probe hash-matches x65b's
    * oracle verbatim — a dropped, duplicated, or mis-routed micro-batch
    * diverges it. StreamingSpec additionally pins the replay-skip
    * (ledger) claim batch by batch.
    */
  def x70AnnIndexStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val scratch = scratchDir(s, "x70", dir)
    val path = scratch + "/index"
    graft.operators.AnnIndex.build(
      e.filter($"vec_id" =!= 0 && $"vec_id" % 5 =!= 4), cents, path)
    // the refresh batch becomes a file stream: 4 range-sliced parquet
    // files so the incremental path is actually exercised (4
    // micro-batches), not a single-batch degenerate
    val feed = scratch + "/feed"
    val slice = e.filter($"vec_id" =!= 0 && $"vec_id" % 5 === 4)
    slice.repartitionByRange(4, $"vec_id")
      .write.mode("overwrite").parquet(feed)
    val stream = s.readStream.schema(slice.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed)
    val q = graft.operators.AnnIndex.appendStream(
      stream, cents, path, scratch + "/ckpt")
    try q.processAllAvailable() finally q.stop()
    val probes = e.filter($"vec_id" === 0)
      .select($"vec_id".as("p_id"), $"v".as("p"))
    graft.operators.AnnIndex.probe(s, path, probes, cents, nprobe = 2, k = 5)
  }

  /** q26 Aggregator twin — typed [[VectorFns.CentroidAgg]] centroid.
    * Float-sum order makes the raw values partition-order-dependent in
    * the last ulps, so the driver-checkable output carries the BOUND:
    * `agg_close` asserts the Aggregator centroid sits within 1e-9 of
    * the decimal-exact Q26 centroid per (label, dim) — hash-matchable
    * by a constant-true oracle column. The decimal-exact Q26 remains
    * the value-level hash check; production callers read the
    * Aggregator output directly.
    */
  def q26CentroidAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val centroid = VectorFns.centroidUdaf
    val agg = t(s, dir, "embeddings")
      .groupBy($"label")
      .agg(centroid(col("embedding")).as("c"))
      .select($"label", posexplode($"c").as(Seq("pos", "agg_centroid")))
      .select($"label", ($"pos" + 1).cast(LongType).as("dim"), $"agg_centroid")
    val exact = Inventory.q26(s, dir)
      .withColumnRenamed("centroid", "exact_centroid")
    agg.join(exact, Seq("label", "dim"))
      .select($"label", $"dim",
        (abs($"agg_centroid" - $"exact_centroid") <=
          lit(1e-9) * greatest(abs($"exact_centroid"), lit(1.0)))
          .as("agg_close"))
      .orderBy($"label", $"dim")
  }

  /** x71 — CROSS-RUN incremental near-dup dedup (the x02 contract
    * lifted to continuous ingestion): build a persisted MinHash
    * signature store ([[graft.operators.MinhashSignatureStore]]) from
    * the historical half of the corpus (even doc_id), then land two
    * ingest batches (doc_id ≡ 1 and ≡ 3 mod 4) through the full
    * lifecycle — dedup batch 1 against history ∪ earlier-in-batch,
    * APPEND its keepers to the store, dedup batch 2 against the grown
    * store. Per-batch cost is O(batch + matched slivers): history is
    * never re-signatured, never shuffled (broadcast band probe + DPP
    * bucket pruning + broadcast semi verify fetch — the operator's
    * Scaladoc walks the plan). x20 is this shape for EXACT keys; x71
    * is the near-dup analog every recurring crawl needs. Note the
    * store-semantics subtlety the oracle replays: batch 2 is checked
    * against history and batch 1's KEPT docs only — a doc matching
    * only a DROPPED batch-1 doc survives, because dropped docs never
    * enter the store (their content is represented by whatever they
    * matched). The scheme is pinned at build from the HISTORY size
    * ([[minhashSchemeFor]]), so the oracle re-derives it from the
    * even-id count. Ref: the lake's only-ingest-new-objects rule,
    * src/main_extractor.py:400-436, composed with x02's near-dup
    * contract.
    */
  /** Pristine history store shared by the x71/x75/x78 lifecycles
    * (VERDICT r12 #6: the three keys were each paying an identical
    * deterministic build per bench rep). Built ONCE per (JVM, input
    * dir) from the even-id history at the `minhashSchemeFor` scheme;
    * each lifecycle then file-COPIES it into its own scratch dir, so
    * appends never touch the shared fixture and every rep still runs
    * the full mutable lifecycle. The fixture is deterministic
    * (tokenize → minhash under fixed perms), so sharing cannot change
    * any verdict — only when the build cost is paid.
    */
  private val storeFixtures =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pristineStoreFor(s: SparkSession, dir: String): String =
    storeFixtures.computeIfAbsent(dir, _ => {
      val hist = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 4 === 0)
      val (nh, nb) = minhashSchemeFor(hist.count())
      val path = scratchDir(s, "mssfixture", dir) + "/store"
      graft.operators.MinhashSignatureStore.build(s, hist, path, nh, nb, Perms)
      path
    })

  /** The store AFTER batch 1's lifecycle step (history + b1's keepers
    * appended), shared read-only by x71's and x78's second probe legs
    * (VERDICT r13 #6: the two keys replayed the identical
    * deterministic append per rep — the probes are the oracle
    * contract, the in-between mutation is fixture state). Keep sets
    * are mode-independent (spec-pinned), so building the keepers via
    * the cheap verdict-only probe leaves both keys' oracles exact.
    * The full mutable lifecycle still runs per-rep in x75 (streaming)
    * and per-suite in MinhashStoreSpec.
    */
  private def postB1StoreFor(s: SparkSession, dir: String): String = {
    val pristine = pristineStoreFor(s, dir) // resolve OUTSIDE the map
    storeFixtures.computeIfAbsent(dir + "#postb1", _ => {
      val mss = graft.operators.MinhashSignatureStore
      val b1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 8 === 1)
      val path = scratchDir(s, "mssfixtureb1", dir) + "/store"
      copyStore(s, pristine, path)
      val v1 = mss.dedupVerdicts(s, b1, path, Perms, MinhashJaccardThreshold)
      mss.append(s,
        b1.join(v1.filter(col("keep")), Seq("doc_id"), "left_semi"),
        path, Perms)
      path
    })
  }

  /** Pristine ANN history index shared by the x79/x80 lifecycles —
    * the embedding analog of [[pristineStoreFor]] (same adjudication,
    * VERDICT r13 #6): the even-id half of the ingest pool assigned
    * and written once per (JVM, dir); deterministic (exact-decimal
    * argmax), so sharing cannot change a verdict. x80 file-COPIES it
    * into its own scratch so the streamed appends never touch the
    * shared fixture; x79 probes it read-only.
    */
  private def pristineAnnIndexFor(s: SparkSession, dir: String): String =
    storeFixtures.computeIfAbsent(dir + "#annidx", _ => {
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id").between(1, 16))
        .select(col("vec_id").as("cid"), col("v").as("c"))
      val hist = e.filter(col("vec_id") >= 17 && col("vec_id") % 2 === 0)
      val path = scratchDir(s, "annfixture", dir) + "/index"
      graft.operators.AnnIndex.build(hist, cents, path)
      path
    })

  /** The ANN index AFTER batch 1's lifecycle step (history + b1's
    * keepers), shared read-only by x79's second probe leg — the
    * embedding analog of [[postB1StoreFor]]. The append's argmax
    * assignment is deterministic, so the fixture equals what any
    * per-rep lifecycle would have built.
    */
  private def postB1AnnIndexFor(s: SparkSession, dir: String): String = {
    val pristine = pristineAnnIndexFor(s, dir) // resolve OUTSIDE the map
    storeFixtures.computeIfAbsent(dir + "#annidxb1", _ => {
      val ann = graft.operators.AnnIndex
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id").between(1, 16))
        .select(col("vec_id").as("cid"), col("v").as("c"))
      val b1 = e.filter(col("vec_id") >= 17 && col("vec_id") % 4 === 1)
      val path = scratchDir(s, "annfixtureb1", dir) + "/index"
      copyStore(s, pristine, path)
      val v1 = ann.dedupAgainst(s, path, b1, cents, nprobe = 2,
        EmbedCosThreshold).localCheckpoint(true)
      ann.append(b1.join(v1.filter(col("keep")), Seq("vec_id"), "left_semi"),
        cents, path)
      path
    })
  }

  private def copyStore(s: SparkSession, from: String, to: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(from)
    val f = src.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(f, src, f,
      new org.apache.hadoop.fs.Path(to), false, conf)
  }

  /** Run two INDEPENDENT probe legs concurrently from two driver
    * threads (spark_optimization_guide §2.6: actions are only
    * sequential because the driver calls them sequentially — the
    * second leg's tasks back-fill the executor slots the first leg's
    * scheduler-latency tail leaves idle, which at these batch sizes
    * is most of them). Each leg gets its OWN cloned session (same
    * SparkContext and cache, private SQLConf) because the probe paths
    * scope session confs around their actions (withCensusExchangeConf
    * / withAdvisoryCap) — two legs sharing one session would race
    * those set/restore pairs. Verdicts are bit-identical to the
    * sequential form: both legs' stores are read-only fixtures
    * (VERDICT r13 #6) and exchange-sizing confs never change verdict
    * content, only partition counts. Builder-time session confs
    * (nanosAsLong, AQE, shuffle.partitions, extensions) are inherited
    * by newSession(); nothing in these paths reads a
    * runtime-set-only conf.
    */
  private def parProbes[T](s: SparkSession, concurrent: Boolean)(
      leg1: SparkSession => T, leg2: SparkSession => T): (T, T) =
    if (!concurrent) (leg1(s), leg2(s))
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val f1 = Future(leg1(s.newSession()))
      val f2 = Future(leg2(s.newSession()))
      (Await.result(f1, Duration.Inf), Await.result(f2, Duration.Inf))
    }

  /** Route the two probe legs concurrent vs sequential from the
    * store's `_bands_rows` commit metadata (one tiny driver read,
    * zero Spark jobs — the only store-size signal that costs nothing
    * before a plan is built). Overlap wins exactly where the probes
    * are SCHEDULER-LATENCY-bound (small stores/batches: executors
    * idle between a probe's driver-sequenced jobs); past the bound
    * the probes are data-bound — they saturate the cores anyway, and
    * two census candidate exchanges in flight TOGETHER doubled peak
    * execution memory and OOM'd the 8 GB sf10 sweep this round. So:
    * concurrent iff the metadata says the store is under
    * `-Dgraft.probe.parallel.bands.limit` (65536 band rows ≈ a
    * ≤16k-doc store at the (16,4) scheme); absent metadata (legacy
    * store) routes sequential — the conservative, sweep-proven path.
    */
  private def smallStoreProbe(s: SparkSession, storeDir: String): Boolean =
    graft.operators.MinhashSignatureStore.storedBandsRows(s, storeDir)
      .exists(_ <= java.lang.Long.getLong(
        "graft.probe.parallel.bands.limit", 65536L))

  def x71IncrementalMinhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mss = graft.operators.MinhashSignatureStore
    // fixture sizing: the gate exercises the LIFECYCLE (store reuse,
    // batch ordering, dropped-docs-never-enter semantics); candidate
    // DENSITY stress is x02/q27's job. A quarter-corpus history with
    // two eighth-corpus batches keeps every semantic edge while the
    // bench cost tracks the lifecycle, not the corpus's all-pairs
    // match volume (sum(n_dups) was 1.4M per 1250-doc batch at sf0.1).
    // The two store states are shared READ-ONLY fixtures (probing
    // never mutates; VERDICT r13 #6): batch 1 probes pristine history,
    // batch 2 probes the post-append state [[postB1StoreFor]] — the
    // deterministic mutation between them builds once per (JVM, dir)
    // instead of once per key per rep. Verdict ordering needs no
    // parquet bounce anymore: dedupAgainst materializes its census
    // aggregate eagerly, and nothing here mutates the shared stores.
    // fixtures resolved BEFORE the parallel legs (postB1 depends on
    // pristine; computeIfAbsent must not race itself)
    val pristine = pristineStoreFor(s, dir)
    val postB1 = postB1StoreFor(s, dir)
    // the two probes are independent reads of read-only stores — run
    // them concurrently when the store is small enough that the legs
    // are latency- not memory-bound ([[smallStoreProbe]]); each leg
    // builds its batch on its own session so every job it runs is
    // session-local
    val (v1, v2) = parProbes(s, smallStoreProbe(s, postB1))(
      s1 => mss.dedupAgainst(s1,
        t(s1, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 8 === 1),
        pristine, Perms, MinhashJaccardThreshold),
      s2 => mss.dedupAgainst(s2,
        t(s2, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 8 === 5),
        postB1, Perms, MinhashJaccardThreshold))
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"doc_id", $"batch", $"keep", $"n_dups", $"max_jaccard")
      .orderBy($"doc_id")
  }

  /** x73's per-shard token budget: small enough that sf0.01's ~27k
    * tokens span several shards, so the boundary logic is exercised at
    * every driver gate scale.
    */
  val ShardBudget = 4096L

  /** x73 — training-shard assignment: the pipeline-finishing step that
    * turns a curated corpus into the shuffled, token-balanced shards a
    * training run streams. Order is a DETERMINISTIC global shuffle
    * (md5 of doc_id — the epoch-shuffle key idiom x41 uses), docs are
    * packed whole into [[ShardBudget]]-token shards greedily in that
    * order (a doc belongs to the shard where its span starts; docs are
    * never split — sequences get packed inside a shard by x31's
    * machinery).
    *
    * Scale shape is x31's two-phase distributed prefix sum re-keyed to
    * the shuffle order: the md5 key's 3-hex-char prefix gives 4096
    * order-preserving buckets (a string prefix sorts exactly like the
    * full key), local running sums window per bucket in parallel, and
    * the bucket-offset rollup is one 4096-row ordered pass — no global
    * sort, no single-partition window over the corpus. At 100 TB the
    * shard count is corpus_tokens / budget; the final write would
    * `repartitionByRange($"shard")` so each shard lands as one file.
    */
  def x73ShardPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents")
      .select($"doc_id",
        size(TextFns.tokenize($"text")).cast(LongType).as("n_toks"),
        md5($"doc_id".cast(StringType)).as("sk"))
      .withColumn("bucket", substring($"sk", 1, 3))
    graft.Caching.withPersisted(d) { dd =>
      val localW = Window.partitionBy($"bucket").orderBy($"sk", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offW = Window.partitionBy(pmod(hash($"bucket"), lit(1)))
        .orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = dd.groupBy($"bucket").agg(sum($"n_toks").as("btoks"))
        .withColumn("off", coalesce(sum($"btoks").over(offW), lit(0L)))
        .select($"bucket", $"off")
      dd.withColumn("local_cum", sum($"n_toks").over(localW))
        .join(broadcast(offsets), Seq("bucket"))
        .withColumn("start_off", $"local_cum" + $"off" - $"n_toks")
        .select($"doc_id", $"n_toks",
          expr(s"start_off DIV $ShardBudget").as("shard"))
        .orderBy($"doc_id")
    }
  }

  /** x74's feature space: tokens hash into this many buckets, so the
    * weight table is at most buckets × languages rows — broadcast-sized
    * at ANY corpus size (the hashing-trick dimensionality bound).
    */
  val LangBuckets = 1024L

  /** x74 — TRAINED bag-of-tokens language classifier (the
    * fastText-shaped complement to x07's rule heuristic): train on the
    * even-doc_id half (per-bucket per-language token counts → integer
    * posterior weights w = cnt_bl·10⁶ DIV cnt_b), score every doc as
    * Σ_buckets n_db·w(b,lang), predict the argmax (ties broken by
    * language asc, the deterministic rule both engines share). Output
    * carries the held-out split flag so accuracy is auditable per side.
    *
    * All arithmetic is BIGINT-exact (counts and integer division —
    * no log-likelihood floats whose libm last-ulps differ across
    * engines), which is what lets a TRAINED model hash-gate against
    * DuckDB. Scale shape: one explode pass over the corpus feeding two
    * hash aggregates (train counts, per-doc bucket counts); the weight
    * table is ≤ [[LangBuckets]]×|langs| rows, BROADCAST into the
    * scoring join; the argmax is a row_number window partitioned by
    * doc_id (|langs| rows per partition — embarrassingly parallel,
    * never a global sort). Docs whose buckets were all unseen in
    * training predict 'und' via the left join. At 100 TB: training
    * would sample, inference is the same broadcast-join scan.
    *
    * Honesty note: the driver's synthetic corpus draws every language
    * from ONE shared 31-word vocabulary, so no classifier can beat the
    * majority-class rate here — the oracle gate pins the TRAIN +
    * INFER mechanism exactly (weights, scores, tie rule), not a
    * meaningless accuracy number.
    */
  def x74LangClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
    val tb = d.select($"doc_id", $"lang", explode(TextFns.tokenize($"text")).as("tok"))
      .select($"doc_id", $"lang",
        (TextFns.tokHash($"tok") % LangBuckets).as("b"))
    graft.Caching.withPersisted(tb) { t2 =>
      val tr = t2.filter($"doc_id" % 2 === 0)
        .groupBy($"b", $"lang").agg(cnt.as("cbl"))
      val tot = tr.groupBy($"b").agg(sum($"cbl").as("cb"))
      val wts = tr.join(tot, Seq("b"))
        .select($"b", $"lang".as("plang"),
          expr("cbl * 1000000 DIV cb").as("w"))
      val dc = t2.groupBy($"doc_id", $"b").agg(cnt.as("n"))
      val sc = dc.join(broadcast(wts), Seq("b"))
        .groupBy($"doc_id", $"plang").agg(sum($"n" * $"w").as("score"))
      val rn = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"plang".asc)
      val pick = sc.withColumn("rn", row_number().over(rn))
        .filter($"rn" === 1).select($"doc_id", $"plang")
      d.select($"doc_id", $"lang").join(pick, Seq("doc_id"), "left")
        .select($"doc_id", $"lang",
          coalesce($"plang", lit("und")).as("pred_lang"),
          ($"doc_id" % 2 === 0).as("is_train"),
          (coalesce($"plang", lit("")) === $"lang").as("correct"))
        .orderBy($"doc_id")
    }
  }

  /** x75 — STREAMING ingest near-dup dedup: x71's signature-store
    * lifecycle driven by Structured Streaming. The two ingest batches
    * arrive as parquet files in a watched feed directory (tmp+rename
    * atomic against the source's concurrent listing, the x69 rule),
    * and [[graft.operators.MinhashSignatureStore.dedupStream]]'s
    * ledgered foreachBatch probes each micro-batch against history ∪
    * earlier batches, persists its verdicts, and appends its kept
    * docs. Batching is semantics-identical to the batch lifecycle
    * (the x70 ≡ x65b argument, here for dedup), so the oracle is
    * x71's SQL verbatim; StreamingSpec additionally pins stream ≡
    * batch row-for-row and the ledger's replay skip.
    */
  def x75StreamDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mss = graft.operators.MinhashSignatureStore
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val root = scratchDir(s, "x75", dir)
    val store = root + "/store"
    copyStore(s, pristineStoreFor(s, dir), store)
    val feedP = new org.apache.hadoop.fs.Path(root + "/feed")
    val ffs = feedP.getFileSystem(s.sparkContext.hadoopConfiguration)
    ffs.mkdirs(feedP)
    // one-file batch arrival: stage the parquet elsewhere, rename the
    // finished part file into the watched dir (rename is the atomicity
    // boundary the file source's listing needs)
    def arrive(batch: DataFrame, name: String): Unit = {
      val stage = new org.apache.hadoop.fs.Path(root + s"/stage_$name")
      batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = ffs.listStatus(stage).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"x75: no part file staged for $name"))
      val dest = new org.apache.hadoop.fs.Path(feedP, s"$name.parquet")
      // a false return (e.g. stale destination) would silently deliver
      // no batch and surface later as a baffling missing-verdict read
      if (!ffs.rename(part, dest))
        sys.error(s"x75: rename $part -> $dest failed")
    }
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedP.toString)
    val q = mss.dedupStream(stream, store, root + "/verdicts", Perms,
      MinhashJaccardThreshold, root + "/ckpt")
    try {
      arrive(docs.filter($"doc_id" % 8 === 1), "b1")
      q.processAllAvailable()
      arrive(docs.filter($"doc_id" % 8 === 5), "b2")
      q.processAllAvailable()
    } finally q.stop()
    val v1 = s.read.parquet(root + "/verdicts/batch-0")
    val v2 = s.read.parquet(root + "/verdicts/batch-1")
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"doc_id", $"batch", $"keep", $"n_dups", $"max_jaccard")
      .orderBy($"doc_id")
  }
  /** x76 — ANN index-quality audit: the recall-vs-cost tuning curve a
    * production vector store monitors continuously. For each probe and
    * each nprobe ∈ {1, 2, 4}, compare cell-pruned search (the x13/x65
    * IVF scheme: 16 seed centroids, argmax assignment, probe the
    * top-nprobe cells) against the exhaustive ground truth, reporting
    * the candidate count actually scanned (the cost dial) and
    * recall@3 (the quality dial). This is how nprobe gets CHOSEN — the
    * audit makes the trade measurable instead of folklore.
    *
    * Scale shape: assignment and probe-cell ranking are broadcast
    * scoring against one corpus scan (16 rows broadcast); the
    * all-pairs probe×corpus scoring is ONE pass (10 probes broadcast —
    * vec_id 0–9, of which 1–9 double as centroids; ADVICE r13 pinned
    * the count to what the filter and the oracle actually select),
    * persisted for its two consumers (truth + the nprobe arms); every
    * argmax/top-k is a row_number window partitioned by probe —
    * |corpus| rows per partition at most, never a global sort. At
    * 100 TB the audit runs on a SAMPLE of probes (as here: 10), so its
    * cost is probes × corpus — linear in the corpus — while the thing
    * it audits (the serving path) stays cell-pruned. Exact-decimal
    * scoring makes both arms bit-reproducible, hence hash-gateable.
    */
  def x76AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val corpus = e.filter($"vec_id" >= 10)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("p"))
    val aw = Window.partitionBy($"vec_id").orderBy($"d".desc, $"cid".asc)
    val assign = corpus.crossJoin(broadcast(cents))
      .withColumn("d", VectorFns.dotDec("v", "c"))
      .withColumn("rn", row_number().over(aw)).filter($"rn" === 1)
      .select($"vec_id", $"cid".as("cell"))
    val pw = Window.partitionBy($"p_id").orderBy($"d".desc, $"cid".asc)
    val pcells = probes.crossJoin(broadcast(cents))
      .withColumn("d", VectorFns.dotDec("p", "c"))
      .withColumn("pcrank", row_number().over(pw)).filter($"pcrank" <= 4)
      .select($"p_id", $"cid".as("cell"), $"pcrank")
    val scoredAll0 = corpus.crossJoin(broadcast(probes))
      .withColumn("score", VectorFns.dotDec("v", "p"))
      .select($"p_id", $"vec_id", $"score")
    graft.Caching.withPersisted(scoredAll0) { scoredAll =>
      val tw = Window.partitionBy($"p_id").orderBy($"score".desc, $"vec_id".asc)
      val truth = scoredAll.withColumn("rk", row_number().over(tw))
        .filter($"rk" <= 3).select($"p_id", $"vec_id")
      val cand = scoredAll
        .join(assign, Seq("vec_id"))
        .join(pcells, Seq("p_id", "cell"))
        .select($"p_id", $"vec_id", $"score", $"pcrank",
          explode(typedLit(Seq(1L, 2L, 4L))).as("nprobe"))
        .filter($"pcrank" <= $"nprobe")
      val scanned = cand.groupBy($"p_id", $"nprobe").agg(cnt.as("n_scanned"))
      val iw = Window.partitionBy($"p_id", $"nprobe")
        .orderBy($"score".desc, $"vec_id".asc)
      val ivf3 = cand.withColumn("rk", row_number().over(iw))
        .filter($"rk" <= 3).select($"p_id", $"nprobe", $"vec_id")
      val hits = ivf3.join(truth, Seq("p_id", "vec_id"), "left_semi")
        .groupBy($"p_id", $"nprobe").agg(cnt.as("n_hits"))
      // every (probe, nprobe) emits a row even when the probed cells
      // are empty — an empty-scan audit row is a finding, not a gap
      probes.select($"p_id")
        .crossJoin(broadcast(Seq(1L, 2L, 4L).toDF("nprobe")))
        .join(scanned, Seq("p_id", "nprobe"), "left")
        .join(hits, Seq("p_id", "nprobe"), "left")
        .select($"p_id", $"nprobe",
          coalesce($"n_scanned", lit(0L)).as("n_scanned"),
          coalesce($"n_hits", lit(0L)).as("n_hits"),
          round(coalesce($"n_hits", lit(0L)) / lit(3.0), 6).as("recall"))
        .orderBy($"p_id", $"nprobe")
    }
  }
  /** x76b — the x76 recall/cost audit ACROSS MAINTENANCE (VERDICT r14
    * #3): the x65c lifecycle (build at 16 seed cells, one
    * `optimize(⌊n/16⌋)` pass) runs for real on a scratch index, the
    * pre- and post-optimize layouts are snapshotted, and both phases
    * run the identical recall@3 / scanned-rows audit against the
    * exhaustive decimal truth. The output hash-gates the exact recall
    * delta an optimize causes at each nprobe — the number that was
    * folklore while x76 audited only the static 16-cell scheme
    * (splitting changes which cells rank top-nprobe, so verdicts and
    * recall MAY shift across maintenance; this key measures instead
    * of assuming). Scale shape: the audit is the same
    * brute-force-bounded shape as x76 (it exists to certify the
    * approximation, so it pays one corpus × probes decimal pass by
    * design); the lifecycle under audit is the production operator
    * itself, not a simulation.
    */
  def x76bAnnRecallMaintained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val corpus = e.filter($"vec_id" >= 10)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("p_id"), $"v".as("p"))
    val path = scratchDir(s, "x76b", dir) + "/index"
    graft.operators.AnnIndex.build(corpus.select($"vec_id", $"v"), cents, path)
    // pre-optimize assignment snapshot: EAGER — a lazy read would
    // chase the post-swap file listing after optimize rewrites cells
    val assign0 = s.read.parquet(path)
      .select($"vec_id", $"cell".cast(LongType).as("cell"))
      .localCheckpoint(true)
    val nC = corpus.count()
    val refreshed = graft.operators.AnnIndex.optimize(
      s, path, cents, math.max(1L, nC / 16))
    val assign1 = s.read.parquet(path)
      .select($"vec_id", $"cell".cast(LongType).as("cell"))
    val scoredAll0 = corpus.crossJoin(broadcast(probes))
      .withColumn("score", VectorFns.dotDec("v", "p"))
      .select($"p_id", $"vec_id", $"score")
    graft.Caching.withPersisted(scoredAll0) { scoredAll =>
      val tw = Window.partitionBy($"p_id").orderBy($"score".desc, $"vec_id".asc)
      val truth = scoredAll.withColumn("rk", row_number().over(tw))
        .filter($"rk" <= 3).select($"p_id", $"vec_id")
      // one phase of the x76 audit over a given (assignment, centroid
      // set) pair — `pre` is the built 16-cell layout, `post` the
      // optimize-refreshed one
      def phase(name: String, assign: DataFrame, cs: DataFrame): DataFrame = {
        val pw = Window.partitionBy($"p_id").orderBy($"d".desc, $"cid".asc)
        val pcells = probes.crossJoin(broadcast(cs))
          .withColumn("d", VectorFns.dotDec("p", "c"))
          .withColumn("pcrank", row_number().over(pw)).filter($"pcrank" <= 4)
          .select($"p_id", $"cid".as("cell"), $"pcrank")
        val cand = scoredAll
          .join(assign, Seq("vec_id"))
          .join(pcells, Seq("p_id", "cell"))
          .select($"p_id", $"vec_id", $"score", $"pcrank",
            explode(typedLit(Seq(1L, 2L, 4L))).as("nprobe"))
          .filter($"pcrank" <= $"nprobe")
        val scanned = cand.groupBy($"p_id", $"nprobe").agg(cnt.as("n_scanned"))
        val iw = Window.partitionBy($"p_id", $"nprobe")
          .orderBy($"score".desc, $"vec_id".asc)
        val ivf3 = cand.withColumn("rk", row_number().over(iw))
          .filter($"rk" <= 3).select($"p_id", $"nprobe", $"vec_id")
        val hits = ivf3.join(truth, Seq("p_id", "vec_id"), "left_semi")
          .groupBy($"p_id", $"nprobe").agg(cnt.as("n_hits"))
        probes.select($"p_id")
          .crossJoin(broadcast(Seq(1L, 2L, 4L).toDF("nprobe")))
          .join(scanned, Seq("p_id", "nprobe"), "left")
          .join(hits, Seq("p_id", "nprobe"), "left")
          .select($"p_id", lit(name).as("phase"), $"nprobe",
            coalesce($"n_scanned", lit(0L)).as("n_scanned"),
            coalesce($"n_hits", lit(0L)).as("n_hits"),
            round(coalesce($"n_hits", lit(0L)) / lit(3.0), 6).as("recall"))
      }
      phase("pre", assign0, cents)
        .unionByName(phase("post", assign1, refreshed.select($"cid", $"c")))
        .orderBy($"p_id", $"phase", $"nprobe")
    }
  }

  /** x77 — embedding-space drift monitor: the snapshot-over-snapshot
    * audit an embedding pipeline runs when the encoder, the corpus
    * mix, or an upstream filter changes. The even/odd vec_id halves
    * stand in for consecutive snapshots; per label, the monitor
    * reports the L1 distance between the halves' mean vectors (the
    * drift score) and the single most-drifting dimension.
    *
    * Exactness: per-(label, half, dim) sums accumulate in DECIMAL
    * (the q26 idiom), and the per-dimension comparison is the
    * CROSS-MULTIPLIED |sa·nb − sb·na| — no division until the final
    * display cast, so the ranking (which dimension drifts most) is
    * bit-reproducible and the whole audit hash-gates. Scale shape:
    * ONE corpus scan into a (label × 2 × dims)-row aggregate; all
    * downstream joins/windows run on that metadata-sized frame. At
    * 100 TB the scan is the cost and it is embarrassingly parallel;
    * counts beyond ~3·10⁹ per (label, half) would need the
    * cross-multiplication widened past DECIMAL(38) — the audit
    * samples per label long before that.
    */
  def x77EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = t(s, dir, "embeddings")
      .select($"label", ($"vec_id" % 2 === 0).as("old"),
        posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"label", $"old", $"pos")
      .agg(sum($"x".cast(DoubleType).cast(DecimalType(30, 12))).as("sv"),
        cnt.as("n"))
    val byDim = per.filter($"old")
      .select($"label", $"pos", $"sv".as("sa"), $"n".as("na"))
      .join(per.filter(!$"old")
        .select($"label", $"pos", $"sv".as("sb"), $"n".as("nb")),
        Seq("label", "pos"))
      .withColumn("dd", abs($"sa" * $"nb" - $"sb" * $"na"))
    graft.Caching.withPersisted(byDim) { d =>
      val w = Window.partitionBy($"label").orderBy($"dd".desc, $"pos".asc)
      val top = d.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"label", ($"pos" + 1).cast(LongType).as("top_dim"),
          ($"dd".cast(DoubleType) / ($"na" * $"nb")).as("tdrift"))
      d.groupBy($"label")
        .agg(max($"na").as("n_old"), max($"nb").as("n_new"),
          round(sum($"dd").cast(DoubleType) / (max($"na") * max($"nb")), 6)
            .as("drift"))
        .join(top, Seq("label"))
        .select($"label", $"n_old", $"n_new", $"drift", $"top_dim",
          round($"tdrift", 6).as("top_drift"))
        .orderBy($"label")
    }
  }

  /** x71/x78 scale accounting ([[graft.MinhashDiag]] `x71` mode,
    * VERDICT r12 #4): for batch 1 of the lifecycle at this corpus
    * scale, the candidate volume, the ≥-threshold match volume (what
    * the census contract must verify), and the short-circuit mode's
    * actually-verified pair count with its census-identical verdict
    * tally — the numbers that attribute the census keys' superlinear
    * bench steps to match DENSITY (corpus property) vs plan cost, and
    * prove the verdict-only bound empirically at every scale.
    */
  private[graft] def x71Diag(s: SparkSession, dir: String): Seq[(String, Long)] = {
    import s.implicits._
    val mss = graft.operators.MinhashSignatureStore
    val docs = t(s, dir, "documents").select($"doc_id", $"text")
    val b1 = docs.filter($"doc_id" % 8 === 1)
    val store = pristineStoreFor(s, dir) // probes are read-only
    val t0 = System.nanoTime()
    val census = mss.probeStats(s, b1, store, Perms, MinhashJaccardThreshold)
    val t1 = System.nanoTime()
    val st = mss.dedupVerdictsWithStats(
      s, b1, store, Perms, MinhashJaccardThreshold)
    val nKept = st.verdicts.filter($"keep").count()
    val t2 = System.nanoTime()
    census ++ Seq(
      "verdict_cand_pairs" -> st.generatedPairs,
      "verdict_verify_pairs" -> st.verifiedPairs,
      "verdict_kept" -> nKept,
      "census_probe_ms" -> (t1 - t0) / 1000000L,
      "verdict_probe_ms" -> (t2 - t1) / 1000000L)
  }

  /** x78 — VERDICT-ONLY incremental near-dup dedup (VERDICT r12 #1):
    * x71's exact lifecycle (build history store → dedup batch 1 →
    * append keepers → dedup batch 2) driven through
    * [[graft.operators.MinhashSignatureStore.dedupVerdicts]], the
    * short-circuit mode that stops verifying a doc at its first
    * confirmed ≥-threshold match. Keep/drop decisions are CONTRACT-
    * identical to x71's census mode (the oracle is x71's SQL projected
    * to the keep column), but verify volume is bounded at ~chunk ×
    * |batch| on match-dense corpora instead of |batch| × |matched
    * history| — the difference between sf² and ~linear scaling on a
    * duplicate-heavy crawl (census sf1→sf5 was 27.5→242.8 s; this
    * path's A/B lives in SCALE.md). The returned verdicts are
    * materialized by the operator's round loop, so the append-after-
    * verdict ordering needs no explicit parquet bounce here.
    */
  def x78DedupVerdicts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val mss = graft.operators.MinhashSignatureStore
    // same shared read-only store states as x71 (VERDICT r13 #6); the
    // mode under test is the PROBE, which is exactly what still runs
    // here per rep — the append between the probes is fixture state
    // (itself built via dedupVerdicts, so the x78 lifecycle's append
    // leg runs once per JVM too). The two probes run concurrently
    // ([[parProbes]]): the verdict ladder is ~6 driver-sequenced jobs
    // per probe, and the second probe's tasks fill the first's
    // scheduler-latency gaps.
    val pristine = pristineStoreFor(s, dir)
    val postB1 = postB1StoreFor(s, dir)
    val (v1, v2) = parProbes(s, smallStoreProbe(s, postB1))(
      s1 => mss.dedupVerdicts(s1,
        t(s1, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 8 === 1),
        pristine, Perms, MinhashJaccardThreshold),
      s2 => mss.dedupVerdicts(s2,
        t(s2, dir, "documents").select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 8 === 5),
        postB1, Perms, MinhashJaccardThreshold))
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"doc_id", $"batch", $"keep")
      .orderBy($"doc_id")
  }

  /** x79 — cross-run incremental SEMANTIC dedup (the embedding leg of
    * the incremental dedup family; x20 = exact keys, x71/x78 = token
    * near-dup, THIS = embedding cosine): maintain a persistent
    * cell-partitioned ANN index ([[graft.operators.AnnIndex]]) of all
    * ingested embeddings, near-dedup each new batch against it with
    * cell-pruned exact-decimal cosine
    * ([[graft.operators.AnnIndex.dedupAgainst]]), append only the
    * KEPT vectors, repeat. The lifecycle mirrors x71: history index →
    * dedup batch 1 → append its keepers → dedup batch 2 against the
    * grown index; a batch-2 vector matching only a DROPPED batch-1
    * vector survives (dropped vectors never enter the index).
    *
    * Cell pruning (nprobe = 2 of 16 seed cells) is the IVF serving
    * approximation, applied DETERMINISTICALLY (x65's argmax and
    * tie rules), so the verdicts are exact to replay: the oracle
    * re-derives assignment, probe cells, and the thresholded cosine
    * census relationally. In-corpus semantic dedup of a single batch
    * is x61/x62's job — the pipeline runs that first, then THIS
    * operator enforces the cross-run rule, exactly how the
    * reference's lake splits in-file vs vs-lake dedup (the
    * only-ingest-new-objects rule, src/main_extractor.py:400-436).
    * Scale: probes broadcast, index scan statically cell-pruned,
    * O(batch) appends, [[graft.operators.AnnIndex.optimize]] as the
    * occupancy-maintenance hook — the index is never shuffled.
    */
  def x79SemdedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ann = graft.operators.AnnIndex
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    // vec_id 0–16 serve as probes/planes/centroids across the x05–x76
    // family — the ingest pool starts at 17 so the fixture roles stay
    // disjoint (centroids in the pool would self-assign trivially)
    val pool = e.filter($"vec_id" >= 17)
    val b1 = pool.filter($"vec_id" % 4 === 1)
    val b2 = pool.filter($"vec_id" % 4 === 3)
    // the two index states are shared READ-ONLY fixtures (probing
    // never mutates; the x71/x78 adjudication, VERDICT r13 #6): batch
    // 1 probes pristine history, batch 2 probes the post-append state
    // [[postB1AnnIndexFor]] — the deterministic mutation between them
    // builds once per (JVM, dir) instead of once per rep. No ordering
    // hazard remains (nothing here mutates either fixture), so the
    // verdict frames stay lazy.
    val v1 = ann.dedupAgainst(s, pristineAnnIndexFor(s, dir), b1, cents,
      nprobe = 2, EmbedCosThreshold)
    val v2 = ann.dedupAgainst(s, postB1AnnIndexFor(s, dir), b2, cents,
      nprobe = 2, EmbedCosThreshold)
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"vec_id", $"batch", $"keep", $"n_dups", $"max_cos")
      .orderBy($"vec_id")
  }

  /** x80 — x79's lifecycle driven through Structured Streaming (the
    * embedding analog of x75): the history index is built once, then
    * each batch ARRIVES as a file in a watched directory and flows
    * through [[graft.operators.AnnIndex.dedupStream]] — verdicts land
    * per micro-batch, keepers append, the ledger makes replay
    * idempotent. Batching is semantics-irrelevant (each micro-batch
    * probes history ∪ earlier kept batches, exactly the x79 rule), so
    * the drained stream's verdicts replay against the identical
    * oracle SQL. This is the production shape of cross-run semantic
    * dedup: a 100 TB ingest doesn't get handed tidy batch frames — it
    * watches an arrival directory, and the index, the verdict log,
    * and the replay ledger all advance exactly once per delivered
    * batch, crash or no crash.
    */
  def x80SemdedupStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ann = graft.operators.AnnIndex
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val pool = e.filter($"vec_id" >= 17)
    val root = scratchDir(s, "x80", dir)
    val path = root + "/index"
    // the pristine history index is the shared fixture; the streamed
    // lifecycle appends, so it works on its own file copy
    copyStore(s, pristineAnnIndexFor(s, dir), path)
    val feedP = new org.apache.hadoop.fs.Path(root + "/feed")
    val ffs = feedP.getFileSystem(s.sparkContext.hadoopConfiguration)
    ffs.mkdirs(feedP)
    // one-file batch arrival (the x75 pattern): stage elsewhere,
    // rename the finished part file into the watched dir — rename is
    // the atomicity boundary the file source's listing needs
    def arrive(batch: DataFrame, name: String): Unit = {
      val stage = new org.apache.hadoop.fs.Path(root + s"/stage_$name")
      batch.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = ffs.listStatus(stage).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"x80: no part file staged for $name"))
      val dest = new org.apache.hadoop.fs.Path(feedP, s"$name.parquet")
      // a false return (e.g. stale destination) would silently deliver
      // no batch and surface later as a baffling missing-verdict read
      if (!ffs.rename(part, dest))
        sys.error(s"x80: rename $part -> $dest failed")
    }
    val stream = s.readStream.schema(pool.schema)
      .option("maxFilesPerTrigger", 1).parquet(feedP.toString)
    val q = ann.dedupStream(stream, path, root + "/verdicts", cents,
      nprobe = 2, EmbedCosThreshold, root + "/ckpt")
    try {
      arrive(pool.filter($"vec_id" % 4 === 1), "b1")
      q.processAllAvailable()
      arrive(pool.filter($"vec_id" % 4 === 3), "b2")
      q.processAllAvailable()
    } finally q.stop()
    val v1 = s.read.parquet(root + "/verdicts/batch-0")
    val v2 = s.read.parquet(root + "/verdicts/batch-1")
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"vec_id", $"batch", $"keep", $"n_dups", $"max_cos")
      .orderBy($"vec_id")
  }

  /** x81 — verdict-only incremental semantic dedup: x79's lifecycle
    * through [[graft.operators.AnnIndex.dedupVerdicts]], the x78
    * analog for embeddings. Keep/drop must equal the census
    * lifecycle's decisions exactly (the census statistics are the
    * only thing the mode drops), so the oracle is x79's SQL projected
    * to the keep column. What the mode buys: the census pays the
    * exact-decimal kernel on EVERY matching pair (max_cos is part of
    * its hash-gated output), which on a duplicate-heavy corpus is
    * BigDecimal work proportional to the dup-pair volume; the verdict
    * pays decimal only on the ±1e-9 double/decimal disagreement band
    * — the production keep/drop cost is one codegen pass over the
    * probed cells regardless of match density.
    */
  def x81SemdedupVerdicts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ann = graft.operators.AnnIndex
    val e = emb(s, dir)
    val cents = e.filter($"vec_id".between(1, 16))
      .select($"vec_id".as("cid"), $"v".as("c"))
    val pool = e.filter($"vec_id" >= 17)
    val b1 = pool.filter($"vec_id" % 4 === 1)
    val b2 = pool.filter($"vec_id" % 4 === 3)
    // same shared read-only index states as x79; the mode under test
    // is the PROBE, which is exactly what runs here per rep
    val v1 = ann.dedupVerdicts(s, pristineAnnIndexFor(s, dir), b1, cents,
      nprobe = 2, EmbedCosThreshold)
    val v2 = ann.dedupVerdicts(s, postB1AnnIndexFor(s, dir), b2, cents,
      nprobe = 2, EmbedCosThreshold)
    v1.withColumn("batch", lit("b1"))
      .unionByName(v2.withColumn("batch", lit("b2")))
      .select($"vec_id", $"batch", $"keep")
      .orderBy($"vec_id")
  }
}
