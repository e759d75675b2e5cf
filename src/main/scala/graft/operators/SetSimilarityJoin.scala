package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact Jaccard set-similarity self-join — all pairs of documents
  * with token-set Jaccard ≥ threshold — with three physical strategies
  * the engine picks between at plan time (the reference's "adaptive
  * strategy switch" pattern, main_extractor.py:374-384, applied to a
  * similarity operator):
  *
  *  1. **Bitset + size filter** (|vocabulary| ≤ 64): each set becomes
  *     one 64-bit mask; identical sets collapse before pairing; the
  *     PPJoin-style size filter (J ≥ t ⟹ |B| ∈ [t·|A|, |A|/t])
  *     generates candidates through an equi-join on set size, and
  *     Jaccard is two `bit_count` instructions. Intermediate volume is
  *     O(distinct-masks × window) instead of Σ_tok n_tok² — at sf0.1
  *     this is ~4M cheap rows where the token-index join explodes to
  *     ~700M.
  *  2. **Banded multi-word masks** (64 < |vocab| ≤ 1024 and the
  *     threshold is tight enough, see below): each set becomes an
  *     array of ⌈V/64⌉ longs; identical sets still collapse first.
  *     J ≥ t bounds the symmetric difference: |A△B| ≤ (1−t)/t·|A∩B|
  *     ≤ u := ⌊(1−t)/t · max set size⌋ differing BITS — so splitting
  *     the mask into u+1 contiguous word-slices guarantees (pigeonhole)
  *     that a qualifying pair agrees EXACTLY on at least one slice.
  *     Candidates come from an equi-join on (band, slice-value) + the
  *     size filter; a pair colliding in several bands is kept only at
  *     its FIRST equal band (in-join filter on the carried masks — the
  *     x02 lesson, no distinct() shuffle); verify is exact multi-word
  *     bit_count. Deterministic, zero false negatives. This is the
  *     dense-small-vocab regime where prefix filtering degenerates
  *     (every token is hot, so rare-prefix candidate sets collapse to
  *     the same few tokens) and the size filter alone pairs every
  *     replica of the corpus with every other (the sf1 rehearsal
  *     measured that cliff: 1.6 s → 381 s at 10× when the old switch
  *     fell from strategy 1 to strategy 3).
  *  3. **Shared-token candidate join** (general vocabulary): distinct
  *     (doc, token) index, equi-join on token, group per pair. Never a
  *     cartesian: pairs only materialize through the token index. At
  *     100 TB this is the exact-verify stage behind MinHash/LSH
  *     banding (see Extras.x02), not a standalone all-pairs scan —
  *     it also stays the right path for SPARSE small-vocab corpora
  *     (rare tokens ⇒ tiny per-token groups), the regime where banding
  *     loses its pigeonhole bound (u+1 > word count).
  *
  * All strategies produce bit-identical output: (d1 < d2, jaccard)
  * with jaccard = |∩| / |∪| as an exact integer ratio in double.
  */
object SetSimilarityJoin {

  /** Largest vocabulary the multi-word mask path will index (16 words
    * = 128 bytes per distinct set — still a cheap wide row).
    */
  private val MaxMaskBits = 1024

  /** items: (doc_id, tok) DISTINCT pairs. */
  def jaccardSelfJoin(items: DataFrame, threshold: Double): DataFrame = {
    val vocab = items.select(col("tok")).distinct()
    // limit(MaxMaskBits+1) short-circuits the strategy probe: the scan
    // stops as soon as the vocabulary provably exceeds every mask
    // strategy instead of counting the whole vocabulary (a full extra
    // shuffle at scale)
    val vCount = vocab.limit(MaxMaskBits + 1).count()
    if (vCount <= 64) bitsetPath(items, vocab, threshold)
    else if (vCount <= MaxMaskBits) {
      // one scheduler-sized scalar: the largest set size bounds the
      // symmetric difference u of any qualifying pair
      val maxSz = items.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      val u = math.floor((1 - threshold) / threshold * maxSz).toInt
      val words = ((vCount + 63) / 64).toInt
      if (u + 1 <= words) bandedMaskPath(items, vocab, threshold, words, u)
      else tokenJoinPath(items, threshold)
    } else tokenJoinPath(items, threshold)
  }

  /** Bit index for a ≤64-token vocabulary: one single-row aggregate
    * holding the sorted vocab array (rank = array position), instead of
    * a partitionless window (which would drag all rows to one partition
    * and warn — harmless at 64 rows, wrong as a pattern).
    */
  private def docMasks(items: DataFrame, vocab: DataFrame): DataFrame = {
    val varr = vocab.agg(sort_array(collect_list(col("tok"))).as("varr"))
    items.crossJoin(broadcast(varr))
      .groupBy(col("doc_id"))
      .agg(sum(expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(array_position(varr, tok) - 1 AS INT))"))
        .as("mask"))
  }

  /** Strategy 1: bitset masks + threshold-derived size filter. */
  private[operators] def bitsetPath(items: DataFrame, vocab: DataFrame,
      threshold: Double): DataFrame = {
    val masks = docMasks(items, vocab)
    // collapse identical sets; keep the member list for re-expansion
    val groups = masks.groupBy(col("mask"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .withColumn("sz", expr("bit_count(mask)"))
    // size filter: J >= t  ==>  |B| in [ceil(t*|A|), floor(|A|/t)]
    val probes = groups.select(col("mask").as("m1"), col("docs").as("docs1"),
      explode(sequence(
        ceil(col("sz") * lit(threshold)).cast(IntegerType),
        floor(col("sz") / lit(threshold)).cast(IntegerType))).as("szb"))
    val cands = probes.join(
        groups.select(col("mask").as("m2"), col("docs").as("docs2"),
          col("sz").as("sz2")),
        col("szb") === col("sz2"))
      .filter(col("m1") <= col("m2")) // each unordered mask pair once
    val scored = cands
      .withColumn("inter", expr("bit_count(m1 & m2)"))
      .withColumn("uni", expr("bit_count(m1 | m2)"))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .filter(col("jaccard") >= threshold)
    // expand mask pairs back to doc pairs (same-mask groups pair within)
    scored
      .select(col("docs1"), col("docs2"), col("jaccard"),
        (col("m1") === col("m2")).as("same"))
      .select(explode(col("docs1")).as("da"), col("docs2"), col("jaccard"), col("same"))
      .select(col("da"), explode(col("docs2")).as("db"), col("jaccard"), col("same"))
      .filter(!col("same") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("jaccard"))
  }

  /** Multi-word bit masks for a ≤[[MaxMaskBits]]-token vocabulary:
    * (doc_id, mask array<bigint> of `words` longs). The global bit
    * index is a broadcast (rank, tok) table built by posexploding ONE
    * sorted-vocab aggregate row — a hash-join lookup per item row, not
    * an O(V) array_position scan per row and not a global window.
    */
  private def multiWordMasks(items: DataFrame, vocab: DataFrame,
      words: Int): DataFrame = {
    val ranks = vocab.agg(sort_array(collect_list(col("tok"))).as("varr"))
      .select(posexplode(col("varr")).as(Seq("p", "tok")))
    val wordCols = (0 until words).map { w =>
      sum(expr(s"CASE WHEN p DIV 64 = $w THEN " +
        "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) ELSE 0 END"))
        .as(s"_w$w")
    }
    items.join(broadcast(ranks), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(wordCols.head, wordCols.tail: _*)
      .select(col("doc_id"),
        array((0 until words).map(w => col(s"_w$w")): _*).as("mask"))
  }

  /** Strategy 2: banded multi-word masks (dense medium vocabulary).
    * Requires u + 1 ≤ words (the pigeonhole bound); `u` is the maximum
    * possible |A△B| in bits for a qualifying pair.
    */
  private[operators] def bandedMaskPath(items: DataFrame, vocab: DataFrame,
      threshold: Double, words: Int, u: Int): DataFrame = {
    graft.expressions.MaskPairStats.register(items.sparkSession)
    // collapse identical sets before pairing; gid = min doc_id is a
    // unique, deterministic group key for unordered-pair canonicalization.
    // The group frame feeds THREE subtrees of the one returned plan
    // (identical pairs + both join sides), so it rides withPersisted —
    // the items explode+distinct upstream is computed once, and the
    // cache releases after the caller's first terminal action
    val groupsRaw = multiWordMasks(items, vocab, words)
      .groupBy(col("mask"))
      .agg(min(col("doc_id")).as("gid"), collect_list(col("doc_id")).as("docs"))
      .withColumn("sz", expr("aggregate(mask, 0, (acc, x) -> acc + bit_count(x))"))
    graft.Caching.withPersisted(groupsRaw)(buildBandedFrom(_, threshold, words, u))
  }

  private def buildBandedFrom(groups: DataFrame, threshold: Double,
      words: Int, u: Int): DataFrame = {
    val nBands = u + 1
    // contiguous word-slices; every band ≥ 1 word since nBands <= words.
    // The base/remainder split MUST match MaskPairStatsOps.compute
    val base = words / nBands
    val rem = words % nBands
    val lens = (0 until nBands).map(i => base + (if (i < rem) 1 else 0))
    val starts = lens.scanLeft(1)(_ + _) // slice() is 1-based
    def bandOf(mask: Column, i: Int): Column =
      slice(mask, starts(i), lens(i))

    // intra-group pairs: identical sets are J = 1.0 ≥ t by definition
    val identical = groups.filter(size(col("docs")) > 1)
      .select(explode(col("docs")).as("da"), col("docs"))
      .select(col("da"), explode(col("docs")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da").as("d1"), col("db").as("d2"), lit(1.0).as("jaccard"))

    // the join key is (band, xxhash64(slice)) — a plain long that
    // hash-partitions and hash-joins (an ARRAY equi-key would keep the
    // join off the hash path); a 2⁻⁶⁴ hash collision only ever ADDS a
    // candidate, because both the first-equal-band filter and the
    // verify below recheck the real masks
    val banded = groups.select(col("gid"), col("docs"), col("sz"), col("mask"),
      explode(array((0 until nBands).map(i =>
        struct(lit(i).as("band"),
          xxhash64(lit(i), bandOf(col("mask"), i)).as("bvh"))): _*))
        .as("bs"))
      .select(col("gid"), col("docs"), col("sz"), col("mask"),
        col("bs.band").as("band"), col("bs.bvh").as("bvh"))
    val a = banded.select(col("gid").as("g1"), col("docs").as("docs1"),
      col("sz").as("sz1"), col("mask").as("m1"), col("band"), col("bvh"))
    val b = banded.select(col("gid").as("g2"), col("docs").as("docs2"),
      col("sz").as("sz2"), col("mask").as("m2"),
      col("band").as("band2"), col("bvh").as("bvh2"))
    // ONE codegen kernel call per collision row computes (first equal
    // band, |∩|, |∪|) — the first-band condition keeps each pair
    // exactly once without a distinct() shuffle (the x02 lesson), and
    // the packed stats replace two interpreted aggregate(zip_with(...))
    // passes (~70 s of the sf1 q27 tail before the kernel)
    val cross = a.join(b,
        col("band") === col("band2") && col("bvh") === col("bvh2") &&
          col("g1") < col("g2") &&
          col("sz2") >= ceil(col("sz1") * lit(threshold)) &&
          col("sz2") <= floor(col("sz1") / lit(threshold)))
      .withColumn("mps", graft.expressions.MaskPairStats.maskPairStats(
        col("m1"), col("m2"), lit(nBands)))
      .filter(col("band") === (shiftright(col("mps"), 22) - 1))
      .withColumn("inter", shiftright(col("mps"), 11).bitwiseAND(lit(0x7FFL)))
      .withColumn("uni", col("mps").bitwiseAND(lit(0x7FFL)))
      .withColumn("jaccard", col("inter").cast(DoubleType) / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("docs1")).as("da"), col("docs2"), col("jaccard"))
      .select(col("da"), explode(col("docs2")).as("db"), col("jaccard"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("jaccard"))

    identical.unionAll(cross)
  }

  /** Strategy 3: shared-token candidate join (general vocab). Public:
    * it is the straightforward reference strategy the mask paths must
    * agree with (SetSimilarityJoinSpec), and a caller with skewless
    * sparse data may select it directly.
    */
  def tokenJoinPath(items: DataFrame, threshold: Double): DataFrame = {
    // Identical-set compression, like every other rung: the set
    // fingerprint is TextFns.setIdentity (md5 over the length-prefixed
    // NUL-joined sorted token array — injective even for tokens
    // containing NUL, ADVICE r10) — computed inside one doc-keyed
    // aggregate and immediately reduced to 16 bytes, so the array
    // itself is never shuffled. A k-copy
    // duplicate group then costs ONE representative in the token
    // self-join instead of |set|·k²/2 join rows.
    val sets = items.groupBy(col("doc_id"))
      .agg(graft.functions.TextFns.setIdentity(sort_array(collect_list(col("tok")))).as("h"),
        count(lit(1)).as("sz"))
    val gids = sets.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"), collect_list(col("doc_id")).as("members"))
      .drop("h")
    val reps = sets.drop("h").join(gids, Seq("doc_id"))
    graft.Caching.withPersisted(reps) { rp =>
      val repItems = items.join(rp.select(col("doc_id")), Seq("doc_id"), "left_semi")
      val pairs = repItems.as("a").join(repItems.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val cross = pairs
        .join(rp.select(col("doc_id").as("d1"), col("sz").as("sz1"),
          col("members").as("mem1")), Seq("d1"))
        .join(rp.select(col("doc_id").as("d2"), col("sz").as("sz2"),
          col("members").as("mem2")), Seq("d2"))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(explode(col("mem1")).as("a"), col("mem2"), col("jaccard"))
        .select(col("a"), explode(col("mem2")).as("b"), col("jaccard"))
        .select(least(col("a"), col("b")).as("d1"),
          greatest(col("a"), col("b")).as("d2"), col("jaccard"))
      val within = rp.filter(size(col("members")) > 1)
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("d1"), col("b").as("d2"), lit(1.0).as("jaccard"))
      cross.unionByName(within)
    }
  }

  /** PPJoin-style prefix-filtered exact Jaccard self-join for large
    * item spaces (shingles, n-grams): if J(A,B) ≥ t then A and B must
    * share an item within each one's *prefix* — the |d| − ⌈t·|d|⌉ + 1
    * items that are globally rarest (any total order works; we use
    * (frequency asc, item) for determinism). Only prefixes enter the
    * pair join, a size filter (|B| ∈ [t|A|, |A|/t]) prunes further —
    * candidate volume collapses from Σ_item n_item² over the whole
    * index to the same sum over rare-prefix items only (no false
    * negatives) — and the survivors are verified with the
    * [[graft.expressions.SortedIntersectCount]] merge kernel.
    *
    * ONE grouped pass builds everything per doc (VERDICT r03 #2 — the
    * r03 form paid two sort-based windows for the prefix plus a
    * separate collect_list pass for the verify arrays): sorting the
    * (freq, tok) structs once yields the rarity prefix by `slice`, the
    * verify array by re-sorting the projected toks, and the set size
    * by `size`. The per-doc frame fans out to four consumers (both
    * candidate sides, both verify sides), so it is persisted through
    * [[graft.Caching.withPersisted]], which unpersists it after the
    * caller's first terminal action — no cached blocks leak into a
    * shared session (SCALE.md "Unpersist discipline").
    */
  def prefixJaccardSelfJoin(items0: DataFrame, threshold: Double): DataFrame = {
    graft.expressions.SortedIntersectCount.register(items0.sparkSession)
    // the item index is consumed twice (the global frequency table and
    // the per-doc grouped pass) — without the persist, both branches
    // re-derive it from the source (for x04: a full explode+distinct
    // over the corpus, twice)
    graft.Caching.withPersisted(items0) { items =>
    val freq = items.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val perDoc = items.join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("freq"), col("tok")))).as("ft"))
      .withColumn("sz", size(col("ft")))
      .select(col("doc_id"), col("sz"),
        sort_array(transform(col("ft"), _.getField("tok"))).as("arr"),
        transform(
          slice(col("ft"), lit(1),
            (col("sz") - ceil(col("sz") * lit(threshold)) + 1).cast(IntegerType)),
          _.getField("tok")).as("prefix"))
    // Collapse identical item sets BEFORE the prefix stage. Without
    // this, a k-doc exact-duplicate group (the COMMON case in a dedup
    // workload) emits prefix_len × k²/2 pre-distinct join rows — the
    // sf5 rehearsal measured x04 at 44× for 5× data from exactly that
    // multiplicity. Set identity = TextFns.setIdentity (injective
    // length-prefixed encoding — a token CAN contain NUL, since NUL
    // is not whitespace; ADVICE r10), computed ROW-LOCALLY so the
    // grouping shuffle moves 24
    // bytes per doc, not the wide arr/prefix arrays — and the rep
    // join below reuses perDoc's existing hash(doc_id) partitioning,
    // so a dup-free corpus pays almost nothing for the insurance.
    val gids = perDoc
      .select(graft.functions.TextFns.setIdentity(col("arr")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"), collect_list(col("doc_id")).as("members"))
      .drop("h")
    val groupsRaw = perDoc.join(gids, Seq("doc_id"))
    graft.Caching.withPersisted(groupsRaw) { docs =>
      val pre = docs.select(col("doc_id"), col("sz"), explode(col("prefix")).as("tok"))
      val cand = pre.as("a").join(pre.as("b"),
          col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
            col("b.sz") >= ceil(col("a.sz") * lit(threshold)) &&
            col("b.sz") <= floor(col("a.sz") / lit(threshold)))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        // pin the verify stage's parallelism: AQE sizes the candidate
        // exchange by its 16-byte rows (~5 MB at sf0.1) and coalesces to
        // 1–2 partitions, but each row implies heavy downstream work
        // (two array attachments + a merge-intersect kernel) — measured
        // 5.0 s vs 1.1 s at sf0.1. The explicit d1-hash exchange is the
        // partitioning the d1 verify join needs anyway once the per-doc
        // frame outgrows broadcast, so at scale this costs nothing extra.
        // The exchange sits BEFORE the dedup: HashPartitioning(d1)
        // satisfies the (d1, d2) clustering the distinct aggregate
        // needs, so the dedup runs as ONE partition-local hash
        // aggregate on the pinned layout — r10's form paid a second,
        // AQE-coalesced (d1, d2) exchange for the same dedup (the
        // "size-adaptive settings" item of VERDICT r10 #3, resolved by
        // deleting the size-dependent stage instead of tuning it).
        .repartition(items.sparkSession.sessionState.conf.numShufflePartitions,
          col("d1"))
        .distinct()
      val cross = cand
        .join(docs.select(col("doc_id").as("d1"), col("arr").as("a1"),
          col("sz").as("sz1"), col("members").as("mem1")), Seq("d1"))
        .join(docs.select(col("doc_id").as("d2"), col("arr").as("a2"),
          col("sz").as("sz2"), col("members").as("mem2")), Seq("d2"))
        .withColumn("inter",
          graft.expressions.SortedIntersectCount.sortedIntersectCount(col("a1"), col("a2")))
        .withColumn("jaccard",
          col("inter").cast(DoubleType) / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(explode(col("mem1")).as("a"), col("mem2"), col("jaccard"))
        .select(col("a"), explode(col("mem2")).as("b"), col("jaccard"))
        .select(least(col("a"), col("b")).as("d1"),
          greatest(col("a"), col("b")).as("d2"), col("jaccard"))
      // within-group pairs: identical sets, Jaccard exactly 1.0; each
      // doc belongs to exactly one set-group, so cross and within can
      // never emit the same (d1, d2)
      val within = docs.filter(size(col("members")) > 1)
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("d1"), col("b").as("d2"), lit(1.0).as("jaccard"))
      cross.unionByName(within)
    }
    }
  }

}
