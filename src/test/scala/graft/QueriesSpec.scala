package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Extras, Inventory}
import graft.functions.VectorFns

/** Cross-query invariants on sf0.001 — semantic checks the DuckDB hash
  * compare can't express (approx error bounds, stream≡batch, typed-vs-
  * SQL agreement).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("Q10 approx_count_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    // independent recompute of the bound straight off the events table
    // (the query itself now emits the bound as `approx_ok`)
    graft.streaming.Events.batch(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect().foreach { r =>
        val (a, e) = (r.getLong(1), r.getLong(2))
        assert(math.abs(a - e).toDouble / e < 0.05,
          s"${r.getString(0)}: approx $a vs exact $e")
      }
    val rows = Inventory.q10Approx(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: query reports approx out of bound"))
  }

  test("Q28 streaming result equals batch Q20") {
    val batch = Inventory.q20(spark, sf).collect().toSeq
    val stream = Inventory.q28(spark, sf).collect().toSeq
    assert(stream == batch)
  }

  test("Q26 centroid (decimal-exact) agrees with typed Aggregator to 1e-9") {
    import org.apache.spark.sql.functions._
    // independent Aggregator run (the query itself now emits the
    // closeness bound as `agg_close`)
    val centroid = VectorFns.centroidUdaf
    val aggC = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy(col("label")).agg(centroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "v")))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1) + 1L) -> r.getDouble(2)).toMap
    val sqlC = Inventory.q26(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sqlC.keySet == aggC.keySet)
    sqlC.foreach { case (k, v) =>
      assert(math.abs(v - aggC(k)) < 1e-9, s"$k: $v vs ${aggC(k)}")
    }
    val rows = Extras.q26CentroidAgg(spark, sf).collect()
    assert(rows.length == sqlC.size)
    rows.foreach(r => assert(r.getBoolean(2),
      s"(${r.getInt(0)}, ${r.getLong(1)}): query reports agg out of bound"))
  }

  test("CentroidAgg reduce/merge algebra") {
    val a = VectorFns.CentroidAgg
    val b1 = a.reduce(a.reduce(a.zero, Array(1f, 2f)), Array(3f, 4f))
    val b2 = a.reduce(a.zero, Array(5f, 6f))
    val m = a.merge(b1, b2)
    assert(m._2 == 3L)
    assert(a.finish(m).toSeq == Seq(3.0, 4.0))
    assert(a.finish(a.zero).isEmpty)
    assert(a.merge(a.zero, b2)._2 == 1L)
  }

  test("Q27 near-dup pairs are symmetric-free and above threshold") {
    val rows = Inventory.q27(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.9)
    }
  }

  test("x02 MinHash-LSH candidates are a superset-verified subset of exact Q27-style pairs") {
    // every LSH-verified pair at >=0.7 must be a genuinely >=0.7 pair
    val lsh = Extras.x02DedupMinhashLsh(spark, sf).collect()
    assert(lsh.forall(_.getDouble(2) >= Extras.MinhashJaccardThreshold))
    // and at 0.9+, LSH banding (r=4,b=4 => P(cand|J=0.9) ~ 96%) should
    // recover a large fraction of the exact pairs
    val exact09 = Inventory.q27(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = exact09.count(lshPairs.contains)
    assert(recalled.toDouble / exact09.size > 0.5,
      s"LSH recalled $recalled of ${exact09.size} exact 0.9-pairs")
  }

  test("ANN variants: recall@3 vs x05 brute-force truth >= 0.8") {
    // retrieval QUALITY gate (r6 verdict ask #5): determinism is
    // hash-checked by the driver, but nothing else stops a "faster"
    // rewrite from silently trading accuracy. Truth = x05's exact
    // top-3 for probe vec_id 0 (the probe every approximate variant
    // shares); with k=3 the 0.8 bar means all three must be recovered.
    val truth = Extras.x05AnnBrute(spark, sf).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getLong(3)).take(3)
      .map(_.getLong(1)).toSet
    assert(truth.size == 3)
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "x06_ann_lsh" -> Extras.x06AnnLsh(spark, sf),
      "x13_ann_ivf" -> Extras.x13AnnIvf(spark, sf),
      "x21_ann_sq" -> Extras.x21AnnSq(spark, sf),
      "x25_ann_pq" -> Extras.x25AnnPq(spark, sf))
    val recalls = variants.map { case (name, df) =>
      // every variant's output is cosine-desc ordered; top-3 = head(3)
      val got = df.limit(3).collect()
        .map(r => r.getLong(r.fieldIndex("vec_id"))).toSet
      name -> truth.intersect(got).size.toDouble / truth.size
    }
    recalls.foreach { case (name, r) =>
      assert(r >= 0.8, s"$name recall@3 = $r (truth $truth); all: $recalls")
    }
  }

  test("x27 confusion matrix partitions the corpus and is diagonal-heavy") {
    val cm = Extras.x27ClassifyCentroid(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val total = cm.values.sum
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total == nVecs, s"matrix covers $total of $nVecs vectors")
    // the synthetic labels are only loosely clustered (sf0.001
    // accuracy ~0.37); the signal check is "well above 10% chance",
    // not "separable" — correctness itself is the DuckDB hash gate
    val diag = cm.collect { case ((t, p), n) if t == p => n }.sum
    assert(diag.toDouble / total > 0.2, s"accuracy ${diag.toDouble / total}")
  }

  test("x28 votes 5 neighbours per probe and never self-votes") {
    val rows = Extras.x28KnnVote(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val votes = r.getLong(3)
      assert(votes >= 1 && votes <= 5, s"probe ${r.getLong(0)}: $votes votes")
    }
  }

  test("x29 survivors equal x14's distinct clusters, savings bounded") {
    val byLang = Extras.x29DedupSurvivors(spark, sf).collect()
    val kept = byLang.map(_.getLong(2)).sum
    val total = byLang.map(_.getLong(1)).sum
    val clusters = Extras.x14DedupClusters(spark, sf)
      .select("cluster_id").distinct().count()
    assert(kept == clusters, s"$kept survivors vs $clusters clusters")
    byLang.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // kept <= total docs
      assert(r.getLong(4) <= r.getLong(3)) // kept <= total chars
    }
  }

  test("x30 caps every source at 3 docs, ranked by the x08 score") {
    val rows = Extras.x30SourceCaps(spark, sf).collect()
    val scores = Extras.x08QualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, grp) =>
      assert(grp.length <= 3, s"$src kept ${grp.length}")
      // ranks are 1..k and ordered by the published quality score
      val ranked = grp.sortBy(_.getLong(1))
      assert(ranked.map(_.getLong(1)).toSeq == (1L to grp.length).toSeq)
      val s = ranked.map(r => scores(r.getLong(2)))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b }, s"$src not sorted")
    }
  }

  test("x31 packing is contiguous, budget-consistent, and covers every token") {
    val b = Extras.SeqPackBudget
    val rows = Extras.x31SeqPack(spark, sf).collect().sortBy(_.getLong(0))
    // reconstruct each doc's global start offset and check contiguity
    var expectedStart = 0L
    rows.foreach { r =>
      val (nToks, seqFirst, seqOff, nSeqs) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(seqFirst * b + seqOff == expectedStart,
        s"doc ${r.getLong(0)}: start ${seqFirst * b + seqOff} != $expectedStart")
      if (nToks > 0)
        assert(nSeqs == (seqOff + nToks - 1) / b + 1,
          s"doc ${r.getLong(0)}: n_seqs $nSeqs")
      else assert(nSeqs == 0)
      expectedStart += nToks
    }
  }

  test("x32 SCD2 versions chain: contiguous, one current row per key, linked ranges") {
    val rows = Extras.x32Scd2(spark, sf).collect()
    rows.groupBy(r => (r.getLong(0), r.getString(1))).foreach { case (k, grp) =>
      val sorted = grp.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to grp.length).toSeq, s"$k versions")
      assert(grp.count(_.getBoolean(6)) == 1, s"$k current rows")
      assert(sorted.last.getBoolean(6) && sorted.last.isNullAt(5), s"$k tail open")
      sorted.zip(sorted.tail).foreach { case (prev, next) =>
        assert(prev.getString(5) == next.getString(4), s"$k range not linked")
      }
    }
  }

  test("x33 snapshot diff classifies consistently with its own snapshots") {
    val rows = Extras.x33SnapshotDiff(spark, sf).collect()
    rows.foreach { r =>
      val (ct, oldId, newId) = (r.getString(2), r.get(3), r.get(4))
      ct match {
        case "added"   => assert(oldId == null && newId != null)
        case "removed" => assert(oldId != null && newId == null)
        case "changed" => assert(oldId != null && newId != null && oldId != newId)
        case other     => fail(s"unexpected change_type $other")
      }
    }
    // the [Jan 1, Jan 4) vs [Jan 27, Jan 30) retention builds must
    // exercise all three classes at sf0.001
    assert(rows.map(_.getString(2)).distinct.sorted.toSeq ==
      Seq("added", "changed", "removed"))
  }

  test("x34 weighted sample is length-biased: sample mean n_chars > corpus mean") {
    val sample = Extras.x34WeightedSample(spark, sf).collect()
    assert(sample.length == 50)
    assert(sample.map(_.getLong(0)).toSeq == (1L to 50L).toSeq, "ranks 1..50")
    val sampleMean = sample.map(_.getLong(2)).sum.toDouble / sample.length
    val corpusMean = spark.read.parquet(s"$sf/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars"))
      .collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("x35 every packed sequence is exactly full except the final partial") {
    val b = Extras.SeqPackBudget
    val seqs = Extras.x35SeqStats(spark, sf).collect().sortBy(_.getLong(0))
    assert(seqs.nonEmpty)
    // contiguous sequence ids from 0
    assert(seqs.map(_.getLong(0)).toSeq == (0L until seqs.length).toSeq)
    seqs.init.foreach { r =>
      assert(r.getLong(2) == b, s"seq ${r.getLong(0)} holds ${r.getLong(2)}")
      assert(r.getDouble(3) == 1.0)
    }
    assert(seqs.last.getLong(2) <= b)
    // conservation: packed tokens == corpus tokens
    val corpusToks = Extras.x31SeqPack(spark, sf).collect().map(_.getLong(1)).sum
    assert(seqs.map(_.getLong(2)).sum == corpusToks)
  }

  test("x36 sketch-store estimate within 5% of exact distinct users per type") {
    import org.apache.spark.sql.functions._
    // independent recompute of the daily-sketch merge bound (the query
    // itself now emits the bound as `approx_ok`)
    val est = graft.streaming.Events.batch(spark, sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.streaming.Events.batch(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(est(k) - e).toDouble / e < 0.05,
        s"$k: sketch ${est(k)} vs exact $e")
    }
    val rows = Extras.x36SketchStore(spark, sf).collect()
    assert(rows.map(r => r.getString(0)).toSet == exact.keySet)
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: query reports sketch estimate out of bound"))
  }

  test("x37 overlap pairs are canonical and Jaccard-bounded") {
    val rows = Extras.x37SourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "src_a < src_b canonical form")
      assert(r.getLong(2) > 0)
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
  }

  test("x38 cascade keeps the majority and attributes every drop to one rule") {
    val rows = Extras.x38FilterCascade(spark, sf).collect()
    val kept = rows.count(_.getInt(6) == 1)
    assert(kept > rows.length / 2, "thresholds sit at the tails, most docs keep")
    rows.foreach { r =>
      val hasRule = !r.isNullAt(5)
      assert(hasRule == (r.getInt(6) == 0), "fail_rule iff dropped")
    }
    assert(rows.filter(_.getInt(6) == 0).map(_.getString(5)).distinct.length >= 2,
      "at least two distinct rules fire on the corpus")
  }

  test("x39 data card: one row per source, bounded rates, quantiles ordered") {
    val rows = Extras.x39DataCard(spark, sf).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val dup = r.getDouble(5)
      assert(dup >= 0.0 && dup < 1.0, s"dup_rate $dup")
      assert(r.getDouble(7) <= r.getDouble(8), "p50 <= p90")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("x40 chunks tile each doc: stride starts, full coverage, bounded size") {
    val rows = Extras.x40ChunkOverlap(spark, sf).collect()
      .groupBy(_.getLong(0))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i, "chunk_idx dense from 0")
        assert(c.getLong(2) == i * Extras.ChunkStride + 1, "stride starts")
        assert(c.getLong(3) >= 1 && c.getLong(3) <= Extras.ChunkWindow)
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == lens(doc),
        "last chunk ends exactly at the doc's final token")
    }
  }

  test("x41 positions are a permutation with contiguous tier blocks") {
    val rows = Extras.x41Curriculum(spark, sf).collect()
    val pos = rows.map(_.getLong(0))
    assert(pos.toSet == (1L to rows.length.toLong).toSet, "1..N permutation")
    val byTier = rows.groupBy(_.getLong(2)).toSeq.sortBy(_._1)
    byTier.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a.map(_.getLong(0)).max < b.map(_.getLong(0)).min,
          "tier t exhausts before tier t+1 starts")
      case _ =>
    }
  }

  test("x42 funnel stages are ordered when present") {
    val rows = Extras.x42Funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    var converted = 0
    rows.foreach { r =>
      val v = r.getTimestamp(1)
      if (!r.isNullAt(2)) {
        assert(!v.after(r.getTimestamp(2)), "t_click >= t_view")
        if (!r.isNullAt(3)) {
          assert(!r.getTimestamp(2).after(r.getTimestamp(3)),
            "t_purchase >= t_click")
          converted += 1
        }
      } else assert(r.isNullAt(3), "no purchase stage without a click stage")
    }
    assert(converted > 0, "some user completes the funnel")
  }

  test("x43 retention peaks at week 0 for every cohort") {
    val rows = Extras.x43Retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, cs) =>
      val week0 = cs.find(_.getLong(1) == 0L)
      assert(week0.isDefined, "every cohort has its own first week")
      assert(cs.forall(_.getLong(2) <= week0.get.getLong(2)),
        "no later week exceeds the cohort size")
    }
  }

  test("x44 boilerplate fractions are bounded and the dup pair scores high") {
    val rows = Extras.x44Boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_boiler <= n_phrases")
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    assert(rows.exists(_.getLong(2) > 0), "repeated phrases exist in the corpus")
  }

  test("x45 keywords: <=3 per doc, rank-ordered by score, df-consistent") {
    val rows = Extras.x45TfidfKeywords(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, ks) =>
      assert(ks.length <= 3)
      val sorted = ks.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(5) >= b.getDouble(5), "scores non-increasing in rank")
        case _ =>
      }
    }
    assert(rows.forall(r => r.getLong(4) >= 1), "df >= 1 for every emitted term")
  }

  test("x46 z-scores: mean-centered per type, spikes match the 2-sigma flag") {
    val rows = Extras.x46VolumeAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val spike = r.getInt(5) == 1
      assert(spike == (math.abs(r.getDouble(4)) > 2.0))
    }
    rows.groupBy(_.getString(0)).foreach { case (_, ds) =>
      val zsum = ds.map(_.getDouble(4)).sum
      assert(math.abs(zsum) < 1e-6 * ds.length.max(1),
        "z-scores of a type sum to ~0 when variance is positive")
    }
  }

  test("x47 containment pairs are canonical, bounded, and include the exact dups") {
    val rows = Extras.x47Containment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "d1 < d2 canonical form")
      val c = r.getDouble(5)
      assert(c >= 0.5 && c <= 1.0, s"containment $c out of range")
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)),
        "shared <= min size")
    }
    assert(rows.exists(_.getDouble(5) == 1.0),
      "an exact-duplicate pair reaches containment 1.0")
  }

  test("x48 credits sum to the purchase value; exactly one last-touch winner") {
    val rows = Extras.x48Attribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, cs) =>
      val n = cs.head.getLong(3)
      assert(cs.length == n, "n_clicks matches the emitted rows")
      assert(cs.count(_.getInt(5) == 1) == 1, "exactly one last-touch click")
      val total = cs.map(_.getDouble(4)).sum
      val value = cs.head.getDouble(4) * n
      assert(math.abs(total - value) < 1e-9 * math.max(1.0, math.abs(value)),
        "linear credits reassemble the purchase value")
    }
  }

  test("x49 funnel stages shrink monotonically and end non-empty") {
    val rows = Extras.x49PipelineFunnel(spark, sf).collect()
    assert(rows.length == 6)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) <= a.getLong(1),
          s"stage ${b.getString(0)} grew vs ${a.getString(0)}")
        assert(b.getLong(2) <= a.getLong(2), "token counts shrink too")
      case _ =>
    }
    assert(rows.last.getLong(1) > 0, "the pipeline keeps a non-empty corpus")
  }

  test("x50 split is leakage-safe: every cluster lands in exactly one split") {
    val rows = Extras.x50LeakSafeSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      assert(members.map(_.getString(2)).distinct.length == 1,
        "near-dup cluster members must share a split")
    }
    val splits = rows.map(_.getString(2))
    assert(splits.forall(Set("train", "val", "test")))
    assert(splits.count(_ == "train") > splits.length / 2,
      "train holds the bulk of the 90/5/5 grid")
  }

  test("x51 drift rows are rank-ordered probability gaps on a shared vocab") {
    val rows = Extras.x51TokenDrift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(6) >= b.getDouble(6), "drift non-increasing in rank")
      case _ =>
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6) -
        math.abs(r.getDouble(4) - r.getDouble(5))) < 1e-15)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) + r.getLong(3) > 0)
    }
  }

  test("x56 rewrite strips exactly the cross-doc segments; every doc survives") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Extras.x56SegmentDedup(spark, sf).collect()
    assert(out.length == docs.count(), "rewrite must keep every doc")
    // segment df truth, recomputed naively
    val w = Extras.SegTokens
    val segDf = scala.collection.mutable.Map.empty[String, Set[Long]]
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val toks = r.getString(1).split(" ")
      toks.grouped(w).map(_.mkString(" ")).foreach { s =>
        segDf(s) = segDf.getOrElse(s, Set.empty) + r.getLong(0)
      }
    }
    val boiler = segDf.filter(_._2.size >= Extras.SegMinDf).keySet
    out.foreach { r =>
      val kept = r.getString(3).split(" ").filter(_.nonEmpty)
        .grouped(w).map(_.mkString(" ")).toSeq
      // reassembled text contains NO boilerplate segment...
      kept.foreach(s => assert(!boiler.contains(s),
        s"doc ${r.getLong(0)} kept boilerplate segment '$s'"))
      // ...and kept_segs + dropped == n_segs with dropped all boilerplate
      assert(r.getLong(2) <= r.getLong(1))
    }
    assert(out.map(_.getLong(1)).sum > out.map(_.getLong(2)).sum,
      "fixture must actually contain cross-doc segments")
  }

  test("x57 familiarity: buckets split on the corpus mean; avg consistent") {
    val rows = Extras.x57LmQuality(spark, sf).collect()
    val tN = rows.map(_.getLong(1)).sum
    val tS = rows.map(_.getLong(2)).sum
    var (hi, lo) = (0, 0)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getLong(2))
      if (n > 0)
        assert(math.abs(r.getDouble(3) - s.toDouble / n) < 1e-12)
      r.getString(4) match {
        case "familiar" =>
          hi += 1; assert(BigInt(s) * tN > BigInt(n) * tS)
        case "unfamiliar" =>
          lo += 1; assert(n > 0 && BigInt(s) * tN <= BigInt(n) * tS)
        case "empty" => assert(n == 0)
      }
    }
    assert(hi > 0 && lo > 0, "corpus-mean split must discriminate")
  }

  test("x59 MV is maintained incrementally: 2 refreshes, cursor at head") {
    import org.apache.spark.sql.functions._
    import graft.operators.SnapshotLog
    import graft.streaming.SnapshotFeed
    val out = Extras.x59IncrementalMv(spark, sf).collect()
    // semantic equality with a direct recompute (the oracle's check,
    // repeated here so `sbt test` alone catches a combine regression)
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
        max(col("o_orderkey")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out.map(_.getString(0)).toSet == direct.keySet)
    out.foreach { r =>
      val (n, mn, mx) = direct(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(3) == mn && r.getLong(4) == mx)
    }
    // incrementality: the scratch dirs are deterministic per input dir
    def scratch(name: String) = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_${name}_" + graft.Hashing.md5hex(sf).take(6)).getAbsolutePath
    // two refreshes ⇒ exactly two MV overwrite commits (the second one
    // folded BOTH base commits v2+v3 into one poll)...
    assert(SnapshotLog.versions(spark, scratch("x59mv")) == Seq(1L, 2L))
    // ...and the durable cursor sits at the base table's head
    assert(SnapshotFeed.lastSeen(spark, scratch("x59"), "mv_orders") == 3L)
  }

  test("x60 equals a naive greedy left-to-right BPE trainer") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    var corpus = docs.map(_.split(" ").toVector)
    val expect = (1 to 3).map { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { toks =>
        if (toks.size >= 2) toks.sliding(2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1
        }
      }
      val ((a, b), n) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, s"$x $y") }
      corpus = corpus.map { toks =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == a && toks(i + 1) == b) {
            out += s"${a}_$b"; i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
      (round.toLong, s"$a $b", n, corpus.map(_.size.toLong).sum)
    }
    val got = Extras.x60BpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
  }

  // Exact replicas of the engine decimal arithmetic (CAST goes through
  // the double's shortest string; decimal sums are order-free):
  private def dec(x: Double, scale: Int): BigDecimal =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP)
  private def decDot(a: Array[Double], b: Array[Double]): Double =
    a.indices.map(i => dec(a(i) * b(i), 20)).sum.toDouble

  test("x61 assignment is the true argmax over exact sum-vector centroids") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1)
    val n1 = embs.map { case (id, v) => id -> decDot(v, v) }.toMap
    def argmax(cents: Seq[(Long, Array[Double], Double)]) =
      embs.map { case (id, v) =>
        id -> cents.map { case (cid, c, cn) =>
          val cos = decDot(v, c) / (math.sqrt(n1(id)) * math.sqrt(cn))
          (if (cos.isNaN) -2.0 else cos, -cid, cid)
        }.max._3
      }.toMap
    val k = math.max(8L, math.min(1024L, math.sqrt(embs.length.toDouble).toLong))
    val seeds = embs.filter(e => e._1 >= 1 && e._1 <= k)
      .map { case (id, v) => (id, v, n1(id)) }.toSeq
    val a1 = argmax(seeds)
    val cents = embs.groupBy(e => a1(e._1)).map { case (cell, vs) =>
      val cv = Array.tabulate(64)(i =>
        vs.map(e => dec(e._2(i), 12)).sum.toDouble)
      (cell, cv, decDot(cv, cv))
    }.toSeq
    val expect = argmax(cents)
    val got = Extras.x61KmeansEmbed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    assert(got.values.toSet.size >= 8, "clustering is non-trivial")
  }

  test("x62 drops exactly the later member of each within-cluster near-pair") {
    val cells = Extras.x61KmeansEmbed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val n1 = embs.map { case (id, v) => id -> decDot(v, v) }.toMap
    val byCell = embs.groupBy(e => cells(e._1))
    val expectDrop = byCell.values.flatMap { vs =>
      val sorted = vs.sortBy(_._1)
      for {
        j <- sorted.indices
        i <- 0 until j
        cos = decDot(sorted(i)._2, sorted(j)._2) /
          (math.sqrt(n1(sorted(i)._1)) * math.sqrt(n1(sorted(j)._1)))
        if cos >= Extras.SemanticDupCosThreshold
      } yield sorted(j)._1
    }.toSet
    val got = Extras.x62SemanticDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted, "ordered output")
    got.foreach { case (id, cell, keep) =>
      assert(cell == cells(id))
      assert(keep == (if (expectDrop(id)) 0L else 1L), s"vec $id keep flag")
    }
    assert(got.count(_._3 == 0L) > 0, "threshold actually drops someone")
  }

  test("entry() returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("lshBitsFor keeps bucket occupancy <= 16 with exact power-of-2 edges") {
    // floor: tiny corpora stay at 8 bits (the historical sf0.01 value,
    // pinning oracle back-compat at the correctness-gate sf)
    assert(Extras.lshBitsFor(1) == 8)
    assert(Extras.lshBitsFor(256 * 16) == 8) // exactly full: 2^8*16 >= n holds
    assert(Extras.lshBitsFor(256 * 16 + 1) == 9) // one over: next bit
    assert(Extras.lshBitsFor(6400) == 9) // sf0.1 corpus
    assert(Extras.lshBitsFor(64000) == 12) // sf1 corpus
    // occupancy bound holds across the range; bits never exceed the cap
    Seq(1L, 100L, 4096L, 100000L, 10000000L, Long.MaxValue / 32).foreach { n =>
      val b = Extras.lshBitsFor(n)
      assert(b >= 8 && b <= 24)
      if (b < 24) assert((1L << b) * 16 >= n, s"occupancy bound at n=$n")
    }
  }

  // The naive greedy BPE corpus after `rounds` merges — the x60 test's
  // reference trainer, shared by the x72 encode test.
  private def naiveBpeCorpus(rounds: Int): Map[Long, Vector[String]] = {
    var corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toVector).toMap
    (1 to rounds).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.values.foreach { toks =>
        if (toks.size >= 2) toks.sliding(2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1
        }
      }
      val ((a, b), _) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, s"$x $y") }
      corpus = corpus.map { case (id, toks) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.size) {
          if (i + 1 < toks.size && toks(i) == a && toks(i + 1) == b) {
            out += s"${a}_$b"; i += 2
          } else { out += toks(i); i += 1 }
        }
        id -> out.result()
      }
    }
    corpus
  }

  test("x72 encode equals the naive greedy BPE corpus after 3 merges") {
    val naive = naiveBpeCorpus(3)
    val before = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong).toMap
    val got = Extras.x72BpeEncode(spark, sf).collect()
    assert(got.length == naive.size)
    got.foreach { r =>
      val (id, nb, na, nm, fp) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))
      val enc = naive(id)
      assert(nb == before(id), s"doc $id n_before")
      assert(na == enc.size.toLong, s"doc $id n_after")
      assert(nm == nb - na, s"doc $id n_merged")
      assert(fp == graft.Hashing.md5hex(enc.take(8).mkString(" ")),
        s"doc $id enc_fp: encoded prefix diverges from naive greedy")
    }
    // the merges actually fired somewhere: the corpus shrank
    assert(got.map(_.getLong(3)).sum > 0)
  }

  test("x73 shard assignment equals the naive shuffled prefix sum") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
    // naive: global order by (md5(id), id), running-sum, shard by budget
    val ordered = docs.sortBy { case (id, _) =>
      (graft.Hashing.md5hex(id.toString), id)
    }
    var cum = 0L
    val expect = ordered.map { case (id, n) =>
      val start = cum; cum += n
      id -> (n, start / Extras.ShardBudget)
    }.toMap
    val got = Extras.x73ShardPack(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (id, n, sh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert((n, sh) == expect(id), s"doc $id: got ($n,$sh) want ${expect(id)}")
    }
    // shards cover 0..max contiguously and respect the budget: every
    // shard's docs start strictly inside its token span
    val shards = got.map(_.getLong(2)).distinct.sorted
    assert(shards.head == 0L && shards.sameElements(0L to shards.last))
  }

  test("x76 recall audit equals an exact-decimal naive replay") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    // exact-decimal dot, kept as BigDecimal so ranking matches the
    // engine's DECIMAL ordering bit for bit (no double round-trip)
    def bdot(a: Array[Double], b: Array[Double]): BigDecimal =
      a.indices.map(i => dec(a(i) * b(i), 20)).sum
    val cents = embs.filter(e => e._1 >= 1 && e._1 <= 16)
    val corpus = embs.filter(_._1 >= 10)
    val probesN = embs.filter(_._1 < 10)
    val assign = corpus.map { case (id, v) =>
      id -> cents.map { case (cid, c) => (cid, bdot(v, c)) }
        .minBy { case (cid, d) => (-d, cid) }._1
    }.toMap
    def expect(pid: Long, p: Array[Double]): Map[Long, (Long, Long)] = {
      val scored = corpus.map { case (id, v) => (id, bdot(v, p)) }
      val truth = scored.sortBy { case (id, d) => (-d, id) }.take(3)
        .map(_._1).toSet
      val cells = cents.map { case (cid, c) => (cid, bdot(p, c)) }
        .sortBy { case (cid, d) => (-d, cid) }.map(_._1)
      Seq(1, 2, 4).map { np =>
        val probed = cells.take(np).toSet
        val cand = scored.filter { case (id, _) => probed(assign(id)) }
        val top = cand.sortBy { case (id, d) => (-d, id) }.take(3).map(_._1)
        np.toLong -> (cand.size.toLong, top.count(truth).toLong)
      }.toMap
    }
    val got = Extras.x76AnnRecall(spark, sf).collect()
    assert(got.length == probesN.length * 3)
    got.foreach { r =>
      val (pid, np, ns, nh, rec) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      val (ens, enh) = expect(pid, probesN.find(_._1 == pid).get._2)(np)
      assert((ns, nh) == (ens, enh), s"probe $pid nprobe $np")
      assert(rec == BigDecimal(nh / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the audit's reason to exist: more probes never hurt
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val byNp = rows.sortBy(_.getLong(1))
      assert(byNp.map(_.getLong(2)).sameElements(
        byNp.map(_.getLong(2)).sorted), "n_scanned monotone in nprobe")
      assert(byNp.map(_.getLong(3)).sameElements(
        byNp.map(_.getLong(3)).sorted), "n_hits monotone in nprobe")
    }
  }

  test("x77 drift equals an exact-decimal naive replay") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("label", "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val got = Extras.x77EmbeddingDrift(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val dims = embs.head._3.length
    embs.groupBy(_._1).foreach { case (label, rows) =>
      val (olds, news) = rows.partition(_._2 % 2 == 0)
      val (na, nb) = (olds.length.toLong, news.length.toLong)
      def sums(half: Array[(Int, Long, Array[Double])]): Array[BigDecimal] =
        (0 until dims).map(i =>
          half.map(r => dec(r._3(i), 12)).sum).toArray
      val (sa, sb) = (sums(olds), sums(news))
      val dd = (0 until dims).map(i => (sa(i) * nb - sb(i) * na).abs)
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val drift = r6(dd.sum.toDouble / (na * nb))
      val topPos = (0 until dims).minBy(i => (-dd(i), i))
      val topDrift = r6(dd(topPos).toDouble / (na * nb))
      assert(got(label) == ((na, nb, drift, topPos + 1L, topDrift)),
        s"label $label: got ${got(label)}")
    }
  }

  test("x74 predictions equal a naive replay of the trained weights") {
    val P = graft.functions.TextFns.HashMod
    def bucket(tok: String): Long =
      (java.lang.Long.parseLong(graft.Hashing.md5hex(tok).take(15), 16) % P) %
        Extras.LangBuckets
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").map(bucket)))
    // train: per (bucket, lang) counts on even ids -> integer weights
    val cbl = scala.collection.mutable.Map.empty[(Long, String), Long]
    docs.filter(_._1 % 2 == 0).foreach { case (_, lang, bs) =>
      bs.foreach(b => cbl((b, lang)) = cbl.getOrElse((b, lang), 0L) + 1)
    }
    val cb = cbl.groupBy(_._1._1).map { case (b, m) => b -> m.values.sum }
    val w = cbl.map { case ((b, l), c) => (b, l) -> c * 1000000L / cb(b) }
    val got = Extras.x74LangClassifier(spark, sf).collect()
    assert(got.length == docs.length)
    val gotMap = got.map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getBoolean(3), r.getBoolean(4))).toMap
    docs.foreach { case (id, lang, bs) =>
      // a language is a candidate only if the doc owns a bucket that
      // was trained FOR THAT LANGUAGE — the join shape on the Spark
      // side (scores exist only where (bucket, lang) weight rows do)
      val cand = w.keys
        .filter { case (b, _) => bs.contains(b) }.map(_._2).toSet
      val pred =
        if (cand.isEmpty) "und"
        else cand.toSeq.map { l =>
          l -> bs.map(b => w.getOrElse((b, l), 0L)).sum
        }.minBy { case (l, s) => (-s, l) }._1
      val (gl, gp, gt, gc) = gotMap(id)
      assert(gl == lang && gt == (id % 2 == 0))
      assert(gp == pred, s"doc $id: pred $gp want $pred")
      assert(gc == (pred == lang), s"doc $id correct flag")
    }
  }
}
