package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MinhashSignatureStore
import graft.queries.Extras

/** Cross-run incremental near-dup dedup: store lifecycle semantics
  * (keep/drop vs history, earlier-in-batch, and the dropped-docs-
  * never-enter-the-store subtlety), append file claims, re-probe
  * idempotence, and the probe's never-shuffle-the-store plan shape.
  */
class MinhashStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T = Extras.MinhashJaccardThreshold
  private def perms = Extras.Perms

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def freshStore(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-mss-$name").toString
    new java.io.File(p).delete()
    p
  }

  // ten shared base tokens; B overlaps H1 in 9 of 11 union tokens
  // (J = 0.818 ≥ 0.7) but NOT transitively: Z overlaps B at 0.818
  // while J(Z, H1) = 8/12 = 0.667 < 0.7
  private val h1Text = (0 until 10).map(i => s"a$i").mkString(" ")
  private val bText = ((0 until 9).map(i => s"a$i") :+ "x1").mkString(" ")
  private val zText = ((1 until 9).map(i => s"a$i") ++ Seq("x1", "z9")).mkString(" ")
  private val h2Text = "q0 q1 q2 q3 q4 q5 q6 q7"
  private val freshText = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"

  private def verdictMap(df: DataFrame): Map[Long, (Boolean, Long, Double)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap

  test("lifecycle: history, within-batch, and store-growth semantics") {
    val store = freshStore("life")
    MinhashSignatureStore.build(spark,
      docsDf(100L -> h1Text, 102L -> h2Text), store, 16, 4, perms)
    assert(MinhashSignatureStore.readScheme(spark, store) === ((16, 4)))

    // batch 1: exact dup of H1; near-dup of H1; a fresh doc; an exact
    // within-batch dup of the fresh doc
    val b1 = docsDf(201L -> h1Text, 203L -> bText,
      205L -> freshText, 207L -> freshText)
    val v1 = verdictMap(
      MinhashSignatureStore.dedupAgainst(spark, b1, store, perms, T))
    assert(v1(201L)._1 === false && v1(201L)._3 === 1.0,
      "exact dup of a history doc drops at J = 1")
    assert(v1(203L)._1 === false,
      "J = 0.818 near-dup of history must be banded and dropped")
    assert(v1(205L)._1 === true && v1(205L)._2 === 0L)
    assert(v1(207L)._1 === false && v1(207L)._3 === 1.0,
      "later within-batch twin drops against the smaller id")

    // keepers only enter the store
    import spark.implicits._
    val keepers = b1.filter($"doc_id" === 205L)
    MinhashSignatureStore.append(spark, keepers, store, perms)

    // batch 2: twin of a KEPT batch-1 doc drops; near-dup of a DROPPED
    // batch-1 doc survives (203 never entered the store and Z is below
    // threshold against everything that did); twin of H2 drops
    val b2 = docsDf(301L -> freshText, 303L -> zText, 305L -> h2Text)
    val v2 = verdictMap(
      MinhashSignatureStore.dedupAgainst(spark, b2, store, perms, T))
    assert(v2(301L)._1 === false && v2(301L)._3 === 1.0,
      "twin of an appended keeper drops")
    assert(v2(303L)._1 === true,
      "a doc matching only a DROPPED (never-stored) doc is kept")
    assert(v2(305L)._1 === false && v2(305L)._3 === 1.0)

    // counterfactual for 303: had B been stored, Z would have dropped —
    // so 303's keep is the store-semantics claim, not a banding miss
    val cf = freshStore("cf")
    MinhashSignatureStore.build(spark, docsDf(203L -> bText), cf, 16, 4, perms)
    val vz = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, docsDf(303L -> zText), cf, perms, T))
    assert(vz(303L)._1 === false,
      "the banding does catch (Z, B) when B is actually in the store")
  }

  test("empty-text and no-match docs keep with zeroed stats") {
    val store = freshStore("empty")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text), store, 16, 4, perms)
    val v = verdictMap(MinhashSignatureStore.dedupAgainst(spark,
      docsDf(10L -> "", 11L -> "totally unrelated tokens"), store, perms, T))
    assert(v(10L) === ((true, 0L, 0.0)))
    assert(v(11L) === ((true, 0L, 0.0)))
  }

  test("append adds files without touching history; re-probe is idempotent") {
    val store = freshStore("files")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      store, 16, 4, perms)
    def files(sub: String): Set[String] = {
      val root = new java.io.File(s"$store/$sub")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getAbsolutePath)
        .filter(_.endsWith(".parquet")).toSet
    }
    val (docs0, bands0) = (files("docs"), files("bands"))
    val batch = docsDf(30L -> freshText)
    MinhashSignatureStore.append(spark, batch, store, perms)
    val (docs1, bands1) = (files("docs"), files("bands"))
    assert(docs0.subsetOf(docs1) && bands0.subsetOf(bands1),
      "append must not rewrite or drop history files")
    assert(docs1.size > docs0.size && bands1.size > bands0.size)
    assert(spark.read.parquet(s"$store/docs").count() === 3)

    // the appended doc re-probed against the store that now contains it:
    // the d1 ≠ d2 guard keeps it from matching itself
    val again = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, batch, store, perms, T))
    assert(again(30L)._1 === true, "re-probing an ingested batch is idempotent")
  }

  test("a duplicated append (dedupStream's crash-window replay) cannot " +
      "change any verdict, including n_dups") {
    // single-append reference store
    val ref = freshStore("dupref")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      ref, 16, 4, perms)
    val batch = docsDf(30L -> freshText)
    MinhashSignatureStore.append(spark, batch, ref, perms)
    // store where the same append ran TWICE (crash between the append
    // and the ledger marker, then a replay)
    val dup = freshStore("dupdup")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      dup, 16, 4, perms)
    MinhashSignatureStore.append(spark, batch, dup, perms)
    MinhashSignatureStore.append(spark, batch, dup, perms)
    assert(spark.read.parquet(s"$dup/docs").count() === 4,
      "the duplicated append really does leave a duplicate row")
    // a later batch matching the duplicated doc: same keep AND same
    // n_dups/max_jaccard — matches count DOCS, not rows
    val later = docsDf(40L -> freshText, 41L -> bText)
    val vRef = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, later, ref, perms, T))
    val vDup = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, later, dup, perms, T))
    assert(vRef === vDup,
      "verdicts must be identical against the duplicated store")
    assert(vDup(40L) === ((false, 1L, 1.0)),
      "the twin of the duplicated doc counts it ONCE")
  }

  test("probe plan: DPP-armed broadcast band join, store never shuffled") {
    val store = freshStore("plan")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      store, 16, 4, perms)
    val out = MinhashSignatureStore.dedupAgainstLazy(spark,
      docsDf(50L -> bText), store, perms, T)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "bkt must arm dynamic partition pruning on the store bands scan")
    assert(!plan.contains("SortMergeJoin"),
      "every join in the probe must be broadcast-side (store streams)")
  }

  test("append commits atomically: a probe sees a batch's bands AND " +
      "docs, or neither (VERDICT r12 #3)") {
    def counts(store: String): (Long, Long) =
      (spark.read.parquet(s"$store/docs").count(),
        spark.read.parquet(s"$store/bands").count())
    val batch = docsDf(30L -> freshText)

    // failpoint 1: crash AFTER staging both tables, BEFORE the marker
    // publish — the live store must stay byte-identical (the staged
    // batch is invisible), and the next real append must GC the orphan
    val s1 = freshStore("tear1")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      s1, 16, 4, perms)
    val before = counts(s1)
    intercept[java.io.IOException] {
      MinhashSignatureStore.writeBatchImpl(spark, batch, s1, 16, 4, perms,
        failAt = 1)
    }
    assert(counts(s1) === before, "pre-commit crash must leave the live " +
      "store untouched")
    val twin = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, docsDf(40L -> freshText), s1, perms, T))
    assert(twin(40L)._1 === true,
      "the crashed batch never landed, so its twin is a keeper")
    assert(new java.io.File(s1).listFiles().exists(
      _.getName.startsWith("_staged-")), "orphan staging present pre-GC")
    MinhashSignatureStore.append(spark, batch, s1, perms)
    assert(!new java.io.File(s1).listFiles().exists(
      _.getName.startsWith("_staged-")),
      "the next writer GCs aborted staging")
    assert(counts(s1)._1 === 3)

    // failpoints 2 and 3: crash after the marker publish (before any
    // move / between the two table moves) — the next reader entry
    // point must roll the WHOLE batch forward: bands and docs together
    for (fp <- Seq(2, 3)) {
      val s = freshStore(s"tear$fp")
      MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
        s, 16, 4, perms)
      val (d0, b0) = counts(s)
      intercept[java.io.IOException] {
        MinhashSignatureStore.writeBatchImpl(spark, batch, s, 16, 4, perms,
          failAt = fp)
      }
      // a probing reader completes the swap before reading
      val v = verdictMap(MinhashSignatureStore.dedupAgainst(
        spark, docsDf(40L -> freshText), s, perms, T))
      assert(v(40L) === ((false, 1L, 1.0)),
        s"failpoint $fp: the committed batch must be fully visible")
      val (d1, b1) = counts(s)
      assert(d1 > d0 && b1 > b0,
        s"failpoint $fp: both tables must have rolled forward together")
      assert(!new java.io.File(s, "_commit").exists,
        "recovery retires the marker")
    }
  }

  test("_bands_rows commit metadata tracks the exact bands row count " +
      "through build, append, rebuild, crash replay, and a legacy store " +
      "(VERDICT r16 #1)") {
    def meta(store: String): Option[Long] = {
      val f = new java.io.File(store, "_bands_rows")
      if (!f.exists) None
      else Some(new String(java.nio.file.Files.readAllBytes(f.toPath),
        "UTF-8").trim.split(" ")(0).toLong)
    }
    def truth(store: String): Long =
      spark.read.parquet(s"$store/bands").count()
    val store = freshStore("rowsmeta")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      store, 16, 4, perms)
    assert(meta(store) === Some(truth(store)), "build seeds the exact count")
    MinhashSignatureStore.append(spark, docsDf(3L -> freshText), store, perms)
    assert(meta(store) === Some(truth(store)), "append adds its exact delta")
    // post-publish crash (failAt 2): the count lands during the
    // READER's roll-forward, exactly once
    intercept[java.io.IOException] {
      MinhashSignatureStore.writeBatchImpl(spark, docsDf(4L -> zText),
        store, 16, 4, perms, failAt = 2)
    }
    MinhashSignatureStore.dedupAgainst(spark, docsDf(50L -> freshText),
      store, perms, T).collect()
    assert(meta(store) === Some(truth(store)),
      "a reader-replayed batch lands its delta exactly once")
    // crash AFTER the count update but before the marker retires
    // (failAt 4): the replay re-applies the whole roll-forward, and
    // the staging token must make the count update a no-op
    intercept[java.io.IOException] {
      MinhashSignatureStore.writeBatchImpl(spark, docsDf(5L -> bText),
        store, 16, 4, perms, failAt = 4)
    }
    MinhashSignatureStore.dedupAgainst(spark, docsDf(51L -> freshText),
      store, perms, T).collect()
    assert(meta(store) === Some(truth(store)),
      "a replay over an already-applied count must not double-add")
    MinhashSignatureStore.rebuild(spark, store, 48, 8, perms)
    assert(meta(store) === Some(truth(store)), "rebuild replaces the total")
    // a legacy store (no metadata): the probe falls back to the footer
    // sweep, and the next append re-seeds the exact total
    assert(new java.io.File(store, "_bands_rows").delete())
    val legacy = verdictMap(MinhashSignatureStore.dedupAgainst(spark,
      docsDf(52L -> freshText), store, perms, T))
    assert(legacy(52L)._1 === false, "fallback probe still verdicts " +
      "against the full store (52 duplicates the appended 3)")
    MinhashSignatureStore.append(spark,
      docsDf(6L -> "u1 u2 u3 u4 u5"), store, perms)
    assert(meta(store) === Some(truth(store)),
      "an append onto a metadata-less store re-seeds the exact total")
  }

  test("storedBandsRows surfaces the commit-metadata count and reads " +
      "None on a legacy store (the r17 probe-leg routing signal: " +
      "absent metadata must route conservative)") {
    val store = freshStore("rowsaccessor")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text, 2L -> h2Text),
      store, 16, 4, perms)
    val truth = spark.read.parquet(s"$store/bands").count()
    assert(MinhashSignatureStore.storedBandsRows(spark, store)
      === Some(truth), "accessor returns the committed exact count")
    MinhashSignatureStore.append(spark, docsDf(3L -> freshText), store, perms)
    assert(MinhashSignatureStore.storedBandsRows(spark, store)
      === Some(spark.read.parquet(s"$store/bands").count()),
      "accessor tracks the append delta")
    assert(new java.io.File(store, "_bands_rows").delete())
    assert(MinhashSignatureStore.storedBandsRows(spark, store) === None,
      "a metadata-less store reads None — the sequential-routing " +
        "direction, never a guess")
  }

  test("rebuild re-bands to a new scheme: probes match a fresh build, " +
      "the swap is crash-atomic, duplicated rows compact (VERDICT r12 #2)") {
    // a store built at the small-corpus scheme, grown by an append —
    // the situation where the pinned scheme must be upgraded
    val store = freshStore("rebuild")
    val histA = docsDf(100L -> h1Text, 102L -> h2Text)
    val histB = docsDf(104L -> freshText)
    MinhashSignatureStore.build(spark, histA, store, 16, 4, perms)
    MinhashSignatureStore.append(spark, histB, store, perms)
    // a replay-duplicated append (the dedupStream crash window): its
    // dead bytes must die at rebuild
    MinhashSignatureStore.append(spark, histB, store, perms)
    assert(spark.read.parquet(s"$store/docs").count() === 4)

    MinhashSignatureStore.rebuild(spark, store, 48, 8, perms)
    assert(MinhashSignatureStore.readScheme(spark, store) === ((48, 8)))
    assert(spark.read.parquet(s"$store/docs").count() === 3,
      "rebuild compacts replay-duplicated docs rows")

    // probe equality against a from-scratch 48/8 build of the same docs
    val fresh = freshStore("rebuildref")
    MinhashSignatureStore.build(spark,
      histA.unionByName(docsDf(104L -> freshText)), fresh, 48, 8, perms)
    val probe = docsDf(201L -> h1Text, 203L -> bText, 205L -> zText,
      207L -> freshText, 209L -> "totally unrelated tokens")
    assert(
      verdictMap(MinhashSignatureStore.dedupAgainst(spark, probe, store, perms, T)) ===
        verdictMap(MinhashSignatureStore.dedupAgainst(spark, probe, fresh, perms, T)),
      "a rebuilt store must probe exactly like a fresh build at the new scheme")

    // crash injection: pre-publish leaves the OLD scheme fully intact;
    // post-publish is completed by the next reader
    val s1 = freshStore("rebuildcrash1")
    MinhashSignatureStore.build(spark, histA, s1, 16, 4, perms)
    intercept[java.io.IOException] {
      MinhashSignatureStore.rebuildImpl(spark, s1, 48, 8, perms, failAt = 1)
    }
    assert(MinhashSignatureStore.readScheme(spark, s1) === ((16, 4)),
      "pre-commit crash: the old scheme stands")
    val v1 = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, docsDf(201L -> h1Text), s1, perms, T))
    assert(v1(201L)._1 === false, "old store still probes correctly")

    for (fp <- Seq(2, 3)) {
      val s = freshStore(s"rebuildcrash$fp")
      MinhashSignatureStore.build(spark, histA, s, 16, 4, perms)
      intercept[java.io.IOException] {
        MinhashSignatureStore.rebuildImpl(spark, s, 48, 8, perms, failAt = fp)
      }
      // the next probe completes the swap and reads the NEW scheme
      val v = verdictMap(MinhashSignatureStore.dedupAgainst(
        spark, docsDf(201L -> h1Text), s, perms, T))
      assert(MinhashSignatureStore.readScheme(spark, s) === ((48, 8)),
        s"failpoint $fp: recovery must finish the rebuild swap")
      assert(v(201L)._1 === false && v(201L)._3 === 1.0)
      assert(!new java.io.File(s, "_commit").exists)
    }
  }

  test("rebuildIfOutgrown upgrades the scheme exactly when the occupancy " +
      "policy says so, and is idempotent") {
    val store = freshStore("outgrow")
    // policy: ≤ 3 docs → 16/4, beyond → 48/8 (the minhashSchemeFor
    // shape at spec scale)
    val policy = (n: Long) => if (n <= 3) (16, 4) else (48, 8)
    MinhashSignatureStore.build(spark,
      docsDf(1L -> h1Text, 2L -> h2Text), store, 16, 4, perms)
    assert(!MinhashSignatureStore.rebuildIfOutgrown(spark, store, perms, policy),
      "a store inside its regime must not rebuild")
    assert(MinhashSignatureStore.readScheme(spark, store) === ((16, 4)))
    // grow past the regime boundary (a duplicated-append row must not
    // inflate the count: occupancy is deduplicated docs)
    MinhashSignatureStore.append(spark, docsDf(3L -> freshText), store, perms)
    MinhashSignatureStore.append(spark, docsDf(3L -> freshText), store, perms)
    assert(!MinhashSignatureStore.rebuildIfOutgrown(spark, store, perms, policy),
      "3 distinct docs is still inside the ≤3 regime despite 4 rows")
    MinhashSignatureStore.append(spark, docsDf(4L -> bText), store, perms)
    assert(MinhashSignatureStore.rebuildIfOutgrown(spark, store, perms, policy),
      "crossing the regime boundary must trigger the rebuild")
    assert(MinhashSignatureStore.readScheme(spark, store) === ((48, 8)))
    assert(!MinhashSignatureStore.rebuildIfOutgrown(spark, store, perms, policy),
      "a just-rebuilt store is inside its regime: idempotent")
    // the upgraded store still probes correctly
    val v = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, docsDf(9L -> h1Text), store, perms, T))
    assert(v(9L)._1 === false && v(9L)._3 === 1.0)
  }

  test("dedupVerdicts: keep/drop identical to the census mode on the " +
      "lifecycle fixture (VERDICT r12 #1)") {
    val store = freshStore("vmode")
    MinhashSignatureStore.build(spark,
      docsDf(100L -> h1Text, 102L -> h2Text), store, 16, 4, perms)
    // the full semantic mix: history exact dup, history near-dup, a
    // fresh keeper, a within-batch twin, a below-threshold near-miss
    val batch = docsDf(201L -> h1Text, 203L -> bText, 205L -> freshText,
      207L -> freshText, 209L -> zText)
    val census = verdictMap(MinhashSignatureStore.dedupAgainst(
      spark, batch, store, perms, T)).map { case (k, v) => k -> v._1 }
    val verdicts = MinhashSignatureStore.dedupVerdicts(
        spark, batch, store, perms, T)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts === census,
      "the short-circuit mode must not change a single keep/drop")
    assert(verdicts.values.exists(identity) && verdicts.values.exists(!_),
      "fixture exercises both outcomes")
  }

  test("dedupVerdicts bounds verify volume at O(batch) on an " +
      "all-duplicate corpus; censusless keepers still verify fully") {
    // the adversarial shape from the scale sweep: EVERY store doc
    // matches every batch doc (the census mode verifies |batch|×|store|
    // pairs here — the sf² regime)
    val store = freshStore("vbound")
    val d = 40
    MinhashSignatureStore.build(spark,
      docsDf((1 to d).map(i => i.toLong -> h1Text): _*), store, 16, 4, perms)
    val b = 6
    val batch = docsDf((101 to 100 + b).map(i => i.toLong -> h1Text): _*)
    val st = MinhashSignatureStore.dedupVerdictsWithStats(
      spark, batch, store, perms, T)
    assert(st.verdicts.collect().forall(!_.getBoolean(1)),
      "every batch doc drops")
    assert(st.verifiedPairs <= 4L * b,
      s"short-circuit must verify at most chunk×batch pairs, got " +
        s"${st.verifiedPairs} (census would verify ~${d * b})")
    // bounded GENERATION (VERDICT r13 #2): the all-duplicate bucket
    // yields at most R store reps + R+1 batch reps per doc, not the
    // census's |batch|×|store| pair dump
    assert(st.generatedPairs <= (2L * 4 + 1) * b,
      s"rep generation must stay O(batch) on the dense bucket, got " +
        s"${st.generatedPairs} (census would generate ~${d * b})")

    // a no-candidate batch generates and verifies nothing at all
    val kSt = MinhashSignatureStore.dedupVerdictsWithStats(
      spark, docsDf(300L -> "totally unrelated tokens"), store, perms, T)
    assert(kSt.verdicts.collect().forall(_.getBoolean(1)) &&
      kSt.verifiedPairs === 0L && kSt.generatedPairs === 0L)
  }

  test("half-built store (no scheme file) fails loudly, not silently") {
    val store = freshStore("torn")
    MinhashSignatureStore.build(spark, docsDf(1L -> h1Text), store, 16, 4, perms)
    new java.io.File(s"$store/_scheme").delete()
    intercept[java.io.FileNotFoundException] {
      MinhashSignatureStore.dedupAgainst(spark, docsDf(9L -> h2Text),
        store, perms, T)
    }
  }
}
