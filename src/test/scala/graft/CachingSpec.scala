package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimilarityJoin

/** Cache-scope discipline (SCALE.md "Unpersist discipline"): operators
  * that persist a multi-consumer intermediate must release it after the
  * caller's first terminal action — a long-lived shared session
  * accumulates ZERO blocks from library calls.
  *
  * Assertions use `cacheManager.lookupCachedData(frame)` on the exact
  * frame handed to [[Caching.withPersisted]] — scoped to THIS test's
  * cache entry, so the suites' shared parallel SparkSession (whose
  * cacheManager legitimately holds other operators' live entries while
  * we assert) cannot race the check. RDD-level views
  * (`getPersistentRDDs`) are unusable here: they only materialize at
  * first action, and global-emptiness checks race sibling suites.
  */
class CachingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cached(df: DataFrame): Boolean =
    // CacheManager's signature wants the classic Dataset (Spark 4 split
    // the API facade); sessions built here are classic at runtime
    spark.sharedState.cacheManager.lookupCachedData(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).nonEmpty

  private def awaitReleased(df: DataFrame, timeoutMs: Long = 15000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    // QueryExecutionListener fires on the async listener bus
    while (cached(df) && System.currentTimeMillis() < deadline) Thread.sleep(50)
    !cached(df)
  }

  test("withPersisted caches during the action and releases after it") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val result = Caching.withPersisted(base) { d =>
      // multi-consumer fan-out: both sides of a self-join read the cache
      d.as("x").join(d.as("y"), $"x.k" === $"y.k" && $"x.id" < $"y.id")
        .select($"x.id".as("i"), $"y.id".as("j"))
    }
    assert(cached(base), "frame must be registered while the action is pending")
    assert(result.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L)))
    assert(awaitReleased(base), "cache must be released after the action")
  }

  test("operator integration: prefixJaccardSelfJoin result is correct " +
    "and leaves no cached residue for its inputs") {
    import spark.implicits._
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "x"), (3L, "y"), (3L, "z")).toDF("doc_id", "tok")
    val rows = SetSimilarityJoin.prefixJaccardSelfJoin(items, 0.5).collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L && rows(0).getLong(1) == 2L)
  }

  test("withPersisted releases the cache even when the action fails") {
    import spark.implicits._
    val df = Seq(1, 2, 0).toDF("x")
    val result = Caching.withPersisted(df) { d =>
      // force a runtime failure at execution time
      d.selectExpr("CASE WHEN x = 0 THEN raise_error('boom') ELSE 'ok' END AS y")
    }
    assert(cached(df), "withPersisted should persist the input frame")
    intercept[Exception] { result.collect() }
    assert(awaitReleased(df), "cache must be released after a failed action")
  }

  test("withPersistedThrough survives internal actions, releases on the " +
      "result's action") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    var internalCount = -1L
    val result = Caching.withPersistedThrough(base) { d =>
      // a strategy probe: an action on a DERIVED frame mid-build —
      // under withPersisted this would release the cache prematurely
      internalCount = d.filter($"k" === "a").count()
      d.as("x").join(d.as("y"), $"x.k" === $"y.k" && $"x.id" < $"y.id")
        .select($"x.id".as("i"), $"y.id".as("j"))
    }
    assert(internalCount == 2L)
    // the listener bus is async: give a premature release the same
    // window the release tests give the legitimate one, then assert
    // the cache SURVIVED the internal action
    Thread.sleep(500)
    assert(cached(base),
      "internal action must not release the cache (that is the point)")
    assert(result.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L)))
    assert(awaitReleased(base),
      "cache must be released after the result's action")
  }
}
