package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimilarityJoin

/** Cache-scope discipline (SCALE.md "Unpersist discipline"): operators
  * that persist a multi-consumer intermediate must release it after the
  * caller's first terminal action — a long-lived shared session
  * accumulates ZERO blocks from library calls.
  */
class CachingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cacheEmpty: Boolean =
    spark.sharedState.cacheManager.isEmpty &&
      spark.sparkContext.getPersistentRDDs.isEmpty

  private def awaitCacheEmpty(timeoutMs: Long = 15000): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    // QueryExecutionListener fires on the async listener bus
    while (!cacheEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cacheEmpty
  }

  test("withPersisted caches during the action and releases after it") {
    import spark.implicits._
    spark.catalog.clearCache()
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "x"), (3L, "y"), (3L, "z")).toDF("doc_id", "tok")
    val pairs = SetSimilarityJoin.prefixJaccardSelfJoin(items, 0.5)
    // while unexecuted, the persisted per-doc frame is registered
    assert(!spark.sharedState.cacheManager.isEmpty,
      "operator should persist its fan-out frame")
    val rows = pairs.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L && rows(0).getLong(1) == 2L)
    assert(awaitCacheEmpty(), "cache must be released after the action")
  }

  test("withPersisted releases the cache even when the action fails") {
    import spark.implicits._
    spark.catalog.clearCache()
    val df = Seq(1, 2, 0).toDF("x")
    val result = Caching.withPersisted(df) { d =>
      // force a runtime failure at execution time (ANSI division by zero
      // via expr; if ANSI off, fail via a throwing path: raise_error)
      d.selectExpr("CASE WHEN x = 0 THEN raise_error('boom') ELSE 'ok' END AS y")
    }
    intercept[Exception] { result.collect() }
    assert(awaitCacheEmpty(), "cache must be released after a failed action")
  }
}
