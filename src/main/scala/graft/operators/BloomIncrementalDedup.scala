package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Incremental (cross-run) dedup: keep only the incoming rows whose
  * key does NOT already exist in a historical corpus — the shape every
  * continuously-ingesting training-data lake runs on each new crawl
  * batch (reference semantics: the lake's "only ingest new objects"
  * upsert rule, generalized to content keys).
  *
  * The naive form is `incoming LEFT ANTI JOIN history` — at 100 TB
  * that shuffles the ENTIRE incoming batch and the ENTIRE history key
  * set every run. This operator uses the standard runtime-filter trick
  * instead, with Spark's own sketch machinery
  * (`org.apache.spark.util.sketch.BloomFilter`, the same class the
  * AQE runtime-filter rule injects — exposed here as the registered
  * functions `bloom_agg` / `bloom_contains` since the SQL registry
  * doesn't surface them):
  *
  *  1. ONE distributed aggregate builds a bloom filter of
  *     `xxhash64(key)` over history (partial blooms merge by bitwise
  *     OR — order-independent, so the result is deterministic). The
  *     sketch (~1.2 MB at 1M keys / 1% fpp) ships to the driver and
  *     back out as a literal, exactly like a broadcast dim.
  *  2. Incoming rows that FAIL the membership probe are definitely new
  *     (bloom filters have no false negatives): they bypass the join
  *     entirely — a pure scan-side filter, zero shuffle.
  *  3. Only the bloom-positive sliver (true dups + ~fpp false
  *     positives) pays the exact LEFT ANTI verify join.
  *
  * Net: the anti-join's shuffle volume drops from |incoming| to
  * |dups| + fpp·|incoming|. The source is scanned twice (once per
  * branch), but both scans are filter+project pushdowns — at scale,
  * shuffle is the expensive resource, not the second pass over
  * column-pruned parquet.
  *
  * An anti join can't be accelerated by Spark's own injected runtime
  * filters (they drop probable NON-matches, which for anti-join
  * semantics are precisely the rows that must be KEPT), which is why
  * this split-path form exists as a library operator.
  */
object BloomIncrementalDedup {

  /** The single source of truth for the two function builders —
    * GraftExtensions injects these same closures, so the SQL-extension
    * path and this programmatic path can never diverge.
    */
  private[graft] val aggBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(c) => new BloomFilterAggregate(c)
    case Seq(c, est, bits) => new BloomFilterAggregate(c, est, bits)
    case other => throw new IllegalArgumentException(
      s"bloom_agg expects 1 or 3 args, got ${other.length}")
  }

  private[graft] val containsBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = {
    case Seq(bf, v) => BloomFilterMightContain(bf, v)
    case other => throw new IllegalArgumentException(
      s"bloom_contains expects 2 args, got ${other.length}")
  }

  /** Register `bloom_agg(longCol, estItems, numBits)` and
    * `bloom_contains(bloomBinary, longCol)` in the session registry.
    * Idempotent (same guard discipline as [[graft.expressions.DecimalDot]]).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_agg")))
      reg.createOrReplaceTempFunction("bloom_agg", aggBuilder, "scala_udf")
    if (!reg.functionExists(FunctionIdentifier("bloom_contains")))
      reg.createOrReplaceTempFunction("bloom_contains", containsBuilder, "scala_udf")
  }

  /** Incoming rows whose `key` column value appears nowhere in
    * `historyKeys` (a one-column frame of the same key). Exact —
    * the bloom is only a router deciding which rows need the verify
    * join.
    *
    * @param expectedItems sizing hint for the sketch (history key
    *                      cardinality); `numBits` caps its memory.
    */
  def newRows(incoming: DataFrame, historyKeys: DataFrame, key: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val spark = incoming.sparkSession
    register(spark)
    val keyHash = xxhash64(col(key))
    // one tiny driver action, same contract as collecting a broadcast
    // side — the sketch IS the broadcast
    val bloomBytes = historyKeys
      .agg(call_function("bloom_agg", xxhash64(col(key)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bloomBytes == null) return incoming // empty history: all new
    val maybeDup: Column = call_function("bloom_contains", lit(bloomBytes), keyHash)
    val definitelyNew = incoming.filter(!maybeDup)
    // no .distinct() on the history side: LEFT ANTI is insensitive to
    // right-side duplicates, and a distinct here would re-shuffle the
    // ENTIRE history key set — the corpus-wide pass the bloom routing
    // exists to avoid
    val verifiedNew = incoming.filter(maybeDup)
      .join(historyKeys.select(col(key)), Seq(key), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }
}
