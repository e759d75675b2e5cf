package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global 1..N position by (tier, key, tie) without a single-partition
  * window — the scale-safe form of
  * `row_number() OVER (ORDER BY tier, key, tie)`, which funnels the
  * whole dataset through one reducer at any size.
  *
  * Mechanism: the key's own 2-hex-char prefix buckets each tier 256
  * ways; per-(tier, bucket) counts (a driver-scale frame — tiers×256
  * rows) prefix-sum into global offsets, and the only per-row window
  * is PARTITIONED by (tier, bucket). Because the bucket is a PREFIX of
  * the key, `offset + within-bucket rank` reproduces the exact global
  * order — no stage ever holds more than one bucket of one tier.
  *
  * Requirements: `keyCol` is a string whose leading 2 characters are
  * uniformly distributed (an md5 hex key qualifies); `tieCol` breaks
  * key collisions deterministically. The prefix-sum window runs on the
  * post-aggregation counts frame only (tiers×256 rows, never the
  * data) — it partitions on a constant so the deliberate small-table
  * rollup doesn't log the WindowExec single-partition warning real
  * regressions would hide behind.
  */
object GlobalOrder {

  def withPosition(df: DataFrame, tierCol: String, keyCol: String,
      tieCol: String, posName: String = "pos"): DataFrame = {
    // a null key must not vanish through the bucket equi-join (null
    // never equals null); "" buckets before every hex prefix, matching
    // the naive order's NULLS FIRST within the tier
    val bucketed = df.withColumn("_go_bucket",
      coalesce(substring(col(keyCol), 1, 2), lit("")))
    val counts = bucketed.groupBy(col(tierCol), col("_go_bucket"))
      .agg(count(lit(1)).as("_go_n"))
    // pmod(hash, 1) ≡ 0 for every row but is NOT foldable, so the
    // optimizer can't strip it back to an empty partition spec (a bare
    // lit(0) is constant-folded away and the warning returns)
    val offsets = counts.withColumn("_go_off",
      coalesce(sum(col("_go_n")).over(
        Window.partitionBy(pmod(hash(col("_go_bucket")), lit(1)))
          .orderBy(col(tierCol), col("_go_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val rn = row_number().over(
      Window.partitionBy(col(tierCol), col("_go_bucket"))
        .orderBy(col(keyCol), col(tieCol)))
    // null-SAFE tier match: a plain equi-join would drop null-tier rows
    // while their counts still inflate the downstream offsets (nulls
    // sort first in both the prefix sum and the naive order), so `<=>`
    // keeps the operator total over any tier domain (ADVICE r6 #3);
    // EqualNullSafe is still a hash-join key, so the broadcast stands
    val offs = offsets.select(col(tierCol).as("_go_tier"),
      col("_go_bucket").as("_go_b"), col("_go_off"))
    bucketed
      .join(broadcast(offs),
        col(tierCol) <=> col("_go_tier") && col("_go_bucket") === col("_go_b"))
      .withColumn(posName, (col("_go_off") + rn).cast(LongType))
      .drop("_go_tier", "_go_b", "_go_bucket")
  }
}
