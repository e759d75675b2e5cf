package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manual skew mitigation — the documented escape hatch (SCALE.md
  * "Joins") for keys too hot even for AQE's runtime skew-join split
  * (which only kicks in for sort-merge joins and within a stage's
  * partition-size stats; a deterministic pipeline or a skewed
  * aggregation needs the transformation spelled out).
  *
  * Both operators keep exact semantics and add one column of entropy:
  *
  *  - [[saltedJoin]]: the big/skewed side gets a deterministic salt in
  *    [0, salts) derived from a per-row distinguishing column; the
  *    small side is replicated `salts` times. The join key becomes
  *    (key, salt), so a hot key's rows spread over `salts` reducers
  *    instead of one. Cost: small side shuffled/broadcast ×salts.
  *
  *  - [[saltedSumCount]]: two-phase aggregation — partial per
  *    (key, salt), final per key — for aggregates whose merge is
  *    associative (sum/count/min/max). A hot group's rows combine in
  *    `salts` partial buckets before one tiny final merge. Note that
  *    for floating-point sums "associative" holds only up to ulps:
  *    the regrouped addition order can differ from a direct groupBy
  *    in the last bit (exact for longs/decimals).
  */
object SkewSalt {

  private val SaltCol = "__graft_salt"

  /** Deterministic salt from a distinguishing column (any unique-ish
    * row attribute; determinism keeps reruns/retries identical, unlike
    * rand()).
    */
  private def saltOf(distinguisher: Column, salts: Int): Column =
    pmod(hash(distinguisher), lit(salts)).cast(IntegerType)

  /** Inner equi-join of a skewed `big` side against a `small` side on
    * `key`, spreading each hot key over `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      distinguisher: String): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn(SaltCol, saltOf(col(distinguisher), salts))
    val s = small.withColumn(SaltCol, explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase salted sum/count per key: exact same result as a direct
    * groupBy, but a hot key partial-aggregates in `salts` buckets.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, salts: Int,
      distinguisher: String): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn(SaltCol, saltOf(col(distinguisher), salts))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).cast(LongType).as("cnt"))
  }
}
