package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The insights aggregation pipeline — the reference's one true
  * analytics workload (async insights job, api_extractor.py:79-137;
  * measure registry fields_schema.py:210-300). The reference requests
  * these aggregates from Meta's server-side engine; here they run
  * natively.
  *
  * All sums are partial-aggregated map-side automatically; ratio
  * metrics are computed *after* aggregation with null-safe division
  * (D3), exactly the registry's definitions:
  * frequency=impr/reach, cpc=spend/clicks, cpm=spend*1000/impr,
  * ctr=clicks/impr*100.
  */
object Insights {

  private def ratio(num: Column, den: Column): Column =
    when(den =!= 0 && den.isNotNull, num / den)

  /** D1+D3: grouped sums + ratio metrics per entity level × day.
    * `levelKey` ∈ {ad_id, adset_id, campaign_id} — the three summary
    * projections (fields_schema.py:275-300).
    */
  def summary(insights: DataFrame, levelKey: String): DataFrame = {
    insights
      .groupBy(col(levelKey), col("date_start"))
      .agg(
        sum("spend").as("spend"),
        sum("impressions").as("impressions"),
        sum("reach").as("reach"),
        sum("clicks").as("clicks"),
        sum("unique_clicks").as("unique_clicks"),
        sum("inline_link_clicks").as("inline_link_clicks"),
        sum("inline_post_engagement").as("inline_post_engagement"))
      .withColumn("frequency", ratio(col("impressions").cast(DoubleType), col("reach")))
      .withColumn("cpc", ratio(col("spend"), col("clicks")))
      .withColumn("cpm", ratio(col("spend") * 1000.0, col("impressions")))
      .withColumn("ctr", ratio(col("clicks").cast(DoubleType) * 100.0, col("impressions")))
  }

  /** D1×3 as a single ROLLUP: the ad/adset/campaign summary triple in
    * one pass instead of three (SURVEY §2.1-D note).
    */
  def levelRollup(insights: DataFrame): DataFrame =
    insights
      .rollup(col("campaign_id"), col("adset_id"), col("ad_id"))
      .agg(sum("spend").as("spend"), sum("impressions").as("impressions"),
        sum("clicks").as("clicks"))
      .withColumn("level",
        when(col("ad_id").isNotNull, "ad")
          .when(col("adset_id").isNotNull, "adset")
          .when(col("campaign_id").isNotNull, "campaign")
          .otherwise("account"))

  /** D4: `actions[]` breakdown by action_type — explode, per-type
    * totals and cost_per_action_type (spend/action count), re-nestable
    * with collect_list for the wide form.
    */
  def actionBreakdown(insights: DataFrame): DataFrame = {
    insights
      .select(col("ad_id"), col("date_start"), col("spend"),
        explode(col("actions")).as("action"))
      .select(col("ad_id"), col("date_start"), col("spend"),
        col("action.action_type").as("action_type"),
        col("action.value").try_cast(DoubleType).as("action_count"))
      .groupBy(col("action_type"))
      .agg(sum("action_count").as("total_actions"),
        sum("spend").as("spend"))
      .withColumn("cost_per_action", ratio(col("spend"), col("total_actions")))
  }
}
