package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The campaign-inspector report (§3.2): the reference's multi-way
  * join of campaign / ad_sets / ads / creatives / pixels into one
  * nested document (campaign_inspector.py:250-304, shape at :292-298).
  *
  * Spark re-expression: a single declarative query —
  *  - ads grouped per adset with their creative details attached
  *    (C1 hash-group + left outer, C3 broadcast creative lookup),
  *  - ad_sets enriched with pixel details via broadcast probe on the
  *    nested `promoted_object.pixel_id` key (C2),
  *  - one `collect_list(struct(...))` nesting per level, final
  *    `toJSON`-able row per campaign.
  * Two shuffles total (ads→adset group, adsets→campaign group);
  * pixels and creatives broadcast.
  */
object Inspector {

  def report(campaigns: DataFrame, adSets: DataFrame, ads: DataFrame,
      creatives: DataFrame, pixels: DataFrame, accountId: String,
      campaignId: String): DataFrame = {

    val c = campaigns.filter(col("id") === campaignId) // point lookup
    // C3: each ad enriched with its creative (broadcast dim)
    val adsEnriched = ads
      .join(broadcast(creatives.select(col("id").as("creative_id"),
        struct(col("name").as("name"), col("object_story_spec")).as("creative_details"))),
        Seq("creative_id"), "left")
    // C1: hash-group ads per adset, [] when no match (left outer)
    val adsPerAdset = adsEnriched
      .groupBy(col("adset_id"))
      .agg(sort_array(collect_list(struct(
        col("id"), col("name"), col("status"), col("creative_id"),
        col("creative_details")))).as("ads"))
    // C2: pixel index probe on nested key (ad_sets key column is `id`;
    // rename to the FK name the ads grouping joins on)
    val adSetsEnriched = adSets
      .withColumnRenamed("id", "adset_id")
      .filter(col("campaign_id") === campaignId)
      .join(broadcast(pixels.select(col("id").as("pixel_id"),
        struct(col("name"), col("last_fired_time")).as("tracking_pixel_details"))),
        col("promoted_object.pixel_id") === col("pixel_id"), "left")
      .join(adsPerAdset, Seq("adset_id"), "left")
      .withColumn("ads", coalesce(col("ads"),
        array().cast(adsPerAdset.schema("ads").dataType)))
    val adSetsPerCampaign = adSetsEnriched
      .groupBy(col("campaign_id"))
      .agg(sort_array(collect_list(struct(
        col("adset_id").as("id"), col("name"), col("status"),
        col("optimization_goal"), col("tracking_pixel_details"), col("ads"))))
        .as("ad_sets"))
    // distinct creatives referenced by this campaign's ads (C4 semi-join)
    val referencedCreatives = creatives
      .join(adsEnriched.filter(col("campaign_id") === campaignId)
        .select(col("creative_id").as("id")).distinct(),
        Seq("id"), "left_semi")
    val creativeList = referencedCreatives
      .agg(sort_array(collect_list(struct(col("id"), col("name")))).as("creatives"))
    val pixelOverview = pixels
      .agg(sort_array(collect_list(struct(col("id"), col("name"),
        col("last_fired_time")))).as("pixel_overview"))

    c.select(lit(accountId).as("account_id"),
        struct(col("id"), col("name"), col("status"), col("objective"),
          col("daily_budget"), col("lifetime_budget")).as("campaign"),
        col("id").as("campaign_id"))
      .join(adSetsPerCampaign, Seq("campaign_id"), "left")
      .crossJoin(broadcast(creativeList))
      .crossJoin(broadcast(pixelOverview))
      .drop("campaign_id")
  }

  /** Convenience: load silver tables from a lake dir and build the
    * report for one campaign (the reference CLI's contract:
    * `--account … --campaign …`).
    */
  def fromLake(spark: SparkSession, lakeDir: String, accountId: String,
      campaignId: String): DataFrame = {
    def tb(n: String) = spark.read.parquet(s"$lakeDir/$n")
    report(tb("campaigns"), tb("ad_sets"), tb("ads"), tb("creatives"),
      tb("pixels"), accountId, campaignId)
  }
}
