package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Nested, Sanitize}

/** Campaign-clone round-trip — the reference's Streamlit cloner
  * (pages/1_Campaign_Cloner.py, GET → EDIT → sanitize → POST) as a
  * batch pipeline: read a campaign template with its children, rewire
  * every FK to deterministic new ids, apply the sanitize + payload
  * rules (G1–G3, G14, G20–G21), and return appendable entity frames.
  *
  * New ids are `<prefix><old_id>` — deterministic so the operation is
  * idempotent/retryable (the reference's sequential POST loop gets its
  * ids from the remote; a lake-native clone derives them), and FK
  * rewiring is a pure column transform: no driver-side loop, the whole
  * hierarchy clones in one pass per entity table.
  */
object Cloner {

  case class ClonedCampaign(campaign: DataFrame, adSets: DataFrame, ads: DataFrame)

  private def rewire(c: Column, prefix: String): Column =
    when(c.isNotNull, concat(lit(prefix), c))

  /** Server-computed fields stripped from POST payloads (G21,
    * build_creative_payload / sanitize_*_payload).
    */
  val ServerComputed: Seq[String] = Seq("configured_status", "effective_status",
    "budget_remaining", "created_time", "updated_time", "_corrupt_record")

  def cloneCampaign(campaigns: DataFrame, adSets: DataFrame, ads: DataFrame,
      campaignId: String, idPrefix: String, newName: Column,
      newMessage: Column = lit(null), newLink: Column = lit(null)): ClonedCampaign = {

    val (daily, lifetime) =
      Sanitize.budgetMutualExclusion(col("daily_budget"), col("lifetime_budget"))

    val newCampaign = campaigns
      .filter(col("id") === campaignId)
      .withColumn("id", rewire(col("id"), idPrefix))
      .withColumn("name", coalesce(newName, col("name")))
      .withColumn("status", lit("PAUSED")) // G21: clones start paused
      .withColumn("daily_budget", daily)
      .withColumn("lifetime_budget", lifetime)
      .withColumn("spend_cap", Sanitize.normalizeSpendCap(col("spend_cap")))
      .withColumn("start_time",
        Sanitize.clampStartTime(Sanitize.parseDatetime(col("start_time"))))
      .drop(ServerComputed.filter(campaigns.columns.contains): _*)

    val newAdSets = adSets
      .filter(col("campaign_id") === campaignId)
      .withColumn("id", rewire(col("id"), idPrefix))
      .withColumn("campaign_id", rewire(col("campaign_id"), idPrefix))
      .withColumn("status", lit("PAUSED"))
      .drop(ServerComputed.filter(adSets.columns.contains): _*)

    val newAds = ads
      .filter(col("campaign_id") === campaignId)
      .withColumn("id", rewire(col("id"), idPrefix))
      .withColumn("campaign_id", rewire(col("campaign_id"), idPrefix))
      .withColumn("adset_id", rewire(col("adset_id"), idPrefix))
      .withColumn("status", lit("PAUSED"))
      .drop(ServerComputed.filter(ads.columns.contains): _*)

    ClonedCampaign(newCampaign, newAdSets, newAds)
  }

  /** Clone a creative with edited text/link (G20 rewrite + G21 strip):
    * the EDIT step of the round-trip.
    */
  def cloneCreative(creatives: DataFrame, creativeId: String, idPrefix: String,
      newMessage: Column, newTitle: Column, newLink: Column): DataFrame =
    creatives
      .filter(col("id") === creativeId)
      .withColumn("id", rewire(col("id"), idPrefix))
      .withColumn("object_story_spec",
        Nested.updateStoryText(col("object_story_spec"), newMessage, newTitle, newLink))
      // G21: server-computed creative fields never POST back
      .drop(Seq("thumbnail_url", "image_url", "effective_object_story_id",
        "_corrupt_record").filter(creatives.columns.contains): _*)
}
