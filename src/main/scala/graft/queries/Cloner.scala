package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Nested, Sanitize}
import graft.ingest.{Bronze, Manifest}

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

  /** A7: the POST leg of the round-trip — append the cloned hierarchy
    * into the lake it was read from (the reference's `create_ad_object`
    * write loop, api_helpers.py:395-451, re-expressed as partitioned
    * appends). Each entity frame is schema-aligned to its existing lake
    * table: the server-computed columns the clone stripped come back as
    * nulls, because the lake — like the remote server in the
    * reference — owns those fields; then the frame is stamped with the
    * ingest date, written via dynamic partition overwrite (idempotent
    * per day, A5 semantics), and recorded in the schema manifest.
    *
    * Unlike the reference's sequential parent-then-children POST loop
    * (children need server-assigned parent ids), the clone's ids are
    * deterministic, so all three appends are independent whole-frame
    * writes — no driver-side row loop.
    */
  def appendToLake(cloned: ClonedCampaign, lakeDir: String, ingestDate: String): Unit =
    Seq(cloned.campaign -> "campaigns", cloned.adSets -> "ad_sets", cloned.ads -> "ads")
      .foreach { case (df, entity) => appendEntity(df, lakeDir, entity, ingestDate) }

  /** Append one entity frame to an EXISTING lake table, aligned to the
    * table's schema (missing columns null, types cast), and record the
    * ingest in the manifest.
    */
  def appendEntity(df: DataFrame, lakeDir: String, entity: String,
      ingestDate: String): Unit = {
    val spark = df.sparkSession
    val path = s"$lakeDir/$entity"
    val target = spark.read.parquet(path).schema
    val cols = target.fields.toSeq.filter(_.name != "ingest_date").map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    } :+ lit(ingestDate).as("ingest_date")
    val aligned = df.select(cols: _*)
    val rows = aligned.count()
    Bronze.writePartitioned(aligned, path)
    Manifest.record(aligned, lakeDir, entity, rows)
  }

  /** G22 raw-JSON creation mode (3_Creative_Composer.py:330-339):
    * operator-supplied JSON payloads → lake-ready creative rows. Rows
    * without a parseable `object_story_spec` object are DROPPED (the
    * reference raises per payload; a batch pipeline quarantines), new
    * creatives default to PAUSED like every payload builder (G21), and
    * ids are caller-stamped (`<prefix><row id>`), keeping the compose
    * idempotent.
    */
  def composeRawCreatives(raws: DataFrame, rawCol: String, nameCol: String,
      idCol: String, idPrefix: String): DataFrame = {
    val specType = graft.model.Schemas.creative("object_story_spec").dataType
    raws
      .withColumn("_p",
        Nested.buildRawCreative(col(rawCol), col(nameCol), specType))
      .filter(col("_p").isNotNull)
      .select(
        rewire(col(idCol), idPrefix).as("id"),
        col("_p").getField("name").as("name"),
        Nested.defaultPausedStatus(lit(null)).as("status"),
        col("_p").getField("object_story_spec").as("object_story_spec"))
  }

  /** Clone a creative with edited text/link (G20 rewrite + G21 strip):
    * the EDIT step of the round-trip.
    */
  def cloneCreative(creatives: DataFrame, creativeId: String, idPrefix: String,
      newMessage: Column, newTitle: Column, newLink: Column): DataFrame = {
    val specType = creatives.schema("object_story_spec").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    creatives
      .filter(col("id") === creativeId)
      .withColumn("id", rewire(col("id"), idPrefix))
      .withColumn("object_story_spec",
        Nested.updateStoryText(col("object_story_spec"), specType,
          newMessage, newTitle, newLink))
      // G21: server-computed creative fields never POST back
      .drop(Seq("thumbnail_url", "image_url", "effective_object_story_id",
        "_corrupt_record").filter(creatives.columns.contains): _*)
  }
}
