package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Bronze, Manifest}
import graft.model.Schemas
import graft.queries.{Cloner, Inspector}

/** GET → EDIT → sanitize → POST round-trip over the fixtures. */
class ClonerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String) =
    getClass.getResource(s"/fixtures/$name.json").getPath

  private lazy val campaigns = Bronze.readJson(spark, fixture("campaigns"), Schemas.campaign)
  private lazy val adSets = Bronze.readJson(spark, fixture("ad_sets"), Schemas.adSet)
  private lazy val ads =
    Bronze.adSilver(Bronze.readJson(spark, fixture("ads"), Schemas.ad))
  private lazy val creatives = Bronze.readJson(spark, fixture("creatives"), Schemas.creative)

  test("clone rewires the whole hierarchy consistently") {
    val c = Cloner.cloneCampaign(campaigns, adSets, ads,
      campaignId = "120200000000001", idPrefix = "clone1_", newName = lit("C1 copy"))
    val camp = c.campaign.collect()
    assert(camp.length == 1)
    val cr = camp(0)
    assert(cr.getString(cr.fieldIndex("id")) == "clone1_120200000000001")
    assert(cr.getString(cr.fieldIndex("name")) == "C1 copy")
    assert(cr.getString(cr.fieldIndex("status")) == "PAUSED")
    // FK consistency: every cloned ad's adset_id exists among cloned adsets
    val adsetIds = c.adSets.select("id").collect().map(_.getString(0)).toSet
    val adRows = c.ads.collect()
    assert(adRows.nonEmpty)
    adRows.foreach { r =>
      assert(r.getString(r.fieldIndex("campaign_id")) == "clone1_120200000000001")
      assert(adsetIds.contains(r.getString(r.fieldIndex("adset_id"))))
    }
    // server-computed fields stripped
    assert(!c.campaign.columns.contains("effective_status"))
    assert(!c.adSets.columns.contains("budget_remaining"))
  }

  test("clone sanitizes budgets (mutual exclusion survives the copy)") {
    val c = Cloner.cloneCampaign(campaigns, adSets, ads,
      "120200000000001", "b_", lit(null))
    val r = c.campaign.select("daily_budget", "lifetime_budget", "spend_cap").collect()(0)
    assert(r.getLong(0) == 150000L)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2)) // spend_cap '0' -> unset
  }

  test("A7 POST round-trip: append clone to the lake, re-read, inspect") {
    val lake = java.nio.file.Files.createTempDirectory("cloner_lake").toString
    def seed(df: org.apache.spark.sql.DataFrame, entity: String): Unit = {
      val stamped = df.withColumn("ingest_date", lit("2025-09-01"))
      Bronze.writePartitioned(stamped, s"$lake/$entity")
      Manifest.record(stamped, lake, entity, stamped.count())
    }
    seed(Bronze.campaignSilver(
      Bronze.readJson(spark, fixture("campaigns"), Schemas.campaign)), "campaigns")
    seed(Bronze.adSetSilver(adSets), "ad_sets")
    seed(ads, "ads")
    seed(creatives.drop("_corrupt_record"), "creatives")
    seed(Bronze.readJson(spark, fixture("pixels"), Schemas.pixel)
      .drop("_corrupt_record"), "pixels")

    // GET from the lake, EDIT/sanitize, POST back as an append
    def tb(n: String) = spark.read.parquet(s"$lake/$n")
    val cloned = Cloner.cloneCampaign(tb("campaigns"), tb("ad_sets"), tb("ads"),
      campaignId = "120200000000001", idPrefix = "c2_", newName = lit(null))
    Cloner.appendToLake(cloned, lake, ingestDate = "2025-09-02")

    // re-read: the template partition is untouched, the clone appended
    assert(tb("campaigns").filter(col("id") === "120200000000001").count() == 1)
    assert(tb("campaigns").filter(col("id") === "c2_120200000000001").count() == 1)

    // the inspector report over the CLONE matches the template's,
    // modulo the rewired ids and the clone-is-PAUSED status policy
    val rTemplate = Inspector.fromLake(spark, lake, "act_123456789",
      "120200000000001").toJSON.head()
    val rClone = Inspector.fromLake(spark, lake, "act_123456789",
      "c2_120200000000001").toJSON.head()
    def norm(j: String) =
      j.replaceAll("\"status\":\"[A-Z_]+\"", "\"status\":\"*\"")
    assert(norm(rClone.replace("c2_", "")) == norm(rTemplate))

    // the manifest logged the append as a second schema version
    assert(Manifest.history(tb("campaigns"), lake, "campaigns").size == 2)
  }

  test("creative clone rewrites text and strips server fields") {
    val cloned = Cloner.cloneCreative(creatives, "9900001", "c_",
      lit("新訊息"), lit(null), lit("https://cloned.example"))
    val r = cloned.collect()(0)
    assert(r.getString(r.fieldIndex("id")) == "c_9900001")
    val spec = r.getStruct(r.fieldIndex("object_story_spec"))
    val ld = spec.getStruct(spec.fieldIndex("link_data"))
    assert(ld.getString(ld.fieldIndex("message")) == "新訊息")
    assert(ld.getString(ld.fieldIndex("name")) == "Headline") // untouched
    assert(ld.getString(ld.fieldIndex("link")) == "https://cloned.example")
    assert(!cloned.columns.contains("thumbnail_url"))
  }

  test("collection creative (template_data) clone survives the lake round-trip") {
    val lake = java.nio.file.Files.createTempDirectory("cloner_coll").toString
    val stamped = creatives.drop("_corrupt_record")
      .withColumn("ingest_date", lit("2025-09-01"))
    Bronze.writePartitioned(stamped, s"$lake/creatives")

    val cloned = Cloner.cloneCreative(
      spark.read.parquet(s"$lake/creatives"), "9900003", "cc_",
      newMessage = lit("新合集"), newTitle = lit(null), newLink = lit(null))
    Cloner.appendEntity(cloned, lake, "creatives", ingestDate = "2025-09-02")

    val back = spark.read.parquet(s"$lake/creatives")
      .filter(col("id") === "cc_9900003").collect()
    assert(back.length == 1)
    val spec = back(0).getStruct(back(0).fieldIndex("object_story_spec"))
    val td = spec.getStruct(spec.fieldIndex("template_data"))
    assert(td.getString(td.fieldIndex("message")) == "新合集") // G20 edit applied
    assert(td.getString(td.fieldIndex("product_set_id")) == "ps_1") // survived
    assert(td.getString(td.fieldIndex("link")) == "https://ex.com/c")
    assert(td.getSeq[String](td.fieldIndex("retailer_item_ids")) == Seq("SKU9"))
  }

  test("raw-JSON creatives compose into lake-ready rows; junk quarantined") {
    import spark.implicits._
    val composed = Cloner.composeRawCreatives(
      Seq(
        ("r1", """{"name":"from-raw","object_story_spec":{"page_id":"777","template_data":{"product_set_id":"ps_9","link":"https://raw"}}}""", ""),
        ("r2", """{"name":"broken"}""", "")).toDF("rid", "raw", "nm"),
      rawCol = "raw", nameCol = "nm", idCol = "rid", idPrefix = "raw_")
    val rows = composed.collect()
    assert(rows.length == 1, "spec-less payload dropped")
    val r = rows(0)
    assert(r.getString(r.fieldIndex("id")) == "raw_r1")
    assert(r.getString(r.fieldIndex("name")) == "from-raw")
    assert(r.getString(r.fieldIndex("status")) == "PAUSED")
    val spec = r.getStruct(r.fieldIndex("object_story_spec"))
    val td = spec.getStruct(spec.fieldIndex("template_data"))
    assert(td.getString(td.fieldIndex("product_set_id")) == "ps_9")
  }
}
