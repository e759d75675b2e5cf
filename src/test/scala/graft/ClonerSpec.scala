package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Bronze
import graft.model.Schemas
import graft.queries.Cloner

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
}
