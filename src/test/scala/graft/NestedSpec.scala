package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Nested
import graft.ingest.Bronze
import graft.model.Schemas

/** G15–G22 nested-struct extract/rewrite against the creative fixtures
  * (one per section shape: link_data, video_data, template_data) —
  * covers the precedence table and the null-section guard semantics of
  * the reference's truth table (SURVEY §7.4.1).
  */
class NestedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val creatives = Bronze.readJson(spark,
    getClass.getResource("/fixtures/creatives.json").getPath, Schemas.creative)

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(r.fieldIndex("id")) -> r).toMap

  private lazy val specType = Schemas.creative("object_story_spec").dataType
    .asInstanceOf[org.apache.spark.sql.types.StructType]

  test("G15 parse_creative_spec precedence across section shapes") {
    val rows = byId(creatives.select(col("id"),
      Nested.parseCreativeSpec(col("object_story_spec")).as("p")))
    val link = rows("9900001").getStruct(1)
    assert(link.getString(0) == "買一送一")       // link_data.message
    assert(link.getString(1) == "Headline")
    assert(link.getString(2) == "https://ex.com/p")
    val video = rows("9900002").getStruct(1)
    assert(video.getString(0) == "看影片")        // video_data.message
    assert(video.getString(1) == "VideoTitle")
    assert(video.get(2) == null)                  // no link anywhere
    val tmpl = rows("9900003").getStruct(1)
    assert(tmpl.getString(0) == "精選商品")       // template_data wins
    assert(tmpl.getString(1) == "Collection")
    assert(tmpl.getString(2) == "https://ex.com/c")
  }

  test("G17 retailer ids gathered across sections, deduped in order") {
    val rows = byId(creatives.select(col("id"),
      Nested.extractRetailerItemIds(col("object_story_spec")).as("ids")))
    assert(rows("9900001").getSeq[String](1) == Seq("SKU1", "SKU2"))
    assert(rows("9900003").getSeq[String](1) == Seq("SKU9"))
    assert(rows("9900002").getSeq[String](1) == Seq())
  }

  test("G18 default text precedence") {
    val rows = byId(creatives.select(col("id"),
      Nested.extractDefaultText(col("object_story_spec")).as("t")))
    assert(rows("9900001").getStruct(1).getString(0) == "買一送一")
    assert(rows("9900002").getStruct(1).getString(1) == "VideoTitle")
  }

  test("G19 resolve budget field") {
    import spark.implicits._
    val df = Seq(("100", null: String), (null: String, "200"), ("x", "y"))
      .toDF("d", "l")
      .select(Nested.resolveBudgetField(col("d"), col("l")).as("b"))
    val rows = df.collect()
    assert(rows(0).getStruct(0).getString(0) == "daily_budget")
    assert(rows(0).getStruct(0).getLong(1) == 100L)
    assert(rows(1).getStruct(0).getString(0) == "lifetime_budget")
    assert(rows(2).get(0) == null)
  }

  test("G20 text rewrite touches only present sections incl CTA link") {
    val updated = creatives.select(col("id"),
      Nested.updateStoryText(col("object_story_spec"), specType,
        lit("NEW_MSG"), lit("NEW_TITLE"), lit("https://new.example")).as("s"))
    val rows = byId(updated)
    val ld = rows("9900001").getStruct(1).getStruct(
      rows("9900001").getStruct(1).fieldIndex("link_data"))
    assert(ld.getString(ld.fieldIndex("message")) == "NEW_MSG")
    assert(ld.getString(ld.fieldIndex("link")) == "https://new.example")
    val cta = ld.getStruct(ld.fieldIndex("call_to_action"))
    assert(cta.getStruct(cta.fieldIndex("value")).getString(0) == "https://new.example")
    // video creative: video_data rewritten, link_data stays null
    val vrow = rows("9900002").getStruct(1)
    assert(vrow.isNullAt(vrow.fieldIndex("link_data")))
    val vd = vrow.getStruct(vrow.fieldIndex("video_data"))
    assert(vd.getString(vd.fieldIndex("message")) == "NEW_MSG")
  }

  test("G20 media swap: setting video_id nulls image_hash in link_data") {
    val updated = creatives.filter(col("id") === "9900001").select(
      Nested.swapMedia(col("object_story_spec"), specType,
        lit(null).cast("string"), lit("vid999")).as("s"))
    val s = updated.collect()(0).getStruct(0)
    val ld = s.getStruct(s.fieldIndex("link_data"))
    assert(ld.getString(ld.fieldIndex("video_id")) == "vid999")
    assert(ld.isNullAt(ld.fieldIndex("image_hash"))) // swapped out
  }

  test("G20 retailer ids removable (nulled)") {
    val removed = creatives.filter(col("id") === "9900001").select(
      Nested.setRetailerItemIds(col("object_story_spec"), specType,
        lit(null).cast("array<string>")).as("s"))
    val s = removed.collect()(0).getStruct(0)
    val ld = s.getStruct(s.fieldIndex("link_data"))
    assert(ld.isNullAt(ld.fieldIndex("retailer_item_ids")))
  }

  test("G21/G22 builders: paused default + assembled link spec") {
    import spark.implicits._
    val df = Seq(("777", "msg", "head", "https://l", "hash1", null: String))
      .toDF("p", "m", "h", "l", "ih", "st")
      .select(Nested.defaultPausedStatus(col("st")).as("status"),
        Nested.buildLinkSpec(col("p"), col("m"), col("h"), col("l"),
          col("ih"), lit("LEARN_MORE")).as("spec"))
    val r = df.collect()(0)
    assert(r.getString(0) == "PAUSED")
    val spec = r.getStruct(1)
    assert(spec.getString(spec.fieldIndex("page_id")) == "777")
    val ld = spec.getStruct(spec.fieldIndex("link_data"))
    assert(ld.getString(ld.fieldIndex("message")) == "msg")
    val cta = ld.getStruct(ld.fieldIndex("call_to_action"))
    assert(cta.getString(cta.fieldIndex("type")) == "LEARN_MORE")
  }

  test("G22 collection spec truth table: required fields and CTA casing") {
    import spark.implicits._
    // (page, msg, head, link, cta, image, video, product_set, expectNull)
    val cases = Seq(
      ("777", "m", "h", "https://l", "learn_more", "ih", null, "ps_1", false),
      ("777", "m", "h", "https://l", "", null, "vid1", "ps_1", false),
      ("", "m", "h", "https://l", "X", "ih", null, "ps_1", true),   // no page
      ("777", "m", "h", "", "X", "ih", null, "ps_1", true),         // no link
      ("777", "m", "h", "https://l", "X", null, null, "ps_1", true), // no media
      ("777", "m", "h", "https://l", "X", "ih", null, " ", true))   // no set
    val df = cases.toDF("p", "m", "h", "l", "cta", "ih", "vid", "ps", "expectNull")
      .select(col("expectNull"), Nested.buildCollectionSpec(col("p"), col("m"),
        col("h"), col("l"), col("cta"), col("ih"), col("vid"), col("ps")).as("s"))
    df.collect().foreach { r =>
      assert(r.isNullAt(1) == r.getBoolean(0), s"required-field gate: $r")
    }
    val ok = df.filter(!col("expectNull")).select(
      col("s.template_data.product_set_id"),
      col("s.template_data.call_to_action.type"),
      col("s.template_data.video_id")).collect()
    assert(ok(0).getString(0) == "ps_1")
    assert(ok(0).getString(1) == "LEARN_MORE") // uppercased
    assert(ok(1).isNullAt(1), "blank CTA type -> no call_to_action")
    assert(ok(1).getString(2) == "vid1")
  }

  test("G22 raw passthrough: name override, spec required, junk dropped") {
    import spark.implicits._
    val specType = Schemas.creative("object_story_spec").dataType
    val raws = Seq(
      ("""{"name":"orig","object_story_spec":{"page_id":"777",
         "link_data":{"link":"https://x"}}}""".replaceAll("\n\\s*", ""), "newname"),
      ("""{"name":"keepme","object_story_spec":{"page_id":"8"}}""", ""),
      ("""{"name":"no-spec"}""", "n"),
      ("""not json at all""", "n"))
      .toDF("raw", "nm")
      .select(Nested.buildRawCreative(col("raw"), col("nm"), specType).as("p"))
      .collect()
    assert(!raws(0).isNullAt(0) && raws(0).getStruct(0).getString(0) == "newname")
    assert(raws(1).getStruct(0).getString(0) == "keepme") // blank name keeps raw's
    assert(raws(2).isNullAt(0), "object_story_spec is mandatory")
    assert(raws(3).isNullAt(0), "unparseable payload rejected")
  }
}
