package graft.model

import org.apache.spark.sql.types._

/** The ad-entity catalog: explicit StructTypes for the reference's
  * entity hierarchy (fields_schema.py — the `_build_schema` registry),
  * including per-column display-label metadata (`zh_tw`), which the
  * reference attaches to every registered field
  * (fields_schema.py:8-18).
  *
  * Ids are STRINGS by design: the Graph API returns numeric-looking id
  * strings that must never be cast (api_helpers.py:238-246 exclusion
  * list). Budgets are minor-unit money carried as strings in bronze
  * and cast to LongType in silver by the sanitize layer (G1).
  */
object Schemas {

  private def f(name: String, dt: DataType, zh: String = null): StructField = {
    val md = if (zh == null) Metadata.empty
    else new MetadataBuilder().putString("zh_tw", zh).build()
    StructField(name, dt, nullable = true, md)
  }

  /** campaign (fields_schema.py:21-43). */
  val campaign: StructType = StructType(Seq(
    f("id", StringType, "廣告活動編號"),
    f("account_id", StringType, "廣告帳號"),
    f("name", StringType, "名稱"),
    f("status", StringType, "狀態"),
    f("configured_status", StringType),
    f("effective_status", StringType),
    f("objective", StringType, "行銷目標"),
    f("start_time", StringType, "開始時間"),
    f("stop_time", StringType, "結束時間"),
    f("daily_budget", StringType, "單日預算"),
    f("lifetime_budget", StringType, "總預算"),
    f("spend_cap", StringType, "花費上限"),
    f("buying_type", StringType),
    f("bid_strategy", StringType, "出價策略"),
    f("promoted_object", StructType(Seq(
      f("pixel_id", StringType),
      f("custom_event_type", StringType))), "推廣對象"),
    f("special_ad_categories", ArrayType(StringType)),
    f("brand_safety_content_filter_levels", ArrayType(StringType)),
    f("brand_safety_content_severity_levels", ArrayType(StringType)),
    f("excluded_brand_safety_content_types", ArrayType(StringType)),
    f("created_time", StringType),
    f("updated_time", StringType)))

  /** ad_set (fields_schema.py:63-95). */
  val adSet: StructType = StructType(Seq(
    f("id", StringType, "廣告組合編號"),
    f("account_id", StringType),
    f("campaign_id", StringType, "所屬活動"),
    f("name", StringType, "名稱"),
    f("status", StringType, "狀態"),
    f("configured_status", StringType),
    f("effective_status", StringType),
    f("daily_budget", StringType, "單日預算"),
    f("lifetime_budget", StringType, "總預算"),
    f("budget_remaining", StringType),
    f("start_time", StringType),
    f("end_time", StringType),
    f("pacing_type", ArrayType(StringType)),
    f("bid_strategy", StringType),
    f("bid_amount", StringType, "出價金額"),
    f("billing_event", StringType),
    f("optimization_goal", StringType, "最佳化目標"),
    f("promoted_object", StructType(Seq(
      f("pixel_id", StringType),
      f("custom_event_type", StringType)))),
    f("targeting", StructType(Seq(
      f("geo_locations", StructType(Seq(f("countries", ArrayType(StringType))))),
      f("age_min", LongType),
      f("age_max", LongType))), "受眾設定"),
    f("attribution_spec", ArrayType(StructType(Seq(
      f("event_type", StringType),
      f("window_days", LongType))))),
    f("is_dynamic_creative", BooleanType),
    f("brand_safety_content_filter_levels", ArrayType(StringType)),
    f("brand_safety_content_severity_levels", ArrayType(StringType)),
    f("excluded_brand_safety_content_types", ArrayType(StringType)),
    f("created_time", StringType),
    f("updated_time", StringType)))

  /** ad, pre-flatten bronze shape with nested creative{id}
    * (fields_schema.py:120-145; flatten at main_extractor.py:386-395).
    */
  val ad: StructType = StructType(Seq(
    f("id", StringType, "廣告編號"),
    f("name", StringType, "名稱"),
    f("status", StringType, "狀態"),
    f("effective_status", StringType),
    f("campaign_id", StringType),
    f("adset_id", StringType),
    f("creative", StructType(Seq(f("id", StringType)))),
    f("tracking_specs", ArrayType(StructType(Seq(
      f("action.type", StringType))))),
    f("created_time", StringType),
    f("updated_time", StringType)))

  /** creative (fields_schema.py:157-190; nested spec per
    * 1_Campaign_Cloner.py:250-330).
    */
  val creative: StructType = {
    val cta = StructType(Seq(
      f("type", StringType),
      f("value", StructType(Seq(f("link", StringType))))))
    val linkData = StructType(Seq(
      f("message", StringType),
      f("name", StringType),
      f("link", StringType),
      f("call_to_action", cta),
      f("image_hash", StringType),
      f("video_id", StringType),
      f("child_attachments", ArrayType(StructType(Seq(
        f("name", StringType), f("link", StringType), f("image_hash", StringType),
        f("retailer_item_ids", ArrayType(StringType)))))),
      f("retailer_item_ids", ArrayType(StringType))))
    StructType(Seq(
      f("id", StringType, "素材編號"),
      f("name", StringType, "名稱"),
      f("status", StringType),
      f("object_story_spec", StructType(Seq(
        f("page_id", StringType),
        f("link_data", linkData),
        f("video_data", StructType(Seq(
          f("message", StringType), f("title", StringType),
          f("video_id", StringType), f("image_hash", StringType)))),
        f("photo_data", StructType(Seq(
          f("caption", StringType), f("image_hash", StringType)))),
        f("template_data", StructType(Seq(
          f("message", StringType), f("name", StringType), f("link", StringType),
          f("product_set_id", StringType),
          f("retailer_item_ids", ArrayType(StringType)),
          // collection creatives carry cover media + CTA in
          // template_data (3_Creative_Composer.py:277-327)
          f("image_hash", StringType), f("video_id", StringType),
          f("call_to_action", cta)))))), "素材規格"),
      f("image_url", StringType),
      f("video_id", StringType),
      f("thumbnail_url", StringType),
      f("effective_object_story_id", StringType)))
  }

  /** insights fact row, action_type breakdown projection
    * (fields_schema.py:210-274).
    */
  val insights: StructType = {
    val actionArr = ArrayType(StructType(Seq(
      f("action_type", StringType), f("value", StringType))))
    StructType(Seq(
      f("ad_id", StringType),
      f("adset_id", StringType),
      f("campaign_id", StringType),
      f("date_start", StringType, "開始日期"),
      f("date_stop", StringType, "結束日期"),
      f("spend", StringType, "花費"),
      f("impressions", StringType, "曝光次數"),
      f("reach", StringType, "觸及人數"),
      f("frequency", StringType),
      f("clicks", StringType, "點擊次數"),
      f("unique_clicks", StringType),
      f("inline_link_clicks", StringType),
      f("inline_post_engagement", StringType),
      f("actions", actionArr, "成效動作"),
      f("action_values", actionArr),
      f("cost_per_action_type", actionArr),
      f("purchase_roas", actionArr)))
  }

  /** pixel (get_pixels.py:21). */
  val pixel: StructType = StructType(Seq(
    f("id", StringType, "像素編號"),
    f("name", StringType, "名稱"),
    f("last_fired_time", StringType, "最後觸發時間")))

  /** Silver-layer typed targets: numeric/timestamp columns the sanitize
    * layer casts to (ids stay strings).
    */
  val campaignSilver: StructType = StructType(campaign.map {
    case sf if Set("daily_budget", "lifetime_budget", "spend_cap")(sf.name) =>
      sf.copy(dataType = LongType)
    case sf if sf.name.endsWith("_time") => sf.copy(dataType = TimestampType)
    case sf => sf
  })

  /** Display label for a column (G24 `get_field_label`). */
  def label(schema: StructType, column: String): Option[String] =
    schema.fields.find(_.name == column)
      .filter(_.metadata.contains("zh_tw"))
      .map(sf => s"${sf.metadata.getString("zh_tw")} (${sf.name})")
}
