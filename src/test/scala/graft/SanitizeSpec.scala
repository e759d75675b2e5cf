package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sanitize
import graft.expressions.UnicodeUnescape

/** Unit coverage of the sanitize layer against the reference's visible
  * edge cases (file:line cites are reference-repo paths):
  *  - budget mutual exclusion branches     api_helpers.py:157-172
  *  - '0' / empty spend_cap                api_helpers.py:174-185
  *  - Z / +HHMM / naive / epoch timestamps api_helpers.py:56-88
  *  - truthy/falsy sets                    1_Campaign_Cloner.py:68-69
  *  - JSON-vs-comma list fallback          api_helpers.py:126-138
  *  - act_ prefix normalize                main_extractor.py:361
  */
class SanitizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: (String, String)*): Row = {
    val df = Seq(input.map(_._2)).toDF() // not used; simple path below
    df.head()
  }

  /** Evaluate a Column over a single-row DataFrame with column `v`. */
  private def eval(v: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    val df = Seq(Option(v)).toDF("v").select(c(col("v")).as("r"))
    df.head().get(0)
  }

  test("G1 parse_positive_amount: valid, zero, negative, garbage, half-up") {
    assert(eval("150000", Sanitize.parsePositiveAmount) == 150000L)
    assert(eval("0", Sanitize.parsePositiveAmount) == null)
    assert(eval("-5", Sanitize.parsePositiveAmount) == null)
    assert(eval("abc", Sanitize.parsePositiveAmount) == null)
    assert(eval("1500.5", Sanitize.parsePositiveAmount) == 1501L) // half-up
    assert(eval("0.4", Sanitize.parsePositiveAmount) == null)     // rounds to 0
    assert(eval(null, Sanitize.parsePositiveAmount) == null)
  }

  test("G3 spend_cap: empty and '0' mean unset") {
    assert(eval("", Sanitize.normalizeSpendCap) == null)
    assert(eval("0", Sanitize.normalizeSpendCap) == null)
    assert(eval(" 0 ", Sanitize.normalizeSpendCap) == null)
    assert(eval("250", Sanitize.normalizeSpendCap) == 250L)
    assert(eval(null, Sanitize.normalizeSpendCap) == null)
  }

  test("G2 budget mutual exclusion branches") {
    val df = Seq(
      ("100", "200"),  // daily wins -> lifetime dropped
      ("x", "200"),    // daily invalid -> lifetime kept
      ("x", "y"),      // both invalid -> both null
      ("0", "200")     // daily zero=invalid -> lifetime kept
    ).toDF("d", "l")
    val (d, l) = Sanitize.budgetMutualExclusion(col("d"), col("l"))
    val rows = df.select(d.as("d2"), l.as("l2")).collect()
    assert(rows(0).get(0) == 100L && rows(0).get(1) == null)
    assert(rows(1).get(0) == null && rows(1).get(1) == 200L)
    assert(rows(2).get(0) == null && rows(2).get(1) == null)
    assert(rows(3).get(0) == null && rows(3).get(1) == 200L)
  }

  test("G4 string collection: JSON array, comma split, scalar, empties dropped") {
    def arr(v: String): Seq[String] = {
      val r = eval(v, Sanitize.normalizeStringCollection)
      if (r == null) null else r.asInstanceOf[scala.collection.Seq[String]].toSeq
    }
    assert(arr("""["a","b"]""") == Seq("a", "b"))
    assert(arr("a, b,,c") == Seq("a", "b", "c"))
    assert(arr("solo") == Seq("solo"))
    assert(arr(" , ,") == Seq())
  }

  test("G7/G8 timestamp parse: Z, +HHMM, +HH:MM, naive, epoch, garbage") {
    def iso(v: String): Any = eval(v, c => Sanitize.isoFormat(Sanitize.parseDatetime(c)))
    assert(iso("2025-09-01T00:00:00Z") == "2025-09-01T00:00:00+00:00")
    assert(iso("2025-09-01T00:00:00+0000") == "2025-09-01T00:00:00+00:00")
    assert(iso("2025-09-01T08:00:00+08:00") == "2025-09-01T00:00:00+00:00")
    assert(iso("2025-09-01 10:30:00") == "2025-09-01T10:30:00+00:00")
    assert(iso("788918400") == "1995-01-01T00:00:00+00:00")
    assert(iso("not a date") == null)
  }

  test("G9 start_time clamp") {
    val now = to_timestamp(lit("2025-01-01 00:00:00"))
    def clamp(v: String): Any =
      eval(v, c => Sanitize.clampStartTime(Sanitize.parseDatetime(c), now).cast("string"))
    assert(clamp("2020-06-01 00:00:00") == "2025-01-01 00:00:00") // past -> now
    assert(clamp("2030-06-01 00:00:00") == "2030-06-01 00:00:00") // future kept
    assert(clamp("garbage") == null)
  }

  test("G14 truthy/falsy boolean sets") {
    val t = Seq("true", "TRUE", "1", "yes", "Y")
    val f = Seq("false", "0", "no", "N")
    t.foreach(v => assert(eval(v, Sanitize.parseBool) == true, v))
    f.foreach(v => assert(eval(v, Sanitize.parseBool) == false, v))
    assert(eval("maybe", Sanitize.parseBool) == null)
  }

  test("G26 account id normalize") {
    assert(eval("123", Sanitize.normalizeAccountId) == "act_123")
    assert(eval("act_123", Sanitize.normalizeAccountId) == "act_123")
    assert(eval(null, Sanitize.normalizeAccountId) == null)
  }

  test("G11 coerceNumerics: int canonicalize, float branch, id exclusion") {
    val df = Seq(("007", "3.50", "1e", "12345", "9.5"))
      .toDF("qty", "rate", "junk", "account_id", "note")
    val out = graft.functions.Sanitize.coerceNumerics(df).head()
    assert(out.getString(0) == "7")      // digits -> long canonical form
    assert(out.getString(1) == "3.5")    // decimal -> double canonical form
    assert(out.getString(2) == "1e")     // non-numeric untouched
    assert(out.getString(3) == "12345")  // *_id excluded from coercion
    assert(out.getString(4) == "9.5")
  }

  test("G6 brand-safety lists normalized per-field") {
    val df = Seq(("""["FACEBOOK","AN"]""", "RELAXED, STANDARD", "nonsense"))
      .toDF("brand_safety_content_filter_levels",
        "brand_safety_content_severity_levels", "other")
    val out = Sanitize.normalizeBrandSafetyLists(df).head()
    assert(out.getSeq[String](0) == Seq("FACEBOOK", "AN"))
    assert(out.getSeq[String](1) == Seq("RELAXED", "STANDARD"))
    assert(out.getString(2) == "nonsense") // untouched non-list column
  }

  test("G6 on array-typed columns: trim elements, drop empties") {
    val df = Seq((Seq(" FACEBOOK ", "", "AN"), "x"))
      .toDF("brand_safety_content_filter_levels", "other")
    val out = Sanitize.normalizeBrandSafetyLists(df).head()
    assert(out.getSeq[String](0) == Seq("FACEBOOK", "AN"))
  }

  test("G6 brand-safety fields exist on the entity schemas") {
    // the normalizer must not be a no-op on our own catalog
    Sanitize.BrandSafetyFields.foreach { fname =>
      assert(graft.model.Schemas.campaign.fieldNames.contains(fname), fname)
      assert(graft.model.Schemas.adSet.fieldNames.contains(fname), fname)
    }
  }

  test("G23 targeting parse: JSON string or null") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("age_min", LongType)))
    def parse(v: String) =
      eval(v, c => Sanitize.parseTargeting(c, schema).getField("age_min"))
    assert(parse("""{"age_min": 25}""") == 25L)
    assert(parse("not json") == null)
  }

  test("G25 asset classification by mime then extension") {
    val df = Seq(
      ("image/png", "x.bin"), ("video/mp4", "x.bin"),
      ("application/octet-stream", "clip.MOV"),
      ("application/octet-stream", "pic.jpeg"),
      ("application/octet-stream", "old.BMP"),
      ("application/octet-stream", "clip.wmv"),
      ("application/octet-stream", "doc.pdf"))
      .toDF("mime", "path")
      .select(Sanitize.classifyAsset(col("mime"), col("path")).as("k"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("image", "video", "video", "image", "image", "video", null))
  }

  test("G27 clipboard record label/value fallbacks") {
    val df = Seq(
      (Some("L"), None: Option[String], None: Option[String], Some("v1"), None: Option[String]),
      (None, Some("N"), None, None, Some("id9")),
      (None, None, None, Some("v3"), None))
      .toDF("label", "name", "title", "value", "id")
      .select(Sanitize.normalizeClipboardRecord(
        col("label"), col("name"), col("title"), col("value"), col("id")).as("r"))
    val rows = df.collect().map(_.getStruct(0))
    assert(rows(0).getString(0) == "L" && rows(0).getString(1) == "v1")
    assert(rows(1).getString(0) == "N" && rows(1).getString(1) == "id9")
    assert(rows(2).getString(0) == "v3" && rows(2).getString(1) == "v3")
  }

  // dirty-nested-payload shape shared by the G12 tests: string budgets,
  // escaped unicode, zero-padded numerics, a *_time field one level
  // down, an array of structs two levels down (api_helpers.py:268-280)
  private lazy val nestedSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("promoted_object", StructType(Seq(
        StructField("pixel_id", StringType),
        StructField("daily_budget", StringType),
        StructField("lifetime_budget", StringType),
        StructField("name", StringType),
        StructField("note", StringType),
        StructField("event_time", StringType),
        StructField("tags", ArrayType(StructType(Seq(
          StructField("label", StringType),
          StructField("rank", StringType))))))))))
  }

  private def nestedDf(rows: Row*) =
    spark.createDataFrame(java.util.List.of(rows: _*), nestedSchema)

  test("G12 recursive sanitize: rules reach nested struct/array levels") {
    val df = nestedDf(
      Row("c1",
        Row("888", "1500.4", "2000", "Caf\\u00e9", "0042",
          "2025-09-18 10:00:00",
          Seq(Row("\\u4e2d", "007")))))
    val p = Sanitize.sanitizeNested(df).select("promoted_object").head().getStruct(0)
    assert(p.getString(p.fieldIndex("pixel_id")) == "888")       // id excluded
    assert(p.getString(p.fieldIndex("daily_budget")) == "1500")  // G1 half-up... 1500.4 -> 1500
    assert(p.isNullAt(p.fieldIndex("lifetime_budget")))          // G2 at depth
    assert(p.getString(p.fieldIndex("name")) == "Café")          // G13 at depth
    assert(p.getString(p.fieldIndex("note")) == "42")            // G11 at depth
    assert(p.getString(p.fieldIndex("event_time")) == "2025-09-18T10:00:00+00:00") // G7+G8
    val tag = p.getSeq[Row](p.fieldIndex("tags")).head
    assert(tag.getString(0) == "中")                             // two levels down
    assert(tag.getString(1) == "7")
    // null struct stays null
    val withNull = df.withColumn("promoted_object",
      lit(null).cast(df.schema("promoted_object").dataType))
    assert(Sanitize.sanitizeNested(withNull).head().isNullAt(1))
  }

  test("G12 recursive sanitize is idempotent (SURVEY §5.2.4)") {
    val df = nestedDf(
      Row("1", Row("9", "1500.4", "2000", "Caf\\u00e9", "0042",
        "2025-09-18 10:00:00", Seq(Row("\\u4e2d", "007")))),
      Row("2", Row(null, "abc", "99.9", "plain text", "-3.50",
        "1758190400", Seq.empty[Row])),
      Row("3", Row("8", null, null, "", "1e3", "junk-time", null)),
      Row("4", null))
    val once = Sanitize.sanitizeNested(df).orderBy("id").collect().toSeq
    val twice = Sanitize.sanitizeNested(Sanitize.sanitizeNested(df))
      .orderBy("id").collect().toSeq
    assert(twice == once)
  }

  test("G13 unicode unescape: \\uXXXX, \\xNN, mixed, passthrough") {
    assert(UnicodeUnescape.decode("\\u0041") == "A")
    assert(UnicodeUnescape.decode("\\x41") == "A")
    assert(UnicodeUnescape.decode("a\\u0042c\\x64e") == "aBcde")
    assert(UnicodeUnescape.decode("no escapes") == "no escapes")
    assert(UnicodeUnescape.decode("\\u4e2d\\u6587") == "中文")
    // as a registered Catalyst expression through codegen
    UnicodeUnescape.register(spark)
    assert(eval("\\u0041_x", UnicodeUnescape.unicodeUnescape) == "A_x")
  }

  test("PII scrub: email, card, ip, phone, overlaps, passthrough") {
    def scrub(s: String): Any = eval(s, Sanitize.scrubPii)
    assert(scrub("mail bob.smith+x@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(scrub("card 4242 4242 4242 4242.") == "card <CARD>.")
    assert(scrub("card 4242-4242-4242-4242.") == "card <CARD>.")
    assert(scrub("host 192.168.0.1 up") == "host <IP> up")
    assert(scrub("call +1-555-0042 or 555-123-4567 now") ==
      "call <PHONE> or <PHONE> now")
    // a card is phone-shaped: card scrub must win (runs first)
    assert(scrub("pay 4242 4242 4242 4242 or call +44-20-7946-0958") ==
      "pay <CARD> or call <PHONE>")
    // dotted IP octets can satisfy the phone separator class: ip first
    assert(scrub("from 10.0.255.77 port") == "from <IP> port")
    assert(scrub("clean text with words only") ==
      "clean text with words only")
    assert(scrub("a@b.co x@y.io") == "<EMAIL> <EMAIL>") // global, not first
    assert(eval(null, Sanitize.scrubPii) == null)
  }
}
