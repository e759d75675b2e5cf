package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sanitize / normalize scalar-function library.
  *
  * Re-expresses the reference's payload-sanitization layer (its richest
  * data-processing surface) as pure Spark `Column` expressions so every
  * rule stays inside whole-stage codegen — no Python-style row loops, no
  * UDFs except where a genuine custom scalar is needed (unicode
  * unescape, see [[graft.expressions.UnicodeUnescape]]).
  *
  * Reference semantics (cited file:line are in the reference repo):
  *  - G1  `_parse_positive_amount`        src/utils/api_helpers.py:104-119
  *  - G2  budget mutual exclusion         src/utils/api_helpers.py:157-172
  *  - G3  spend_cap normalize             src/utils/api_helpers.py:174-185
  *  - G4  `_normalize_string_collection`  src/utils/api_helpers.py:121-151
  *  - G5  special_ad_categories default   src/utils/api_helpers.py:187-195
  *  - G7  `_parse_datetime_value`         src/utils/api_helpers.py:56-88
  *  - G8  `_isoformat_datetime`           src/utils/api_helpers.py:92-95
  *  - G9  start_time clamp                src/utils/api_helpers.py:210-217
  *  - G11 numeric auto-coercion w/ id exclusion src/utils/api_helpers.py:238-264
  *  - G14 truthy/falsy boolean parse      pages/1_Campaign_Cloner.py:66-69,117-126
  *  - G26 account id normalize            src/main_extractor.py:361
  *
  * Rounding note: Python's round() is banker's rounding; we standardize on
  * round-half-up via floor(x + 0.5) (documented divergence, SURVEY §7.4).
  */
object Sanitize {

  /** Regex for a plain decimal number (used to guard ANSI-mode casts). */
  private val NumRe = "^\\s*-?\\d+(\\.\\d+)?\\s*$"

  /** G1: money string/number in minor units -> positive Long, else null.
    * Rejects values that round to <= 0. Half-up rounding.
    */
  def parsePositiveAmount(c: Column): Column = {
    val d = when(c.cast(StringType).rlike(NumRe), c.cast(StringType).cast(DoubleType))
    val r = floor(d + lit(0.5))
    when(r > 0, r.cast(LongType))
  }

  /** G3: spend_cap — treat empty / '0' / 0 as "unset" (null), else G1. */
  def normalizeSpendCap(c: Column): Column = {
    val s = trim(c.cast(StringType))
    when(s.isNull || s === "" || s === "0", lit(null).cast(LongType))
      .otherwise(parsePositiveAmount(c))
  }

  /** G2: daily/lifetime budgets are mutually exclusive — if daily parses
    * positive keep only daily; else if lifetime does keep only lifetime;
    * else drop both. Returns (daily, lifetime) normalized columns.
    */
  def budgetMutualExclusion(daily: Column, lifetime: Column): (Column, Column) = {
    val d = parsePositiveAmount(daily)
    val l = parsePositiveAmount(lifetime)
    (when(d.isNotNull, d), when(d.isNull && l.isNotNull, l))
  }

  /** Element-cleaning tail shared by the string and array G4/G6 paths:
    * trim every element, drop empties.
    */
  private def cleanElements(arr: Column): Column =
    filter(transform(arr, x => trim(x)), x => x =!= "")

  /** G4: string -> cleaned array<string>. JSON-array strings are parsed;
    * anything else is comma-split; elements trimmed, empties dropped.
    */
  def normalizeStringCollection(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val arr = when(s.startsWith("["), from_json(s, ArrayType(StringType)))
      .otherwise(split(s, ","))
    cleanElements(arr)
  }

  /** G5: force a top-level array field to [] when absent/invalid. */
  def defaultEmptyArray(c: Column): Column =
    coalesce(normalizeStringCollection(c), array().cast(ArrayType(StringType)))

  /** G7: multi-format timestamp parse. Accepts ISO8601 with 'Z' or
    * +HH:MM or +HHMM offsets, 'yyyy-MM-dd HH:mm:ss' (assumed UTC), and
    * epoch seconds. Unparseable -> null (never throws, ANSI-safe).
    */
  def parseDatetime(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val epoch = when(s.rlike("^\\d{9,11}$"), timestamp_seconds(s.cast(LongType)))
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssXXX")), // Z / +00:00
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ssZ")),   // +0000
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),    // naive -> UTC
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      epoch)
  }

  /** G8: ISO8601 format, seconds precision, explicit +00:00 offset. */
  def isoFormat(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ssxxx")

  /** G9: start_time clamp — if in the past, replace with `now`. */
  def clampStartTime(ts: Column, now: Column = current_timestamp()): Column =
    when(ts.isNull, lit(null).cast(TimestampType)).otherwise(greatest(ts, now))

  /** G10: per-entity time-field policy (api_helpers.py:220-236).
    * campaign → stop_time; adset → end_time AND stop_time; any other
    * entity → both (the reference's fallback). Normalize-or-drop:
    * parseable values normalize to UTC timestamps, empty/unparseable
    * become null (the columnar "drop").
    */
  val TimeFieldPolicy: Map[String, Seq[String]] = Map(
    "campaign" -> Seq("stop_time"),
    "adset" -> Seq("end_time", "stop_time"))

  def normalizeEntityTimes(df: DataFrame, entity: String): DataFrame =
    TimeFieldPolicy.getOrElse(entity, Seq("stop_time", "end_time"))
      .filter(df.columns.contains)
      .foldLeft(df)((d, f) => d.withColumn(f, parseDatetime(col(f))))

  /** G14 truthy/falsy boolean parse (pages/1_Campaign_Cloner.py:68-69). */
  private val Truthy = Seq("true", "1", "yes", "y")
  private val Falsy  = Seq("false", "0", "no", "n")
  def parseBool(c: Column): Column = {
    val s = lower(trim(c.cast(StringType)))
    when(s.isin(Truthy: _*), lit(true))
      .when(s.isin(Falsy: _*), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** G26: account id normalize — prefix `act_` when missing. */
  def normalizeAccountId(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.isNull, lit(null).cast(StringType))
      .when(s.startsWith("act_"), s)
      .otherwise(concat(lit("act_"), s))
  }

  /** G6: brand-safety list normalize — apply G4 to the three named
    * list fields, nulling any that stay unparseable
    * (api_helpers.py:197-209). Type-aware: a column already typed
    * array<string> (bronze parsed a JSON list) just gets its elements
    * trimmed and empties dropped; a raw string column goes through the
    * full G4 JSON-or-CSV parse.
    */
  val BrandSafetyFields: Seq[String] =
    Seq("brand_safety_content_filter_levels",
      "brand_safety_content_severity_levels",
      "excluded_brand_safety_content_types")
  def normalizeBrandSafetyLists(df: DataFrame): DataFrame =
    BrandSafetyFields.filter(df.columns.contains).foldLeft(df) { (d, f) =>
      val normalized = d.schema(f).dataType match {
        case ArrayType(StringType, _) => cleanElements(col(f))
        case _ => normalizeStringCollection(col(f))
      }
      d.withColumn(f, normalized)
    }

  /** G23: targeting payload parse — struct/JSON-string → typed struct,
    * null when unparseable (pages/4_AdSet_Creator.py:83-102). Permissive
    * from_json yields a struct of nulls for junk; routing the corrupt
    * record through a sentinel field and nulling on it restores the
    * reference's "not a JSON object → None" contract.
    */
  def parseTargeting(c: Column, schema: StructType): Column = {
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val parsed = from_json(c.cast(StringType), withCorrupt,
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    when(parsed.getField("_corrupt_record").isNull,
      parsed.dropFields("_corrupt_record"))
  }

  /** G23 wiring for ingest: `targeting` arrives either already typed
    * (bronze parsed the JSON object — the reference's dict/`to_dict`
    * branches) or as an embedded JSON string (form input / drifted
    * producer — the `json.loads` branch). Structs pass through; string
    * columns parse into `schema`; unparseable → null (the reference
    * returns None and drops the field).
    */
  def normalizeTargeting(df: DataFrame, schema: StructType): DataFrame =
    if (!df.columns.contains("targeting")) df
    else df.schema("targeting").dataType match {
      case _: StructType => df
      case _ => df.withColumn("targeting", parseTargeting(col("targeting"), schema))
    }

  /** G25: asset classification by mime prefix or file extension
    * (pages/2_Creative_Uploader.py:42-53).
    */
  def classifyAsset(mime: Column, path: Column): Column = {
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    when(lower(mime).startsWith("image/"), "image")
      .when(lower(mime).startsWith("video/"), "video")
      .when(ext.isin("jpg", "jpeg", "png", "gif", "bmp", "webp"), "image")
      .when(ext.isin("mp4", "mov", "avi", "mkv", "wmv"), "video")
      .otherwise(lit(null).cast(StringType))
  }

  /** G27: clipboard record normalize — heterogeneous entries into
    * {label, value} with key fallbacks (ui_clipboard.py:18-40).
    */
  def normalizeClipboardRecord(label: Column, name: Column, title: Column,
      value: Column, id: Column): Column =
    struct(
      coalesce(label, name, title, value.cast(StringType)).as("label"),
      coalesce(value.cast(StringType), id.cast(StringType)).as("value"))

  /** G12: recursive sanitize over nested payloads — the reference's
    * `_sanitize` applies the scalar rules depth-first through nested
    * dicts/lists (api_helpers.py:268-280) and `_decode_nested`
    * unescapes every nested string (api_helpers.py:292-299). Spark
    * re-expression: rebuild each struct-typed column bottom-up, with
    * per-leaf rules dispatched on field name exactly like
    * `_apply_dict_rules` at each dict level:
    *  - string leaves: G13 unicode unescape, then G11 numeric
    *    canonicalization (digit/float strings through long/double,
    *    ids excluded),
    *  - money leaves (daily_budget / lifetime_budget / spend_cap /
    *    bid_amount): G1 positive-amount parse (stays a string — the
    *    struct leaf keeps its declared type),
    *  - `*_time` leaves: G7 multi-format parse + G8 ISO format,
    *    normalize-or-drop,
    *  - G2 budget mutual exclusion where a level carries both budgets,
    *  - arrays recurse element-wise; non-string typed leaves pass.
    * A null struct stays null (the rebuild is null-propagating).
    */
  def sanitizeNested(df: DataFrame): DataFrame = {
    graft.expressions.UnicodeUnescape.register(df.sparkSession)
    val cols = df.schema.fields.map { f =>
      (f.dataType match {
        case st: StructType => deepSanitize(col(f.name), st)
        case ArrayType(st: StructType, _) =>
          transform(col(f.name), x => deepSanitize(x, st))
        case _ => col(f.name)
      }).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Money minor-unit fields G1 applies to at any nesting level. */
  private val MoneyFields = Set("daily_budget", "lifetime_budget", "spend_cap", "bid_amount")

  private def isIdName(n: String): Boolean =
    n == "id" || n.endsWith("_id") || n.endsWith("_ids")

  /** G11 value rule for one string leaf: canonicalize numeric-looking
    * strings (type stays string), pass everything else through.
    */
  private def coerceNumericString(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("^-?\\d+$"),
        coalesce(t.try_cast(LongType).cast(StringType), c))
      .when(t.rlike("^-?\\d*\\.\\d+([eE][+-]?\\d+)?$"),
        coalesce(t.try_cast(DoubleType).cast(StringType), c))
      .otherwise(c)
  }

  private def stringLeafRule(name: String, c: Column): Column =
    if (isIdName(name)) c
    else if (MoneyFields.contains(name)) parsePositiveAmount(c).cast(StringType)
    else if (name.endsWith("_time")) isoFormat(parseDatetime(c))
    else coerceNumericString(graft.expressions.UnicodeUnescape.unicodeUnescape(c))

  private def deepSanitize(c: Column, st: StructType): Column = {
    val vals: Seq[(String, Column)] = st.fields.toSeq.map { f =>
      val child = c.getField(f.name)
      val v = f.dataType match {
        case s: StructType => deepSanitize(child, s)
        case ArrayType(s: StructType, _) => transform(child, x => deepSanitize(x, s))
        case ArrayType(StringType, _) =>
          transform(child, x => graft.expressions.UnicodeUnescape.unicodeUnescape(x))
        case StringType => stringLeafRule(f.name, child)
        case _ => child
      }
      f.name -> v
    }
    val byName = vals.toMap
    // G2 at this level: a valid daily budget evicts lifetime
    val hasBothBudgets =
      Seq("daily_budget", "lifetime_budget").forall(n =>
        st.fields.exists(f => f.name == n && f.dataType == StringType))
    val adjusted =
      if (!hasBothBudgets) vals
      else vals.map {
        case ("lifetime_budget", v) =>
          "lifetime_budget" -> when(byName("daily_budget").isNull, v)
        case other => other
      }
    when(c.isNotNull, struct(adjusted.map { case (n, v) => v.as(n) }: _*))
  }

  /** G11: schema-driven numeric coercion with id exclusion. String columns
    * whose names end in `_id`/`_ids` (or are in `idAllowlist`) stay
    * strings; other string columns are numerically normalized in place
    * (type stays string, since one column must hold both branches):
    * integer-looking values canonicalize through long (drops leading
    * zeros/plus), decimal-looking values through double (the reference's
    * float branch, api_helpers.py:252-264), everything else passes
    * through untouched. Mirrors api_helpers.py:238-264 but schema-driven
    * rather than value-driven, as a DataFrame rule. For a hard typed
    * cast, use [[castToSchema]].
    */
  def coerceNumerics(df: DataFrame, idAllowlist: Set[String] = Set("id")): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val isId = f.name.endsWith("_id") || f.name.endsWith("_ids") ||
        idAllowlist.contains(f.name)
      // coerceNumericString: try_cast + coalesce — a numeric-looking
      // value that overflows the target type (e.g. a 20-digit integer)
      // passes through unchanged instead of becoming NULL (and never
      // throws under ANSI mode). Doubles overflowing to Infinity mirror
      // Python's float() — the reference stores inf too.
      if (f.dataType == StringType && !isId) coerceNumericString(c).as(f.name)
      else c.as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** PII scrub patterns — deliberately lookaround-free so the same
    * pattern string runs identically under Java regex (Spark) and RE2
    * (DuckDB, the oracle). Order matters at apply time: card before
    * phone (a 16-digit card is phone-shaped), ip before phone (dotted
    * octets can satisfy the phone separator classes).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CardRe = "[0-9]{4}([- ][0-9]{4}){3}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9]{1,3}([-. ][0-9]{2,4}){2,4}"

  /** PII scrub: redact emails, payment-card numbers, IPv4 addresses
    * and phone numbers with typed placeholder tokens. Pure
    * `regexp_replace` chain — row-local, codegen'd, no shuffle; the
    * per-document redaction counts a pipeline audits on come from
    * counting placeholders in the OUTPUT (so overlapping patterns are
    * never double-counted).
    */
  def scrubPii(c: Column): Column = {
    val noEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val noCard = regexp_replace(noEmail, CardRe, "<CARD>")
    val noIp = regexp_replace(noCard, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Typed variant of G11: cast string columns to a target schema with
    * try-cast semantics, keeping `*_id` columns as strings.
    */
  def castToSchema(df: DataFrame, target: StructType): DataFrame = {
    val byName = target.fields.map(f => f.name -> f.dataType).toMap
    val cols = df.schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(dt) if dt != f.dataType && !f.name.endsWith("_id") =>
          col(f.name).try_cast(dt).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
