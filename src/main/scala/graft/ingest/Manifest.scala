package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Schema-versioning manifest for the parquet lake — the gap the
  * reference itself flags ("no schema version management",
  * docs/technical-spec.md:85-88). Each ingest drops one small JSON
  * document under `<lake>/_manifest/` recording the entity, wall-clock,
  * row count and full Spark schema; `history` + `drift` turn that log
  * into schema-evolution answers ("when did column X appear?").
  *
  * Uses the Hadoop FileSystem API so the same code works on local
  * disk, HDFS or object stores; documents are O(KB) driver-side
  * metadata (same shape as a Delta/Iceberg commit log entry, minus the
  * transactionality we don't need for whole-partition overwrites).
  */
object Manifest {

  private def fs(df: DataFrame, lake: String): FileSystem =
    new Path(lake).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Record one ingest: writes `<lake>/_manifest/<entity>-<millis>.json`
    * and returns its path. `rows` is passed in (the caller usually just
    * wrote the batch and knows the count) to avoid a second action.
    */
  def record(df: DataFrame, lake: String, entity: String, rows: Long,
      atMillis: Long = System.currentTimeMillis()): String = {
    val dir = new Path(lake, "_manifest")
    val f = fs(df, lake)
    f.mkdirs(dir)
    // two ingests in the same millisecond must not overwrite each
    // other's log entry — bump until the name is free
    var at = atMillis
    while (f.exists(new Path(dir, s"${entity}-$at.json"))) at += 1
    val p = new Path(dir, s"${entity}-$at.json")
    val doc =
      s"""{"entity":"${esc(entity)}","ingested_at_ms":$at,""" +
        s""""rows":$rows,"schema":${df.schema.json}}"""
    val out = f.create(p, true)
    try out.write(doc.getBytes("UTF-8")) finally out.close()
    p.toString
  }

  /** All manifest entries for an entity, oldest first:
    * (ingested_at_ms, rows, schema).
    */
  def history(df: DataFrame, lake: String, entity: String): Seq[(Long, Long, StructType)] = {
    val dir = new Path(lake, "_manifest")
    val f = fs(df, lake)
    if (!f.exists(dir)) return Seq.empty
    val statuses = f.listStatus(dir).toSeq
      .filter(_.getPath.getName.startsWith(s"$entity-"))
      .sortBy(_.getPath.getName.stripPrefix(s"$entity-").stripSuffix(".json").toLong)
    statuses.map { st =>
      val in = f.open(st.getPath)
      val doc = try {
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(buf)
        new String(buf, "UTF-8")
      } finally in.close()
      val at = "\"ingested_at_ms\":(\\d+)".r.findFirstMatchIn(doc).get.group(1).toLong
      val rows = "\"rows\":(\\d+)".r.findFirstMatchIn(doc).get.group(1).toLong
      val schemaJson = doc.substring(doc.indexOf("\"schema\":") + 9, doc.length - 1)
      (at, rows,
        org.apache.spark.sql.types.DataType.fromJson(schemaJson).asInstanceOf[StructType])
    }
  }

  /** Human-readable column-level differences between two schema
    * versions: added / removed / retyped.
    */
  def drift(prev: StructType, cur: StructType): Seq[String] = {
    val p = prev.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val c = cur.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val added = (c.keySet -- p.keySet).toSeq.sorted.map(n => s"added $n: ${c(n)}")
    val removed = (p.keySet -- c.keySet).toSeq.sorted.map(n => s"removed $n: ${p(n)}")
    val retyped = (p.keySet & c.keySet).toSeq.sorted.collect {
      case n if p(n) != c(n) => s"retyped $n: ${p(n)} -> ${c(n)}"
    }
    added ++ removed ++ retyped
  }
}
