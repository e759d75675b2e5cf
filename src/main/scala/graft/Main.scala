package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.{Bronze, Manifest}
import graft.model.Schemas

/** Unified CLI (SURVEY §7.1 `cli/Main`): one entry point over the
  * library's operational surfaces.
  *
  * {{{
  *   graft.Main inventory <sfDir>             run every query, print row counts
  *   graft.Main ingest <entity> <json> <lake> bronze→silver ingest + manifest
  *   graft.Main verify <sfDir> <outDir>       correctness dump (Verify.main)
  *   graft.Main bench                         benchmark JSON line (Bench.main)
  *   graft.Main audit [sfDir]                 plan assertions (PlanAudit.main)
  * }}}
  */
object Main {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "inventory" :: sfDir :: Nil =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        println(s"[inventory] $name: ${fn(spark, sfDir).count()} rows")
      }
      spark.stop()

    case "ingest" :: entity :: json :: lake :: Nil =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val (schema, silver) = entity match {
        case "campaign" => (Schemas.campaign, Bronze.campaignSilver _)
        case "ad" => (Schemas.ad, Bronze.adSilver _)
        case "insights" => (Schemas.insights, Bronze.insightsSilver _)
        case other => sys.error(s"unknown entity '$other' (campaign|ad|insights)")
      }
      val out = silver(Bronze.readJson(spark, json, schema))
        .withColumn("ingest_date", org.apache.spark.sql.functions.current_date())
      // manifest records THIS batch's row count, not the cumulative
      // table size after the dynamic-partition overwrite
      val rows = out.count()
      Bronze.writePartitioned(out, s"$lake/$entity")
      val manifest = Manifest.record(out, s"$lake/$entity", entity, rows)
      println(s"[ingest] $entity: $rows rows -> $lake/$entity ($manifest)")
      spark.stop()

    case "verify" :: rest => Verify.main(rest.toArray)
    case "bench" :: Nil => Bench.main(Array.empty)
    case "audit" :: rest => PlanAudit.main(rest.toArray)
    case other =>
      System.err.println(
        s"""unknown command: ${other.mkString(" ")}
           |usage: inventory <sfDir> | ingest <entity> <json> <lake> |
           |       verify <sfDir> <outDir> | bench | audit [sfDir]""".stripMargin)
      sys.exit(2)
  }
}
