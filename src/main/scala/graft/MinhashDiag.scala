package graft

import org.apache.spark.sql.SparkSession

/** x02 scale diagnostic (VERDICT r11 #1): per-corpus candidate
  * accounting so a scaling step can be attributed — plan-bound
  * (band candidates / verify pairs grow superlinearly: the LSH scheme
  * stopped adapting) vs output-bound (result rows grow because the
  * corpus's true near-dup pair volume does — the q27 situation, where
  * the plan is fine and the answer is quadratic).
  *
  * Run: `runMain graft.MinhashDiag <sfDir> [<sfDir>...]` — one JSON
  * line per dir with n_docs, the (n_hashes, n_bands) scheme,
  * n_distinct_sets, n_band_candidates (representative level), and
  * n_result_rows.
  *
  * `runMain graft.MinhashDiag x71 <sfDir> [<sfDir>...]` runs the
  * signature-store accounting instead (VERDICT r12 #4): per dir, the
  * lifecycle batch's candidate volume, census match volume, and the
  * verdict-only mode's actually-verified pair count — proving at
  * each scale that census cost tracks MATCH volume (a corpus
  * property) while the short-circuit verify stays O(batch).
  */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MinhashDiag [x71] <sfDir> [<sfDir>...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietNoise()
    val (mode, dirs) =
      if (args.head == "x71") ("x71", args.tail.toSeq)
      else ("x02", args.toSeq)
    dirs.foreach { dir =>
      val t0 = System.nanoTime()
      val stats =
        if (mode == "x71") graft.queries.Extras.x71Diag(spark, dir)
        else graft.queries.Extras.x02Diag(spark, dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val body = stats.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      println(s"""{"diag":"$mode","dir":"$dir",$body,"secs":$secs}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
