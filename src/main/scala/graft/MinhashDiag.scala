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
  */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MinhashDiag <sfDir> [<sfDir>...]")
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
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val stats = graft.queries.Extras.x02Diag(spark, dir)
      val secs = (System.nanoTime() - t0) / 1e9
      val body = stats.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      println(s"""{"diag":"x02","dir":"$dir",$body,"secs":$secs}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
