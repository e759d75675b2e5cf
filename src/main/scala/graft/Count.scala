package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc row counter: `runMain graft.Count <query>[,<query>...] [sfDir]`
  * prints each named query's output row count and wall time. The
  * companion to [[Profile]] for output-volume diagnostics — pair
  * queries on dup-heavy corpora are output-bound (SCALE.md sf5
  * rehearsal), so a scaling investigation needs rows alongside
  * seconds to tell plan cost from result growth.
  */
object Count {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[count] $name rows=$n%d time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
