package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIndex

/** Disk-backed IVF index: layout, partition-pruned probing, and
  * exactness when every cell is probed.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def dot(v: String, c: String) =
    expr(s"aggregate(zip_with($v, $c, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  private lazy val vectors = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  private lazy val centroids = vectors.filter(col("vec_id").between(1, 8))
    .select(col("vec_id").as("cid"), col("v").as("c"))

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-annindex").toString
    AnnIndex.build(vectors, centroids, p)
    p
  }

  test("build writes a cell-partitioned table covering every vector") {
    val dirs = new java.io.File(indexPath).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(dirs.nonEmpty && dirs.length <= 8, s"cells: ${dirs.toSeq}")
    val index = spark.read.parquet(indexPath)
    assert(index.count() == vectors.count(), "no vector lost in the layout")
    assert(index.select(col("vec_id")).distinct().count() == vectors.count())
  }

  test("probe prunes partitions and honors each probe's own cell budget") {
    val probes = vectors.filter(col("vec_id").between(20, 22))
      .select(col("vec_id").as("p_id"), col("v").as("p"))
    val out = AnnIndex.probe(spark, indexPath, probes, centroids, nprobe = 2, k = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["),
      "the cell restriction must reach the scan as a partition filter")
    // recompute each probe's 2 best cells and assert every hit honors them
    val wanted = probes.crossJoin(broadcast(centroids))
      .withColumn("d", dot("p", "c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("p_id")).orderBy(col("d").desc, col("cid"))))
      .filter(col("rk") <= 2)
      .select(col("p_id").cast("long"), col("cid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellOf = spark.read.parquet(indexPath)
      .select(col("vec_id").cast("long"), col("cell").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(wanted.contains((r.getLong(0), cellOf(r.getLong(2)))),
        s"hit ${r.getLong(2)} outside probe ${r.getLong(0)}'s cells")
    }
  }

  test("append lands in the right cells and probes see it without rebuild") {
    val p = java.nio.file.Files.createTempDirectory("graft-annindex-app").toString
    AnnIndex.build(vectors.filter(col("vec_id") <= 400), centroids, p)
    val before = spark.read.parquet(p).count()
    def dataFiles(): Set[String] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(p)).map(_.getPath)
        .filter(_.endsWith(".parquet")).toSet
    }
    val filesBefore = dataFiles()
    AnnIndex.append(vectors.filter(col("vec_id") > 400), centroids, p)
    // incremental refresh discipline: the append wrote new files ONLY
    // inside the cell directories its batch assigns to — untouched
    // cells keep exactly their old files (O(new vectors) churn)
    val appendedCells = vectors.filter(col("vec_id") > 400)
      .crossJoin(broadcast(centroids))
      .withColumn("d", dot("v", "c"))
      .groupBy(col("vec_id"))
      .agg(org.apache.spark.sql.functions.max_by(col("cid"),
        struct(col("d"), -col("cid"))).as("cell"))
      .select(col("cell")).distinct()
      .collect().map(r => s"cell=${r.getLong(0)}").toSet
    val newFiles = dataFiles() -- filesBefore
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val cellDir = new java.io.File(f).getParentFile.getName
      assert(appendedCells.contains(cellDir),
        s"append wrote $f outside its batch's cells $appendedCells")
    }
    val index = spark.read.parquet(p)
    assert(index.count() == vectors.count() && before < index.count())
    // an appended vector must land in its best cell, same rule as build
    val expectedCell = vectors.filter(col("vec_id") === 450)
      .crossJoin(broadcast(centroids))
      .withColumn("d", dot("v", "c"))
      .orderBy(col("d").desc, col("cid"))
      .select(col("cid")).first().getLong(0)
    val actualCell = index.filter(col("vec_id") === 450)
      .select(col("cell").cast("long")).first().getLong(0)
    assert(actualCell == expectedCell, "appended row filed under its best cell")
    // and full-coverage probing over the appended index must return it
    // among results drawn from appended data
    val probe = vectors.filter(col("vec_id") === 450)
      .select(col("vec_id").as("p_id"), col("v").as("p"))
    val hits = AnnIndex.probe(spark, p, probe, centroids, nprobe = 8, k = 500)
      .collect()
    assert(hits.exists(_.getLong(2) == 450L),
      "the appended vector is reachable through the probe path")
  }

  test("probing every cell equals the brute-force top-k") {
    val probes = vectors.filter(col("vec_id").between(20, 22))
      .select(col("vec_id").as("p_id"), col("v").as("p"))
    val ivf = AnnIndex.probe(spark, indexPath, probes, centroids, nprobe = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = probes.crossJoin(vectors)
      .withColumn("score", dot("p", "v"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("p_id")).orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("p_id"), col("rank").cast("long").as("rank"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute, "full-coverage probe must be exact")
  }
}
