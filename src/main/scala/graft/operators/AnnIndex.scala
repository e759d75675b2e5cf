package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Disk-backed IVF index: the vectors live in a parquet table
  * PARTITIONED BY their coarse-quantizer cell, so a probe only READS
  * the `nprobe` cells it ranked — at 100 TB the index is built once
  * and every query's scan is bounded by `nprobe / n_cells` of the
  * corpus via plain partition pruning (visible as `PartitionFilters`
  * in the scan; no custom source needed).
  *
  * This is the persistent complement of the in-query IVF (x13): x13
  * re-derives cells per run, which is right for one-shot analytics;
  * a serving/refresh workload amortizes the assignment into the
  * layout, exactly like Z-ordering amortizes sort order
  * (operators/ZOrder).
  *
  * The quantizer is inner-product argmax against a broadcast centroid
  * set (ties to the smaller cell id) — swap the scoring expression for
  * L2 without touching the layout machinery.
  *
  * Scoring runs through the exact-decimal codegen kernel
  * ([[graft.expressions.DecimalDot]]): a PERSISTENT layout must be
  * bit-reproducible — double-accumulation order could move a
  * near-tied vector between cells across rebuilds (and across
  * engines), which would make the index non-deterministic and its
  * probe results un-oracle-able (x65 hash-gates this operator).
  */
object AnnIndex {

  private def dot(v: String, c: String) =
    graft.functions.VectorFns.dotDec(v, c)

  /** Best-cell assignment: one broadcast of the centroids, one scan of
    * the vectors, one hash aggregate — no shuffle keyed on anything
    * bigger than vec_id. Ties go to the smaller cell id; a degenerate
    * vector (null dot) still gets a cell.
    */
  private def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    graft.expressions.DecimalDot.register(embeddings.sparkSession)
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("d", dot("v", "c"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("v").as("v"), col("cid").as("cid")),
        struct(coalesce(col("d"), lit(Double.MinValue)).as("d"),
          (-col("cid")).as("t"))).as("w"))
      .select(col("vec_id"), col("w.v").as("v"), col("w.cid").as("cell"))
  }

  /** Assign every vector to its best cell and write the
    * cell-partitioned index table.
    */
  def build(embeddings: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(embeddings, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incrementally add vectors to an existing index: the same
    * assignment pass in append mode — new files land inside the
    * affected cell directories only, so a refresh touches
    * O(new vectors) data and probes see the additions with no rebuild.
    * Pair with [[Compaction]] when many small refreshes fragment a
    * cell.
    */
  def append(embeddings: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(embeddings, centroids)
      .write.mode("append").partitionBy("cell").parquet(path)

  /** Top-k nearest (by inner product) for each probe, scanning only
    * each probe's `nprobe` best cells. Cell ranking runs distributed
    * (probes × broadcast centroids, probe-partitioned WindowGroupLimit);
    * the union of wanted cells — at most |probes|·nprobe ids — comes
    * back to the driver to become a STATIC partition filter, so the
    * parquet scan prunes before any row is read.
    */
  def probe(spark: SparkSession, path: String, probes: DataFrame,
      centroids: DataFrame, nprobe: Int, k: Int): DataFrame = {
    graft.expressions.DecimalDot.register(spark)
    val rk = row_number().over(
      Window.partitionBy(col("p_id")).orderBy(col("d").desc, col("cid")))
    val wanted = probes.crossJoin(broadcast(centroids))
      .withColumn("d", dot("p", "c"))
      .withColumn("rk", rk).filter(col("rk") <= nprobe)
      .select(col("p_id"), col("cid"))
    val cellIds = wanted.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val index = spark.read.parquet(path)
      .filter(col("cell").isin(cellIds: _*))
    val scoreRk = row_number().over(
      Window.partitionBy(col("p_id")).orderBy(col("score").desc, col("vec_id")))
    probes.join(broadcast(wanted), Seq("p_id"))
      .join(index, col("cid") === col("cell"))
      .withColumn("score", dot("p", "v"))
      .withColumn("rank", scoreRk)
      .filter(col("rank") <= k)
      .select(col("p_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("score"))
      .orderBy(col("p_id"), col("rank"))
  }
}
