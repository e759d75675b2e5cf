package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning — the lakehouse-side lever that query-side pushdown can't
  * replace: parquet row-group/file min-max stats only prune when the
  * data is CLUSTERED on the filtered columns, and a single-column sort
  * clusters exactly one dimension (the classic failure: sorted by
  * order key, so a part-key filter reads every file). Interleaving the
  * bits of both dimensions gives every file a tight bounding box in
  * BOTH, so either filter — or their conjunction — skips most files.
  * At 100 TB this decides whether a selective two-column query reads
  * gigabytes or the whole table.
  *
  * Mechanics: per column, one stats pass collects (min, max); values
  * min-max-normalize into `bits`-wide integer grid cells
  * (monotonic ⇒ range queries survive quantization), and a fixed
  * bit-interleave expression (generated inline, codegen-friendly —
  * never a UDF) produces the Morton key. `repartitionByRange` on the
  * key gives ~equal files with disjoint curve segments;
  * `sortWithinPartitions` tightens row groups inside each file.
  * Nulls sort to cell 0 (they cluster together, pruning still holds).
  */
object ZOrder {

  /** Bit-interleave of pre-quantized cell columns (each in
    * [0, 2^bits)): column i contributes bit b to output bit
    * b*n + i — a pure bitwise expression chain.
    */
  private[graft] def interleave(cells: Seq[Column], bits: Int): Column = {
    val n = cells.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cells.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The Morton key for `cols` over `df`'s own value ranges. One
    * driver-side stats action per call (the analog of a broadcast
    * side); pass the stats explicitly in a pipeline that already
    * has them.
    */
  def mortonKey(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(cols.size * bits <= 63, s"${cols.size} x $bits bits exceed a long")
    // stats and per-row normalization both run in DOUBLE: grid
    // quantization only needs ~`bits` bits of relative precision, and
    // double subtraction never overflows — a full-width long range
    // (e.g. xxhash64 ids spanning -2^63..2^63) would overflow the
    // integer `col - min` under ANSI and wrap `(mx - mn)` on the driver
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    val maxCell = (1L << bits) - 1
    val cells = cols.zipWithIndex.map { case (c, i) =>
      // empty input / all-null / uncastable column: stats are null —
      // degrade that dimension to cell 0 (layout still valid)
      if (statsRow.isNullAt(2 * i) || statsRow.isNullAt(2 * i + 1)) lit(0L)
      else {
        val mn = statsRow.getDouble(2 * i)
        val mx = statsRow.getDouble(2 * i + 1)
        if (!(mx > mn)) lit(0L) // constant column (or sub-ulp range)
        else {
          val cell = floor((col(c).cast("double") - lit(mn)) *
            lit(maxCell.toDouble) / lit(mx - mn)).cast(LongType)
          coalesce(least(greatest(cell, lit(0L)), lit(maxCell)), lit(0L))
        }
      }
    }
    interleave(cells, bits)
  }

  /** Repartition+sort `df` along the Morton curve of `cols` into
    * `numFiles` range partitions — ready for `.write.parquet`: each
    * output file covers a disjoint curve segment, i.e. a tight
    * multi-dimensional bounding box for the stats-based pruner.
    */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame = {
    val key = mortonKey(df, cols, bits)
    // never clobber a user column that happens to be named _zkey
    val zk = Iterator.from(0).map(i => s"_zkey$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(zk, key)
      .repartitionByRange(numFiles, col(zk))
      .sortWithinPartitions(zk)
      .drop(zk)
  }
}
