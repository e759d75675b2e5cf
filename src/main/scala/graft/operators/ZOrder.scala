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
    // Two normalization paths per column:
    //  - integral values whose range fits a long: EXACT long
    //    subtraction, then double scaling (16-ish bits of the result
    //    matter) — keeps precision for high-magnitude narrow ranges
    //    (snowflake-style ids near 2^62, where a double collapses the
    //    whole spread into one ulp);
    //  - otherwise (full-width hash ranges that overflow `mx - mn`,
    //    fractional or uncastable types): double domain, with
    //    NON-FINITE values excluded from the stats and sent to cell 0
    //    (one NaN/Inf row must not silently collapse the dimension).
    val aggs = cols.flatMap { c =>
      val cd = col(c).cast("double")
      val finite = !isnan(cd) && abs(cd) < lit(Double.PositiveInfinity)
      Seq(min(col(c).try_cast(LongType)), max(col(c).try_cast(LongType)),
        min(when(finite, cd)), max(when(finite, cd)))
    }
    val statsRow = df.agg(aggs.head, aggs.tail: _*).head()
    val maxCell = (1L << bits) - 1
    def clamp(cell: Column): Column =
      coalesce(least(greatest(cell, lit(0L)), lit(maxCell)), lit(0L))
    val cells = cols.zipWithIndex.map { case (c, i) =>
      val base = 4 * i
      // the exact long path engages ONLY where the double grid cannot
      // resolve the cells: range * 2^52 / maxAbs below ~2^(bits+4)
      // steps (fractional columns with small magnitudes stay on the
      // double path and keep their sub-integer resolution)
      val exactLong: Option[Column] =
        if (statsRow.isNullAt(base) || statsRow.isNullAt(base + 1)) None
        else {
          val (mn, mx) = (statsRow.getLong(base), statsRow.getLong(base + 1))
          val range = BigInt(mx) - BigInt(mn)
          val maxAbs = math.max(math.abs(mn.toDouble), math.abs(mx.toDouble))
          val doubleSteps =
            if (maxAbs == 0) Double.MaxValue
            else range.toDouble * math.pow(2, 52) / maxAbs
          if (range > 0 && range <= Long.MaxValue &&
              doubleSteps < math.pow(2, math.min(bits + 4, 62)))
            Some(clamp(floor(
              (col(c).try_cast(LongType) - lit(mn)).cast("double") *
                lit(maxCell.toDouble) / lit(range.toLong.toDouble))
              .cast(LongType)))
          else None
        }
      exactLong.getOrElse {
        if (statsRow.isNullAt(base + 2) || statsRow.isNullAt(base + 3))
          lit(0L) // empty input / all-null / all-non-finite: degrade
        else {
          val mn = statsRow.getDouble(base + 2)
          val mx = statsRow.getDouble(base + 3)
          if (!(mx > mn)) lit(0L) // constant column (or sub-ulp range)
          else {
            val cd = col(c).cast("double")
            val finite = !isnan(cd) && abs(cd) < lit(Double.PositiveInfinity)
            clamp(floor((when(finite, cd) - lit(mn)) *
              lit(maxCell.toDouble) / lit(mx - mn)).cast(LongType))
          }
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
    // never clobber a user column that happens to be named _zkey —
    // case-insensitively, because withColumn resolves that way under
    // the default spark.sql.caseSensitive=false
    val zk = Iterator.from(0).map(i => s"_zkey$i")
      .find(n => !df.columns.exists(_.equalsIgnoreCase(n))).get
    df.withColumn(zk, key)
      .repartitionByRange(numFiles, col(zk))
      .sortWithinPartitions(zk)
      .drop(zk)
  }
}
