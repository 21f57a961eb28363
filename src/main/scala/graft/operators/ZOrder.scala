package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse data-skipping layout
  * primitive: interleave the bits of several normalized column ranks
  * into one key, then range-partition and sort by it, so EVERY
  * interleaved dimension is simultaneously clustered and file/row-group
  * min-max statistics prune multi-predicate scans (the reason Delta/
  * Iceberg `OPTIMIZE ZORDER BY` exists). At 100 TB this is the
  * difference between a scan that touches every file for
  * `WHERE part = ? AND supplier = ?` and one that touches the handful
  * of files whose (part, supplier) bounding boxes intersect the
  * predicate.
  *
  * Everything is exact integer arithmetic (scale by (2^bits − 1) then
  * integer-divide by the span; shift-and-mask interleave), so the key
  * is reproducible bit-for-bit by any engine — the DuckDB oracle
  * recomputes it with `//` and powers of two (q141).
  */
object ZOrder {

  /** Normalize a numeric column to an integer rank in [0, 2^bits):
    * rank = (x − min) · (2^bits − 1) DIV (max − min), with a
    * degenerate-span guard (constant column → rank 0). Exact integer
    * arithmetic end to end — no float rounding to diverge between
    * engines. `min`/`max` are the column's global bounds, supplied as
    * columns (the scalar-aggregate crossJoin shape — zero driver
    * jobs). */
  def rank(x: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val span = maxV.cast("long") - minV.cast("long")
    val scaled = (x.cast("long") - minV.cast("long")) * lit((1L << bits) - 1)
    // true integer division via (a − a mod b) / b: every term is an
    // exact long below 2^53, and the final division is of an exact
    // multiple — bit-identical to DuckDB's BIGINT `//`
    when(span <= 0, lit(0L)).otherwise(
      ((scaled - pmod(scaled, span)) / span).cast("long"))
  }

  /** Interleave `ranks` (each already in [0, 2^bits)) into one Morton
    * key: bit j of rank i lands at position j·k + i, so the top bits of
    * the key cut ALL dimensions at once. k·bits must fit a long
    * (≤ 63). Pure shift-and-mask column arithmetic — codegen'd, no UDF. */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.size
    require(k >= 1 && k * bits <= 63,
      s"zorder: $k cols x $bits bits must fit in a long")
    val terms = for {
      (r, i) <- ranks.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Attach a Morton key `_z` built from `cols` (numeric), normalized
    * against their global min/max via ONE scalar aggregate crossJoined
    * in (no driver-side pass). */
  def withZKey(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c")))
    val bounds = df.groupBy().agg(aggs.head, aggs.tail: _*)
    val ranks = cols.map(c =>
      rank(col(c), col(s"_min_$c"), col(s"_max_$c"), bits))
    df.crossJoin(bounds)
      .withColumn("_z", interleave(ranks, bits))
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** Cluster a DataFrame for multi-dimensional data skipping:
    * range-partition by the Morton key into `nFiles` output splits and
    * sort within each — every written file then covers a tight
    * bounding box in ALL interleaved dimensions, which is exactly what
    * parquet footer min/max pruning needs. */
  def cluster(df: DataFrame, cols: Seq[String], nFiles: Int,
      bits: Int = 16): DataFrame =
    withZKey(df, cols, bits)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))

  /** The locality audit behind q141: cut the z-keyed relation into
    * `nBuckets` key ranges (top bits of the Morton key — what
    * range-partitioning by `_z` produces) and report each bucket's
    * row count and per-dimension bounding box. Tight boxes in EVERY
    * dimension at once are the measurable z-order property (a
    * single-column sort gives tight boxes in one dimension and
    * full-span boxes in the rest). */
  def bucketStats(df: DataFrame, cols: Seq[String], bits: Int = 16,
      nBuckets: Int = 64): DataFrame = {
    val bShift = {
      val total = cols.size * bits
      val b = (math.log(nBuckets) / math.log(2)).round.toInt
      require((1 << b) == nBuckets, "nBuckets must be a power of two")
      total - b
    }
    val keyed = withZKey(df, cols, bits)
      .withColumn("z_bucket", shiftright(col("_z"), bShift))
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    keyed.groupBy(col("z_bucket")).agg(aggs.head, aggs.tail: _*)
  }
}
