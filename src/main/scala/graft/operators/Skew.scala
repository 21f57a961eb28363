package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation operators (SURVEY.md §4 / task brief: "salting for
  * skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting is enabled by default and handles join
  * skew; these helpers cover the aggregation side: a hot grouping key
  * that would funnel into one reducer is first spread over
  * `buckets` salted sub-keys (partial aggregate), then combined
  * (final aggregate). Because the partial aggregates accumulate as
  * exact DECIMAL, the two-phase rewrite is bit-identical to the direct
  * aggregation — provable against the plain-SQL oracle.
  */
object Skew {

  /** Uniform deterministic per-row salt (not stable across partition
    * layouts — irrelevant, salt never affects the result). */
  private def salt(buckets: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong))

  /** Salted exact money-sum + count per key: partial aggregate on
    * (keys, salt), final on keys. Output: keys, <alias>, n_rows. */
  def saltedMoneySum(df: DataFrame, keyCols: Seq[String], valueExpr: Column,
      alias: String, buckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("_salt", salt(buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueExpr.cast(DecimalType(27, 6))).as("_psum"),
           count(lit(1)).as("_pcnt"))
    partial.groupBy(keys: _*)
      .agg(sum(col("_psum")).cast("double").as(alias),
           sum(col("_pcnt")).cast("long").as("n_rows"))
  }
}
