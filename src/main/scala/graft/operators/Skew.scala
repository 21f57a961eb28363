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

  /** Per-row salt from a content hash — deterministic under task retry
    * and partial recompute. monotonically_increasing_id/rand here would
    * be the SPARK-23207 failure class: a recomputed map task could
    * re-salt rows differently from the outputs surviving reducers
    * already fetched, double-counting or dropping them. Rows with
    * identical (keys, value) content share a bucket; skew spreading
    * still holds whenever values vary within hot keys. */
  private def salt(content: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(content: _*), lit(buckets.toLong))

  /** Salted exact money-sum + count per key: partial aggregate on
    * (keys, salt), final on keys. Output: keys, <alias>, n_rows. */
  def saltedMoneySum(df: DataFrame, keyCols: Seq[String], valueExpr: Column,
      alias: String, buckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("_salt", salt(keys :+ valueExpr, buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(valueExpr.cast(DecimalType(27, 6))).as("_psum"),
           count(lit(1)).as("_pcnt"))
    partial.groupBy(keys: _*)
      .agg(sum(col("_psum")).cast("double").as(alias),
           sum(col("_pcnt")).cast("long").as("n_rows"))
  }
}
