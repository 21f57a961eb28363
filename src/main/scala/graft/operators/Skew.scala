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

  /** Salted equi-join for a skewed fact key — the manual form of AQE's
    * skew-join split, usable when the skew is known up front (and on
    * streaming joins, where AQE can't replan): the fact side salts on
    * content hash (same retry-safe derivation as [[saltedMoneySum]] —
    * never rand()), the dimension side replicates each row across all
    * `buckets` salts, and the join key becomes (key, salt) — a hot key
    * spreads over `buckets` reducers instead of melting one. The
    * output is EXACTLY the unsalted join (each fact row meets exactly
    * the one dim replica carrying its salt); the cost is dim×buckets
    * replication, the standard trade. */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, saltContent: Seq[String], buckets: Int = 16): DataFrame = {
    val f = fact.withColumn("_salt",
      salt(saltContent.map(col), buckets).cast("int"))
    val dRep = dim.withColumn("_dsalt",
      explode(sequence(lit(0), lit(buckets - 1))))
    f.join(dRep, f("_salt") === dRep("_dsalt") &&
        col(factKey) === col(dimKey))
      .drop("_salt", "_dsalt")
  }
}
