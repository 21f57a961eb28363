package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable sketches. Spark's built-in sketches (HLL++,
  * approx percentiles — q24/q36) are correct and fast but their
  * internals are engine-specific, so the driver can only rows-check
  * them. This HyperLogLog is built from first principles on md5-derived
  * hashes and a pinned estimator, so ANY SQL engine can recompute the
  * registers AND the estimate bit-for-bit — the sketch itself becomes
  * hash-provable.
  *
  * Design (classic Flajolet HLL, m = 256 registers, no range
  * corrections — the estimator is pinned, documented, and measured
  * against the exact count in the same output):
  *  - h = the 52-bit prefix of md5(value-as-string) — exact in BIGINT
  *    and DOUBLE on every engine;
  *  - register index = h mod 256; w = h div 256 (44 payload bits);
  *  - rank ρ = 45 − bitlength(w) (position of the first 1-bit in the
  *    44-bit window; 45 for w = 0);
  *  - registers aggregate with max — ONE (group, idx) partial-agg
  *    shuffle, at most 256 rows per group survive map-side combine;
  *  - estimate = α·m² / Σ 2^−M[j], with 2^−M computed as 1/(1<<M)
  *    (exact — pow() is libm-dependent) and the Σ folded in register
  *    order over a sorted list, so the double sum is deterministic
  *    under any partial-agg split and identical across engines.
  *
  * At 100 TB this is the right shape: the shuffle carries (group, idx,
  * ρ) triples capped at m rows per group regardless of input size.
  */
object Sketches {

  /** Per-group portable-HLL distinct estimate, with the exact count and
    * relative error alongside (the sketch audits itself).
    * Output: (group, hll_estimate, n_zero_registers, exact_distinct,
    * rel_err). */
  def hllDistinct(df: DataFrame, group: String, value: String): DataFrame = {
    val m = 256
    val h = conv(substring(md5(col(value).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val base = df.select(col(group), h.as("h"))
      .withColumn("idx", (col("h") % m).cast("int"))
      .withColumn("w", shiftright(col("h"), 8))
    val rho = when(col("w") === 0L, lit(45))
      .otherwise(lit(45) - length(conv(col("w"), 10, 2)))
    val regs = base.groupBy(col(group), col("idx")).agg(max(rho).as("r"))
    // SQL form: the Scala shiftleft() helper only takes a literal shift
    val term = struct(col("idx"),
      (lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), r)").cast("double")).as("t"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val folded = regs.groupBy(col(group))
      .agg(count(lit(1)).cast("int").as("n_present"),
        aggregate(array_sort(collect_list(term)), lit(0.0),
          (a, x) => a + x.getField("t")).as("s"))
      .withColumn("denom", col("s") + (lit(m) - col("n_present")) * lit(1.0))
      .withColumn("raw", alpha * lit(65536.0) / col("denom"))
      // small-range (linear counting) correction — standard HLL: with
      // V empty registers and a small raw estimate, m·ln(m/V) is far
      // less biased. ln() differs by <=1 ulp across libms; rounding to
      // 4 decimals puts the residual noise astronomically far from a
      // rounding boundary (same argument as the unigram-LM oracle).
      .withColumn("v", lit(m) - col("n_present"))
      .withColumn("hll_estimate", round(
        when(col("raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("raw")), 4))
    val exact = df.groupBy(col(group))
      .agg(countDistinct(col(value)).as("exact_distinct"))
    folded.join(exact, group)
      .select(col(group), col("hll_estimate"),
        col("v").as("n_zero_registers"),
        col("exact_distinct"),
        round(abs(col("hll_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"))
  }
}
