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

  /** Two-phase GLOBAL ranking — the distributed form of an
    * unpartitioned `row_number()/ntile()/sum() over (order by …)`
    * window, which WindowExec otherwise executes by moving the whole
    * relation to ONE partition (the "No Partition Defined" warning —
    * a serialization point that grows with the corpus). Standard
    * range-partitioned rank: range-shuffle on the total order, local
    * row_number/running sums per partition, then per-partition counts
    * and totals (a numShufflePartitions-row spine) turn into exclusive
    * prefix offsets that are broadcast-joined back. Because `order`
    * must be a UNIQUE total order (callers append a tiebreak id — the
    * same requirement the single-partition window already had for
    * determinism), global rank = partition offset + local rank is
    * EXACTLY row_number over the unpartitioned window; running
    * DECIMAL/long sums split the same way (exact addition is
    * associative). Output: the input columns plus `_rank` (1-based),
    * `_n` (total rows), and for each (name, expr) in `prefixSums` a
    * running inclusive sum `name` and its grand total `_tot_name`. */
  def rangedRank(df: DataFrame, order: Seq[Column],
      prefixSums: Seq[(String, Column)] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    // localCheckpoint is CORRECTNESS here, not the usual dual-arm cost
    // trade: spark_partition_id() is nondeterministic and the range
    // boundaries are sampled, so the rank arm and the offsets arm must
    // read ONE pinned pid assignment — re-evaluating the exchange per
    // arm can sample different boundaries and skew every rank by the
    // boundary delta (observed ±4 on q184 before the pin).
    val parted = df.repartitionByRange(p, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val wRun = wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = prefixSums.foldLeft(
      parted.withColumn("_lrk", row_number().over(wLocal).cast("long"))) {
      case (d, (nm, c)) => d.withColumn(s"_l_$nm", sum(c).over(wRun))
    }
    // per-partition totals: a P-row spine — the bounded relation the
    // offset windows below are allowed to single-partition over
    val tot = parted.groupBy(col("_pid")).agg(
      count(lit(1)).as("_cnt"),
      prefixSums.map { case (nm, c) => sum(c).as(s"_t_$nm") }: _*)
    val wPrev = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val offs = prefixSums.foldLeft(
      tot.withColumn("_off", coalesce(sum(col("_cnt")).over(wPrev), lit(0L)))
        .withColumn("_n", sum(col("_cnt")).over(wAll))) {
      case (d, (nm, _)) =>
        d.withColumn(s"_o_$nm", sum(col(s"_t_$nm")).over(wPrev))
          .withColumn(s"_tot_$nm", sum(col(s"_t_$nm")).over(wAll))
    }.select(col("_pid") +: col("_off") +: col("_n") +:
      prefixSums.flatMap { case (nm, _) =>
        Seq(col(s"_o_$nm"), col(s"_tot_$nm")) }: _*)
    val joined = local.join(broadcast(offs), Seq("_pid"))
      .withColumn("_rank", col("_off") + col("_lrk"))
    prefixSums.foldLeft(joined) { case (d, (nm, _)) =>
      // null-safe split of sum's skip-nulls semantics: the running sum
      // is null only while NO non-null value has been seen yet
      d.withColumn(nm,
        when(col(s"_o_$nm").isNull, col(s"_l_$nm"))
          .when(col(s"_l_$nm").isNull, col(s"_o_$nm"))
          .otherwise(col(s"_o_$nm") + col(s"_l_$nm")))
        .drop(s"_o_$nm", s"_l_$nm")
    }.drop("_pid", "_off", "_lrk")
  }

  /** `ntile(k)` reconstructed from a [[rangedRank]] global rank and
    * total row count — Spark's NTile semantics exactly: with n rows,
    * base = n/k and rem = n%k, the first rem buckets hold base+1 rows
    * and the rest base. Pure per-row arithmetic, no window. */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    // Spark's `/` on longs is DOUBLE division — every quotient here is
    // floor-divided explicitly. Exact for n < 2^53 (the double-exact
    // integer range; ranks beyond that are not a realistic relation).
    val kL = lit(k.toLong)
    val rem = n % kL
    val base = ((n - rem) / kL).cast("long") // exactly divisible
    val cut = rem * (base + lit(1L))
    when(rank <= cut,
      floor((rank - lit(1L)) / (base + lit(1L))).cast("long") + lit(1L))
      .otherwise(rem + floor((rank - lit(1L) - cut) /
        when(base === lit(0L), lit(1L)).otherwise(base)).cast("long") +
        lit(1L))
      .cast("int")
  }
}
