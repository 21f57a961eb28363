package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Skew.rangedRank / ntileFromRank to the unpartitioned-window
  * semantics they replace (q174/q184/q265 re-keys): global rank,
  * running decimal prefix sums, and NTile bucketing must be
  * value-identical to row_number()/sum()/ntile() over a single-
  * partition ORDER BY window, for asc and desc orders, with n both
  * divisible and non-divisible by the bucket count. */
class RangedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rangedRank rank and prefix sums match the unpartitioned window") {
    val df = spark.range(1501).select(col("id").as("u"),
      pmod(xxhash64(col("id")), lit(40)).as("freq"),
      (pmod(xxhash64(col("id"), lit(7)), lit(1000)).cast("double") / 100)
        .cast(org.apache.spark.sql.types.DecimalType(27, 6)).as("v"))
    for (order <- Seq(Seq(col("freq"), col("u")),
                      Seq(col("freq").desc, col("u")))) {
      val ranked = graft.operators.Skew.rangedRank(df, order,
        prefixSums = Seq("cs" -> col("v")))
      val w = Window.orderBy(order: _*)
      val truth = df
        .withColumn("trk", row_number().over(w).cast("long"))
        .withColumn("tcs", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val j = ranked.join(truth, Seq("u", "freq", "v"))
      assert(j.filter(col("_rank") =!= col("trk")).count() === 0L)
      assert(j.filter(col("cs") =!= col("tcs")).count() === 0L)
      assert(j.filter(col("_n") =!= lit(1501L)).count() === 0L)
      assert(j.filter(col("_tot_cs").isNotNull).count() === 1501L)
      for (k <- Seq(5, 7)) {
        val nt = j.withColumn("nt",
          graft.operators.Skew.ntileFromRank(col("_rank"), col("_n"), k))
          .withColumn("tnt", ntile(k).over(w))
        assert(nt.filter(col("nt") =!= col("tnt")).count() === 0L)
      }
    }
  }
}
