package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering semantics not covered by the q141 oracle: the
  * interleave bit layout, the range-clustered file split, and the
  * measurable locality property (tight bounding boxes in EVERY
  * interleaved dimension at once). */
class ZOrderSpec extends SparkSuite {

  import spark.implicits._

  test("interleave bit layout: bit j of rank i lands at j*k + i") {
    // rp = 101b -> positions 0,4 ; rs = 011b -> positions 1,3
    val z = Seq((5L, 3L)).toDF("rp", "rs")
      .select(ZOrder.interleave(Seq(col("rp"), col("rs")), bits = 3).as("z"))
      .head().getLong(0)
    assert(z == 27L, s"expected 27 (11011b), got $z")
  }

  test("bucketStats: z-buckets bound BOTH dimensions tightly at once") {
    val li = Tables.lineitem(spark, sf("0.001"))
      .select(col("l_partkey"), col("l_suppkey"))
    val stats = ZOrder.bucketStats(li, Seq("l_partkey", "l_suppkey"),
        bits = 16, nBuckets = 64)
      .collect()
    assert(stats.length > 16, "the key space must actually spread")
    val (gSpanP, gSpanS) = {
      val r = li.agg(max("l_partkey") - min("l_partkey"),
        max("l_suppkey") - min("l_suppkey")).head()
      (r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    // 64 buckets fix the top 3 bits of each 16-bit rank: every bucket's
    // box must span at most ~1/8 of each dimension (allow 1/4 for
    // rank-quantization edges). A single-column sort would leave the
    // SECOND dimension at full span — the property under test.
    stats.foreach { r =>
      val spanP = (r.getLong(3) - r.getLong(2)).toDouble
      val spanS = (r.getLong(5) - r.getLong(4)).toDouble
      assert(spanP <= gSpanP / 4 + 1,
        s"bucket ${r.getLong(0)} part-span $spanP vs global $gSpanP")
      assert(spanS <= gSpanS / 4 + 1,
        s"bucket ${r.getLong(0)} supp-span $spanS vs global $gSpanS")
    }
  }

  test("cluster() range-partitions by the Morton key into nFiles splits") {
    val li = Tables.lineitem(spark, sf("0.001"))
      .select(col("l_partkey"), col("l_suppkey"))
    val clustered = ZOrder.cluster(li, Seq("l_partkey", "l_suppkey"), nFiles = 8)
    assert(clustered.rdd.getNumPartitions == 8)
    // partitions are z-ranges: per-partition max(_z) must be
    // non-decreasing across partition ids, and rows sorted within
    val perPart = clustered.select(col("_z"))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(min(col("_z")).as("lo"), max(col("_z")).as("hi"))
      .orderBy(col("pid")).collect()
    val ok = perPart.sliding(2).forall {
      case Array(a, b) => a.getLong(2) <= b.getLong(1)
      case _ => true
    }
    assert(ok, "partition z-ranges must not overlap out of order")
  }
}
