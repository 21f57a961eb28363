package graft

import org.apache.spark.sql.functions._

import graft.operators.Features

/** Hand-checked pins for the supervised feature encoders (q265–q268
  * wave): leave-one-out target encoding against the from-definition
  * fold (including the singleton-level → prior edge), WoE/IV against
  * a hand-computed 2×2, and the rule/classification invariants of the
  * inline Pareto-ABC and association-rule queries. */
class FeaturesSpec extends SparkSuite {

  test("targetEncodeLoo excludes the row's own target and smooths to the prior") {
    import spark.implicits._
    // level a: targets 10, 20, 30 (sum 60); level b: single row 100
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0)).toDF("id", "cat", "t")
    val m = 2.0
    val prior = (10.0 + 20.0 + 30.0 + 100.0) / 4.0 // 40
    val out = Features.targetEncodeLoo(df, col("id"), col("cat"), col("t"), m)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("level"), r.getAs[Double]("enc"))).toMap
    // row 1 (level a): (60-10 + 2*40) / (3-1+2) = 130/4 = 32.5
    assert(out(1L)._2 == 32.5)
    // row 2: (60-20+80)/4 = 30.0 ; row 3: (60-30+80)/4 = 27.5
    assert(out(2L)._2 == 30.0 && out(3L)._2 == 27.5)
    // singleton level b: (100-100 + 2*40) / (1-1+2) = exactly the prior
    assert(out(4L)._2 == prior)
    // leak check: no encoding equals its own level's plain mean
    assert(out(1L)._2 != 20.0)
  }

  test("woeIv matches the hand-computed 2x2 with continuity correction") {
    import spark.implicits._
    // level x: 3 good, 1 bad; level y: 1 good, 3 bad  (G=4, B=4, k=2)
    val df = Seq(("x", true), ("x", true), ("x", true), ("x", false),
      ("y", true), ("y", false), ("y", false), ("y", false))
      .toDF("cat", "g")
    val out = Features.woeIv(df, col("cat"), col("g"))
      .collect().map(r => r.getAs[String]("level") -> r).toMap
    val gs = (3.0 + 0.5) / (4.0 + 0.5 * 2) // 0.7
    val bs = (1.0 + 0.5) / (4.0 + 0.5 * 2) // 0.3
    val woeX = math.log(gs / bs)
    assert(math.abs(out("x").getAs[Double]("woe") - woeX) < 1e-6)
    // symmetric fixture: level y is the mirror, so woe_y = -woe_x
    assert(math.abs(out("y").getAs[Double]("woe") + woeX) < 1e-6)
    val ivX = (gs - bs) * woeX
    assert(math.abs(out("x").getAs[Double]("iv_term") - ivX) < 1e-6)
    // iv_total = both terms (equal by symmetry), same on every row
    assert(math.abs(out("x").getAs[Double]("iv_total") - 2 * ivX) < 1e-5)
    assert(out("x").getAs[Double]("iv_total") ==
      out("y").getAs[Double]("iv_total"))
  }

  test("q265 ABC classes are a monotone partition of the revenue ranking") {
    val rows = SparkEntry.queries("q265_pareto_abc")(spark, sf("0.001"))
      .collect()
    assert(rows.nonEmpty)
    // cum_share is nondecreasing in rank and ends at 1.0
    val shares = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // classes appear in A..B..C order along the ranking, all present
    val classes = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("abc_class"))
    assert(classes.mkString.matches("A+B+C+"))
  }

  test("q266 rule metrics satisfy the definitional invariants") {
    val rows = SparkEntry.queries("q266_assoc_rules")(spark, sf("0.001"))
      .collect()
    rows.foreach { r =>
      val co = r.getAs[Long]("co")
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val conf = r.getAs[Double]("confidence")
      val sup = r.getAs[Double]("support")
      val lift = r.getAs[Double]("lift")
      assert(co >= 2 && co <= na && co <= nb)
      assert(conf >= 0.1 && conf <= 1.0)
      assert(sup > 0.0 && sup <= conf + 1e-9) // n_baskets >= n_a
      assert(lift > 0.0)
    }
    // directionality: a->b and b->a confidences differ unless na == nb
    val byPair = rows.groupBy(r => {
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      (math.min(a, b), math.max(a, b))
    })
    byPair.values.filter(_.size == 2).foreach { pair =>
      val Seq(r1, r2) = pair.toSeq
      if (r1.getAs[Long]("n_a") != r2.getAs[Long]("n_a"))
        assert(r1.getAs[Double]("confidence") != r2.getAs[Double]("confidence"))
    }
  }
}
