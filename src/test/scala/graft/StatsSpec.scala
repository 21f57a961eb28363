package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quality, Stats}

/** Hand-checked pins for the round-9 statistical-battery and
  * governance additions: Spearman/Kruskal-Wallis/ANOVA against
  * from-definition reference computations, the randomization test's
  * degenerate and separated cases, the BH step-up's
  * pulled-in-discovery shape, and the k-anonymity / DP-release
  * contracts. */
class StatsSpec extends SparkSuite {

  // ---- reference implementations (straight from the textbook forms) ----

  /** Average ranks with ties (1-based). */
  private def avgRanks(vs: Seq[Double]): Seq[Double] = {
    val sorted = vs.sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
      v -> g.map(_._2 + 1.0).sum / g.size
    }
    vs.map(rankOf)
  }

  private def pearson(x: Seq[Double], y: Seq[Double]): Double = {
    val n = x.size.toDouble
    val sx = x.sum; val sy = y.sum
    val sxx = x.map(v => v * v).sum; val syy = y.map(v => v * v).sum
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("spearmanReport matches the from-definition rho with ties") {
    import spark.implicits._
    val pts = Seq(
      (1.0, 2.0), (1.0, 3.0), (2.0, 3.0), (2.0, 5.0), (3.0, 4.0),
      (3.0, 4.0), (4.0, 8.0), (5.0, 7.0), (5.0, 9.0), (6.0, 9.0))
    val df = pts.toDF("x", "y")
    val r = Stats.spearmanReport(df, col("x"), col("y")).head()
    assert(r.getLong(0) == 10L)
    assert(r.getLong(1) == 6L && r.getLong(2) == 7L)
    val expected = pearson(avgRanks(pts.map(_._1)), avgRanks(pts.map(_._2)))
    assert(math.abs(r.getDouble(3) - expected) < 1e-12,
      s"rho=${r.getDouble(3)} expected=$expected")
  }

  test("spearmanReport: perfect monotone association is rho=1") {
    import spark.implicits._
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 99.0))
      .toDF("x", "y")
    val rho = Stats.spearmanReport(df, col("x"), col("y"))
      .head().getDouble(3)
    assert(rho == 1.0)
  }

  test("kruskalWallisReport matches the from-definition tie-corrected H") {
    import spark.implicits._
    val data = Seq(
      "a" -> 1.0, "a" -> 2.0, "a" -> 2.0, "a" -> 5.0,
      "b" -> 2.0, "b" -> 6.0, "b" -> 7.0,
      "c" -> 5.0, "c" -> 8.0, "c" -> 9.0, "c" -> 9.0)
    val df = data.map(_.swap).toDF("v", "g")
    val r = Stats.kruskalWallisReport(df, col("v"), col("g"),
      Seq("a", "b", "c")).head()
    val n = data.size.toDouble
    val ranks = avgRanks(data.map(_._2))
    val byG = data.map(_._1).zip(ranks).groupBy(_._1)
    val sumTerm = Seq("a", "b", "c").map { g =>
      val rs = byG(g).map(_._2)
      val rj = rs.sum
      rj * rj / rs.size
    }.sum
    val h = 12.0 / (n * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val tieSum = data.map(_._2).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val hc = h / (1.0 - tieSum / (n * n * n - n))
    assert(r.getLong(0) == 11L && r.getInt(1) == 3 && r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - h) < 1e-9,
      s"h=${r.getDouble(3)} expected=$h")
    assert(math.abs(r.getDouble(4) - hc) < 1e-9,
      s"hc=${r.getDouble(4)} expected=$hc")
  }

  test("anovaFReport matches the from-definition F") {
    import spark.implicits._
    val data = Seq(
      "a" -> 1.0, "a" -> 2.0, "a" -> 3.0,
      "b" -> 4.0, "b" -> 5.0, "b" -> 6.0,
      "c" -> 7.0, "c" -> 9.0, "c" -> 11.0)
    val df = data.map(_.swap).toDF("v", "g")
    val r = Stats.anovaFReport(df, col("v"), col("g"),
      Seq("a", "b", "c")).head()
    val groupsV = Seq("a", "b", "c").map(g =>
      data.filter(_._1 == g).map(_._2))
    val grand = data.map(_._2).sum / data.size
    val ssb = groupsV.map(vs =>
      vs.size * math.pow(vs.sum / vs.size - grand, 2)).sum
    val ssw = groupsV.map(vs => {
      val m = vs.sum / vs.size; vs.map(v => math.pow(v - m, 2)).sum
    }).sum
    val f = (ssb / 2.0) / (ssw / 6.0)
    assert(r.getLong(0) == 9L && r.getLong(2) == 2L && r.getLong(3) == 6L)
    assert(math.abs(r.getDouble(4) - ssb) < 1e-6)
    assert(math.abs(r.getDouble(5) - ssw) < 1e-6)
    assert(math.abs(r.getDouble(6) - f) < 1e-6)
  }

  test("permutationTest: all-equal values give p=1; separation gives p=1/(reps+1); deterministic") {
    import spark.implicits._
    val flat = (1 to 40).map(i => (i.toLong, 5.0, i % 3 == 0))
      .toDF("id", "v", "a")
    val r0 = Stats.permutationTest(flat, col("id"), col("v"), col("a"),
      reps = 19).head()
    // every re-drawn diff is 0 == |diff_obs| → all 19 are "extreme"
    assert(r0.getAs[Long]("n_extreme") == 19L)
    assert(r0.getAs[Double]("p_value") == 1.0)
    val sep = ((1 to 20).map(i => (i.toLong, 1000.0 + i, true)) ++
      (21 to 40).map(i => (i.toLong, i.toDouble, false)))
      .toDF("id", "v", "a")
    val r1 = Stats.permutationTest(sep, col("id"), col("v"), col("a"),
      reps = 99).head()
    assert(r1.getAs[Long]("n_extreme") == 0L,
      s"separated groups should beat every re-draw: $r1")
    assert(r1.getAs[Double]("p_value") == 0.01)
    val r2 = Stats.permutationTest(sep, col("id"), col("v"), col("a"),
      reps = 99).head()
    assert(r1 == r2, "same seed must reproduce bit-identically")
  }

  test("groupedPermutationPvalues: per-group results equal the single-group test") {
    import spark.implicits._
    val rows = ((1 to 20).map(i => ("g1", i.toLong, 1000.0 + i, true)) ++
      (21 to 40).map(i => ("g1", i.toLong, i.toDouble, false)) ++
      (41 to 80).map(i => ("g2", i.toLong, 5.0, i % 3 == 0)))
      .toDF("g", "id", "v", "a")
    val got = Stats.groupedPermutationPvalues(rows, col("id"), col("v"),
      col("a"), col("g"), reps = 99).collect()
    assert(got.length == 2)
    val g1 = got.find(_.getString(0) == "g1").get
    val g2 = got.find(_.getString(0) == "g2").get
    assert(g1.getAs[Double]("p_value") == 0.01, s"g1: $g1")
    assert(g2.getAs[Double]("p_value") == 1.0, s"g2: $g2")
    // must agree with running permutationTest on the slice alone (the
    // md5 urn keys on (id, rep, seed) only, so the slice is identical)
    val solo = Stats.permutationTest(
      rows.filter(col("g") === "g1"), col("id"), col("v"), col("a"),
      reps = 99).head()
    assert(solo.getAs[Double]("diff_obs") == g1.getAs[Double]("diff_obs"))
    assert(solo.getAs[Long]("n_extreme") == g1.getAs[Long]("n_extreme"))
  }

  test("bhFdr: step-up pulls a failed middle rank into the discovery set") {
    import spark.implicits._
    val pv = Seq(("t1", 0.01), ("t2", 0.026), ("t3", 0.037), ("t4", 0.9))
      .toDF("t", "p")
    val got = Stats.bhFdr(pv, col("t"), col("p"), alpha = 0.05).collect()
    // thresholds at m=4: .0125, .025, .0375, .05 → rank2 (.026) fails
    // its own bar but rank3 (.037) passes → k*=3 pulls rank2 in
    assert(got.map(_.getString(0)).toSeq == Seq("t1", "t2", "t3", "t4"))
    assert(got.map(_.getBoolean(4)).toSeq ==
      Seq(true, true, true, false))
    val none = Stats.bhFdr(Seq(("t1", 0.5), ("t2", 0.9)).toDF("t", "p"),
      col("t"), col("p"), alpha = 0.05).collect()
    assert(none.forall(!_.getBoolean(4)))
  }

  test("kAnonymityAudit: hand-checked classes") {
    import spark.implicits._
    // classes: (A,1)x3 sens{x,y}, (A,2)x1 sens{x}, (B,1)x4 sens{x,y,z}
    val df = Seq(
      ("A", 1, "x"), ("A", 1, "y"), ("A", 1, "x"),
      ("A", 2, "x"),
      ("B", 1, "x"), ("B", 1, "y"), ("B", 1, "z"), ("B", 1, "x"))
      .toDF("q1", "q2", "sens")
    val r = Quality.kAnonymityAudit(df,
      Seq("q1" -> col("q1"), "q2" -> col("q2")), col("sens"), k = 3)
      .head()
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("k_anonymity") == 1L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("n_classes_below_k") == 1L)
    assert(r.getAs[Long]("n_rows_below_k") == 1L)
    assert(r.getAs[Double]("pct_rows_below_k") == 0.125)
  }

  test("dpNoisyCounts: deterministic, absent group releases noisy zero, noise matches the driver literal") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b").toDF("g")
    val groups = Seq("a", "b", "c")
    val r1 = Quality.dpNoisyCounts(df, col("g"), groups, epsilon = 0.5,
      seed = 7L).collect()
    val r2 = Quality.dpNoisyCounts(df, col("g"), groups, epsilon = 0.5,
      seed = 7L).collect()
    assert(r1.toSeq == r2.toSeq, "seeded release must be deterministic")
    val byG = r1.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byG("a") == 3.0 + Quality.dpLaplaceNoise(7L, "a", 0.5))
    assert(byG("b") == 1.0 + Quality.dpLaplaceNoise(7L, "b", 0.5))
    assert(byG("c") == 0.0 + Quality.dpLaplaceNoise(7L, "c", 0.5))
    // different seeds decorrelate the noise
    assert(Quality.dpLaplaceNoise(7L, "a", 0.5) !=
      Quality.dpLaplaceNoise(8L, "a", 0.5))
    // scale: eps=0.5 noise is 4x the eps=2 noise for the same urn draw
    val u = Quality.dpLaplaceNoise(7L, "a", 1.0)
    assert(math.abs(Quality.dpLaplaceNoise(7L, "a", 0.5) - 2.0 * u) < 2e-9)
  }

  /** Classic stack-based pool-adjacent-violators on (weight, mean)
    * bins — the from-definition reference for the minimax form. */
  private def pav(bins: Seq[(Long, Double)]): Seq[Double] = {
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Int)] // weight, mean, bins pooled
    for ((w, m) <- bins) {
      stack += ((w, m, 1))
      while (stack.size >= 2 && stack(stack.size - 2)._2 >= stack.last._2) {
        val (w2, m2, c2) = stack.remove(stack.size - 1)
        val (w1, m1, c1) = stack.remove(stack.size - 1)
        stack += ((w1 + w2, (m1 * w1 + m2 * w2) / (w1 + w2), c1 + c2))
      }
    }
    stack.flatMap { case (_, m, c) => Seq.fill(c)(m) }.toSeq
  }

  test("isotonicCalibration matches stack-based PAV and is monotone") {
    import spark.implicits._
    // per-bin (n, n_pos) with two violations: 0.5, 0.25, 0.75, 0.5
    val rows = Seq(
      (0.11, Seq(1, 1, 0, 0)), (0.31, Seq(1, 0, 0, 0)),
      (0.61, Seq(1, 1, 1, 0)), (0.91, Seq(1, 1, 0, 0)))
      .flatMap { case (s, ys) => ys.map(y => (s, y.toLong)) }
    val df = rows.toDF("score", "y")
    val got = Quality.isotonicCalibration(df, col("score"), col("y"),
      bins = 4).collect()
    val expected = pav(Seq((4L, 0.5), (4L, 0.25), (4L, 0.75), (4L, 0.5)))
    assert(got.map(_.getAs[Double]("isotonic")).toSeq == expected,
      s"got ${got.map(_.getDouble(4)).toSeq}, expected $expected")
    assert(got.map(_.getAs[Long]("n")).forall(_ == 4L))
    val iso = got.map(_.getAs[Double]("isotonic"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "fit must be nondecreasing")
  }

  test("isotonicCalibration: already-monotone input is returned unchanged") {
    import spark.implicits._
    val rows = Seq((0.05, 0L), (0.05, 0L), (0.35, 0L), (0.35, 1L),
      (0.65, 1L), (0.65, 1L), (0.95, 1L), (0.95, 1L))
    val got = Quality.isotonicCalibration(rows.toDF("score", "y"),
      col("score"), col("y"), bins = 10).collect()
    assert(got.map(r => r.getAs[Double]("isotonic")).toSeq ==
      got.map(r => r.getAs[Double]("frac_pos")).toSeq,
      "a monotone empirical curve is its own isotonic fit")
  }

  test("dpNoisyStats: clips, splits the budget, floors the mean denominator") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("a", 999.0), ("b", 50.0)).toDF("g", "v")
    val groups = Seq("a", "b", "c")
    val r = Quality.dpNoisyStats(df, col("g"), groups, col("v"),
      lo = 0.0, hi = 100.0, epsilon = 0.5, seed = 3L).collect()
    val byG = r.map(x => x.getString(0) ->
      (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    // 999 clips to 100: sum(a) = 110 exactly on the grid
    val ncA = Quality.dpLaplaceNoise(3L, "a:cnt", 0.25)
    val nsA = Quality.dpLaplaceNoise(3L, "a:sum", 0.25 / 100.0)
    assert(byG("a")._1 == 2.0 + ncA)
    assert(byG("a")._2 == 110.0 + nsA)
    assert(byG("a")._3 ==
      (110.0 + nsA) / math.max(2.0 + ncA, 1.0))
    // absent group: noisy zero on both channels, denominator floored
    val ncC = Quality.dpLaplaceNoise(3L, "c:cnt", 0.25)
    val nsC = Quality.dpLaplaceNoise(3L, "c:sum", 0.25 / 100.0)
    assert(byG("c")._1 == ncC && byG("c")._2 == nsC)
    assert(byG("c")._3 == nsC / math.max(ncC, 1.0))
    // determinism
    val r2 = Quality.dpNoisyStats(df, col("g"), groups, col("v"),
      lo = 0.0, hi = 100.0, epsilon = 0.5, seed = 3L).collect()
    assert(r.toSeq == r2.toSeq)
  }

  test("fdAudit: held FD has g3 = 0, violated FD counts minimal deletions") {
    import spark.implicits._
    // dept -> building VIOLATED: dept 10 has {A: 3 rows, B: 1 row}
    // (g3 = 1: delete the B row), dept 20 clean; id -> dept holds.
    val df = Seq(
      (1, 10, "A"), (2, 10, "A"), (3, 10, "A"), (4, 10, "B"),
      (5, 20, "C"), (6, 20, "C"),
      (7, 30, "D")).toDF("id", "dept", "building")
    val out = Quality.fdAudit(df,
        Seq("id" -> "dept", "dept" -> "building"))
      .collect().map(r => r.getAs[String]("lhs") -> r).toMap
    val held = out("id")
    assert(held.getAs[Long]("n_rows") == 7 && held.getAs[Long]("n_groups") == 7)
    assert(held.getAs[Long]("g3_rows") == 0 && held.getAs[Boolean]("holds"))
    val viol = out("dept")
    assert(viol.getAs[Long]("n_groups") == 3)
    assert(viol.getAs[Long]("n_violating") == 1)
    assert(viol.getAs[Long]("g3_rows") == 1 && !viol.getAs[Boolean]("holds"))
    // null determinants are excluded, null dependents count as a value
    val withNulls = Seq(
      (Some(1), Some("x")), (None, Some("y")),
      (Some(2), None), (Some(2), None)).toDF("k", "v")
    val r = Quality.fdAudit(withNulls, Seq("k" -> "v")).collect().head
    assert(r.getAs[Long]("n_rows") == 3) // the null-k row dropped
    assert(r.getAs[Long]("n_groups") == 2)
    assert(r.getAs[Boolean]("holds")) // k=2 -> {null, null}: consistent
  }

  test("mrrReport: first-hit reciprocal ranks and the truncated-MRR mean") {
    import spark.implicits._
    // probe 1: relevant at ranks 3 and 5 -> rr = 1/3
    // probe 2: no relevant hit -> rr = 0
    // probe 3: relevant at rank 1 -> rr = 1
    val ranked = Seq(
      (1L, 1, false), (1L, 2, false), (1L, 3, true), (1L, 5, true),
      (2L, 1, false), (2L, 2, false),
      (3L, 1, true), (3L, 2, false)).toDF("p", "rank", "rel")
    val out = Quality.mrrReport(ranked, col("p"), col("rank"), col("rel"))
      .collect().map(r => r.getAs[Long]("probe") -> r).toMap
    assert(out(1L).getAs[Int]("hit_rank") == 3)
    assert(out(1L).getAs[Double]("rr") == 1.0 / 3.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("hit_rank")))
    assert(out(2L).getAs[Double]("rr") == 0.0)
    assert(out(3L).getAs[Double]("rr") == 1.0)
    val mrr = out(1L).getAs[Double]("mrr")
    assert(math.abs(mrr - (1.0 / 3.0 + 0.0 + 1.0) / 3.0) < 1e-6)
    assert(out.values.forall(_.getAs[Double]("mrr") == mrr))
  }

  test("brierDecomposition: the Murphy identity holds to the grid digit") {
    import spark.implicits._
    // bins 2 (p=0.25) and 7 (p=0.75): forecasts are bin centers, so
    // brier MUST equal reliability - resolution + uncertainty exactly
    val df = Seq((2, false), (2, false), (2, true),
      (7, true), (7, true), (7, false), (7, true)).toDF("bin", "y")
    val r = Quality.brierDecomposition(df, col("bin"), col("y"), 10)
      .collect().head
    assert(r.getAs[Long]("n") == 7)
    assert(math.abs(r.getAs[Double]("brier") -
      r.getAs[Double]("brier_identity")) <= 1e-6)
    // hand check: brier = mean (p_i - y_i)^2
    val brierHand = (
      2 * 0.25 * 0.25 + math.pow(0.25 - 1, 2) +
      3 * 0.25 * 0.25 + math.pow(0.75 - 0, 2)) / 7.0
    assert(math.abs(r.getAs[Double]("brier") - brierHand) < 1e-6)
    assert(math.abs(r.getAs[Double]("base_rate") - 4.0 / 7.0) < 1e-6)
  }

  test("sprtLooks: crossing latches the decision for every later look") {
    import spark.implicits._
    // symmetric +1/-1 per-trial terms, boundary 2.5: look 1 puts
    // llr=+3 (cross h1); look 2 is all failures, raw llr would fall
    // to -1 — the latched decision must stay accept_h1
    val trials = (1 to 3).map(i => ("d1", true)) ++
      (1 to 4).map(i => ("d2", false))
    val df = trials.toDF("look", "succ")
    val out = Stats.sprtLooks(df, col("look"), col("succ"),
        lnRatioPos = 1.0, lnRatioNeg = -1.0, boundary = 2.5)
      .collect().map(r => r.getAs[String]("look") -> r).toMap
    assert(out("d1").getAs[Double]("llr") == 3.0)
    assert(out("d1").getAs[String]("decision") == "accept_h1")
    assert(out("d2").getAs[Double]("llr") == -1.0)
    assert(out("d2").getAs[String]("decision") == "accept_h1") // latched
    // and a never-crossing run stays 'continue'
    val calm = Seq(("d1", true), ("d1", false), ("d2", false), ("d2", true))
      .toDF("look", "succ")
    val c = Stats.sprtLooks(calm, col("look"), col("succ"), 1.0, -1.0, 2.5)
      .collect()
    assert(c.forall(_.getAs[String]("decision") == "continue"))
  }

  test("q275 matched ATT: full matching and the weighted-mean identity") {
    val rows = SparkEntry.queries("q275_psm_att")(spark, sf("0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_treated"))
    }
    // att_overall is the n_matched-weighted mean of per-stratum atts
    val matched = rows.filter(_.getAs[Long]("n_matched") > 0)
    val num = matched.map(r =>
      r.getAs[Double]("att") * r.getAs[Long]("n_matched")).sum
    val den = matched.map(_.getAs[Long]("n_matched")).sum.toDouble
    val overall = rows.head.getAs[Double]("att_overall")
    assert(math.abs(overall - num / den) < 1e-6)
    assert(rows.forall(_.getAs[Double]("att_overall") == overall))
  }

  test("acfReport: lag 0 is 1 and an alternating series has acf(1) < 0") {
    import spark.implicits._
    // period spine built from row multiplicity: alternating 3,1,3,1...
    val rows = (1 to 12).flatMap { t =>
      val n = if (t % 2 == 1) 3 else 1
      (1 to n).map(_ => t)
    }
    val df = rows.toDF("p")
    val out = Stats.acfReport(df, col("p"), maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") -> r).toMap
    assert(out(0).getAs[Double]("acf") == 1.0)
    assert(out(0).getAs[Long]("n_pairs") == 12)
    assert(out(1).getAs[Long]("n_pairs") == 11)
    // perfectly alternating: strong negative at lag 1, positive at 2
    assert(out(1).getAs[Double]("acf") < -0.8)
    assert(out(2).getAs[Double]("acf") > 0.8)
  }
}
