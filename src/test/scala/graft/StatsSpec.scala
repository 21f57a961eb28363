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

  test("rake2: the last-scaled margin hits its target exactly") {
    import spark.implicits._
    // skewed 2x3 grid
    val df = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(5)(("a", "z")) ++ Seq.fill(5)(("b", "x")) ++
      Seq.fill(20)(("b", "y")) ++ Seq.fill(30)(("b", "z"))
    val out = Stats.rake2(df.toDF("r", "c"), col("r"), col("c"), iters = 3)
      .collect()
    val tot = 100.0
    // column margins were scaled LAST -> each must equal tot/3 to fp
    val colSums = out.groupBy(_.getAs[String]("col_key"))
      .map { case (_, rows) => rows.map(_.getAs[Double]("fitted")).sum }
    colSums.foreach(s => assert(math.abs(s - tot / 3) < 1e-3, s))
    // row margins converge toward tot/2 (IPF geometric rate)
    val rowSums = out.groupBy(_.getAs[String]("row_key"))
      .map { case (_, rows) => rows.map(_.getAs[Double]("fitted")).sum }
    rowSums.foreach(s => assert(math.abs(s - tot / 2) < 2.0, s))
    assert(out.forall(_.getAs[Double]("weight") > 0))
  }

  test("q278 Shapley matches the permutation-enumeration definition") {
    import org.apache.spark.sql.functions.{col => f}
    // rebuild the coalition value table exactly as the query does
    val ev = Tables.events(spark, sf("0.001"))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val mask = types.zipWithIndex.map { case (t, i) =>
      when(sum(when(f("event_type") === t, 1L).otherwise(0L)) > 13,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val conv = when(sum(when(f("event_type") === "purchase",
      round(f("value") * lit(1e9)).cast("long")).otherwise(0L))
      > lit(650000000000L), 1L).otherwise(0L)
    val coal = ev.groupBy(f("user_id")).agg(mask.as("m"), conv.as("conv"))
      .groupBy(f("m")).agg(count(lit(1)).as("nu"), sum(f("conv")).as("nc"))
      .collect()
      .map(r => r.getAs[Long]("m") ->
        (r.getAs[Long]("nc").toDouble / r.getAs[Long]("nu"))).toMap
    def v(m: Long): Double = coal.getOrElse(m, 0.0)
    // phi_i = average over all 120 channel orderings of the marginal
    // v(prefix + i) - v(prefix) — the definition the weighted-coalition
    // sum in the query is algebra for
    val perms = (0 until 5).permutations.toSeq
    val phiRef = (0 until 5).map { i =>
      i -> perms.map { p =>
        val before = p.takeWhile(_ != i)
        val pre = before.foldLeft(0L)((acc, ch) => acc | (1L << ch))
        v(pre | (1L << i)) - v(pre)
      }.sum / perms.size
    }.toMap
    val got = SparkEntry.queries("q278_shapley_attribution")(spark, sf("0.001"))
      .collect().map(r => r.getAs[String]("channel") -> r.getAs[Double]("phi"))
      .toMap
    types.zipWithIndex.foreach { case (t, i) =>
      assert(math.abs(got(t) - phiRef(i)) < 1e-5,
        s"$t: query ${got(t)} vs enumeration ${phiRef(i)}")
    }
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

  test("bradleyTerry matches the driver-side MM reference and orders by skill") {
    import spark.implicits._
    // a > b > c by win counts, d never wins (pinned to p = 0)
    val wins = Seq(
      ("a", "b", 8L), ("b", "a", 2L),
      ("a", "c", 9L), ("c", "a", 1L),
      ("b", "c", 7L), ("c", "b", 3L),
      ("a", "d", 5L), ("b", "d", 5L), ("c", "d", 5L))
      .toDF("i", "j", "n")
    val out = Stats.bradleyTerry(wins, "i", "j", "n", iters = 8)
      .collect().map(r => r.getAs[String]("item") ->
        (r.getAs[Double]("strength"), r.getAs[Int]("rank"))).toMap
    assert(out("a")._2 == 1 && out("b")._2 == 2 && out("c")._2 == 3)
    assert(out("d")._1 == 0.0 && out("d")._2 == 4)
    // driver-side reference: the same MM update in plain doubles
    val items = Seq("a", "b", "c", "d")
    val w = Map(("a","b")->8.0, ("b","a")->2.0, ("a","c")->9.0,
      ("c","a")->1.0, ("b","c")->7.0, ("c","b")->3.0, ("a","d")->5.0,
      ("b","d")->5.0, ("c","d")->5.0).withDefaultValue(0.0)
    def m(i: String, j: String) = w((i, j)) + w((j, i))
    val wTot = items.map(i => i -> items.map(j => w((i, j))).sum).toMap
    var p = items.map(_ -> 0.25).toMap
    (1 to 8).foreach { _ =>
      val raw = items.map { i =>
        i -> (if (wTot(i) > 0)
          wTot(i) / items.filter(j => j != i && m(i, j) > 0)
            .map(j => m(i, j) / (p(i) + p(j))).sum
        else 0.0)
      }.toMap
      val t = raw.values.sum
      p = raw.map { case (k, v) => k -> v / t }
    }
    items.foreach { i =>
      assert(math.abs(out(i)._1 - p(i)) < 1e-5,
        s"$i: engine ${out(i)._1} vs reference ${p(i)}")
    }
  }

  test("rddEstimate recovers a planted discontinuity") {
    import spark.implicits._
    // y = 10 + 2x below the cutoff, y = 50 + 5x above -> jump = 40
    val rows = (-100 to 100).filter(_ != 0).map { i =>
      val x = i * 10.0
      val y = if (x >= 0) 50.0 + 5.0 * x else 10.0 + 2.0 * x
      (x, y)
    }
    val out = Stats.rddEstimate(rows.toDF("x", "y"), col("x"), col("y"),
      cutoff = 0.0, bandwidth = 500.0).collect().head
    assert(out.getAs[Long]("n_left") == 49)   // -490..-10
    assert(out.getAs[Long]("n_right") == 49)  // 10..490 (i = 0 excluded)
    assert(math.abs(out.getAs[Double]("slope_left") - 2.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("slope_right") - 5.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("y0_left") - 10.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("y0_right") - 50.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("rd_effect") - 40.0) < 1e-9)
  }

  test("friedmanTest equals the classic statistic on a tie-free panel") {
    import spark.implicits._
    // 4 blocks x 3 treatments, A < B < C in every block ->
    // R = (4, 8, 12), classic chi2_F = 12/(nk(k+1))*sum(R^2) - 3n(k+1) = 8
    val rows = for {
      b <- 1 to 4
      (t, v) <- Seq(("A", 1.0), ("B", 2.0), ("C", 3.0))
    } yield (b.toLong, t, v + b)  // block shift cancels under ranking
    val out = Stats.friedmanTest(rows.toDF("blk", "trt", "v"),
      col("blk"), col("trt"), col("v")).collect().head
    assert(out.getAs[Long]("n_blocks") == 4)
    assert(out.getAs[Long]("k") == 3)
    assert(out.getAs[Double]("chi2_f") == 8.0)
    // incomplete blocks are dropped: adding a 2-treatment block
    // changes nothing
    val extra = rows ++ Seq((9L, "A", 1.0), (9L, "B", 2.0))
    val out2 = Stats.friedmanTest(extra.toDF("blk", "trt", "v"),
      col("blk"), col("trt"), col("v")).collect().head
    assert(out2.getAs[Long]("n_blocks") == 4)
    assert(out2.getAs[Double]("chi2_f") == 8.0)
  }

  test("cochranQ matches the hand-computed statistic") {
    import spark.implicits._
    // success matrix: C = (4,2,1), R = (2,1,3,1), N = 7 -> Q = 14/3
    val x = Map(
      (1, "A") -> 1, (1, "B") -> 1, (1, "C") -> 0,
      (2, "A") -> 1, (2, "B") -> 0, (2, "C") -> 0,
      (3, "A") -> 1, (3, "B") -> 1, (3, "C") -> 1,
      (4, "A") -> 1, (4, "B") -> 0, (4, "C") -> 0)
    val rows = x.toSeq.map { case ((b, t), v) => (b.toLong, t, v.toDouble) }
    val out = Stats.cochranQ(rows.toDF("blk", "trt", "v"),
      col("blk"), col("trt"), col("v") > 0.5).collect().head
    assert(out.getAs[Long]("n_blocks") == 4)
    assert(out.getAs[Long]("k") == 3)
    assert(math.abs(out.getAs[Double]("q_stat") - 14.0 / 3) < 1e-6)
  }

  test("kishReport: uniform weights cost nothing, concentrated weights halve n_eff") {
    import spark.implicits._
    val uniform = Seq((1.0, 10L), (1.0, 10L)).toDF("w", "m")
    val u = Stats.kishReport(uniform, col("w"), col("m")).collect().head
    assert(u.getAs[Long]("n_rows") == 20)
    assert(u.getAs[Double]("n_eff") == 20.0)
    assert(u.getAs[Double]("deff") == 1.0)
    // all mass on half the rows: n_eff = (sum w)^2 / sum w^2 = 10
    val conc = Seq((2.0, 10L), (0.0, 10L)).toDF("w", "m")
    val c = Stats.kishReport(conc, col("w"), col("m")).collect().head
    assert(c.getAs[Double]("n_eff") == 10.0)
    assert(c.getAs[Double]("deff") == 2.0)
  }

  test("chiSquareEffects: perfect 2x2 association scores V = phi = 1") {
    import spark.implicits._
    val rows = Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y"))
    val out = Stats.chiSquareEffects(rows.toDF("u", "v"),
      col("u"), col("v")).collect().head
    assert(out.getAs[Double]("chi2") == 100.0)
    assert(out.getAs[Double]("phi") == 1.0)
    assert(out.getAs[Double]("cramers_v") == 1.0)
    assert(math.abs(out.getAs[Double]("contingency_c") -
      math.sqrt(0.5)) < 1e-6)
  }

  test("walkForwardSplits: embargo days land in NO split, windows expand") {
    import spark.implicits._
    // one event per (user, day) for days 0..19, 2 users
    val rows = for (u <- 1L to 2L; day <- 0L until 20L)
      yield (u, day * 86400L + 10L)
    val out = Stats.walkForwardSplits(rows.toDF("u", "ep"),
      col("u"), col("ep"), epoch0 = 0L,
      trainDays0 = 5, stepDays = 5, embargoDays = 2, testDays = 3,
      folds = 2).collect()
      .map(r => (r.getAs[Int]("fold"), r.getAs[String]("split")) -> r).toMap
    // fold 0: train [0,5) = 5 days, embargo [5,7), test [7,10)
    assert(out((0, "train")).getAs[Long]("n_events") == 10)
    assert(out((0, "test")).getAs[Long]("day_start") == 7)
    assert(out((0, "test")).getAs[Long]("n_events") == 6)
    // fold 1: train [0,10), test [12,15)
    assert(out((1, "train")).getAs[Long]("n_events") == 20)
    assert(out((1, "test")).getAs[Long]("day_start") == 12)
    assert(out((1, "test")).getAs[Long]("n_events") == 6)
    out.values.foreach(r => assert(r.getAs[Long]("n_users") == 2))
    // embargo day 5 is in neither fold-0 window
    assert(out((0, "train")).getAs[Long]("day_end") == 5)
  }

  test("hhiReport: uniform mix scores 1/k, near-monopoly scores ~1") {
    import spark.implicits._
    val uniform = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("g", "w")
    val u = Quality.hhiReport(uniform, col("g"), col("w")).collect().head
    assert(u.getAs[Long]("n_groups") == 4)
    assert(u.getAs[Double]("hhi") == 0.25)
    assert(u.getAs[Double]("hhi_norm") == 0.0)
    assert(u.getAs[Double]("n_effective") == 4.0)
    val mono = Seq(("a", 99L), ("b", 1L)).toDF("g", "w")
    val m = Quality.hhiReport(mono, col("g"), col("w")).collect().head
    assert(m.getAs[Double]("hhi") == 0.9802)
    assert(math.abs(m.getAs[Double]("hhi_norm") - 0.9604) < 1e-9)
    assert(math.abs(m.getAs[Double]("n_effective") - 1.0 / 0.9802) < 1e-4)
  }

  test("cohensD recovers the textbook effect size on planted groups") {
    import spark.implicits._
    // A: 25x8 + 25x12 (m=10, var=200/49); B: 25x4 + 25x8 (m=6, same
    // var) -> pooled sd = sqrt(200/49); d = 4 / sp
    val rows = (Seq.fill(25)(8.0) ++ Seq.fill(25)(12.0)).map(v => (v, true)) ++
      (Seq.fill(25)(4.0) ++ Seq.fill(25)(8.0)).map(v => (v, false))
    val out = Stats.cohensD(rows.toDF("v", "a"), col("v"), col("a"))
      .collect().head
    val sp = math.sqrt(200.0 / 49)
    assert(out.getAs[Long]("n_a") == 50 && out.getAs[Long]("n_b") == 50)
    assert(out.getAs[Double]("mean_a") == 10.0)
    assert(out.getAs[Double]("mean_b") == 6.0)
    assert(math.abs(out.getAs[Double]("sd_pooled") - sp) < 1e-6)
    assert(math.abs(out.getAs[Double]("cohens_d") - 4.0 / sp) < 1e-6)
    val g = 4.0 / sp * (1.0 - 3.0 / (4.0 * 100 - 9.0))
    assert(math.abs(out.getAs[Double]("hedges_g") - g) < 1e-6)
  }

  test("oddsRatioReport matches the hand 2x2 and nulls on empty cells") {
    import spark.implicits._
    // a=30, b=20, c=10, d=40 -> OR = 30*40/(20*10) = 6
    val rows = Seq.fill(30)((true, true)) ++ Seq.fill(20)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(40)((false, false))
    val out = Stats.oddsRatioReport(rows.toDF("e", "y"),
      col("e"), col("y")).collect().head
    assert(out.getAs[Double]("odds_ratio") == 6.0)
    val se = math.sqrt(1.0 / 30 + 1.0 / 20 + 1.0 / 10 + 1.0 / 40)
    assert(math.abs(out.getAs[Double]("se") - se) < 1e-6)
    assert(math.abs(out.getAs[Double]("ci_lo") -
      math.exp(math.log(6.0) - 1.96 * se)) < 1e-5)
    // an empty cell -> null estimates, counts still reported
    val deg = (Seq.fill(10)((true, true)) ++ Seq.fill(10)((false, false)))
      .toDF("e", "y")
    val d2 = Stats.oddsRatioReport(deg, col("e"), col("y")).collect().head
    assert(d2.getAs[Long]("n_10") == 0)
    assert(d2.isNullAt(d2.fieldIndex("odds_ratio")))
  }

  test("gumbelTail matches the closed-form moment fit") {
    import spark.implicits._
    // 50x8 + 50x12: m = 10, var = 400/99
    val df = (Seq.fill(50)(8.0) ++ Seq.fill(50)(12.0)).toDF("v")
    val out = Stats.gumbelTail(df, col("v"), threshold = 15.0)
      .collect().head
    val m = 10.0
    val s = math.sqrt(400.0 / 99)
    val beta = s * math.sqrt(6.0) / math.Pi
    val mu = m - 0.5772156649015329 * beta
    val p = 1.0 - math.exp(-math.exp(-(15.0 - mu) / beta))
    assert(out.getAs[Long]("n") == 100)
    assert(math.abs(out.getAs[Double]("mean") - m) < 1e-9)
    assert(math.abs(out.getAs[Double]("sd") - s) < 1e-6)
    assert(math.abs(out.getAs[Double]("mu") - mu) < 1e-6)
    assert(math.abs(out.getAs[Double]("beta") - beta) < 1e-6)
    assert(math.abs(out.getAs[Double]("p_exceed") - p) < 1e-6)
  }

  test("ebShrinkRates pulls small groups toward the prior, big groups barely") {
    import spark.implicits._
    // A: 1000 trials at 50%; B: 10 trials at 90% (noisy)
    val rows = (1 to 1000).map(i => ("A", i % 2 == 0)) ++
      (1 to 10).map(i => ("B", i != 1))
    val out = Stats.ebShrinkRates(rows.toDF("g", "ok"),
      col("g"), col("ok")).collect()
      .map(r => r.getAs[String]("group_key") -> r).toMap
    val m = out("A").getAs[Double]("prior_m")
    val rawA = out("A").getAs[Double]("raw_rate")
    val rawB = out("B").getAs[Double]("raw_rate")
    val shrA = out("A").getAs[Double]("shrunk_rate")
    val shrB = out("B").getAs[Double]("shrunk_rate")
    assert(rawA == 0.5 && rawB == 0.9)
    // both shrink toward m, B much further (10 vs 1000 trials)
    assert(math.abs(shrA - rawA) < math.abs(shrB - rawB))
    assert((shrB - m) * (rawB - m) >= 0 &&
      math.abs(shrB - m) <= math.abs(rawB - m))
    assert(out("A").getAs[Double]("prior_strength") ==
      out("B").getAs[Double]("prior_strength"))
    assert(out("B").getAs[Double]("prior_strength") > 0)
  }

  test("ivWald: beta = ITT / first-stage on a planted complier design") {
    import spark.implicits._
    // z=1 doubles treatment take-up; treated outcome +10. 200 users:
    // z=0 -> 25% treated, z=1 -> 75% treated; y = 5 + 10x exactly
    val rows = (0 until 200).map { i =>
      val z = i % 2
      // odd i: i%8 in {1,3,5,7} -> treated unless i%8==1 (75%);
      // even i: treated when i%8==0 (25%)
      val x = if (z == 1) (if (i % 8 != 1) 1 else 0)
              else (if (i % 8 == 0) 1 else 0)
      (z, x, 5.0 + 10.0 * x)
    }
    val out = Stats.ivWald(rows.toDF("z", "x", "y"),
      col("z"), col("x"), col("y")).collect().head
    val fs = out.getAs[Double]("first_stage")
    val itt = out.getAs[Double]("itt")
    val beta = out.getAs[Double]("beta_iv")
    assert(out.getAs[Long]("n_z0") == 100 && out.getAs[Long]("n_z1") == 100)
    assert(fs == 0.5)
    assert(math.abs(itt - 5.0) < 1e-9)
    assert(math.abs(beta - 10.0) < 1e-9)
  }
}
