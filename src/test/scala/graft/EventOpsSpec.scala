package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Funnel semantics not covered by the q108 oracle: per-user reach
  * depth, in-order enforcement, and the horizon cut. */
class EventOpsSpec extends SparkSuite {

  private def ev(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
  }

  test("funnelUsers: depth counts only in-order completions") {
    // u1 completes all 3 in order; u2 has click BEFORE view (depth 1);
    // u3 views only; u4 never views (absent from output)
    val e = ev(Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 01:00:00"),
      (3L, "view", "2024-01-01 00:00:00"),
      (4L, "purchase", "2024-01-01 00:00:00")))
    val out = EventOps.funnelUsers(e, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("funnelUsers: same-second step transition counts (>= not >)") {
    val e = ev(Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 00:00:00")))
    val out = EventOps.funnelUsers(e, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 2))
  }

  test("funnel: horizon cuts completions later than t1 + horizonSec") {
    val e = ev(Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 00:30:00"),   // inside 1h horizon
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 02:00:00")))  // outside
    val out = EventOps.funnel(e, "user_id", "event_type", "ts",
        Seq("view", "click"), horizonSec = 3600L)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(out == Map(1 -> 2L, 2 -> 1L))
    val noHorizon = EventOps.funnel(e, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(noHorizon == Map(1 -> 2L, 2 -> 2L))
  }

  test("asOfJoinNative matches a hand-built fixture incl. no-match and ties") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p1"), (1L, 5L, "p0"), (2L, 7L, "p2"), (3L, 9L, "p3"))
      .toDF("k", "t", "tag")
    // unique per-key time for determinism on the (2,7) tie: compose id
    val rr = Seq((1L, 4L, "v1", 0L), (1L, 10L, "v2", 1L), (1L, 12L, "v3", 2L),
      (2L, 7L, "v4", 3L), (2L, 7L, "v5", 4L))
      .toDF("k", "t", "vtag", "rid")
      .select(col("k").as("rk"), (col("t") * 100 + col("rid")).as("jt"),
        col("t").as("rt"), col("vtag"))
    val ll = l.select(col("k"), (col("t") * 100 + lit(99)).as("jt"),
      col("t"), col("tag"))
    val out = EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt")
      .select(col("k"), col("tag"), col("vtag"))
      .collect().map(x => x.getString(1) -> Option(x.getString(2))).toMap
    assert(out("p1") == Some("v2"), "t=10 matches the t=10 view (<= semantics)")
    assert(out("p0") == Some("v1"))
    assert(out("p2") == Some("v5"), "tie at t=7 resolves to the last by rid")
    assert(out("p3") == None, "key with no right rows matches nothing")
  }

  test("asOfJoinNative forward: first at-or-after, shared matches, no-match") {
    import spark.implicits._
    // p0@5 and p1@10 both precede v2@12 (shared forward match); p2@7
    // has a same-time view (>= semantics, ties to FIRST in sort order);
    // p3's key has only earlier views -> null
    val ll = Seq((1L, 5L, "p0"), (1L, 10L, "p1"), (2L, 7L, "p2"), (3L, 9L, "p3"))
      .toDF("k", "t", "tag")
      .select(col("k"), (col("t") * 100).as("jt"), col("t"), col("tag"))
    val rr = Seq((1L, 12L, "v2", 0L), (1L, 20L, "v3", 1L),
      (2L, 7L, "v4", 2L), (2L, 7L, "v5", 3L), (3L, 2L, "v6", 4L))
      .toDF("k", "t", "vtag", "rid")
      .select(col("k").as("rk"), (col("t") * 100 + col("rid")).as("jt"),
        col("t").as("rt"), col("vtag"))
    val out = EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt",
        direction = "forward")
      .select(col("tag"), col("vtag"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out("p0") == Some("v2"))
    assert(out("p1") == Some("v2"), "two left rows share the same forward match")
    assert(out("p2") == Some("v4"), "same-time tie resolves to the FIRST right row")
    assert(out("p3") == None, "no right row at or after -> null")
  }

  test("asOfJoinNative nearest: closer side wins, ties backward, one-sided falls back") {
    import spark.implicits._
    // p0@10: back v@8 (d=2) vs fwd v@13 (d=3) -> backward
    // p1@12: back v@8 (d=4) vs fwd v@13 (d=1) -> forward
    // p2@10: back v@8 (d=2) vs fwd v@12 (d=2) -> tie, backward wins
    // p3@5 (key 3): only forward exists -> forward; p4 (key 4): none
    val ll = Seq((1L, 10L, "p0"), (1L, 12L, "p1"), (2L, 10L, "p2"),
      (3L, 5L, "p3"), (4L, 5L, "p4"))
      .toDF("k", "jt", "tag")
    val rr = Seq((1L, 8L, "b1"), (1L, 13L, "f1"),
      (2L, 8L, "b2"), (2L, 12L, "f2"), (3L, 7L, "f3"))
      .toDF("rk", "jt", "vtag")
    val out = EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt",
        direction = "nearest")
      .select(col("tag"), col("vtag"))
      .collect().map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(out("p0") == Some("b1"), "strictly closer backward wins")
    assert(out("p1") == Some("f1"), "strictly closer forward wins")
    assert(out("p2") == Some("b2"), "equal distance resolves backward")
    assert(out("p3") == Some("f3"), "forward-only key still matches")
    assert(out("p4") == None)
  }

  test("asOfJoinNative nearest rejects a non-numeric time type") {
    import spark.implicits._
    val ll = Seq((1L, "a")).toDF("k", "jt")
    val rr = Seq((1L, "b")).toDF("rk", "jt")
    val err = intercept[IllegalArgumentException] {
      EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt",
        direction = "nearest")
    }
    assert(err.getMessage.contains("no distance"))
  }

  test("asOfJoinNative output survives a direct exchange above the exec") {
    import spark.implicits._
    // regression: the exec must emit UnsafeRow — an orderBy placed
    // immediately above (no projection between) casts rows to UnsafeRow
    val ll = Seq((1L, 10L, "p")).toDF("k", "jt", "tag")
    val rr = Seq((1L, 4L, "v")).toDF("rk", "jt", "vtag")
    val rows = EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt")
      .orderBy(col("k")).collect()
    assert(rows.length == 1 && rows.head.getString(5) == "v")
  }

  test("asOfJoinNative rejects mismatched key/time types at build") {
    import spark.implicits._
    val ll = Seq((1, 10L)).toDF("k", "jt")
    val rr = Seq((1L, 4L)).toDF("rk", "jt")
    val err = intercept[IllegalArgumentException] {
      EventOps.asOfJoinNative(ll, rr, "k", "rk", "jt", "jt")
    }
    assert(err.getMessage.contains("key types differ"))
  }

  test("asOfJoinBroadcast refuses a right side past maxRightRows") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p")).toDF("k", "lt", "tag")
    val r = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"))
      .toDF("k", "rt", "vtag")
    val err = intercept[IllegalArgumentException] {
      EventOps.asOfJoinBroadcast(l, r, "k", "lt", "rt",
        rCols = Seq("vtag"), maxRightRows = 2L)
    }
    assert(err.getMessage.contains("asOfJoinNative"),
      "refusal must route the caller to the big-big form")
  }

  test("asOfJoinBroadcast drops null right times (no spurious forward match)") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p")).toDF("k", "lt", "tag")
    val r = Seq((1L, Some(7L), "early"), (1L, None, "ghost"))
      .toDF("k", "rt", "vtag")
    val fwd = EventOps.asOfJoinBroadcast(l, r, "k", "lt", "rt",
        rCols = Seq("vtag"), direction = "forward").head()
    assert(fwd.isNullAt(3) && fwd.isNullAt(4),
      "a null-time right row must not masquerade as a forward match")
  }

  test("asOfJoinBroadcast directions: backward, forward, nearest with tie->backward") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p")).toDF("k", "lt", "tag")
    val r = Seq((1L, 7L, "early"), (1L, 12L, "late"), (1L, 30L, "far"))
      .toDF("k", "rt", "vtag")
    def run(dir: String) = EventOps.asOfJoinBroadcast(l, r, "k", "lt", "rt",
        rCols = Seq("vtag"), direction = dir)
      .head().getString(4)
    assert(run("backward") == "early")
    assert(run("forward") == "late")
    assert(run("nearest") == "late", "12 is nearer to 10 than 7")
    // equidistant: 7 and 13 around 10 -> backward wins
    val r2 = Seq((1L, 7L, "early"), (1L, 13L, "late")).toDF("k", "rt", "vtag")
    val near = EventOps.asOfJoinBroadcast(l, r2, "k", "lt", "rt",
        rCols = Seq("vtag"), direction = "nearest").head().getString(4)
    assert(near == "early", "equidistant tie must resolve backward")
  }

  test("motifTopK finds an affine-transformed planted pattern at corr 1.0") {
    import spark.implicits._
    val pattern = Seq(0.0, 1.0, 2.0, 3.0, 3.0, 2.0, 1.0, 0.0)
    // noise prefix, then the pattern scaled by 2 and shifted by 10
    // (z-normalized correlation is affine-invariant), then noise
    val series = Seq(5.0, -3.0, 8.0, 1.0) ++ pattern.map(10.0 + 2.0 * _) ++
      Seq(7.0, 0.5, -2.0, 4.0)
    val rows = series.zipWithIndex.map { case (v, i) => (1L, i.toLong, i.toLong, v) }
    val df = rows.toDF("user_id", "t", "event_id", "value")
    val out = EventOps.motifTopK(df, "user_id", "t", "event_id", "value",
        pattern, k = 1)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 4L, s"motif must start at offset 4, got ${r.getLong(1)}")
    assert(r.getDouble(2) == 1.0, s"planted motif must score corr 1.0, got ${r.getDouble(2)}")
  }

  test("seasonalDecompose: linear series -> trend is the series, seasonal and resid 0") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // y_t = 3t + 7: the centered 5-point mean of a linear series IS the
    // center value, so detrended == 0 everywhere -> seasonal == 0,
    // resid == 0, trend == y. Exact on the 1e-6 grid.
    val n = 20
    val series = (0 until n).map(t => (t.toLong, BigDecimal(3 * t + 7)))
      .toDF("bucket", "yraw")
      .select(col("bucket"), col("yraw").cast(DecimalType(27, 6)).as("y6"),
        (col("bucket") % 4).as("pk"))
    val out = EventOps.seasonalDecompose(series, "bucket", "y6", "pk",
      halfWindow = 2).orderBy("bucket").collect()
    assert(out.length == n - 4, s"edge buckets must drop: ${out.length}")
    out.foreach { r =>
      val t = r.getAs[Long]("bucket")
      assert(r.getAs[Double]("y") == (3 * t + 7).toDouble)
      assert(r.getAs[Double]("trend") == (3 * t + 7).toDouble,
        s"trend at $t: ${r.getAs[Double]("trend")}")
      assert(r.getAs[Double]("seasonal") == 0.0)
      assert(r.getAs[Double]("resid") == 0.0)
    }
    // first surviving bucket is halfWindow
    assert(out.head.getAs[Long]("bucket") == 2L)
  }

  test("seasonalDecompose recovers a planted periodic component") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // y_t = 100 + s_{t%5} with period == window size 5: every centered
    // 5-point window sums the FULL period, so trend == 100 + mean(s)
    // exactly and seasonal_{k} == s_k - mean(s); resid == 0.
    val s = Array[Double](10, -5, 0, 20, -25) // sums to 0
    val n = 30
    val series = (0 until n).map(t => (t.toLong, BigDecimal(100 + s(t % 5))))
      .toDF("bucket", "yraw")
      .select(col("bucket"), col("yraw").cast(DecimalType(27, 6)).as("y6"),
        (col("bucket") % 5).as("pk"))
    val out = EventOps.seasonalDecompose(series, "bucket", "y6", "pk",
      halfWindow = 2).orderBy("bucket").collect()
    out.foreach { r =>
      val t = r.getAs[Long]("bucket")
      assert(r.getAs[Double]("trend") == 100.0, s"trend at $t")
      assert(r.getAs[Double]("seasonal") == s((t % 5).toInt),
        s"seasonal at $t: ${r.getAs[Double]("seasonal")}")
      assert(r.getAs[Double]("resid") == 0.0, s"resid at $t")
    }
  }

  test("seasonalDecompose rejects a window size that breaks the 1e-9 grid") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val series = Seq((1L, BigDecimal(1))).toDF("bucket", "yraw")
      .select(col("bucket"), col("yraw").cast(DecimalType(27, 6)).as("y6"),
        lit(0L).as("pk"))
    intercept[IllegalArgumentException] {
      EventOps.seasonalDecompose(series, "bucket", "y6", "pk", halfWindow = 1)
    }
  }

  test("logRank: O and E totals balance; identical curves score ~0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor}
    // two groups with IDENTICAL event patterns (u mod 2 pairs users
    // with the same timeline) -> chi2 must be exactly 0
    val rows = (0L until 40L).flatMap { u =>
      val base = 1000000L + (u / 2) * 1000
      Seq((u, "view", base),
        (u, "purchase", base + 86400L * (1 + (u / 2) % 5)))
    }
    val df = rows.toDF("user_id", "event_type", "ep")
    val out = EventOps.logRank(df, "user_id", "ep",
      col("event_type") === "view", col("event_type") === "purchase",
      col("user_id") % 2).collect().head
    assert(out.getAs[Long]("n_users_a") == 20)
    assert(out.getAs[Long]("n_users_b") == 20)
    // O_a + O_b = total deaths; E_a + E_b = the same total
    val oa = out.getAs[Long]("obs_a"); val ob = out.getAs[Long]("obs_b")
    val ea = out.getAs[Double]("exp_a"); val eb = out.getAs[Double]("exp_b")
    assert(math.abs((oa + ob).toDouble - (ea + eb)) < 1e-6)
    assert(out.getAs[Double]("chi2") == 0.0)
    assert(!out.getAs[Boolean]("significant"))
    // now delay every group-1 conversion far beyond group 0's: the
    // separation must produce a large, significant statistic
    val sep = (0L until 40L).flatMap { u =>
      val late = if (u % 2 == 1) 86400L * 40 else 86400L
      Seq((u, "view", 1000000L), (u, "purchase", 1000000L + late))
    }.toDF("user_id", "event_type", "ep")
    val out2 = EventOps.logRank(sep, "user_id", "ep",
      col("event_type") === "view", col("event_type") === "purchase",
      col("user_id") % 2).collect().head
    assert(out2.getAs[Double]("chi2") > 3.841459)
    assert(out2.getAs[Boolean]("significant"))
  }

  test("markovAbsorption converges to the closed-form absorption probabilities") {
    import spark.implicits._
    // s1 -> {purchase .5, s2 .5}; s2 -> {error .5, s1 .5}
    // closed form: a(s1) = 1/2 + 1/2*a(s2), a(s2) = 1/2*a(s1)
    //           -> a(s1) = 2/3, a(s2) = 1/3
    val rows = Seq(
      (1L, "s1", 1L, 1), (1L, "purchase", 2L, 2),
      (2L, "s1", 1L, 3), (2L, "s2", 2L, 4),
      (3L, "s2", 1L, 5), (3L, "error", 2L, 6),
      (4L, "s2", 1L, 7), (4L, "s1", 2L, 8))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventOps.markovAbsorption(rows, "user_id", "event_type",
      "ts", "event_id", convert = "purchase", abandon = "error",
      iters = 24)
      .collect().map(r => r.getAs[String]("state") ->
        r.getAs[Double]("p_convert")).toMap
    assert(math.abs(out("s1") - 2.0 / 3) < 1e-6, out("s1"))
    assert(math.abs(out("s2") - 1.0 / 3) < 1e-6, out("s2"))
  }

  test("nextEventEval: argmax model scores held-out pairs, ties break low") {
    import spark.implicits._
    // train users 1,2 (odd of %5... use explicit flag): a->b twice,
    // a->c once => model predicts a->b; test user: a->b, a->c
    val rows = Seq(
      (1L, "a", 1L, 1), (1L, "b", 2L, 2),
      (2L, "a", 1L, 3), (2L, "b", 2L, 4),
      (3L, "a", 1L, 5), (3L, "c", 2L, 6),
      (10L, "a", 1L, 7), (10L, "b", 2L, 8), (10L, "a", 3L, 9),
      (10L, "c", 4L, 10))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventOps.nextEventEval(rows, "user_id", "event_type",
      "ts", "event_id", isTrain = col("user_id") < 10)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(out("a").getAs[String]("predicted") == "b")
    assert(out("a").getAs[Long]("n_pairs") == 2)
    assert(out("a").getAs[Long]("n_correct") == 1)
    assert(out("a").getAs[Double]("accuracy") == 0.5)
    // test-side b->a pair: "b" was seen in train only as a sink; the
    // train grid has no b-> rows, so predicted is null, accuracy 0
    assert(out("b").getAs[String]("predicted") == null)
    assert(out("b").getAs[Long]("n_correct") == 0)
  }

  test("markovTimeToAbsorb solves the symmetric two-state chain exactly") {
    import spark.implicits._
    // same chain as the absorption test: n(s1) = 1 + .5 n(s2),
    // n(s2) = 1 + .5 n(s1) -> n = 2 for both
    val rows = Seq(
      (1L, "s1", 1L, 1), (1L, "purchase", 2L, 2),
      (2L, "s1", 1L, 3), (2L, "s2", 2L, 4),
      (3L, "s2", 1L, 5), (3L, "error", 2L, 6),
      (4L, "s2", 1L, 7), (4L, "s1", 2L, 8))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = EventOps.markovTimeToAbsorb(rows, "user_id", "event_type",
      "ts", "event_id", absorbing = Seq("purchase", "error"), iters = 48)
      .collect().map(r => r.getAs[String]("state") ->
        r.getAs[Double]("exp_steps")).toMap
    assert(math.abs(out("s1") - 2.0) < 1e-6, out("s1"))
    assert(math.abs(out("s2") - 2.0) < 1e-6, out("s2"))
  }

  test("burstiness: periodic gaps score -1, bursty gaps positive-shifted") {
    import spark.implicits._
    // type "tick": gaps 10,10,10 (periodic); "storm": gaps 1,1,1,97
    val rows =
      Seq(0L, 10L, 20L, 30L).zipWithIndex.map { case (t, i) =>
        (1L, "tick", t, i) } ++
      Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex.map { case (t, i) =>
        (1L, "storm", t, 100 + i) }
    val out = EventOps.burstiness(rows.toDF("user_id", "event_type", "ep", "event_id"),
      "user_id", "event_type", "ep", "event_id")
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("tick").getAs[Double]("burstiness") == -1.0)
    assert(out("tick").getAs[Double]("cv") == 0.0)
    val g = Seq(1.0, 1.0, 1.0, 97.0)
    val m = g.sum / g.size
    val s = math.sqrt(g.map(x => (x - m) * (x - m)).sum / (g.size - 1))
    assert(math.abs(out("storm").getAs[Double]("burstiness") -
      (s - m) / (s + m)) < 1e-6)
    assert(out("storm").getAs[Long]("n_gaps") == 4)
  }

  test("markovStationary: mass conserved and matches driver power iteration") {
    import org.apache.spark.sql.functions.col
    val e = Tables.events(spark, sf("0.001"))
    val out = EventOps.markovStationary(e, "user_id", "event_type",
      "ts", "event_id", iters = 16).collect()
    val mass = out.map(_.getAs[Double]("pi")).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
    // reference: collect the transition matrix and run the same 16
    // matvecs in driver scala (double arithmetic, no grid) — the
    // gridded engine run must agree to ~1e-9
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tr = e.withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        r.getAs[Long]("n")).toMap
    val states = tr.keys.map(_._1).toSeq.distinct.sorted
    val rowTot = states.map(s0 =>
      s0 -> states.map(d0 => tr.getOrElse((s0, d0), 0L)).sum.toDouble).toMap
    var pi = states.map(_ -> 1.0 / states.size).toMap
    (1 to 16).foreach { _ =>
      pi = states.map { d0 =>
        d0 -> states.map(s0 =>
          pi(s0) * tr.getOrElse((s0, d0), 0L) / rowTot(s0)).sum
      }.toMap
    }
    out.foreach { r =>
      val s0 = r.getAs[String]("state")
      assert(math.abs(r.getAs[Double]("pi") - pi(s0)) < 1e-6,
        s"$s0: engine ${r.getAs[Double]("pi")} vs driver ${pi(s0)}")
    }
  }
}
