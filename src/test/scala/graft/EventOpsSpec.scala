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
}
