package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EventOps, Graph, Similarity}

/** Pins every driver-local fast path to its distributed twin: the SAME
  * input runs through BOTH paths (forced via the cutoff parameter) and
  * the results must be EXACTLY equal — bit-identical doubles, not
  * approximately close. These are the guards the scale design leans on
  * (collect-below-cutoff / distribute-above): if either path's
  * arithmetic drifts, the oracle hashes stay green at the scale the
  * driver tests but silently diverge past the boundary. */
class ParityBoundarySpec extends SparkSuite {

  /** Exact row-set equality, order-free (sorted canonical form). */
  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.schema.map(f => (f.name, f.dataType)) ===
      b.schema.map(f => (f.name, f.dataType)), s"$what: schema")
    val ka = a.collect().map(_.toString).sorted
    val kb = b.collect().map(_.toString).sorted
    assert(ka.length === kb.length, s"$what: row count")
    ka.zip(kb).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra === rb, s"$what: row $i differs")
    }
  }

  private def doubleVecs: DataFrame =
    spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))

  test("hits: driver fast path == distributed path, bit-identical") {
    val edges = Tables.orders(spark, sf("0.001"))
      .join(Tables.lineitem(spark, sf("0.001")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("buyer"), col("l_suppkey").as("sup"))
    val driver = Graph.hits(edges, "buyer", "sup", iters = 3)
    val dist = Graph.hits(edges, "buyer", "sup", iters = 3,
      driverEdgeLimit = 0L)
    assertSameRows(driver, dist, "hits")
  }

  test("connectedComponents: driver union-find == distributed labels") {
    import spark.implicits._
    // mixed shapes: two cliques, a star, and a 12-hop chain bridging
    // into clique A — multi-pass convergence on the distributed side
    val clique = (0 until 8).flatMap(i => (i + 1 until 8).map(j => (i, j)))
    val cliqueB = clique.map { case (a, b) => (a + 100, b + 100) }
    val star = (1 to 20).map(i => (200, 200 + i))
    val chain = (0 until 12).map(i => (300 + i, 301 + i))
    val bridge = Seq((312, 7))
    val edges = (clique ++ cliqueB ++ star ++ chain ++ bridge)
      .toDF("a", "b")
    val driver = Dedup.connectedComponents(edges, "a", "b", maxIter = 50)
    val dist = Dedup.connectedComponents(edges, "a", "b", maxIter = 50,
      smallGraphEdges = 0L)
    assertSameRows(driver, dist, "connectedComponents")
  }

  test("kMeans: driver Lloyd loop == distributed loop, bit-identical model") {
    val e = doubleVecs
    val driver = Similarity.kMeans(e, "vec_id", "emb", k = 8, iters = 4)
    val dist = Similarity.kMeans(e, "vec_id", "emb", k = 8, iters = 4,
      driverRowLimit = 0L)
    assertSameRows(driver, dist, "kMeans")
  }

  test("markovStationary: driver grid loop == distributed loop") {
    val ev = Tables.events(spark, sf("0.001"))
    val driver = EventOps.markovStationary(
      ev, "user_id", "event_type", "ts", "event_id", iters = 16)
    val dist = EventOps.markovStationary(
      ev, "user_id", "event_type", "ts", "event_id", iters = 16,
      driverCellLimit = 0L)
    assertSameRows(driver, dist, "markovStationary")
  }

  test("markovAbsorption: driver grid loop == distributed loop") {
    val ev = Tables.events(spark, sf("0.001"))
    val driver = EventOps.markovAbsorption(
      ev, "user_id", "event_type", "ts", "event_id",
      convert = "purchase", abandon = "error", iters = 24)
    val dist = EventOps.markovAbsorption(
      ev, "user_id", "event_type", "ts", "event_id",
      convert = "purchase", abandon = "error", iters = 24,
      driverCellLimit = 0L)
    assertSameRows(driver, dist, "markovAbsorption")
  }

  test("markovTimeToAbsorb: driver grid loop == distributed loop") {
    val ev = Tables.events(spark, sf("0.001"))
    val driver = EventOps.markovTimeToAbsorb(
      ev, "user_id", "event_type", "ts", "event_id",
      absorbing = Seq("purchase", "error"), iters = 24)
    val dist = EventOps.markovTimeToAbsorb(
      ev, "user_id", "event_type", "ts", "event_id",
      absorbing = Seq("purchase", "error"), iters = 24,
      driverCellLimit = 0L)
    assertSameRows(driver, dist, "markovTimeToAbsorb")
  }
}
