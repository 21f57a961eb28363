package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge relations — the centrality
  * companion of [[Dedup.connectedComponents]]: where CC answers "which
  * docs are copies of each other", PageRank answers "which nodes sit at
  * the center of the copy/link structure" (canonical selection, source
  * authority, crawl prioritization).
  */
object Graph {

  /** Damped PageRank with proper dangling-mass redistribution, run for
    * a FIXED `iters` power iterations (the deterministic form — a
    * convergence test would make the result depend on float noise).
    *
    * Per iteration: one edge⋈rank equi-join + a destination-keyed
    * aggregation — contribution rows are (dst, 8-byte term) with
    * map-side combine, and the (edge, outdegree) relation materializes
    * ONCE before the loop, so each pass shuffles the rank vector (one
    * row per node), never the corpus that built the edges. Dangling
    * mass (nodes with no out-edges) is a single decimal aggregate
    * cross-joined back — no collect, no driver loop over data.
    *
    * Hash parity across engines: every sum (contributions, dangling
    * mass) accumulates 14-decimal-rounded terms as DECIMAL(28,14) —
    * exact and summation-order-independent — and each iteration's rank
    * re-rounds to 12 decimals, so engines walk identical rank vectors
    * through every iteration; the arithmetic is div/mul/add only (no
    * libm), hence bit-identical under IEEE-754.
    *
    * Output: (`id`, pr) — rank rounded to `roundTo`, summing to ~1. */
  def pageRank(nodes: DataFrame, id: String, edges: DataFrame,
      src: String, dst: String, iters: Int, damping: Double = 0.85,
      roundTo: Int = 9): DataFrame = {
    require(iters >= 1, "pageRank: at least one iteration")
    val n = nodes.count()
    require(n > 0, "pageRank: empty node set")
    val nD = n.toDouble
    val outdeg = edges.groupBy(col(src).as("v")).agg(count(lit(1)).as("outd"))
      .localCheckpoint() // one row per distinct source; read every pass
    // the loop-invariant join: (src, dst, outd), reused every pass
    val ed = edges.select(col(src).as("es"), col(dst).as("ed"))
      .join(outdeg, col("es") === col("v"))
      .select(col("es"), col("ed"), col("outd"))
      .localCheckpoint()
    val hasOut = outdeg.select(col("v"))
    var ranks = nodes.select(col(id).as("v"),
      round(lit(1.0 / nD), 12).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(ranks, col("es") === col("v"))
        .groupBy(col("ed").as("cv"))
        .agg(sum(round(col("r") / col("outd"), 14).cast(DecimalType(28, 14)))
          .cast("double").as("c"))
      val dangling = ranks.join(hasOut, Seq("v"), "left_anti")
        .agg(coalesce(
          sum(round(col("r"), 14).cast(DecimalType(28, 14))).cast("double"),
          lit(0.0)).as("dang"))
      ranks = ranks.select(col("v"))
        .join(contrib, col("v") === col("cv"), "left")
        .crossJoin(dangling)
        .select(col("v"),
          round(lit((1.0 - damping) / nD) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dang") / nD),
            12).as("r"))
        .localCheckpoint() // cut the per-iteration lineage diamond
    }
    ranks.select(col("v").as(id), round(col("r"), roundTo).as("pr"))
  }
}
