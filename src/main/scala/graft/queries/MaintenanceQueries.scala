package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Corpus-maintenance / pipeline-ops tier: boilerplate removal (the
  * CCNet template-chrome strip), key-skew pre-flight auditing, and the
  * streamable fixed-grid quantile monitor. */
object MaintenanceQueries {

  /** Eight words of injected template chrome — prepended to every even
    * doc so the fixture (random word soup, no real boilerplate) has a
    * known positive: the first 8-word segment of half of each source's
    * docs is identical, far past the 30% share fence. */
  private val Boiler =
    "legal notice footer copyright reserved terms privacy cookie"

  def all: Seq[(String, Q)] = Seq(

    // ---- q227: boilerplate strip (CCNet template removal) -------------------
    "q227_boilerplate_strip" -> Q(
      (s, d) => {
        val injected = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 2 === 0,
              concat(lit(Boiler), lit(" "), col("text")))
              .otherwise(col("text")).as("text"))
        graft.operators.TextAnalysis.boilerplateStrip(injected,
            "doc_id", "source", "text", segWords = 8, maxShare = 0.3)
          .select(col("doc_id"), col("source"), col("n_segments"),
            col("n_kept"), md5(col("clean_text")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH d0 AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 2 = 0 THEN '$Boiler' || ' ' || text
                      ELSE text END AS text
          FROM documents),
        w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM d0),
        c AS (
          SELECT doc_id, source, w,
                 CASE WHEN len(w) <= 8 THEN 1
                      ELSE (len(w) - 8 + 8 - 1) // 8 + 1 END AS nc
          FROM w),
        ex AS (SELECT doc_id, source, w, unnest(range(0, nc)) AS i FROM c),
        segs AS (
          SELECT doc_id, source, CAST(i AS INT) AS idx,
                 array_to_string(w[(i*8+1):least(i*8+8, len(w))], ' ') AS chunk
          FROM ex),
        hs AS (SELECT doc_id, source, idx, chunk, md5(chunk) AS h FROM segs),
        nsrc AS (
          SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM d0 GROUP BY source),
        bo AS (
          SELECT hs.source, h
          FROM hs JOIN nsrc ON nsrc.source = hs.source
          GROUP BY hs.source, h, nsrc.n_docs
          HAVING CAST(COUNT(DISTINCT doc_id) AS DOUBLE)
                   > CAST('0.3' AS DOUBLE) * CAST(nsrc.n_docs AS DOUBLE)),
        kept AS (
          SELECT hs.doc_id, hs.idx, hs.chunk
          FROM hs LEFT JOIN bo ON bo.source = hs.source AND bo.h = hs.h
          WHERE bo.h IS NULL),
        rec AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 md5(string_agg(chunk, ' ' ORDER BY idx)) AS clean_md5
          FROM kept GROUP BY doc_id),
        tot AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments
          FROM segs GROUP BY doc_id)
        SELECT d0.doc_id, d0.source,
               coalesce(tot.n_segments, CAST(0 AS BIGINT)) AS n_segments,
               coalesce(rec.n_kept, CAST(0 AS BIGINT)) AS n_kept,
               coalesce(rec.clean_md5, md5('')) AS clean_md5
        FROM d0
        LEFT JOIN tot ON tot.doc_id = d0.doc_id
        LEFT JOIN rec ON rec.doc_id = d0.doc_id
        ORDER BY d0.doc_id"""),
      "Boilerplate removal, CCNet-style: an 8-word segment whose exact " +
        "text repeats across >30% of one source's documents is template " +
        "chrome and strips from every document; text reconstructs from " +
        "kept segments in position order, md5-proved. The fixture " +
        "injects a known header into half of each source's docs; " +
        "repeated-ACROSS-documents is what separates boilerplate from " +
        "q56's repeated-within-document signal. Digests shuffle, never " +
        "segment text; the flagged set is template-sized and broadcasts."),

    // ---- q228: key-skew pre-flight audit ------------------------------------
    "q228_skew_audit" -> Q(
      (s, d) => graft.operators.Quality.skewAudit(
        Tables.lineitem(s, d), col("l_orderkey")),
      Some("""
        WITH c AS (
          SELECT CAST(l_orderkey AS VARCHAR) AS k,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
        sp AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS c2 FROM c GROUP BY n),
        cc AS (
          SELECT n, c2,
                 SUM(c2) OVER (ORDER BY n
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(c2) OVER () AS nk
          FROM sp),
        st AS (
          SELECT CAST(MAX(nk) AS BIGINT) AS n_keys,
                 CAST(SUM(n * c2) AS BIGINT) AS n_rows,
                 CAST(MAX(n) AS BIGINT) AS max_n,
                 min(CASE WHEN cum >= greatest(1, CAST(ceil(
                   CAST(0.5 AS DOUBLE) * CAST(nk AS DOUBLE)) AS BIGINT))
                   THEN n END) AS p50_n,
                 min(CASE WHEN cum >= greatest(1, CAST(ceil(
                   CAST(0.99 AS DOUBLE) * CAST(nk AS DOUBLE)) AS BIGINT))
                   THEN n END) AS p99_n
          FROM cc),
        tk AS (SELECT k AS top_key FROM c ORDER BY n DESC, k LIMIT 1)
        SELECT n_rows, n_keys, max_n, p50_n, p99_n,
               CAST(max_n AS DOUBLE) /
                 (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
                 AS skew_ratio,
               top_key
        FROM st CROSS JOIN tk"""),
      "Key-skew pre-flight for the lineitem orderkey shuffle: per-key " +
        "counts, discrete p50/p99 off the bounded count-of-counts " +
        "spine, the max/mean skew ratio, and the worst key by name. " +
        "The audit every big join deserves before it melts a task — " +
        "ratio in the thousands means salt (q159) or AQE-split the key."),

    // ---- q229: fixed-grid streaming-ready quantile estimates ----------------
    "q229_hist_quantiles" -> Q(
      (s, d) => graft.operators.Sketches.fixedHistogramQuantiles(
        Tables.events(s, d), col("value"), binWidth = 10.0),
      Some("""
        WITH b AS (
          SELECT CAST(floor(value / CAST('10.0' AS DOUBLE)) AS BIGINT) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE value IS NOT NULL GROUP BY 1),
        cc AS (
          SELECT bin, SUM(c) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(c) OVER () AS n
          FROM b)
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               min(CASE WHEN cum >= CAST(ceil(
                 CAST('0.5' AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)
                 THEN CAST(bin AS DOUBLE) * CAST('10.0' AS DOUBLE) END)
                 AS p50_est,
               min(CASE WHEN cum >= CAST(ceil(
                 CAST('0.9' AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)
                 THEN CAST(bin AS DOUBLE) * CAST('10.0' AS DOUBLE) END)
                 AS p90_est,
               min(CASE WHEN cum >= CAST(ceil(
                 CAST('0.99' AS DOUBLE) * CAST(n AS DOUBLE)) AS BIGINT)
                 THEN CAST(bin AS DOUBLE) * CAST('10.0' AS DOUBLE) END)
                 AS p99_est
        FROM cc"""),
      "Fixed-grid histogram quantile estimates of event value — the " +
        "STREAMABLE quantile form: caller-fixed bin width makes counts " +
        "purely additive (q83's data-dependent min/max edges are not), " +
        "so histogramIngest maintains the identical report per batch " +
        "with no history re-scan. Estimates are bin left edges — " +
        "within binWidth of truth by construction, exact multiples of " +
        "the grid."),

    // ---- q235: k-anonymity / l-diversity release audit ----------------------
    "q235_k_anonymity" -> Q(
      (s, d) => graft.operators.Quality.kAnonymityAudit(
        Tables.customer(s, d),
        quasi = Seq(
          "nation" -> col("c_nationkey"),
          "bal_bucket" -> floor(col("c_acctbal") / lit(1000.0)).cast("long")),
        sensitive = col("c_mktsegment"), k = 5),
      Some("""
        WITH classes AS (
          SELECT c_nationkey AS nation,
                 CAST(floor(c_acctbal / CAST('1000.0' AS DOUBLE)) AS BIGINT)
                   AS bal_bucket,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS nsens
          FROM customer GROUP BY 1, 2),
        a AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_classes,
                 MIN(cnt) AS k_anonymity,
                 MIN(nsens) AS l_diversity,
                 CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_classes_below_k,
                 CAST(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END) AS BIGINT)
                   AS n_rows_below_k
          FROM classes)
        SELECT n_rows, n_classes, k_anonymity, l_diversity,
               n_classes_below_k, n_rows_below_k,
               CAST(n_rows_below_k AS DOUBLE) / CAST(n_rows AS DOUBLE)
                 AS pct_rows_below_k
        FROM a"""),
      "k-anonymity / l-diversity audit of the customer table under " +
        "(nation, account-balance-thousand) quasi-identifiers with " +
        "market segment sensitive — the re-identification pre-flight " +
        "before any governed release, and the measurement counterpart " +
        "of Catalog.deleteRows (deletion handles the named individual; " +
        "this measures whether the remainder still hides everyone " +
        "else). One aggregation to equivalence classes, one reduction " +
        "of the bounded class table; k = smallest class, l = fewest " +
        "distinct sensitive values in any class (the homogeneity-" +
        "attack bound k alone misses). Pure integer outputs."),

    // ---- q236: epsilon-DP noisy count release -------------------------------
    "q236_dp_counts" -> Q(
      (s, d) => graft.operators.Quality.dpNoisyCounts(
        Tables.orders(s, d), col("o_orderpriority"),
        DpGroups, epsilon = 0.5, seed = 7L),
      Some(s"""
        WITH noise(g, nz) AS (VALUES ${DpGroups.map { g =>
          s"('$g', CAST('${graft.operators.Quality.dpLaplaceNoise(7L, g, 0.5)}' AS DOUBLE))"
        }.mkString(",\n          ")}),
        c AS (
          SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM orders
          WHERE o_orderpriority IN (${DpGroups.map("'" + _ + "'").mkString(", ")})
          GROUP BY 1)
        SELECT noise.g, CAST('0.5' AS DOUBLE) AS epsilon,
               CAST(coalesce(c.cnt, CAST(0 AS BIGINT)) AS DOUBLE) + noise.nz
                 AS noisy_count
        FROM noise LEFT JOIN c ON c.g = noise.g
        ORDER BY noise.g"""),
      "Epsilon-differentially-private release of per-priority order " +
        "counts (epsilon=0.5, Laplace sensitivity-1 noise) — the " +
        "governance sibling of q235: where the audit says 'these " +
        "cells are too small to show', this publishes every cell with " +
        "calibrated noise so no single order's presence detectably " +
        "moves any count. The released domain is a FIXED literal list " +
        "(data-derived group names would themselves leak); noise is " +
        "seeded per (seed, group) from the md5 urn and computed ON THE " +
        "DRIVER (ln never enters a plan — the NDCG-discount stance), " +
        "snapped to the 1e-9 grid, and embedded as the SAME literal in " +
        "the Spark plan and the oracle.")
  )

  /** Fixed released domain for the DP count query. */
  private val DpGroups = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
}
