package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Driver-memoized EXACT audit baselines, shared across the recall
  * audits that re-rank the same probe set (q192/q193 share the exact
  * near-dup pair space, q208/q209 the exact cosine top-3, q210/q211
  * the exact squared-L2 top-3): the exact arm is the expensive
  * brute-force relation, it is IDENTICAL across each audit pair by
  * construction, and it is tiny by contract (input-capped baseline —
  * a few hundred probe×k rows), so computing it once per session and
  * replaying the collected rows as a LocalRelation removes it from
  * every later audit's critical path. Results are the same rows either
  * way — only the plan changes (LocalRelation scan vs recompute) — so
  * oracle hashes are untouched. A baseline that unexpectedly exceeds
  * `MaxRows` is returned un-memoized (correct, just not cached).
  *
  * MEASUREMENT HONESTY: the memo only serves UNTIMED surfaces (Verify's
  * single pass over 300 queries, interactive Explain). `graft.Bench`
  * calls `clear()` in its between-queries sweep, so every TIMED run
  * recomputes the exact baseline from the parquet inputs — no result
  * carries from the warmup run or from a sibling audit into a timed
  * measurement. */
object AuditCache {
  private val MaxRows = 1 << 20
  private val cache = new ConcurrentHashMap[String, (StructType, Array[Row])]()

  /** Drop every memoized baseline (bench harness hook). */
  def clear(): Unit = cache.clear()

  def memo(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val hit = cache.get(key)
    if (hit != null) {
      val (schema, rows) = hit
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    } else {
      val df = build
      val rows = df.collect()
      if (rows.length <= MaxRows) {
        cache.putIfAbsent(key, (df.schema, rows))
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      } else df
    }
  }
}
