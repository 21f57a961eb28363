package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-level text-analysis operators for a training-data pipeline,
  * complementing the per-document projections in
  * [[graft.functions.TextFunctions]]: TF-IDF term ranking (corpus
  * statistics joined back per document), deterministic content-hash
  * dataset splitting, and pattern scan/redaction (PII and blocklist
  * filtering). The reference has no text analytics; these generalize
  * its content-keyed processing (SURVEY.md §2.5 F3) the way the BASELINE
  * north star requires.
  */
object TextAnalysis {

  /** Top-k terms per document by TF-IDF — the inverted-index shape:
    * one shuffle builds per-(doc, term) counts with map-side combine,
    * a second (tiny, term-keyed) aggregation derives document
    * frequency, and the equi-join back on `term` lets AQE broadcast
    * the DF side when the vocabulary is small. The score is the
    * log-free rational `cnt * N / df`: two IEEE-754 ops on exactly-
    * representable integers, so it is bit-identical across engines
    * (ln()-based IDF can differ in the last ulp between libm
    * implementations and break hash parity).
    *
    * Output: (id, rank, term, cnt, df, score), rank 1..k per doc,
    * ties broken by term. */
  def tfIdfTopTerms(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val tf = docs
      .select(col(id).as("doc"), explode(tokens(col(text))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(n)
      .withColumn("score", col("cnt").cast("double") * col("n") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc").as(id), col("rank"), col("term"), col("cnt"),
        col("df"), col("score"))
  }

  /** Deterministic content-hash train/val/test split — the standard
    * leak-proof way to partition a training corpus: the split follows
    * the CONTENT (md5 bucket 0..99), so duplicate documents land in the
    * same split on any cluster, any partitioning, any run, and adding
    * data never reshuffles existing assignments (a rand()-based split
    * guarantees none of these). Pure projection, no shuffle.
    *
    * @param trainPct bucket < trainPct           → "train"
    * @param valPct   bucket < trainPct + valPct  → "val", rest "test" */
  def hashSplit(docs: DataFrame, text: String,
      trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    val bucket = conv(substring(md5(col(text)), 1, 4), 16, 10).cast("int") % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** The md5 bucket behind [[hashSplit]], exposed for tests/oracles. */
  def hashBucket(text: Column): Column =
    conv(substring(md5(text), 1, 4), 16, 10).cast("int") % 100

  /** Conservative PII patterns (kept RE2-and-Java-compatible so the
    * same strings drive Spark, a DuckDB oracle, or a downstream Go/Rust
    * scrubber): email, North-American phone, US SSN. */
  val piiPatterns: Map[String, String] = Map(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn"   -> "[0-9]{3}-[0-9]{2}-[0-9]{4}")

  /** Count non-overlapping matches of `pattern` (whole-match, group 0). */
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Replace every match of `pattern` with `replacement` — the redaction
    * half of PII/blocklist filtering. Projection-only. */
  def redact(text: Column, pattern: String, replacement: String = "[REDACTED]"): Column =
    regexp_replace(text, pattern, replacement)

  /** Total PII hits per document across [[piiPatterns]]. */
  def piiHits(text: Column): Column =
    piiPatterns.values.map(patternCount(text, _)).reduce(_ + _)

  /** Redact every [[piiPatterns]] match. */
  def piiRedact(text: Column): Column =
    piiPatterns.values.foldLeft(text)((c, p) => redact(c, p))

  /** Word-boundary blocklist pattern for [[patternCount]]/[[redact]] —
    * bad-word filtering, the other standard scrub in LLM data work. */
  def blocklistPattern(words: Seq[String]): String =
    words.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")
}
