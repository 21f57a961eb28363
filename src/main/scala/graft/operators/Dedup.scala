package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash group-by), MinHash+LSH banding, SimHash hamming pairs,
  * and exact n-gram Jaccard. The reference's analog is frame-level
  * "only unique frames" sampling (SURVEY.md §2.5 F3); these generalize
  * it to content-defined document identity at 100 TB scale.
  *
  * Scale design: exact dedup is one hash shuffle on a 16-byte digest;
  * MinHash/SimHash are projection-only signature computations followed
  * by an equi-join on (band, bucket) — the quadratic pair space is never
  * materialized, and bucket skew is bounded by the band width.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count. */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs.groupBy(md5(col(text)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep only the first (min id) row of each exact-duplicate group —
    * the "deduplicated corpus" view. */
  def dropExactDuplicates(docs: DataFrame, id: String, text: String): DataFrame = {
    val keep = exactGroups(docs, id, text).select(col("keep_id").as(id))
    docs.join(keep, id) // inner join on surviving ids; no row explosion (md5 collisions aside)
  }

  /** Exact pairwise n-gram Jaccard >= threshold, blocked by a partition
    * column (e.g. source) so the pair space stays bounded per block. */
  def jaccardPairs(docs: DataFrame, id: String, text: String, block: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(id).as("doc"), col(block).as("blk"),
        explode(shingles(col(text), n)).as("shingle"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.blk") === col("b.blk") && col("a.shingle") === col("b.shingle") &&
          col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "a_id").withColumnRenamed("n_sh", "n_a"), "a_id")
      .join(sizes.withColumnRenamed("doc", "b_id").withColumnRenamed("n_sh", "n_b"), "b_id")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"), col("jaccard"))
  }

  /** MinHash + LSH banding candidate pairs: signature of `numPerm`
    * permutations, banded into `bands` groups of numPerm/bands rows;
    * docs sharing any band bucket become candidates. Output: distinct
    * (a_id, b_id, n_shared_bands). */
  def minhashCandidates(docs: DataFrame, id: String, text: String,
      shingleN: Int, numPerm: Int, bands: Int): DataFrame = {
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rows = numPerm / bands
    val sig = docs.select(col(id).as("doc"),
      minhashSignature(shingles(col(text), shingleN), numPerm).as("sig"))
    val banded = sig.select(col("doc"), explode(array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)).as("bucket"))
    }: _*)).as("bb"))
      .select(col("doc"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("a_id"), col("b.doc").as("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** SimHash near-dup pairs within a blocking column: 64-bit signatures,
    * pairs at hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, id: String, text: String, block: String,
      maxHamming: Int): DataFrame = {
    val sig = docs.select(col(id).as("doc"), col(block).as("blk"),
      simhash64(col(text)).as("sig"))
    sig.as("a").join(sig.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc") < col("b.doc"))
      .withColumn("hamming", bit_count(col("a.sig").bitwiseXOR(col("b.sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc").as("a_id"), col("b.doc").as("b_id"), col("hamming"))
  }
}
