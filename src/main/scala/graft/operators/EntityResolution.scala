package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution — the record-linkage half of dedup: where
  * [[Dedup]] finds near-identical *documents*, this finds near-identical
  * *entity strings* (names, addresses, product titles) under edit
  * distance. The reference's first-match-by-distance loop
  * (`/root/reference/src/prediction_producer.py:313-325`) is the vector
  * analog; this is the string analog every training-data pipeline needs
  * for author/site/license dedup before mixing corpora.
  *
  * Scale design — FastSS deletion neighborhoods (Bocek et al. 2007),
  * NOT an all-pairs Levenshtein scan: two strings are within edit
  * distance 1 iff they share a member of their deletion neighborhoods
  * (the string itself plus every single-character deletion). Each row
  * therefore explodes into len+1 blocking keys, candidates come from an
  * EQUI-join on those keys, and the exact `levenshtein` verifier runs
  * only on candidates. At 100 TB: the shuffle is a hash join on short
  * string keys (×(len+1) fan-out, each key shared by at most ~alphabet
  * ×len rows), and no registered path ever plans a CartesianProduct —
  * the same bucketed-not-all-pairs contract as MinHash/SimHash
  * (PlanSpec pins it).
  */
object EntityResolution {

  /** The deletion-1 neighborhood of `c`: the string itself (deletion
    * position 0) plus the string with character i removed, i = 1..len.
    * Pure built-ins (`sequence` + `transform` + `substr`) — stays
    * inside whole-stage codegen, no UDF. */
  def deletionNeighborhood(c: Column): Column =
    transform(
      sequence(lit(0), length(c)),
      i => when(i === 0, c)
        .otherwise(concat(c.substr(lit(1), i - 1),
                          c.substr(i + 1, length(c)))))

  /** All pairs of rows whose `name` strings are within edit distance 1
    * (Hamming substitution, insertion, or deletion), found via the
    * deletion-neighborhood equi-join and verified with the exact
    * codegen'd `levenshtein` built-in. Output:
    * (a_id, b_id, a_name, b_name, dist) with a_id < b_id, one row per
    * pair however many blocking keys it shares. */
  def editDistanceOnePairs(df: DataFrame, idCol: String,
      nameCol: String): DataFrame = {
    val keyed = df.select(
        col(idCol).as("_id"), col(nameCol).as("_name"),
        explode(deletionNeighborhood(col(nameCol))).as("_blk"))
    val a = keyed.toDF("a_id", "a_name", "_blk")
    val b = keyed.toDF("b_id", "b_name", "_blkb")
    a.join(b, a("_blk") === b("_blkb") && a("a_id") < b("b_id"))
      .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 1)
  }
}
