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
  * NOT an all-pairs Levenshtein scan: each string explodes into len+1
  * blocking keys (itself plus every single-character deletion), and
  * candidates come from an EQUI-join on those keys. Carrying the
  * deletion POSITION makes the k=1 candidate set EXACT, no verify pass:
  * two distinct strings are within edit distance 1 iff they share a
  * deletion at the SAME position (that is precisely a substitution) or
  * one equals a deletion of the other (insertion/deletion) — different-
  * position collisions like "ab"/"ba" (ed 2) never join. At 100 TB:
  * one hash equi-join on short string keys (×(len+1) fan-out, each key
  * shared by at most ~alphabet×len rows), no cartesian anywhere, no
  * per-candidate DP — the same bucketed-not-all-pairs contract as
  * MinHash/SimHash (PlanSpec pins it).
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

  /** [[deletionNeighborhood]] keeping each variant's deletion position
    * (0 = the string itself) — the tag that makes k=1 blocking exact. */
  def deletionNeighborhoodPos(c: Column): Column =
    transform(
      sequence(lit(0), length(c)),
      i => struct(
        when(i === 0, c)
          .otherwise(concat(c.substr(lit(1), i - 1),
                            c.substr(i + 1, length(c)))).as("v"),
        i.as("p")))

  /** All pairs of rows whose `name` strings are within edit distance 1
    * (substitution, insertion, or deletion — or exact duplicates),
    * found via the position-tagged deletion-neighborhood equi-join.
    * Output: (a_id, b_id, a_name, b_name, dist) with a_id < b_id and
    * dist = 0 for equal names, 1 otherwise; one row per pair however
    * many blocking keys it shares (exact duplicates share them all —
    * the aggregation collapses the routes). */
  def editDistanceOnePairs(df: DataFrame, idCol: String,
      nameCol: String): DataFrame = {
    val keyed = df.select(
        col(idCol).as("_id"), col(nameCol).as("_name"),
        explode(deletionNeighborhoodPos(col(nameCol))).as("_kp"))
      .select(col("_id"), col("_name"),
        col("_kp.v").as("_blk"), col("_kp.p").as("_pos"))
    val a = keyed.toDF("a_id", "a_name", "_blk", "_apos")
    val b = keyed.toDF("b_id", "b_name", "_blkb", "_bpos")
    a.join(b, a("_blk") === b("_blkb") && a("a_id") < b("b_id") &&
        // same-position deletion = substitution; position 0 on either
        // side = insertion/deletion (or equality); anything else is
        // ed >= 2 and must not match
        (a("_apos") === b("_bpos") || a("_apos") === 0 || b("_bpos") === 0))
      .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"))
      .distinct()
      .withColumn("dist",
        when(col("a_name") === col("b_name"), 0).otherwise(1))
  }
}
