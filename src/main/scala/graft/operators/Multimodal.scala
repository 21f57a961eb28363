package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / frame-sample stages. This container ships no media
  * codecs, so the decode step is STUBBED with a deterministic
  * bytes-derived fake (clearly marked below); the Spark-side contract —
  * schema, batch shape, partition-friendly projections — is real, and is
  * what matters at 100 TB: payload bytes never leave the executor, all
  * derived features are narrow projections.
  *
  * Reference analog: frames travel as base64 uint8 tensors with
  * dtype/shape sidecars (/root/reference/src/utils.py:248-264); here the
  * payload stays binary (no base64 inflation) and metadata is a struct.
  */
object Multimodal {

  /** Media metadata struct: format tag + byte size + logical shape. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("shape", ArrayType(IntegerType))))

  /** Wrap a text column as a fake media payload (UTF-8 bytes) with
    * metadata — stands in for image/audio ingestion. */
  def ingestText(df: DataFrame, id: String, text: String, format: String = "txt"): DataFrame =
    df.select(
      col(id),
      encode(col(text), "UTF-8").as("payload"),
      struct(
        lit(format).as("format"),
        octet_length(col(text)).cast("long").as("n_bytes"),
        array(octet_length(col(text))).as("shape")).as("meta"))

  /** STUB decode: a real deployment would decode image/audio bytes here
    * (e.g. via a vectorized native UDF). Deterministic stand-in: an
    * 8-dim feature vector of seeded xxhash64 values of the payload,
    * scaled into [-1, 1). Keeps schema/batch shape identical to a real
    * embedding stage. */
  def stubDecodeFeatures(payload: Column, dim: Int = 8): Column =
    array((0 until dim).map { i =>
      (xxhash64(lit(i), payload).cast("double") / lit(Long.MaxValue.toDouble))
    }: _*)

  /** Frame/chunk sampling: every `stride`-th chunk of `chunkBytes` from
    * the payload (video frame-sample stand-in). Pure projection. */
  def sampleChunks(payload: Column, chunkBytes: Int, stride: Int, maxChunks: Int): Column =
    filter(
      transform(sequence(lit(0), lit(maxChunks - 1)),
        i => payload.substr(lit(1) + i * lit(chunkBytes * stride), lit(chunkBytes))),
      c => octet_length(c) > 0)

  /** Full stub pipeline over a text-as-media corpus: ingest → decode →
    * features + chunk sample. */
  def featurize(df: DataFrame, id: String, text: String): DataFrame =
    ingestText(df, id, text)
      .withColumn("features", stubDecodeFeatures(col("payload")))
      .withColumn("chunks", sampleChunks(col("payload"), chunkBytes = 16, stride = 4, maxChunks = 4))
      .select(col(id), col("meta"), col("features"),
              transform(col("chunks"), c => md5(c)).as("chunk_hashes"))
}
