package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's on-wire message model (FIXTURES.md §A), Spark-native.
  *
  * Reference serde: every numpy tensor travels as a base64/dtype/shape
  * triplet inside a JSON dict (/root/reference/src/utils.py:248-264),
  * keyed `"{camera}_{frame_num}"` (/root/reference/src/frame_producer.py:135).
  * Here the frame payload is a `binary` column; the wire form is
  * `to_json(struct(...))` with base64 applied only at the boundary — no
  * base64 inflation inside the pipeline.
  *
  * Unlike the reference (ORIGINAL_PREFIX == PREDICTED_PREFIX, so the
  * annotated frame overwrites the original — /root/reference/src/params.py:14-15),
  * original and annotated data are distinct columns here (SURVEY.md §1.4).
  */
object FrameMessages {

  /** Wire schema of a raw frame message (A.1). */
  val rawFrameWireSchema: StructType = StructType(Seq(
    StructField("timestamp", DoubleType),
    StructField("camera", IntegerType),
    StructField("frame_num", LongType),
    StructField("frame_b64", StringType),
    StructField("dtype", StringType),
    StructField("shape", ArrayType(IntegerType))))

  /** Kafka-style key: "{camera}_{frame_num}" (P11). */
  def frameKey(camera: Column, frameNum: Column): Column =
    concat_ws("_", camera, frameNum)

  /** Serialize (camera, frame_num, ts, frame, dtype, shape) → (key, value)
    * wire columns (P2/P3: metadata stamp + tensor→JSON). */
  def toWire(df: DataFrame): DataFrame =
    df.select(
      frameKey(col("camera"), col("frame_num")).as("key"),
      to_json(struct(
        unix_micros(col("ts")).cast("double").divide(lit(1e6)).as("timestamp"),
        col("camera"),
        col("frame_num"),
        base64(col("frame")).as("frame_b64"),
        col("dtype"),
        col("shape"))).as("value"))

  /** Deserialize wire (value JSON) → typed columns (P4). */
  def fromWire(df: DataFrame): DataFrame = {
    val parsed = df.select(from_json(col("value"), rawFrameWireSchema).as("m"))
    parsed.select(
      col("m.camera").as("camera"),
      col("m.frame_num").as("frame_num"),
      timestamp_micros((col("m.timestamp") * 1e6).cast("long")).as("ts"),
      unbase64(col("m.frame_b64")).as("frame"),
      col("m.dtype").as("dtype"),
      col("m.shape").as("shape"))
  }

  /** Dynamic output topic per record: `"{prefix}_{camera}"` (K2 —
    * /root/reference/src/prediction_producer.py:269-271). The Kafka sink
    * honors a per-row `topic` column natively. */
  def routedTopic(prefix: String, camera: Column): Column =
    concat_ws("_", lit(prefix), camera)
}
