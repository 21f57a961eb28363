package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions

/** The eye_of_sauron topology as one declarative Spark program
  * (SURVEY.md §3: StreamVideo → ConsumeFrames(detect+embed) →
  * PredictFrames(match+annotate) → per-camera routed sink).
  *
  * Every stage is a pure column transform, so the same code runs batch
  * (driver oracle) and streaming (readStream → writeStream): the
  * reference's two Kafka-separated processes become narrow stages that
  * Spark pipelines without a shuffle, and the query-face set — the
  * reference's broadcast topic (/root/reference/src/prediction_producer.py:222-228)
  * — becomes a stream-static broadcast join.
  *
  * The face model is STUBBED deterministically (no dlib/OpenCV in a JVM
  * sandbox): detection count, boxes and encodings are derived from
  * xxhash64 of the frame bytes. The model slot is the pluggable point,
  * exactly as the reference documents ("Replace Face recognition model
  * with desired Image processing model" — /root/reference/README.md:38).
  */
object SauronPipeline {

  /** STUB of face_locations + face_encodings
    * (/root/reference/src/prediction_producer.py:128-161): 0-2 faces per
    * frame, each with a deterministic box and `dim`-d encoding derived
    * from the frame bytes. Returns array<struct<box:array<int>,
    * enc:array<double>>>. */
  def stubDetect(frame: Column, dim: Int): Column = {
    val nFaces = pmod(xxhash64(frame), lit(3)) // 0..2 faces
    val faces = transform(sequence(lit(1), nFaces), i => struct(
      array(Seq(0, 1, 2, 3).map(c => pmod(xxhash64(frame, i, lit(c)), lit(400)).cast("int")): _*).as("box"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        xxhash64(frame, i, d).cast("double") / lit(Long.MaxValue.toDouble)).as("enc")))
    // sequence(1, 0) yields the DESCENDING array [1, 0], not [] — guard
    // the zero-face case explicitly or every "faceless" frame grows two
    // phantom faces (slice(_, 1, 0) = typed empty array)
    when(nFaces > 0, faces).otherwise(slice(faces, 1, 0))
  }

  /** Stage 1 — ConsumeFrames: detect + embed. Adds `faces`. */
  def detectStage(frames: DataFrame, dim: Int = 64): DataFrame =
    frames.withColumn("faces", stubDetect(col("frame"), dim))

  /** Stage 2 — PredictFrames: match every detected face against the
    * broadcast target set (L2 <= tolerance, first match = lowest target
    * id, else "Unknown"), stamp per-frame prediction + latency.
    *
    * Shuffle-free by design: the target set is tiny (it is the
    * reference's per-query broadcast topic), so it is folded into ONE
    * array literal row and broadcast-cross-joined; per-face matching is
    * then a pure array expression — no explode/regroup, no stateful
    * aggregation, streaming-append-safe, and the stage pipelines with
    * detect inside a single narrow task at any scale.
    *
    * @param targets small DataFrame (t_id, t_name, t_enc: array<double>)
    *                — the query-face broadcast set
    */
  def predictStage(detected: DataFrame, targets: DataFrame, tolerance: Double): DataFrame = {
    val targetArr = broadcast(
      targets.agg(sort_array(collect_list(
        struct(col("t_id"), col("t_name"), col("t_enc")))).as("t_set")))
    val firstMatch: Column => Column = enc => try_element_at(
      transform(
        filter(col("t_set"), t => sqrt(squaredL2(enc, t.getField("t_enc"))) <= tolerance),
        t => t.getField("t_name")),
      lit(1))
    detected.crossJoin(targetArr)
      // annotations = zip(box_i, name_i) (J3); first match wins because
      // t_set is sorted by t_id and filter preserves order (J2)
      .withColumn("annotations", transform(col("faces"), f => struct(
        f.getField("box").as("box"),
        coalesce(firstMatch(f.getField("enc")), lit("Unknown")).as("name"))))
      // prediction = first face's name (A1: face_names[0]); null if no faces
      .withColumn("prediction", try_element_at(col("annotations"), lit(1)).getField("name"))
      .withColumn("predict_time", current_timestamp())
      // A2 latency in fractional seconds — deliberately NOT the
      // reference's int()-truncated form (SURVEY.md §7.4)
      .withColumn("latency_s",
        (unix_micros(col("predict_time")) - unix_micros(col("ts"))).cast("double") / 1e6)
      .drop("t_set", "faces")
  }

  /** Full topology: frames → detect → match/predict → routed for the
    * per-camera sink (K2). Works on batch and streaming inputs. */
  def process(frames: DataFrame, targets: DataFrame, tolerance: Double,
      topicPrefix: String = "predicted_object_raw_frame_topic"): DataFrame =
    predictStage(detectStage(frames), targets, tolerance)
      .withColumn("topic", FrameMessages.routedTopic(topicPrefix, col("camera")))
      .withColumn("key", FrameMessages.frameKey(col("camera"), col("frame_num")))
}
