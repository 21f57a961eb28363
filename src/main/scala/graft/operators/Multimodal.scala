package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A frame with its 64-bit perceptual signature — the wire row of
  * [[Multimodal.sceneCutStream]]. */
case class SigFrame(camera: Int, frameNum: Long, sig: Long)

/** Per-camera scene state: the last SEEN frame's position and
  * signature (hasPrev false only before the first frame). */
case class SceneState(lastFrame: Long, lastSig: Long, hasPrev: Boolean)

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

  /** S6 — ingest a directory of files as multimodal rows via Spark's
    * built-in `binaryFile` source (the reference loads uploaded query
    * images from disk, /root/reference/web/views.py:113-116). Columns:
    * (file_name, label, payload, meta); `label` applies the reference's
    * filename→person parse (name up to the first '.' or '_', title-
    * cased — web/views.py:121-131). The source prunes to metadata-only
    * reads when `payload` is not selected, and `pathGlobFilter`/
    * `recursiveFileLookup` handle directory trees at corpus scale. */
  def ingestBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*", format: String = "bin"): DataFrame = {
    val name = regexp_extract(input_file_name(), "([^/]+)$", 1)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        name.as("file_name"),
        initcap(regexp_extract(name, "^([^._]+)", 1)).as("label"),
        col("content").as("payload"),
        struct(
          lit(format).as("format"),
          col("length").as("n_bytes"),
          array(col("length").cast("int")).as("shape")).as("meta"))
  }

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

  /** Partition-wise batched decode — the Scala analog of a vectorized
    * `mapInPandas` media decoder: one expensive "model"/codec handle per
    * partition (not per row), rows processed in batches of `batchSize`.
    * The decoder here is the deterministic STUB (real deployments swap
    * in an image/audio codec); the plumbing — per-partition init, batch
    * iteration, typed output schema — is the real contract.
    *
    * Input must have (id: long, payload: binary); output adds a
    * features array per row. */
  def decodeBatched(df: DataFrame, id: String, batchSize: Int = 64,
      dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(id).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec" init happens once, here (stub: a hasher)
        val codec = new StubCodec(dim)
        rows.grouped(batchSize).flatMap { batch =>
          codec.decodeBatch(batch.map(_._2)).zip(batch).map {
            case (features, (rowId, _)) => (rowId, features)
          }
        }
      }
      .toDF(id, "features")
    df.join(out, id)
  }

  /** STUB codec: deterministic feature extraction standing in for a
    * native decoder; initialized once per partition by
    * [[decodeBatched]]. */
  private[operators] final class StubCodec(dim: Int) extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
      payloads.map { bytes =>
        Array.tabulate(dim) { i =>
          val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            bytes, org.apache.spark.sql.types.BinaryType, i.toLong)
          h.toDouble / Long.MaxValue.toDouble
        }
      }
  }

  /** 64-bit perceptual-hash-shaped signature of a binary payload: the
    * payload splits into 64 position-aligned chunks (chunk width =
    * ⌈bytes/64⌉) and bit i is the md5 parity of chunk i. The DCT of a
    * real pHash is stubbed (no codecs in the sandbox — the SURVEY §7.4
    * stance), but the LOCALITY is real: payloads sharing most chunks
    * share most bits, so banded candidate generation behaves exactly
    * as it would over a production perceptual hash. md5-derived, so
    * any engine recomputes the signature bit-for-bit. */
  def chunkSignature(payload: Column): Column = {
    val cw = greatest(
      ((octet_length(payload) + lit(63)) / lit(64)).cast("int"), lit(1))
    val bits = transform(sequence(lit(0), lit(63)), i =>
      conv(substring(md5(payload.substr(i * cw + 1, cw)), 1, 1), 16, 10)
        .cast("long") % 2L)
    val powers = typedlit((0 until 64).map(j => 1L << j))
    aggregate(zip_with(bits, powers, (b, p) => b * p),
      lit(0L), (acc, x) => acc + x)
  }

  /** Banded near-duplicate pairs over binary payloads — the multimodal
    * member of the dedup family (image/audio near-dup in a production
    * pipeline). Signatures from [[chunkSignature]]; candidates must
    * share at least one signature band (the SimHash pigeonhole: a pair
    * differing in at most bands−1 bits cannot differ in every band, so
    * FULL recall requires bands > maxHamming). The band count adapts to
    * the threshold: maxHamming ≤ 3 uses 4 × 16-bit bands (sparse
    * buckets — the scale-friendly cut), ≤ 7 uses 8 × 8-bit bands
    * (denser buckets, more candidates to verify); beyond 7 the 64-bit
    * signature cannot band losslessly and the call is refused.
    * Survivors keep integer Hamming distance ≤ `maxHamming`.
    *
    * Scale shape: the signature is a pure projection; the band
    * candidate join is an 8-byte-key equi-join (never payload×payload);
    * Hamming is one xor+popcount per candidate. Payload bytes never
    * shuffle. Output: (a_id, b_id, hamming). */
  def phashNearDup(df: DataFrame, id: String, payload: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 7,
      "phashNearDup: a 64-bit signature bands losslessly only up to " +
        "maxHamming 7 (8 x 8-bit bands)")
    val nBands = if (maxHamming < 4) 4 else 8
    val bandBits = 64 / nBands
    val bandMask = (1L << bandBits) - 1L
    // localCheckpoint: the signature projection (64 md5+substr calls
    // per payload through interpreted higher-order functions — the
    // most expensive projection in the plan) feeds BOTH sides of the
    // band self-join; without the cut it re-executes per side
    val sigs = df.select(col(id).as("mid"),
      chunkSignature(col(payload)).as("sig"))
      .localCheckpoint()
    val bands = sigs.select(col("mid"), col("sig"),
        explode(sequence(lit(0), lit(nBands - 1))).as("k"))
      .withColumn("bv", expr(s"(sig >> (k * $bandBits)) & $bandMask"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
        col("a.mid") < col("b.mid"))
      .select(col("a.mid").as("a_id"), col("b.mid").as("b_id"),
        col("a.sig").as("a_sig"), col("b.sig").as("b_sig"))
      .distinct()
    cand.withColumn("hamming",
        expr("bit_count(a_sig ^ b_sig)").cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Scene/shot segmentation over an ordered frame stream — the
    * keyframe-selection primitive of a video ingestion pipeline (the
    * reference samples frames blindly; this cuts where the CONTENT
    * changes): per stream, consecutive frames' perceptual signatures
    * ([[chunkSignature]] — DCT stubbed, locality real) compare by
    * Hamming distance, a distance > `cutHamming` opens a new scene,
    * and a running count of cuts labels every frame with its scene.
    * Output aggregates one row per scene: (stream, scene_id,
    * start_frame, end_frame, n_frames).
    *
    * Scale shape: signatures are a pure projection (payload bytes
    * never shuffle — 8-byte sigs do); the lag + running-sum windows
    * partition per stream, the inherent parallelism unit of scene
    * detection (state is one signature per stream; production fleets
    * have cameras ≫ cores). One shuffle on the stream key, then the
    * per-scene aggregate reuses the same partitioning. */
  def sceneSegments(frames: DataFrame, stream: String, order: String,
      payload: String, cutHamming: Int): DataFrame = {
    require(cutHamming >= 0 && cutHamming < 64,
      "sceneSegments: cutHamming in [0, 64)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stream)).orderBy(col(order))
    frames
      .select(col(stream), col(order),
        chunkSignature(col(payload)).as("sig"))
      .withColumn("prev_sig", lag(col("sig"), 1).over(w))
      .withColumn("cut",
        when(col("prev_sig").isNull ||
          expr("bit_count(sig ^ prev_sig)") > cutHamming, 1L).otherwise(0L))
      .withColumn("scene_id",
        sum(col("cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(stream), col("scene_id"))
      .agg(min(col(order)).as("start_frame"),
        max(col(order)).as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** Streaming scene-cut filter — the PERCEPTUAL upgrade of the
    * reference's blind frame skipping (SURVEY §2.5 F3 samples every
    * Nth frame whatever it shows): per camera, emit ONLY the frames
    * that open a new scene — first frame, or Hamming distance from the
    * previous frame's signature > `cutHamming` — so downstream decode/
    * detect stages pay per scene, not per frame. The batch twin is
    * [[sceneSegments]]: the emitted frames are exactly its
    * `start_frame`s (StreamingSpec pins the equality).
    *
    * State per camera is THREE fixed fields (last frame position, last
    * 64-bit signature, a seen flag) — O(1) per stream, the bounded-
    * state story at fleet scale. Within a micro-batch the group slice
    * sorts by frame position; stragglers at or before the high-water
    * mark drop deterministically (compose with
    * [[graft.streaming.ReorderBuffer]] upstream when the transport
    * reorders). */
  def sceneCutStream(frames: org.apache.spark.sql.Dataset[SigFrame],
      cutHamming: Int): org.apache.spark.sql.Dataset[SigFrame] = {
    require(cutHamming >= 0 && cutHamming < 64,
      "sceneCutStream: cutHamming in [0, 64)")
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val fEnc: Encoder[SigFrame] = Encoders.product[SigFrame]
    implicit val sEnc: Encoder[SceneState] = Encoders.product[SceneState]
    implicit val iEnc: Encoder[Int] = Encoders.scalaInt
    def update(camera: Int, it: Iterator[SigFrame],
        state: GroupState[SceneState]): Iterator[SigFrame] = {
      val prev = state.getOption.getOrElse(SceneState(Long.MinValue, 0L, false))
      var (lastFrame, lastSig, hasPrev) =
        (prev.lastFrame, prev.lastSig, prev.hasPrev)
      val out = Seq.newBuilder[SigFrame]
      it.toSeq.sortBy(_.frameNum).foreach { f =>
        if (f.frameNum > lastFrame) {
          if (!hasPrev ||
              java.lang.Long.bitCount(f.sig ^ lastSig) > cutHamming)
            out += f
          lastFrame = f.frameNum; lastSig = f.sig; hasPrev = true
        }
      }
      state.update(SceneState(lastFrame, lastSig, hasPrev))
      out.result().iterator
    }
    frames.groupByKey(_.camera)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update _)
  }

  /** Full stub pipeline over a text-as-media corpus: ingest → decode →
    * features + chunk sample. */
  def featurize(df: DataFrame, id: String, text: String): DataFrame =
    ingestText(df, id, text)
      .withColumn("features", stubDecodeFeatures(col("payload")))
      .withColumn("chunks", sampleChunks(col("payload"), chunkBytes = 16, stride = 4, maxChunks = 4))
      .select(col(id), col("meta"), col("features"),
              transform(col("chunks"), c => md5(c)).as("chunk_hashes"))
}
