package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  test("featurize produces stable schema, deterministic features and chunks") {
    val docs = Tables.documents(spark, sf("0.001"))
    val out = Multimodal.featurize(docs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "meta", "features", "chunk_hashes"))
    val row = out.orderBy("doc_id").head
    assert(row.getSeq[Double](row.fieldIndex("features")).length == 8)
    assert(row.getSeq[String](row.fieldIndex("chunk_hashes")).nonEmpty)
    // determinism: same input -> identical output
    val again = Multimodal.featurize(docs, "doc_id", "text").orderBy("doc_id").head
    assert(again.getSeq[Double](again.fieldIndex("features")) ==
      row.getSeq[Double](row.fieldIndex("features")))
    // payload bytes survive ingestion untouched
    val ing = Multimodal.ingestText(docs, "doc_id", "text")
    val back = ing.select(col("doc_id"), decode(col("payload"), "UTF-8").as("t"))
      .join(docs, "doc_id")
      .filter(col("t") =!= col("text"))
    assert(back.count() == 0)
  }

  test("binaryFile source ingests a directory into the multimodal schema (S6)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_binfiles")
    try {
      val payloads = Map(
        "alice.0.png" -> Array[Byte](1, 2, 3, 4, 5),
        "bob_smith.jpg" -> "bob-bytes".getBytes("UTF-8"),
        "carol.dat" -> Array.tabulate(300)(_.toByte))
      payloads.foreach { case (name, bytes) =>
        Files.write(dir.resolve(name), bytes)
      }
      val ing = Multimodal.ingestBinaryFiles(spark, dir.toString)
      val rows = ing.collect().map(r => r.getAs[String]("file_name") -> r).toMap
      assert(rows.keySet == payloads.keySet)
      // payload bytes survive untouched; meta carries the byte length
      payloads.foreach { case (name, bytes) =>
        assert(rows(name).getAs[Array[Byte]]("payload").toSeq == bytes.toSeq, name)
        assert(rows(name).getAs[org.apache.spark.sql.Row]("meta")
          .getAs[Long]("n_bytes") == bytes.length, name)
      }
      // P12 filename→label parse: up to first '.' or '_', title-cased
      assert(rows("alice.0.png").getAs[String]("label") == "Alice")
      assert(rows("bob_smith.jpg").getAs[String]("label") == "Bob")
      // q50-style projections run over file-backed payloads unchanged
      val q50ish = ing.select(col("file_name"),
        md5(col("payload")).as("payload_md5"),
        hex(col("payload").substr(lit(1), lit(8))).as("head_hex"))
      assert(q50ish.count() == 3)
      // and the stub decode stage accepts file-backed payloads
      val feats = ing.withColumn("features", Multimodal.stubDecodeFeatures(col("payload")))
      assert(feats.filter(size(col("features")) === 8).count() == 3)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      dir.toFile.delete()
    }
  }

  test("documents testdata is pure ASCII (q50/q51 oracle byte-vs-char parity)") {
    // the q50/q51 DuckDB oracles slice text by CHARACTERS while Spark
    // slices the payload by BYTES; they agree only while the corpus is
    // single-byte. If this fails, the oracles must change, not the code.
    val docs = Tables.documents(spark, sf("0.001"))
    assert(docs.filter(octet_length(col("text")) =!= length(col("text"))).count() == 0,
      "documents.text contains multi-byte characters; q50/q51 oracles assume ASCII")
  }

  test("native functions are callable from plain SQL") {
    graft.plans.VectorExpressions.register(spark)
    graft.plans.TextExpressions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "vec_sq_l2(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l, " +
      "size(shingle_hashes('a b c d', 3)) AS n").head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 2)
    // extensions class wires the same expressions (applied at session
    // construction in a fresh JVM; here we just exercise the injection)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("native portable stub model is bit-exact vs the declarative Column form") {
    import org.apache.spark.sql.functions._
    import graft.streaming.SauronPipeline
    val frames = Tables.documents(spark, sf("0.001")).limit(100)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("frame"))
    val native = SauronPipeline.detectStage(frames,
      SauronPipeline.stubDetectPortable(_, 16))
    val declarative = SauronPipeline.detectStage(frames,
      SauronPipeline.stubDetectPortableColumns(_, 16))
    // catalogString ignores nullability flags (the two constructions
    // disagree only there); values compare through a canonical JSON form
    assert(native.schema.catalogString == declarative.schema.catalogString)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), to_json(struct(col("faces"))).as("j"))
    assert(canon(native).exceptAll(canon(declarative)).count() == 0)
    assert(canon(declarative).exceptAll(canon(native)).count() == 0)
  }

  test("phashNearDup: exact payload dups at hamming 0, one-chunk edits nearby") {
    import spark.implicits._
    val base = Array.tabulate(256)(i => ('a' + i % 26).toChar).mkString
    // doc 3 = doc 1 with ONE 4-byte chunk (chunk 5 at cw=4) rewritten
    val edited = base.substring(0, 20) + "ZZZZ" + base.substring(24)
    val far = Array.fill(256)('q').mkString
    val docs = Seq((1L, base), (2L, base), (3L, edited), (4L, far))
      .toDF("doc_id", "text")
    val media = Multimodal.ingestText(docs, "doc_id", "text")
    val out = Multimodal.phashNearDup(media, "doc_id", "payload", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) == 0, "identical payloads must pair at hamming 0")
    // one edited chunk flips at most one signature bit: three bands are
    // untouched, so banding MUST surface the pair
    assert(out.contains((1L, 3L)) && out((1L, 3L)) <= 1,
      s"one-chunk edit must stay a candidate with tiny hamming: $out")
    assert(!out.keys.exists { case (a, b) => b == 4L || a == 4L } ||
      out.filter { case ((a, b), _) => a == 4L || b == 4L }.values.forall(_ > 0),
      "the unrelated payload must not alias an exact dup")
  }

  test("sceneSegments: identical runs never cut, streams are independent") {
    import spark.implicits._
    val x = Array.tabulate(256)(i => ('a' + i % 26).toChar).mkString
    val y = Array.fill(256)('q').mkString
    // camera 0: X X X Y — at most two scenes whatever d(X,Y) is;
    // camera 1: X X — exactly one scene (its own lag state)
    val frames = Seq((0, 0L, x), (0, 1L, x), (0, 2L, x), (0, 3L, y),
      (1, 0L, x), (1, 1L, x))
      .toDF("camera", "frame_num", "text")
      .withColumn("frame", encode(col("text"), "UTF-8"))
    // cutHamming = 0: a cut everywhere the signature changes at all
    val strict = Multimodal.sceneSegments(frames, "camera", "frame_num",
        "frame", cutHamming = 0)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // identical payloads share a signature: frames 0-2 are ONE scene
    assert(strict((0, 1L)) == ((0L, 2L, 3L)))
    assert(strict((0, 2L)) == ((3L, 3L, 1L)), s"y opens its own scene: $strict")
    assert(strict((1, 1L)) == ((0L, 1L, 2L)), "camera 1 is one scene")
    // cutHamming = 63: no distance can exceed it — one scene per camera
    val lax = Multimodal.sceneSegments(frames, "camera", "frame_num",
        "frame", cutHamming = 63)
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(lax == Map(0 -> 4L, 1 -> 2L))
  }
}
