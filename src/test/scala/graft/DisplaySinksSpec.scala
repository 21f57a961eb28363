package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DisplaySinks, MjpegServer}

/** Display sinks (SURVEY.md §2.2 K5/K6): image-file writes from a stream
  * and multipart MJPEG-style HTTP serving of the display path. */
class DisplaySinksSpec extends SparkSuite {

  import spark.implicits._

  test("K6: foreach image-file sink writes one file per key from a stream") {
    val dir = Files.createTempDirectory("graft-imgsink").toString
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Array[Byte])]
    input.addData(("0_1", "png_0_1".getBytes), ("0_2", "png_0_2".getBytes), ("1_1", "png_1_1".getBytes))
    val q = input.toDF().toDF("key", "payload")
      .writeStream
      .foreach(DisplaySinks.imageFileWriter(dir))
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val written = Files.list(Paths.get(dir)).iterator()
    val names = Iterator.continually(written).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSet
    assert(names == Set("0_1.png", "0_2.png", "1_1.png"))
    assert(new String(Files.readAllBytes(Paths.get(dir, "0_2.png"))) == "png_0_2")
  }

  test("K6: batch twin writes files from executors (foreachBatch form)") {
    val dir = Files.createTempDirectory("graft-imgsink-batch").toString
    val batch = Seq(("2_7", "png_2_7".getBytes), ("3_9", "png_3_9".getBytes)).toDF("key", "payload")
    DisplaySinks.writeImageFiles(batch, dir)
    assert(new String(Files.readAllBytes(Paths.get(dir, "3_9.png"))) == "png_3_9")
  }

  test("K5: MJPEG server streams published frames as multipart parts in order") {
    val server = new MjpegServer(queueCapacity = 4)
    server.start()
    try {
      server.publish("0", "frameA".getBytes)
      server.publish("0", "frameB".getBytes)
      server.publish("1", "other".getBytes)

      val conn = new java.net.URL(server.url("0", frames = 2)).openConnection()
      conn.setReadTimeout(10000)
      assert(conn.getContentType.startsWith("multipart/x-mixed-replace"))
      val body = new String(conn.getInputStream.readAllBytes())
      val parts = body.split("--frame").filter(_.contains("Content-Length"))
      assert(parts.length == 2)
      assert(parts(0).contains("Content-Type: image/png"))
      assert(parts(0).endsWith("frameA\r\n"))
      assert(parts(1).endsWith("frameB\r\n"))
    } finally server.stop()
  }

  test("K5: bounded queue drops oldest at capacity (O2 semantics)") {
    val server = new MjpegServer(queueCapacity = 2)
    server.start()
    try {
      (1 to 5).foreach(i => server.publish("0", s"f$i".getBytes))
      val body = new String(
        new java.net.URL(server.url("0", frames = 2)).openConnection().getInputStream.readAllBytes())
      assert(!body.contains("f1") && !body.contains("f2") && !body.contains("f3"))
      assert(body.contains("f4") && body.contains("f5"))
    } finally server.stop()
  }

  test("K5: batch bridge restores display order across input partitions") {
    val server = new MjpegServer(queueCapacity = 64)
    server.start()
    try {
      // frames deliberately scattered over many partitions in shuffled
      // order: the coalesce-then-sort in mjpegBatch must still publish
      // camera 0's frames as 1,2,...,8
      val batch = Seq(5L, 2L, 7L, 1L, 8L, 3L, 6L, 4L)
        .map(n => (0, n, s"c0f$n".getBytes))
        .toDF("camera", "frame_num", "frame")
        .repartition(6)
      DisplaySinks.mjpegBatch(server)(batch, 0L)
      val body = new String(
        new java.net.URL(server.url("0", frames = 8)).openConnection().getInputStream.readAllBytes())
      val positions = (1L to 8L).map(n => body.indexOf(s"c0f$n"))
      assert(positions.forall(_ >= 0), s"missing frames in: $body")
      assert(positions == positions.sorted, s"frames out of display order: $positions")
    } finally server.stop()
  }

  test("K5: malformed frames= answers 400; unknown camera answers 404") {
    val server = new MjpegServer(queueCapacity = 4)
    server.start()
    try {
      server.publish("0", "x".getBytes)
      val bad = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/cam/0?frames=abc")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(bad.getResponseCode == 400)
      val unknown = new java.net.URL(s"http://127.0.0.1:${server.boundPort}/cam/nope?frames=1")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(unknown.getResponseCode == 404,
        "a GET for a never-published camera must not create a queue")
    } finally server.stop()
  }

  test("K5: full display path — pipeline stream into the MJPEG sink via foreachBatch") {
    val server = new MjpegServer(queueCapacity = 16)
    server.start()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Int, Long, Array[Byte])]
    input.addData((0, 1L, "c0f1".getBytes), (1, 1L, "c1f1".getBytes), (0, 2L, "c0f2".getBytes))
    val q = input.toDF().toDF("camera", "frame_num", "frame")
      .writeStream
      .foreachBatch(DisplaySinks.mjpegBatch(server) _)
      .start()
    try {
      q.processAllAvailable()
      val body = new String(
        new java.net.URL(server.url("0", frames = 2)).openConnection().getInputStream.readAllBytes())
      val posF1 = body.indexOf("c0f1")
      val posF2 = body.indexOf("c0f2")
      assert(posF1 >= 0 && posF2 > posF1, s"expected c0f1 before c0f2 in: $body")
      assert(!body.contains("c1f1"), "camera 1 frames must not leak into camera 0's stream")
    } finally {
      q.stop()
      server.stop()
    }
  }
}
