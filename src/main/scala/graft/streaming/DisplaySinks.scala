package graft.streaming

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentHashMap, Executors, LinkedBlockingQueue, TimeUnit}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** Display-path sinks (K5/K6 in SURVEY.md §2.2).
  *
  * K6 — image-file sink: the reference writes annotated query images back
  * to disk with `cv2.imwrite` (/root/reference/web/views.py:208). Here a
  * [[ForeachWriter]] writes each row's binary payload to a file named by
  * its key — it runs per-partition on the executors, so a 1000-executor
  * cluster writes its own partitions' files in parallel (no driver
  * funnel); overwrite-by-name makes replays idempotent.
  *
  * K5 — MJPEG HTTP sink: the reference's Flask view yields `--frame`
  * multipart chunks from a per-camera heap at ~30 fps
  * (/root/reference/src/utils.py:71-79,115-135; /root/reference/web/views.py:58-67).
  * A display endpoint is inherently a single edge node, so the Spark
  * analog is a `foreachBatch` that funnels the (small, O4-batch-capped,
  * already reordered) display stream to an embedded HTTP server on the
  * driver; the bounded per-camera queue is the O2 replay buffer
  * (drop-oldest at capacity, like the reference's heap that loses frames
  * older than the popped head).
  */
object DisplaySinks {

  /** K6: write each row's `payload` bytes to `dir/<key><ext>`.
    * Expects `key: string` and `payload: binary` columns. */
  def imageFileWriter(dir: String, ext: String = ".png"): ForeachWriter[Row] =
    new ForeachWriter[Row] {
      override def open(partitionId: Long, epochId: Long): Boolean = {
        Files.createDirectories(Paths.get(dir))
        true
      }
      override def process(row: Row): Unit = {
        val key = row.getString(row.fieldIndex("key"))
        require(!key.contains('/') && !key.contains(".."), s"unsafe key: $key")
        val payload = row.getAs[Array[Byte]](row.fieldIndex("payload"))
        Files.write(Paths.get(dir, key + ext), payload)
      }
      override def close(errorOrNull: Throwable): Unit = ()
    }

  /** Batch twin of [[imageFileWriter]] for `foreachBatch` topologies:
    * distributed per-partition file writes, same naming contract. */
  def writeImageFiles(batch: DataFrame, dir: String, ext: String = ".png"): Unit = {
    val writer = imageFileWriter(dir, ext)
    batch.select(col("key"), col("payload")).foreachPartition { rows: Iterator[Row] =>
      if (writer.open(0L, 0L)) {
        try rows.foreach(writer.process)
        finally writer.close(null)
      }
    }
  }

  /** K5 `foreachBatch` bridge: push a micro-batch's frames into the
    * server's per-camera queues in (camera, frame_num) order. The
    * coalesce-then-sort puts the display order back REGARDLESS of the
    * upstream partitioning (sort-then-coalesce would concatenate
    * partition-local runs, interleaving a camera that spans partitions);
    * `toLocalIterator` streams the single sorted partition to the driver
    * rather than materializing the batch (the batch is already
    * display-sized — O4 caps the trigger). */
  def mjpegBatch(server: MjpegServer)(batch: DataFrame, epochId: Long): Unit = {
    val it = batch
      .select(col("camera").cast("string").as("camera"), col("frame_num"), col("frame"))
      .coalesce(1)
      .sortWithinPartitions("camera", "frame_num")
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      server.publish(r.getString(0), r.getAs[Array[Byte]](2))
    }
  }
}

/** Minimal multipart/x-mixed-replace ("MJPEG") HTTP server: the Spark-side
  * stand-in for the reference's Flask display route (`/cam/<n>` —
  * /root/reference/web/views.py:58-67). `GET /cam/<id>?frames=n` streams up
  * to `n` frames (default: until the queue stays empty for `pollMs`).
  *
  * @param queueCapacity per-camera buffer (reference: 600 frames,
  *                      /root/reference/web/views.py:22); drop-oldest at cap
  * @param frameIntervalMs pacing between chunks (reference: ~30 fps via
  *                        `sleep 0.033`, /root/reference/src/utils.py:116);
  *                        0 = unpaced (tests)
  */
final class MjpegServer(
    port: Int = 0,
    queueCapacity: Int = 600,
    frameIntervalMs: Long = 0L,
    pollMs: Long = 2000L) {

  private val queues = new ConcurrentHashMap[String, LinkedBlockingQueue[Array[Byte]]]()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = Executors.newCachedThreadPool()
  server.setExecutor(pool)
  server.createContext("/cam/", new CamHandler)

  def start(): Unit = server.start()

  def stop(): Unit = {
    server.stop(0)
    pool.shutdownNow()
  }

  def boundPort: Int = server.getAddress.getPort

  def url(camera: String, frames: Int): String =
    s"http://127.0.0.1:$boundPort/cam/$camera?frames=$frames"

  /** Enqueue a frame for a camera; at capacity the oldest frame is
    * dropped (O2 bounded-buffer semantics). */
  def publish(camera: String, frame: Array[Byte]): Unit = {
    val q = queues.computeIfAbsent(camera, _ => new LinkedBlockingQueue[Array[Byte]](queueCapacity))
    while (!q.offer(frame)) q.poll()
  }

  private final class CamHandler extends HttpHandler {
    private val boundary = "frame"

    override def handle(exchange: HttpExchange): Unit = {
      try {
        val camera = exchange.getRequestURI.getPath.stripPrefix("/cam/")
        // a malformed frames= is the CLIENT's error: answer 400 instead
        // of letting NumberFormatException drop the connection bodily
        val framesParam = Option(exchange.getRequestURI.getQuery)
          .flatMap(_.split('&').collectFirst { case s if s.startsWith("frames=") => s.drop(7) })
        val parsed = framesParam.map(p => scala.util.Try(p.toInt))
        if (parsed.exists(_.isFailure)) {
          exchange.sendResponseHeaders(400, -1)
          return
        }
        val maxFrames = parsed.map(_.get).getOrElse(Int.MaxValue)
        // only cameras something has PUBLISHED get a queue: creating one
        // per arbitrary GET path would grow `queues` without bound
        val q = queues.get(camera)
        if (q == null) {
          exchange.sendResponseHeaders(404, -1)
          return
        }
        exchange.getResponseHeaders.set(
          "Content-Type", s"multipart/x-mixed-replace; boundary=$boundary")
        exchange.sendResponseHeaders(200, 0) // chunked
        val out = exchange.getResponseBody
        var sent = 0
        var frame = q.poll(pollMs, TimeUnit.MILLISECONDS)
        while (frame != null && sent < maxFrames) {
          writePart(out, frame)
          sent += 1
          if (frameIntervalMs > 0) Thread.sleep(frameIntervalMs)
          frame = if (sent < maxFrames) q.poll(pollMs, TimeUnit.MILLISECONDS) else null
        }
        out.close()
      } catch {
        case _: InterruptedException => Thread.currentThread().interrupt()
      } finally exchange.close()
    }

    private def writePart(out: OutputStream, frame: Array[Byte]): Unit = {
      val header =
        s"--$boundary\r\nContent-Type: image/png\r\nContent-Length: ${frame.length}\r\n\r\n"
      out.write(header.getBytes(StandardCharsets.US_ASCII))
      out.write(frame)
      out.write("\r\n".getBytes(StandardCharsets.US_ASCII))
      out.flush()
    }
  }
}
