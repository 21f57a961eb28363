package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.FrameMessages

/** ScalaCheck-generator property: wire serde (P3/P4) round-trips
  * arbitrary frame messages — any camera/frame ids, any payload bytes
  * (full 0-255 range, including empty), ms-precision timestamps.
  * Generators are driven with fixed seeds (plain scalacheck; the
  * scalatest bridge artifact isn't available offline). */
class SerdePropertySpec extends SparkSuite {

  import spark.implicits._

  private val frameGen = for {
    camera <- Gen.chooseNum(0, 31)
    frameNum <- Gen.chooseNum(0L, 1L << 40)
    millis <- Gen.chooseNum(1500000000000L, 1900000000000L)
    payload <- Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray)
  } yield (camera, frameNum, millis, payload)

  private def sample(seed: Long, n: Int): List[(Int, Long, Long, Array[Byte])] =
    Gen.listOfN(n, frameGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(Nil)

  test("toWire/fromWire round-trip preserves key fields and payload bytes") {
    for (seed <- 1L to 20L) {
      val frames = sample(seed, 8)
      assert(frames.nonEmpty, s"generator returned nothing for seed $seed")
      val df = frames.map { case (c, f, ms, p) =>
        (c, f, new Timestamp(ms), p, "|u1", Seq(p.length))
      }.toDF("camera", "frame_num", "ts", "frame", "dtype", "shape")
      val back = FrameMessages.fromWire(FrameMessages.toWire(df))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getTimestamp(2),
          Option(r.getAs[Array[Byte]](3)).getOrElse(Array.empty[Byte]).toSeq))
        .toSet
      val expect = frames.map { case (c, f, ms, p) =>
        (c, f, new Timestamp(ms), p.toSeq)
      }.toSet
      assert(back == expect, s"round-trip mismatch for seed $seed")
    }
  }
}
