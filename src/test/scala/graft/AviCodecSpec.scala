package graft

import org.apache.spark.sql.functions._
import graft.expressions.AviCodec
import graft.queries.LlmOps

/** RIFF/AVI frame-walk kernel (AviCodec.scala): structural round-trips,
  * real-container conventions (padding, JUNK, audio interleave), hostile
  * inputs, and the registered q_multimodal_avi query. */
class AviCodecSpec extends SparkSpec {

  private def bytes(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    val a = new Array[Byte](n)
    r.nextBytes(a)
    a
  }

  test("round-trip: frames come back intact, in order, at true offsets") {
    for ((flen, n) <- Seq((12, 4), (7, 3), (1, 1), (64, 16))) {
      val src = bytes(flen * n, flen * 100 + n)
      val avi = AviCodec.encodeFrames(src, flen, n)
      val frames = AviCodec.parseFrames(avi)
      assert(frames != null && frames.numElements() == n, s"($flen,$n)")
      val pad = flen & 1
      for (k <- 0 until n) {
        val row = frames.getStruct(k, 3)
        assert(row.getInt(0) == k)
        assert(row.getLong(1) == 120L + k * (8 + flen + pad))
        assert(java.util.Arrays.equals(row.getBinary(2),
          java.util.Arrays.copyOfRange(src, k * flen, (k + 1) * flen)))
        // The offset really is absolute: reading the container there gives
        // the same frame bytes — the object-storage range-read contract.
        val off = row.getLong(1).toInt
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(avi, off, off + flen), row.getBinary(2)))
      }
    }
  }

  test("skips audio chunks and odd-size padding like a real interleaved AVI") {
    // Hand-build: movi with 00wb (audio), 00db (3 bytes, padded), 01dc.
    val v0 = Array[Byte](1, 2, 3)
    val v1 = bytes(6, 9)
    val bb = java.nio.ByteBuffer.allocate(200).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    val moviSz = 4 + (8 + 4) + (8 + 3 + 1) + (8 + 6)
    cc("RIFF"); bb.putInt(4 + 8 + moviSz); cc("AVI ")
    cc("LIST"); bb.putInt(moviSz); cc("movi")
    cc("00wb"); bb.putInt(4); bb.putInt(-1)        // audio: not a frame
    cc("00db"); bb.putInt(3); bb.put(v0); bb.put(0.toByte) // odd size + pad
    cc("01dc"); bb.putInt(6); bb.put(v1)           // second stream, compressed
    val avi = java.util.Arrays.copyOf(bb.array(), bb.position())
    val frames = AviCodec.parseFrames(avi)
    assert(frames != null && frames.numElements() == 2)
    assert(java.util.Arrays.equals(frames.getStruct(0, 3).getBinary(2), v0))
    assert(java.util.Arrays.equals(frames.getStruct(1, 3).getBinary(2), v1))
  }

  test("hostile inputs parse to null or empty, never throw") {
    val good = AviCodec.encodeFrames(bytes(48, 1), 12, 4)
    def patched(f: Array[Byte] => Unit): Array[Byte] = { val c = good.clone(); f(c); c }
    // Truly malformed → null.
    val nullCases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "junk" -> bytes(64, 2),
      "bad magic" -> patched(b => b(9) = 'X'),
      // movi LIST size runs past RIFF end → the inner walk must refuse.
      "movi size escape" -> patched(b => b(104) = 0x7f.toByte),
      // frame chunk size larger than its LIST → refuse.
      "frame size escape" -> patched(b => b(117) = 0x7f.toByte))
    for ((name, c) <- nullCases)
      assert(AviCodec.parseFrames(c) == null, s"case: $name")
    // Structurally valid but frameless → empty array, not null.
    val noMovi = patched { b => b(108) = 'x' } // movi → xovi: list skipped
    val res = AviCodec.parseFrames(noMovi)
    assert(res != null && res.numElements() == 0)
    // Truncated container: a chunk that walks past the buffer is malformed.
    assert(AviCodec.parseFrames(java.util.Arrays.copyOf(good, 50)) == null)
  }

  test("q_multimodal_avi: 4 frames per doc, absolute offsets, null text drops") {
    val df = LlmOps.qMultimodalAvi(spark, sf)
    val rows = df.collect()
    assert(rows.length > 0 && rows.length % 4 == 0)
    val byDoc = rows.groupBy(_.getLong(0))
    for ((_, fs) <- byDoc) {
      assert(fs.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2, 3))
      for (r <- fs) {
        assert(r.getLong(2) == 120L + r.getInt(1) * 20L)
        assert(r.getLong(3) == 12L)
        assert(r.getLong(4) >= 0L && r.getLong(4) <= 12L * 255)
      }
    }
  }
}
