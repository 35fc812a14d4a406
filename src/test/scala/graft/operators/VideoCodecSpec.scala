package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.VideoCodec

/** Container-level semantics of the GVID demux behind q168. */
class VideoCodecSpec extends AnyFunSuite {

  test("round-trip: sampled sums equal the closed-form pattern") {
    val (id, w, h, nf) = (42L, 5, 3, 4)
    val bytes = VideoCodec.synthesize(id, w, h, nf)
    assert(bytes.length == 10 + w * h * nf)
    val expect = (f: Int) => (for (y <- 0 until h; x <- 0 until w)
      yield VideoCodec.grayAt(id, f, x, y).toLong).sum
    val st = VideoCodec.decodeFrames(bytes, Seq(0, 2))
    assert((st.width, st.height, st.nFrames) == ((w, h, nf)))
    assert(st.sampledPixSum == expect(0) + expect(2))
    assert(st.nSampled == 2)
    // frame addressing: single-frame decode isolates one plane
    assert(VideoCodec.decodeFrames(bytes, Seq(3)).sampledPixSum == expect(3))
    // empty plan touches no plane bytes
    assert(VideoCodec.decodeFrames(bytes, Nil).sampledPixSum == 0L)
  }

  test("corrupt containers are rejected, not misread") {
    val ok = VideoCodec.synthesize(7L, 4, 4, 2)
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](VideoCodec.decodeFrames(badMagic, Seq(0)))
    intercept[IllegalArgumentException](
      VideoCodec.decodeFrames(ok.dropRight(1), Seq(0))) // truncated
    intercept[IllegalArgumentException](
      VideoCodec.decodeFrames(ok, Seq(2))) // frame index out of range
  }
}
