package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Audio/video typed-metadata decode: REAL container-header parses (WAV
  * RIFF chunks, MP4 ftyp/mvhd boxes, MP3 frame header) over hand-built
  * payloads whose fields are pinned by construction. */
class AvMetaSpec extends AnyFunSuite {
  import Multimodal.SynthAv.{wavBytes, mp4Bytes, mp3Bytes}

  private def le32(v: Int) = Array[Byte](
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def s(t: String) = t.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("WAV fmt/data chunks: channels, rate, bits, exact duration") {
    assert(Multimodal.detectAvMagic(wavBytes(3200)) == "wav")
    // 3200 bytes at 32000 B/s = 100 ms
    assert(Multimodal.wavMeta(wavBytes(3200)).contains((2, 8000, 16, 100L)))
  }

  test("MP4 ftyp brand + mvhd duration") {
    val b = mp4Bytes(2500)
    assert(Multimodal.detectAvMagic(b) == "mp4")
    assert(Multimodal.mp4Meta(b).contains(("isom", 2500L)))
  }

  test("MP3 frame header after ID3: channels, rate, CBR duration") {
    val b = mp3Bytes(1000)
    assert(Multimodal.detectAvMagic(b) == "mp3")
    // (1000-10) bytes * 8 bits / 128 kbps = 61 ms
    assert(Multimodal.mp3Meta(b).contains((2, 44100, 61L)))
  }

  test("adversarial payloads: junk, truncation, huge chunk length never throw") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(Multimodal.wavMeta(junk).isEmpty && Multimodal.mp4Meta(junk).isEmpty
      && Multimodal.mp3Meta(junk).isEmpty)
    val hugeLen = s("RIFF") ++ le32(100) ++ s("WAVE") ++ s("fmt ") ++ le32(Int.MaxValue)
    assert(Multimodal.wavMeta(hugeLen).isEmpty)
    (0 to 12).foreach { n =>
      val t = wavBytes(3200).take(n)
      Multimodal.wavMeta(t); Multimodal.mp4Meta(t); Multimodal.mp3Meta(t)
    }
  }
}
