package graft.pipeline

import graft.queries.PipelineQueries
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal queries decode REAL bytes through REAL JDK codecs;
  * every decoded value has a closed-form expectation from the
  * deterministic payload synthesis.
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def available: Boolean = new java.io.File(s"$dir/documents.parquet").exists()

  test("PNG roundtrip recovers dimensions and exact pixel data") {
    (0L until 8L).foreach { id =>
      val bytes = Media.pngPayload(id)
      // a genuine PNG container, not a fake: magic bytes present
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N',
        s"doc $id payload is not PNG")
      val (w, h, rgb) = Media.decodePng(bytes)
      assert(w == Media.widthFor(id) && h == Media.heightFor(id),
        s"doc $id decoded ${w}x$h")
      assert(rgb == Media.probeRgb(id),
        s"doc $id probe pixel ${rgb.toHexString} != synthesized " +
          s"${Media.probeRgb(id).toHexString} — decode is not reading pixels")
    }
  }

  test("WAV roundtrip: container parses, window RMS matches PCM recompute") {
    (0L until 8L).foreach { id =>
      val bytes = Media.wavPayload(id)
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F',
        s"doc $id payload is not RIFF/WAV")
      val (frames, rate, ch, windows) = Media.wavWindows(bytes)
      val pcm = Media.pcmFor(id)
      assert(frames == pcm.length && rate == Media.SampleRate && ch == 1)
      val step = Media.SampleRate * Media.FrameStepMs.toInt / 1000
      assert(windows.length ==
        (pcm.length + step - 1) / step, s"doc $id window count")
      windows.foreach { case (idx, ts, rms) =>
        assert(ts == idx * Media.FrameStepMs)
        val slice = pcm.slice(idx * step, math.min((idx + 1) * step, pcm.length))
        val want = math.rint(math.sqrt(
          slice.map(s => s.toDouble * s).sum / slice.length) * 1000) / 1000
        assert(rms == want,
          s"doc $id window $idx rms $rms != $want — decoded PCM diverges")
      }
    }
  }

  /** A silent 16-bit mono WAV of exactly `seconds` seconds — the bound
    * probe for the in-memory windowing limit.
    */
  private def silentWav(seconds: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (seconds * Media.SampleRate).toInt
    val fmt = new AudioFormat(Media.SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](n * 2)), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wavWindows enforces its in-memory clip bound, from metadata alone") {
    // AT the bound: decodes fine (silence → rms 0 everywhere)
    val (frames, _, _, windows) = Media.wavWindows(silentWav(Media.MaxClipSeconds))
    assert(frames == Media.MaxClipSeconds * Media.SampleRate)
    assert(windows.forall(_._3 == 0.0))
    // BEYOND the bound: rejected before the buffer is materialized
    val ex = intercept[IllegalArgumentException] {
      Media.wavWindows(silentWav(Media.MaxClipSeconds + 1))
    }
    assert(ex.getMessage.contains("in-memory windowing bound"), ex.getMessage)
  }

  test("q47 decodes every document's image with exact expectations") {
    assume(available)
    val rows = PipelineQueries.q47_media_decode(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) == Media.widthFor(id) &&
        r.getInt(3) == Media.heightFor(id) &&
        r.getInt(4) == Media.probeRgb(id), s"doc $id: $r")
    }
  }

  test("q48 emits per-window rows with decode-derived stream facts") {
    assume(available)
    val rows = PipelineQueries.q48_media_frames(spark, dir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      val pcm = Media.pcmFor(id)
      val step = Media.SampleRate * Media.FrameStepMs.toInt / 1000
      assert(rs.length == (pcm.length + step - 1) / step, s"doc $id frames")
      rs.foreach { r =>
        assert(r.getLong(3) == pcm.length.toLong, s"doc $id n_samples")
        assert(r.getDouble(4) == Media.SampleRate.toDouble &&
          r.getInt(5) == 1, s"doc $id stream facts")
        // pin the QUERY-level rms/ts projection, not just the kernel:
        // a swapped tuple position in q48 must fail here
        val idx = r.getInt(1)
        assert(r.getLong(2) == idx * Media.FrameStepMs, s"doc $id ts_ms")
        val slice = pcm.slice(idx * step,
          math.min((idx + 1) * step, pcm.length))
        val want = math.rint(math.sqrt(
          slice.map(s => s.toDouble * s).sum / slice.length) * 1000) / 1000
        assert(r.getDouble(6) == want, s"doc $id window $idx rms")
      }
    }
  }
}
