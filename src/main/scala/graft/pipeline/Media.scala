package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs over the JDK's own libraries — `javax.imageio`
  * (PNG) and `javax.sound.sampled` (WAV) ship with `java.desktop`, so
  * the multimodal pipeline queries (q47/q48) decode genuine bytes
  * through genuine codecs rather than the deterministic fakes rounds
  * 1–3 carried (the sandbox has no THIRD-PARTY codec libraries, which
  * is what kept them stubbed; the JDK built-ins close the image and
  * audio paths — video stays out of scope, as the JDK ships no
  * demuxer).
  *
  * The testdata carries no media column, so payloads are SYNTHESIZED
  * deterministically per doc id — every decoded value therefore has a
  * closed-form expectation that MediaSpec asserts (decoded dimensions,
  * a probe pixel's RGB, per-window RMS). Payload synthesis runs
  * distributed inside the same tasks that decode, exercising the real
  * batch shape: opaque binary column in, typed features out, no
  * shuffle.
  *
  * All methods are static-object and Serializable-safe for executor
  * closures (the VecOps pattern).
  */
object Media extends Serializable {

  // memory-backed codec streams: the default disk cache creates and
  // deletes a temp file per ImageIO.write/read call — two filesystem
  // round-trips per document on the hot decode path
  ImageIO.setUseCache(false)

  // -------------------- image (PNG via javax.imageio) ----------------

  /** Deterministic image geometry per doc id: 64–160 px wide, 4:3.
    * floorMod, not `%`: a negative id under sign-preserving remainder
    * would yield width 0 and crash BufferedImage (the stub this
    * replaced carried the same every-input-valid invariant).
    */
  def widthFor(id: Long): Int = 64 + Math.floorMod(id, 4L).toInt * 32
  def heightFor(id: Long): Int = widthFor(id) * 3 / 4

  /** Deterministic probe-pixel color at (7, 5) — decoding must recover
    * it EXACTLY (PNG is lossless), proving real pixel decode rather
    * than header peeking.
    */
  def probeRgb(id: Long): Int =
    (java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L) & 0xffffff)

  /** A real PNG payload: gradient content + the probe pixel. Pixels are
    * written straight into the backing int raster — per-pixel `setRGB`
    * goes through color-model conversion on every call and made payload
    * synthesis (not the codec) the dominant cost of q47.
    */
  def pngPayload(id: Long): Array[Byte] = {
    val w = widthFor(id)
    val h = heightFor(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        px(row + x) = (((x ^ y) * 31) + id.toInt) & 0xffffff
        x += 1
      }
      y += 1
    }
    px(5 * w + 7) = probeRgb(id)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG payload: (width, height, rgb of the probe pixel). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    (img.getWidth, img.getHeight, img.getRGB(7, 5) & 0xffffff)
  }

  // -------------------- audio (WAV via javax.sound) ------------------

  val SampleRate = 16000
  val FrameStepMs = 100L

  /** In-memory decode bound for [[wavWindows]]: the windowing reads the
    * WHOLE decoded stream into one task's memory (`readAllBytes`) — in
    * contract for the synthesized sub-second clips, but a real audio
    * pipeline feeding hour-long streams needs streaming windows. Until
    * that exists the bound is explicit: clips longer than this fail
    * fast with an actionable message instead of silently OOMing the
    * executor mid-batch. 10 min of 16-bit mono @ 16 kHz ≈ 19 MB/clip.
    */
  val MaxClipSeconds = 600L

  /** Deterministic audio duration per doc id: 200–900 ms (floorMod —
    * see [[widthFor]]; a negative remainder would silently emit an
    * empty PCM stream and drop the doc from the output).
    */
  def durationMsFor(id: Long): Long = 200L + Math.floorMod(id, 8L) * 100L

  /** Raw 16-bit mono PCM for doc `id`: a seeded sine with id-dependent
    * frequency and amplitude — RMS per window is closed-form checkable.
    */
  def pcmFor(id: Long): Array[Short] = {
    val n = (durationMsFor(id) * SampleRate / 1000L).toInt
    val freq = 0.02 + Math.floorMod(id, 10L) * 0.01
    val amp = 4000 + Math.floorMod(id, 5L).toInt * 1000
    Array.tabulate(n)(i => (math.sin(i * freq) * amp).toShort)
  }

  /** A real WAV payload (RIFF container via AudioSystem). */
  def wavPayload(id: Long): Array[Byte] = {
    val pcm = pcmFor(id)
    val bytes = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      bytes(2 * i) = (pcm(i) & 0xff).toByte
      bytes(2 * i + 1) = (pcm(i) >> 8).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, pcm.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload and window it: one row per `FrameStepMs`
    * window with its RMS amplitude — (frameIdx, tsMs, rms rounded to 3
    * digits) plus the decoded stream facts (frames, sampleRate,
    * channels) the caller projects. Real container parse + real PCM
    * math, the audio analogue of video frame sampling.
    */
  def wavWindows(bytes: Array[Byte]): (Long, Float, Int, Seq[(Int, Long, Double)]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    // the sample loop below assembles LITTLE-ENDIAN SIGNED PCM: a
    // big-endian or unsigned stream (AIFF/AU parse through the same
    // entry point) would pass a bits/channels-only check and yield
    // byte-swapped garbage RMS with no error
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian &&
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
      s"unexpected audio shape (need 16-bit mono little-endian signed PCM): $fmt")
    // enforce the in-memory bound BEFORE materializing: the WAV header
    // carries the frame count, so an over-long clip is rejected from
    // metadata alone, not after allocating its buffer
    val frameLen = ais.getFrameLength
    val maxFrames = fmt.getSampleRate.toLong * MaxClipSeconds
    // AudioInputStream reports NOT_SPECIFIED (-1) for containers whose
    // header carries no length; that is "length unknown", not "too
    // long", and deserves its own message — without metadata the bound
    // below cannot be enforced pre-allocation, so refuse the clip
    require(frameLen >= 0,
      s"audio header does not specify a frame length ($frameLen): the " +
        s"$MaxClipSeconds s windowing bound cannot be enforced from " +
        "metadata — re-encode with a length-bearing header")
    require(frameLen <= maxFrames,
      s"clip of $frameLen frames (~${frameLen / fmt.getSampleRate.toLong} s) " +
        s"exceeds the $MaxClipSeconds s in-memory windowing bound — " +
        "wavWindows materializes the whole decoded stream per task; " +
        "split the clip or add a streaming windower for long audio")
    val data = ais.readAllBytes()
    ais.close()
    val n = data.length / 2
    val step = (fmt.getSampleRate * FrameStepMs / 1000L).toInt
    val windows = (0 until n by step).zipWithIndex.map { case (start, idx) =>
      val end = math.min(start + step, n)
      var sum = 0.0
      var i = start
      while (i < end) {
        val lo = data(2 * i) & 0xff
        val hi = data(2 * i + 1).toInt
        val s = ((hi << 8) | lo).toShort
        sum += s.toDouble * s
        i += 1
      }
      val rms = math.sqrt(sum / math.max(end - start, 1))
      (idx, idx * FrameStepMs, math.rint(rms * 1000) / 1000)
    }
    (n.toLong, fmt.getSampleRate, fmt.getChannels, windows)
  }
}
