package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The image path is REAL: [[ImageCodec]] decodes and resizes PNG/BMP/GIF/
  * JPEG/WBMP payloads with the JDK's built-in `javax.imageio` + `java.awt
  * .image` (zero external dependencies), and the synthetic media table's
  * image-kind rows carry genuine PNG payloads. The audio path is REAL too:
  * [[AudioCodec]] decodes WAV/AIFF/AU metadata and resamples PCM via the
  * JDK's `javax.sound.sampled`, and audio-kind rows carry genuine WAV
  * payloads. Video — for which the JDK ships no codec — falls back to the
  * clearly marked deterministic [[StubCodec]]; swapping it for a real
  * decoder (e.g. javacv / a JNI codec) changes no plan shapes: decode is
  * embarrassingly parallel map-side work that scales with partition count.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_entropy: Double, histogram: Array[Double])

  case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** ===== REAL image codec (JDK ImageIO — PNG/BMP/GIF/JPEG/WBMP) =====
    * Decode and resize are genuine pixel operations; `None` means "no
    * installed reader understands this payload" and callers fall back to
    * [[StubCodec]] so non-image kinds keep flowing through the same
    * plumbing.
    */
  object ImageCodec {
    // never spill decode buffers to temp files on the executors
    javax.imageio.ImageIO.setUseCache(false)

    /** Real decoded (width, height); header-only read (no pixel decode). */
    def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          catch { case _: Exception => None }
          finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally if (iis != null) iis.close()
    }

    /** Decode → bilinear rescale to (w, h) → deterministic PNG re-encode.
      * None when the payload is not a decodable image.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).map { src =>
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          encodePng(dst)
        }
      } catch { case _: Exception => None }

    /** Deterministic PNG whose (w x h) RGB pixels derive from `seed` bytes —
      * gives the synthetic media table REAL decodable image payloads without
      * external fixtures.
      */
    def syntheticPng(seed: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val n = math.max(1, seed.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val b = seed((x + y * w) % n) & 0xff
          img.setRGB(x, y, (b << 16) | (((x * 31 + y * 17) & 0xff) << 8) | (b ^ 0x5a))
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** ===== REAL audio codec (JDK javax.sound.sampled — WAV/AIFF/AU) =====
    * Metadata decode and linear-interpolation resampling are genuine sample
    * operations on PCM payloads; `None` means "no installed reader
    * understands this payload" and callers fall back to [[StubCodec]].
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    case class AudioMeta(sampleRate: Int, channels: Int, frames: Long,
        durationMs: Long)

    /** Real (rate, channels, frames, duration) from the container header. */
    def decodeMeta(bytes: Array[Byte]): Option[AudioMeta] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val frames = in.getFrameLength
          if (frames <= 0 || f.getSampleRate <= 0) None
          else Some(AudioMeta(f.getSampleRate.toInt, f.getChannels, frames,
            frames * 1000L / f.getSampleRate.toLong))
        } finally in.close()
      } catch { case _: Exception => None }

    /** Decoded 16-bit mono samples + source rate (channels mean-mixed). */
    private def pcmMono(bytes: Array[Byte]): Option[(Array[Short], Int)] =
      try {
        val src = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = src.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(target, src)
          val raw = pcm.readAllBytes()
          val ch = f.getChannels
          val n = raw.length / (2 * ch)
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            var acc = 0
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              acc += ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
              c += 1
            }
            out(i) = (acc / ch).toShort
            i += 1
          }
          Some((out, f.getSampleRate.toInt))
        } finally src.close()
      } catch { case _: Exception => None }

    /** Linear-interpolation resample to `targetHz`, re-encoded as 16-bit
      * mono WAV. None when the payload is not decodable audio.
      */
    def resample(bytes: Array[Byte], targetHz: Int): Option[Array[Byte]] =
      pcmMono(bytes).map { case (samples, srcHz) =>
        val n = math.max(1, (samples.length.toLong * targetHz / srcHz).toInt)
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          val pos = i.toDouble * srcHz / targetHz
          val lo = math.min(samples.length - 1, pos.toInt)
          val hi = math.min(samples.length - 1, lo + 1)
          val frac = pos - lo
          out(i) = ((1 - frac) * samples(lo) + frac * samples(hi)).toShort
          i += 1
        }
        encodeWav(out, targetHz)
      }

    /** Real signal features over the decoded PCM: (sampleRate, nSamples,
      * RMS energy normalized to [0,1], zero-crossing rate in [0,1]).
      */
    def features(bytes: Array[Byte]): Option[(Int, Long, Double, Double)] =
      pcmMono(bytes).map { case (samples, rate) =>
        var sq = 0.0
        var crossings = 0L
        var i = 0
        while (i < samples.length) {
          val s = samples(i).toDouble
          sq += s * s
          if (i > 0 && ((samples(i - 1) < 0) != (samples(i) < 0))) crossings += 1
          i += 1
        }
        val n = math.max(1, samples.length)
        (rate, samples.length.toLong,
          math.sqrt(sq / n) / 32768.0,
          if (samples.length < 2) 0.0 else crossings.toDouble / (samples.length - 1))
      }

    /** Deterministic WAV whose 16-bit mono samples derive from `seed` —
      * gives the synthetic media table REAL decodable audio payloads.
      * Sample count is seed-proportional but capped (≤ half a second at
      * 8 kHz) so payload size stays bounded.
      */
    def syntheticWav(seed: Array[Byte], rate: Int = 8000): Array[Byte] = {
      val len = math.max(1, seed.length)
      val n = math.max(64, math.min(4000, len * 8))
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        val b = seed(i % len) & 0xff
        // seed-keyed mixture of two tones — real waveform, bit-deterministic
        val s = 0.6 * math.sin(2 * math.Pi * (200 + b * 4) * i / rate) +
          0.4 * math.sin(2 * math.Pi * (50 + (b ^ 0x37)) * i / rate)
        samples(i) = (s * 12000).toShort
        i += 1
      }
      encodeWav(samples, rate)
    }

    private[operators] def encodeWav(samples: Array[Short], rate: Int): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        rate.toFloat, 16, 1, 2, rate.toFloat, false)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** ===== STUB codec (video only) =====
    * Deterministic fake "decode" for payload kinds this container has no
    * codec for: dims parsed from the first bytes, resize = subsample. A real
    * audio/video implementation would replace only this object.
    */
  object StubCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      if (bytes.length < 8) (0, 0)
      else ((bytes(0) & 0x7f) + 1, (bytes(1) & 0x7f) + 1)

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // STUB: real impl would rescale samples; we deterministically subsample.
      val n = math.max(1, math.min(bytes.length, w * h))
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = bytes((i.toLong * bytes.length / n).toInt); i += 1 }
      out
    }
  }

  /** Deterministic synthetic media table derived from the shared `documents`
    * testdata — exercises the binary-column plumbing without external
    * fixtures. Image-kind rows carry a REAL PNG payload (pixels derived from
    * the document text, dims from the stub header so they stay in 1..128)
    * whose metadata comes from a genuine ImageIO decode; audio-kind rows
    * carry a REAL WAV payload (samples derived from the text) whose
    * duration comes from a genuine javax.sound decode (width/height carry
    * channels/sample-bits); video rows keep raw text bytes + stub metadata
    * (the JDK ships no video codec).
    */
  def syntheticMediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Engine.table(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
      .map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        kind match {
          case "image" =>
            val (w0, h0) = StubCodec.decodeDims(bytes)
            val png = ImageCodec.syntheticPng(bytes, math.max(1, w0), math.max(1, h0))
            // metadata from the real decode, not the generator's intent
            val (w, h) = ImageCodec.decodeDims(png).getOrElse((0, 0))
            MediaRow(id, kind, png, w, h, 0L)
          case "audio" =>
            val wav = AudioCodec.syntheticWav(bytes)
            val m = AudioCodec.decodeMeta(wav)
            MediaRow(id, kind, wav,
              m.map(_.channels).getOrElse(0), 16,
              m.map(_.durationMs).getOrElse(0L))
          case _ =>
            val (w, h) = StubCodec.decodeDims(bytes)
            MediaRow(id, kind, bytes, w, h, bytes.length.toLong * 10)
        }
      }
  }

  case class AudioFeatures(media_id: Long, sample_rate: Int, n_samples: Long,
      rms: Double, zero_cross_rate: Double)

  /** Audio feature extraction: REAL RMS energy + zero-crossing rate over
    * the decoded PCM of audio-kind rows (undecodable payloads drop, they
    * don't fake). Same partition-local batch shape as [[extractFeatures]].
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.flatMap { m =>
        AudioCodec.features(m.bytes).map { case (rate, n, rms, zcr) =>
          AudioFeatures(m.media_id, rate, n, rms, zcr)
        }
      }
    }
  }

  /** Audio pipeline stage: REAL linear-interpolation resample to `targetHz`
    * for decodable audio payloads (duration preserved, frame count scaled);
    * non-audio rows pass through untouched. Same mapPartitions batch shape
    * as [[resizeAll]].
    */
  def resampleAudio(media: Dataset[MediaRow], targetHz: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "audio") m
        else AudioCodec.resample(m.bytes, targetHz) match {
          case Some(wav) =>
            val meta = AudioCodec.decodeMeta(wav)
            m.copy(bytes = wav,
              duration_ms = meta.map(_.durationMs).getOrElse(m.duration_ms))
          case None => m // not decodable — leave payload untouched
        }
      }
    }
  }

  /** Per-partition batch feature extraction (histogram + entropy). This is
    * the mapPartitions shape a vectorized decode would use: one codec init
    * per partition, batched row iteration.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // codec/model init would happen once per partition here
      rows.map { m =>
        val hist = new Array[Double](16)
        var i = 0
        while (i < m.bytes.length) { hist((m.bytes(i) & 0xff) / 16) += 1; i += 1 }
        val n = math.max(1, m.bytes.length)
        var entropy = 0.0
        var j = 0
        while (j < 16) {
          val p = hist(j) / n
          if (p > 0) entropy -= p * math.log(p) / math.log(2)
          hist(j) = p
          j += 1
        }
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, entropy, hist)
      }
    }
  }

  /** Frame sampling for video-kind rows: every `stride`-th 64-byte chunk
    * becomes a "frame" (STUB chunking; a real impl samples keyframes).
    * 1 row -> N rows, the UDTF/Generator shape.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.bytes.grouped(64).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, idx) => Frame(m.media_id, idx, chunk) }
    }
  }

  /** Declarative metadata filters stay codegen'd columnar ops — binary
    * payloads are only touched inside the partition-local codec stage.
    */
  def filterByDims(media: Dataset[MediaRow], minW: Int, minH: Int): Dataset[MediaRow] =
    media.filter(col("width") >= minW && col("height") >= minH)
      .as[MediaRow](media.encoder)

  /** Resize pipeline stage: REAL bilinear rescale + PNG re-encode for
    * decodable image payloads; stub subsample for kinds without a codec.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val resized = ImageCodec.resize(m.bytes, w, h)
          .getOrElse(StubCodec.resize(m.bytes, w, h))
        m.copy(bytes = resized, width = w, height = h)
      }
    }
  }

  /** Media stats summary as a plain DataFrame op (joins features back to
    * metadata; demonstrates mixing typed and untyped APIs).
    */
  def mediaSummary(media: Dataset[MediaRow]): DataFrame = {
    val feats = extractFeatures(media)
    feats.groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("byte_entropy")), 4).as("avg_entropy"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("kind"))
  }
}
