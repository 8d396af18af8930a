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
  * payloads. The video path is REAL for one honest container:
  * [[VideoCodec]] writes and parses MJPEG-in-AVI (the RIFF layout is
  * public and simple; each frame is a JPEG decoded by ImageIO), and
  * video-kind rows carry genuine AVI payloads whose frames decode
  * individually. Other codecs (H.264 etc.) would slot into the same
  * map-side shape via an external decoder; decode is embarrassingly
  * parallel work that scales with partition count.
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
    * installed reader understands this payload" and callers pass the row
    * through (or drop it) so non-image kinds keep flowing through the same
    * plumbing without being corrupted.
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
    * understands this payload" and callers pass the row through untouched.
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

  /** Seed-derived synthetic dimensions (1..128) for generated payloads. */
  private def seedDims(bytes: Array[Byte]): (Int, Int) =
    if (bytes.length < 8) (1, 1)
    else ((bytes(0) & 0x7f) + 1, (bytes(1) & 0x7f) + 1)

  /** ===== REAL video codec (MJPEG-in-AVI, pure JVM) =====
    * The AVI RIFF container is written and parsed directly from the public
    * format (RIFF 'AVI ' / LIST hdrl / avih / LIST movi / 00dc chunks, all
    * little-endian); each frame payload is a standalone JPEG handled by the
    * JDK's ImageIO. `None`/empty means "not an MJPEG AVI this parser
    * understands" — callers drop such rows, they never fake a result.
    */
  object VideoCodec {

    case class VideoMeta(width: Int, height: Int, nFrames: Int, durationMs: Long)

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    private def fccAt(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) 1 else 0
      val out = new Array[Byte](8 + body.length + pad)
      System.arraycopy(fourcc(id), 0, out, 0, 4)
      System.arraycopy(le32(body.length), 0, out, 4, 4)
      System.arraycopy(body, 0, out, 8, body.length)
      out
    }

    private def list(listType: String, bodies: Seq[Array[Byte]]): Array[Byte] =
      chunk("LIST", fourcc(listType) ++ bodies.flatten)

    /** A minimal single-stream MJPEG AVI around pre-encoded JPEG frames. */
    def encodeMjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
        fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need at least one frame and fps > 0")
      val usPerFrame = 1000000 / fps
      val maxFrame = frames.map(_.length).max
      val avih = Array(usPerFrame, maxFrame * fps, 0, 0, frames.size, 0, 1,
        maxFrame, w, h, 0, 0, 0, 0).flatMap(le32)
      val strh = fourcc("vids") ++ fourcc("MJPG") ++
        Array(0, 0, 0, 1 /*scale*/ , fps /*rate*/ , 0, frames.size,
          maxFrame, -1 /*quality*/ , 0).flatMap(le32) ++
        Array(0, w & 0xffff | (h << 16)).flatMap(le32) // rcFrame (4 shorts)
      val strf = Array(40, w, h, 1 | (24 << 16)).flatMap(le32) ++
        fourcc("MJPG") ++ Array(w * h * 3, 0, 0, 0, 0).flatMap(le32)
      val hdrl = list("hdrl", Seq(chunk("avih", avih),
        list("strl", Seq(chunk("strh", strh), chunk("strf", strf)))))
      val movi = list("movi", frames.map(f => chunk("00dc", f)))
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    private def isAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && fccAt(b, 0) == "RIFF" && fccAt(b, 8) == "AVI "

    /** Walk all chunks (recursing into LISTs), calling `f(id, listType?,
      * bodyOffset, bodySize)`. Tolerant of truncated tails.
      */
    private def walk(b: Array[Byte], from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fccAt(b, off)
        val size = rdLe32(b, off + 4)
        if (size < 0 || off + 8 + size > to) return // truncated — stop
        if (id == "LIST" && size >= 4)
          walk(b, off + 12, off + 8 + size)(f)
        else f(id, off + 8, size)
        off += 8 + size + (size % 2) // chunks are word-aligned
      }
    }

    /** Real (width, height, frame count, duration) from the avih header. */
    def decodeMeta(bytes: Array[Byte]): Option[VideoMeta] = {
      if (!isAvi(bytes)) return None
      var meta: Option[VideoMeta] = None
      walk(bytes, 12, bytes.length) { (id, off, size) =>
        if (id == "avih" && size >= 40 && meta.isEmpty) {
          val usPerFrame = rdLe32(bytes, off)
          val total = rdLe32(bytes, off + 16)
          meta = Some(VideoMeta(rdLe32(bytes, off + 32), rdLe32(bytes, off + 36),
            total, total.toLong * usPerFrame / 1000L))
        }
      }
      meta
    }

    /** The (index, JPEG payload) of every video frame chunk. */
    def decodeFrames(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
      if (!isAvi(bytes)) return Nil
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var idx = 0
      walk(bytes, 12, bytes.length) { (id, off, size) =>
        if (id.endsWith("dc") || id.endsWith("db")) {
          out += ((idx, java.util.Arrays.copyOfRange(bytes, off, off + size)))
          idx += 1
        }
      }
      out.result()
    }

    /** Decode every frame, bilinear-rescale, re-encode the container. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      val frames = decodeFrames(bytes)
      if (frames.isEmpty) return None
      val meta = decodeMeta(bytes)
      val fps = meta.filter(m => m.durationMs > 0 && m.nFrames > 0)
        .map(m => math.max(1, (m.nFrames * 1000L / m.durationMs).toInt))
        .getOrElse(4)
      val resized = frames.map { case (_, jpeg) =>
        ImageCodec.resize(jpeg, w, h).flatMap(png =>
          // keep frames JPEG so the container stays MJPEG
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png)))
            .map(encodeJpeg))
      }
      if (resized.exists(_.isEmpty)) None
      else Some(encodeMjpegAvi(resized.flatten, w, h, fps))
    }

    private[operators] def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Deterministic MJPEG AVI whose frames' pixels derive from `seed` —
      * gives the synthetic media table REAL decodable video payloads.
      */
    def syntheticMjpegAvi(seed: Array[Byte]): Array[Byte] = {
      val (w0, h0) = seedDims(seed)
      val (w, h) = (math.max(8, math.min(64, w0)), math.max(8, math.min(64, h0)))
      val nFrames = 2 + (math.max(0, seed.length) % 5)
      val n = math.max(1, seed.length)
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val b = seed((x + y * w + f * 7) % n) & 0xff
            img.setRGB(x, y,
              (b << 16) | (((x * 29 + y * 13 + f * 41) & 0xff) << 8) | (b ^ f))
            x += 1
          }
          y += 1
        }
        encodeJpeg(img)
      }
      encodeMjpegAvi(frames, w, h, fps = 4)
    }
  }

  /** Deterministic synthetic media table derived from the shared `documents`
    * testdata — exercises the binary-column plumbing without external
    * fixtures. Image-kind rows carry a REAL PNG payload (pixels derived from
    * the document text, dims from the stub header so they stay in 1..128)
    * whose metadata comes from a genuine ImageIO decode; audio-kind rows
    * carry a REAL WAV payload (samples derived from the text) whose
    * duration comes from a genuine javax.sound decode (width/height carry
    * channels/sample-bits); video rows carry a REAL MJPEG-in-AVI payload
    * (frames derived from the text, JPEG-encoded via ImageIO) whose
    * width/height/duration come from a genuine RIFF container decode.
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
            val (w0, h0) = seedDims(bytes)
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
            val avi = VideoCodec.syntheticMjpegAvi(bytes)
            // metadata from the real container decode, not generator intent
            val m = VideoCodec.decodeMeta(avi)
            MediaRow(id, kind, avi, m.map(_.width).getOrElse(0),
              m.map(_.height).getOrElse(0), m.map(_.durationMs).getOrElse(0L))
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

  /** Frame sampling for video-kind rows: REAL container parse — every
    * `stride`-th frame chunk of the MJPEG AVI becomes a row whose payload
    * is a standalone decodable JPEG. 1 row -> N rows, the UDTF/Generator
    * shape; payloads no parser understands yield no rows (drop, not fake).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      VideoCodec.decodeFrames(m.bytes)
        .filter(_._1 % stride == 0)
        .map { case (idx, jpeg) => Frame(m.media_id, idx, jpeg) }
    }
  }

  /** Declarative metadata filters stay codegen'd columnar ops — binary
    * payloads are only touched inside the partition-local codec stage.
    */
  def filterByDims(media: Dataset[MediaRow], minW: Int, minH: Int): Dataset[MediaRow] =
    media.filter(col("width") >= minW && col("height") >= minH)
      .as[MediaRow](media.encoder)

  /** Resize pipeline stage: REAL bilinear rescale for decodable payloads —
    * images re-encode as PNG, videos re-encode per-frame and rebuild the
    * MJPEG container. Payloads no codec understands pass through untouched
    * (metadata unchanged) rather than being silently corrupted.
    */
  def resizeAll(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val resized =
          if (m.kind == "video") VideoCodec.resize(m.bytes, w, h)
          else ImageCodec.resize(m.bytes, w, h)
        resized.map(b => m.copy(bytes = b, width = w, height = h)).getOrElse(m)
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
