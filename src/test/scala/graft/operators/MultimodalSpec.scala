package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMediaTable(spark, sfDir)

  test("synthetic media table has binary payloads and typed metadata") {
    val r = media.filter(col("media_id") === 0).head()
    assert(r.bytes.nonEmpty)
    assert(r.width > 0 && r.height > 0)
    assert(Seq("image", "audio", "video").contains(r.kind))
  }

  test("feature extraction yields normalized histograms and entropy") {
    val feats = Multimodal.extractFeatures(media.limit(100))
    val r = feats.head()
    assert(r.histogram.length === 16)
    assert(math.abs(r.histogram.sum - 1.0) < 1e-9)
    assert(r.byte_entropy >= 0 && r.byte_entropy <= 4.0) // 16 buckets -> max 4 bits
    assert(feats.count() === 100)
  }

  test("frame sampling explodes video rows into frames") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.count() > 0)
    // frames only from video-kind rows
    val videoIds = media.filter(col("kind") === "video")
      .select("media_id").as[Long].collect().toSet
    assert(frames.select("media_id").as[Long].collect().forall(videoIds))
    // frame indices are the sampled stride
    assert(frames.select("frame_idx").as[Int].collect().forall(_ % 2 == 0))
  }

  test("resize is deterministic and respects target dims (image + video)") {
    val resized = Multimodal.resizeAll(media.limit(10), 8, 8)
    val rows = resized.collect()
    // image rows: the resized payload is a REAL 8x8 PNG
    rows.filter(_.kind == "image").foreach { m =>
      assert(m.width == 8 && m.height == 8)
      assert(Multimodal.ImageCodec.decodeDims(m.bytes) === Some((8, 8)))
    }
    // video rows: the container is rebuilt and every frame is 8x8
    rows.filter(_.kind == "video").foreach { m =>
      assert(m.width == 8 && m.height == 8)
      val meta = Multimodal.VideoCodec.decodeMeta(m.bytes)
      assert(meta.map(v => (v.width, v.height)) === Some((8, 8)))
      Multimodal.VideoCodec.decodeFrames(m.bytes).foreach { case (_, jpeg) =>
        assert(Multimodal.ImageCodec.decodeDims(jpeg) === Some((8, 8)))
      }
    }
    // audio rows: no image semantics — payload passes through untouched
    assert(rows.filter(_.kind == "audio").forall(_.bytes.nonEmpty))
    val again = Multimodal.resizeAll(media.limit(10), 8, 8).collect()
    assert(rows.map(_.bytes.toSeq).toSeq === again.map(_.bytes.toSeq).toSeq)
  }

  test("VideoCodec round-trips MJPEG-in-AVI: meta, frames, real JPEG payloads") {
    val seed = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val avi = Multimodal.VideoCodec.syntheticMjpegAvi(seed)
    val meta = Multimodal.VideoCodec.decodeMeta(avi)
    assert(meta.isDefined, "own container must parse")
    assert(meta.get.nFrames >= 2)
    assert(meta.get.durationMs === meta.get.nFrames.toLong * 250, "4 fps")
    val frames = Multimodal.VideoCodec.decodeFrames(avi)
    assert(frames.size === meta.get.nFrames)
    assert(frames.map(_._1) === frames.indices)
    // every frame is a standalone, genuinely decodable JPEG with the
    // container's dimensions
    frames.foreach { case (_, jpeg) =>
      assert(Multimodal.ImageCodec.decodeDims(jpeg)
        === Some((meta.get.width, meta.get.height)))
    }
    // determinism
    assert(Multimodal.VideoCodec.syntheticMjpegAvi(seed).toSeq === avi.toSeq)
    // non-AVI payloads decode to nothing — drop, never fake
    assert(Multimodal.VideoCodec.decodeMeta(seed).isEmpty)
    assert(Multimodal.VideoCodec.decodeFrames(seed).isEmpty)
    // truncated container: parser stops cleanly, no exception
    val truncated = java.util.Arrays.copyOf(avi, avi.length / 2)
    Multimodal.VideoCodec.decodeFrames(truncated) // must not throw
  }

  test("sampleFrames extracts real frames at the stride") {
    import spark.implicits._
    val vids = media.filter(col("kind") === "video").limit(5).collect()
    val frames = Multimodal.sampleFrames(media.filter(col("kind") === "video").limit(5), stride = 2)
      .collect()
    val byId = frames.groupBy(_.media_id)
    vids.foreach { v =>
      val total = Multimodal.VideoCodec.decodeFrames(v.bytes).size
      val expected = (0 until total).count(_ % 2 == 0)
      assert(byId.get(v.media_id).map(_.length).getOrElse(0) === expected)
    }
    // each sampled frame decodes as an image
    frames.foreach { f =>
      assert(Multimodal.ImageCodec.decodeDims(f.bytes).isDefined)
    }
  }

  test("ImageCodec decodes a committed real PNG fixture (dims + resize)") {
    val path = java.nio.file.Paths.get(sys.props("user.dir"),
      "src", "test", "resources", "fixtures", "graft_fixture.png")
    val bytes = java.nio.file.Files.readAllBytes(path)
    assert(Multimodal.ImageCodec.decodeDims(bytes) === Some((13, 7)))
    val small = Multimodal.ImageCodec.resize(bytes, 8, 6)
    assert(small.isDefined)
    assert(Multimodal.ImageCodec.decodeDims(small.get) === Some((8, 6)))
    // deterministic re-encode
    assert(Multimodal.ImageCodec.resize(bytes, 8, 6).get.toSeq === small.get.toSeq)
    // non-image payloads are refused, not mangled
    assert(Multimodal.ImageCodec.decodeDims("not an image".getBytes) === None)
    assert(Multimodal.ImageCodec.resize("not an image".getBytes, 4, 4) === None)
  }

  test("synthetic image rows carry genuinely decodable PNG payloads") {
    val imgs = media.filter(col("kind") === "image").limit(20).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      assert(Multimodal.ImageCodec.decodeDims(m.bytes) === Some((m.width, m.height)),
        s"media_id=${m.media_id} payload is not a decodable PNG of its metadata dims")
    }
  }

  test("AudioCodec round-trips a synthetic WAV (meta + deterministic encode)") {
    val wav = Multimodal.AudioCodec.syntheticWav("hello audio".getBytes, rate = 8000)
    val meta = Multimodal.AudioCodec.decodeMeta(wav)
    assert(meta.isDefined, "generated WAV must decode")
    assert(meta.get.sampleRate === 8000)
    assert(meta.get.channels === 1)
    assert(meta.get.durationMs === meta.get.frames * 1000 / 8000)
    // bit-deterministic generation
    assert(Multimodal.AudioCodec.syntheticWav("hello audio".getBytes).toSeq === wav.toSeq)
    // non-audio payloads are refused, not mangled
    assert(Multimodal.AudioCodec.decodeMeta("not audio".getBytes) === None)
    assert(Multimodal.AudioCodec.resample("not audio".getBytes, 4000) === None)
  }

  test("AudioCodec resample halves the frame count at half the rate") {
    val wav = Multimodal.AudioCodec.syntheticWav("resample me please".getBytes, rate = 8000)
    val src = Multimodal.AudioCodec.decodeMeta(wav).get
    val down = Multimodal.AudioCodec.resample(wav, 4000)
    assert(down.isDefined)
    val dst = Multimodal.AudioCodec.decodeMeta(down.get).get
    assert(dst.sampleRate === 4000)
    // duration preserved within a millisecond of rounding
    assert(math.abs(dst.durationMs - src.durationMs) <= 1,
      s"duration drifted: ${src.durationMs}ms -> ${dst.durationMs}ms")
    assert(math.abs(dst.frames - src.frames / 2) <= 1)
  }

  test("synthetic audio rows carry genuinely decodable WAV payloads") {
    val auds = media.filter(col("kind") === "audio").limit(20).collect()
    assert(auds.nonEmpty)
    auds.foreach { m =>
      val meta = Multimodal.AudioCodec.decodeMeta(m.bytes)
      assert(meta.isDefined, s"media_id=${m.media_id} payload is not decodable audio")
      assert(meta.get.durationMs === m.duration_ms, "metadata must come from the real decode")
      assert(m.width === meta.get.channels && m.height === 16)
    }
  }

  test("AudioCodec features are exact on a constructed alternating wave") {
    // samples +1000,-1000,+1000,... : RMS = 1000/32768 exactly, every
    // adjacent pair crosses zero -> zcr = 1.0
    val samples = Array.tabulate(400)(i => if (i % 2 == 0) 1000 else -1000)
      .map(_.toShort)
    val wav = Multimodal.AudioCodec.encodeWav(samples, 8000)
    val Some((rate, n, rms, zcr)) = Multimodal.AudioCodec.features(wav)
    assert(rate === 8000 && n === 400L)
    assert(math.abs(rms - 1000.0 / 32768.0) < 1e-12)
    assert(zcr === 1.0)
    // constant signal: zero crossings
    val flat = Multimodal.AudioCodec.encodeWav(Array.fill(100)(500.toShort), 8000)
    val Some((_, _, _, zcrFlat)) = Multimodal.AudioCodec.features(flat)
    assert(zcrFlat === 0.0)
  }

  test("audioFeatures extracts real PCM features for every audio row") {
    import spark.implicits._
    val feats = Multimodal.audioFeatures(media.limit(60)).collect()
    val nAudio = media.limit(60).filter(col("kind") === "audio").count()
    assert(feats.length.toLong === nAudio, "every audio payload must decode")
    feats.foreach { f =>
      assert(f.sample_rate === 8000)
      assert(f.rms > 0 && f.rms < 1.0)
      assert(f.zero_cross_rate > 0 && f.zero_cross_rate < 1.0)
    }
  }

  test("resampleAudio rewrites audio payloads only, preserving the rest") {
    val out = Multimodal.resampleAudio(media.limit(30), 4000).collect()
    val in = media.limit(30).collect()
    out.zip(in).foreach { case (o, i) =>
      assert(o.media_id === i.media_id && o.kind === i.kind)
      if (o.kind == "audio") {
        assert(Multimodal.AudioCodec.decodeMeta(o.bytes).get.sampleRate === 4000)
      } else {
        assert(o.bytes.toSeq === i.bytes.toSeq, "non-audio rows must pass through")
      }
    }
  }

  test("mediaSummary aggregates per kind") {
    val s = Multimodal.mediaSummary(media).collect()
    assert(s.length === 3)
    assert(s.map(_.getAs[Long]("n")).sum === media.count())
  }
}
