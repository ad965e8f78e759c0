package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodedMedia, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeBatched: stub decode is correct and batching drops nothing") {
    implicit val s = spark
    val rows = (1L to 1000L).map { i =>
      MediaRow(i, Array.fill((i % 200).toInt + 2)((i % 251).toByte), "fake/rgb8")
    }
    val decoded = Multimodal.decodeBatched(rows.toDS().repartition(7),
      batchSize = 13).collect()
    assert(decoded.length == 1000) // batch boundaries × partitions lose no rows
    val d42 = decoded.find(_.media_id == 42L).get
    assert(d42.byte_len == 44)
    assert(d42.width == 42 && d42.height == 42)
    assert(d42.n_frames == 44 / 64 + 1)
  }

  test("decodeBatched handles empty and 1-byte payloads") {
    implicit val s = spark
    val rows = Seq(MediaRow(1L, Array.emptyByteArray, "f"),
      MediaRow(2L, Array[Byte](7), "f"))
    val d = Multimodal.decodeBatched(rows.toDS()).collect()
      .map(r => r.media_id -> r).toMap
    assert(d(1L).width == 0 && d(1L).height == 0 && d(1L).byte_len == 0)
    assert(d(2L).width == 7 && d(2L).height == 0)
  }

  test("sampleFrameIndexes: stride sampling of decoded frames") {
    val decoded = Seq(DecodedMedia(1L, 640, 64, 48, 10, "fake/video"))
      .toDF()
    val idx = Multimodal.sampleFrameIndexes(decoded, stride = 3)
      .select("frame_idx").as[Int].collect().toSeq
    assert(idx == Seq(0, 3, 6, 9))
  }

  test("HeaderCodec: BMP synth→sniff round-trips header fields") {
    for ((w, h) <- Seq((1, 1), (3, 7), (640, 480), (101, 1))) {
      val bytes = Multimodal.MediaSynth.bmp(w, h)
      assert(Multimodal.HeaderCodec.sniff(bytes)
        .contains((w, h, 1, "image/bmp")), s"bmp $w x $h")
    }
    // top-down BMP (negative height) decodes to |height|
    val td = Multimodal.MediaSynth.bmp(5, 4)
    val buf = java.nio.ByteBuffer.wrap(td)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4)
    assert(Multimodal.HeaderCodec.sniff(td).contains((5, 4, 1, "image/bmp")))
  }

  test("HeaderCodec: WAV synth→sniff round-trips fmt/data chunks") {
    for ((ch, sr, nf, bps) <- Seq((1, 8000, 0, 16), (2, 44100, 999, 16),
        (3, 16000, 1, 8))) {
      val bytes = Multimodal.MediaSynth.wav(ch, sr, nf, bps)
      assert(Multimodal.HeaderCodec.sniff(bytes)
        .contains((ch, bps, nf, "audio/wav")), s"wav $ch/$sr/$nf/$bps")
    }
  }

  test("HeaderCodec: text and truncated/corrupt payloads never misparse") {
    val text = "BM this text starts with the bmp magic but is not a bitmap padding padding"
      .getBytes("UTF-8")
    assert(Multimodal.HeaderCodec.sniff(text).isEmpty)
    assert(Multimodal.HeaderCodec.sniff(Array.emptyByteArray).isEmpty)
    val truncated = Multimodal.MediaSynth.bmp(10, 10).take(40)
    assert(Multimodal.HeaderCodec.sniff(truncated).isEmpty)
    // declared size disagrees with payload → rejected
    val padded = Multimodal.MediaSynth.bmp(10, 10) ++ Array[Byte](0)
    assert(Multimodal.HeaderCodec.sniff(padded).isEmpty)
    val wavNoData = Multimodal.MediaSynth.wav(2, 8000, 4).take(36)
    assert(Multimodal.HeaderCodec.sniff(wavNoData).isEmpty)
  }

  test("decodeSyntheticMedia: real parse matches the arithmetic spec") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.decodeSyntheticMedia(spark, docs).collect()
    assert(out.length == docs.count())
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(5) == "image/bmp")
        assert(r.getInt(2) == (id % 640).toInt + 1)  // width
        assert(r.getInt(3) == (id % 480).toInt + 1)  // height
        assert(r.getInt(4) == 1)                     // frames
      } else {
        assert(r.getString(5) == "audio/wav")
        assert(r.getInt(2) == (id % 3).toInt + 1)    // channels
        assert(r.getInt(3) == 16)                    // bits/sample
        assert(r.getInt(4) == (id % 100).toInt + 1)  // sample frames
      }
    }
  }

  test("decodeDocumentsAsMedia runs over real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Multimodal.decodeDocumentsAsMedia(spark, docs)
    assert(out.count() == docs.count())
    assert(out.columns.toSeq == Seq("media_id", "byte_len", "width",
      "height", "n_frames", "format"))
  }

  test("ImageIoCodec: PNG and JPEG synth→decode round-trip exact dims; " +
    "resize re-encodes at the target dims; non-images never misparse") {
    import graft.operators.Multimodal.ImageIoCodec
    for ((w, h) <- Seq((1, 1), (7, 5), (64, 48)); jpeg <- Seq(false, true)) {
      val bytes = ImageIoCodec.synth(w, h, seed = 42L, jpeg = jpeg)
      val Some((dw, dh, fmt)) = ImageIoCodec.decode(bytes)
      assert((dw, dh) == (w, h), s"dims for jpeg=$jpeg")
      assert(fmt == (if (jpeg) "image/jpeg" else "image/png"))
      val resized = ImageIoCodec.resize(bytes, w / 2 + 1, h / 2 + 1).get
      val Some((rw, rh, rfmt)) = ImageIoCodec.decode(resized)
      assert((rw, rh, rfmt) == (w / 2 + 1, h / 2 + 1, "image/png"))
    }
    // strict sniff: text, BMP, WAV, empty, and a corrupt body with a
    // valid PNG magic must not decode as an image
    assert(ImageIoCodec.decode("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageIoCodec.decode(Multimodal.MediaSynth.bmp(4, 4)).isEmpty)
    assert(ImageIoCodec.decode(Multimodal.MediaSynth.wav(1, 16000, 4)).isEmpty)
    assert(ImageIoCodec.decode(Array.emptyByteArray).isEmpty)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3, 4)
    assert(ImageIoCodec.decode(corrupt).isEmpty)
  }

  test("dHash: identical pixels hash identically across containers; " +
    "small edits land at small hamming; distinct seeds hash apart; " +
    "non-images are null") {
    import graft.operators.{Dedup, Multimodal => MM}
    import MM.ImageIoCodec
    val png = ImageIoCodec.synth(32, 24, seed = 7, jpeg = false)
    val png2 = ImageIoCodec.synth(32, 24, seed = 7, jpeg = false)
    assert(ImageIoCodec.dHash(png) == ImageIoCodec.dHash(png2))
    // a RESIZED copy (2x) keeps most structure: near, not equal
    val big = ImageIoCodec.resize(png, 64, 48).get
    val d = java.lang.Long.bitCount(
      ImageIoCodec.dHash(png).get ^ ImageIoCodec.dHash(big).get)
    assert(d <= 10, s"resized copy drifted too far: hamming $d")
    // distinct seeds: far apart
    val other = ImageIoCodec.synth(32, 24, seed = 8, jpeg = false)
    assert(java.lang.Long.bitCount(
      ImageIoCodec.dHash(png).get ^ ImageIoCodec.dHash(other).get) > 10)
    assert(ImageIoCodec.dHash("not an image".getBytes("UTF-8")).isEmpty)

    // the blocked pair search finds the planted near-dup (the same
    // image re-encoded as JPEG — lossy, so hamming is small not zero)
    val pairs = MM.imageNearDupCandidates(
      Seq((1L, png), (2L, ImageIoCodec.synth(32, 24, 7, jpeg = true)),
        (3L, other), (4L, "junk".getBytes("UTF-8")))
        .toDF("media_id", "content"),
      maxHamming = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted jpeg twin missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "undecodable payload must pair with nothing")
    // hammingCandidates on the simhash column still behaves (shared
    // blocking): recall guard rejects maxHamming >= 4
    intercept[IllegalArgumentException](
      Dedup.hammingCandidates(Seq((1L, 0L)).toDF("id", "sig"), "sig", "id",
        maxHamming = 4))
  }

  test("PcmCodec: square-wave samples fold to exact energy and " +
    "crossings; silence, junk, and images are handled") {
    import graft.operators.Multimodal.{MediaSynth, PcmCodec}
    // period 4, 12 frames: + + - - + + - - + + - -  (half = 2)
    val tone = PcmCodec.stats(MediaSynth.wavTone(12, 4, amplitude = 7)).get
    assert(tone.channels == 1 && tone.sample_rate == 16000)
    assert(tone.n_frames == 12)
    assert(tone.sum_squares == 12L * 49)
    // flips at t = 2,4,6,8,10 (t%4==0 or 2) -> 5 crossings
    assert(tone.zero_crossings == 5)
    // silence: zero energy, zero crossings (sign never changes)
    val silent = PcmCodec.stats(MediaSynth.wav(2, 8000, 10)).get
    assert(silent.channels == 2 && silent.sum_squares == 0L &&
      silent.zero_crossings == 0L)
    // non-audio payloads: None, never a crash
    assert(PcmCodec.stats("not audio".getBytes("UTF-8")).isEmpty)
    assert(PcmCodec.stats(MediaSynth.bmp(4, 4)).isEmpty)
    assert(PcmCodec.stats(Array.emptyByteArray).isEmpty)
  }

  test("decodeSyntheticImages / resizeSyntheticImages match the " +
    "arithmetic spec over real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    Multimodal.decodeSyntheticImages(spark, docs).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 64).toInt + 1)
      assert(r.getInt(2) == (id % 48).toInt + 1)
      assert(r.getInt(3) == 1)
      assert(r.getString(4) == (if (id % 2 == 0) "image/png" else "image/jpeg"))
    }
    Multimodal.resizeSyntheticImages(spark, docs).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == ((id % 64).toInt + 1) / 2 + 1)
      assert(r.getInt(2) == ((id % 48).toInt + 1) / 2 + 1)
      assert(r.getString(3) == "image/png")
    }
  }

  test("GifCodec: the container walk finds exactly the written frames, " +
    "round-trips deterministically, frames are mutually distinct, and " +
    "corrupt payloads fall through as None") {
    import graft.operators.Multimodal.GifCodec
    for (n <- 1 to 6) {
      val gif = GifCodec.synthAnimated(8, 7, nFrames = n, seed = 5L)
      assert(GifCodec.sniff(gif), "written payload must sniff as GIF")
      assert(GifCodec.frameCount(gif).contains(n),
        s"container walk must find all $n frames")
    }
    val a = GifCodec.synthAnimated(9, 6, nFrames = 4, seed = 12L)
    val b = GifCodec.synthAnimated(9, 6, nFrames = 4, seed = 12L)
    // write → quantize → decode is deterministic: two identical
    // syntheses hash frame-for-frame identically…
    assert(GifCodec.frameDHashes(a).get == GifCodec.frameDHashes(b).get)
    // …and the frames INSIDE one container are mutually distinct (each
    // carries a different seed mix — a walk that returned the first
    // frame n times would collapse them)
    val hs = GifCodec.frameDHashes(a).get
    assert(hs.distinct.length == hs.length, s"frames collided: $hs")
    // a different seed produces different frame content
    val c = GifCodec.frameDHashes(
      GifCodec.synthAnimated(9, 6, nFrames = 4, seed = 13L)).get
    assert(hs != c)
    // ladder contract: non-GIF and truncated payloads → None, no throw
    assert(GifCodec.frames("notagif".getBytes).isEmpty)
    assert(GifCodec.frames(a.take(20)).isEmpty)
    val png = graft.operators.Multimodal.ImageIoCodec.synth(8, 8, 1L, jpeg = false)
    assert(GifCodec.frames(png).isEmpty, "PNG must not enter the GIF walk")
  }

  test("gifFrameHashes: one row per embedded frame, frame-hash " +
    "grouping reproduces the class arithmetic") {
    import graft.operators.Multimodal
    import spark.implicits._
    val media = (0L until 92L).toDF("id").as[Long]
      .map { id =>
        val cls = id % 23
        Multimodal.MediaRow(id,
          Multimodal.GifCodec.synthAnimated((cls % 6).toInt + 5,
            (cls % 4).toInt + 5, nFrames = (cls % 5).toInt + 1, seed = cls),
          "image/gif")
      }.toDF("media_id", "content", "format")
    val fh = Multimodal.gifFrameHashes(media)
    val rows = fh.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // exactly the embedded frames: (cls % 5) + 1 rows per media
    val perMedia = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    (0L until 92L).foreach { id =>
      val n = (id % 23 % 5).toInt + 1
      assert(perMedia(id) == (0 until n), s"media $id frames ${perMedia(id)}")
    }
    // same (class, frame) → same hash; different classes never collide
    val byHash = rows.groupBy(_._3).view
      .mapValues(_.map(t => t._1 % 23).distinct).toMap
    byHash.foreach { case (h, classes) =>
      assert(classes.length == 1, s"hash $h crosses classes $classes")
    }
  }

  test("G711: encode/decode match the published reference points and " +
    "compress a WAV that PcmCodec expands exactly") {
    import graft.operators.Multimodal.{G711, MediaSynth, PcmCodec}
    // reference points computed with an independent implementation
    // (CPython audioop): byte values AND decoded linear levels
    assert(G711.muLawEncode(1000) == 0xCE.toByte)
    assert(G711.muLawDecode(0xCE.toByte) == 988)
    assert(G711.muLawDecode(G711.muLawEncode(-1000)) == -988)
    assert(G711.muLawDecode(0x00.toByte) == -32124)
    assert(G711.muLawDecode(0x80.toByte) == 32124)
    assert(G711.muLawDecode(0x7F.toByte) == 0)
    assert(G711.aLawEncode(1000) == 0xFA.toByte)
    assert(G711.aLawDecode(0xFA.toByte) == 1008)
    assert(G711.aLawDecode(G711.aLawEncode(-1000)) == -1008)
    assert(G711.aLawDecode(0x00.toByte) == -5504)
    assert(G711.aLawDecode(0xFF.toByte) == 848)
    assert(G711.aLawDecode(0x7F.toByte) == -848)
    // more audioop-pinned pairs across the segment range
    assert(G711.muLawDecode(G711.muLawEncode(5000)) == 5116)
    assert(G711.muLawDecode(G711.muLawEncode(30000)) == 30076)
    assert(G711.aLawDecode(G711.aLawEncode(5000)) == 4992)
    assert(G711.aLawDecode(G711.aLawEncode(30000)) == 30208)
    // companding is monotone: decoded levels never invert order
    val decoded = (-32768 to 32767 by 97)
      .map(v => G711.muLawDecode(G711.muLawEncode(v)))
    assert(decoded == decoded.sorted, "mu-law must be monotone")
    // a companded square-wave WAV folds to the quantized-level stats:
    // period 4, 12 frames at A=1000 → ±988 (µ-law) / ±1008 (A-law)
    val mu = PcmCodec.stats(MediaSynth.wavToneG711(12, 4)).get
    assert(mu.channels == 1 && mu.sample_rate == 8000 && mu.n_frames == 12)
    assert(mu.sum_squares == 12L * 988 * 988)
    assert(mu.zero_crossings == 5)
    val al = PcmCodec.stats(MediaSynth.wavToneG711(12, 4, aLaw = true)).get
    assert(al.sum_squares == 12L * 1008 * 1008)
    assert(al.zero_crossings == 5)
    // the compressed payload really is ~half the PCM size (1 B/sample)
    assert(MediaSynth.wavToneG711(100, 4).length == 44 + 100)
    assert(MediaSynth.wavTone(100, 4).length == 44 + 200)
  }

  test("AviCodec: the RIFF walk finds exactly the written MJPEG frames, " +
    "decodes them deterministically, and rejects corrupt payloads") {
    import graft.operators.Multimodal.{AviCodec, ImageIoCodec}
    for (n <- 1 to 4) {
      val avi = AviCodec.synthMjpeg(12, 10, nFrames = n, seed = 3L)
      assert(AviCodec.sniff(avi), "written payload must sniff as AVI")
      assert(AviCodec.frameCount(avi).contains(n),
        s"movi walk must find all $n frames")
    }
    val a = AviCodec.synthMjpeg(11, 9, nFrames = 3, seed = 21L)
    val b = AviCodec.synthMjpeg(11, 9, nFrames = 3, seed = 21L)
    assert(AviCodec.frameDHashes(a).get == AviCodec.frameDHashes(b).get)
    val hs = AviCodec.frameDHashes(a).get
    assert(hs.distinct.length == hs.length, s"frames collided: $hs")
    assert(hs != AviCodec.frameDHashes(
      AviCodec.synthMjpeg(11, 9, nFrames = 3, seed = 22L)).get)
    // decoded dims come from the REAL JPEG decode, not the header
    val f = AviCodec.frames(a).get
    assert(f.forall(img => img.getWidth == 11 && img.getHeight == 9))
    // ladder contract: non-AVI, truncated, and WAV (also RIFF!) → None
    assert(AviCodec.frames("notavi".getBytes).isEmpty)
    assert(AviCodec.frames(a.take(40)).isEmpty)
    assert(AviCodec.frames(
      graft.operators.Multimodal.MediaSynth.wav(1, 8000, 4)).isEmpty,
      "a RIFF/WAVE payload must not enter the AVI walk")
    assert(AviCodec.frames(ImageIoCodec.synth(8, 8, 1L, jpeg = true)).isEmpty)
  }

  test("TiffCodec: multi-page walk is exact and lossless — page hashes " +
    "equal the source-image hashes") {
    import graft.operators.Multimodal.{ImageIoCodec, TiffCodec}
    for (n <- 1 to 4) {
      val tif = TiffCodec.synthMulti(9, 8, nFrames = n, seed = 7L)
      assert(TiffCodec.sniff(tif))
      assert(TiffCodec.frameCount(tif).contains(n))
    }
    val t = TiffCodec.synthMulti(10, 7, nFrames = 3, seed = 31L)
    // losslessness: stored page i ≡ the source synth image for
    // seed*1000003 + i, bit-for-bit through the perceptual hash
    // (PNG is lossless too, so the PNG encoding of the same synth
    // pixels is a public-API stand-in for the raw source image)
    val expect = (0 until 3).map(i =>
      ImageIoCodec.dHash(
        ImageIoCodec.synth(10, 7, 31L * 1000003L + i, jpeg = false)).get)
    assert(TiffCodec.frameDHashes(t).get == expect)
    assert(TiffCodec.frames("nottiff".getBytes).isEmpty)
    assert(TiffCodec.frames(t.take(6)).isEmpty)
  }

  test("aviFrameHashes / tiffFrameHashes: per-frame rows reproduce the " +
    "class arithmetic over a planted corpus") {
    import graft.operators.Multimodal
    import spark.implicits._
    val avi = (0L until 57L).toDF("id").as[Long]
      .map { id =>
        val cls = id % 19
        Multimodal.MediaRow(id,
          Multimodal.AviCodec.synthMjpeg((cls % 7).toInt + 10,
            (cls % 5).toInt + 8, nFrames = (cls % 4).toInt + 1, seed = cls),
          "video/avi")
      }.toDF("media_id", "content", "format")
    val rows = Multimodal.aviFrameHashes(avi).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    (0L until 57L).foreach { id =>
      val n = (id % 19 % 4).toInt + 1
      val frames = rows.filter(_._1 == id).map(_._2).sorted.toSeq
      assert(frames == (0 until n), s"media $id frames $frames")
    }
    rows.groupBy(_._3).foreach { case (h, rs) =>
      assert(rs.map(_._1 % 19).distinct.length == 1,
        s"hash $h crosses classes")
    }
    val tif = (0L until 39L).toDF("id").as[Long]
      .map { id =>
        val cls = id % 13
        Multimodal.MediaRow(id,
          Multimodal.TiffCodec.synthMulti((cls % 6).toInt + 6,
            (cls % 4).toInt + 6, nFrames = (cls % 3).toInt + 1, seed = cls),
          "image/tiff")
      }.toDF("media_id", "content", "format")
    val trows = Multimodal.tiffFrameHashes(tif).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    trows.groupBy(_._3).foreach { case (h, rs) =>
      assert(rs.map(_._1 % 13).distinct.length == 1,
        s"tiff hash $h crosses classes")
    }
  }

  test("videoOverlapCandidates: exact Jaccard from planted frame " +
    "overlap; no candidates without a shared frame") {
    import graft.operators.Multimodal
    import spark.implicits._
    // videos 0,1 share 3 of 4 frames (J=3/5); 2 is a bit-identical
    // re-upload of 0 (J=1); 3 is disjoint (no candidate row at all)
    val seedSets = Seq(
      0L -> Seq(10L, 11L, 12L, 13L),
      1L -> Seq(11L, 12L, 13L, 14L),
      2L -> Seq(10L, 11L, 12L, 13L),
      3L -> Seq(90L, 91L, 92L, 93L))
    val media = seedSets.map { case (id, seeds) =>
      Multimodal.MediaRow(id,
        Multimodal.AviCodec.synthMjpegSeeds(12, 10, seeds), "video/avi")
    }.toDF("media_id", "content", "format")
    val got = Multimodal
      .videoOverlapCandidates(Multimodal.aviFrameHashes(media),
        minJaccardMicros = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((0L, 1L, 600000L), (0L, 2L, 1000000L),
      (1L, 2L, 600000L)))
    // threshold binds: at 0.7 only the exact re-upload survives
    val strict = Multimodal
      .videoOverlapCandidates(Multimodal.aviFrameHashes(media),
        minJaccardMicros = 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((0L, 2L)))
  }

  test("keyframes: first frame + scene boundaries; repeats never fire; " +
    "threshold binds") {
    import spark.implicits._
    // video 0: scenes AABB -> keyframes {0, 2}; video 1: all same ->
    // keyframe {0} only
    val media = Seq(
      (0L, Multimodal.AviCodec.synthMjpegSeeds(12, 10,
        Seq(5L, 5L, 9L, 9L)), "video/avi"),
      (1L, Multimodal.AviCodec.synthMjpegSeeds(12, 10,
        Seq(7L, 7L, 7L, 7L)), "video/avi"))
      .toDF("media_id", "content", "format")
    val fh = Multimodal.aviFrameHashes(media)
    val got = Multimodal.keyframes(fh, minHamming = 8)
      .as[(Long, Int)].collect().toSet
    assert(got == Set((0L, 0), (0L, 2), (1L, 0)))
    // an impossible threshold keeps only the first frames
    val strict = Multimodal.keyframes(fh, minHamming = 65)
      .as[(Long, Int)].collect().toSet
    assert(strict == Set((0L, 0), (1L, 0)))
    // threshold 1 fires on ANY change — same boundaries here (scenes
    // are byte-identical within, distinct-seed dHashes differ)
    val loose = Multimodal.keyframes(fh, minHamming = 1)
      .as[(Long, Int)].collect().toSet
    assert(loose == got)
  }

  test("framesAt: frame-index pushdown decodes ONLY wanted frames — " +
    "corrupting every skipped payload is invisible (they are never " +
    "read), corrupting a wanted one still fails, and the decoded " +
    "frames equal the full walk's") {
    import graft.operators.Multimodal.{AviCodec, ImageIoCodec}
    val clean = AviCodec.synthMjpegSeeds(12, 10,
      Seq(5L, 5L, 5L, 9L, 9L, 9L))
    val want = Set(0, 3)
    val full = AviCodec.frames(clean).get.map(ImageIoCodec.dHashOf)
    val pushed = AviCodec.framesAt(clean, want.contains).get
    assert(pushed.map(_._1) == Seq(0, 3),
      s"stream indexes must ride the pushdown: ${pushed.map(_._1)}")
    assert(pushed.map(p => ImageIoCodec.dHashOf(p._2)) ==
      Seq(full(0), full(3)),
      "pushdown frames must decode identically to the full walk")
    // corrupt every UNWANTED frame's JPEG payload (kill the SOI
    // marker): locate the movi data chunks exactly like the walk does
    def dataChunkOffsets(b: Array[Byte]): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      def i32(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      var off = 12
      while (off + 8 <= b.length) {
        val size = i32(off + 4)
        if (b(off) == 'L' && b(off + 1) == 'I' && size >= 4 &&
            b(off + 8) == 'm' && b(off + 9) == 'o') {
          var m = off + 12
          val end = off + 8 + size
          while (m + 8 <= end) {
            val ms = i32(m + 4)
            if (b(m + 2) == 'd'.toByte && b(m + 3) == 'c'.toByte)
              out += m + 8
            m += 8 + ms + (ms & 1)
          }
        }
        off += 8 + size + (size & 1)
      }
      out.result()
    }
    val offsets = dataChunkOffsets(clean)
    assert(offsets.length == 6, s"construction: 6 frames: $offsets")
    val corrupted = clean.clone()
    offsets.zipWithIndex.foreach { case (o, i) =>
      if (!want(i)) { corrupted(o) = 0; corrupted(o + 1) = 0 }
    }
    assert(AviCodec.frames(corrupted).isEmpty,
      "the full walk must reject the corrupt payloads")
    val survived = AviCodec.framesAt(corrupted, want.contains).get
    assert(survived.map(p => (p._1, ImageIoCodec.dHashOf(p._2))) ==
      Seq((0, full(0)), (3, full(3))),
      "skipped payloads must never be touched — the pushdown decodes " +
        "the wanted frames from the corrupt file bit-identically")
    // ...and a corrupt WANTED frame still fails loudly
    assert(AviCodec.framesAt(corrupted, Set(0, 1).contains).isEmpty,
      "a wanted frame that fails to decode must fail the walk")
    // the composed operator: decode only the keyframe set
    val media = Seq((42L, clean, "video/avi"))
      .toDF("media_id", "content", "format")
    val keys = Multimodal.keyframes(
      Multimodal.aviFrameHashes(media), minHamming = 8)
    val got = Multimodal.aviDecodeFramesAt(media, keys)
      .select("media_id", "frame_idx", "width", "height", "fhash")
      .as[(Long, Int, Int, Int, Long)].collect().toSet
    assert(got == Set((42L, 0, 12, 10, full(0)), (42L, 3, 12, 10, full(3))),
      s"two scenes -> two decoded keyframes: $got")
  }
}
