package graft.ext

import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "abc", 3L), (1L, "defg", 4L), (2L, "hijkl", 5L), (3L, "", 0L)
  ).toDF("doc_id", "text", "n_chars")

  test("media table: binary payload column + typed metadata struct") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("content").dataType === BinaryType)
    val metaFields = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaFields.fieldNames.toSeq ===
      Seq("width", "height", "channels", "n_frames", "format"))
    val kinds = m.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds === Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
  }

  test("feature extraction is deterministic and byte-faithful") {
    val feats = Multimodal.mediaFeatures(Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes === 3)
    // "abc" = 97,98,99 -> mean 98
    assert(feats(0L).mean_intensity === 98.0)
    assert(feats(3L).n_bytes === 0 && feats(3L).mean_intensity === 0.0)
    // determinism: second run identical phash
    val again = Multimodal.mediaFeatures(Multimodal.mediaTable(docs))
      .collect().map(f => f.media_id -> f.phash).toMap
    assert(again === feats.view.mapValues(_.phash).toMap)
  }

  test("batching hands the codec bounded batches without dropping rows") {
    val many = spark.range(0, 1000)
      .selectExpr("id AS doc_id", "repeat('x', 10) AS text", "10 AS n_chars")
    val n = Multimodal.mediaFeatures(Multimodal.mediaTable(many), batchSize = 7).count()
    assert(n === 1000)
  }

  test("feature extraction adds no shuffle (partitioning preserved)") {
    val media = Multimodal.mediaTable(docs).repartition(3)
    val plan = Multimodal.mediaFeatures(media).queryExecution.executedPlan.toString
    // exactly one Exchange: the explicit repartition; extraction adds none
    assert(plan.split("Exchange").length - 1 === 1, s"unexpected shuffle:\n$plan")
    assert(Multimodal.mediaFeatures(media).rdd.getNumPartitions === 3)
  }

  test("resize updates metadata consistently") {
    val r = Multimodal.resizeTo(Multimodal.mediaTable(docs), 224, 224)
      .select("meta.width", "meta.height", "meta.format").collect().head
    assert(r.getInt(0) === 224 && r.getInt(1) === 224)
    assert(r.getString(2).endsWith("-resized"))
  }

  test("frame sampling emits every nth frame for video rows only") {
    val f = Multimodal.frameSample(Multimodal.mediaTable(docs), nth = 2).collect()
    // only doc 2 is video; n_frames = 5 % 240 + 1 = 6 -> frames 0,2,4
    assert(f.map(_.getLong(0)).toSet === Set(2L))
    assert(f.map(_.getInt(2)).sorted === Array(0, 2, 4))
  }

  test("parseImageHeader reads real PNG/JPEG/GIF/BMP headers, rejects junk") {
    // PNG: sig + IHDR, 640x480 big-endian
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseImageHeader(png) === Some(("png", 640, 480)))
    // JPEG: SOI, APP0 segment (skipped), SOF0 with height 480 width 640
    val jpeg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4
      0xff, 0xc0, 0x00, 0x0b, 8, 0x01, 0xe0, 0x02, 0x80, 3, 0, 0, 0)
      .map(_.toByte)
    assert(Multimodal.parseImageHeader(jpeg) === Some(("jpeg", 640, 480)))
    // GIF: little-endian 320x200
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xc8, 0x00, 0, 0, 0, 0).map(_.toByte)
    assert(Multimodal.parseImageHeader(gif) === Some(("gif", 320, 200)))
    // BMP: 'BM', biSize 40 at 14, width at 18 LE, NEGATIVE height
    // (top-down) at 22
    val bmp = Array.fill[Byte](26)(0)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(14) = 40
    bmp(18) = 0x20; bmp(19) = 0x03                  // 800
    bmp(22) = 0xa8.toByte; bmp(23) = 0xfd.toByte    // -600 LE
    bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte
    assert(Multimodal.parseImageHeader(bmp) === Some(("bmp", 800, 600)))
    // junk / truncated / corrupt payloads
    assert(Multimodal.parseImageHeader("not an image".getBytes) === None)
    assert(Multimodal.parseImageHeader(png.take(12)) === None)
    assert(Multimodal.parseImageHeader(Array[Int](0xff, 0xd8, 0xff).map(_.toByte)) === None)
    assert(Multimodal.parseImageHeader(Array.emptyByteArray) === None)
    // TEXT that merely starts with 'BM' must not classify as an image
    assert(Multimodal.parseImageHeader(
      "BMW sales rose sharply this quarter everywhere".getBytes) === None)
    // JPEG whose SOF declares too-short a segment: reject, don't read
    // the next segment's bytes as dimensions
    val badSof = Array[Int](0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02,
      0xff, 0xfe, 0x00, 0x10, 1, 2, 3, 4, 5, 6, 7, 8).map(_.toByte)
    assert(Multimodal.parseImageHeader(badSof) === None)
    // PNG with zero width: corrupt, not a 0-pixel image
    val zeroPng = png.clone()
    zeroPng(16) = 0; zeroPng(17) = 0; zeroPng(18) = 0; zeroPng(19) = 0
    assert(Multimodal.parseImageHeader(zeroPng) === None)
  }

  test("headered media table round-trips dims through actual bytes") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val dims = Multimodal.imageHeaderDims(Multimodal.mediaTableHeadered(docs))
      .collect()
    val byKind = dims.groupBy(_.media_id.get % 3)
    // image (id%3==0) -> png with the meta formulas; video (2) -> gif;
    // audio (1) -> unparseable
    byKind(0L).foreach { d =>
      assert(d.format === Some("png"))
      assert(d.width === Some(((d.media_id.get % 64 + 1) * 16).toInt))
      assert(d.height === Some(((d.media_id.get % 48 + 1) * 16).toInt))
    }
    byKind(2L).foreach(d => assert(d.format === Some("gif")))
    byKind(1L).foreach(d => assert(d.format === None && d.width === None))
  }

  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def wav(channels: Int, rate: Int, bits: Int, data: Array[Byte],
                  declaredLen: Option[Long] = None,
                  preChunk: Array[Byte] = Array.empty,
                  audioFormat: Int = 1): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32b(16) ++ le16b(audioFormat) ++
      le16b(channels) ++ le32b(rate) ++ le32b(rate.toLong * channels * bits / 8) ++
      le16b(channels * bits / 8) ++ le16b(bits)
    val dataChunk = "data".getBytes ++
      le32b(declaredLen.getOrElse(data.length.toLong)) ++ data
    val body = "WAVE".getBytes ++ preChunk ++ fmt ++ dataChunk
    // RIFF size covers everything after the 8-byte RIFF header,
    // INCLUDING the WAVE form tag
    "RIFF".getBytes ++ le32b(body.length.toLong) ++ body
  }

  test("parseWavHeader reads a canonical PCM header back from bytes") {
    val b = wav(2, 44100, 16, Array.fill(1000)(7.toByte))
    assert(Multimodal.parseWavHeader(b) === Some((2, 44100, 16, 1000L)))
  }

  test("parseWavHeader walks past a leading LIST chunk (odd size padded)") {
    val list = "LIST".getBytes ++ le32b(3) ++ Array[Byte](1, 2, 3, 0) // padded
    val b = wav(1, 8000, 8, Array.fill(80)(1.toByte), preChunk = list)
    assert(Multimodal.parseWavHeader(b) === Some((1, 8000, 8, 80L)))
  }

  test("parseWavHeader is honest about a truncated data chunk") {
    val b = wav(2, 44100, 16, Array.fill(10)(0.toByte),
      declaredLen = Some(100L))
    assert(Multimodal.parseWavHeader(b) === Some((2, 44100, 16, 10L)))
  }

  test("parseWavHeader rejects non-PCM, non-RIFF, and image payloads") {
    assert(Multimodal.parseWavHeader(
      wav(2, 44100, 32, Array.fill(8)(0.toByte), audioFormat = 3)) === None)
    assert(Multimodal.parseWavHeader("not a riff file at all".getBytes) === None)
    assert(Multimodal.parseWavHeader(Array.emptyByteArray) === None)
  }

  test("wavHeaderMeta parses audio rows, nulls image/video rows") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val metas = Multimodal.wavHeaderMeta(Multimodal.mediaTableHeadered(docs))
      .collect()
    val byKind = metas.groupBy(_.media_id.get % 3)
    byKind(1L).foreach { m => // audio
      assert(m.channels === Some(2))
      assert(m.sample_rate === Some(((m.media_id.get % 64 + 1) * 1600).toInt))
      assert(m.bits === Some(16))
      val byteRate = m.sample_rate.get.toLong * 4
      assert(m.duration_ms === Some(m.data_bytes.get * 1000L / byteRate))
    }
    byKind(0L).foreach(m => assert(m.channels === None)) // png rows
    byKind(2L).foreach(m => assert(m.channels === None)) // gif rows
  }

  test("binaryFile ingest reads payload bytes; glob prunes at listing") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.jpg"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.wav"),
      Array[Byte](9, 9))
    val all = Multimodal.readBinaryFiles(spark, dir)
    assert(all.count() === 2)
    val jpgs = Multimodal.readBinaryFiles(spark, dir, Some("*.jpg")).collect()
    assert(jpgs.length === 1)
    assert(jpgs.head.getAs[Array[Byte]]("content").toSeq === Seq[Byte](1, 2, 3))
    assert(jpgs.head.getAs[Long]("length") === 3L)
  }

  // ---- image perceptual hashing -------------------------------------

  /** Re-encode the same pixel content through a DIFFERENT codec via the
    * JDK: decode `bytes`, optionally shift brightness, write as
    * `format` (png/bmp/gif). Byte-level digests see a new file;
    * perceptual hashes must not. */
  private def reencode(bytes: Array[Byte], format: String,
                       shift: Int = 0): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      def c(sh: Int) = math.min(255, math.max(0, ((p >> sh) & 0xff) + shift))
      out.setRGB(x, y, (c(16) << 16) | (c(8) << 8) | c(0))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(out, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("perceptual hash survives re-encoding and uniform brightness shifts") {
    val bmpA = Multimodal.buildBmp(16, 16,
      (x, y, c) => Multimodal.pixelValue(7L, x, y, c))
    val bmpB = Multimodal.buildBmp(16, 16,
      (x, y, c) => Multimodal.pixelValue(8L, x, y, c)) // different content
    val Some((dA, aA)) = Multimodal.perceptualHashes(bmpA)
    val Some((dB, aB)) = Multimodal.perceptualHashes(bmpB)
    // a PNG re-encode of the same pixels: different bytes, same hashes
    val pngA = reencode(bmpA, "png")
    assert(!java.util.Arrays.equals(pngA, bmpA))
    assert(Multimodal.perceptualHashes(pngA) === Some((dA, aA)))
    // +8 uniform brightness (a levels tweak): hashes exactly invariant
    val brighter = reencode(bmpA, "png", shift = 8)
    assert(Multimodal.perceptualHashes(brighter) === Some((dA, aA)))
    // genuinely different content: far apart in Hamming space
    assert(java.lang.Long.bitCount(dA ^ dB) > 10,
      s"distinct images must not collide: ${java.lang.Long.bitCount(dA ^ dB)}")
    assert(java.lang.Long.bitCount(aA ^ aB) > 5)
    // undecodable payloads: None, not garbage
    assert(Multimodal.perceptualHashes("not an image".getBytes) === None)
    assert(Multimodal.perceptualHashes(Array.emptyByteArray) === None)
  }

  test("image phash dedup finds planted re-encoded duplicates end-to-end") {
    // bmpImageTable plants ids ≡ 3 (mod 7) as brightness-shifted
    // re-encodings of their predecessor; the fingerprint + banded
    // Hamming pipeline must find exactly those pairs
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.bmpImageTable(real)
    val fp = Multimodal.imagePerceptualHash(media).toDF()
    val pairs = Dedup.hammingPairs64(fp, "media_id", "dhash", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = real.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = ids.filter(i => i % 7 == 3 && ids.contains(i - 1))
      .map(i => (i - 1, i))
    assert(pairs.map(p => (p._1, p._2)).toSet === expected,
      s"got ${pairs.length} pairs, expected ${expected.size}")
    pairs.foreach { case (_, _, hm) =>
      assert(hm === 0, "a uniform brightness shift must not move the dHash")
    }
    // null ids / undecodable rows don't poison the pipeline
    val withJunk = media.unionByName(
      Seq((999999L, "definitely not an image".getBytes))
        .toDF("media_id", "content"))
    val fpJunk = Multimodal.imagePerceptualHash(withJunk).toDF()
    assert(fpJunk.filter($"media_id" === 999999L)
      .collect().head.isNullAt(1), "undecodable row must fingerprint null")
    assert(Dedup.hammingPairs64(fpJunk, "media_id", "dhash", 2)
      .filter($"id_a" === 999999L || $"id_b" === 999999L).count() === 0L)
  }

  // --- audio perceptual fingerprint (round 9) -------------------------

  /** A clip with amplitude envelope `amp(seg)` at the given rate/gain
    * shift — the spec's own generator, independent of wavAudioTable. */
  private def clip(rate: Int, secs: Double, shift: Int,
                   amp: Int => Int): Array[Byte] = {
    val n = (rate * secs).toInt
    val samples = Array.tabulate(n) { i =>
      val a = amp((i.toLong * 65 / n).toInt) >> shift
      (if ((i / 8) % 2 == 0) a else -a).toShort
    }
    Multimodal.buildWav(rate, samples)
  }

  test("audio fingerprint survives resampling and uniform gain change") {
    // avalanche-mixed, NOT affine-in-seed: an affine map keeps adjacent
    // ORDERING across seeds and two "different" clips fingerprint
    // nearly equal (the CLAUDE.md wrap lesson, re-learned here first)
    def amp(seed: Long)(seg: Int): Int = {
      var h = seed * 0x9E3779B97F4A7C15L + seg * 0xC2B2AE3D27D4EB4FL
      h ^= h >>> 31; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      2 * (1000 + math.floorMod(h, 7000L).toInt)
    }
    val a = clip(8000, 0.4, 0, amp(1L))
    val resampled = clip(4000, 0.4, 0, amp(1L)) // half rate
    val quieter = clip(8000, 0.4, 1, amp(1L)) // half gain
    val both = clip(2000, 0.4, 1, amp(1L))
    val other = clip(8000, 0.4, 0, amp(2L)) // different content
    val Some(fa) = Multimodal.audioFingerprint(a)
    assert(Multimodal.audioFingerprint(resampled) === Some(fa),
      "resampling must not move the energy-envelope fingerprint")
    assert(Multimodal.audioFingerprint(quieter) === Some(fa),
      "uniform gain must factor out of energy ratios")
    assert(Multimodal.audioFingerprint(both) === Some(fa))
    val Some(fo) = Multimodal.audioFingerprint(other)
    assert(java.lang.Long.bitCount(fa ^ fo) > 10,
      s"distinct clips must not collide: ${java.lang.Long.bitCount(fa ^ fo)}")
    // the byte level sees four DIFFERENT files
    assert(Set(a.length, resampled.length).size == 2)
    // non-audio / truncated payloads: None
    assert(Multimodal.audioFingerprint("not audio".getBytes) === None)
    assert(Multimodal.audioFingerprint(
      Multimodal.buildWav(8000, new Array[Short](10))) === None,
      "clips shorter than the segment grid have no stable envelope")
  }

  test("audio phash dedup finds planted re-encoded duplicates end-to-end") {
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.wavAudioTable(real)
    // payloads are REAL WAVs: header parser agrees with the generator
    val metaRow = Multimodal.wavHeaderMeta(media).toDF()
      .filter($"media_id" === 7L).collect().head
    assert(metaRow.getInt(1) == 1 && metaRow.getInt(2) == 8000 &&
      metaRow.getInt(3) == 16)
    val fp = Multimodal.audioPerceptualHash(media).toDF()
    val pairs = Dedup.hammingPairs64(fp, "media_id", "afp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ids = real.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = ids.filter(i => i % 7 == 3 && ids.contains(i - 1))
      .map(i => (i - 1, i))
    assert(pairs.map(p => (p._1, p._2)).toSet === expected,
      s"got ${pairs.length} pairs, expected ${expected.size}")
    pairs.foreach { case (_, _, hm) =>
      assert(hm === 0, "re-encoding must not move the energy envelope")
    }
  }

  test("parseMp4Meta: v0 and v1/largesize layouts round-trip the build") {
    for (v1 <- Seq(false, true)) {
      val ts = if (v1) 90000L else 600L
      val b = Multimodal.buildMp4(nFrames = 49, timescale = ts, fps = 24,
        codec = "avc1", w = 320, h = 240, v1 = v1)
      val m = Multimodal.parseMp4Meta(b)
        .getOrElse(fail(s"v1=$v1 must parse"))
      assert(m.major_brand === "isom")
      assert(m.timescale === ts)
      // two stts runs (1 + 48) must SUM, not first-entry-read
      assert(m.n_frames === 49L)
      assert(m.duration_ms === 49L * 1000 / 24) // floor(2041.66) = 2041
      assert(m.codec === "avc1")
      assert((m.width, m.height) === ((320, 240)))
    }
    // single-run stts (nFrames = 1)
    val one = Multimodal.parseMp4Meta(Multimodal.buildMp4(1, 600L, 24,
      "hev1", 16, 16)).get
    assert(one.n_frames === 1L && one.codec === "hev1")
  }

  test("parseMp4Meta: truncation and non-video payloads → None") {
    val full = Multimodal.buildMp4(10, 600L, 24, "avc1", 64, 64)
    // cut anywhere: mid-ftyp, mid-moov, one byte short — never throws
    for (cut <- Seq(0, 3, 11, 40, full.length / 2, full.length - 1))
      assert(Multimodal.parseMp4Meta(full.take(cut)).isEmpty, s"cut=$cut")
    assert(Multimodal.parseMp4Meta(null).isEmpty)
    // a real WAV is a valid RIFF but not BMFF
    val wav = Multimodal.buildWav(8000, Array.fill[Short](800)(100))
    assert(Multimodal.parseMp4Meta(wav).isEmpty)
    // an audio-only BMFF (hdlr != vide) has no video trak
    val audioOnly = {
      val b = Multimodal.buildMp4(10, 600L, 24, "avc1", 64, 64)
      // corrupt the hdlr handler tag in place: find 'vide' and flip it
      val i = b.indexOfSlice("vide".getBytes("US-ASCII"))
      val c = b.clone(); c(i) = 's'.toByte; c
    }
    assert(Multimodal.parseMp4Meta(audioOnly).isEmpty)
  }

  test("mp4VideoTable → mp4Meta: formulas recovered, truncated ids null") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.mp4Meta(Multimodal.mp4VideoTable(docs))
      .collect().map(r => r.media_id.get -> r).toMap
    val src = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === src.size)
    src.foreach { case (id, nChars) =>
      val r = out(id)
      if (id % 11 == 7) assert(r.n_frames.isEmpty && r.codec.isEmpty,
        s"truncated id $id must be all-null")
      else {
        assert(r.n_frames.contains(nChars % 240 + 1), s"id $id")
        assert(r.timescale.contains(if (id % 11 == 3) 90000L else 600L))
        assert(r.codec.contains(if (id % 5 == 2) "hev1" else "avc1"))
        assert(r.width.contains(((id % 64) + 1).toInt * 16))
      }
    }
  }

  test("parseMp4SampleStats: remux invariance — same stream re-containered " +
      "(v1/largesize, new timescale, co64) keeps the fingerprint while " +
      "every container byte a digest sees changes") {
    val sizes = Array.tabulate(49)(i => 800 + ((5L * (i + 7)) % 4093).toInt)
    val base = Multimodal.buildMp4(49, 600L, 24, "avc1", 320, 240,
      v1 = false, sampleSizes = sizes, co64 = false)
    val remux = Multimodal.buildMp4(49, 90000L, 24, "avc1", 320, 240,
      v1 = true, sampleSizes = sizes, co64 = true)
    assert(!java.util.Arrays.equals(base, remux),
      "the containers must differ byte-wise (q15 would miss this pair)")
    val a = Multimodal.parseMp4SampleStats(base).get
    val b = Multimodal.parseMp4SampleStats(remux).get
    assert(a.fingerprint === b.fingerprint)
    assert(a.n_samples === 49L && b.n_samples === 49L)
    assert(a.total_bytes === sizes.map(_.toLong).sum)
    assert(a.max_sample === sizes.max.toLong)
    assert(a.n_chunks === 1L && b.n_chunks === 1L)
    // a different stream (one size off) must NOT share the fingerprint
    val other = sizes.clone(); other(20) += 1
    val c = Multimodal.parseMp4SampleStats(Multimodal.buildMp4(49, 600L, 24,
      "avc1", 320, 240, sampleSizes = other)).get
    assert(c.fingerprint !== a.fingerprint)
  }

  test("parseMp4SampleStats: fixed-size stsz (CBR form) fingerprints " +
      "identically to the same sizes written as an entry table") {
    // the builder emits the fixed form when all sizes agree — craft the
    // table form by varying then equalizing via two distinct builds
    val flat = Array.fill(10)(1234)
    val fixedForm = Multimodal.buildMp4(10, 600L, 24, "avc1", 64, 64,
      sampleSizes = flat)
    val s = Multimodal.parseMp4SampleStats(fixedForm).get
    assert(s.n_samples === 10L && s.total_bytes === 12340L &&
      s.max_sample === 1234L)
    // same sequence mixed by hand through the public FNV spec: the
    // fixed-form parse must equal the per-entry mix
    var fp = 0xcbf29ce484222325L
    flat.foreach { v =>
      var k = 24
      while (k >= 0) {
        fp ^= (v.toLong >> k) & 0xffL; fp *= 0x100000001b3L; k -= 8
      }
    }
    assert(s.fingerprint === fp)
  }

  test("parseMp4SampleStats: dirty input → None, never a throw") {
    val sizes = Array.tabulate(12)(i => 900 + i)
    val full = Multimodal.buildMp4(12, 600L, 24, "avc1", 64, 64,
      sampleSizes = sizes)
    for (cut <- Seq(0, 3, 11, 40, full.length / 2, full.length - 20))
      assert(Multimodal.parseMp4SampleStats(full.take(cut)).isEmpty,
        s"cut=$cut")
    assert(Multimodal.parseMp4SampleStats(null).isEmpty)
    // legacy empty sample tables carry no stream identity
    assert(Multimodal.parseMp4SampleStats(
      Multimodal.buildMp4(10, 600L, 24, "avc1", 64, 64)).isEmpty)
    // a WAV is not BMFF
    assert(Multimodal.parseMp4SampleStats(
      Multimodal.buildWav(8000, Array.fill[Short](80)(1))).isEmpty)
  }

  test("mp4 sample-table law: build→parse recovers count/sum/max and " +
      "the fingerprint is container-invariant, for arbitrary sizes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 16) {
      val sizes = Array.fill(1 + rnd.nextInt(60))(1 + rnd.nextInt(1 << 20))
      val base = Multimodal.parseMp4SampleStats(Multimodal.buildMp4(
        sizes.length, 600L, 24, "avc1", 64, 64, sampleSizes = sizes)).get
      assert(base.n_samples === sizes.length.toLong)
      assert(base.total_bytes === sizes.map(_.toLong).sum)
      assert(base.max_sample === sizes.max.toLong)
      // remux invariance holds for ANY size sequence, both stsz forms
      val remux = Multimodal.parseMp4SampleStats(Multimodal.buildMp4(
        sizes.length, 90000L, 24, "hev1", 128, 128, v1 = true,
        sampleSizes = sizes, co64 = true)).get
      assert(remux.fingerprint === base.fingerprint)
      assert(remux.total_bytes === base.total_bytes)
    }
  }

  test("mp4RemuxTable → mp4SampleStats: planted remux twins pair by " +
      "fingerprint and by nothing a byte digest sees") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val tbl = Multimodal.mp4RemuxTable(docs)
    val out = Multimodal.mp4SampleStats(tbl).collect()
      .map(r => r.media_id.get -> r).toMap
    val ids = out.keySet
    ids.foreach { id =>
      val r = out(id)
      val skey = if (id % 17 == 9) id - 1 else id
      assert(r.n_samples.contains(skey % 240 + 1), s"id $id")
      assert(r.n_chunks.contains(1L), s"id $id")
      if (id % 17 == 9 && ids(id - 1))
        assert(r.fingerprint === out(id - 1).fingerprint,
          s"remux twin $id must share ${id - 1}'s stream fingerprint")
    }
    // the twins' container bytes must differ (remux ≠ copy)
    import org.apache.spark.sql.functions.{col, md5}
    val dig = tbl.select(col("media_id"), md5(col("content")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.filter(id => id % 17 == 9 && ids(id - 1)).take(5).foreach { id =>
      assert(dig(id) !== dig(id - 1), s"containers of $id/${id - 1}")
    }
  }

  test("parseMp4ByteIdentity: remux keeps the byte fingerprint; a " +
      "same-bitrate CBR stream shares size_fp but NOT bytes_fp") {
    val sizes = Array.fill(12)(900)
    val payA = Array.tabulate(64)(j => ((j * 31 + 5) % 251).toByte)
    val payB = Array.tabulate(64)(j => ((j * 31 + 6) % 251).toByte)
    val base = Multimodal.buildMp4(12, 600L, 24, "avc1", 320, 240,
      sampleSizes = sizes, payload = payA)
    val remux = Multimodal.buildMp4(12, 90000L, 24, "avc1", 320, 240,
      v1 = true, sampleSizes = sizes, co64 = true, payload = payA)
    val cbrTrap = Multimodal.buildMp4(12, 600L, 24, "avc1", 320, 240,
      sampleSizes = sizes, payload = payB)
    val a = Multimodal.parseMp4ByteIdentity(base).get
    val b = Multimodal.parseMp4ByteIdentity(remux).get
    val c = Multimodal.parseMp4ByteIdentity(cbrTrap).get
    assert(a.size_fp === b.size_fp && a.bytes_fp === b.bytes_fp,
      "remux must preserve both identities")
    assert(a.size_fp === c.size_fp,
      "the CBR trap: q152's size identity cannot separate these")
    assert(a.bytes_fp !== c.bytes_fp,
      "the byte walk must separate same-bitrate different-content streams")
    assert(a.n_samples === 12L && a.total_bytes === 10800L)
  }

  test("parseMp4ByteIdentity equals a by-hand length-prefixed FNV fold " +
      "over the chunk prefix") {
    val pay = Array.tabulate(40)(j => (j * 7 + 3).toByte) // < bytesPerChunk
    val f = Multimodal.buildMp4(3, 600L, 24, "avc1", 64, 64,
      sampleSizes = Array.fill(3)(100), payload = pay)
    val got = Multimodal.parseMp4ByteIdentity(f).get.bytes_fp
    var fp = 0xcbf29ce484222325L
    def mix(v: Long): Unit = { fp ^= v & 0xffL; fp *= 0x100000001b3L }
    mix(40L) // the available-length prefix (shorter than the 64 window)
    pay.foreach(x => mix(x.toLong))
    assert(got === fp)
    // the length prefix: a payload extending the same bytes must differ
    val longer = Multimodal.buildMp4(3, 600L, 24, "avc1", 64, 64,
      sampleSizes = Array.fill(3)(100), payload = pay ++ Array[Byte](1, 2))
    assert(Multimodal.parseMp4ByteIdentity(longer).get.bytes_fp !== got)
  }

  test("parseMp4ByteIdentity: dirty input → None, never a throw") {
    val sizes = Array.fill(8)(200)
    val pay = Array.tabulate(64)(_.toByte)
    val good = Multimodal.buildMp4(8, 600L, 24, "avc1", 64, 64,
      sampleSizes = sizes, payload = pay)
    assert(Multimodal.parseMp4ByteIdentity(good).isDefined)
    // truncation at every cut: mid-ftyp, mid-moov, mid-mdat (offset
    // beyond the file), and the empty-chunk-table legacy form
    (1 until good.length by 7).foreach { cut =>
      Multimodal.parseMp4ByteIdentity(good.take(cut)) // must not throw
    }
    val mdatStart = good.length - 8 - pay.length
    assert(Multimodal.parseMp4ByteIdentity(good.take(mdatStart)).isEmpty,
      "an offset pointing past the file cannot attest identity")
    val legacy = Multimodal.buildMp4(8, 600L, 24, "avc1", 64, 64)
    assert(Multimodal.parseMp4ByteIdentity(legacy).isEmpty,
      "zero chunks carry no byte identity")
    assert(Multimodal.parseMp4ByteIdentity(null).isEmpty)
    assert(Multimodal.parseMp4ByteIdentity(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("mp4CbrTable → mp4ByteIdentity: planted triples — remux pairs, " +
      "CBR trap separates, truncated ids null") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val tbl = Multimodal.mp4CbrTable(docs)
    val out = Multimodal.mp4ByteIdentity(tbl).collect()
      .map(r => r.media_id.get -> r).toMap
    val ids = out.keySet
    var sawTriple = false
    ids.foreach { id =>
      val r = out(id)
      if (id % 17 == 3) assert(r.size_fp.isEmpty, s"truncated id $id")
      else {
        assert(r.size_fp.isDefined, s"id $id")
        val skey = if (id % 17 == 9) id - 1
                   else if (id % 17 == 10) id - 2 else id
        assert(r.n_samples.contains(skey % 120 + 2), s"id $id")
        if (id % 17 == 10 && ids(id - 2) && ids(id - 1)) {
          sawTriple = true
          val base = out(id - 2); val remux = out(id - 1)
          assert(base.size_fp === remux.size_fp &&
            base.size_fp === r.size_fp, s"triple at $skey: size identity")
          assert(base.bytes_fp === remux.bytes_fp,
            s"triple at $skey: remux twin must share bytes")
          assert(base.bytes_fp !== r.bytes_fp,
            s"triple at $skey: the trap must separate")
        }
      }
    }
    assert(sawTriple, "fixture must contain at least one full triple")
  }
}
