package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * The pattern for media at 100 TB: payloads are opaque `binary` columns
  * with a typed metadata struct alongside; decode / feature-extraction
  * runs as a *batched* per-partition map (the Scala analog of a
  * `mapInPandas` batch UDF) so codec initialization amortizes across a
  * batch and the operation needs no shuffle at all — features are a
  * map-side projection of the payload partition.
  *
  * THE CODEC IS A STUB. This container has no image/audio libraries, so
  * [[decodeStub]] derives deterministic fake "pixel statistics" from the
  * payload bytes. Everything around it — the binary schema, the typed
  * metadata, the batching shape, the partition-preserving execution —
  * is the real plumbing a production codec would drop into.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
                             n_frames: Int, format: String)
  final case class MediaRow(media_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
                                width: Int, height: Int,
                                mean_intensity: Double, phash: Long)

  /** Real media ingestion path: Spark's `binaryFile` source reads whole
    * files as (path, modificationTime, length, content) rows — the way
    * raw image/audio/video files enter the lake before any decode.
    * `pathGlobFilter` prunes by extension at LISTING time (no bytes
    * read for excluded files). Each file becomes ONE row — bound
    * outliers with `spark.sql.sources.binaryFile.maxLength` (session
    * conf; the read fails rather than OOMing an executor).
    */
  def readBinaryFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                      globFilter: Option[String] = None): DataFrame = {
    val base = spark.read.format("binaryFile")
    globFilter.fold(base)(g => base.option("pathGlobFilter", g)).load(path)
  }

  /** Deterministic media table derived from `documents`: the UTF-8 bytes
    * of the text stand in for a real payload; metadata is synthesized
    * from stable columns. Kinds round-robin image/audio/video.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        ((pmod(col("doc_id"), lit(64)) + 1) * 16).cast("int").as("width"),
        ((pmod(col("doc_id"), lit(48)) + 1) * 16).cast("int").as("height"),
        lit(3).as("channels"),
        (pmod(col("n_chars"), lit(240)) + 1).cast("int").as("n_frames"),
        lit("synthetic").as("format")).as("meta"))

  /** STUB decoder — replace with a real codec (JPEG/PNG/WAV decode) in a
    * deployment. Deterministic in the payload: "mean intensity" is the
    * average unsigned byte value, "phash" a 64-bit FNV-1a fold.
    */
  private[ext] def decodeStub(bytes: Array[Byte]): (Double, Long) = {
    var sum = 0L
    var h = 0xcbf29ce484222325L // FNV-1a
    var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    (if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, h)
  }

  /** Batched per-partition feature extraction. `batchSize` mirrors a
    * Pandas-UDF batch: the stub "codec" is handed `batchSize` payloads at
    * a time (codec/session init would sit at the batch boundary). No
    * shuffle — output partitioning follows input partitioning.
    */
  def mediaFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // real codec: init once per batch here
        batch.iterator.map { r =>
          val (meanI, ph) = decodeStub(r.content)
          MediaFeature(r.media_id, r.kind, r.content.length,
            r.meta.width, r.meta.height, meanI, ph)
        }
      }
    }
  }

  /** REAL image-header parsing — no codec library required, just byte
    * inspection: PNG IHDR (big-endian dims at offset 16), JPEG SOFn
    * marker scan, GIF logical-screen descriptor (little-endian), BMP
    * info header. Returns None for unrecognized or truncated payloads.
    * This is exactly how dimension metadata is extracted at 100 TB —
    * a few header bytes inspected per blob, never a decode.
    */
  def parseImageHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val parsed: Option[(String, Int, Int)] =
      if (b.length >= 24 &&
        b.startsWith(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)))
        Some(("png", be32(16), be32(20)))
      else if (b.length >= 10 &&
        (b.startsWith("GIF87a".getBytes("US-ASCII")) ||
          b.startsWith("GIF89a".getBytes("US-ASCII"))))
        Some(("gif", le16(6), le16(8)))
      else if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte &&
        Set(40, 52, 56, 108, 124).contains(le32(14))) {
        // biSize check matters: 'BM' alone is 2 ASCII bytes that real
        // TEXT can start with — without it prose like "BMW..." parses
        // as an image with garbage dims
        val h = le32(22) // negative = top-down row order
        Some(("bmp", le32(18), if (h == Int.MinValue) -1 else math.abs(h)))
      } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // JPEG: walk marker segments to the first SOFn (C0..CF minus the
        // non-frame C4/C8/CC); height then width sit 5/7 bytes into it
        var i = 2
        var res: Option[(String, Int, Int)] = None
        while (res.isEmpty && i + 3 < b.length) {
          if (u8(i) != 0xff) i += 1 // skip fill/entropy bytes
          else {
            val m = u8(i + 1)
            if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // no payload
            else if (m == 0xff) i += 1
            else {
              val len = be16(i + 2)
              if (len < 2) i = b.length // corrupt length: stop
              else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                // the SOF payload must DECLARE room for precision+dims
                // (len >= 8) and the buffer must hold them — otherwise
                // the reads would land in the next segment's bytes
                if (len >= 8 && i + 8 < b.length)
                  res = Some(("jpeg", be16(i + 7), be16(i + 5)))
                i = b.length
              } else i += 2 + len
            }
          }
        }
        res
      } else None
    // dimensions must be positive in every format (PNG dims are signed
    // be32 on the wire; corrupt headers can encode <= 0)
    parsed.filter { case (_, w, h) => w > 0 && h > 0 }
  }

  final case class ImageDims(media_id: Option[Long], format: Option[String],
                             width: Option[Int], height: Option[Int])

  /** Header-parsed dimensions per media row: (media_id, format, width,
    * height), nulls when the payload is not a recognized image.
    * Map-side pass, no shuffle; header parsing needs no per-batch codec
    * init, so a plain typed map suffices (contrast [[mediaFeatures]]).
    */
  def imageHeaderDims(media: DataFrame, id: String = "media_id",
                      content: String = "content"): Dataset[ImageDims] = {
    val spark = media.sparkSession
    import spark.implicits._
    // Option id: a null media id is data (CLAUDE.md) — a primitive Long
    // encoder would throw on it and kill the whole query
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .map { case (mid, bytes) =>
        parseImageHeader(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some((f, w, h)) => ImageDims(mid, Some(f), Some(w), Some(h))
          case None => ImageDims(mid, None, None, None)
        }
      }
  }

  /** [[mediaTable]] variant whose payloads carry REAL file headers,
    * built with pure expressions (`unhex` + big/little-endian hex
    * assembly): image rows are PNG-framed, video rows GIF-framed, audio
    * rows RIFF/WAVE-framed (canonical 44-byte header: PCM fmt chunk +
    * data chunk, sample rate = meta.width·100, stereo 16-bit). Header
    * fields equal formulas over stable columns, so a parser's output is
    * independently checkable against the metadata (q88 images,
    * q101 audio). An image parser still nulls on audio rows and vice
    * versa — each modality is the other's negative path.
    */
  def mediaTableHeadered(docs: DataFrame): DataFrame = {
    val m = mediaTable(docs)
    val w = col("meta.width")
    val h = col("meta.height")
    val be32 = (c: org.apache.spark.sql.Column) => unhex(lpad(hex(c), 8, "0"))
    val le16 = (c: org.apache.spark.sql.Column) => {
      val hx = lpad(hex(c), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val le32 = (c: org.apache.spark.sql.Column) => {
      val hx = lpad(hex(c), 8, "0")
      unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val dataLen = length(col("content")) // bytes (binary length)
    val rate = w * 100
    val byteRate = rate * 4 // stereo * 16-bit
    m.withColumn("content",
      when(col("kind") === "image",
        concat(
          unhex(lit("89504E470D0A1A0A0000000D49484452")), // PNG sig + IHDR len/tag
          be32(w), be32(h),
          unhex(lit("080600000000000000")), // bit depth/color/crc filler
          col("content")))
        .when(col("kind") === "video",
          concat(lit("GIF89a").cast("binary"), le16(w), le16(h), col("content")))
        .when(col("kind") === "audio",
          concat(
            lit("RIFF").cast("binary"), le32(dataLen + 36),
            lit("WAVEfmt ").cast("binary"), le32(lit(16)),
            le16(lit(1)), le16(lit(2)),        // PCM, stereo
            le32(rate), le32(byteRate),
            le16(lit(4)), le16(lit(16)),       // block align, bits
            lit("data").cast("binary"), le32(dataLen),
            col("content")))
        .otherwise(col("content")))
  }

  /** REAL WAV (RIFF/WAVE) header parsing — a proper chunk walk, not a
    * fixed-offset read: fmt may sit after LIST/fact chunks, chunk sizes
    * are unsigned le32, odd-sized chunks pad to word boundaries, and a
    * truncated data chunk reports the bytes actually present. Returns
    * None unless both a valid PCM fmt chunk and a data chunk exist.
    */
  def parseWavHeader(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    def tag(i: Int): String = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
        val channels = le16(i + 10)
        val rate = le32(i + 12)
        val bits = le16(i + 22)
        // PCM only; reject nonsense fields rather than report them
        if (le16(i + 8) == 1 && channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0)
          fmt = Some((channels, rate.toInt, bits))
      } else if (id == "data") {
        data = Some(math.min(sz, (b.length - i - 8).toLong)) // truncation-honest
      }
      val step = 8L + sz + (sz & 1L) // odd chunks pad one byte
      if (step <= 0 || i + step > Int.MaxValue) i = b.length
      else i += step.toInt
    }
    for { (c, r, bits) <- fmt; d <- data } yield (c, r, bits, d)
  }

  final case class WavMeta(media_id: Option[Long], channels: Option[Int],
                           sample_rate: Option[Int], bits: Option[Int],
                           data_bytes: Option[Long], duration_ms: Option[Long])

  /** Header-parsed WAV metadata per media row, nulls for non-audio
    * payloads (the image/video rows fail the RIFF check). Map-side
    * typed map like [[imageHeaderDims]]; duration is integer ms
    * (floor), engine-portable arithmetic.
    */
  def wavHeaderMeta(media: DataFrame, id: String = "media_id",
                    content: String = "content"): Dataset[WavMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .map { case (mid, bytes) =>
        parseWavHeader(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some((c, r, bits, d)) =>
            val byteRate = r.toLong * c * bits / 8
            WavMeta(mid, Some(c), Some(r), Some(bits), Some(d),
              if (byteRate > 0) Some(d * 1000L / byteRate) else None)
          case None => WavMeta(mid, None, None, None, None, None)
        }
      }
  }

  // --------------------------------------------------------------------
  // Image perceptual hashing (content dedup for re-encoded duplicates)
  // --------------------------------------------------------------------

  /** Avalanche mix (splitmix64 finalizer) — the pixel-noise source for
    * [[bmpImageTable]]. */
  private def mix(a: Long): Long = {
    var h = a
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  /** Deterministic pixel channel value in [32, 215] — headroom so a
    * +8 brightness shift (the planted "re-encoded twin" perturbation)
    * never clips, which would break the shift-invariance of the
    * gradient/mean hashes. */
  private[ext] def pixelValue(seed: Long, x: Int, y: Int, c: Int): Int =
    32 + math.floorMod(
      mix(seed * 1000003L + x * 7919L + y * 104729L + c * 131L), 184L).toInt

  /** A REAL uncompressed 24-bit BMP (54-byte header + bottom-up BGR
    * rows, 4-byte row padding) — decodable by any codec, including the
    * JDK's own ImageIO, with bit-exact pixels. */
  private[ext] def buildBmp(w: Int, h: Int,
                            px: (Int, Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // bottom-up row order, BGR channel order
      var x = 0
      while (x < w) {
        buf.put(px(x, y, 2).toByte).put(px(x, y, 1).toByte)
          .put(px(x, y, 0).toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Deterministic REAL-image table derived from `documents`: each doc
    * becomes a 16×16 24-bit BMP whose pixels are a hash of the doc id —
    * and every id ≡ 3 (mod 7) becomes a +8-brightness RE-ENCODING of
    * its predecessor's image (same content, different bytes), the
    * planted duplicates [[imagePerceptualHash]] + Hamming pairing must
    * find. Unlike [[mediaTable]]'s opaque payloads these DECODE — the
    * codec path is exercised for real. */
  def bmpImageTable(docs: DataFrame, id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(id).isNotNull)
      .select(col(id).cast("long")).as[Long]
      .map { mid =>
        val (seed, shift) = if (mid % 7 == 3) (mid - 1, 8) else (mid, 0)
        (mid, buildBmp(16, 16, (x, y, c) => pixelValue(seed, x, y, c) + shift))
      }.toDF("media_id", "content")
  }

  /** dHash + aHash of one encoded image via the REAL codec path
    * (`javax.imageio` — PNG/JPEG/GIF/BMP readers ship in the JDK; no
    * external library). Deterministic INTEGER math throughout:
    * grayscale = (299r+587g+114b)/1000, cells are area-averages scaled
    * by 1024 (integer division), dHash compares row-adjacent cells of
    * a 9×8 grid, aHash compares each 8×8 cell against the global mean
    * via the cross-multiplied `cell·64 > total` form (no float ever
    * enters, so fingerprints can't drift across platforms). Both
    * hashes are invariant under a uniform brightness shift — exactly
    * the perturbation a re-encode or levels tweak applies — because
    * every cell moves by the same exact amount. None for payloads no
    * reader accepts (text, audio, truncated files).
    */
  /** ImageIO's default stream cache writes every decode through a TEMP
    * FILE — one disk round-trip per image, per task, and the source
    * here is already an in-memory byte array. Disabled once, lazily
    * (process-wide JDK flag; measured 2x+ on the decode-bound q120
    * path at sf10, with run-to-run variance collapsing too). */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private[ext] def perceptualHashes(bytes: Array[Byte]): Option[(Long, Long)] = {
    imageIoMemCache
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      // one bulk ARGB fetch instead of w·h getRGB calls (identical
      // values — same sRGB conversion path — at a fraction of the
      // per-pixel call overhead)
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      val gray = new Array[Int](w * h)
      var gi = 0
      while (gi < gray.length) {
        val p = argb(gi)
        gray(gi) = (((p >> 16) & 0xff) * 299 +
          ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        gi += 1
      }
      // area-average grid, value = sum·1024/count (integer): images
      // smaller than the grid reuse pixels (y1 >= y0+1), still exact
      def grid(cols: Int, rows: Int): Array[Long] = {
        val out = new Array[Long](cols * rows)
        var cy = 0
        while (cy < rows) {
          val y0 = math.min(cy * h / rows, h - 1)
          val y1 = math.max((cy + 1) * h / rows, y0 + 1)
          var cx = 0
          while (cx < cols) {
            val x0 = math.min(cx * w / cols, w - 1)
            val x1 = math.max((cx + 1) * w / cols, x0 + 1)
            var s = 0L
            var yy = y0
            while (yy < y1) {
              var xx = x0
              while (xx < x1) { s += gray(yy * w + xx); xx += 1 }
              yy += 1
            }
            out(cy * cols + cx) = s * 1024L / ((y1 - y0).toLong * (x1 - x0))
            cx += 1
          }
          cy += 1
        }
        out
      }
      val g98 = grid(9, 8)
      var dhash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (g98(y * 9 + x + 1) > g98(y * 9 + x)) dhash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      val g88 = grid(8, 8)
      val total = g88.sum
      var ahash = 0L
      var i = 0
      while (i < 64) {
        if (g88(i) * 64 > total) ahash |= 1L << i
        i += 1
      }
      Some((dhash, ahash))
    }
  }

  final case class ImagePHash(media_id: Option[Long],
                              dhash: Option[Long], ahash: Option[Long])

  /** Perceptual fingerprints per media row — the image twin of text
    * simhash (q18): 8 bytes per image regardless of payload size, so
    * only fingerprints ever shuffle. Batched per-partition map like
    * [[mediaFeatures]] (codec/reader init amortizes at the batch
    * boundary); no shuffle, output partitioning follows input. Nulls
    * for undecodable payloads — feed the result through
    * [[graft.ext.Dedup.hammingPairs64]] for banded near-dup pairing.
    */
  def imagePerceptualHash(media: DataFrame, id: String = "media_id",
                          content: String = "content",
                          batchSize: Int = 64): Dataset[ImagePHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // real deployments re-init codec/reader state here, per batch
          batch.iterator.map { case (mid, bytes) =>
            perceptualHashes(Option(bytes).getOrElse(Array.emptyByteArray)) match {
              case Some((d, a)) => ImagePHash(mid, Some(d), Some(a))
              case None => ImagePHash(mid, None, None)
            }
          }
        }
      }
  }

  // --------------------------------------------------------------------
  // Audio perceptual hashing (content dedup for re-encoded duplicates)
  // --------------------------------------------------------------------

  /** Chunk-walk shared with [[parseWavHeader]], additionally returning
    * the data chunk's byte OFFSET (the fingerprint path needs the PCM
    * bytes, not just their count). */
  private def wavPcmLocation(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    def tag(i: Int): String = new String(b.slice(i, i + 4), "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Long)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(i)
      val sz = le32(i + 4)
      if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
        val channels = le16(i + 10)
        val rate = le32(i + 12)
        val bits = le16(i + 22)
        if (le16(i + 8) == 1 && channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0)
          fmt = Some((channels, rate.toInt, bits))
      } else if (id == "data") {
        data = Some((i + 8, math.min(sz, (b.length - i - 8).toLong)))
      }
      val step = 8L + sz + (sz & 1L)
      if (step <= 0 || i + step > Int.MaxValue) i = b.length
      else i += step.toInt
    }
    for { (c, r, bits) <- fmt; (off, len) <- data }
      yield (c, r, bits, off, len)
  }

  /** 64-bit energy-envelope fingerprint of a 16-bit PCM WAV payload —
    * the audio twin of [[perceptualHashes]]: the clip's duration is
    * cut into 65 equal TIME segments, per-segment energy = mean square
    * of the (channel-summed) samples, and bit j compares segment j+1
    * against segment j. Energy RATIOS are what survive re-encoding:
    * a resampled copy keeps the same per-segment mean square (the
    * envelope is a function of normalized time, not of sample index)
    * and a gain change scales every segment equally — so requantized /
    * resampled duplicates land at Hamming ≈ 0 while byte digests see
    * unrelated files. None for non-WAV, non-16-bit, or clips shorter
    * than 65 frames (no stable envelope to compare). Feed through
    * [[graft.ext.Dedup.hammingPairs64]] — 8 B/clip shuffles, payloads
    * never move.
    */
  private[ext] def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    wavPcmLocation(bytes).flatMap { case (channels, _, bits, off, len) =>
      val frameBytes = 2 * channels
      val n = (len / frameBytes).toInt
      if (bits != 16 || n < 65) None
      else {
        val sum2 = new Array[Long](65)
        val cnt = new Array[Long](65)
        var i = 0
        while (i < n) {
          var s = 0L
          var c = 0
          val base = off + i * frameBytes
          while (c < channels) {
            val lo = bytes(base + 2 * c) & 0xff
            val hi = bytes(base + 2 * c + 1)
            s += (hi << 8) | lo // sign-extends through hi
            c += 1
          }
          val seg = (i.toLong * 65 / n).toInt
          sum2(seg) += s * s
          cnt(seg) += 1
          i += 1
        }
        var fp = 0L
        var j = 0
        while (j < 64) {
          // mean-square compare; doubles only at the compare (sums are
          // exact Longs), so a uniform gain factors out exactly
          if (sum2(j + 1).toDouble / cnt(j + 1) >
              sum2(j).toDouble / cnt(j)) fp |= 1L << j
          j += 1
        }
        Some(fp)
      }
    }

  final case class AudioFp(media_id: Option[Long], afp: Option[Long])

  /** Energy-envelope fingerprints per media row — batched map-side
    * pass like [[imagePerceptualHash]]; nulls for payloads that are
    * not decodable 16-bit PCM WAV. */
  def audioPerceptualHash(media: DataFrame, id: String = "media_id",
                          content: String = "content",
                          batchSize: Int = 64): Dataset[AudioFp] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (mid, bytes) =>
            AudioFp(mid,
              audioFingerprint(Option(bytes).getOrElse(Array.emptyByteArray)))
          }
        }
      }
  }

  /** A REAL mono 16-bit PCM WAV (canonical 44-byte header + LE
    * samples) — parseable by any decoder, including [[parseWavHeader]].
    */
  private[ext] def buildWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2) // byte rate = rate * block align
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Per-segment amplitude of the synthetic clip for `seed` — EVEN
    * values in [2000, 15998] so a 0.5 gain stays integer-exact. */
  private def audioAmplitude(seed: Long, seg: Int): Int =
    2 * (1000 + math.floorMod(mix(seed * 9176L + seg * 2654435761L), 7000L).toInt)

  /** Deterministic REAL-audio table derived from `documents`: each doc
    * becomes a 0.4 s mono 16-bit WAV whose 65-segment amplitude
    * envelope is a hash of the doc id (square-wave carrier, so segment
    * energy is amplitude² exactly) — and every id ≡ 3 (mod 7) becomes
    * a RE-ENCODED duplicate of its predecessor's clip: half the sample
    * rate, half the gain, same envelope. Byte-level digests (q15) and
    * even the WAV header fields see different files; the energy
    * fingerprint must land them at Hamming ≈ 0. The audio twin of
    * [[bmpImageTable]].
    */
  def wavAudioTable(docs: DataFrame, id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(id).isNotNull)
      .select(col(id).cast("long")).as[Long]
      .map { mid =>
        val (seed, rate, shift) =
          if (mid % 7 == 3) (mid - 1, 4000, 1) else (mid, 8000, 0)
        val n = rate * 2 / 5 // 0.4 s
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          val a = audioAmplitude(seed, (i.toLong * 65 / n).toInt) >> shift
          samples(i) = (if ((i / 8) % 2 == 0) a else -a).toShort
          i += 1
        }
        (mid, buildWav(rate, samples))
      }.toDF("media_id", "content")
  }

  /** Resize plan: a metadata-level transform (the payload op is the
    * stubbed codec's job; scheduling-wise the operation is the same
    * map-side batch). Keeps aspect metadata consistent.
    */
  def resizeTo(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.channels").as("channels"),
        col("meta.n_frames").as("n_frames"),
        concat(col("meta.format"), lit(s"-resized")).as("format")))

  /** Frame sampling for video rows: every `nth` frame index from the
    * metadata becomes a row — pure expressions (sequence + filter +
    * explode), no decode, no shuffle.
    */
  def frameSample(media: DataFrame, nth: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        explode(filter(sequence(lit(0), col("meta.n_frames") - 1),
          f => pmod(f, lit(nth)) === 0)).as("frame_idx"))

  // --------------------------------------------------------------------
  // MP4 / ISO-BMFF (ISO 14496-12) — the video container box walk
  // --------------------------------------------------------------------

  /** Parsed container metadata: movie-level timescale/duration from
    * mvhd, frame count from the video trak's stts (sum of
    * sample_counts), codec fourcc + pixel dims from its stsd visual
    * sample entry. `duration_ms` = duration·1000/timescale, floored —
    * integer arithmetic, identical in any engine. */
  final case class Mp4Meta(major_brand: String, timescale: Long,
                           duration_ms: Long, n_frames: Long,
                           codec: String, width: Int, height: Int)

  private def be16At(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32At(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64At(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (b(i + j) & 0xffL); j += 1 }
    v
  }
  private def tagAt(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Child boxes of [from, to): (tag, payloadStart, payloadEnd).
    * Handles the 64-bit `size == 1` largesize escape; a box running
    * past `to` or an undersized header ends the walk (truncation). */
  private def childBoxes(b: Array[Byte], from: Int,
                         to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = from
    var ok = true
    while (ok && p + 8 <= to) {
      val size32 = be32At(b, p)
      val tag = tagAt(b, p + 4)
      val (size, hdr) =
        if (size32 == 1L && p + 16 <= to) (be64At(b, p + 8), 16)
        else (size32, 8)
      if (size < hdr || p + size > to) ok = false
      else {
        out += ((tag, p + hdr, p + size.toInt))
        p += size.toInt
      }
    }
    if (ok && p == to) out.result() else Seq.empty // truncated ⇒ nothing
  }

  private def findBox(boxes: Seq[(String, Int, Int)],
                      tag: String): Option[(Int, Int)] =
    boxes.collectFirst { case (t, s, e) if t == tag => (s, e) }

  /** The video trak's stbl payload range: trak selected by the `vide`
    * hdlr, then mdia/minf/stbl — shared by the metadata walk
    * ([[parseMp4Meta]]) and the sample-table walk
    * ([[parseMp4SampleStats]]). */
  private def findVideoStbl(b: Array[Byte],
                            moov: Seq[(String, Int, Int)]): Option[(Int, Int)] =
    moov.collectFirst(Function.unlift {
      case ("trak", ts, te) =>
        val trak = childBoxes(b, ts, te)
        findBox(trak, "mdia").flatMap { case (ds, de) =>
          val mdia = childBoxes(b, ds, de)
          val isVideo = findBox(mdia, "hdlr").exists { case (hls, hle) =>
            hle - hls >= 12 && tagAt(b, hls + 8) == "vide"
          }
          if (!isVideo) None
          else findBox(mdia, "minf").flatMap { case (ns, ne) =>
            findBox(childBoxes(b, ns, ne), "stbl")
          }
        }
      case _ => None
    })

  /** REAL MP4/ISO-BMFF metadata — a proper box walk (ftyp brand, moov/
    * mvhd movie header with version 0 AND 1 layouts, trak selection by
    * the `vide` hdlr, stsd visual sample entry, stts frame-count sum),
    * not a fixed-offset read. None for non-MP4, truncated, or
    * video-trak-less payloads — the q88/q101 null-path convention.
    * This is the honest 100 TB shape for video: a few header boxes
    * inspected per blob, never a frame decode (no codec libs here).
    */
  def parseMp4Meta(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    val top = childBoxes(b, 0, b.length)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val (fs, fe) = (top.head._2, top.head._3)
    if (fe - fs < 4) return None
    val brand = tagAt(b, fs)
    val (ms, me) = findBox(top, "moov").getOrElse(return None)
    val moov = childBoxes(b, ms, me)
    val (hs, he) = findBox(moov, "mvhd").getOrElse(return None)
    if (he - hs < 20) return None
    val mvhdVersion = b(hs) & 0xff
    val (timescale, duration) = mvhdVersion match {
      case 0 if he - hs >= 20 => (be32At(b, hs + 12), be32At(b, hs + 16))
      case 1 if he - hs >= 32 => (be32At(b, hs + 20), be64At(b, hs + 24))
      case _ => return None
    }
    if (timescale <= 0) return None
    val videoStbl = findVideoStbl(b, moov).getOrElse(return None)
    val stbl = childBoxes(b, videoStbl._1, videoStbl._2)
    val (sds, sde) = findBox(stbl, "stsd").getOrElse(return None)
    if (sde - sds < 16 || be32At(b, sds + 4) < 1) return None
    val entryStart = sds + 8
    if (entryStart + 8 > sde) return None
    val codec = tagAt(b, entryStart + 4)
    // VisualSampleEntry: 8B box header, then 6 reserved + 2 dataref +
    // 16 predefined/reserved, then width/height as be16
    if (entryStart + 8 + 24 + 4 > sde) return None
    val width = be16At(b, entryStart + 8 + 24)
    val height = be16At(b, entryStart + 8 + 26)
    val (ss, se) = findBox(stbl, "stts").getOrElse(return None)
    if (se - ss < 8) return None
    val nEntries = be32At(b, ss + 4)
    if (se - ss < 8 + nEntries * 8) return None
    var frames = 0L
    var i = 0
    while (i < nEntries) {
      frames += be32At(b, ss + 8 + i * 8)
      i += 1
    }
    // A hostile version-1 mvhd can carry a 64-bit duration whose ×1000
    // overflows Long into garbage/negative ms — implausible values get
    // the same None malformed inputs do.
    if (duration < 0L || duration > Long.MaxValue / 1000L) return None
    Some(Mp4Meta(brand, timescale, duration * 1000L / timescale, frames,
      codec, width, height))
  }

  /** Sample-table stream identity: counts/bytes from the video trak's
    * stsz plus an FNV-1a 64 fingerprint over the sample-SIZE sequence
    * (each size as 4 big-endian bytes). The size sequence lives in the
    * moov INDEX, not in mdat, and it is invariant under re-muxing —
    * timescale, brand, box layout, 32- vs 64-bit chunk offsets all
    * change on a re-container while the per-sample byte sizes do not —
    * so equal fingerprints catch remuxed-identical-stream duplicate
    * video the way q120/q130 catch re-encoded images/audio, still with
    * zero frame decode. (A RE-ENCODE changes the sizes; catching that
    * needs a codec, which this container-level rung does not claim.) */
  final case class Mp4Stream(n_samples: Long, total_bytes: Long,
                             max_sample: Long, n_chunks: Long,
                             fingerprint: Long)

  /** ftyp-gated walk to the video trak's stbl payload range — the
    * shared first mile of every sample-table parse. */
  private def videoStblRange(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 16) return None
    val top = childBoxes(b, 0, b.length)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val (ms, me) = findBox(top, "moov").getOrElse(return None)
    findVideoStbl(b, childBoxes(b, ms, me))
  }

  /** Walk ftyp/moov/trak(vide)/stbl and read stsz (both the fixed
    * `sample_size` form and the per-sample entry table) and stco/co64
    * (chunk count). None for non-MP4, truncated, video-trak-less, or
    * EMPTY sample tables (an index with no samples carries no stream
    * identity — pairing empties would declare all metadata-only files
    * duplicates of each other). Never throws on dirty input. */
  def parseMp4SampleStats(b: Array[Byte]): Option[Mp4Stream] = {
    val stblRange = videoStblRange(b).getOrElse(return None)
    val stbl = childBoxes(b, stblRange._1, stblRange._2)
    // stsz: version/flags(4) sample_size(4) sample_count(4) [+ entries]
    val (zs, ze) = findBox(stbl, "stsz").getOrElse(return None)
    if (ze - zs < 12) return None
    val fixed = be32At(b, zs + 4)
    val n = be32At(b, zs + 8)
    if (n <= 0 || n > (1 << 26)) return None // empty or implausible
    val nI = n.toInt
    var total = 0L
    var maxS = 0L
    var fp = 0xcbf29ce484222325L // FNV-1a 64 offset basis
    def mix(size: Long): Unit = {
      var k = 24
      while (k >= 0) {
        fp ^= (size >> k) & 0xffL
        fp *= 0x100000001b3L
        k -= 8
      }
    }
    if (fixed > 0L) {
      var i = 0
      while (i < nI) { mix(fixed); i += 1 }
      total = fixed * n
      maxS = fixed
    } else {
      if (ze.toLong - zs < 12L + nI.toLong * 4L) return None
      var i = 0
      while (i < nI) {
        val s = be32At(b, zs + 12 + i * 4)
        total += s
        if (s > maxS) maxS = s
        mix(s)
        i += 1
      }
    }
    val nChunks = findBox(stbl, "stco").orElse(findBox(stbl, "co64"))
      .collect { case (cs, ce) if ce - cs >= 8 => be32At(b, cs + 4) }
      .getOrElse(return None)
    Some(Mp4Stream(n, total, maxS, nChunks, fp))
  }

  /** [[Mp4Stream]] plus a CONTENT fingerprint: FNV-1a 64 over the
    * first `bytesPerChunk` mdat bytes of each of the first `maxChunks`
    * chunks, read at the stco/co64 offsets. */
  final case class Mp4ByteId(n_samples: Long, total_bytes: Long,
                             n_chunks: Long, size_fp: Long, bytes_fp: Long)

  /** Chunk-byte stream identity — the rung ABOVE [[parseMp4SampleStats]]
    * on the no-decode ladder, closing its honest blind spot: a
    * constant-bitrate stream's stsz collapses to (sample_size, count),
    * so ANY two same-bitrate CBR streams share a size fingerprint while
    * carrying different video. This walk follows the chunk-offset table
    * into mdat and fingerprints a bounded byte prefix of each chunk
    * (`maxChunks` × `bytesPerChunk` bytes — constant work per file, no
    * frame decode, no codec): equal means the muxed STREAM BYTES match
    * where sampled, which a remux (new brand/timescale/box layout/
    * 32→64-bit offsets — the offsets' VALUES change but the bytes they
    * point at do not) preserves and a different stream cannot fake.
    *
    * None when the size walk fails, the chunk table is empty or
    * truncated, or ANY sampled offset lies outside the file — bytes
    * that are not there cannot attest identity (the truncation-honest
    * q101 rule). Each chunk's fold is length-prefixed so a short final
    * chunk can never alias a longer one's prefix. Never throws on
    * dirty input.
    */
  def parseMp4ByteIdentity(b: Array[Byte], bytesPerChunk: Int = 64,
                           maxChunks: Int = 64): Option[Mp4ByteId] = {
    require(bytesPerChunk >= 1 && maxChunks >= 1,
      "bytesPerChunk and maxChunks must be >= 1")
    val stats = parseMp4SampleStats(b).getOrElse(return None)
    val stblRange = videoStblRange(b).getOrElse(return None)
    val stbl = childBoxes(b, stblRange._1, stblRange._2)
    val (co, wide) = findBox(stbl, "stco").map((_, false))
      .orElse(findBox(stbl, "co64").map((_, true)))
      .getOrElse(return None)
    val (cs, ce) = co
    if (ce - cs < 8) return None
    val nEntries = be32At(b, cs + 4)
    if (nEntries <= 0L) return None // no chunks: no bytes to attest
    val width = if (wide) 8 else 4
    val take = math.min(nEntries, maxChunks.toLong).toInt
    if (ce.toLong - (cs + 8L) < take.toLong * width) return None
    var fp = 0xcbf29ce484222325L // FNV-1a 64 offset basis
    def mix(v: Long): Unit = { fp ^= v & 0xffL; fp *= 0x100000001b3L }
    var i = 0
    while (i < take) {
      val off = if (wide) be64At(b, cs + 8 + i * 8)
                else be32At(b, cs + 8 + i * 4)
      if (off < 0L || off >= b.length) return None
      val avail = math.min(bytesPerChunk.toLong, b.length - off).toInt
      mix(avail.toLong) // length prefix per chunk
      var j = 0
      while (j < avail) { mix(b(off.toInt + j).toLong); j += 1 }
      i += 1
    }
    Some(Mp4ByteId(stats.n_samples, stats.total_bytes, stats.n_chunks,
      stats.fingerprint, fp))
  }

  private def beBytes16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beBytes32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beBytes64(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var j = 0
    while (j < 8) { out(j) = ((v >> (8 * (7 - j))) & 0xff).toByte; j += 1 }
    out
  }
  private def boxBytes(tag: String, payload: Array[Byte],
                       largesize: Boolean = false): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    if (largesize)
      beBytes32(1L) ++ t ++ beBytes64(16L + payload.length) ++ payload
    else beBytes32(8L + payload.length) ++ t ++ payload
  }

  /** Deterministic MP4 builder (the [[buildWav]] role for video): a
    * spec-correct ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(vmhd, dinf, stbl(stsd avc1/hev1 visual entry, stts split
    * into two runs so the parser must SUM, empty stsc/stsz/stco))))) +
    * a token mdat. `v1` writes the moov with a 64-bit largesize header
    * and version-1 mvhd/mdhd (the layouts real muxers emit past 32-bit
    * times), so the parser's both paths stay exercised by fixtures. */
  private[ext] def buildMp4(nFrames: Int, timescale: Long, fps: Int,
                            codec: String, w: Int, h: Int,
                            v1: Boolean = false,
                            sampleSizes: Array[Int] = null,
                            co64: Boolean = false,
                            payload: Array[Byte] = null): Array[Byte] = {
    require(nFrames >= 1 && fps >= 1 && timescale % fps == 0)
    require(sampleSizes == null || sampleSizes.length == nFrames,
      "sampleSizes must carry one entry per frame")
    require(payload == null || sampleSizes != null,
      "payload requires sample tables (the chunk offset must resolve)")
    val delta = timescale / fps
    val duration = nFrames * delta
    val zeros = (n: Int) => new Array[Byte](n)
    val matrix = beBytes32(0x00010000L) ++ zeros(4 * 2) ++
      beBytes32(0L) ++ beBytes32(0x00010000L) ++ zeros(4 * 1) ++
      zeros(4 * 2) ++ beBytes32(0x40000000L)
    val ftyp = boxBytes("ftyp",
      "isom".getBytes("US-ASCII") ++ beBytes32(0L) ++
        "isommp41".getBytes("US-ASCII"))
    val mvhd =
      if (v1) boxBytes("mvhd", Array[Byte](1, 0, 0, 0) ++ beBytes64(0L) ++
        beBytes64(0L) ++ beBytes32(timescale) ++ beBytes64(duration) ++
        beBytes32(0x00010000L) ++ beBytes16(0x0100) ++ zeros(2 + 8) ++
        matrix ++ zeros(24) ++ beBytes32(2L))
      else boxBytes("mvhd", zeros(4) ++ beBytes32(0L) ++ beBytes32(0L) ++
        beBytes32(timescale) ++ beBytes32(duration) ++
        beBytes32(0x00010000L) ++ beBytes16(0x0100) ++ zeros(2 + 8) ++
        matrix ++ zeros(24) ++ beBytes32(2L))
    val tkhd = boxBytes("tkhd", Array[Byte](0, 0, 0, 7) ++ beBytes32(0L) ++
      beBytes32(0L) ++ beBytes32(1L) ++ zeros(4) ++ beBytes32(duration) ++
      zeros(8) ++ beBytes16(0) ++ beBytes16(0) ++ beBytes16(0) ++ zeros(2) ++
      matrix ++ beBytes32(w.toLong << 16) ++ beBytes32(h.toLong << 16))
    val mdhd =
      if (v1) boxBytes("mdhd", Array[Byte](1, 0, 0, 0) ++ beBytes64(0L) ++
        beBytes64(0L) ++ beBytes32(timescale) ++ beBytes64(duration) ++
        beBytes16(0x55c4) ++ zeros(2))
      else boxBytes("mdhd", zeros(4) ++ beBytes32(0L) ++ beBytes32(0L) ++
        beBytes32(timescale) ++ beBytes32(duration) ++
        beBytes16(0x55c4) ++ zeros(2))
    val hdlr = boxBytes("hdlr", zeros(4) ++ zeros(4) ++
      "vide".getBytes("US-ASCII") ++ zeros(12) ++
      "VideoHandler ".getBytes("US-ASCII"))
    val sampleEntry = boxBytes(codec, zeros(6) ++ beBytes16(1) ++
      zeros(16) ++ beBytes16(w) ++ beBytes16(h) ++
      beBytes32(0x00480000L) ++ beBytes32(0x00480000L) ++ zeros(4) ++
      beBytes16(1) ++ zeros(32) ++ beBytes16(0x0018) ++ beBytes16(0xffff))
    val stsd = boxBytes("stsd", zeros(4) ++ beBytes32(1L) ++ sampleEntry)
    // two stts runs when possible: (1, delta) + (n−1, delta)
    val stts =
      if (nFrames > 1) boxBytes("stts", zeros(4) ++ beBytes32(2L) ++
        beBytes32(1L) ++ beBytes32(delta) ++
        beBytes32(nFrames - 1L) ++ beBytes32(delta))
      else boxBytes("stts", zeros(4) ++ beBytes32(1L) ++
        beBytes32(1L) ++ beBytes32(delta))
    // real sample tables when sizes are given: stsz in the fixed
    // sample_size form when every size agrees (the CBR shape real
    // muxers emit) else the per-sample entry table; one chunk, whose
    // stco/co64 offset points at the mdat payload — resolved by
    // assembling the moov twice (the offset's ENCODED width is fixed,
    // so pass 1 with offset 0 measures, pass 2 writes the real one,
    // the standard mux two-pass). Legacy callers (sampleSizes null)
    // keep the empty tables.
    val stsc =
      if (sampleSizes == null) boxBytes("stsc", zeros(4) ++ beBytes32(0L))
      else boxBytes("stsc", zeros(4) ++ beBytes32(1L) ++
        beBytes32(1L) ++ beBytes32(nFrames.toLong) ++ beBytes32(1L))
    val stsz =
      if (sampleSizes == null)
        boxBytes("stsz", zeros(4) ++ beBytes32(0L) ++ beBytes32(0L))
      else if (sampleSizes.forall(_ == sampleSizes(0)))
        boxBytes("stsz", zeros(4) ++ beBytes32(sampleSizes(0).toLong) ++
          beBytes32(nFrames.toLong))
      else
        boxBytes("stsz", zeros(4) ++ beBytes32(0L) ++
          beBytes32(nFrames.toLong) ++
          sampleSizes.flatMap(s => beBytes32(s.toLong)))
    def chunkBox(offset: Long): Array[Byte] =
      if (sampleSizes == null)
        boxBytes("stco", zeros(4) ++ beBytes32(0L))
      else if (co64)
        boxBytes("co64", zeros(4) ++ beBytes32(1L) ++ beBytes64(offset))
      else boxBytes("stco", zeros(4) ++ beBytes32(1L) ++ beBytes32(offset))
    def moovFor(chunkOffset: Long): Array[Byte] = {
      val stbl = boxBytes("stbl", stsd ++ stts ++ stsc ++ stsz ++
        chunkBox(chunkOffset))
      val vmhd = boxBytes("vmhd", Array[Byte](0, 0, 0, 1) ++ zeros(8))
      val dref = boxBytes("dref", zeros(4) ++ beBytes32(1L) ++
        boxBytes("url ", Array[Byte](0, 0, 0, 1)))
      val minf = boxBytes("minf", vmhd ++ boxBytes("dinf", dref) ++ stbl)
      val mdia = boxBytes("mdia", mdhd ++ hdlr ++ minf)
      val trak = boxBytes("trak", tkhd ++ mdia)
      boxBytes("moov", mvhd ++ trak, largesize = v1)
    }
    val m0 = moovFor(0L)
    val moov =
      if (sampleSizes == null) m0
      else moovFor(ftyp.length.toLong + m0.length + 8L)
    // token mdat by default: the sample-table walk is header-only by
    // design — the index IS the fixture; carrying real per-sample
    // payload bytes would bloat every test corpus for data no parse
    // ever reads. Callers that exercise the byte-identity walk
    // ([[parseMp4ByteIdentity]]) pass `payload` to put real bytes at
    // the chunk offset — only as many as the walk reads (its prefix
    // window), never the full claimed stream, per the same convention.
    val mdat = boxBytes("mdat", if (payload != null) payload else zeros(16))
    ftyp ++ moov ++ mdat
  }

  /** Deterministic REAL-video table derived from `documents`: each doc
    * becomes a spec-correct MP4 whose frame count / dims / codec are
    * formulas over stable columns ([[mediaTable]]'s conventions), with
    * every id ≡ 3 (mod 11) written in the 64-bit/version-1 layout and
    * every id ≡ 7 (mod 11) TRUNCATED mid-moov (the in-board null
    * path). The video twin of [[bmpImageTable]]/[[wavAudioTable]]. */
  def mp4VideoTable(docs: DataFrame, id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(id).isNotNull && col("n_chars").isNotNull)
      .select(col(id).cast("long"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .map { case (mid, nChars) =>
        val v1 = mid % 11 == 3
        val bytes = buildMp4(
          nFrames = (nChars % 240).toInt + 1,
          timescale = if (v1) 90000L else 600L,
          fps = 24,
          codec = if (mid % 5 == 2) "hev1" else "avc1",
          w = ((mid % 64).toInt + 1) * 16,
          h = ((mid % 48).toInt + 1) * 16,
          v1 = v1)
        (mid, if (mid % 11 == 7) bytes.take(40) else bytes)
      }.toDF("media_id", "content")
  }

  final case class Mp4Row(media_id: Option[Long], major_brand: Option[String],
                          timescale: Option[Long], duration_ms: Option[Long],
                          n_frames: Option[Long], codec: Option[String],
                          width: Option[Int], height: Option[Int])

  /** Box-walk an MP4 binary column into metadata rows; unparseable
    * payloads keep their id with null fields (the q88/q101 shape). */
  def mp4Meta(media: DataFrame, id: String = "media_id",
              content: String = "content"): Dataset[Mp4Row] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .map { case (mid, bytes) =>
        parseMp4Meta(bytes) match {
          case Some(m) => Mp4Row(mid, Some(m.major_brand), Some(m.timescale),
            Some(m.duration_ms), Some(m.n_frames), Some(m.codec),
            Some(m.width), Some(m.height))
          case None => Mp4Row(mid, None, None, None, None, None, None, None)
        }
      }
  }

  /** Remuxed-duplicate fixture table: every id ≡ 9 (mod 17) carries
    * the SAME video stream as stream-key id−1 — identical sample-size
    * tables — re-containered in the v1/largesize layout at a different
    * timescale with 64-bit chunk offsets (what a remux actually
    * changes), so its container BYTES differ while the stream identity
    * does not: the duplicate shape byte-digest dedup (q15) cannot see.
    * Stream parameters derive from the stream KEY alone, so a twin
    * needs no cross-row join to build and an oracle can recompute
    * every stat from doc_id arithmetic: n = key%240+1 samples of
    * size 800 + (key·(i+7) mod 4093). The size formula mixes key and i
    * MULTIPLICATIVELY: with f(key)+g(i) shapes, two keys congruent
    * mod the size modulus share entire sequences, and 4093 is prime
    * with i+7 < 4093, so distinct streams collide only at key
    * distances ≥ lcm(4093, 240) ≈ 1M docs — and such a collision IS a
    * genuinely identical index, which the fingerprint truthfully
    * reports. */
  def mp4RemuxTable(docs: DataFrame, id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(id).isNotNull)
      .select(col(id).cast("long")).as[Long]
      .map { mid =>
        val remux = mid % 17 == 9
        val skey = if (remux) mid - 1 else mid
        val n = (skey % 240).toInt + 1
        val sizes = Array.tabulate(n)(i => 800 + ((skey * (i + 7)) % 4093).toInt)
        (mid, buildMp4(
          nFrames = n,
          timescale = if (remux) 90000L else 600L,
          fps = 24,
          codec = if (skey % 5 == 2) "hev1" else "avc1",
          w = ((skey % 64).toInt + 1) * 16,
          h = ((skey % 48).toInt + 1) * 16,
          v1 = remux,
          sampleSizes = sizes,
          co64 = remux))
      }.toDF("media_id", "content")
  }

  final case class Mp4StreamRow(media_id: Option[Long],
                                n_samples: Option[Long],
                                total_bytes: Option[Long],
                                max_sample: Option[Long],
                                n_chunks: Option[Long],
                                fingerprint: Option[Long])

  /** Walk an MP4 binary column's sample tables into stream-identity
    * rows; unparseable payloads keep their id with null fields (the
    * q88/q101 shape). */
  def mp4SampleStats(media: DataFrame, id: String = "media_id",
                     content: String = "content"): Dataset[Mp4StreamRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .map { case (mid, bytes) =>
        parseMp4SampleStats(bytes) match {
          case Some(s) => Mp4StreamRow(mid, Some(s.n_samples),
            Some(s.total_bytes), Some(s.max_sample), Some(s.n_chunks),
            Some(s.fingerprint))
          case None => Mp4StreamRow(mid, None, None, None, None, None)
        }
      }
  }

  /** Constant-bitrate fixture table — the stsz-degenerate case
    * [[mp4RemuxTable]] cannot plant. Streams come in triples keyed by
    * skey = id − (id mod-17 offset): the base (id ≡ 8 mod 17), a REMUX
    * of the same payload (id ≡ 9: v1/largesize layout, co64 offsets,
    * different timescale — same bytes at the offsets), and a DIFFERENT
    * stream at the SAME bitrate (id ≡ 10: identical CBR sample_size
    * and count, different payload — the pair a size fingerprint
    * falsely merges and only the byte walk separates). Every id ≡ 3
    * (mod 17) is truncated mid-moov (the in-board None path); all
    * other ids are singleton streams. Stream parameters and payload
    * derive from skey/pkey arithmetic alone so an oracle recomputes
    * the pair set from doc_id — and within any < 61,080-doc slice two
    * docs share (sample_size, count) ONLY when they share skey
    * (size cycles at 509, a prime coprime to the count's 120, so the
    * joint cycle is lcm = 61,080), so the oracle's skey join IS the
    * size-identity join. Payload bytes are
    * (pkey·31 + j·7) mod 251: distinct pkeys in a slice differ within
    * the first 64 bytes unless 251 | Δpkey·31 — impossible for the
    * planted Δ = 10^9 (≡ 187 mod 251) and for same-(S,n) accidental
    * pairs, which do not exist below the 61,080 cycle. */
  def mp4CbrTable(docs: DataFrame, id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(id).isNotNull)
      .select(col(id).cast("long")).as[Long]
      .map { mid =>
        val m = mid % 17
        val skey = if (m == 9) mid - 1 else if (m == 10) mid - 2 else mid
        val pkey = if (m == 10) skey + 1000000000L else skey
        val remux = m == 9
        val n = (skey % 120).toInt + 2
        val s = (skey % 509).toInt + 80
        val payload = Array.tabulate(64)(j =>
          ((pkey * 31 + j * 7) % 251).toByte)
        val bytes = buildMp4(
          nFrames = n,
          timescale = if (remux) 90000L else 600L,
          fps = 24,
          codec = if (skey % 5 == 2) "hev1" else "avc1",
          w = ((skey % 64).toInt + 1) * 16,
          h = ((skey % 48).toInt + 1) * 16,
          v1 = remux,
          sampleSizes = Array.fill(n)(s),
          co64 = remux,
          payload = payload)
        (mid, if (m == 3) bytes.take(48) else bytes)
      }.toDF("media_id", "content")
  }

  final case class Mp4ByteIdRow(media_id: Option[Long],
                                n_samples: Option[Long],
                                total_bytes: Option[Long],
                                n_chunks: Option[Long],
                                size_fp: Option[Long],
                                bytes_fp: Option[Long])

  /** Walk an MP4 binary column into chunk-byte stream-identity rows;
    * unparseable payloads keep their id with null fields (the q88/q101
    * shape). Map-side only — at scan parallelism, zero shuffle. */
  def mp4ByteIdentity(media: DataFrame, id: String = "media_id",
                      content: String = "content",
                      bytesPerChunk: Int = 64,
                      maxChunks: Int = 64): Dataset[Mp4ByteIdRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(content))
      .as[(Option[Long], Array[Byte])]
      .map { case (mid, bytes) =>
        parseMp4ByteIdentity(bytes, bytesPerChunk, maxChunks) match {
          case Some(s) => Mp4ByteIdRow(mid, Some(s.n_samples),
            Some(s.total_bytes), Some(s.n_chunks), Some(s.size_fp),
            Some(s.bytes_fp))
          case None => Mp4ByteIdRow(mid, None, None, None, None, None)
        }
      }
  }
}
