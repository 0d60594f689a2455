package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container format crawl
  * corpora actually arrive in (Common Crawl et al.), and the missing
  * first step in front of `TextAnalysis.htmlToText` (q134): a real
  * crawl pipeline is binaryFile → WARC record walk → HTML extract →
  * quality/dedup, and this file supplies the record walk.
  *
  * Format (public spec, ISO 28500 / WARC 1.0): a file is a
  * concatenation of records; each record is a `WARC/1.0\r\n` version
  * line, CRLF-separated `Name: value` headers, an empty line, exactly
  * `Content-Length` payload OCTETS, and a `\r\n\r\n` trailer. The
  * gzip variant compresses EACH RECORD as its own gzip member and
  * concatenates the members — `GZIPInputStream` walks concatenated
  * members natively, so one decompress pass recovers the plain stream.
  *
  * Parsing is per-ARCHIVE imperative byte walking (the sanctioned
  * `Dataset.flatMap` use, same as [[Multimodal.mediaFeatures]]): one
  * archive maps to its records with ZERO shuffle, so a 100 TB crawl
  * parses at scan parallelism. Dirty-input contract: crawl data is
  * hostile by nature, so a malformed record never throws — the walk
  * STOPS at the first corruption (mid-stream resync would risk
  * fabricating records from payload bytes that happen to contain
  * "WARC/1.0") and every recovered record carries `well_formed =
  * false` so downstream can count/quarantine truncated archives
  * loudly instead of silently under-reading (the compactionPlan
  * rule applied to ingest).
  */
object Warc {

  /** One parsed record. `payload` is raw octets; `payload_text` its
    * UTF-8 decoding (lossy on invalid sequences — text extraction is
    * the dominant consumer; binary consumers re-read `payload`). */
  final case class WarcRecord(rec_idx: Int, warc_type: String,
                              record_id: String, target_uri: String,
                              content_type: String, content_length: Long,
                              payload: Array[Byte])

  /** Record rows of one archive + whether the whole archive parsed
    * cleanly to EOF. */
  final case class WarcParse(records: Seq[WarcRecord], wellFormed: Boolean)

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Cap on the decompressed size of one archive (zip-bomb guard): a
    * member expanding past this marks the archive malformed rather
    * than OOMing an executor. */
  val MaxDecompressedBytes: Int = 256 << 20

  private[ext] def gunzipAll(bytes: Array[Byte]): Option[Array[Byte]] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        // bytes.length * 4 overflows Int past 512 MiB (real WARC.gz runs
        // ~1 GB) and a negative capacity THROWS — clamp via Long math so
        // one oversized archive can't kill the task.
        val cap = math.min(math.max(bytes.length.toLong * 4, 64L << 10),
          MaxDecompressedBytes.toLong).toInt
        val out = new java.io.ByteArrayOutputStream(cap)
        val buf = new Array[Byte](64 << 10)
        var n = in.read(buf)
        while (n >= 0) {
          out.write(buf, 0, n)
          if (out.size > MaxDecompressedBytes) return None
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } finally in.close() // reclaim the Inflater's native zlib buffers now,
                           // not at GC finalization (hot per-archive loop)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Walk the records of one (possibly gzipped) archive. Never
    * throws: corruption stops the walk and flips `wellFormed`. */
  def parse(raw: Array[Byte]): WarcParse = {
    if (raw == null || raw.length == 0) return WarcParse(Nil, false)
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw) match {
          case Some(b) => b
          case None => return WarcParse(Nil, false)
        }
      else raw
    val recs = Seq.newBuilder[WarcRecord]
    var idx = 0
    var pos = 0
    var ok = true
    def lineEnd(from: Int): Int = { // index of the CR of the next CRLF
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    while (ok && pos < bytes.length) {
      // tolerate extra CRLF padding between records
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n'))
        pos += 1
      if (pos < bytes.length) {
        val ve = lineEnd(pos)
        val version =
          if (ve < 0) "" else new String(bytes, pos, ve - pos, "US-ASCII")
        if (!version.startsWith("WARC/")) ok = false
        else {
          var p = ve + 2
          var warcType: String = null
          var recordId: String = null
          var targetUri: String = null
          var contentType: String = null
          var contentLength = -1L
          var headersOk = true
          var blank = false
          while (headersOk && !blank) {
            val he = lineEnd(p)
            if (he < 0) headersOk = false
            else if (he == p) { blank = true; p += 2 } // empty line
            else {
              val line = new String(bytes, p, he - p, "UTF-8")
              val colon = line.indexOf(':')
              if (colon <= 0) headersOk = false
              else {
                val name = line.substring(0, colon).trim.toLowerCase
                val value = line.substring(colon + 1).trim
                name match {
                  case "warc-type" => warcType = value
                  case "warc-record-id" => recordId = value
                  case "warc-target-uri" => targetUri = value
                  case "content-type" => contentType = value
                  case "content-length" =>
                    contentLength =
                      try value.toLong catch { case _: NumberFormatException => -1L }
                  case _ => ()
                }
                p = he + 2
              }
            }
          }
          if (!headersOk || contentLength < 0 ||
            p + contentLength > bytes.length) ok = false
          else {
            val payload =
              java.util.Arrays.copyOfRange(bytes, p, p + contentLength.toInt)
            recs += WarcRecord(idx, warcType, recordId, targetUri,
              contentType, contentLength, payload)
            idx += 1
            pos = p + contentLength.toInt
            // require the record trailer (two CRLFs) unless at EOF
            if (pos < bytes.length) {
              if (pos + 4 <= bytes.length &&
                bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
                bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n') pos += 4
              else ok = false
            }
          }
        }
      }
    }
    WarcParse(recs.result(), ok)
  }

  /** Deterministic archive builder (the [[Multimodal.buildWav]] role:
    * fixtures and specs build REAL bytes, the parser proves itself on
    * them). Fixed WARC-Date, record ids derived from the content so
    * rebuilds are byte-identical. */
  def build(records: Seq[(String, String, String, Array[Byte])],
            gzipMembers: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (warcType, uri, contentType, payload) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(warcType.getBytes("UTF-8"))
      if (uri != null) md.update(uri.getBytes("UTF-8"))
      md.update(payload)
      val rid = md.digest().take(16).map(b => f"$b%02x").mkString
      val h = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $warcType\r\n")
        .append(s"WARC-Record-ID: <urn:md5:$rid>\r\n")
        .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      if (uri != null) h.append(s"WARC-Target-URI: $uri\r\n")
      h.append(s"Content-Type: $contentType\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n")
      val rec = new java.io.ByteArrayOutputStream()
      rec.write(h.toString.getBytes("US-ASCII"))
      rec.write(payload)
      rec.write(Crlf); rec.write(Crlf)
      if (gzipMembers) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec.toByteArray)
        gz.finish() // closes THIS member, leaves `out` open for the next
      } else out.write(rec.toByteArray)
    }
    out.toByteArray
  }

  /** Explode a binary archive column into record rows — the Spark
    * surface: (id, rec_idx, warc_type, record_id, target_uri,
    * content_type, content_length, payload_text, n_records,
    * well_formed). One archive → its records, map-side, zero shuffle;
    * an unparseable archive yields ONE all-null-record row with
    * `well_formed = false` (n_records = 0) so corrupt inputs stay
    * countable instead of vanishing (equi-join null-orphan rule). */
  def records(df: DataFrame, id: String, content: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows: Dataset[(Long, Int, String, String, String, String,
        java.lang.Long, String, Int, Boolean)] =
      df.select(col(id).cast("long"), col(content)).as[(Long, Array[Byte])]
        .flatMap { case (key, bytes) =>
          val p = parse(bytes)
          if (p.records.isEmpty)
            Seq((key, -1, null: String, null: String, null: String,
              null: String, null: java.lang.Long, null: String, 0,
              p.wellFormed))
          else p.records.map { r =>
            (key, r.rec_idx, r.warc_type, r.record_id, r.target_uri,
              r.content_type, java.lang.Long.valueOf(r.content_length),
              new String(r.payload, java.nio.charset.StandardCharsets.UTF_8),
              p.records.size, p.wellFormed)
          }
        }
    rows.toDF(id, "rec_idx", "warc_type", "record_id", "target_uri",
      "content_type", "content_length", "payload_text", "n_records",
      "well_formed")
  }
}
