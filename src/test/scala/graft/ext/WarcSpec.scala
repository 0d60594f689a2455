package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC record walk: builder→parser roundtrip on real ISO 28500 bytes
  * (plain and gzip-member), and the dirty-input contract — truncation,
  * garbage, bad headers stop the walk with well_formed = false instead
  * of throwing or fabricating records. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(t: String, uri: String, ct: String, body: String) =
    (t, uri, ct, body.getBytes("UTF-8"))

  test("multi-record roundtrip: plain and gzip members parse identically") {
    val recs = Seq(
      rec("warcinfo", null, "application/warc-fields", "software: x\r\n"),
      rec("response", "http://a/1", "text/html", "<p>hello</p>"),
      rec("response", "http://a/2", "text/html", "bytes é中"))
    for (gz <- Seq(false, true)) {
      val p = Warc.parse(Warc.build(recs, gzipMembers = gz))
      assert(p.wellFormed, s"gz=$gz")
      assert(p.records.size === 3)
      assert(p.records.map(_.warc_type) === Seq("warcinfo", "response", "response"))
      assert(p.records(1).target_uri === "http://a/1")
      assert(p.records(0).target_uri === null) // no URI header emitted
      assert(p.records(2).content_type === "text/html")
      // payload octets survive exactly (incl. multi-byte UTF-8)
      assert(new String(p.records(2).payload, "UTF-8") === "bytes é中")
      assert(p.records(2).content_length ===
        "bytes é中".getBytes("UTF-8").length.toLong)
      // record ids are content-derived and deterministic
      assert(p.records(1).record_id.startsWith("<urn:md5:"))
    }
  }

  test("truncated payload: prior records kept, well_formed = false") {
    val full = Warc.build(Seq(
      rec("response", "http://a/1", "text/plain", "first"),
      rec("response", "http://a/2", "text/plain", "second-payload")))
    val cut = full.take(full.length - 10)
    val p = Warc.parse(cut)
    assert(!p.wellFormed)
    assert(p.records.size === 1)
    assert(new String(p.records.head.payload, "UTF-8") === "first")
  }

  test("garbage, empty, bad header, bad magic: never throw") {
    assert(Warc.parse(Array.emptyByteArray) === Warc.WarcParse(Nil, false))
    assert(!Warc.parse("not a warc at all".getBytes).wellFormed)
    // gzip magic but corrupt stream
    assert(!Warc.parse(Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)).wellFormed)
    // version line ok but a header line without a colon stops the walk
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nnocolonhere\r\n" +
      "Content-Length: 1\r\n\r\nx\r\n\r\n").getBytes("US-ASCII")
    val p = Warc.parse(bad)
    assert(!p.wellFormed && p.records.isEmpty)
    // missing Content-Length is unframeable: stop
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nx\r\n\r\n")
      .getBytes("US-ASCII")
    assert(!Warc.parse(noLen).wellFormed)
  }

  test("a record whose payload CONTAINS 'WARC/1.0' is framed by length") {
    // length-framing must win over any magic inside the payload
    val tricky = "prefix\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nsuffix"
    val p = Warc.parse(Warc.build(Seq(
      rec("response", "http://a/t", "text/plain", tricky),
      rec("response", "http://a/u", "text/plain", "after"))))
    assert(p.wellFormed && p.records.size === 2)
    assert(new String(p.records.head.payload, "UTF-8") === tricky)
    assert(p.records(1).target_uri === "http://a/u")
  }

  test("records(): explode to rows; unparseable archive → one null row") {
    val good = Warc.build(Seq(
      rec("warcinfo", null, "application/warc-fields", "k: v\r\n"),
      rec("response", "http://a/1", "text/html", "<p>x</p>")))
    val df = Seq((1L, good), (2L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val out = Warc.records(df, "doc_id", "content")
      .orderBy("doc_id", "rec_idx").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("warc_type") === "warcinfo")
    assert(out(1).getAs[String]("payload_text") === "<p>x</p>")
    assert(out(1).getAs[Int]("n_records") === 2)
    assert(out(1).getAs[Boolean]("well_formed"))
    // the corrupt archive stays COUNTABLE: one row, nulls, not dropped
    assert(out(2).getAs[Long]("doc_id") === 2L)
    assert(out(2).getAs[Int]("rec_idx") === -1)
    assert(out(2).isNullAt(out(2).fieldIndex("warc_type")))
    assert(out(2).getAs[Int]("n_records") === 0)
    assert(!out(2).getAs[Boolean]("well_formed"))
  }

  test("zip-bomb guard: over-cap decompression is malformed, not OOM") {
    // 3 members of 64 MiB of zeros each → 192 MiB < cap parses; the
    // guard itself is exercised via gunzipAll on a >cap stream
    val big = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(big)
    val chunk = new Array[Byte](1 << 20)
    for (_ <- 0 until 300) gz.write(chunk) // 300 MiB > 256 MiB cap
    gz.finish()
    assert(Warc.gunzipAll(big.toByteArray).isEmpty)
  }
}
