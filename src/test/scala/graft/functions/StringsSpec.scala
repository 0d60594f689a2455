package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StringsSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "Cafe\u0301 du Muse\u0301e" // e + COMBINING ACUTE
  private val composed = "Caf\u00e9 du Mus\u00e9e" // precomposed e-acute

  test("NFC composes decomposed sequences; composed text is unchanged") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select($"id", Strings.nfc($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === composed)
    assert(out(2L) === composed)
    assert(out(3L) === "plain ascii")
  }

  test("normalized and raw forms hash apart before NFC, together after") {
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
    assert(df.select(md5($"t")).distinct().count() === 2L)
    assert(df.select(md5(Strings.nfc($"t"))).distinct().count() === 1L)
  }

  test("null propagates; interpreted eval matches codegen") {
    val r = Seq((1L, None: Option[String])).toDF("id", "t")
      .select(Strings.nfc($"t")).collect().head
    assert(r.isNullAt(0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = NfcNormalize(Literal(decomposed))
    assert(e.eval(null).toString === composed)
  }

  test("nfc_normalize is callable from SQL via GraftExtensions") {
    graft.GraftExtensions.install(spark)
    Seq((1L, decomposed)).toDF("id", "t").createOrReplaceTempView("nfc_in")
    val r = spark.sql("SELECT nfc_normalize(t) AS n FROM nfc_in")
      .collect().head.getString(0)
    assert(r === composed)
  }

  test("NFC is idempotent and stable over mixed compositions") {
    val mixed = Seq(
      "Café", "Café", "Å", "Å", // ring-A both ways
      "ascii only", "", "ṩ", "ṩ")    // s-dot-below-dot-above
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = mixed.toDF("id", "t")
    val once = df.select($"id", Strings.nfc($"t").as("n1"))
    val twice = once.select($"id", Strings.nfc($"n1").as("n2"))
    val joined = once.join(twice, Seq("id"))
      .filter($"n1" =!= $"n2")
    assert(joined.count() === 0L, "nfc(nfc(x)) must equal nfc(x)")
    // java.text.Normalizer is the ground truth the expression must match
    val out = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    mixed.foreach { case (i, t) =>
      assert(out(i) === java.text.Normalizer.normalize(
        t, java.text.Normalizer.Form.NFC), s"id $i")
    }
  }

  test("non-string input is rejected at analysis time") {
    val e = intercept[Exception] {
      Seq((1L, 2.5)).toDF("id", "x").select(Strings.nfc($"x")).collect()
    }
    assert(e.getMessage.contains("nfc_normalize") ||
      String.valueOf(e.getCause).contains("nfc_normalize"))
  }
}
