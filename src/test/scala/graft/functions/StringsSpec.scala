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

  // --- WordNgrams / CharNgrams: byte-exact equivalence to the HOF
  // chains they replaced (the oracle-replayed semantics), pinned as a
  // property over messy inputs so a refactor can't drift the bytes.

  private def hofWordNgrams(text: org.apache.spark.sql.Column, n: Int,
                            fallback: Boolean): org.apache.spark.sql.Column = {
    val toks = filter(split(text, "[ \\t\\n\\f\\r]+"), t => length(t) > 0)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    if (fallback) grams.otherwise(array(concat_ws(" ", toks)))
    else grams.otherwise(array().cast("array<string>"))
  }

  private val messy = Seq(
    "the quick brown fox", "  leading  and   trailing  ", "one",
    "two words", "", " \t\n ", "tabs\there\tand\nnewlines",
    "机器学习模型 需要 大量数据", "mixed 中文 and english",
    "a b c d e f g h", "ünïcödé tökens  nbsp-is-not-space")

  test("WordNgrams equals the HOF chain on messy inputs, both fallbacks") {
    for (n <- Seq(1, 2, 3, 5); fb <- Seq(true, false)) {
      val df = messy.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val got = df.select($"id", Strings.wordNgrams($"t", n, fb).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select($"id", hofWordNgrams($"t", n, fb).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"n=$n fallback=$fb")
    }
    // null text propagates null (callers explode-drop or coalesce)
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(Strings.wordNgrams($"t", 2, wholeTextFallback = false))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("TokenStats equals the three HOF passes it replaces") {
    val stop = graft.ext.TextAnalysis.Stopwords
    val df = (messy :+ "the of and xx the").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val st = Strings.tokenStats(lower($"t"), stop)
    val got = df.select($"id", st.getField("n_tokens"),
        st.getField("tok_chars"), st.getField("n_stop"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val toks = filter(split(lower($"t"), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    val stopArr = array(stop.map(lit): _*)
    val want = df.select($"id", size(toks).cast("long"),
        aggregate(transform(toks, t => length(t)), lit(0),
          (a, x) => a + x).cast("long"),
        size(filter(toks, t => array_contains(stopArr, t))).cast("long"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    // null text propagates a null struct (quality gates drop it)
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(Strings.tokenStats(lower($"t"), stop)).collect().head
    assert(n.isNullAt(0))
  }

  test("CharNgrams equals the substr HOF chain, counts characters not bytes") {
    def hofChar(text: org.apache.spark.sql.Column, k: Int,
                fallback: Boolean): org.apache.spark.sql.Column = {
      val grams = when(length(text) >= k,
        transform(sequence(lit(1), length(text) - (k - 1)),
          i => text.substr(i, lit(k))))
      if (fallback) grams.otherwise(array(text))
      else grams.otherwise(array().cast("array<string>"))
    }
    for (k <- Seq(1, 3, 5); fb <- Seq(true, false)) {
      val df = messy.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      val got = df.select($"id", Strings.charNgrams($"t", k, fb).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.select($"id", hofChar($"t", k, fb).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"k=$k fallback=$fb")
    }
    // multibyte sanity: 5-char windows over pure CJK never split a
    // character (every gram is exactly 5 codepoints)
    val zh = Seq((1L, "机器学习模型需要大量数据")).toDF("id", "t")
      .select(explode(Strings.charNgrams($"t", 5, wholeTextFallback = false)))
      .collect().map(_.getString(0))
    assert(zh.nonEmpty && zh.forall(_.codePointCount(0, 5) == 5))
    assert(zh.forall(_.length == 5))
  }
}
