package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Training corpora mix composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) encodings of the same text; without canonicalization
  * they hash apart — dedup misses them, vocabularies split, and quality
  * scores drift. Spark has no normalization builtin, and a Scala UDF
  * would break whole-stage codegen on the hottest path in the pipeline
  * (the normalization pass touches every byte of the corpus). This
  * expression stays inside the codegen'd scan stage and fast-paths
  * already-normalized strings (the overwhelming majority) without
  * allocating.
  *
  * `java.text.Normalizer` implements UAX #15 — the same algorithm
  * DuckDB's `nfc_normalize` (utf8proc) implements, so results are
  * oracle-comparable across engines.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      // isNormalized is a scan, not a rewrite: the already-NFC fast
      // path returns the input object and allocates nothing
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** The shared tight-loop n-gram builders behind [[WordNgrams]] /
  * [[CharNgrams]]. Byte-exact to the Catalyst chains they replace:
  * word tokens are maximal runs between the EXPLICIT whitespace bytes
  * {0x20,\t,\n,\f,\r} (== `split(text, "[ \t\n\f\r]+")` + empty
  * filter — those bytes never occur inside a UTF-8 multibyte
  * sequence), grams join with a single 0x20 (== `concat_ws(" ", …)`),
  * and char windows count UTF-8 CHARACTERS (sequence starts), the
  * unit Spark's `substr` counts.
  */
private[functions] object NgramLoops {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d

  def wordNgrams(s: UTF8String, n: Int, wholeTextFallback: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    // token spans [start, end)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        starts.add(i)
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val t = starts.size()
    def joined(from: Int, until: Int): UTF8String = {
      // bytes of tokens [from, until) joined by single spaces
      var len = 0
      var j = from
      while (j < until) { len += ends.get(j) - starts.get(j); j += 1 }
      if (until > from) len += (until - from) - 1
      val out = new Array[Byte](math.max(len, 0))
      var p = 0
      j = from
      while (j < until) {
        if (j > from) { out(p) = 0x20; p += 1 }
        val l = ends.get(j) - starts.get(j)
        System.arraycopy(bytes, starts.get(j), out, p, l)
        p += l
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    if (t >= n) {
      val grams = new Array[AnyRef](t - n + 1)
      var g = 0
      while (g <= t - n) { grams(g) = joined(g, g + n); g += 1 }
      new GenericArrayData(grams)
    } else if (wholeTextFallback) {
      new GenericArrayData(Array[AnyRef](joined(0, t)))
    } else {
      new GenericArrayData(Array.empty[AnyRef])
    }
  }

  def charNgrams(s: UTF8String, k: Int, wholeTextFallback: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    // character starts: bytes that are not UTF-8 continuations
    val cs = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cs.add(i)
      i += 1
    }
    cs.add(bytes.length)
    val nChars = cs.size() - 1
    if (nChars >= k) {
      val grams = new Array[AnyRef](nChars - k + 1)
      var g = 0
      while (g <= nChars - k) {
        grams(g) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, cs.get(g), cs.get(g + k)))
        g += 1
      }
      new GenericArrayData(grams)
    } else if (wholeTextFallback) {
      new GenericArrayData(Array[AnyRef](s.clone()))
    } else {
      new GenericArrayData(Array.empty[AnyRef])
    }
  }
}

/** Word n-gram array of an ALREADY-LOWERCASED string: the drop-in for
  * `transform(sequence(…), i -> concat_ws(" ", slice(split(text), i, n)))`
  * — which evaluates INTERPRETED (a lambda frame per gram) and, worse,
  * re-evaluates the `split` subtree for every gram because HOF lambdas
  * see the unevaluated child expression, not a bound value: the
  * shingle pass was the top stack in every sf10 profile of the
  * dedup/sketch family. This expression splits once and emits every
  * gram from one tight byte loop (measured at sf10: q127 170→20 s,
  * q139 48→7 s, q131 49→8 s).
  *
  * `wholeTextFallback` selects the two semantics the engine uses:
  * true = documents shorter than n words contribute their whitespace-
  * joined text as ONE shingle (the near-dup convention, Dedup family);
  * false = they contribute nothing (the n-gram-statistics convention).
  * Caller applies `lower()` (and any normalization) upstream — this
  * expression only splits and joins, so the bytes match the SQL
  * oracles' `string_split_regex(lower(text), '[ \t\n\f\r]+')` chains
  * verbatim. */
final case class WordNgrams(child: Expression, n: Int,
                            wholeTextFallback: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NgramLoops.wordNgrams(input.asInstanceOf[UTF8String], n, wholeTextFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("self", this,
        classOf[WordNgrams].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Character k-gram array of an already-normalized string — the char
  * twin of [[WordNgrams]] (windows count UTF-8 characters, the unit
  * `substr` counts, so CJK text shingles correctly and surrogates
  * never split). Same fallback contract. */
final case class CharNgrams(child: Expression, k: Int,
                            wholeTextFallback: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NgramLoops.charNgrams(input.asInstanceOf[UTF8String], k, wholeTextFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("self", this,
        classOf[CharNgrams].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** One-pass token statistics of an ALREADY-LOWERCASED string:
  * struct(n_tokens, tok_chars, n_stop) — token count, summed token
  * CHARACTER lengths (the unit `length()` counts), and stopword hits.
  * Replaces three separate Catalyst passes per row (a `size(filter(
  * split(…)))`, an interpreted `filter` + `array_contains` lambda per
  * token over the stopword array, and an interpreted `aggregate`
  * fold), each of which re-split the text — the quality-gate family's
  * whole per-row cost in one tight byte loop. Token boundaries are
  * the [[NgramLoops]] whitespace-byte contract, so counts are
  * byte-exact to the chains replaced (equivalence pinned in
  * StringsSpec).
  */
final case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("tok_chars",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_stop",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nTokens = 0L
    var tokChars = 0L
    var nStop = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d) {
        i += 1
      } else {
        val start = i
        var chars = 0L
        while (i < bytes.length && {
          val c = bytes(i)
          !(c == 0x20 || c == 0x09 || c == 0x0a || c == 0x0c || c == 0x0d)
        }) {
          if ((bytes(i) & 0xc0) != 0x80) chars += 1
          i += 1
        }
        nTokens += 1
        tokChars += chars
        if (stopSet.contains(UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, start, i)))) nStop += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nTokens, tokChars, nStop)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("self", this, classOf[TokenStats].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$self.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** Shared per-thread MD5 instance for [[Md5SliceLong]] — `getInstance`
  * per row is what Spark's own `md5()` pays via commons-codec; the
  * ThreadLocal amortizes it across a task's rows. */
private[functions] object Md5Loops {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The long value of hex digits [startDigit, startDigit+nDigits) of
    * md5(s), 1-based — bit-identical to
    * `conv(substring(md5(s), startDigit, nDigits), 16, 10)` without
    * materializing the 32-char hex string or re-parsing it. */
  def sliceLong(s: UTF8String, startDigit: Int, nDigits: Int): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = startDigit - 1
    val end = i + nDigits
    while (i < end) {
      val b = d(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** `conv(substring(md5(s), start, n), 16, 10)` as ONE expression on the
  * digest bytes (codegen'd): the md5-prefix derivation every
  * replayable hash family here uses (minhash base hash, simhash bit
  * source, deterministic draws) paid a 32-char hex UTF8String
  * allocation plus a base-16 string parse per ROW on top of the digest
  * itself; this computes the identical long straight from the digest
  * nibbles. Values are pinned bit-identical to the chain it replaces
  * (StringsSpec), so every md5-replaying SQL oracle still matches.
  * `nDigits` ≤ 15 keeps the value inside a non-negative long (16
  * digits could set the sign bit — and the conv-chain it mirrors
  * parses 16 digits as an UNSIGNED string, so the two would diverge). */
final case class Md5SliceLong(child: Expression, startDigit: Int,
                              nDigits: Int)
    extends UnaryExpression {
  require(startDigit >= 1 && nDigits >= 1 && startDigit + nDigits <= 33,
    s"md5_slice_long: digits [$startDigit, ${startDigit + nDigits}) out of 1..32")
  require(nDigits <= 15, "md5_slice_long: nDigits must be <= 15 (sign bit)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_slice_long requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5_slice_long"

  override protected def nullSafeEval(input: Any): Any =
    Md5Loops.sliceLong(input.asInstanceOf[UTF8String], startDigit, nDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Loops$$.MODULE$$.sliceLong(" +
        s"$c, $startDigit, $nDigits);")

  override protected def withNewChildInternal(newChild: Expression): Md5SliceLong =
    copy(child = newChild)
}

/** Column-API surface for the string expressions. */
object Strings {
  /** Long value of md5 hex digits [start, start+n), 1-based —
    * bit-identical to `conv(substring(md5(c), start, n), 16, 10)
    * .cast("long")` (codegen'd, no hex round-trip). */
  def md5SliceLong(c: Column, start: Int, n: Int): Column =
    Bridge.column(Md5SliceLong(Bridge.expression(c), start, n))
  /** Unicode NFC canonicalization of a string column (codegen'd). */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Word n-grams of an already-lowercased string column (codegen'd
    * single pass; see [[WordNgrams]] for the fallback contract). */
  def wordNgrams(c: Column, n: Int, wholeTextFallback: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(c), n, wholeTextFallback))

  /** Character k-grams of an already-normalized string column. */
  def charNgrams(c: Column, k: Int, wholeTextFallback: Boolean): Column =
    Bridge.column(CharNgrams(Bridge.expression(c), k, wholeTextFallback))

  /** One-pass struct(n_tokens, tok_chars, n_stop) of an
    * already-lowercased string column (codegen'd; see [[TokenStats]]). */
  def tokenStats(c: Column, stopwords: Seq[String]): Column =
    Bridge.column(TokenStats(Bridge.expression(c), stopwords))
}
