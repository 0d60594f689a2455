package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for training-data pipelines (BASELINE.json
  * extension surface; the reference has no text functions at all —
  * SURVEY.md §2.8).
  *
  * Everything is built-in expressions (codegen'd, no UDFs): token counts
  * are regex extractions, quality scores are arithmetic over counts,
  * language ID is an exploded trigram join against a broadcast profile
  * table, fingerprints are a rolling polynomial hash folded with
  * `aggregate`. Each operator is a narrow map-side projection except
  * language ID (one broadcast join + one shuffle on doc id).
  */
object TextAnalysis {

  /** BPE-ish pretokenizer: letter runs, digit runs, or single
    * non-space symbols — the shape (not the vocab) of byte-pair
    * pretokenization, expressible identically in Java regex and RE2.
    */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Per-document token statistics: whitespace tokens, BPE-ish tokens,
    * characters. One map-side projection, no shuffle.
    */
  def tokenCounts(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id),
      size(filter(split(col(text), "\\s+"), t => length(t) > 0)).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(text)), lit(BpeishPattern), lit(0)))
        .as("n_bpe_tokens"),
      length(col(text)).as("n_chars"))

  /** English-ish stopwords used by the quality score (presence signals
    * natural language rather than keyword stuffing). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "or", "be", "this", "that", "are")

  /** Heuristic document quality score in [0,1] plus its component
    * measures. Components (all arithmetic over counts — reproducible in
    * ANSI SQL for the oracle):
    *  - length_score: min(tokens, 100)/100 — reward non-trivial length
    *  - punct_ratio: non-alphanumeric-non-space chars / chars
    *  - stopword_ratio: stopword tokens / tokens
    *  - avg_token_len: chars-in-tokens / tokens
    * score = 0.4·length + 0.3·(1−min(punct·5,1)) + 0.3·min(stop·4,1)
    */
  def qualityScore(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(lower(col(text)), "\\s+"), t => length(t) > 0)
    val nToks = size(toks).cast(DoubleType)
    val nChars = length(col(text)).cast(DoubleType)
    val punct = size(regexp_extract_all(col(text), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      .cast(DoubleType)
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t))).cast(DoubleType)
    val tokChars = aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast(DoubleType)
    df.select(
        col(id),
        nToks.as("n_tokens"),
        when(nChars > 0, punct / nChars).otherwise(0.0).as("punct_ratio"),
        when(nToks > 0, nStop / nToks).otherwise(0.0).as("stopword_ratio"),
        when(nToks > 0, tokChars / nToks).otherwise(0.0).as("avg_token_len"))
      .withColumn("quality_score",
        lit(0.4) * least(col("n_tokens"), lit(100.0)) / 100.0 +
          lit(0.3) * (lit(1.0) - least(col("punct_ratio") * 5.0, lit(1.0))) +
          lit(0.3) * least(col("stopword_ratio") * 4.0, lit(1.0)))
  }

  // --------------------------------------------------------------------
  // Language identification (character n-gram heuristic)
  // --------------------------------------------------------------------

  /** Distinctive character trigrams per language. Deliberately small:
    * the point is a deterministic, broadcast-joinable heuristic, not a
    * trained model. CJK text is handled separately by codepoint ratio.
    */
  val TrigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "he ", " th", "ing", "ng ", "and", "nd ", " an",
      " of", "of ", "ion", " to", "to ", "is ", " is", "ed ", "ent",
      " in", "in ", "tha", "hat", "at ", " wi", "wit", "ith"),
    "es" -> Seq(" de", "de ", " la", "la ", " el", "el ", "que", " qu",
      "ue ", "ión", "ció", "aci", " lo", "los", "os ", " es", "es ",
      "ado", "da ", " un", "una", "nte", " co", "con", "par"),
    "de" -> Seq("der", " de", "die", " di", "ie ", "und", " un", "nd ",
      "ein", " ei", "ine", "ich", "ch ", "sch", "ung", "ng ", "gen",
      "en ", "cht", "ht ", "das", "as ", "ist", "st ", "ber"),
    "fr" -> Seq(" de", "de ", " le", "le ", "les", "es ", " la", "la ",
      "ent", "nt ", " et", "et ", "que", " qu", "ue ", "ion", "ais",
      "ait", " un", "une", "ne ", "our", " po", "pou", "eur"))

  /** Character trigrams of the normalized text: (id, trigram). */
  def charTrigrams(df: DataFrame, id: String, text: String): DataFrame = {
    val norm = regexp_replace(lower(col(text)), "[^\\p{L} ]", " ")
    val squeezed = regexp_replace(norm, " +", " ")
    df.select(col(id).as("id"), squeezed.as("t"))
      .filter(length(col("t")) >= 3)
      .select(col("id"),
        explode(transform(sequence(lit(1), length(col("t")) - 2),
          i => col("t").substr(i, lit(3)))).as("trigram"))
  }

  /** Detected language per document: trigram-profile vote with a CJK
    * codepoint-ratio override. Profile table is broadcast; the only
    * shuffle is the per-doc score aggregation.
    */
  def languageId(df: DataFrame, id: String, text: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val profiles = TrigramProfiles.toSeq
      .flatMap { case (lang, tgs) => tgs.map(t => (lang, t)) }
      .toDF("lang", "trigram")

    val scores = charTrigrams(df, id, text)
      .join(broadcast(profiles), Seq("trigram"))
      .groupBy(col("id"), col("lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy("id").orderBy(col("hits").desc, col("lang").asc)
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("lang").as("latin_lang"), col("hits"))

    val cjk = df.select(col(id).as("id"),
      (size(regexp_extract_all(col(text), lit("[\\u4e00-\\u9fff]"), lit(0)))
        .cast(DoubleType) / greatest(length(col(text)), lit(1)).cast(DoubleType))
        .as("cjk_ratio"),
      size(filter(split(col(text), "\\s+"), t => length(t) > 0)).as("n_toks"))

    cjk.join(best, Seq("id"), "left")
      .select(col("id").as(id),
        when(col("cjk_ratio") > 0.05, lit("zh"))
          .otherwise(coalesce(col("latin_lang"), lit("und"))).as("detected_lang"),
        round(coalesce(col("hits").cast(DoubleType) / greatest(col("n_toks"), lit(1)),
          lit(0.0)), 4).as("confidence"))
  }

  // --------------------------------------------------------------------
  // Document fingerprinting (rolling hash)
  // --------------------------------------------------------------------

  private val FpMod = 2147483647L // 2^31 - 1
  private val FpBase = 1000003L

  /** Order-sensitive polynomial rolling hash over whitespace tokens:
    * h = Σ tok_i · B^(n−i) mod 2³¹−1, folded left with `aggregate` —
    * same-token-multiset docs with different order get different
    * fingerprints (unlike a set hash). Map-side only, no shuffle.
    */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(lower(col(text)), "\\s+"), t => length(t) > 0)
    val fp = aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * FpBase + pmod(xxhash64(t), lit(FpMod)), lit(FpMod)))
    df.select(col(id), fp.as("fingerprint"))
  }

  /** Winnowing-style k-gram min-sketch: the minimum rolling-hash value
    * over each document's k-gram shingles — robust to local edits, used
    * as a cheap near-dup blocking key. */
  def minShingleFingerprint(df: DataFrame, id: String, text: String,
                            k: Int = 5): DataFrame =
    Dedup.shinglesDF(df, id, text, k)
      .groupBy(col("id").as(id))
      .agg(min(pmod(xxhash64(col("shingle")), lit(FpMod))).as("min_fingerprint"))
}
