package graft.text

import graft.functions.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenization,
  * token counting, quality scoring, language identification, and document
  * fingerprinting (SURVEY.md §7 phase E — the LLM-pipeline extension surface).
  *
  * Everything here is a pure `Column` expression over Spark built-ins
  * (`split`/`filter`/`transform`/`aggregate`): per-row, no shuffle, fully
  * inside whole-stage codegen, trivially data-parallel at any scale. Each
  * function has a DuckDB-SQL twin (the `...Sql` methods) used by the oracle —
  * the two renderings must stay in lockstep.
  *
  * Tokenization is ASCII `\W+` splitting (the corpus is ASCII word soup);
  * ratios are single double divisions of exact integers, so they are
  * bit-identical across engines.
  */
object TextAnalysis {

  // ---------------------------------------------------------------- tokens

  /** Lowercased word tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array(lower($e), '\\W+'), t -> length(t) > 0)"

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  def wsTokenCountSql(e: String): String =
    s"len(list_filter(regexp_split_to_array($e, '\\s+'), t -> length(t) > 0))"

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alnum glyphs — the classic pre-tokenizer shape (letters / numbers /
    * punctuation split apart). A real BPE vocabulary would follow this split;
    * the count is the standard cheap token-budget estimator.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  def bpeTokenCountSql(e: String): String =
    s"len(regexp_extract_all(lower($e), '$BpePattern'))"

  // ---------------------------------------------------------------- quality

  /** English-ish stopwords used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Quality signals: length, word stats, punctuation / stopword / digit
    * ratios, and a fixed-weight composite score. All ratios are one double
    * division; the composite is a fixed left-to-right expression, so IEEE
    * evaluation is identical across engines.
    */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val n = length(text)
    val toks = tokens(text)
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isInCollection(Stopwords)))
    val nPunct = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val nDigit = size(regexp_extract_all(text, lit("[0-9]"), lit(0)))
    val punctRatio = nPunct.cast("double") / n.cast("double")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val digitRatio = nDigit.cast("double") / n.cast("double")
    val meanWordLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / nTok.cast("double")
    Seq(
      "n_chars" -> n.cast("long"),
      "n_tokens" -> nTok.cast("long"),
      "punct_ratio" -> punctRatio,
      "stop_ratio" -> stopRatio,
      "digit_ratio" -> digitRatio,
      "mean_word_len" -> meanWordLen,
      // fixed-weight linear score; parenthesized left-to-right
      "quality_score" -> (((lit(0.4) * stopRatio) + (lit(0.3) * (lit(1.0) - punctRatio))) + (lit(0.3) * (lit(1.0) - digitRatio)))
    )
  }

  def qualitySignalsSql(e: String): Seq[(String, String)] = {
    val toks = tokensSql(e)
    val stopList = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val n = s"length($e)"
    val nTok = s"len($toks)"
    val nStop = s"len(list_filter($toks, t -> list_contains($stopList, t)))"
    val nPunct = s"len(regexp_extract_all($e, '[^a-zA-Z0-9\\s]'))"
    val nDigit = s"len(regexp_extract_all($e, '[0-9]'))"
    val punct = s"(CAST($nPunct AS DOUBLE) / CAST($n AS DOUBLE))"
    val stop = s"(CAST($nStop AS DOUBLE) / CAST($nTok AS DOUBLE))"
    val digit = s"(CAST($nDigit AS DOUBLE) / CAST($n AS DOUBLE))"
    val mwl = s"(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($toks, t -> CAST(length(t) AS BIGINT))), (acc, t) -> acc + t) AS DOUBLE) / CAST($nTok AS DOUBLE))"
    Seq(
      "n_chars" -> s"CAST($n AS BIGINT)",
      "n_tokens" -> s"CAST($nTok AS BIGINT)",
      "punct_ratio" -> punct,
      "stop_ratio" -> stop,
      "digit_ratio" -> digit,
      "mean_word_len" -> mwl,
      "quality_score" -> s"(((0.4 * $stop) + (0.3 * (1.0 - $punct))) + (0.3 * (1.0 - $digit)))"
    )
  }

  // ---------------------------------------------------------------- lang id

  /** Tiny per-language function-word lists for the n-gram/stopword heuristic
    * language identifier. Order fixes the argmax tiebreak.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta")
  )

  /** Per-language marker hit counts; prediction is argmax with
    * first-in-[[LangMarkers]]-order winning ties.
    */
  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    LangMarkers.map { case (lang, words) =>
      s"score_$lang" -> size(filter(toks, t => t.isInCollection(words))).cast("long")
    }
  }

  def langPredict(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit(LangMarkers.head._1)) { case (acc, (name, sc)) =>
      when(sc === best, lit(name.stripPrefix("score_"))).otherwise(acc)
    }
  }

  def langScoresSql(e: String): Seq[(String, String)] = {
    val toks = tokensSql(e)
    LangMarkers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"score_$lang" -> s"CAST(len(list_filter($toks, t -> list_contains($lst, t))) AS BIGINT)"
    }
  }

  def langPredictSql(e: String): String = {
    val scores = langScoresSql(e)
    val best = scores.map(_._2).mkString("greatest(", ", ", ")")
    scores.reverse.foldLeft(s"'${LangMarkers.head._1}'") { case (acc, (name, sc)) =>
      s"CASE WHEN $sc = $best THEN '${name.stripPrefix("score_")}' ELSE $acc END"
    }
  }

  // ---------------------------------------------------------------- shingles

  /** k-word shingles (token n-grams) of the lowercased token stream.
    * Guarded: Spark `sequence(1, 0)` yields a DESCENDING [1, 0], not an
    * empty array, so documents shorter than k tokens need the explicit
    * empty branch (DuckDB `generate_series(1, 0)` is already empty).
    */
  def shingles(text: Column, k: Int): Column = shinglesOf(tokens(text), k)

  /** Shingles from an already-bound token-array column. Callers on a hot
    * path MUST bind the token array in its own projection first and pass a
    * column reference here: the slice lambda references `toks` per element,
    * and interpreted higher-order-function evaluation re-evaluates whatever
    * expression tree sits there — a re-tokenize per shingle if `toks` is the
    * raw `tokens(text)` expression (measured ~10x on the dedup pipeline).
    */
  def shinglesOf(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(e: String, k: Int): String = {
    val toks = tokensSql(e)
    s"list_transform(generate_series(1, greatest(len($toks) - ${k - 1}, 0)), i -> array_to_string(list_slice($toks, i, i + ${k - 1}), ' '))"
  }

  // ------------------------------------------------------------ fingerprint

  /** Document fingerprint: md5 of whitespace-normalized text plus the
    * min/max 32-bit shingle hashes (a 1-perm minhash — the rolling content
    * signature used for container-level dedup).
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  def normalizedSql(e: String): String =
    s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"

  def contentHash(text: Column): Column = md5(normalized(text))

  def contentHashSql(e: String): String = s"md5(${normalizedSql(e)})"

  def shingleHashes(text: Column, k: Int): Column =
    transform(shingles(text, k), s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  def shingleHashesSql(e: String, k: Int): String =
    s"list_transform(${shinglesSql(e, k)}, s -> ${Hashing.h32Sql("s")})"
}
