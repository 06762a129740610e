package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines. All pure
  * Column expressions over `functions._` built-ins (codegen'd, no UDFs),
  * so they stay inside whole-stage codegen and push no work to the driver.
  *
  * The reference engine has no scalar-function surface at all
  * (SURVEY.md §2: "Scalar functions: none"); this module is part of the
  * north-star LLM-pipeline extension.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. Single-space semantics chosen to
    * be bit-identical with the DuckDB oracle's
    * `list_filter(string_split(text,' '), x -> x <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** All word n-grams of a token array, position-sensitive (duplicates
    * kept) — the one place the n-gram construction lives, so the Spark
    * and oracle idioms stay aligned. Public because span-level dedup
    * (Dedup.duplicateSpans) needs the positional grams, not the
    * deduplicated shingle set.
    */
  def ngrams(toks: Column, n: Int): Column = allNgrams(toks, n)

  private def allNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles ("a b c" strings) of a token array. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(allNgrams(toks, n))

  /** Count of non-empty whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style pre-tokenizer pattern, restricted to constructs RE2 and
    * Java regex treat identically (no lookahead): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs, leftovers.
    */
  private val bpeishPattern =
    "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+|'| +"

  /** BPE-ish token count: the standard cheap estimator for LLM token
    * budgets (a BPE tokenizer's merge count is bounded by its
    * pre-tokenizer split count, and tracks it closely on natural text).
    * Pure codegen'd regexp; cross-engine exact, so oracle-checkable.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  private val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht", "mit"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "los"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"))

  val englishStopwords: Seq[String] = stopwordsByLang.head._2

  /** Ratio of tokens that are English stopwords — a classic quality signal.
    * Exact rational (int/int) so it is cross-engine deterministic.
    */
  def stopwordRatio(toks: Column): Column = {
    val hits = size(filter(toks, t => t.isin(englishStopwords: _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Mean token length in characters (exact: int sums, one division). */
  def avgTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))

  /** Composite document quality score in [0,1]: length saturation,
    * stopword density, token-shape sanity. Mirrors the heuristics of
    * public web-corpus filters (C4/Gopher-style rules), kept to exactly
    * reproducible arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val tk = tokens(text)
    val lenScore = least(lit(1.0), size(tk).cast("double") / 100.0)
    val stopScore = least(lit(1.0), stopwordRatio(tk) * 5.0)
    val shapeScore = least(lit(1.0), avgTokenLen(tk) / 8.0)
    lenScore * 0.4 + stopScore * 0.3 + shapeScore * 0.3
  }

  /** Canonical text normalization for dedup/fingerprint pipelines:
    * lowercase, strip non-alphanumerics to spaces, collapse runs of
    * spaces, trim. Kept to regex/char-class constructs whose semantics
    * are identical in Java regex and RE2, so the DuckDB oracle reproduces
    * it exactly.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  /** Mask email addresses and simple phone patterns — the redaction pass
    * a training corpus gets before anything else. Pure codegen'd regexp
    * (no UDF); patterns avoid lookaround so every regex engine agrees.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")

  /** Duplicate word-bigram fraction, a Gopher-style repetition signal:
    * 1 - distinct/total bigrams (0 for clean prose, -> 1 for looping
    * boilerplate). Exact rational; 0 on docs shorter than two tokens.
    */
  def duplicateBigramFraction(text: Column): Column = {
    val bg = allNgrams(tokens(text), 2)
    when(size(bg) > 0,
      lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg))
      .otherwise(lit(0.0))
  }

  /** Overlapping fixed-size character chunks for retrieval/RAG indexing:
    * windows of `size` chars starting every `step` chars (overlap =
    * size - step). Returns an array of (chunk_start, chunk_text) structs;
    * 1-based starts so the Spark and SQL substring idioms coincide.
    * Narrow, codegen'd, no UDF; the array explodes to one row per chunk
    * downstream. Empty text yields a single empty chunk (start 1), so no
    * document silently disappears from the index.
    */
  def chunks(text: Column, size: Int, step: Int): Column = {
    require(size > 0 && step > 0, "chunk size and step must be positive")
    transform(
      sequence(lit(1), greatest(length(text), lit(1)), lit(step)),
      start => struct(
        start.cast("long").as("chunk_start"),
        text.substr(start, lit(size)).as("chunk_text")))
  }

  /** Heuristic language ID: argmax over per-language stopword hit counts,
    * ties broken by language-list order, "und" when nothing matches.
    * (N-gram-profile language ID distilled to the signal available for
    * whitespace-tokenized corpora; swap the word lists for real profiles.)
    */
  def langId(text: Column): Column = {
    val tk = tokens(text)
    // struct(score, rank) per language; array_max picks highest score,
    // then LOWEST rank wins ties because rank is stored negated.
    val scored = stopwordsByLang.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(filter(tk, t => t.isin(words: _*))).as("score"),
        lit(-i).as("negrank"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
