package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.gf

/** Text-quality / tokenization primitives as compositions of built-in
  * (codegen'd, Catalyst-optimizable) functions wherever the semantics
  * allow; custom expressions ([[graft.expr.TextRt]]) only where they don't
  * (language id, hashes).
  */
object TextOps {

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")) -
      when(length(trim(text)) === 0, lit(1)).otherwise(lit(0))

  /** BPE-ish subword-unit count: maximal letter/digit runs plus each
    * non-whitespace punctuation character (the lookaround-split version
    * counted tabs/newlines as units; this formulation also has a direct
    * SQL mirror, since RE2 lacks lookarounds).
    */
  def unitCount(text: Column): Column =
    size(filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)) +
      length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))

  /** Punctuation character ratio in [0,1]; 0 for empty. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]{}-]", "")).cast("double") / length(text))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  private val enStop = Seq("the", "and", "of", "to", "in", "is", "that", "it",
    "for", "was", "with", "are", "this", "you", "a", "on", "as", "be", "at", "by")

  /** Fraction of tokens that are English stopwords (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val toks = filter(split(lower(trim(text)), "[^\\p{L}]+"), t => length(t) > 0)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(enStop: _*))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: balanced length, sane punctuation,
    * non-trivial stopword presence — the usual cheap heuristics a corpus
    * filter applies before expensive model scoring.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct * 2.5)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    when(length(text) === 0, lit(0.0)).otherwise(
      round((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3), 6))
  }

  /** Heuristic language id (custom expression — see TextRt.langId). */
  def langId(text: Column): Column = gf.lang_id(text)

  /** Document fingerprint (rolling hash, custom expression). */
  def fingerprint(text: Column): Column = gf.doc_fingerprint(text)
}
