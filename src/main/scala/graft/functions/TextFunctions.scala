package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (SURVEY.md §2C). Everything here is composed from
  * `org.apache.spark.sql.functions` (codegen'd, whole-stage-friendly) —
  * no Scala UDFs in the hot path. Fixture texts are single-space-separated
  * word sequences (FIXTURES.md `documents`), so tokenization is a plain
  * split; swap the delimiter regex for messier corpora.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (distinct), the unit of near-dup detection.
    * `transform(sequence(...))` keeps this inside codegen; at 100 TB this
    * runs per-row with no shuffle. Docs shorter than n tokens yield an
    * empty set (like the oracle's generate_series(1, len-(n-1))) — without
    * the guard, sequence(1, 0) is the DESCENDING [1, 0] and slice(toks, 0,
    * n) throws (SQL array indices are 1-based). */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(typedLit(Array.empty[String])))

  /** Total characters across tokens (robust to delimiter count). */
  def tokenChars(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, v) => acc + v)

  /** How many of `toks` are in the (small, broadcast-as-literal) word set. */
  def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language marker words: tiny per-language stopword lists for the n-gram
    * heuristic language id. Deterministic and SQL-portable. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist"),
    "fr" -> Seq("le", "les", "et", "une", "dans", "est"))

  /** Heuristic language id: argmax of marker-word hits, ties broken by
    * list order, 'und' (undetermined) when nothing matches. */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, words) =>
      lang -> countIn(toks, words)
    }
    val best = scores.map(_._2).reduceLeft((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * non-alphanumerics to single spaces, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key that ships 16 bytes instead of the document across the shuffle. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Distinct word-n-gram shingle keys as 64-bit hashes, computed in one
    * native pass over the document bytes (graft.plans.ShingleHashes) —
    * no shingle strings are materialized. Same distinct-set semantics as
    * `array_distinct(shingles(tokens(text), n))` keyed by xxhash64, but
    * ~an order of magnitude cheaper per row (the HOF pipeline is
    * interpreted per element). */
  def shingleHashes(text: Column, n: Int): Column =
    graft.plans.VectorExpressions.shingleHashes(text, n)

  /** Positional variant: element j is the key of the shingle STARTING at
    * token j (no per-document distinct) — the span-dedup keying (d14). */
  def shingleHashesPos(text: Column, n: Int): Column =
    graft.plans.VectorExpressions.shingleHashesPos(text, n)

  /** MinHash signature: for each of k seeded hash functions, the min over
    * the shingle set of (a_i * h(s) + b_i) mod p. Native one-pass
    * expression (graft.plans.MinHashSig): the HOF formulation re-traversed
    * and re-hashed the shingle array k times. */
  def minHashSignature(shingleCol: Column, k: Int): Column =
    graft.plans.VectorExpressions.minhashSig(shingleCol, k)

  /** SimHash: per-bit majority vote over 64-bit token hashes, one pass
    * (graft.plans.SimHash64 — the HOF version aggregated the token array
    * 64 times). */
  def simHash(toks: Column): Column =
    graft.plans.VectorExpressions.simhash64(toks)

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
