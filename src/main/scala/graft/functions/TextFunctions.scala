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
    * runs per-row with no shuffle. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

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

  /** Deterministic 64-bit shingle hash (xxhash64, seeded). */
  def shingleHash(s: Column): Column = xxhash64(lit("graft"), s)

  /** MinHash signature: for each of k seeded hash functions, the min over
    * the shingle set of (a_i * h(s) + b_i) mod p. Runs per-row inside
    * codegen — the classic band-bucket join happens in Dedup.minHashLsh. */
  def minHashSignature(shingleCol: Column, k: Int): Column = {
    val p = 2147483647L // 2^31-1, Mersenne prime
    val funcs = (0 until k).map { i =>
      val a = 1103515245L * (i + 1) % p
      val b = 12345L * (i + 7) % p
      array_min(transform(shingleCol,
        s => pmod(lit(a) * pmod(shingleHash(s), lit(p)) + lit(b), lit(p))))
    }
    array(funcs: _*)
  }

  /** SimHash over token hashes: sum ±1 per bit position weighted by token
    * frequency, collapse to a 64-bit signature. Expressed with HOFs:
    * for each bit, count tokens with that bit set vs total. */
  def simHash(toks: Column): Column = {
    // bitwise majority vote per bit over xxhash64(token)
    val hashes = transform(toks, t => xxhash64(lit("graft"), t))
    val n = size(hashes)
    val bits = (0 until 64).map { b =>
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)).cast("int"))
      when(ones * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduceLeft((a: Column, c: Column) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
