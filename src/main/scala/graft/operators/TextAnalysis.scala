package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis operators over the `documents` table (SURVEY.md §2C):
  * token counting, quality scoring, language id, fingerprinting.
  * All per-row, shuffle-free map work — the shape that scales linearly to
  * 100 TB: no aggregation state, filters/projections push to the scan.
  *
  * Determinism: every emitted double is a ratio of exact integers (or a
  * fixed-point combination thereof), so Spark and the DuckDB oracle agree
  * bit-for-bit.
  */
object TextAnalysis {

  /** T1 — token statistics per document. */
  def t1TokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", tokens($"text").as("toks"), $"lang", $"n_chars")
      .select($"doc_id",
        size($"toks").as("n_tokens"),
        size(array_distinct($"toks")).as("n_distinct_tokens"),
        tokenChars($"toks").as("n_token_chars"),
        (tokenChars($"toks").cast(DoubleType) / size($"toks")).as("avg_token_len"))
      .orderBy($"doc_id")
  }

  /** T2 — quality scoring: type-token ratio, stopword ratio, length score,
    * combined into one deterministic score. */
  def t2QualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stop = langMarkers.toMap.apply("en")
    val withTok = Tables.load(spark, dir, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
    withTok.select(
        $"doc_id",
        (size(array_distinct($"toks")).cast(DoubleType) / size($"toks"))
          .as("distinct_ratio"),
        (countIn($"toks", stop).cast(DoubleType) / size($"toks"))
          .as("stopword_ratio"),
        least(size($"toks").cast(DoubleType) / lit(100.0), lit(1.0))
          .as("length_score"))
      .withColumn("quality_score",
        $"distinct_ratio" * 0.5 + (lit(1.0) - $"stopword_ratio") * 0.3 +
          $"length_score" * 0.2)
      .orderBy($"doc_id")
  }

  /** T3 — heuristic language id (marker-word argmax) + hit counts. */
  def t3LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang".as("labeled_lang"), tokens($"text").as("toks"))
      .select($"doc_id", $"labeled_lang",
        langId($"toks").as("detected_lang"),
        countIn($"toks", langMarkers.toMap.apply("en")).as("en_hits"))
      .orderBy($"doc_id")
  }

  /** T15 — language-ID confusion matrix: t3's marker-word argmax scored
    * against the corpus's own `lang` labels, as (labeled, detected,
    * count, row-share) cells — the eval that decides whether the
    * heuristic is trustworthy enough to drive p12/p26-style per-language
    * mixtures (p19's confusion-matrix discipline applied to t3; a
    * classifier whose errors you haven't measured is a mixture bug
    * waiting to happen). The interesting cells are off-diagonal: which
    * languages leak into which under the marker heuristic, and how much
    * mass falls to 'und' (no marker hit at all).
    *
    * Scale shape: per-doc detection is pure map work (the marker lists
    * are plan literals); the matrix is ONE map-side-combined groupBy to
    * ≤ langs×(langs+1) rows; row totals re-attach by a broadcast join of
    * that dimension-sized table with itself — corpus rows never shuffle
    * twice. Share is one IEEE division of exact counts (oracle-exact). */
  def t15LangIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pred = Tables.load(spark, dir, "documents")
      .select($"lang".as("labeled_lang"),
        langId(tokens($"text")).as("detected_lang"))
    val cells = pred.groupBy($"labeled_lang", $"detected_lang")
      .agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy($"labeled_lang").agg(sum($"n_docs").as("n_lang"))
    cells.join(broadcast(totals), "labeled_lang")
      .select($"labeled_lang", $"detected_lang", $"n_docs",
        ($"n_docs".cast(DoubleType) / $"n_lang".cast(DoubleType)).as("share"))
      .orderBy($"labeled_lang", $"detected_lang")
  }

  /** T4 — document fingerprint (md5 over normalized text) and per-
    * fingerprint duplicate counts: the 16-byte dedup key pattern. */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** T5 — BPE-ish subword token counting: alpha runs and digit runs count
    * separately (a crude stand-in for byte-pair segmentation), compared
    * against the whitespace token count — the cost-estimation signal an
    * LLM-data pipeline computes per document. */
  def t5TokenRegex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(tokens($"text")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+"), lit(0)))
          .as("subword_tokens"))
      .orderBy($"doc_id")
  }

  /** T6 — corpus length distribution per language: exact quartiles of the
    * token count (linear-interpolated, matching DuckDB quantile_cont).
    * The exact percentile shuffles every value to its group — fine keyed
    * by lang; at 100 TB with huge groups the sketch (percentile_approx,
    * asserted within ε of exact in RelationalSpec-style spec) is the scale
    * path, exactly like q23's HLL-vs-exact pairing. */
  def t6LengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"lang", size(tokens($"text")).as("n_tokens"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(n_tokens, array(0.25, 0.5, 0.75))").as("q"),
        max($"n_tokens").as("max_tokens"))
      .select($"lang", $"n_docs",
        element_at($"q", 1).as("p25"),
        element_at($"q", 2).as("p50"),
        element_at($"q", 3).as("p75"),
        $"max_tokens")
      .orderBy($"lang")
  }

  /** T7 — lexical-diversity statistics per document: type-token ratio,
    * hapax-legomenon fraction (words occurring exactly once), and Yule's K
    * (the classic vocabulary-richness statistic, 10⁴·(Σc²−N)/N²) — the
    * signals a quality-filtering pipeline uses to catch keyword-stuffed or
    * template-generated text that plain length/stopword ratios miss.
    *
    * Shuffle-free per-row map work: distinct-count, hapax count, and Σc²
    * all come from ONE run-length scan over the sorted token array
    * (p1's pattern) — O(n log n) per document, not the O(d·n) a nested
    * count-occurrences filter would cost. Σc² updates incrementally
    * ((r+1)² − r² = 2r+1), so no per-run finalization is needed. The `run
    * > 0` guard makes the empty-string sentinel safe even when "" is a
    * real token. Every emitted double is ONE IEEE division of exact
    * integers computed in the same shape on the oracle side → bit-exact. */
  def t7LexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scan = aggregate(
      array_sort($"toks"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("d"),
        lit(0L).as("hapax"), lit(0L).as("s2")),
      (acc, t) => {
        val same = (t === acc("prev")) && (acc("run") > 0)
        struct(
          t.as("prev"),
          when(same, acc("run") + 1).otherwise(lit(1L)).as("run"),
          when(same, acc("d")).otherwise(acc("d") + 1).as("d"),
          when(same, when(acc("run") === 1, acc("hapax") - 1)
            .otherwise(acc("hapax"))).otherwise(acc("hapax") + 1).as("hapax"),
          when(same, acc("s2") + acc("run") * 2 + 1)
            .otherwise(acc("s2") + 1).as("s2"))
      },
      acc => struct(acc("d"), acc("hapax"), acc("s2")))
    // spread=true (r12): the per-row array_sort + aggregate scan fuses
    // into the scan stage (interleaved A/B: 0.64× spread)
    Tables.load(spark, dir, "documents", spread = true)
      .select($"doc_id", tokens($"text").as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("n"), scan.as("sc"))
      .select($"doc_id",
        $"n".cast("int").as("n_tokens"),
        ($"sc.d".cast(DoubleType) / $"n").as("ttr"),
        ($"sc.hapax".cast(DoubleType) / $"n").as("hapax_frac"),
        ((($"sc.s2" - $"n") * 10000).cast(DoubleType) / ($"n" * $"n"))
          .as("yule_k"))
      .orderBy($"doc_id")
  }

  /** T8 — vocabulary coverage / out-of-vocabulary rate: per document, the
    * fraction of token instances not covered by its language's top-k
    * vocabulary (p5's table) — the audit a pipeline runs before committing
    * to a tokenizer/vocab: high-OOV documents either get a bigger vocab or
    * get dropped.
    *
    * Scale shape: the vocabulary is langs×k rows — a broadcast dimension
    * by construction — so the corpus-side token explode joins map-side
    * with no shuffle of the corpus; the only exchanges are the vocab's own
    * tiny aggregation and the final per-doc groupBy. oov_rate is one IEEE
    * division of exact counts. */
  def t8OovRate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"lang", explode(tokens($"text")).as("token"))
    // the vocabulary IS p5's table (same ranking, same tie-break, by
    // construction rather than by a duplicated window) — the audit
    // cannot silently diverge from the vocab it audits against
    val vocab = Pipeline.p5VocabTopK(spark, dir)
      .select($"lang", $"token", lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("lang", "token"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", $"n_oov".cast(DoubleType) / $"n_tokens")
      .orderBy($"doc_id")
  }

  /** T9 — corpus n-gram diversity audit: per source, how concentrated is
    * the 3-gram vocabulary? `simpson` is the collision probability of two
    * random distinct-per-doc gram draws (Simpson index — the exact-ratio
    * stand-in for entropy, which log() would make oracle-unstable);
    * `top_share` is the single most widespread gram's share. High values
    * flag template-heavy / boilerplate sources a pipeline should
    * downweight before training.
    *
    * Scale shape: ShingleHashes explode (8-byte keys, no strings) →
    * two-phase count per (source, gram) → per-source aggregate whose
    * shuffle carries one row per distinct gram — the same inverted-index
    * volume d3 already bounds; numerator sums go through DECIMAL(38,0)
    * (c·(c−1) summed over 10¹² grams overflows a long). Both doubles are
    * single IEEE divisions of exact ints, same shape as the oracle. */
  def t9NgramDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"source", explode(shingleHashes($"text", 3)).as("h"))
      .groupBy($"source", $"h").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_total"),
        count(lit(1)).as("n_distinct"),
        // the cast must precede the multiply: c·(c−1) in LONG wraps once a
        // single gram's df passes ~3e9 — decimal only protects what it
        // actually computes
        sum($"c".cast("decimal(38,0)") * ($"c" - 1)).as("coll"),
        max($"c").as("max_c"))
      .select($"source", $"n_total", $"n_distinct",
        // two sequential divisions, NOT one division by n·(n−1): the long
        // product wraps silently at 10¹² grams/source; dividing twice is
        // overflow-free and the oracle mirrors the exact same IEEE shape
        ($"coll".cast(DoubleType) / $"n_total" / ($"n_total" - 1))
          .as("simpson"),
        ($"max_c".cast(DoubleType) / $"n_total").as("top_share"))
      .orderBy($"source")
  }

  /** T10 — unigram-LM surprisal quality score (the CCNet filter shape,
    * Wenzek et al. 2020: score each document by its average per-token
    * negative log-probability under a corpus language model; unusually
    * high surprisal flags noise/garbage, unusually low flags boilerplate).
    * The log-probability is quantized to whole BITS — surprisal(t) =
    * floor(log2(N / cnt(t))), computed as length(bin(N div cnt)) - 1
    * over exact longs — because cross-engine ln()/log2() differ in final
    * ulps (the p9-idf lesson); bit-granular surprisal is engine-exact and
    * preserves the ordering the filter thresholds on.
    *
    * Scale shape — chosen for the guaranteed-hot keys ("the" is 5% of any
    * English corpus):
    *  - NOT count-over-window by token (d8's trick): a window partition
    *    is unsplittable, so one executor would sort 10¹⁰ rows of "the".
    *  - Instead per-(doc, token) counts first (skew-free key), then the
    *    frequency groupBy carries one row per distinct (doc, token) with
    *    map-side combine, and the frequency re-attach is an equi-join on
    *    token that AQE's skew-join splits.
    *  - NOT a broadcast vocab (t8 broadcasts a langs×k TOP-k table; the
    *    FULL unigram vocab of a web corpus is billions of typo-tail rows).
    *  - The corpus total is a 1-row broadcast; per-doc sums weight each
    *    token's bits by its in-doc count. All emitted doubles are one
    *    IEEE division of exact longs. */
  def t10Surprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tk = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
    val dt = tk.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    // vocab is VOCAB-scale (Heaps-law sublinear) and feeds two consumers:
    // the frequency re-attach, and — via the exact integer identity
    // Σ_tok cnt == Σ_(doc,tok) c — the corpus total. Checkpointing it
    // (r12) shares one whole corpus tokenize+explode pass per extra
    // consumer at the cost of materializing only vocab-sized rows; the
    // before-plan carried 3 corpus Generates because column pruning
    // specializes each consumer subtree and defeats ReuseExchange.
    // (Checkpointing CORPUS-scale dt instead measured 1.2–2× worse at
    // sf0.1 — materialization must stay small-side; t11's db is the
    // exception that repays it with three saved explodes.)
    val vocab = graft.sources.Tables.stage(
      dt.groupBy($"tok").agg(sum($"c").as("cnt")))
    val total = vocab.select(sum($"cnt").as("total"))
    dt.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("bits", length(bin(expr("total DIV cnt"))) - 1)
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"),
        sum($"c" * $"bits").as("sum_bits"))
      .withColumn("avg_bits",
        $"sum_bits".cast(DoubleType) / $"n_tokens")
      .select($"doc_id", $"n_tokens", $"sum_bits", $"avg_bits")
      .orderBy($"doc_id")
  }

  /** T11 — bigram-LM surprisal: t10's quality signal upgraded from a
    * unigram to a conditional bigram model. Each token transition (v, w)
    * scores ⌊log₂ 1/p̂(w|v)⌋ bits, with p̂(w|v) = c(v,w) / Σ_w' c(v,w')
    * the corpus MLE — quantized to whole bits via the same ln()-free
    * length(bin(ctx DIV c2))−1 form (exact integers both engines; see
    * t10). High average transition surprisal flags incoherent word salad
    * that unigram frequency can't see (every token common, transitions
    * improbable) — and low flags boilerplate. A document's first token has
    * no context and is deliberately out of scope (transitions only).
    *
    * Scale shape, exactly t10's: per-(doc, bigram) pre-aggregation first,
    * so a document repeating one hot transition contributes ONE row to the
    * count re-attach. The bits-per-bigram MODEL is assembled at
    * vocabulary cardinality BEFORE the corpus sees it (the r8 change):
    * context totals join the bigram counts — two vocab-scale tables —
    * and the ⌊log₂⌋ quantization happens once per DISTINCT bigram, so
    * the corpus-scale (doc, bigram) table shuffles exactly once (on the
    * bigram re-attach; it previously shuffled a second time on the
    * context word). At sf0.1 the change is cost-neutral (isolated
    * 1.7–2.0 s both ways — the local cost lives in the string-keyed
    * pre-agg, which is the protective shape, not the exchanges); the
    * saved corpus-scale shuffle is the term that grows with data, the
    * vocab-scale model join the one that doesn't (Heaps-law sublinear).
    * The re-attach join stays AQE-skew-splittable;
    * the model tables never broadcast (a web-scale bigram vocabulary is
    * billions of rows). */
  def t11BigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bg = Tables.load(spark, dir, "documents")
      .select($"doc_id", tokens($"text").as("w"))
      .filter(size($"w") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(w) - 1), i -> " +
          "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
    // db feeds THREE consumers (cb's two derivations — ctx and model —
    // plus the final re-attach); column pruning specializes each subtree,
    // defeating ReuseExchange, so unshared the corpus bigram explode ran
    // 3× (3 Generates in the r12-before plan). localCheckpoint
    // materializes db ONCE inside the timed query — row-form blocks, not
    // the columnar cache, whose compression build measured 2× worse than
    // the explodes it saves — and every consumer reads the blocks
    // (measured ~1.46 s vs 1.6–2.4 s unshared at sf0.1; the win is the
    // corpus-pass count, which is what grows at 100 TB). Bench/Verify
    // clearCache+gc between runs releases the blocks, so each timed run
    // pays its own materialization.
    val db = graft.sources.Tables.stage(
      bg.groupBy($"doc_id", $"big").agg(count(lit(1)).as("m")))
    val cb = db.groupBy($"big").agg(sum($"m").as("c2"))
    val ctx = cb.groupBy(split($"big", " ").getItem(0).as("prev"))
      .agg(sum($"c2").as("ctx"))
    val model = cb
      .withColumn("prev", split($"big", " ").getItem(0))
      .join(ctx, "prev")
      .select($"big", (length(bin(expr("ctx DIV c2"))) - 1).as("bits"))
    db.join(model, "big")
      .groupBy($"doc_id")
      .agg(sum($"m").as("n_bigrams"),
        sum($"m" * $"bits").as("sum_bits"))
      .withColumn("avg_bits", $"sum_bits".cast(DoubleType) / $"n_bigrams")
      .select($"doc_id", $"n_bigrams", $"sum_bits", $"avg_bits")
      .orderBy($"doc_id")
  }

  /** T12 — vocabulary-growth (Heaps-law) audit: cumulative token count,
    * cumulative distinct-vocabulary size, and their ratio at doubling
    * checkpoints of the corpus (docs with doc_id < 2^k). The curve is the
    * standard corpus-health diagnostic — a vocabulary that stops growing
    * signals heavy duplication, one that grows linearly signals noise —
    * and "how much NEW vocabulary does each doubling add" is a question
    * a naive implementation answers with a sequential scan.
    *
    * Scale shape: first-occurrence is min(doc_id) per token — ONE keyed
    * shuffle over the (doc, token) pre-aggregate (the t10 rule: hot
    * tokens never pin a partition because the per-doc pre-agg bounds each
    * token's rows by the doc count, and min() combines map-side).
    * Checkpoint attribution is pure integer bit arithmetic (next power of
    * two) inside codegen; the cumulative window then runs over the TINY
    * per-checkpoint table (log₂ N rows — the p3 offsets pattern), never
    * the corpus. */
  def t12VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // next power of two above x: the checkpoint at which a first
    // occurrence (or a doc's tokens) becomes visible
    def cpOf(col: String): org.apache.spark.sql.Column =
      when(expr(col) === 0, 1L)
        .otherwise(expr(s"shiftleft(CAST(1 AS BIGINT), length(bin($col)))"))
    val dt = Tables.load(spark, dir, "documents")
      .select($"doc_id", explode(tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("m"))
    val vocabPer = dt.groupBy($"tok").agg(min($"doc_id").as("f"))
      .groupBy(cpOf("f").as("checkpoint")).agg(count(lit(1)).as("nv"))
    val tokensPer = dt
      .groupBy(cpOf("doc_id").as("checkpoint")).agg(sum($"m").as("nt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"checkpoint")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    vocabPer.join(tokensPer, Seq("checkpoint"), "full_outer")
      .select($"checkpoint", coalesce($"nv", lit(0L)).as("nv"),
        coalesce($"nt", lit(0L)).as("nt"))
      .select($"checkpoint",
        sum($"nt").over(w).as("n_tokens"),
        sum($"nv").over(w).as("n_vocab"))
      .withColumn("ttr", $"n_vocab".cast(DoubleType) / $"n_tokens")
      .orderBy($"checkpoint")
  }

  /** t13 reports ranks up to this cap (and never materializes more). */
  val ZipfMaxRank = 4096

  /** T13 — Zipf (rank-frequency) audit: the corpus frequency table probed
    * at power-of-two ranks — rank 1, 2, 4, … up to [[ZipfMaxRank]] — with
    * the rank·frequency product alongside. Under Zipf's law the product
    * is near-constant; a product that COLLAPSES at high ranks signals a
    * truncated tail (template/boilerplate corpora), one that climbs
    * signals a fat tail (OCR noise, typo inflation) — the corpus-health
    * twin of t12's vocabulary-growth curve, read along the other axis.
    * Checkpoint form keeps every emitted value an exact integer (no
    * log-log slope fit — ln() is oracle-unstable, the t10 rule).
    *
    * Scale shape: the token count is one keyed groupBy with map-side
    * combine; ranking then runs through TakeOrderedAndProject with
    * k = [[ZipfMaxRank]] (each partition ships at most k (freq, tok)
    * pairs — the corpus-scale vocabulary never feeds a global sort), and
    * the row_number window orders the ≤k-row survivor set on one task —
    * bounded by the cap, not the vocabulary. Ties break on token text,
    * total order both engines. */
  def t13ZipfCheckpoints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"freq".desc, $"tok".asc)
    Tables.load(spark, dir, "documents")
      .select(explode(tokens($"text")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"tok".asc).limit(ZipfMaxRank)
      .withColumn("rk", row_number().over(w))
      .filter(expr("(rk & (rk - 1)) = 0"))
      .select($"rk", $"tok", $"freq",
        ($"rk".cast("long") * $"freq").as("zipf_product"))
      .orderBy($"rk")
  }

  /** t14 keeps bigrams seen at least this often (noise floor). */
  val PmiMinCount = 5
  /** t14 reports the top-k collocations (and never sorts more). */
  val PmiTopK = 200
  /** Fixed-point scale for the t14 PMI ratio. */
  val PmiScale = 1000000L

  /** T14 — PMI collocation mining: bigrams ranked by pointwise mutual
    * information, the standard signal for multi-word expressions
    * ("new york") vs chance co-occurrence ("of the"). PMI is
    * log(P(xy)/(P(x)P(y))); since log is monotone, ranking by the RATIO
    * is ranking by PMI, and the ratio is exact integer math:
    * pmi_fp = (c_xy · T · 10⁶) div (c_x · c_y) — a fixed-point integer
    * both engines compute identically (the t10 rule: no ln()).
    * Bigrams below [[PmiMinCount]] are dropped (the classic PMI
    * rare-pair pathology: a hapax pair maximizes the ratio).
    *
    * Scale shape: unigram and bigram counts are keyed groupBys with
    * map-side combine (hot tokens partial-aggregate before the
    * shuffle). The unigram re-attach MELTS each surviving bigram into
    * its (pos, token) legs and joins the unigram table ONCE — the r8
    * change: the original x-then-y join pair shuffled the unbounded
    * vocabulary TWICE (the query's dominant exchange; measured 0.78 →
    * 0.61 s warm at sf0.1), where the melt shuffles it once and
    * re-groups 2 rows per bigram (bounded by the c2-floored bigram
    * table, far smaller than the vocabulary). The join stays a shuffle
    * join (vocabulary is unbounded at corpus scale — never broadcast,
    * t11's call) with AQE skew-splitting on hot heads like "the"; the
    * final ranking is TakeOrderedAndProject at [[PmiTopK]] — each
    * partition ships ≤k rows, the bigram table never feeds a global
    * sort. At 100 TB the c_xy·T·10⁶ numerator approaches the BIGINT
    * ceiling (T ≈ 10¹³ tokens would overflow at c_xy ≈ 10⁵ — widen the
    * product to DECIMAL(38,0) there; at fixture scale BIGINT is exact
    * and oracle-checkable). */
  def t14PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tk = Tables.load(spark, dir, "documents")
      .select($"doc_id", tokens($"text").as("w"))
    // uni feeds the total and the re-attach; a vocab-scale checkpoint
    // (t10's pattern) measured 1.11× WORSE here (r12 interleaved cmp —
    // the barrier lands before the bigram leg can overlap), so the
    // recompute is kept deliberately
    val uni = tk.select(explode($"w").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c1"))
    val tot = uni.agg(sum($"c1").as("t"))
    val cb = tk.filter(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> " +
          "concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("big"))
      .groupBy($"big").agg(count(lit(1)).as("c2"))
      .filter($"c2" >= PmiMinCount)
    cb.select($"big", $"c2",
        posexplode(split($"big", " ")).as(Seq("pos", "tok")))
      .join(uni.hint("shuffle_hash"), "tok")
      .groupBy($"big", $"c2")
      // exactly one row per leg (pos 0 = x, pos 1 = y); max over the
      // single value per cell is exact — the v9-oracle pivot rule
      .agg(max(when($"pos" === 0, $"c1")).as("cx"),
        max(when($"pos" === 1, $"c1")).as("cy"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi_fp", expr(s"(c2 * t * $PmiScale) DIV (cx * cy)"))
      .select($"big", $"c2".as("pair_count"), $"cx", $"cy", $"pmi_fp")
      .orderBy($"pmi_fp".desc, $"big".asc)
      .limit(PmiTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t15_langid_confusion" -> t15LangIdConfusion _,
    "t14_pmi_collocations" -> t14PmiCollocations _,
    "t13_zipf_checkpoints" -> t13ZipfCheckpoints _,
    "t12_vocab_growth" -> t12VocabGrowth _,
    "t11_bigram_surprisal" -> t11BigramSurprisal _,
    "t10_surprisal" -> t10Surprisal _,
    "t9_ngram_diversity" -> t9NgramDiversity _,
    "t8_oov_rate" -> t8OovRate _,
    "t5_token_regex" -> t5TokenRegex _,
    "t6_length_percentiles" -> t6LengthPercentiles _,
    "t7_lexical_diversity" -> t7LexicalDiversity _,
    "t1_token_stats" -> t1TokenStats _,
    "t2_quality_score" -> t2QualityScore _,
    "t3_lang_id" -> t3LangId _,
    "t4_fingerprint" -> t4Fingerprint _,
  )

  private val enList = langMarkers.toMap.apply("en").mkString("'", "','", "'")

  /** The t2 quality score as a reusable oracle CTE body (also composed by
    * Dedup's d7 canonical-selection oracle). */
  val qualityCte: String =
    s"""SELECT doc_id,
       |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |      / len(string_split(text,' ')) * 0.5
       |  + (1.0 - CAST(len(list_filter(string_split(text,' '), x -> x IN ($enList))) AS DOUBLE)
       |      / len(string_split(text,' '))) * 0.3
       |  + least(CAST(len(string_split(text,' ')) AS DOUBLE) / 100.0, 1.0) * 0.2
       |    AS quality_score
       |FROM documents""".stripMargin
  private val markerSql = langMarkers.map { case (l, ws) =>
    l -> ws.mkString("'", "','", "'")
  }

  /** The t3 marker-argmax detector as DuckDB SQL fragments (per-lang hit
    * columns, greatest() pick, tie-broken CASE) — ONE definition shared
    * by the t3 and t15 oracles, so the detected_lang rule cannot drift
    * between the per-doc report and the confusion matrix scored on it. */
  private lazy val (detectorHits, detectorBest, detectorCase) = {
    val hits = markerSql.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN ($ws))) AS ${l}_h"
    }.mkString(",\n  ")
    val best = markerSql.map(m => s"${m._1}_h")
      .mkString("greatest(", ", ", ")")
    val caseExpr = markerSql.map { case (l, _) =>
      s"WHEN ${l}_h = best AND best > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    (hits, best, caseExpr)
  }

  val oracleSql: Map[String, String] = Map(
    "t13_zipf_checkpoints" ->
      s"""WITH tk AS (SELECT unnest(string_split(text,' ')) AS tok
        |            FROM documents),
        |f AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok),
        |r AS (SELECT tok, freq,
        |        row_number() OVER (ORDER BY freq DESC, tok ASC) AS rk
        |      FROM f)
        |SELECT CAST(rk AS INT) AS rk, tok, CAST(freq AS BIGINT) AS freq,
        |  CAST(rk * freq AS BIGINT) AS zipf_product
        |FROM r WHERE rk <= $ZipfMaxRank AND (rk & (rk - 1)) = 0
        |ORDER BY rk""".stripMargin,
    "t12_vocab_growth" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |            FROM documents),
        |dt AS (SELECT doc_id, tok, count(*) AS m FROM tk GROUP BY 1, 2),
        |fs AS (SELECT tok, min(doc_id) AS f FROM dt GROUP BY tok),
        |vc AS (SELECT CASE WHEN f = 0 THEN 1
        |                ELSE CAST(1 AS BIGINT) << length(bin(f)) END
        |           AS checkpoint,
        |         count(*) AS nv
        |       FROM fs GROUP BY 1),
        |tc AS (SELECT CASE WHEN doc_id = 0 THEN 1
        |                ELSE CAST(1 AS BIGINT) << length(bin(doc_id)) END
        |           AS checkpoint,
        |         CAST(sum(m) AS BIGINT) AS nt
        |       FROM dt GROUP BY 1),
        |j AS (SELECT COALESCE(vc.checkpoint, tc.checkpoint) AS checkpoint,
        |        COALESCE(nv, 0) AS nv, COALESCE(nt, 0) AS nt
        |      FROM vc FULL OUTER JOIN tc ON vc.checkpoint = tc.checkpoint)
        |SELECT checkpoint,
        |  CAST(sum(nt) OVER w AS BIGINT) AS n_tokens,
        |  CAST(sum(nv) OVER w AS BIGINT) AS n_vocab,
        |  CAST(CAST(sum(nv) OVER w AS BIGINT) AS DOUBLE)
        |    / CAST(sum(nt) OVER w AS BIGINT) AS ttr
        |FROM j
        |WINDOW w AS (ORDER BY checkpoint
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY checkpoint""".stripMargin,
    "t14_pmi_collocations" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         |u AS (SELECT unnest(w) AS tok FROM t),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c1 FROM u GROUP BY 1),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t FROM uni),
         |bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |         i -> w[i] || ' ' || w[i+1])) AS big
         |       FROM t WHERE len(w) >= 2),
         |cb AS (SELECT big, CAST(count(*) AS BIGINT) AS c2 FROM bg
         |       GROUP BY 1 HAVING count(*) >= $PmiMinCount)
         |SELECT big, c2 AS pair_count, x.c1 AS cx, y.c1 AS cy,
         |  (c2 * t * $PmiScale) // (x.c1 * y.c1) AS pmi_fp
         |FROM cb JOIN uni x ON split_part(big, ' ', 1) = x.tok
         |        JOIN uni y ON split_part(big, ' ', 2) = y.tok, tot
         |ORDER BY pmi_fp DESC, big ASC LIMIT $PmiTopK""".stripMargin,
    "t11_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |         i -> w[i] || ' ' || w[i+1])) AS big
        |       FROM t WHERE len(w) >= 2),
        |db AS (SELECT doc_id, big, count(*) AS m FROM bg GROUP BY 1, 2),
        |cb AS (SELECT big, CAST(sum(m) AS BIGINT) AS c2 FROM db GROUP BY 1),
        |cx AS (SELECT split_part(big, ' ', 1) AS prev,
        |         CAST(sum(c2) AS BIGINT) AS ctx FROM cb GROUP BY 1)
        |SELECT doc_id,
        |  CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m * (length(bin(ctx // c2)) - 1)) AS BIGINT) AS sum_bits,
        |  CAST(sum(m * (length(bin(ctx // c2)) - 1)) AS DOUBLE)
        |    / CAST(sum(m) AS BIGINT) AS avg_bits
        |FROM db
        |JOIN cb USING (big)
        |JOIN cx ON split_part(big, ' ', 1) = cx.prev
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t10_surprisal" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
        |            FROM documents),
        |dt AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        |v AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cnt FROM dt GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM dt)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(c * (length(bin(total // cnt)) - 1)) AS BIGINT) AS sum_bits,
        |  CAST(sum(c * (length(bin(total // cnt)) - 1)) AS DOUBLE)
        |    / CAST(sum(c) AS BIGINT) AS avg_bits
        |FROM dt JOIN v USING (tok), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t9_ngram_diversity" ->
      """WITH docs AS (SELECT doc_id, source, string_split(text,' ') AS w
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |         unnest(list_transform(generate_series(1, len(w)-2),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |       FROM docs),
        |c AS (SELECT source, s, count(*) AS c FROM sh GROUP BY 1, 2)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_total,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(c * (c - 1)) AS DOUBLE)
        |    / CAST(sum(c) AS BIGINT) / (CAST(sum(c) AS BIGINT) - 1)
        |    AS simpson,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_share
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "t8_oov_rate" ->
      s"""WITH u AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS token
         |           FROM documents),
         |cnt AS (SELECT lang, token, count(*) AS cnt FROM u GROUP BY 1, 2),
         |v AS (SELECT lang, token FROM (
         |        SELECT lang, token, row_number() OVER (PARTITION BY lang
         |          ORDER BY cnt DESC, token ASC) AS rk FROM cnt)
         |      WHERE rk <= ${Pipeline.VocabK}),
         |j AS (SELECT u.doc_id, v.token AS vt
         |      FROM u LEFT JOIN v ON u.lang = v.lang AND u.token = v.token)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         |    AS oov_rate
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t5_token_regex" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t1_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_distinct_tokens,
        |  CAST(list_sum(list_transform(string_split(text,' '), t -> len(t))) AS INT) AS n_token_chars,
        |  CAST(list_sum(list_transform(string_split(text,' '), t -> len(t))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality_score" ->
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |r AS (SELECT doc_id,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
         |  CAST(len(list_filter(toks, x -> x IN ($enList))) AS DOUBLE) / len(toks) AS stopword_ratio,
         |  least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS length_score
         |FROM t)
         |SELECT doc_id, distinct_ratio, stopword_ratio, length_score,
         |  distinct_ratio * 0.5 + (1.0 - stopword_ratio) * 0.3 + length_score * 0.2 AS quality_score
         |FROM r ORDER BY doc_id""".stripMargin,
    "t3_lang_id" ->
      s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, string_split(text,' ') AS toks FROM documents),
         |s AS (SELECT doc_id, labeled_lang,
         |  $detectorHits
         |FROM t),
         |b AS (SELECT *, $detectorBest AS best FROM s)
         |SELECT doc_id, labeled_lang, $detectorCase AS detected_lang,
         |  CAST(en_h AS INT) AS en_hits
         |FROM b ORDER BY doc_id""".stripMargin,
    "t15_langid_confusion" -> {
      s"""WITH t AS (SELECT lang AS labeled_lang, string_split(text,' ') AS toks FROM documents),
         |s AS (SELECT labeled_lang,
         |  $detectorHits
         |FROM t),
         |b AS (SELECT *, $detectorBest AS best FROM s),
         |p AS (SELECT labeled_lang, $detectorCase AS detected_lang FROM b),
         |m AS (SELECT labeled_lang, detected_lang, count(*) AS n_docs
         |      FROM p GROUP BY 1, 2),
         |tot AS (SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_lang
         |        FROM m GROUP BY 1)
         |SELECT m.labeled_lang, m.detected_lang, m.n_docs,
         |  CAST(m.n_docs AS DOUBLE) / CAST(tot.n_lang AS DOUBLE) AS share
         |FROM m JOIN tot USING (labeled_lang)
         |ORDER BY m.labeled_lang, m.detected_lang""".stripMargin
    },
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t7_lexical_diversity" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS d,
        |  CAST(len(list_filter(list_distinct(w),
        |    t -> len(list_filter(w, x -> x = t)) = 1)) AS BIGINT) AS hapax,
        |  CAST(list_sum(list_transform(list_distinct(w),
        |    t -> len(list_filter(w, x -> x = t)) * len(list_filter(w, x -> x = t))))
        |    AS BIGINT) AS s2
        |FROM t)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  CAST(d AS DOUBLE) / n AS ttr,
        |  CAST(hapax AS DOUBLE) / n AS hapax_frac,
        |  CAST((s2 - n) * 10000 AS DOUBLE) / (n * n) AS yule_k
        |FROM c ORDER BY doc_id""".stripMargin,
    "t6_length_percentiles" ->
      """WITH t AS (SELECT lang,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  quantile_cont(n_tokens, 0.25) AS p25,
        |  quantile_cont(n_tokens, 0.5) AS p50,
        |  quantile_cont(n_tokens, 0.75) AS p75,
        |  max(n_tokens) AS max_tokens
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
