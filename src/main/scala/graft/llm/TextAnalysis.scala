package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All scalar operators are pure Catalyst column expressions — they stay
  * inside whole-stage codegen, vectorize over parquet scans, and shuffle
  * nothing. At 100 TB these run map-side at scan speed.
  */
object TextAnalysis {

  /** The engine-wide whitespace class: RE2's `\s` (see the contract note
    * on [[graft.functions.WordShinglesUtil]]) — Java regex `\s` would add
    * \x0B and silently diverge from the RE2-based oracles.
    */
  val Ws = " \\t\\n\\f\\r"

  /** Whitespace tokenization (empty-token safe). */
  def tokens(text: Column): Column =
    filter(split(trim(text), s"[$Ws]+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * single non-alphanumeric marks — the classic pre-tokenizer regex.
    */
  val BpeTokenPattern = s"[A-Za-z]+|[0-9]+|[^A-Za-z0-9$Ws]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpeTokenPattern))

  def charCount(text: Column): Column = length(text)
  def punctCount(text: Column): Column = regexp_count(text, lit(s"[^A-Za-z0-9$Ws]"))
  def digitCount(text: Column): Column = regexp_count(text, lit("[0-9]"))

  /** Small multilingual stopword marker lists (public common-word lists). */
  val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por")
  val StopwordsFr = Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour")

  def stopwordCount(text: Column, words: Seq[String] = StopwordsEn): Column = {
    // quote each word: the public Seq[String] invites custom lists, and an
    // unquoted "c++" would count runs of 'c' (the '+' quantifies) while
    // "(" would throw PatternSyntaxException mid-job.
    // Lookarounds, not \b: \b needs a word/non-word TRANSITION at both
    // edges, so a quoted word that starts/ends with a non-word char
    // ("c++", ".net") could never match next to a space — silently
    // counting 0, the exact case the quoting exists for. (?<!\w)/(?!\w)
    // are \b-equivalent for word-char-edged words and correct for the
    // rest. (Custom symbol-edged lists are Spark-side only — RE2-based
    // oracle engines lack lookbehind — the default lists stay portable.)
    val pattern = words.map(java.util.regex.Pattern.quote).mkString("(?<!\\w)(?:", "|", ")(?!\\w)")
    regexp_count(lower(text), lit(pattern))
  }

  /** Quality signals as exact integer counts (deterministic across
    * engines) plus a boolean gate — the filter a data pipeline applies
    * before training-set inclusion.
    */
  def qualitySignals(df: DataFrame, textCol: String, out: String => String = identity): DataFrame = {
    val t = col(textCol)
    df.withColumn(out("word_count"), tokenCount(t))
      .withColumn(out("char_count"), charCount(t))
      .withColumn(out("punct_count"), punctCount(t))
      .withColumn(out("digit_count"), digitCount(t))
      .withColumn(out("stopword_count"), stopwordCount(t))
      .withColumn(
        out("is_quality"),
        // reference the columns just added, never re-derive: each signal
        // is a regex/split pass over the text, and re-deriving would lean
        // on codegen subexpression elimination to avoid scanning every
        // row's text twice on this map-side path
        col(out("word_count")).between(5, 100000) &&
          col(out("punct_count")) * lit(5) < col(out("char_count")) &&
          col(out("stopword_count")) > lit(0)
      )
  }

  /** Within-document repetition signals (the cheap repetition gate a
    * corpus-quality pipeline applies before training-set inclusion):
    * fraction of word occurrences that repeat an earlier word.
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val total = tokenCount(t)
    val distinctWords = size(array_distinct(tokens(t)))
    df.withColumn("word_count", total)
      .withColumn("distinct_word_count", distinctWords)
      .withColumn("repetition_ratio",
        when(total > 0,
          lit(1.0) - distinctWords.cast("double") / total.cast("double"))
          .otherwise(lit(0.0)))
  }

  /** PII redaction patterns — deliberately simple, portable regexes (no
    * backreferences/lookaround, so Java regex and RE2 engines agree).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /** Redact common PII shapes (emails → [EMAIL], IPv4 → [IP], phone-like
    * digit runs → [PHONE]) — codegen'd regexp_replace chain, map-side at
    * scan speed. Order matters: emails first (their local part may look
    * phone-like), then IPs (their digits would otherwise feed the phone
    * pattern), then phones.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, lit(EmailPattern), lit("[EMAIL]"))
    val i = regexp_replace(e, lit(Ipv4Pattern), lit("[IP]"))
    regexp_replace(i, lit(PhonePattern), lit("[PHONE]"))
  }

  /** N-gram rarity signals — the novelty/commonness score of a curation
    * pipeline (a document whose shingles all have high corpus document
    * frequency is boilerplate-like; rare shingles mark novel content).
    * Returns one row per input document: (doc_id, n_shingles, sum_df)
    * where `sum_df` sums the corpus-wide document frequency of the doc's
    * distinct `n`-gram shingles — mean df is `sum_df / n_shingles`,
    * kept as two exact integers so the exchange never touches floats.
    * Documents shorter than `n` tokens report (0, 0).
    *
    * 100 TB shape: the same inverted-index dataflow as the Jaccard
    * pair search WITHOUT its self-join — one shingle explode, one
    * hash-partitioned df aggregation, one join back on the shingle, one
    * per-doc aggregation. Strictly linear; the exploded index is
    * materialized once for its two consumers.
    */
  def ngramRarity(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    perDocUnitSignal(df, idCol, Dedup.shingles(col(textCol), n),
      (freq, _) => freq.select(col("u"), col("freq").as("wt")),
      "n_shingles", "sum_df")

  /** Shared inverted-unit scaffold for corpus-frequency document signals
    * ([[ngramRarity]], [[unigramLogProb]]): explode `unit` per doc,
    * materialize the exploded stream once (it feeds the frequency table
    * AND the per-doc join), weight each occurrence by a per-distinct-unit
    * value derived from the (u, freq) table, and restore EVERY input doc
    * with (count, weight-sum) — zeros for unit-less docs. One explode,
    * one frequency aggregation, one join back, one per-doc aggregation:
    * strictly linear, no self-join.
    */
  private def perDocUnitSignal(
      df: DataFrame,
      idCol: String,
      unit: Column,
      // (u, freq) table -> (u, wt); the thunk yields the corpus-wide
      // occurrence total as a cheap count over the CHECKPOINTED explode
      // (never a second frequency aggregation)
      weigh: (DataFrame, () => Long) => DataFrame,
      nCol: String,
      sumCol: String
  ): DataFrame = {
    val us = df
      .select(col(idCol).as("doc_id"), explode(unit).as("u"))
      .localCheckpoint()
    val weighted = weigh(us.groupBy("u").agg(count(lit(1)).as("freq")), () => us.count())
    val perDoc = us
      .join(weighted, "u")
      .groupBy("doc_id")
      .agg(count(lit(1)).as(nCol), sum("wt").as(sumCol))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col(nCol), lit(0L)).as(nCol),
        coalesce(col(sumCol), lit(0L)).as(sumCol))
  }

  /** Sliding-window document chunking — the "split long documents into
    * context-window-sized pieces with overlap" step of a training-data
    * pipeline. Tokens are the engine-wide whitespace contract
    * ([[tokens]]); chunk `i` covers token positions
    * `[i*stride, i*stride + size)` (0-based), clamped at the document end,
    * so consecutive chunks share `size - stride` tokens. Every chunk start
    * strictly below the token count emits a chunk (the tail chunk may be
    * shorter than `size`); empty/null documents emit nothing.
    *
    * Returns (doc_id, chunk_id, chunk_text, n_tokens).
    *
    * 100 TB shape: pure map-side explode inside whole-stage codegen — no
    * shuffle, no state; output size is input size × (1 + overlap ratio).
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize: chunkSize=$chunkSize stride=$stride")
    val ws = tokens(coalesce(col(textCol), lit("")))
    df.select(col(idCol).as("doc_id"), ws.as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("__ws")) - 1, lit(stride)),
          s => slice(col("__ws"), s + 1, lit(chunkSize)))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** CCNet-style LM quality score from a self-trained unigram LM: each
    * token occurrence scores `ln(tf(w) / N)` where `tf` is the corpus
    * term frequency and `N` the corpus token count; a document's score is
    * the sum over its occurrences (higher = more typical of the corpus,
    * very low = junk/rare-token soup — the perplexity-bucket signal of a
    * quality-filter pipeline, with the corpus itself as the LM).
    *
    * Exchange discipline: each TERM's log-prob is rounded to micros
    * FIRST, then summed as exact integers — integer summation is
    * order-independent, so partition/summation order can never move the
    * result (a post-sum rounding would be at the mercy of float
    * reduction order). The residual cross-engine exposure is libm: a
    * term whose `ln` lands within an ulp of a .5-micros boundary could
    * round differently under a different `log` implementation
    * (~1e-9/term — the same accepted exposure as the BM25 oracle's
    * `ln`). Returns one row per input doc: (doc_id, n_tokens,
    * logprob_micros); empty docs report (0, 0).
    *
    * 100 TB shape: the [[perDocUnitSignal]] scaffold (one explode, one
    * term-frequency aggregation, one join back — vocabulary is
    * Zipf-small, AQE broadcasts it when it fits — one per-doc
    * aggregation). The corpus token count is a single driver scalar
    * (index-build-sized, like the BM25 stats row).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame =
    perDocUnitSignal(df, idCol, tokens(col(textCol)),
      (freq, total) => {
        // total() = 0 on an empty corpus keeps the (empty) select
        // well-formed — no row ever evaluates the division
        val n = total()
        freq.select(col("u"),
          round(log(col("freq").cast("double") / lit(n.toDouble)) * lit(1e6))
            .cast("long").as("wt"))
      },
      "n_tokens", "logprob_micros")

  /** Interpolated bigram-LM document score — the CCNet-style "KenLM
    * perplexity" quality signal, one order up from [[unigramLogProb]]:
    * each bigram occurrence contributes
    * `log(λ·P(w2|w1) + (1−λ)·P(w2))` with `P(w2|w1) = c(w1w2)/c(w1)`,
    * `P(w2) = c(w2)/N` — the unigram interpolation floors unseen-ish
    * continuations exactly like a backoff LM. Per-distinct-bigram micros
    * are rounded BEFORE the per-doc integer sum (the engine-wide
    * exact-exchange rule, same as unigram). Returns
    * (doc_id, n_bigrams, logprob_micros) for EVERY input doc, zeros for
    * docs under two tokens.
    *
    * 100 TB shape: one token explode (checkpointed — feeds the unigram
    * table AND nothing else twice), one bigram explode (checkpointed —
    * feeds the bigram table AND the per-doc join), two Zipf-small
    * frequency tables joined back (AQE broadcasts them when they fit),
    * one per-doc aggregation. Strictly linear, no self-join.
    */
  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.9
  ): DataFrame = {
    // the combined (train-on-self, score-self) path shares ONE token
    // explode and ONE bigram explode between the LM tables and the
    // per-doc join via localCheckpoint
    val toks = df.select(explode(tokens(col(textCol))).as("u")).localCheckpoint()
    val bg = bigramOccurrences(df, idCol, textCol).localCheckpoint()
    scoreOccurrences(df, idCol, bg, lmFromOccurrences(toks, bg, lambda))
  }

  /** Train the interpolated bigram LM alone: (w1, w2, wt) with `wt` the
    * rounded-micros `log(λ·P(w2|w1) + (1−λ)·P(w2))` weight per DISTINCT
    * bigram. At scale the LM is trained once on a reference corpus and
    * [[bigramLmScore]] applied to many batches — persist this output.
    */
  def bigramLmTrain(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lambda: Double = 0.9
  ): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("u")).localCheckpoint()
    lmFromOccurrences(toks, bigramOccurrences(df, idCol, textCol), lambda)
  }

  /** Score documents against an ALREADY-TRAINED bigram LM (the output of
    * [[bigramLmTrain]]): O(batch) work — one bigram explode over the
    * batch, one join against the (Zipf-small, AQE-broadcastable) LM,
    * one per-doc aggregation. Bigrams unseen at training time contribute
    * nothing (inner join) — the interpolation floor lives in the trained
    * weights. Returns (doc_id, n_bigrams, logprob_micros); `n_bigrams`
    * counts SCORED (in-LM) bigram occurrences.
    */
  def bigramLmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lm: DataFrame
  ): DataFrame =
    scoreOccurrences(df, idCol, bigramOccurrences(df, idCol, textCol), lm)

  /** Bigram occurrences WITH multiplicity ([[Dedup.shingles]] is
    * distinct — wrong for an LM); slice+zip keeps it one codegen'd map:
    * pairs (ws[i], ws[i+1]) for i in 0..size-2, empty under two tokens.
    */
  private def bigramOccurrences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = tokens(col(textCol))
    val pairs = when(size(ws) >= 2,
      arrays_zip(
        slice(ws, lit(1), size(ws) - 1).as("w1"),
        slice(ws, lit(2), size(ws) - 1).as("w2")))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    df.select(col(idCol).as("doc_id"), explode(pairs).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }

  private def lmFromOccurrences(toks: DataFrame, bg: DataFrame, lambda: Double): DataFrame = {
    val uni = toks.groupBy("u").agg(count(lit(1)).as("cu"))
    val total = toks.count()
    val bcnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // (1 - lambda) is computed in DOUBLE on both engines — never a
    // decimal literal the oracle can't reproduce bit-for-bit
    bcnt
      .join(uni.select(col("u").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("u").as("w2"), col("cu").as("c2")), "w2")
      .select(col("w1"), col("w2"),
        round(log(
          lit(lambda) * col("cb").cast("double") / col("c1").cast("double") +
            lit(1.0 - lambda) * col("c2").cast("double") / lit(total.toDouble)
        ) * lit(1e6)).cast("long").as("wt"))
  }

  private def scoreOccurrences(
      df: DataFrame, idCol: String, bg: DataFrame, lm: DataFrame): DataFrame = {
    val perDoc = bg.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wt").as("logprob_micros"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_micros"), lit(0L)).as("logprob_micros"))
  }

  /** n-gram-heuristic language ID: count language-marker stopword hits per
    * candidate language plus a CJK character-class check; argmax with a
    * deterministic tie-break (en > de > es > fr by marker count ordering).
    */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, StopwordsEn)
    val de = stopwordCount(text, StopwordsDe)
    val es = stopwordCount(text, StopwordsEs)
    val fr = stopwordCount(text, StopwordsFr)
    val cjk = regexp_count(text, lit("[\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af]"))
    when(cjk > 0, "cjk")
      .when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }
}
