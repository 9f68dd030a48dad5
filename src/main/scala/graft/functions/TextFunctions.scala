package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis Column builders for training-data pipelines: tokenization,
  * normalization, fingerprinting, quality scoring, language ID, shingling.
  * All built from codegen'd `org.apache.spark.sql.functions` (no UDFs in the
  * hot path) and kept engine-neutral so DuckDB oracles can mirror them.
  *
  * These extend the reference's surface (its `analyze`/slab content tooling
  * stops at content-type sniffing, CMD_slab_analyze.java:252-314) with the
  * operators a 100TB LLM-data pipeline needs (builder brief; SURVEY.md §7
  * step 9).
  */
object TextFunctions {

  /** Whitespace tokens (single-space split, empties dropped — mirrors
    * DuckDB's `list_filter(string_split(t,' '), x -> x != '')`).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Shannon entropy (nats) of the CHARACTER distribution of `text` — the
    * degenerate-text signal (keyboard mash and repeated-char padding sit
    * far below natural-language entropy; high-entropy base64/hex blobs sit
    * above it). Computed as `ln(n) − Σ k·ln(k) / n` over per-code-point
    * counts by the native codegen'd [[CharEntropy]] expression — a PURE
    * shuffle-free projection inside WholeStageCodegen, so it composes with
    * streaming unchanged. 0 for empty/null text.
    */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CharEntropy(org.apache.spark.sql.graftbridge.Bridge.expression(
        coalesce(text, lit("")))))

  /** Repetition ratio (1 − type/token): the within-document duplication
    * signal training-data filters threshold on (degenerate/generated text
    * repeats tokens). 0 for empty docs.
    */
  def repetitionRatio(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))

  /** Canonical form for content fingerprinting: lowercase, collapse runs of
    * whitespace, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized text (the deterministic
    * exact-dedup key; a rolling-hash variant lives in Dedup.simhash).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  private val punctClass = "[.,!?;:]"
  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, punctClass, ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Stopword tokens / total tokens (counts multiplicity). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = filter(toks, t => t.isin(stopwords: _*))
    size(stops).cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean token length in characters. */
  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: rewards stopword presence (natural
    * prose) and 3-8 char mean word length, penalizes punctuation overload.
    */
  def qualityScore(text: Column): Column = {
    val stopC = least(stopwordRatio(text) * 4.0, lit(1.0))
    val wlen = meanWordLength(text)
    val wlenC = when(wlen >= 3.0 && wlen <= 8.0, 1.0).otherwise(0.5)
    val punctC = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 10.0)
    (stopC * 0.4 + wlenC * 0.3 + punctC * 0.3)
  }

  /** Language markers: distinctive high-frequency function words per
    * language, counted as whole words; CJK presence short-circuits to zh.
    */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|is|of)\\b",
    "de" -> "\\b(der|und|die|nicht)\\b",
    "fr" -> "\\b(le|et|les|est)\\b",
    "es" -> "\\b(el|los|es|una)\\b")

  private def markerCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** N-gram heuristic language ID over {en,de,fr,es,zh}: CJK chars → zh,
    * otherwise the language with the highest marker count (ties resolve in
    * the fixed order above; all-zero → 'und').
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, pat) => lang -> markerCount(text, pat) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score === best && best > 0, lang).otherwise(acc)
    }
    // \x{...} escapes parse identically in Java regex and RE2 (oracle parity)
    when(markerCount(text, "[\\x{4e00}-\\x{9fff}]") > 0, "zh").otherwise(pick)
  }

  /** Word n-gram shingles (space-joined), the MinHash/Jaccard unit.
    * NOTE: evaluates `text` tokenization once per shingle position — prefer
    * `shinglesFromTokens` over a materialized token column in hot paths.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(lower(text)), n)

  /** Shingles from an (already materialized) token-array column. */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** GPT-2-style pretokenizer pattern: contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs. Identical semantics in Java
    * regex and RE2 (no backtracking constructs), so oracles can mirror it.
    */
  val bpePattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** Approximate LLM token count: matches of the BPE-ish pretokenizer. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Fixed-window token chunking for training-sequence preparation: chunk
    * `i` covers tokens `[i*stride, i*stride + maxTokens)` with
    * `stride = maxTokens - overlap`; a window opens only while it
    * contributes ≥1 token beyond the previous one (no pure-overlap tail
    * chunk), so every token lands in ≥1 chunk and consecutive chunks share
    * `overlap` tokens. Pure per-row explode — zero shuffle, fully
    * parallel, and engine-replayable (the chunk is a deterministic slice
    * of the whitespace tokens).
    *
    * Output: (id, chunk_idx INT, n_tokens INT, chunk STRING). Empty/
    * whitespace-only docs yield no chunks.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    df.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0),
          greatest(lit(0),
            floor((size(col("_toks")) - 1 - overlap) / stride)).cast("int")))
          .as("_ci"))
      .select(col(idCol), col("_ci").cast("int").as("chunk_idx"),
        slice(col("_toks"), col("_ci") * stride + 1, lit(maxTokens)).as("_chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).as("n_tokens"),
        concat_ws(" ", col("_chunk")).as("chunk"))
  }

  /** The Gopher stopword set (rule 8 of the Gopher quality filters). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules as per-doc boolean flags (word
    * count 50..100k, mean word length 3..10, symbol-to-word ratio ≤0.1 for
    * `#`/`...`, ≥80% words with an alphabetic char, ≥2 distinct stopwords)
    * plus the conjunction. Pure projection — zero shuffle; every flag is
    * replayable in SQL.
    */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text = empty doc (fails word_count_ok like any short doc) —
    // without this, size(null) = -1 leaks a nonsensical n_words=-1 and a
    // vacuously-true symbol ratio
    val text = coalesce(col(textCol), lit(""))
    val toks = tokens(text)
    val out = df.select(col(idCol), toks.as("_toks"),
      size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0))).as("_syms"))
    val n = size(col("_toks"))
    val mwl = when(n === 0, 0.0).otherwise(
      aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / n.cast("double"))
    val alphaWords = size(filter(col("_toks"), t => t.rlike("[A-Za-z]")))
    val stopHits = size(filter(
      typedLit(gopherStopwords), s => array_contains(col("_toks"), s)))
    val flags = out.select(col(idCol),
      n.as("n_words"), round(mwl, 6).as("mean_word_len"),
      (n >= 50 && n <= 100000).as("word_count_ok"),
      (mwl >= 3.0 && mwl <= 10.0).as("word_len_ok"),
      (col("_syms").cast("double") / greatest(n, lit(1)).cast("double") <= 0.1)
        .as("symbol_ok"),
      (alphaWords.cast("double") / greatest(n, lit(1)).cast("double") >= 0.8)
        .as("alpha_ok"),
      (stopHits >= 2).as("stop_ok"))
    flags.withColumn("passes",
      col("word_count_ok") && col("word_len_ok") && col("symbol_ok") &&
        col("alpha_ok") && col("stop_ok"))
  }

  /** PII patterns, RE2-compatible (no backtracking constructs) so SQL
    * engines replay the redaction byte-for-byte. Order of application
    * matters: emails first (they contain dots and digits), then IPv4,
    * then international-format phone runs.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\+\\d{7,15}"

  /** PII redaction for corpus curation: emails / IPv4s / phone runs
    * replaced with typed placeholders. Pure projection, zero shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** Count of matches for one PII pattern (pre-redaction). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Content-type sniff in the style of slab analyze (json/jsonl/text),
    * string-structural so oracles can mirror it.
    */
  def contentType(text: Column): Column = {
    val t = trim(text)
    when(t.startsWith("{") && t.endsWith("}"), "json")
      .when(t.startsWith("[") && t.endsWith("]"), "json")
      .otherwise("text")
  }
}
