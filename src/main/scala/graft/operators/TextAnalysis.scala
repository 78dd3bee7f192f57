package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B4 + training-data-pipeline text operators (SURVEY.md §2 Group B):
  * per-document stats, token counting, language ID, quality scoring and
  * fingerprinting over the `documents` table.
  *
  * All pure narrow column expressions (one codegen stage over the scan —
  * no shuffle, embarrassingly parallel at 100 TB). Every formula is written
  * to be bit-deterministic across engines: integer counts, fixed-order
  * double arithmetic, md5 (portable) instead of JVM-specific hashes.
  */
object TextAnalysis {

  /** Whitespace tokens of `text` (documents are single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Language marker words, alphabetical by language code; ties in the
    * argmax resolve in this order (first match wins). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "with", "for"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4"))

  /** Stopword occurrences in one native tokenize pass (MarkerCounts) —
    * same counts as the interpreted `size(filter(tokens, _ IN set))`
    * HOF it replaces (both tokenize on the single literal space). */
  def stopwordCount(text: Column): Column =
    graft.functions.VectorFunctions.markerCounts(text, Seq(Stopwords))
      .getItem(0)

  /** Per-document statistics: lengths, token counts, diversity,
    * whitespace-free char count, stopword hits. All integers or
    * fixed-order double divisions. */
  def textStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("n_nonspace_chars"),
      stopwordCount(col("text")).cast("long").as("n_stopwords"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
      (length(regexp_replace(col("text"), " ", "")).cast("double") / size(toks))
        .as("avg_token_len"))
  }

  /** READABILITY scoring (round 12) — the Flesch reading-ease face of
    * quality scoring (a curation pipeline buckets documents by reading
    * level before mixing): per document, exact integer counts of
    * sentences (maximal `[.!?]+` runs, floored at 1), words (maximal
    * lowercase-letter runs), and syllables (maximal `[aeiouy]+` vowel
    * runs — the classic deterministic heuristic; runs cannot span
    * whitespace so the text-wide count IS the per-word sum), then the
    * Flesch formula 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words) as a FIXED-ORDER double expression — the
    * same operation tree in both engines, so the score is
    * bit-identical (the stats_regression discipline). Wordless
    * documents report NULL (undefined, not a fake 0). Pure narrow
    * expressions — one codegen stage over the scan.
    *
    * Output: (doc_id, n_sentences, n_words, n_syllables, flesch),
    * ordered. */
  def readability(docs: DataFrame): DataFrame = {
    val lowered = lower(col("text"))
    val nS = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val nW = regexp_count(lowered, lit("[a-z]+")).cast("long")
    val nY = regexp_count(lowered, lit("[aeiouy]+")).cast("long")
    docs.select(col("doc_id"), nS.as("n_sentences"), nW.as("n_words"),
        nY.as("n_syllables"))
      .withColumn("flesch", when(col("n_words") > 0,
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double"))))
      .orderBy(col("doc_id"))
  }

  /** GOPHER-STYLE QUALITY GATES (round 12) — the rule battery of
    * large-corpus curation (Rae et al. 2021, "Scaling Language Models:
    * Gopher", public; the repetition/format rules every web-corpus
    * pipeline since has copied), as a per-rule pass/fail AUDIT: how
    * much of the corpus each gate would drop is the first table a
    * curation run reports. Every rule is EXACT INTEGER arithmetic —
    * ratio thresholds compare cross-multiplied counts (3·nw ≤ chars ≤
    * 10·nw, 10·alpha ≥ 8·nw), never a float division — so the whole
    * audit replays bit-for-bit. Rules (booleans per doc, then summed):
    * word count in [minWords, maxWords]; mean word length in [3, 10];
    * ≥ 80% of words contain a letter; ≥ 2 distinct house stopwords
    * (the Gopher "stop word" gate); symbol ('#'/'...') count ≤ 10% of
    * words; and the conjunction. One narrow pass + a 6-row aggregate.
    *
    * Output: (rule, n_pass, n_fail), ordered by rule. */
  def gopherGates(docs: DataFrame, minWords: Int = 50,
                  maxWords: Int = 100000): DataFrame = {
    val toks = tokens(col("text"))
    val nw = size(toks).cast("long")
    val chars = length(regexp_replace(col("text"), " ", "")).cast("long")
    val alphaW = size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(toks),
      typedLit(Stopwords))).cast("long")
    val syms = regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long")
    val r1 = nw.between(minWords.toLong, maxWords.toLong)
    val r2 = (lit(3L) * nw <= chars) && (chars <= lit(10L) * nw)
    val r3 = lit(10L) * alphaW >= lit(8L) * nw
    val r4 = stopHits >= 2L
    val r5 = lit(10L) * syms <= nw
    val rules = Seq(
      ("1_word_count", r1), ("2_mean_word_len", r2),
      ("3_alpha_word_frac", r3), ("4_stopword_hits", r4),
      ("5_symbol_ratio", r5),
      ("6_all", r1 && r2 && r3 && r4 && r5))
    docs.select(explode(array(rules.map { case (name, ok) =>
        struct(lit(name).as("rule"), ok.as("ok")) }: _*)).as("g"))
      .groupBy(col("g.rule").as("rule"))
      .agg(sum(when(col("g.ok"), 1L).otherwise(0L)).as("n_pass"),
        sum(when(col("g.ok"), 0L).otherwise(1L)).as("n_fail"))
      .orderBy(col("rule"))
  }

  /** Token counting: whitespace tokens plus a BPE-ish sub-word proxy —
    * runs of lowercase letters, runs of digits, and single "other"
    * non-space characters (the classic pre-tokenizer split). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
        .as("bpe_ish_tokens"))

  /** TOKENIZER FERTILITY per language (round 13) — subword tokens per
    * whitespace word, THE metric multilingual tokenizer reports lead
    * with (a language whose fertility is 2× pays 2× the context budget
    * and 2× the serving cost for the same text): per declared lang,
    * exact word/subword/char totals off [[tokenCount]]'s shared
    * tokenizations, fertility and chars-per-token as integer ×1000
    * ratios (non-negative — `div` ≡ `//`). One map-side-combinable
    * ≤ langs aggregation; the per-doc leg stays `token_count`'s.
    *
    * Output: (lang, n_docs, words, subword_tokens, chars,
    * fertility_x1000, chars_per_token_x1000), ordered. */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(tokens(col("text"))).cast("long").as("w"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
          .cast("long").as("t"),
        length(col("text")).cast("long").as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
        sum(col("t")).as("subword_tokens"), sum(col("c")).as("chars"))
      .select(col("lang"), col("n_docs"), col("words"),
        col("subword_tokens"), col("chars"),
        expr("CAST((subword_tokens * 1000) div nullif(words, 0L) AS BIGINT)")
          .as("fertility_x1000"),
        expr("CAST((chars * 1000) div nullif(subword_tokens, 0L) AS BIGINT)")
          .as("chars_per_token_x1000"))
      .orderBy(col("lang"))

  /** N-gram-heuristic language ID: count marker-word hits per language,
    * argmax with alphabetical tie-break, 'unknown' when no marker hits.
    * All five languages' counts come from ONE tokenize pass (the native
    * MarkerCounts expression) instead of five interpreted filter-HOF
    * chains — same counts, ~5× less per-row cost. */
  def langId(docs: DataFrame): DataFrame = {
    val mc = graft.functions.VectorFunctions
      .markerCounts(col("text"), LangMarkers.map(_._2))
    val scored = docs
      .select(col("doc_id"), mc.as("mc"))
      .select(
        (col("doc_id") +:
          LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
            col("mc").getItem(i).as(s"s_$lang")
          }): _*)
    val langs = LangMarkers.map(_._1)
    val best = langs.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    // foldRight chains when(...).otherwise(...) in de,en,es,fr,zh order, so
    // the alphabetically-first language wins score ties.
    val pred = langs.foldRight(lit("unknown")) { (l, els) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(els)
    }
    scored.select(col("doc_id"), best.cast("long").as("best_score"),
      pred.as("pred_lang"))
  }

  /** LANG-ID CONFUSION MATRIX (round 13) — the accuracy audit of
    * [[langId]] against the corpus's own `lang` ground-truth column:
    * per (true, predicted) pair, document count and the integer-ppm
    * share of the true language's mass (diagonal share = per-language
    * recall). The audit every langid gate needs BEFORE its threshold
    * is trusted — a language whose mass lands off-diagonal tells you
    * which marker list to grow (the same audit-as-first-class-key
    * doctrine as sim_recall_report / dedup_minhash_est_error). Null
    * ground truth buckets as '__none__' (structural, not dropped).
    * Output: (true_lang, pred_lang, n_docs, share_ppm), ordered. */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val pred = langId(docs).select(col("doc_id"), col("pred_lang"))
    val truth = docs.select(col("doc_id"),
      coalesce(col("lang"), lit("__none__")).as("true_lang"))
    val cm = truth.join(pred, "doc_id")
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = cm.groupBy(col("true_lang"))
      .agg(sum(col("n_docs")).as("n_true"))
    cm.join(tot, "true_lang")
      .select(col("true_lang"), col("pred_lang"), col("n_docs"),
        expr("(n_docs * 1000000) div n_true").as("share_ppm"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  /** QUALITY-MIX MATRIX (round 12) — which sources carry the quality:
    * per source, document counts in the four quarter-bands of the
    * rule-based [[qualityExpr]] score — the table a curation run reads
    * before deciding per-source sampling weights (a source whose mass
    * sits in the bottom band gets down-weighted or gated, and a
    * quality filter's corpus-wide threshold is really a statement
    * about THIS matrix). The score is the engine's own fixed-order
    * expression (weights 0.25·4, the same tree as the `text_quality`
    * oracle), so band edges compare the identical doubles on both
    * engines. Structural: every source emits all four bands.
    *
    * One narrow codegen pass + a (sources×4)-group aggregation. */
  def qualityMix(docs: DataFrame): DataFrame = {
    val q = qualityExpr(col("text"))
    val band = when(q < 0.25, "q0_low")
      .when(q < 0.5, "q1_mid_low")
      .when(q < 0.75, "q2_mid_high")
      .otherwise("q3_high")
    val counts = docs.select(col("source"), band.as("band"))
      .groupBy(col("source"), col("band")).agg(count(lit(1)).as("n_docs"))
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = Seq("q0_low", "q1_mid_low", "q2_mid_high", "q3_high")
      .toDF("band")
    docs.select(col("source")).distinct()
      .crossJoin(broadcast(bands))
      .join(counts, Seq("source", "band"), "left_outer")
      .select(col("source"), col("band"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("source"), col("band"))
  }

  /** CHARACTER-CLASS PROFILE (round 12) — encoding/content forensics
    * per source: the letter/digit/space/other composition of a feed is
    * its fingerprint, and a drifting share (digits spiking → log spam;
    * "other" spiking → mojibake or markup leakage) is the earliest
    * cheap signal a source changed under you. Exact per-class counts
    * from three regexp passes (other = total − the named classes, so
    * the four classes TILE every character by construction) and
    * integer ppm shares. One narrow codegen pass + a per-source
    * map-side-combinable aggregation. */
  def charClassProfile(docs: DataFrame): DataFrame = {
    val nAll = length(col("text")).cast("long")
    val nLet = regexp_count(col("text"), lit("[a-zA-Z]")).cast("long")
    val nDig = regexp_count(col("text"), lit("[0-9]")).cast("long")
    val nSpc = regexp_count(col("text"), lit(" ")).cast("long")
    docs.select(col("source"), nAll.as("c"), nLet.as("l"), nDig.as("d"),
        nSpc.as("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_chars"),
        sum(col("l")).as("n_letters"), sum(col("d")).as("n_digits"),
        sum(col("s")).as("n_spaces"))
      .select(col("source"), col("n_docs"), col("n_chars"),
        col("n_letters"), col("n_digits"), col("n_spaces"),
        (col("n_chars") - col("n_letters") - col("n_digits") -
          col("n_spaces")).as("n_other"),
        expr("CAST((n_letters * 1000000) div nullif(n_chars, 0L) AS BIGINT)")
          .as("letter_ppm"),
        expr("CAST(((n_chars - n_letters - n_digits - n_spaces) * 1000000) " +
          "div nullif(n_chars, 0L) AS BIGINT)").as("other_ppm"))
      .orderBy(col("source"))
  }

  /** LANGUAGE-ID CONFIDENCE AUDIT (round 12) — how much to trust the
    * detector: argmax language ID is only as good as its MARGIN, and a
    * corpus routed to per-language pipelines on tied or one-marker
    * verdicts silently mixes languages. Per predicted language: doc
    * count, ties (best > 0 but the runner-up matched it — the
    * alphabetical tie-break decided, i.e. the verdict carries no
    * signal), strict wins (margin ≥ 1) and the total margin mass — all
    * exact integers from the same one-pass marker counts the detector
    * itself uses, so the audit can never disagree with the routing.
    *
    * Scale shape: one narrow codegen pass + a ≤(langs+1)-group
    * map-side-combinable aggregation. */
  def langIdMargin(docs: DataFrame): DataFrame = {
    val mc = graft.functions.VectorFunctions
      .markerCounts(col("text"), LangMarkers.map(_._2))
    val scored = docs
      .select(col("doc_id"), mc.as("mc"))
      .select(
        (col("doc_id") +:
          LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
            col("mc").getItem(i).cast("long").as(s"s_$lang")
          }): _*)
    val langs = LangMarkers.map(_._1)
    val srt = array_sort(array(langs.map(l => col(s"s_$l")): _*))
    val bestC = langs.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    val pred = langs.foldRight(lit("unknown")) { (l, els) =>
      when(col(s"s_$l") === bestC && bestC > 0, lit(l)).otherwise(els)
    }
    scored
      .select(pred.as("pred_lang"), bestC.as("best"),
        (bestC - element_at(srt, langs.length - 1)).as("margin"))
      .groupBy(col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("best") > 0 && col("margin") === 0L, 1L).otherwise(0L))
          .as("n_tied"),
        sum(when(col("margin") >= 1L, 1L).otherwise(0L)).as("n_strict"),
        sum(col("margin")).as("sum_margin"))
      .orderBy(col("pred_lang"))
  }

  /** Quality score in [0,1] as a composable Column: fixed-order weighted
    * sum of length fitness, type-token diversity, mean-token-length
    * fitness and stopword rate. Weights and clamps written identically
    * in the DuckDB oracle. */
  def qualityExpr(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenOk = when(length(text).between(50, 5000), lit(1.0)).otherwise(lit(0.0))
    val ttr = size(array_distinct(toks)).cast("double") / nTok
    val avgLen = length(regexp_replace(text, " ", "")).cast("double") / nTok
    val avgLenOk = when(avgLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.0))
    val stopRate = stopwordCount(text).cast("double") / nTok
    val stopOk = when(stopRate > 0.0 && stopRate < 0.5, lit(1.0)).otherwise(lit(0.0))
    ((lenOk * 0.25) + (ttr * 0.25)) + ((avgLenOk * 0.25) + (stopOk * 0.25))
  }

  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityExpr(col("text")).as("quality"))

  /** PII scrub: redact email-shaped tokens, long hex-ish identifiers and
    * digit runs — the anonymization pass every training corpus runs.
    * Case-insensitive via explicit [a-zA-Z] classes (portable to RE2
    * without option flags); the HEX rule runs BEFORE the digit-run rule
    * so a hex id containing 4+ consecutive digits is redacted whole
    * rather than fragmented. Pure regexp_replace chain (narrow, codegen).
    * chars_delta can be negative when a replacement tag is longer than
    * the text it replaced. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"),
            "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
          "\\b[0-9a-fA-F]{16,}\\b", "<HEX>"),
        "[0-9]{4,}", "<NUM>")
    docs.select(col("doc_id"), scrubbed.as("scrubbed"),
      (length(col("text")) - length(scrubbed)).cast("long").as("chars_delta"))
  }

  /** PII EXPOSURE REPORT (round 13) — the per-source audit BESIDE
    * [[piiScrub]]'s redaction: match counts per PII class and the
    * share of affected documents, the "which feed is leaking
    * identifiers" readout that decides where scrubbing effort goes
    * (and the regression alarm when a new ingest spikes it). Counts
    * follow the scrub's CASCADE exactly — emails on the raw text, hex
    * ids after email redaction, digit runs after hex redaction — so
    * report and scrub can never disagree on what a match is (a raw
    * per-class count would double-book the digits inside a hex id).
    * Narrow single-pass regexp_extract_all per row, one
    * map-side-combinable per-source aggregation; flagged share in
    * integer ppm (non-negative — `div` ≡ `//`).
    *
    * Output: (source, n_docs, emails, hex_ids, digit_runs,
    * docs_flagged, flagged_ppm), ordered by source. */
  def piiReport(docs: DataFrame): DataFrame = {
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val hexRe = "\\b[0-9a-fA-F]{16,}\\b"
    val numRe = "[0-9]{4,}"
    val t1 = regexp_replace(col("text"), emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, hexRe, "<HEX>")
    docs
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast("long").as("e"),
        size(regexp_extract_all(t1, lit(hexRe), lit(0)))
          .cast("long").as("h"),
        size(regexp_extract_all(t2, lit(numRe), lit(0)))
          .cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e")).as("emails"),
        sum(col("h")).as("hex_ids"),
        sum(col("n")).as("digit_runs"),
        sum(when(col("e") + col("h") + col("n") > 0L, 1L).otherwise(0L))
          .as("docs_flagged"))
      .withColumn("flagged_ppm", expr(
        "CAST((docs_flagged * 1000000) div nullif(n_docs, 0L) AS BIGINT)"))
      .orderBy(col("source"))
  }

  /** Repetition signals — the Gopher-rule family of quality filters
    * (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1,
    * public paper): share of the most frequent token and fraction of
    * repeated word bigrams. High values flag boilerplate / template /
    * keyword-stuffed documents that [[qualityScore]]'s length and
    * stopword heuristics miss; `keep` applies the ≤ 0.2 thresholds.
    *
    * Narrow single-pass like the rest of the file — at 100 TB a
    * relational groupBy(doc_id, token) would shuffle every token in the
    * corpus just to find each doc's mode. Instead the top-token count is
    * the longest run in the SORTED token array (O(n log n) per row, zero
    * shuffle), and bigram distincts come from the native WordShingles
    * expression. Fractions are single divisions of exact integer counts
    * — bit-identical across engines. */
  /** The repetition building blocks as composable Columns (shared by
    * [[repetitionStats]] and the corpus pipeline's gate). The top-token
    * count is the native one-pass hash count (TopTokenCount); the
    * equivalent sorted-run HOF formulation lives in
    * [[topTokenCntHofExpr]] and the spec asserts they agree. */
  def topTokenCntExpr(text: Column): Column =
    graft.functions.VectorFunctions.topTokenCount(text)

  /** The interpreted reference formulation of [[topTokenCntExpr]]:
    * longest run in the sorted token array (the initial prev=""
    * sentinel is harmless — a first empty token takes run = 0+1 = 1
    * through either branch). Kept as the cross-check for the native
    * expression. */
  def topTokenCntHofExpr(text: Column): Column =
    aggregate(
      array_sort(tokens(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  def topTokenFracExpr(text: Column): Column =
    topTokenCntExpr(text).cast("double") / size(tokens(text)).cast("long")

  def dupBigramFracExpr(text: Column): Column = {
    val nBi = greatest(size(tokens(text)).cast("long") - 1L, lit(0L))
    val nBiDistinct =
      size(graft.functions.VectorFunctions.wordShingles(text, 2)).cast("long")
    when(nBi > 0L, (nBi - nBiDistinct).cast("double") / nBi).otherwise(lit(0.0))
  }

  /** The boolean keep gate (both fractions ≤ 0.2). */
  def repetitionKeepExpr(text: Column): Column =
    topTokenFracExpr(text) <= 0.2 && dupBigramFracExpr(text) <= 0.2

  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nBi = greatest(nTok - 1L, lit(0L))
    val nBiDistinct =
      size(graft.functions.VectorFunctions.wordShingles(col("text"), 2))
        .cast("long")
    val topFrac = topTokenFracExpr(col("text"))
    val dupFrac = dupBigramFracExpr(col("text"))
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      topTokenCntExpr(col("text")).as("top_token_cnt"),
      topFrac.as("top_token_frac"),
      (nBi - nBiDistinct).as("dup_bigrams"),
      dupFrac.as("dup_bigram_frac"),
      (topFrac <= 0.2 && dupFrac <= 0.2).as("keep"))
  }

  /** Canonical text normalization — the pass a dedup pipeline runs
    * BEFORE any fingerprinting: Unicode NFC (composed form, via the
    * native [[graft.functions.NfcNormalize]] — "é" stored as e+combining
    * accent must hash like the composed "é" or decomposed twins escape
    * exact dedup), then lowercase, trim, and single-space whitespace
    * collapse. Narrow zero-shuffle projection; `changed` flags rows the
    * normalization actually touched (the usual corpus-health metric). */
  def normalizeText(docs: DataFrame): DataFrame = {
    val norm = regexp_replace(
      trim(lower(graft.functions.VectorFunctions.nfcNormalize(col("text")))),
      " +", " ")
    docs.select(
        col("doc_id"),
        norm.as("text_norm"),
        (norm =!= col("text")).as("changed"))
      .orderBy(col("doc_id"))
  }

  /** HTML BOILERPLATE STRIP (round 13) — the markup-removal pass at
    * the head of every web-corpus pipeline (CCNet/C4 lineage: tags
    * out, entities decoded, text preserved EXACTLY — a stripper that
    * mangles one character poisons dedup keys downstream). The wire is
    * synthesized from the data so the contract is total: each document
    * rendered as nested tags + attributes around the ENTITY-ESCAPED
    * text (& < > wrapped to &amp; &lt; &gt; the way real HTML must).
    * The strip is a fixed chain — tags out via one regex, then entity
    * decode in the ONE correct order (&amp; LAST on decode; decoding
    * it first would double-decode &amp;lt;) — and the per-source
    * summary counts exact recoveries: `n_recovered` < `n_docs` means
    * the stripper corrupted text, not that the corpus changed. Narrow
    * zero-shuffle projections + one bounded rollup.
    *
    * Output: (source, n_docs, n_recovered, wire_chars, text_chars),
    * ordered. */
  def htmlStripRoundTrip(docs: DataFrame): DataFrame = {
    // encode: & first (else the & of &lt; double-encodes)
    val escaped = regexp_replace(regexp_replace(regexp_replace(
      col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    val wire = concat(lit("<html><body class=\"doc\"><p>"), escaped,
      lit("</p><!-- tail --></body></html>"))
    // strip: tags out, then decode — &amp; LAST
    val stripped = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(wire, "<[^>]*>", ""),
      "&lt;", "<"), "&gt;", ">"), "&amp;", "&")
    docs
      .select(col("source"), col("text"), wire.as("w"),
        stripped.as("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s") === col("text"), 1L).otherwise(0L))
          .as("n_recovered"),
        sum(length(col("w")).cast("long")).as("wire_chars"),
        sum(length(col("text")).cast("long")).as("text_chars"))
      .orderBy(col("source"))
  }

  /** Document fingerprints: md5 of the normalized text (exact-dup key) and
    * md5 of the sorted distinct token set (bag-of-words near-dup key). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val bag = array_join(array_sort(array_distinct(tokens(col("text")))), " ")
    docs.select(
      col("doc_id"),
      md5(norm).as("content_fp"),
      md5(bag).as("bag_fp"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD '03 — the
    * MOSS scheme): hash every ORDERED word k-gram, slide a window of
    * `w` consecutive hashes, keep each window's minimum; the distinct
    * selected hashes are the fingerprint set. Guarantee: any shared run
    * of ≥ w+k-1 tokens between two docs contributes at least one COMMON
    * fingerprint, while only ~2/(w+1) of hashes are kept — position-
    * robust partial-overlap detection (quotes, plagiarism, common
    * boilerplate) that md5-of-whole-text cannot give.
    *
    * Engine-portable on purpose: the "hash" is the first 8 hex chars of
    * md5(k-gram) and window minima are LEXICOGRAPHIC string minima —
    * both identical in Spark and DuckDB, so the output is fully
    * oracle-checkable (no cross-engine integer-hash mismatch). The
    * selection runs in the native WinnowFps expression (one JVM loop per
    * doc — the equivalent transform/slice/array_min HOF chain was
    * interpreted per element and 10× slower, §4.3's profiling clause
    * triggered); zero shuffle either way.
    *
    * Output: (doc_id, fp) — one row per distinct selected hash; docs
    * shorter than w+k-1 tokens yield no rows. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")
    docs.select(col("doc_id"),
        explode(graft.functions.VectorFunctions.winnowFps(col("text"), k, w))
          .as("fp"))
      .orderBy(col("doc_id"), col("fp"))
  }

  /** Feature-hash bucket count for [[qualityModel]]. */
  val QmBuckets: Long = 1024L

  /** Hashed-n-gram LINEAR quality scorer (round 10) — the learned-model
    * complement to the rule-based [[qualityScore]], in the fastText
    * linear-classifier lineage (Joulin et al. 2016, "Bag of Tricks for
    * Efficient Text Classification", public paper): features are word
    * unigrams + adjacent bigrams, hashed into [[QmBuckets]] buckets, and
    * the document score is the sum of per-bucket weights over feature
    * OCCURRENCES (count-weighted bag). This is exactly how production
    * quality classifiers run at corpus scale — training happens offline
    * once; the corpus pass applies a fixed weight table.
    *
    * The weight table here is a FIXED deterministic model artifact:
    * weight(b) = (b · 2654435761) mod 2003 − 1001 ∈ [−1001, 1001]
    * (Knuth's multiplicative constant; products < 2^42, exact longs).
    * Deriving the fixture arithmetically instead of shipping a 1024-row
    * literal keeps the model replayable in ANY engine — the DuckDB
    * oracle replays hash, weights and score end-to-end, which a float
    * checkpoint file could never do. The feature hash is the engine-wide
    * portable scheme: first 7 hex chars of md5(feature) (< 2^28, exact)
    * mod [[QmBuckets]].
    *
    * Shape: ONE narrow zero-shuffle pass — the whole feature pipeline
    * (normalize, n-gram, hash, weight, sum) runs in the native
    * [[graft.functions.QmScore]] expression, the same §4.3 promotion as
    * the fingerprint family (the relational explode → conv(md5) →
    * groupBy formulation paid an interpreted hash chain per feature
    * occurrence plus a corpus-sized shuffle — measured 7× slower at
    * sf0.1). Docs whose normalization leaves no tokens score (0, 0)
    * structurally.
    *
    * Output: (doc_id, n_features, score, is_quality = score > 0),
    * ordered by doc_id; all exact integers. */
  def qualityModel(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.VectorFunctions.qmScore(col("text"), QmBuckets)
          .as("qs"))
      .select(col("doc_id"),
        col("qs").getItem(0).as("n_features"),
        col("qs").getItem(1).as("score"),
        (col("qs").getItem(1) > 0L).as("is_quality"))
      .orderBy(col("doc_id"))

  /** LM-PERPLEXITY quality filter (round 11) — the THIRD quality-filter
    * family next to rule-based (`text_quality`) and learned-linear
    * (`text_quality_model`), in the CCNet lineage (Wenzek et al. 2020,
    * public): score each document by a language model trained on the
    * corpus and drop the high-perplexity (gibberish / OCR-noise) tail.
    * Here the LM is a character-bigram model trained on the corpus
    * itself, and −log₂ P(b|a) is replaced by the INTEGER SURROGATE
    * bitlen(c(a)) − bitlen(c(ab)) (bit length = length of bin(x),
    * identical in every engine; the true −log₂ within 1 bit) — the
    * engine's no-transcendentals doctrine, so the whole score replays
    * exactly in SQL. Trained-on-self means every scored bigram was
    * counted: no unseen-event smoothing needed, and a document of
    * improbable bigram sequences still scores high cost — exactly the
    * filter's job.
    *
    * Scale shape: the model is alphabet²-bounded (one map-side-combined
    * count over the exploded bigrams, then a tiny first-char rollup),
    * broadcast back to the corpus-sized bigram stream; per-doc scoring
    * is one partial-aggregated groupBy(doc_id). One corpus explode, one
    * doc-keyed shuffle — the `text_corpus_freq` cost class.
    *
    * Output: (doc_id, n_bigrams, lm_cost, cost_milli = 1000·cost div n)
    * — cost_milli is the length-normalized figure a threshold reads. */
  def lmPerplexity(docs: DataFrame): DataFrame = {
    // round 19: ONE corpus explode instead of two. The (doc_id, bg)
    // count relation below is the shared front of both the model build
    // and the per-doc scoring rollup — the two consumers read the SAME
    // exchange (ReuseExchange dedups the scan + explode + partial agg),
    // where the old shape re-ran the scan and an interpreted
    // transform(sequence(...)) HOF once per consumer. char_bigrams is
    // the native byte-walk drop-in for that HOF (value-identical, so
    // the oracle's substring replay is unaffected). Counts fold exactly:
    // cb = Σ cnt, n_bigrams = Σ cnt, lm_cost = Σ cost·cnt.
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val docBg = docs.select(col("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.charBigrams(col("t")))
          .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val cb = docBg.groupBy(col("bg")).agg(sum(col("cnt")).as("cb"))
    val cu = cb.groupBy(substring(col("bg"), 1, 1).as("u"))
      .agg(sum(col("cb")).as("cu"))
    val model = cb.withColumn("u", substring(col("bg"), 1, 1))
      .join(cu, "u")
      .select(col("bg"),
        (length(bin(col("cu"))) - length(bin(col("cb"))))
          .cast("long").as("cost"))
    docBg.join(broadcast(model), "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cost") * col("cnt")).as("lm_cost"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_cost"),
        expr("(1000 * lm_cost) div n_bigrams").as("cost_milli"))
      .orderBy(col("doc_id"))
  }

  /** INTERPOLATED KNESER-NEY BIGRAM COST (round 15) — the smoothing
    * upgrade over [[lmPerplexity]]'s raw MLE: KN backs off an unseen-
    * context's mass to the CONTINUATION probability (how many distinct
    * contexts a character follows — "Francisco" is frequent but only
    * ever follows "San", so its unigram back-off weight is tiny). With
    * discount D = 3/4, P(v|u) over character bigrams is the exact
    * rational  (T·max(4c(uv)−3, 0) + 3·N1+(u·)·N1+(·v)) / (4·T·c(u))
    * where N1+(u·)/N1+(·v) are the distinct-follower/context counts
    * and T the distinct-bigram-type total — ALL BIGINTs, so the
    * per-bigram cost uses the integer bit-length log2 surrogate
    * (bitlen(den) − bitlen(num), the [[lmPerplexity]]/[[zipfFit]]
    * doctrine) and the whole model replays exactly on any engine. The
    * model is corpus-level (three aggregations over the bounded
    * char-bigram domain, broadcast back); scoring is one broadcast
    * join — no shuffle of the corpus beyond the per-doc rollup.
    *
    * Output: (doc_id, n_bigrams, kn_cost, cost_milli), ordered. */
  def lmKneserNey(docs: DataFrame): DataFrame = {
    // round 19: same single-explode restructure as [[lmPerplexity]] —
    // one shared (doc_id, bg) count relation feeds the KN model stats
    // and the scoring rollup through a reused exchange; char_bigrams
    // replaces the interpreted transform(sequence(...)) HOF.
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val docBg = docs.select(col("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.charBigrams(col("t")))
          .as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val cb = docBg.groupBy(col("bg")).agg(sum(col("cnt")).as("cb"))
      .withColumn("u", substring(col("bg"), 1, 1))
      .withColumn("v", substring(col("bg"), 2, 1))
    val cu = cb.groupBy(col("u"))
      .agg(sum(col("cb")).as("cu"), count(lit(1)).as("nfollow"))
    val cv = cb.groupBy(col("v")).agg(count(lit(1)).as("nprec"))
    val t = cb.agg(count(lit(1)).as("tt"))
    val model = cb.join(cu, "u").join(cv, "v").crossJoin(broadcast(t))
      .select(col("bg"),
        (length(bin(lit(4L) * col("cu") * col("tt"))) -
          length(bin(col("tt") * greatest(lit(4L) * col("cb") - 3L, lit(0L))
            + lit(3L) * col("nfollow") * col("nprec"))))
          .cast("long").as("cost"))
    docBg.join(broadcast(model), "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cost") * col("cnt")).as("kn_cost"))
      .select(col("doc_id"), col("n_bigrams"), col("kn_cost"),
        expr("(1000 * kn_cost) div n_bigrams").as("cost_milli"))
      .orderBy(col("doc_id"))
  }

  /** ZIPF RANK-FREQUENCY FIT (round 12) — the corpus-health audit that
    * catches template spam and synthetic filler: natural language obeys
    * f(r) ∝ r^-α with α ≈ 1, so the least-squares slope of
    * (log rank, log frequency) over the head of the vocabulary should
    * sit near −1 — boilerplate-heavy or machine-generated corpora bend
    * it visibly. Logs use the INTEGER bit-length surrogate
    * (length(bin(x)) — the same `text_lm_perplexity` doctrine), so the
    * regression sums, the normal-equation numerator/denominator, and
    * the milli-slope are all exact BIGINTs that replay on any engine;
    * negative division is sign-split (sign·(abs·1000 div den)) because
    * floor-vs-truncate semantics differ across engines.
    *
    * Scale shape: one word-count aggregation (map-side combinable),
    * TakeOrdered to the `topN` head; the ranking window runs over the
    * LIMITed frame — driver-bounded by construction, never over the
    * open vocabulary. Output is ONE row.
    *
    * den = 0 (all head ranks in one bit-length bucket — a degenerate
    * micro-corpus) yields NULL slope on both engines. */
  /** Vocabulary-head size for [[zipfFit]], shared with the oracle
    * generator (shared-constants doctrine). */
  val ZipfTopN: Int = 1000

  def zipfFit(docs: DataFrame, topN: Int = ZipfTopN): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val top = wf.orderBy(col("f").desc, col("w")).limit(topN)
    val rw = Window.orderBy(col("f").desc, col("w"))
    top.withColumn("r", row_number().over(rw))
      .select(length(bin(col("r"))).cast("long").as("x"),
        length(bin(col("f"))).cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("den"))
      .withColumn("slope_milli",
        expr("CAST(sign(num) AS BIGINT) * ((abs(num) * 1000) div nullif(den, 0L))"))
  }

  /** Collocation head size and support floor, shared with the oracle. */
  val CollocTopK: Int = 20
  val CollocMinCount: Int = 5

  /** COLLOCATION MINING (round 14) — the PMI-family "which word pairs
    * co-occur far beyond chance" extraction (fixed phrases, named
    * entities, domain jargon) that seeds phrase-aware tokenizers and
    * stop-phrase lists. The association score is EXACT-RATIONAL lift
    * instead of log-PMI (lift = P(ab)/(P(a)P(b)) — PMI is its log, and
    * transcendental libm calls are not bit-portable across engines;
    * the ranking is identical since log is monotone): lift_ppm =
    * c_ab·N·10⁶ div (c_a·c_b) with the product in DECIMAL(38,0)
    * (c_ab·N overflows int64 at warehouse token counts). Pairs below
    * [[CollocMinCount]] occurrences are dropped FIRST (rare-pair lift
    * is noise — the standard support floor), then the global top
    * [[CollocTopK]] by (lift_ppm DESC, a, b) surfaces via
    * orderBy+limit — TakeOrdered, driver-bounded, never a global sort.
    *
    * Scale shape: one corpus scan explodes adjacent-pair structs
    * (positions−1 rows/doc, partially aggregated map-side), unigram
    * counts from the same scan shape; the count joins are plain
    * equi-joins on the bigram's words (AQE broadcasts the unigram side
    * iff vocabulary is small — at web scale it shuffles). Rows out =
    * top-k. Output: (a, b, c_a, c_b, c_ab, n_bigrams, lift_ppm). */
  def collocations(docs: DataFrame): DataFrame = {
    val ws = tokens(col("text"))
    // round 19 (guide §4): native adjacent-pair struct walk — the HOF
    // form ran interpreted and re-evaluated split(text) inside the
    // lambda per token; pairs are value-identical (split semantics
    // mirrored exactly, unit-test-pinned)
    val bigrams = docs
      .select(explode(
        graft.functions.VectorFunctions.wordBigramPairs(col("text")))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CollocMinCount)
    val uni = docs.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = docs
      .select(greatest(size(ws) - 1, lit(0)).cast("long").as("m"))
      .agg(sum(col("m")).as("n_bigrams"))
    bigrams
      .join(uni.select(col("w").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("w").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_a"), col("c_b"), col("c_ab"),
        col("n_bigrams"),
        expr(s"CAST((CAST(c_ab AS DECIMAL(38,0)) * n_bigrams * 1000000) " +
          "div (CAST(c_a AS DECIMAL(38,0)) * c_b) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("a"), col("b"))
      .limit(CollocTopK)
  }

  val BurstTopK: Int = 20

  /** TOKEN BURSTINESS (round 16) — Church–Gale's observation made a
    * monitor: content words CLUMP (one document mentions them many
    * times, most never) while function words spread evenly, so the
    * Fano factor F = Var/Mean of the per-document count separates the
    * two at equal total frequency — the corpus-health readout that
    * catches template floods (a boilerplate token reads F ≈ its
    * per-copy count) where raw frequency ([[zipfFit]]'s axis) cannot.
    * Moments are over ALL N documents with zeros included (only the
    * nonzero rows are materialized; the zero mass enters through N):
    * F = (N·Σc² − (Σc)²) / (N·Σc) — exact integer num/den in
    * DECIMAL(38,0) (corpus-scale squares overflow int64), ONE IEEE
    * division. Top [[BurstTopK]] tokens by (total count DESC, token)
    * via TakeOrdered.
    *
    * Output: (token, n_docs, n_docs_with, total_cnt, sum_sq, fano). */
  def burstiness(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val stats = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_docs_with"),
        sum(col("c")).as("total_cnt"),
        sum(col("c") * col("c")).as("sum_sq"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(broadcast(n))
      .select(col("tok").as("token"), col("n_docs"), col("n_docs_with"),
        col("total_cnt"), col("sum_sq"),
        (expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * sum_sq - " +
          "CAST(total_cnt AS DECIMAL(38,0)) * total_cnt AS STRING)")
          .cast("double") /
          expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * total_cnt AS STRING)")
            .cast("double")).as("fano"))
      .orderBy(col("total_cnt").desc, col("token"))
      .limit(BurstTopK)
  }
}
