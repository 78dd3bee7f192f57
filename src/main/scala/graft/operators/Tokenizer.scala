package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BPE tokenizer-training statistics — the first merges of a byte-pair
  * encoder learned from the corpus, the tokenizer-side primitive of an
  * LLM data pipeline (every pretraining corpus ships with a tokenizer
  * trained on it).
  *
  * Industrial BPE trainers scale exactly one way: ONE distributed pass
  * aggregates the corpus to (word, count) — after that, training
  * operates on the vocabulary-bounded word table, never on the corpus
  * again. This operator keeps that shape: the corpus-sized shuffle is
  * the word count; every merge iteration is window passes over the
  * positional symbol table (|vocab| × word-length rows), so 100 TB of
  * text and 100 GB of text train at the same per-iteration cost once
  * counts exist.
  *
  * The merge itself is the part engines usually push to a driver loop;
  * here it is RELATIONAL (the fixed-iteration unroll doctrine — same as
  * the IVF trainer and PageRank): a fixed `steps` count is unrolled,
  * and each step is
  *  1. pair statistics: `lead(sym)` per word position, weighted by the
  *     word count — `sum` grouped on the (left, right) symbol pair;
  *  2. the merge pair = rank 1 by (weight DESC, left, right) — a 1-row
  *     frame cross-joined back (broadcast, same gate-frame pattern as
  *     the mixture quotas);
  *  3. greedy left-to-right non-overlapping application as a WINDOW
  *     pass: match positions chain into islands of CONSECUTIVE
  *     positions (only possible for repeated-symbol runs like "aaaa"),
  *     and within an island greedy selection is exactly the
  *     even-offset-from-island-start rows — a parity test, no loop.
  *     Selected rows take the merged symbol, their right neighbors
  *     drop, positions renumber.
  * Exact longs end-to-end: weights are sums of counts, ties break
  * lexicographically — bit-identical in any engine, so the DuckDB
  * oracle replays training verbatim.
  *
  * Output: the top-`topK` candidate pairs per step (rank 1 = the merge
  * the step applied), i.e. the head of the learned merge table plus the
  * runner-up statistics a tokenizer auditor looks at. */
object Tokenizer {

  /** The training chain: per-step ranked pair stats plus the symbol
    * frames before (index 0) and after each merge — shared by the two
    * public views below. Under an enabled [[CacheScope]] each frame is
    * materialized (see the in-loop comment); under [[CacheScope.off]]
    * all frames are lazy plans and consumers pay the chain replay. */
  /** `likelihoodScore = false` ranks merge candidates by raw pair
    * weight (BPE); `true` ranks by the WordPiece likelihood score
    * freq(ab)/(freq(a)·freq(b)) in FIXED-POINT: score = (w·10^9) div
    * (fl·fr), exact BIGINT on both engines (the PageRank scale-10^12
    * doctrine — a float score's last ulp could flip a rank
    * cross-engine). Products fit int64 at this corpus scale (w ≤ total
    * chars ~10^7 → w·10^9 ≤ 10^16; fl·fr ≤ 10^14); at corpora where
    * they would not, the score moves to DECIMAL(38) sums — the
    * stats_regression convention, documented not silently wrong. */
  private def train(docs: DataFrame, steps: Int, topK: Int,
                    scope: CacheScope,
                    likelihoodScore: Boolean = false): (Seq[DataFrame], Seq[DataFrame]) = {
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    // the ONLY corpus-sized job: map-side-combinable word count
    val wc = docs.select(explode(split(norm, " ")).as("word"))
      // whitespace-only documents normalize to one empty "word"; its
      // zero-char split diverges between engines, so gate it out here
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    // Positional symbol table: one row per (distinct word, position).
    // Each step SELF-REFERENCES the table (p joins broadcast(top1),
    // both derived from f), so a lazy chain replays all prior steps
    // per frame — O(steps²) window passes, and the corpus word count
    // re-runs under every replay (measured r9: 15 re-derivations
    // across the two public views; a persist is defeated by
    // DeduplicateRelations re-aliasing the self-join side, the same
    // trap as pageRank's fold). scope.materialize cuts each frame to
    // a vocab-bounded LogicalRDD: one corpus scan total, one window
    // pass per step, consumers read computed blocks. CacheScope.off
    // keeps the fully lazy chain (library default, leak-free).
    var f = scope.materialize(wc.select(col("word"), col("cnt"),
        posexplode(split(col("word"), "")))
      .select(col("word"), col("cnt"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("sym")))
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val rankedSteps = scala.collection.mutable.Buffer.empty[DataFrame]
    val frames = scala.collection.mutable.Buffer(f)
    for (_ <- 1 to steps) {
      val p = f.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val stats0 = p.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("cnt")).as("pair_weight"))
      // the ranking key: raw weight (BPE) or the fixed-point likelihood
      // quotient (WordPiece) — the symbol-frequency frame is
      // alphabet-bounded, so both joins broadcast
      val stats = if (!likelihoodScore)
        stats0.withColumn("score", col("pair_weight"))
      else {
        val sf = f.groupBy(col("sym")).agg(sum(col("cnt")).as("sfreq"))
        stats0
          .join(broadcast(sf.select(col("sym"), col("sfreq").as("fl"))),
            Seq("sym"))
          .join(broadcast(sf.select(col("sym").as("nxt"),
            col("sfreq").as("fr"))), Seq("nxt"))
          .withColumn("score",
            expr("(pair_weight * 1000000000) div (fl * fr)"))
          .select(col("sym"), col("nxt"), col("pair_weight"), col("score"))
      }
      // Round 10 hardening: the global (weight DESC, sym, nxt) rank used
      // to be an unpartitioned row_number window — bounded by alphabet²
      // but still a single-task sort of every candidate pair, the shape
      // that stops scaling when merges/vocab grow. Now the top-K frame
      // comes from orderBy+limit (TakeOrderedAndProject — per-partition
      // partial top-K, then a K-row merge on the driver; no global
      // Exchange, no unpartitioned window), and ranks are recovered
      // WINDOW-FREE by a bounded self-join count over those ≤ K rows
      // ((sym, nxt) is unique, so count-of-better + 1 equals the old
      // row_number under the identical total order).
      val top = scope.materialize(
        stats.orderBy(col("score").desc, col("sym"), col("nxt"))
          .limit(math.max(topK, 1)))
      val better = top.select(col("sym").as("bs"), col("nxt").as("bn"),
        col("score").as("bw"))
      val ranked = top.join(better,
          col("bw") > col("score") ||
            (col("bw") === col("score") &&
              (col("bs") < col("sym") ||
                (col("bs") === col("sym") && col("bn") < col("nxt")))),
          "left")
        .groupBy(col("sym"), col("nxt"), col("pair_weight"), col("score"))
        .agg((count(col("bs")) + 1L).as("rank"))
      rankedSteps += ranked
      val top1 = ranked.filter(col("rank") === 1)
        .select(col("sym").as("mx"), col("nxt").as("my"))
      f = scope.materialize(applyMerge(f, top1))
      frames += f
    }
    (rankedSteps.toSeq, frames.toSeq)
  }

  /** Greedy left-to-right non-overlapping application of ONE merge
    * pair (1-row broadcast frame (mx, my)) to a positional symbol
    * table — the window pass shared by training's per-step merge and
    * the serve-side [[bpeEncodeProfile]]: match positions chain into
    * islands of CONSECUTIVE positions (only possible for
    * repeated-symbol runs like "aaaa"), and within an island greedy
    * selection is exactly the even-offset-from-island-start rows — a
    * parity test, no loop. Selected rows take the merged symbol, their
    * right neighbors drop, positions renumber. */
  private def applyMerge(f: DataFrame, pair: DataFrame): DataFrame = {
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    val p = f.withColumn("nxt", lead(col("sym"), 1).over(wWord))
    val m = p.crossJoin(broadcast(pair))
      // explicit FALSE (not null) on the last position, so the window
      // arithmetic below is null-free on both engines
      .withColumn("im", col("nxt").isNotNull &&
        col("sym") === col("mx") && col("nxt") === col("my"))
      .withColumn("mrk", sum(col("im").cast("long")).over(
        wWord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("island", col("pos") - col("mrk"))
    // island min over match rows only — a non-match row can share the
    // island key and must not shift the parity
    val islMin = min(when(col("im"), col("pos")))
      .over(Window.partitionBy(col("word"), col("island")))
    m.withColumn("sel", col("im") && (col("pos") - islMin) % 2 === 0)
      .withColumn("dropped",
        coalesce(lag(col("sel"), 1).over(wWord), lit(false)))
      .filter(!col("dropped"))
      .select(col("word"), col("cnt"),
        row_number().over(wWord).cast("long").as("pos"),
        when(col("sel"), concat(col("mx"), col("my")))
          .otherwise(col("sym")).as("sym"))
  }

  /** BPE ENCODE profile (round 13) — the SERVING half of the BPE
    * family, completing train/serve symmetry across all three
    * tokenizer lineages (unigram has [[UnigramModel.encodeProfile]],
    * WordPiece has [[wordpieceEncode]]): apply an already-TRAINED
    * model's merge sequence — each step's rank-1 pair, in training
    * order — to NEW text (the deployed shape: the tokenizer trains
    * once on the corpus and spends its life encoding), via the same
    * [[applyMerge]] window pass training used, then report the
    * per-piece-length profile. Σ chars_covered equals the encoded
    * corpus's nonspace character count (merges tile every word — the
    * invariant a tokenizer auditor checks first). Output:
    * (piece_len, n_pieces, occurrences, chars_covered), ordered —
    * the [[UnigramModel.encodeProfile]] contract. */
  def bpeEncodeProfile(model: BpeModel, docs: DataFrame): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val words = docs.select(explode(split(norm, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    var f = words.select(col("word"), col("cnt"),
        posexplode(split(col("word"), "")))
      .select(col("word"), col("cnt"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("sym"))
    for (r <- model.rankedSteps) {
      val pair = r.filter(col("rank") === 1)
        .select(col("sym").as("mx"), col("nxt").as("my"))
      f = applyMerge(f, pair)
    }
    f.groupBy(col("sym")).agg(sum(col("cnt")).as("freq"))
      .groupBy(length(col("sym")).cast("long").as("piece_len"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("freq")).as("occurrences"),
        sum(length(col("sym")).cast("long") * col("freq"))
          .as("chars_covered"))
      .orderBy(col("piece_len"))
  }

  /** Trained BPE state: per-step ranked pair stats plus the symbol
    * frames before (index 0) and after each merge. Train ONCE per
    * (session, corpus) via [[bpeTrain]] and feed every consumer —
    * [[bpeMergeStats]] reads `rankedSteps`, [[bpeCompression]] reads
    * `frames`; the frames are identical for any `topK ≥ 1` (the applied
    * merge is always the rank-1 pair), so one trained model serves both
    * views. The deployed shape: a pipeline trains its tokenizer once
    * and every report reads the trained table. */
  final case class BpeModel private[operators] (
      rankedSteps: Seq[DataFrame], frames: Seq[DataFrame], topK: Int)

  /** Run the training chain once and return the reusable model. Under
    * an enabled scope every frame is materialized (memo-safe:
    * localCheckpoint blocks outlive `scope.release()`); CacheScope.off
    * keeps lazy plans — correct, but consumers replay the chain. */
  def bpeTrain(docs: DataFrame, steps: Int = 3, topK: Int = 5,
               scope: CacheScope = CacheScope.off): BpeModel = {
    val (ranked, frames) = train(docs, steps, topK, scope)
    BpeModel(ranked, frames, topK)
  }

  /** Top-`topK` candidate pairs per training step (rank 1 = the merge
    * the step applied) — the head of the learned merge table. */
  def bpeMergeStats(docs: DataFrame, steps: Int = 3, topK: Int = 5,
                    scope: CacheScope = CacheScope.off): DataFrame =
    bpeMergeStats(bpeTrain(docs, steps, topK, scope), topK)

  /** [[bpeMergeStats]] over an already-trained model. `topK` must not
    * exceed the model's trained topK (the ranked frames are limited). */
  def bpeMergeStats(model: BpeModel, topK: Int): DataFrame = {
    require(topK >= 1 && topK <= model.topK,
      s"topK must be 1..${model.topK}, got $topK")
    model.rankedSteps.zipWithIndex.map { case (r, i) =>
      r.filter(col("rank") <= topK)
        .select(lit((i + 1).toLong).as("step"), col("rank"),
          col("sym").as("left_sym"), col("nxt").as("right_sym"),
          col("pair_weight"))
    }.reduce(_ unionAll _).orderBy(col("step"), col("rank"))
  }

  /** WORDPIECE TRAINING (round 12) — the learning half of the
    * WordPiece family ([[wordpieceEncode]] is the serving half): the
    * BERT-lineage trainer is BPE's merge loop with a different
    * selection rule — the merged pair maximizes the LIKELIHOOD score
    * freq(ab)/(freq(a)·freq(b)) (Wu et al. 2016; the HuggingFace
    * trainer's rule), not the raw pair count, so a rare-but-collocated
    * pair beats a merely-common one. Everything else is the proven
    * [[train]] machinery verbatim: one corpus-sized word count, then
    * window passes over the vocabulary-bounded positional symbol
    * table, island-parity greedy merge application, fixed `steps`
    * unroll. The score is FIXED-POINT — (w·10^9) div (fl·fr), exact
    * BIGINT — so ranks, ties and therefore the entire training replay
    * bit-for-bit in the DuckDB oracle (see [[train]]'s scale note).
    *
    * Output: top-`topK` candidates per step with both the weight and
    * the score that ranked them — (step, rank, left_sym, right_sym,
    * pair_weight, score), ordered. Rank 1 IS the applied merge. */
  def wordpieceTrainStats(docs: DataFrame, steps: Int = 3, topK: Int = 5,
                          scope: CacheScope = CacheScope.off): DataFrame = {
    val (ranked, _) = train(docs, steps, topK, scope, likelihoodScore = true)
    ranked.zipWithIndex.map { case (r, i) =>
      r.filter(col("rank") <= topK)
        .select(lit((i + 1).toLong).as("step"), col("rank"),
          col("sym").as("left_sym"), col("nxt").as("right_sym"),
          col("pair_weight"), col("score"))
    }.reduce(_ unionAll _).orderBy(col("step"), col("rank"))
  }

  /** UNIGRAM tokenizer training (round 10) — the second classic
    * tokenizer family next to BPE, in the SentencePiece unigram-LM
    * lineage (Kudo 2018, "Subword Regularization", public paper):
    * start from a substring seed inventory, alternate E (segment every
    * word optimally under the current piece table) and M (re-estimate
    * piece statistics from the segmentation, prune unused pieces) for a
    * fixed iteration count, and emit the learned vocabulary head.
    *
    * ENGINE-PORTABLE BY CONSTRUCTION: the classic −log-likelihood
    * Viterbi objective is replaced by an integer-exact surrogate —
    * segment cost = n_pieces·10^6 + Σ rank(piece), rank = the piece's
    * 1-based position by (freq DESC, piece ASC) in the current vocab —
    * which keeps the unigram shape (prefer fewer pieces, prefer
    * frequent pieces) while making every comparison a BIGINT compare:
    * no transcendental log whose last ulp differs across engines, so
    * the FULL training (both EM rounds) replays verbatim in DuckDB.
    * The same integer-surrogate discipline as the engine's cosine /
    * z-order / credit arithmetic.
    *
    * Relational shape (the fixed-unroll doctrine, like [[train]]):
    * ONE corpus-sized job — the word count — then everything operates
    * on the vocabulary-bounded word table. The E-step Viterbi is a
    * bounded DP over word positions 1..`maxWordLen` (words truncate to
    * that many chars — the standard trainer cap): position p's best
    * cost is the min over piece lengths k ≤ `maxPieceLen` of
    * best(p−k) + cost(piece ending at p); the backtrack walks p → p−k
    * for ≤ maxWordLen steps emitting the chosen pieces. Since round 13
    * the whole DP runs PER ROW as one `aggregate` higher-order
    * expression with the bounded vocab broadcast as a piece→rank map —
    * one shuffle per E-step (the per-piece usage sum) and zero
    * per-level checkpoint jobs (the round-11/12 relational unroll paid
    * ~24 eager word-bounded jobs per E-step in scheduler overhead).
    * Ranks come from TakeOrdered + a bounded self-join count — NO
    * unpartitioned window anywhere (the round-10 BPE hardening
    * discipline). The few M-step frames are word-table-bounded and
    * materialize unconditionally; there is no CacheScope knob here,
    * which is why these entry points take none.
    *
    * Vocab policy: ALL single characters stay in the table (freq = 0
    * allowed) so segmentation is always feasible; multi-char pieces
    * compete for `vocabMulti` slots by (freq DESC, piece ASC) and drop
    * to zero slots when unused — the unigram PRUNE step. Output: the
    * top `topOut` vocab rows after the final M step,
    * (rank, piece, piece_len, usage), ordered by rank. */
  def unigramVocab(docs: DataFrame, emIters: Int = 2, maxWordLen: Int = 12,
                   maxPieceLen: Int = 3, vocabMulti: Int = 32,
                   topOut: Int = 24): DataFrame =
    unigramTrain(docs, emIters, maxWordLen, maxPieceLen, vocabMulti)
      .vocabHead(topOut)

  /** Trained unigram model: the final ranked vocab (materialized —
    * reading it costs no training work) plus the E-step closure for
    * segmenting under that vocab. Train ONCE per (session, corpus) and
    * let every consumer ([[UnigramModel.vocabHead]],
    * [[UnigramModel.encodeProfile]], downstream encoders) read the
    * shared model — retraining per view repeats the full 2-round EM,
    * the round-10 board's single largest avoidable cost. */
  final class UnigramModel private[operators] (
      val vocab: DataFrame, encodeUsage: DataFrame => DataFrame) {

    /** The learned vocabulary head: top `topOut` rows after the final
      * M step, (rank, piece, piece_len, usage), ordered by rank. */
    def vocabHead(topOut: Int = 24): DataFrame =
      vocab.filter(col("rank") <= topOut)
        .select(col("rank"), col("piece"),
          length(col("piece")).cast("long").as("piece_len"),
          col("freq").as("usage"))
        .orderBy(col("rank"))

    /** Encode-side profile: ONE more Viterbi E-step under the final
      * vocab (the marginal cost of encoding — the training itself is
      * not repeated), aggregated per piece length.
      * Output: (piece_len, n_pieces, occurrences, chars_covered). */
    def encodeProfile(): DataFrame =
      encodeUsage(vocab)
        .select(length(col("piece")).cast("long").as("piece_len"),
          col("piece"), col("freq"))
        .groupBy(col("piece_len"))
        .agg(count(lit(1)).as("n_pieces"),
          sum(col("freq")).as("occurrences"),
          sum(col("piece_len") * col("freq")).as("chars_covered"))
        .orderBy(col("piece_len"))
  }

  /** Run the full 2-round hard-EM training once and return the
    * reusable [[UnigramModel]]. All internal frames are materialized
    * LogicalRDDs (word-table-bounded), so the model is memo-safe: it
    * can be cached per (session, dataset) and read from any number of
    * consumers without replaying training. */
  def unigramTrain(docs: DataFrame, emIters: Int = 2, maxWordLen: Int = 12,
                   maxPieceLen: Int = 3, vocabMulti: Int = 32): UnigramModel = {
    val (vocab, usageUnder) =
      unigramCore(docs, emIters, maxWordLen, maxPieceLen, vocabMulti)
    new UnigramModel(vocab, usageUnder)
  }

  /** ENCODE-side report (round 10): segment the corpus one more time
    * under the FINAL trained vocab (a third Viterbi E-step — exactly
    * what a deployed unigram tokenizer does to every document) and
    * report the per-piece-length profile: distinct pieces used,
    * corpus-weighted occurrences, characters covered. The invariant a
    * tokenizer auditor checks first is EXACT here: Σ chars_covered
    * equals the truncated corpus character count, because Viterbi
    * segmentations tile every word — spec-asserted, and the whole
    * report replays in the oracle (one more unrolled EM block).
    * Output: (piece_len, n_pieces, occurrences, chars_covered). */
  def unigramEncode(docs: DataFrame, emIters: Int = 2, maxWordLen: Int = 12,
                    maxPieceLen: Int = 3, vocabMulti: Int = 32): DataFrame =
    unigramTrain(docs, emIters, maxWordLen, maxPieceLen, vocabMulti)
      .encodeProfile()

  /** Shared trainer core: returns the final ranked vocab and the
    * E-step closure (so [[unigramEncode]] can run one more segmentation
    * pass under the final table). */
  /** Materialize a frame as a computed LogicalRDD. localCheckpoint
    * alone is NOT enough in the DP unrolls: LogicalRDD.fromDataset
    * REWRITES stats from the origin plan, and the size-only visitor
    * MULTIPLIES child sizes at every join — so a chain of checkpointed
    * join layers compounds sizeInBytes into a BigInteger whose bit
    * length grows ~3× per layer. At the encode path's ~36 chained
    * layers the driver burned MINUTES in BigInteger.multiply inside
    * stats rewrite (observed live in round 10). Re-wrapping the
    * checkpointed RDD via createDataFrame resets each frame to a
    * constant default size — layers stop inheriting the product, and
    * the row-encode round-trip is word-bounded noise. */
  private def matFrame(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  private def unigramCore(docs: DataFrame, emIters: Int, maxWordLen: Int,
                          maxPieceLen: Int, vocabMulti: Int)
      : (DataFrame, DataFrame => DataFrame) = {
    require(emIters >= 1 && maxWordLen >= 1 && maxPieceLen >= 1,
      s"need positive emIters/maxWordLen/maxPieceLen")
    val mat: DataFrame => DataFrame = matFrame
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val words = docs.select(explode(split(norm, " ")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(substring(col("w0"), 1, maxWordLen).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("wl", length(col("word")).cast("long"))
    val w = mat(words)
    // seed inventory: every substring occurrence of length 1..maxPieceLen
    val occ = w
      .select(col("word"), col("cnt"), col("wl"),
        explode(sequence(lit(1), col("wl").cast("int"))).as("p"))
      .select(col("word"), col("cnt"), col("p"),
        explode(filter(array((1 to maxPieceLen).map(k =>
          when(col("p") >= k,
            struct(lit(k.toLong).as("k"),
              expr(s"substring(word, p - $k + 1, $k)").as("piece")))): _*),
          x => x.isNotNull)).as("kp"))
      .select(col("word"), col("cnt"), col("p"),
        col("kp.k").as("k"), col("kp.piece").as("piece"))
    val singles = mat(
      occ.filter(col("k") === 1).select(col("piece")).distinct())
    val f0 = occ.groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))

    // vocab assembly + window-free ranking (bounded frames throughout)
    def vocabOf(freqs: DataFrame): DataFrame = {
      val sf = singles.join(freqs, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("freq"), lit(0L)).as("freq"))
      val mf = freqs.filter(length(col("piece")) >= 2)
        .orderBy(col("freq").desc, col("piece")).limit(vocabMulti)
        .select(col("piece"), col("freq"))
      val v = sf.unionByName(mf)
      val b = v.select(col("piece").as("bp"), col("freq").as("bf"))
      mat(v.join(b,
          col("bf") > col("freq") ||
            (col("bf") === col("freq") && col("bp") < col("piece")), "left")
        .groupBy(col("piece"), col("freq"))
        .agg((count(col("bp")) + 1L).as("rank")))
    }

    // E step: Viterbi segmentation → per-piece usage. Round 13: the DP
    // runs PER ROW as one `aggregate` higher-order expression over the
    // word table, with the (bounded, ≤ alphabet + vocabMulti rows)
    // vocab folded into a broadcast 1-row piece→rank map — the
    // round-11/12 shape was a 12-level relational unroll whose ~24
    // eager word-bounded checkpoint jobs per E-step dominated the
    // tokenizer family's wall clock (job-scheduling overhead, not
    // data). Semantics are bit-identical: position p's best cost is
    // the min over k ≤ maxPieceLen of best(p−k) + 10^6 + rank(piece),
    // ties broken by smaller k (the old min(struct(cost, k))), and the
    // backtrack walks p → p−k emitting the chosen pieces — so the
    // unrolled DuckDB oracle replays unchanged. One shuffle per E-step
    // (the final per-piece sum) instead of 24 jobs.
    def usageUnder(vocab: DataFrame): DataFrame = {
      val vm = vocab.agg(map_from_entries(
        collect_list(struct(col("piece"), col("rank")))).as("vmap"))
      // acc[i] = best (cost, k) at position i−1 (acc[1] seeds position
      // 0); try_element_at because ANSI element_at throws on a
      // multi-char substring absent from the vocab map
      val cands = (1 to maxPieceLen).map { k =>
        s"""IF(p >= $k AND try_element_at(vmap, substring(word, p - $k + 1, $k)) IS NOT NULL,
           |  named_struct(
           |    'c', element_at(acc, p - $k + 1).c + 1000000L
           |         + try_element_at(vmap, substring(word, p - $k + 1, $k)),
           |    'k', CAST($k AS BIGINT)),
           |  CAST(NULL AS STRUCT<c: BIGINT, k: BIGINT>))""".stripMargin
      }.mkString(",\n")
      val dp = w.crossJoin(broadcast(vm))
        .withColumn("acc", expr(
          s"""aggregate(
             |  sequence(1, CAST(wl AS INT)),
             |  array(named_struct('c', 0L, 'k', 0L)),
             |  (acc, p) -> concat(acc, array(
             |    array_min(filter(array($cands), x -> x IS NOT NULL)))))""".stripMargin))
        .withColumn("pieces", expr(
          s"""aggregate(
             |  sequence(1, $maxWordLen),
             |  named_struct('p', wl, 'ps', CAST(array() AS ARRAY<STRING>)),
             |  (st, i) -> IF(st.p <= 0L, st, named_struct(
             |    'p', st.p - element_at(acc, CAST(st.p AS INT) + 1).k,
             |    'ps', concat(st.ps, array(substring(word,
             |      CAST(st.p - element_at(acc, CAST(st.p AS INT) + 1).k + 1 AS INT),
             |      CAST(element_at(acc, CAST(st.p AS INT) + 1).k AS INT)))))),
             |  st -> st.ps)""".stripMargin))
      dp.select(col("cnt"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
    }

    var vocab = vocabOf(f0)
    for (_ <- 1 to emIters) vocab = vocabOf(usageUnder(vocab))
    (vocab, usageUnder)
  }

  /** WORDPIECE greedy encode (round 11) — the THIRD classic tokenizer
    * family next to BPE's merge learning and unigram's Viterbi EM: the
    * BERT-lineage longest-match-first segmenter (Wu et al. 2016,
    * public). Inference is deliberately the interesting half here — a
    * deployed WordPiece spends its life encoding, and greedy
    * longest-prefix-match is a DIFFERENT relational shape from the
    * unigram DP: no cost minimization, no backtrack — each step takes
    * the longest vocab piece at the cursor and advances, so the unroll
    * is a plain linear chain of broadcast-vocab joins (maxWordLen
    * steps over the word table), not a position DP.
    *
    * Vocabulary: the SAME deterministic seed inventory the unigram
    * trainer starts from (all single chars + the top `vocabMulti`
    * multi-char substrings by (freq DESC, piece) — the
    * frequency-vocab convention WordPiece shares) — which also lets
    * the oracle reuse the proven unigram base CTEs verbatim. Every
    * character of every word is in the vocab by construction, so
    * segmentation always progresses and no UNK case exists; the
    * ## continuation-marker convention is dropped (pieces are
    * position-agnostic), documented as a deviation.
    *
    * Scale: one corpus-sized word count; the vocab is bounded and
    * broadcast; each greedy step is a broadcast join + word-keyed
    * max — word-table-bounded work, `maxWordLen` times. Frames
    * materialize via [[matFrame]] (linear chain — checkpointing keeps
    * the step count linear for the consumer instead of replaying
    * prefixes).
    *
    * Output: the per-piece-length profile, exactly
    * [[UnigramModel.encodeProfile]]'s contract — (piece_len, n_pieces,
    * occurrences, chars_covered), Σ chars_covered = truncated corpus
    * chars (greedy tiles every word). */
  def wordpieceEncode(docs: DataFrame, maxWordLen: Int = 12,
                      maxPieceLen: Int = 3, vocabMulti: Int = 32): DataFrame = {
    require(maxWordLen >= 1 && maxPieceLen >= 1 && vocabMulti >= 0,
      "need positive maxWordLen/maxPieceLen and nonneg vocabMulti")
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val words = docs.select(explode(split(norm, " ")).as("w0"))
      .filter(length(col("w0")) > 0)
      .select(substring(col("w0"), 1, maxWordLen).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("wl", length(col("word")).cast("long"))
    val w = matFrame(words)
    val occ = w
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), col("wl").cast("int"))).as("p"))
      .select(col("word"), col("cnt"),
        explode(filter(array((1 to maxPieceLen).map(k =>
          when(col("p") >= k,
            expr(s"substring(word, p - $k + 1, $k)"))): _*),
          x => x.isNotNull)).as("piece"))
    val singles = occ.filter(length(col("piece")) === 1)
      .select(col("piece")).distinct()
    val multi = occ.groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .filter(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(vocabMulti)
      .select(col("piece"))
    val voc = broadcast(matFrame(singles.unionByName(multi))
      .withColumn("plen", length(col("piece")).cast("long")))
    var st = w.select(col("word"), col("cnt"), col("wl"), lit(1L).as("p"))
    val emitted = scala.collection.mutable.Buffer.empty[DataFrame]
    for (_ <- 1 to maxWordLen) {
      // a too-long piece's substring comes back short and mismatches,
      // so "fits the remaining suffix" needs no explicit guard; the
      // single-char pieces guarantee every live cursor matches
      val step = matFrame(st.join(voc,
          expr("substring(word, CAST(p AS INT), CAST(plen AS INT)) = piece"))
        .groupBy(col("word"), col("cnt"), col("wl"), col("p"))
        .agg(max(col("plen")).as("k"))
        .withColumn("piece",
          expr("substring(word, CAST(p AS INT), CAST(k AS INT))")))
      emitted += step.select(col("piece"), col("cnt"))
      st = step.select(col("word"), col("cnt"), col("wl"),
        (col("p") + col("k")).as("p")).filter(col("p") <= col("wl"))
    }
    emitted.reduce(_ unionByName _)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .groupBy(length(col("piece")).cast("long").as("piece_len"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("freq")).as("occurrences"),
        sum(length(col("piece")).cast("long") * col("freq"))
          .as("chars_covered"))
      .orderBy(col("piece_len"))
  }

  /** What the merges BUY: corpus-weighted total symbol count and
    * alphabet size at step 0 (characters) and after each merge — the
    * compression-curve head a tokenizer auditor reads first. Each row
    * aggregates one training frame; exact longs, so the curve replays
    * in any engine. */
  def bpeCompression(docs: DataFrame, steps: Int = 3,
                     scope: CacheScope = CacheScope.off): DataFrame =
    bpeCompression(bpeTrain(docs, steps, topK = 1, scope))

  /** [[bpeCompression]] over an already-trained model (the frames are
    * topK-independent — see [[BpeModel]]). */
  def bpeCompression(model: BpeModel): DataFrame = {
    model.frames.zipWithIndex.map { case (fr, i) =>
      // the curve is STRUCTURAL: steps+1 points on any input, an empty
      // corpus reads as zeros (not a vanished curve / null totals)
      fr.agg(coalesce(sum(col("cnt")), lit(0L)).cast("long")
            .as("total_symbols"),
          countDistinct(col("sym")).as("distinct_symbols"))
        .select(lit(i.toLong).as("step"), col("total_symbols"),
          col("distinct_symbols"))
    }.reduce(_ unionAll _).orderBy(col("step"))
  }
}
