package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Corpus-preparation operators — the steps between raw documents and
  * training batches in a large-scale pipeline: vocabulary building,
  * deterministic sampling, train/test splitting, sequence packing.
  *
  * Determinism doctrine (same as the rest of the engine): anything random
  * is md5-keyed — reproducible, engine-portable, and stable under
  * re-partitioning, unlike rand(seed) whose draw depends on partition
  * layout.
  */
object Corpus {

  /** Top-k corpus vocabulary by term frequency (ties broken by token).
    * Classic explode → count: partial aggregation keeps the shuffle at
    * |vocab| per task, and Spark 4's WindowGroupLimit-equivalent for
    * ORDER+LIMIT takes the top-k without a global sort of the vocab. */
  def vocabulary(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** Top-k word bigrams PER LANGUAGE by document frequency — the
    * corpus-profiling sibling of [[vocabulary]] (df, not raw term
    * frequency: bigrams are distinct-per-doc via the native WordShingles
    * expression, so one keyword-stuffed document can't dominate a
    * language's list).
    *
    * Scale shape: explode → partial-aggregated count (map-side combine
    * keeps the shuffle at |bigram vocab| per task) → per-language top-k
    * via row_number ≤ k, which Spark executes as a WindowGroupLimit
    * (each task keeps k rows per language before the final exchange —
    * never a full sort of the bigram vocabulary). */
  def ngramTopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("df").desc, col("bigram"))
    docs.select(col("lang"),
        explode(graft.functions.VectorFunctions.wordShingles(col("text"), 2))
          .as("bigram"))
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("bigram"), col("df"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** The shared ~12.5% holdout predicate: md5 first hex digit ∈ {0,1}.
    * One definition so sampleDocs and trainTestSplit stay coupled —
    * the sample IS the test split. */
  private[graft] def isHoldout(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1).isin("0", "1")

  /** Deterministic ~12.5% document sample (the holdout bucket).
    * Reproducible under any partitioning (unlike rand()), and the same
    * rows come out of any engine. */
  def sampleDocs(docs: DataFrame): DataFrame =
    docs.filter(isHoldout(col("doc_id"))).orderBy(col("doc_id"))

  /** Deterministic per-source stratified sample: the `perSource` docs
    * with the smallest md5(doc_id) within each source — a fixed-size
    * quota per stratum, unlike [[sampleDocs]]'s fixed-rate holdout.
    * Repartition-stable and engine-portable (same md5-order doctrine as
    * [[mixSources]]); the rank<=k filter plans as WindowGroupLimit, so
    * each task keeps `perSource` rows per stratum before the shuffle —
    * no full per-source sort materializes at corpus scale. */
  def stratifiedSample(docs: DataFrame, perSource: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perSource)
      .select(col("doc_id"), col("source"),
        col("rk").cast("long").as("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))
  }

  /** Deterministic train/test split (≈87.5/12.5) keyed on doc_id. */
  def trainTestSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        when(isHoldout(col("doc_id")), lit("test"))
          .otherwise(lit("train")).as("split"))
      .orderBy(col("doc_id"))

  /** Sequence packing: assign each document (in doc_id order, per source
    * shard) to a training-sequence bin of `seqLen` tokens, by running
    * token count: bin = tokens-before-this-doc div seqLen. Partitioning
    * by shard keeps the window parallel — the pattern that packs a
    * 100 TB corpus without a global sort. */
  def packSequences(docs: DataFrame, seqLen: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $seqLen").as("seq_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Vocabulary-curve head sizes, shared with the oracle generator. */
  val VocabCurveNs: Seq[Int] = Seq(100, 1000, 10000)

  /** VOCABULARY COVERAGE CURVE (round 12) — the vocab-sizing readout:
    * what share of the corpus's token MASS the top-N word types cover
    * at each head size in [[VocabCurveNs]] — the curve a tokenizer
    * budget is read off (the gap between N=1000 and N=10000 is the
    * marginal value of 9000 vocab slots), and the corpus-level dual of
    * `tokenizer_vocab_coverage`'s per-source occurrence view. The
    * `order_pareto` machinery on words: one word-count aggregation,
    * TakeOrdered to the max(N) head (bounded — the ranking window runs
    * over the LIMITed frame), generated conditional sums, integer ppm
    * against the exact total. */
  def vocabCoverageCurve(docs: DataFrame,
                         ns: Seq[Int] = VocabCurveNs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wf = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val total = wf.agg(sum(col("f")).as("total_tokens"),
      count(lit(1)).as("n_types"))
    val top = wf.orderBy(col("f").desc, col("w")).limit(ns.max)
    val rw = Window.orderBy(col("f").desc, col("w"))
    val ranked = top.withColumn("rn", row_number().over(rw))
    val aggs = ns.map(n =>
      sum(when(col("rn") <= n, col("f"))).as(s"c$n"))
    ranked.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ns.map(n =>
        struct(lit(n.toLong).as("head_n"), col(s"c$n").as("tokens_covered"))): _*))
        .as("p"))
      .select(col("p.head_n").as("head_n"),
        col("p.tokens_covered").as("tokens_covered"))
      .crossJoin(broadcast(total))
      .select(col("head_n"), col("n_types"), col("total_tokens"),
        col("tokens_covered"),
        expr("CAST((tokens_covered * 1000000) div nullif(total_tokens, 0L) " +
          "AS BIGINT)").as("coverage_ppm"))
      .orderBy(col("head_n"))
  }

  /** PACKING-EFFICIENCY AUDIT (round 12) — the training-batch numbers
    * behind [[packSequences]]' CONTIGUOUS packing (documents
    * concatenated per source shard and split at seqLen boundaries —
    * no inter-document padding by construction): per source, the
    * sequences the stream produces (ceil(tokens/seqLen)), the
    * tail-padding tokens of the final partial sequence (the only
    * capacity this scheme wastes — fill_ppm reads its share), and
    * n_straddle — documents CROSSING a sequence boundary, the rows a
    * trainer must handle with attention-mask resets or lose to
    * cross-document attention bleed. All exact integers over the SAME
    * running-sum assignment the `seq_pack` key ships. */
  def packEfficiency(docs: DataFrame, seqLen: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("source"), col("n_tokens"),
        // a doc straddles when its first and last token land in
        // different seqLen bins (empty docs never straddle)
        (col("n_tokens") > 0 &&
          expr(s"(cum_tokens - n_tokens) div $seqLen") =!=
            expr(s"(cum_tokens - 1) div $seqLen")).as("straddle"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("straddle"), 1L).otherwise(0L)).as("n_straddle"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_straddle"),
        expr(s"(n_tokens + ${seqLen - 1}) div $seqLen").as("n_seqs"),
        expr(s"((n_tokens + ${seqLen - 1}) div $seqLen) * $seqLen - n_tokens")
          .as("tail_pad_tokens"),
        expr(s"CAST((n_tokens * 1000000) div nullif(" +
          s"((n_tokens + ${seqLen - 1}) div $seqLen) * $seqLen, 0L) AS BIGINT)")
          .as("fill_ppm"))
      .orderBy(col("source"))
  }

  /** Stride/overlap token-window chunking — the step between whole
    * documents and an embedding or context-window pipeline: windows of
    * `chunkSize` whitespace tokens starting every `stride` tokens
    * (overlap = chunkSize − stride). The chunk set is the MINIMAL
    * stride-regular cover — `1 + max(0, ceil((n − chunkSize)/stride))`
    * windows — so a doc at or under one window yields exactly one
    * chunk and no window is fully contained in the previous one; only
    * the last window can be short. Chunk counts stay in integer
    * arithmetic end to end (ceil as `greatest(0, (n − C + S − 1) div
    * S)` — the clamp erases the one case where Spark's
    * truncate-toward-zero `div` and DuckDB's floor `//` disagree, a
    * negative numerator). The chunks are what gets
    * embedded; `embed_meanpool` is the pooling step that folds
    * per-chunk vectors back to one per doc.
    *
    * Purely NARROW: a per-row integer `sequence` posexploded — no
    * shuffle, no window, no state; at 100 TB this rides the parquet
    * scan inside whole-stage codegen and parallelism is the scan's.
    * `chunk_id` is the window ordinal (= chunk_start / stride), so
    * downstream per-chunk ops key on (doc_id, chunk_id) without ever
    * needing a per-doc sort. */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32,
                stride: Int = 24): DataFrame = {
    require(stride >= 1 && chunkSize >= stride,
      s"need 1 <= stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    val n = size(col("toks")).cast("long")
    val lastStart = greatest(lit(0L),
      expr(s"(size(toks) - $chunkSize + ${stride - 1}) div $stride")
        .cast("long")) * stride
    docs
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        posexplode(sequence(lit(0L), lastStart, lit(stride.toLong))))
      .select(
        col("doc_id"), col("source"),
        col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_start"),
        least(lit(chunkSize.toLong), n - col("col")).as("n_tokens"),
        array_join(slice(col("toks"), (col("col") + 1).cast("int"),
          lit(chunkSize)), " ").as("chunk_text"))
  }

  /** Dataset mixture resampling — the corpus-assembly step that turns
    * "whatever crawl ratios we have" into the TARGET source mixture a
    * training run wants (web:books:code = 50:30:20 …): deterministically
    * keep k_s docs of source s with k_s exactly proportional to the
    * integer weight p_s, maximal under per-source availability.
    *
    * Integer-exact on purpose: the multiplier M = min_s floor(n_s / p_s)
    * and quotas k_s = p_s·M stay in BIGINT arithmetic end to end, so the
    * DuckDB oracle computes bit-identical quotas (a double `w·T`
    * formulation would risk ulp-boundary floor() disagreement across
    * engines). Selection within a source is the md5-ordered prefix —
    * reproducible, repartition-stable, engine-portable (same doctrine as
    * [[sampleDocs]]).
    *
    * Scale: one tiny counts aggregation, broadcast quota join, and ONE
    * shuffle by source for the per-source md5 ranking (same cost class
    * as seq_pack's per-shard window). Sources absent from `weights`
    * drop out of the output; a WEIGHTED source absent from `docs`
    * counts as n=0, so M = min_s floor(n_s/p_s) = 0 and the mixture is
    * empty — "maximal under per-source availability" taken literally
    * (an infeasible mixture has no nonempty proportional answer). An
    * empty result from a typo'd weight key is easy to misread as "no
    * data": `requireFeasible = true` runs ONE eager counts aggregation
    * up front and fails naming the scarce/absent source(s) instead of
    * returning empty — opt-in because that eager pass scans the corpus
    * once before the mixture job would anyway. */
  def mixSources(docs: DataFrame, weights: Map[String, Int],
                 requireFeasible: Boolean = false): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive integers")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("source", "p")
    // left join FROM the weights so an absent weighted source still
    // contributes n=0 to the min — never silently renormalized away
    val counts = broadcast(w)
      .join(docs.groupBy(col("source")).agg(count(lit(1)).as("n")),
        Seq("source"), "left")
      .select(col("source"), col("p"), coalesce(col("n"), lit(0L)).as("n"))
    if (requireFeasible) {
      val starved = counts.filter(expr("n div p") === 0L)
        .orderBy(col("source")).limit(5).collect()
      require(starved.isEmpty,
        "infeasible mixture: source(s) " + starved.map(r =>
          s"${r.getString(0)} (n=${r.getAs[Long]("n")}, p=${r.getAs[Int]("p")})")
          .mkString(", ") +
          " cannot supply one weight unit — absent from docs or too small")
    }
    // feasible integer multiplier: units per weight point the scarcest
    // source can supply (1-row aggregate, broadcast to the quota join)
    val m = counts.agg(min(expr("n div p")).as("m"))
    val quota = counts.crossJoin(broadcast(m))
      .select(col("source"), (col("p") * col("m")).as("k"))
    val rk = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(rk))
      .join(broadcast(quota), "source")
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), col("source"), col("rk").cast("long").as("mix_rank"))
      .orderBy(col("source"), col("mix_rank"))
  }

  /** TEMPERATURE-scaled language mixture (round 11) — the multilingual
    * resampling every large multilingual run applies (mT5 / XLM-R
    * lineage: sample q_l ∝ p_l^α with α < 1, public literature):
    * low-resource languages are UP-sampled (repeated across epochs),
    * the head language down-sampled, at constant total budget N =
    * |corpus|. α is fixed at 1/2 and realized through the engine's
    * INTEGER-SURROGATE doctrine (the unigram-cost move): the per-lang
    * weight is floor(√n_l) — sqrt of an exact integer is correctly
    * rounded IEEE in every engine, floor makes it a BIGINT — and the
    * quota is (N·w_l) div Σw, all integer arithmetic, so quotas are
    * bit-identical across engines with no float-sum ordering hazard.
    * A float p^α formulation would hinge on pow()'s last ulp at floor
    * boundaries — exactly the cross-engine trap the surrogate kills.
    *
    * Quota realization with REPETITION (the part plain subsampling
    * cannot express): each language contributes floor(quota/n) full
    * epochs of all its docs plus an md5-prefix selection of
    * (quota mod n) extras — deterministic, repartition-stable. Output
    * is the resampled-corpus MANIFEST: (doc_id, lang, n_copies ≥ 1).
    *
    * Scale: one tiny counts aggregate, broadcast quota join, one
    * per-lang md5 ranking shuffle — [[mixSources]]'s exact cost class. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("w")).as("tw"), sum(col("n")).as("nn"))
    val quota = counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n"), expr("(nn * w) div tw").as("quota"))
      .select(col("lang"), expr("quota div n").as("full"),
        expr("quota % n").as("part"))
    val rk = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(rk))
      .join(broadcast(quota), "lang")
      .withColumn("n_copies",
        col("full") + when(col("rk") <= col("part"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("n_copies"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Per-source corpus profile: doc count, total tokens, distinct
    * languages, distinct tokens — the dataset card every corpus ships
    * with. This is the EXACT form (oracle-checkable): distinct-token
    * counting shuffles the exploded token table once, partially
    * aggregated. At 100 TB swap the exact countDistinct for
    * [[approxCounts]]'s HLL sketch — same query shape, sketch-sized
    * shuffle, bounded relative error (spec-checked ≤ 5% against this
    * exact form). */
  def corpusStats(docs: DataFrame): DataFrame = {
    val perDoc = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
      countDistinct(col("lang")).as("n_langs"))
    val distinctToks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source")).agg(countDistinct(col("tok")).as("distinct_tokens"))
    perDoc.join(distinctToks, "source").orderBy(col("source"))
  }

  /** The sketch form of [[corpusStats]]'s distinct counts:
    * approx_count_distinct (HyperLogLog++, relative error `rsd`). The
    * scale path — per-task sketches merge in O(sketch size), never a
    * distinct-token shuffle. */
  def approxCounts(docs: DataFrame, rsd: Double = 0.02): DataFrame =
    docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_distinct_tokens"))
      .orderBy(col("source"))

  /** The end-to-end corpus-preparation PIPELINE — the stages above
    * composed the way a training run actually consumes them:
    *
    *  1. quality gate: [[TextAnalysis.qualityExpr]] ≥ `minQuality` AND
    *     the repetition gate ([[TextAnalysis.repetitionKeepExpr]]) —
    *     one narrow codegen pass over the scan, no shuffle;
    *  2. exact dedup on the normalized-content fingerprint (same
    *     normalization as [[TextAnalysis.fingerprint]]): smallest doc_id
    *     per identical text survives — ONE shuffle. Running exact-first
    *     is the documented composition for duplicate-heavy corpora: it
    *     collapses identical twins before the (more expensive) near-dup
    *     machinery sees them;
    *  3. near-dup clustering ([[Dedup.nearDupClusters]]) on the
    *     survivors, keeping each cluster's representative;
    *  4. deterministic train/test split (the shared md5 holdout).
    *
    * Output: (doc_id, source, lang, split, quality) for every surviving
    * document. Every stage is engine-portable arithmetic, so the WHOLE
    * pipeline is one DuckDB-oracle-checkable query — the composition is
    * verified end-to-end, not just stage by stage. */
  def corpusPipeline(docs: DataFrame, minQuality: Double = 0.5,
                     nearDupThreshold: Double = 0.5, n: Int = 3,
                     maxDf: Option[Int] = Some(100),
                     scope: CacheScope = CacheScope.off): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val gated = docs
      .withColumn("quality", TextAnalysis.qualityExpr(col("text")))
      .filter(col("quality") >= minQuality &&
        TextAnalysis.repetitionKeepExpr(col("text")))
    // consumed by the shingle pass AND the final join: an enabled scope
    // caches it so the gate expressions + window run once
    val winners = scope.track(gated
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(norm)).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn"))
    // only the SUPPRESSED set is needed (lbl != node — a tiny frame):
    // anti-join it instead of materializing the corpus-wide labeling
    val suppressed = Dedup
      .nearDupLabels(winners, nearDupThreshold, n, maxDf, 20, scope)
      .filter(col("lbl") =!= col("node"))
      .select(col("node").as("doc_id"))
    winners.join(suppressed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"),
        when(isHoldout(col("doc_id")), lit("test")).otherwise(lit("train"))
          .as("split"),
        col("quality"))
      .orderBy(col("doc_id"))
  }

  /** CURATION FUNNEL REPORT (round 14) — the per-stage attrition
    * readout of [[corpusPipeline]], the dashboard every curation run
    * is judged by ("the gate dropped 12%, dedup another 9%, where did
    * my tokens go?"): document and token counts after each stage —
    * ingest → quality+repetition gate → exact dedup → near-dup prune →
    * train split — plus each stage's retention vs INGEST in exact ppm.
    * The stages are the SAME expressions as the pipeline key (gate,
    * winners window, suppressed anti-join, md5 holdout), so the two
    * keys can never disagree about what survived; this one just counts
    * where the pipeline key emits. Per-stage aggregates are one
    * count/sum over each progressively-filtered relation; a shared
    * [[CacheScope]] materializes the gated frame once.
    *
    * Output: (stage_idx, stage, n_docs, n_tokens, docs_ppm), ordered
    * by stage. */
  def funnelReport(docs: DataFrame, minQuality: Double = 0.5,
                   nearDupThreshold: Double = 0.5, n: Int = 3,
                   maxDf: Option[Int] = Some(100),
                   scope: CacheScope = CacheScope.off): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), " +", " ")
    val gated = scope.track(docs
      .withColumn("quality", TextAnalysis.qualityExpr(col("text")))
      .filter(col("quality") >= minQuality &&
        TextAnalysis.repetitionKeepExpr(col("text"))))
    val winners = scope.track(gated
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(norm)).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn"))
    val suppressed = Dedup
      .nearDupLabels(winners, nearDupThreshold, n, maxDf, 20, scope)
      .filter(col("lbl") =!= col("node"))
      .select(col("node").as("doc_id"))
    val kept = winners.join(suppressed, Seq("doc_id"), "left_anti")
    val train = kept.filter(!isHoldout(col("doc_id")))
    def stage(df: DataFrame, idx: Int, name: String) =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(size(split(col("text"), " ")).cast("long")), lit(0L))
          .as("n_tokens"))
        .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    val ingest = stage(docs, 0, "ingest")
    val all = Seq(
      ingest,
      stage(gated, 1, "quality_gate"),
      stage(winners, 2, "exact_dedup"),
      stage(kept, 3, "near_dup"),
      stage(train, 4, "train_split")).reduce(_ unionAll _)
    all.crossJoin(broadcast(
        ingest.select(col("n_docs").as("ingest_docs"))))
      .select(col("stage_idx"), col("stage"), col("n_docs"),
        col("n_tokens"),
        expr("CAST((n_docs * 1000000) div nullif(ingest_docs, 0L) " +
          "AS BIGINT)").as("docs_ppm"))
      .orderBy(col("stage_idx"))
  }

  /** Contamination check — CROSS-SET near-duplicate detection between
    * the train and test splits (the decontamination pass every training
    * corpus runs before evaluation: a test document whose text leaks
    * into training data invalidates the benchmark).
    *
    * Same shared-shingle blocking + exact-Jaccard-verify machinery as
    * Dedup.ngramJaccardPairs, but the candidate join is train-shingles ×
    * test-shingles only — never within a set — so the join output is
    * |train∩test blocking pairs|, not all-pairs. The split itself is the
    * engine's own deterministic md5 holdout ([[trainTestSplit]]), making
    * the whole check reproducible and oracle-expressible. Output:
    * (test_doc, train_doc, jaccard) for jaccard ≥ threshold. */
  def contaminationCheck(docs: DataFrame, threshold: Double = 0.5,
                         n: Int = 3, maxDf: Option[Int] = None): DataFrame = {
    val tagged = docs.withColumn("is_test", isHoldout(col("doc_id")))
    val raw = tagged.select(col("doc_id"), col("is_test"),
      explode(Dedup.shingles(col("text"), n)).as("shingle"))
    // same anti-quadratic knob as Dedup.shingleTable: a stop-shingle
    // shared by train and test would otherwise make the cross join
    // |train_df|×|test_df| on that key (df counted over BOTH sets, so
    // the cap is split-invariant); constant-size count buffers
    val shAll = maxDf match {
      case None => raw
      case Some(cap) =>
        val df = raw.groupBy("shingle").agg(count(lit(1)).as("df"))
        raw.join(df.filter(col("df") <= cap), "shingle")
          .select(col("doc_id"), col("is_test"), col("shingle"))
    }
    val shTrain = shAll.filter(!col("is_test"))
      .select(col("doc_id").as("train_doc"), col("shingle"))
    val shTest = shAll.filter(col("is_test"))
      .select(col("doc_id").as("test_doc"), col("shingle"))
    val sizes = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = shTest.join(shTrain, "shingle")
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      (col("st.sz") + col("sr.sz") - col("n_common"))
    inter
      .join(sizes.as("st"), col("test_doc") === col("st.doc_id"))
      .join(sizes.as("sr"), col("train_doc") === col("sr.doc_id"))
      .select(col("test_doc"), col("train_doc"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("test_doc"), col("train_doc"))
  }

  /** Deterministic per-EPOCH training order — the "shuffle the corpus
    * differently every epoch" step of a training run, WITHOUT a global
    * sort: each document's epoch key is md5(doc_id ":" epoch), ranking
    * happens per source shard (parallel windows), and the global
    * position is rank + the shard's offset (a tiny broadcast of
    * per-shard counts, shards in name order). Two-level numbering is
    * the shape that survives 100 TB: the only corpus-wide ordering
    * materialized is within-shard, and the cross-shard composition is
    * arithmetic over |shards| rows. Same md5 doctrine as the sampling
    * ops: reproducible, repartition-stable, engine-portable — a
    * checkpointed run resumes at position p of epoch e on any cluster
    * layout and reads the identical sequence.
    *
    * Output: (doc_id, source, train_pos) — train_pos is the 0-based
    * global position of the doc in epoch `epoch`'s order. */
  def epochOrder(docs: DataFrame, epoch: Int = 1): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val ek = md5(concat(col("doc_id").cast("string"), lit(s":$epoch")))
    val rk = Window.partitionBy(col("source")).orderBy(ek, col("doc_id"))
    val ranked = docs.select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(rk).cast("long"))
    // per-shard offsets: exclusive running total of counts in shard
    // name order — |shards| rows, broadcast into the final projection
    val offsets = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("source"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("off"))
    ranked.join(broadcast(offsets), "source")
      .select(col("doc_id"), col("source"),
        (col("off") + col("rk") - 1).as("train_pos"))
      .orderBy(col("train_pos"))
  }

  /** VOCAB-COVERAGE report (round 11) — the first table of every
    * tokenizer card: what share of token OCCURRENCES a fixed
    * `vocabSize` vocabulary covers, per source (the per-source split
    * is the point — a vocab trained on web text covers code or
    * another language badly, and this is where that shows). Vocab =
    * the global top-`vocabSize` tokens by (freq DESC, token) — the
    * [[vocabulary]] convention — selected via TakeOrdered and
    * broadcast; coverage is a narrow membership join + one
    * map-side-combinable per-source aggregation; OOV distinct counts
    * ride along (the "how many new pieces would we need" column).
    *
    * Output: (source, n_tokens, n_covered, n_oov_types, coverage),
    * ordered. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 32): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val toks = docs.select(col("source"),
      explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab"), 1L).otherwise(0L)).as("n_covered"),
        countDistinct(when(!coalesce(col("in_vocab"), lit(false)),
          col("tok"))).as("n_oov_types"))
      .withColumn("coverage",
        col("n_covered").cast("double") / col("n_tokens"))
      .orderBy(col("source"))
  }

  /** TOKEN-BUDGET prefix cut (round 11) — "train on exactly N tokens":
    * every pretraining run cuts its corpus to a budget, and the cut
    * must be DETERMINISTIC (same corpus + budget ⇒ same training set,
    * run to run, engine to engine). Per source shard, documents line
    * up in the [[epochOrder]] md5 order (a per-shard uniform shuffle
    * that is a pure function of the data) and the shard keeps its
    * prefix while the RUNNING token total stays within the shard
    * budget — a partitioned cumulative-sum window (per-shard sort, the
    * sessionize discipline), then one bounded per-shard summary.
    * Boundary rule: a document is kept iff its own cumulative total
    * fits — the first over-budget document is cut entirely (no partial
    * documents; the seq_pack family handles sub-document packing).
    *
    * Output: (source, n_docs, n_kept, tokens_total, tokens_kept,
    * budget, fill), ordered by source; `fill` is one IEEE division. */
  def tokenBudgetPrefix(docs: DataFrame,
                        budgetPerShard: Long = 2000L): DataFrame = {
    require(budgetPerShard >= 0, "budget must be nonnegative")
    val ek = md5(concat(col("doc_id").cast("string"), lit(":budget")))
    val toks = size(split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(ek, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col("doc_id"), col("source"), toks.as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("kept", col("cum") <= budgetPerShard)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tokens_total"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("budget", lit(budgetPerShard))
      .withColumn("fill",
        col("tokens_kept").cast("double") / budgetPerShard)
      .orderBy(col("source"))
  }

  /** TRAINING-SHARD PLAN (round 15) — the sequential-fill sharding a
    * pretraining data loader consumes: within each source, walk docs
    * in doc_id order and open a new shard every time the RUNNING token
    * total crosses `budgetPerShard` — shard = (cum − n_tok) div budget,
    * the first-fit rule where a straddling doc lands in the shard its
    * FIRST token falls in (shards overfill by at most one doc, never
    * underfill — the loader-friendly invariant, vs [[tokenBudgetPrefix]]
    * which CUTS at the budget). The cumulative window is partitioned
    * by source (the sessionize discipline — never a global sort); the
    * summary is one bounded per-(source, shard) rollup.
    *
    * Output: (source, shard_id, n_docs, tokens, first_doc, last_doc),
    * ordered. */
  def shardPlan(docs: DataFrame,
                budgetPerShard: Long = 2000L): DataFrame = {
    require(budgetPerShard > 0, "budget must be positive")
    val toks = size(split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.select(col("doc_id"), col("source"), toks.as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard_id",
        expr(s"(cum - n_tok) div ${budgetPerShard}L"))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard_id"))
  }

  /** Corpus-relative token-frequency score — the FREQUENCY FILTER of a
    * web-corpus pipeline, complementing [[TextAnalysis]]'s doc-local
    * quality gates: a document dominated by tokens the corpus has never
    * seen (OCR noise, mojibake, binary-as-text) scores LOW on mean
    * corpus frequency, while a document of nothing but stop-tokens
    * scores suspiciously HIGH — both tails are what the filter trims.
    * Two corpus-wide passes: vocabulary counts (one map-side-combined
    * shuffle, |vocab| keys), then a join back to the exploded tokens.
    * The join's build side is ONE row per token, so Zipf heavy-hitters
    * skew only the probe side — AQE's skew handling (or a broadcast
    * when the vocab fits) keeps it balanced; nothing here is
    * all-pairs. Exact integers end-to-end: n_tokens and sum_freq are
    * longs, mean_freq is one double division of exact operands —
    * bit-identical in any engine. */
  def corpusFreqScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    toks.join(vocab, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("sum_freq"))
      .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast("double") / col("n_tokens")).as("mean_freq"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF keyword extraction (round 11) — the retrieval-era "what is
    * this document about" primitive (and the feature behind
    * `search_rank`'s scoring, surfaced per document): top-3 tokens per
    * doc by tf·idf. The transcendental log idf is replaced by the
    * engine's integer BIT-LENGTH surrogate (the `text_lm_perplexity`
    * doctrine): idf⁺ = bitlen(N div df) − 1 — zero for a token in
    * every document (stopwords self-suppress), growing one unit per
    * rarity doubling, exact BIGINT in any engine. score = tf · idf⁺,
    * ties by token asc; zero-scoring tokens never surface.
    *
    * Scale: one corpus-sized (doc, tok) aggregation, a vocab-sized df
    * table joined back on the token key (map-side-combinable both
    * sides), and a per-doc rank window whose partition is one
    * document's vocabulary — never a global sort.
    *
    * Output: (doc_id, rank, token, tf, df, score), rank ≤ 3,
    * ordered. */
  def tfidfKeywords(docs: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (length(bin(expr("n_docs div df"))).cast("long") - 1))
      .filter(col("score") > 0)
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("tok"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("tok").as("token"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** TOKEN-LEVEL benchmark decontamination — the standard 13-gram pass
    * run alongside [[contaminationCheck]]'s whole-doc Jaccard: report
    * every (test, train) pair sharing at least one verbatim k-token
    * passage. This is the whole-doc check's documented blind spot: a
    * benchmark question pasted into one LONG training document shares a
    * handful of shingles that drown in the big doc's total (Jaccard ≈ 0
    * — never flagged), while the verbatim run of ≥ k tokens is caught
    * here by construction.
    *
    * Machinery: the k-gram hash set per doc IS [[TextAnalysis
    * .winnowFingerprints]]'s selection with window w = 1 (every window
    * of one gram is its own minimum, so "window minima" degenerates to
    * ALL distinct gram hashes) — one native-expression pass, no extra
    * code path, and the same normalize→gram→md5-prefix contract the
    * DuckDB oracle replays. The cross-set equi-join on the gram hash is
    * shuffle-partitionable; `maxDf` drops grams appearing in more than
    * that many docs (df counted over BOTH splits, so the cap is
    * split-invariant) — the same anti-quadratic knob as
    * [[contaminationCheck]], because a boilerplate gram shared by half
    * the corpus must not cross-join train × test on one key.
    *
    * Output: (test_doc, train_doc, n_shared) — the count of distinct
    * shared k-gram hashes — ordered. */
  def contaminationNgrams(docs: DataFrame, k: Int = 13,
                          maxDf: Option[Int] = Some(100),
                          scope: CacheScope = CacheScope.off): DataFrame = {
    val tagged = docs.withColumn("is_test", isHoldout(col("doc_id")))
    // with maxDf set, `raw` feeds BOTH the df aggregation and the join
    // probe — scope-persist it so the full normalize→gram→hash pass over
    // the corpus runs once, not twice (same multi-consumer pattern as
    // simHashNearDupPairs; CacheScope.off falls back to recompute);
    // single-consumer when maxDf is None, so nothing to track then
    val rawBase = tagged.select(col("doc_id"), col("is_test"),
      explode(graft.functions.VectorFunctions.winnowFps(col("text"), k, 1))
        .as("fp"))
    val raw = if (maxDf.isDefined) scope.track(rawBase) else rawBase
    val capped = maxDf match {
      case None => raw
      case Some(cap) =>
        val df = raw.groupBy("fp").agg(count(lit(1)).as("df"))
        raw.join(df.filter(col("df") <= cap), "fp")
          .select(col("doc_id"), col("is_test"), col("fp"))
    }
    val te = capped.filter(col("is_test"))
      .select(col("doc_id").as("test_doc"), col("fp"))
    val tr = capped.filter(!col("is_test"))
      .select(col("doc_id").as("train_doc"), col("fp"))
    te.join(tr, "fp")
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("test_doc"), col("train_doc"))
  }

  /** Deterministic WEIGHTED Bernoulli sample — inclusion probability
    * proportional to document length (p_i = min(1, n_tokens/`denom`)),
    * the size-biased draw a token-budgeted corpus selection actually
    * wants (sampling docs uniformly under-represents long documents'
    * tokens). Entirely integer: keep doc iff
    * `md5_28(doc_id) * denom < n_tokens << 28` — the 28-bit md5 prefix
    * plays the uniform draw, so the decision is exact, engine-portable,
    * and repartition-stable (the `sampleDocs` doctrine with a weighted
    * threshold). Emits the inclusion probability as an exact rational
    * (p_num/p_den) so downstream Horvitz–Thompson reweighting divides
    * once, in the consumer's precision, not ours.
    *
    * Narrow: a per-row filter riding the scan — no shuffle at any
    * corpus size. */
  def sampleWeighted(docs: DataFrame, denom: Int = 400): DataFrame = {
    require(denom > 0, s"denom must be positive, got $denom")
    val nTokens = size(split(col("text"), " ")).cast("long")
    val hash28 = graft.functions.VectorFunctions
      .md5HexPrefix(col("doc_id").cast("string"), 7)
    docs.select(col("doc_id"), nTokens.as("n_tokens"), hash28.as("h"))
      .filter(col("h") * denom < (col("n_tokens") * (1L << 28)))
      .select(col("doc_id"), col("n_tokens"),
        least(col("n_tokens"), lit(denom.toLong)).as("p_num"),
        lit(denom.toLong).as("p_den"))
      .orderBy(col("doc_id"))
  }

  /** Inverted index — token → ordered posting list, the retrieval-side
    * complement of [[vocabulary]]: per-token document frequency, total
    * term frequency, and an md5 digest of the full `(doc_id:tf)` posting
    * list in doc_id order, built for the `k` RAREST tokens (ascending
    * (df, tok) — the discriminative end of the vocabulary, which is the
    * end retrieval actually probes). The selection is structural, not
    * cosmetic: df is computed FIRST (a map-side-combinable aggregate,
    * vocab-sized — the same relation [[vocabulary]] already sorts) and
    * only the chosen tokens reach the list-building shuffle, so no task
    * ever materializes a stop-word's corpus-wide posting list — rarest-k
    * means the lists that ARE built are the corpus's smallest, the bound
    * that keeps the build alive at 100 TB. Digest instead of raw array
    * keeps the row width fixed; a consumer wanting the list re-derives
    * it from the tf relation for its shard. */
  def invertedIndex(docs: DataFrame, k: Int = 50): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .orderBy(col("df"), col("tok")).limit(k)
    val postings = tf.join(df.select(col("tok")), Seq("tok"), "left_semi")
      .groupBy(col("tok"))
      .agg(md5(concat_ws(",",
        transform(
          sort_array(collect_list(struct(col("doc_id"), col("tf")))),
          e => concat(e("doc_id").cast("string"), lit(":"),
            e("tf").cast("string")))))
        .as("postings_md5"))
    df.join(postings, "tok")
      .select(col("tok"), col("df"), col("tf_total"), col("postings_md5"))
      .orderBy(col("tok"))
  }

  /** Term-weighted retrieval ranking — the QUERY side of
    * [[invertedIndex]]: score every document for a fixed term set by
    * `Σ_t tf(d,t) · N / df(t)` (rare terms weigh more — linear idf
    * instead of `log(N/df)` because both engines' `ln` is libm-specific
    * while IEEE multiply/divide are correctly rounded and bit-portable;
    * the RANKING is idf-faithful, the weights are exact) and keep the
    * global top `k` by (score desc, doc_id). Score arithmetic is
    * determinism-by-construction: integer tf·N exact in a double, ONE
    * correctly-rounded division per term, additions in fixed
    * left-to-right order on both engines.
    *
    * Shapes: the token scan filters to the term set AT THE SCAN (an
    * `isin` pushed into the narrow pass — the corpus's non-query tokens
    * never reach any shuffle), one map-side-combinable groupBy(doc)
    * for tfs, a `terms`-row aggregate pivoted to a broadcast 1-row
    * gate frame for dfs, and a global top-k (TakeOrdered — k rows per
    * task cross to the driver, not the corpus). */
  def searchRank(docs: DataFrame,
                 terms: Seq[String] = Seq("data", "line", "dup"),
                 k: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8,
      s"terms must be 1..8 literals, got ${terms.size}")
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tfs = toks.groupBy(col("doc_id"))
      .agg(sum(when(col("tok") === terms.head, 1L).otherwise(0L))
          .as(s"tf_${terms.head}"),
        terms.tail.map(t =>
          sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"tf_$t")): _*)
    val dfs = toks.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val dfFrame = dfs.agg(
      max(when(col("tok") === terms.head, col("df"))).as(s"df_${terms.head}"),
      terms.tail.map(t =>
        max(when(col("tok") === t, col("df"))).as(s"df_$t")): _*)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val score = terms.map(t =>
      (col(s"tf_$t") * col("n_docs")).cast("double") / col(s"df_$t"))
      .reduce(_ + _) // fixed left-to-right order: bit-portable
    tfs.crossJoin(broadcast(dfFrame)).crossJoin(broadcast(nDocs))
      .withColumn("score", score)
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** HAPAX RATIO per source (round 15) — the share of each shard's
    * vocabulary that occurs EXACTLY ONCE in it: the
    * lexical-richness/noise scalar a corpus review reads next to
    * [[vocabulary]] (natural prose runs ~40–60% hapax by Zipf; far
    * below smells template flood, far above smells OCR noise or ID
    * spray — either way, the shard needs a look before training).
    * Whitespace tokens (the [[vocabulary]] convention); exact integer
    * counts: (source, token) term frequencies, then per-source vocab /
    * hapax counts, ratio in ppm.
    *
    * Output: (source, n_tokens, vocab, hapax, hapax_ppm), ordered. */
  def hapaxRatio(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("f"))
    tf.groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        expr("(hapax * 1000000) div nullif(vocab, 0L)").as("hapax_ppm"))
      .orderBy(col("source"))
  }

  /** YULE'S K per source (round 16) — the classic repeat-rate
    * characteristic beside [[hapaxRatio]]'s once-only share: K =
    * 10⁴·(M₂ − M₁)/M₁² over the term-frequency spectrum (M₁ = token
    * count, M₂ = Σf²), Yule's length-invariant "how repetitive is this
    * text" constant (natural prose ~100–200; template/boilerplate
    * floods read far higher — the duplication smell at the TOKEN grain
    * where dedup works at the document grain). EXACT-RATIONAL
    * throughout: M₂ and M₁² in DECIMAL(38,0) (squared warehouse-scale
    * token counts overflow int64), K in exact milli via one integral
    * division — M₂ ≥ M₁ always, so the non-negative `div` ≡ `//`.
    * Same (source, token) tf relation as hapax — map-side combinable.
    *
    * Output: (source, n_tokens, vocab, yule_k_milli), ordered. */
  def yuleK(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val tf = docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("f"))
    tf.groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("f").cast(dec) * col("f")).as("m2"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        expr("CAST(((m2 - n_tokens) * 10000000) div " +
          "nullif(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens, 0) " +
          "AS BIGINT)").as("yule_k_milli"))
      .orderBy(col("source"))
  }

  /** CROSS-SOURCE DUPLICATE MATRIX (round 15) — which shard pairs
    * share the same document OPENINGS: per (source_a < source_b), the
    * count of distinct first-8-token prefix fingerprints present in
    * both — the mirror-site / shared-template / re-crawl detector that
    * `quality_dup_rate` (within-shard) cannot see, and the input to a
    * dedup plan's source-priority order. Prefix fingerprints rather
    * than whole-text md5 deliberately: mirrored corpora mutate
    * trailing boilerplate while openings survive, so the prefix key
    * catches leakage an exact-text key misses entirely. One distinct
    * (source, fingerprint) relation self-joined on the hash — per-key
    * fan-out is bounded by the SOURCE domain (≤ |S| rows per hash), so
    * the join never goes quadratic in docs.
    *
    * Output: (source_a, source_b, n_shared), pairs with ≥ 1 shared
    * prefix, ordered. */
  def crossSourceDupMatrix(docs: DataFrame): DataFrame = {
    val h = docs
      .select(col("source"),
        md5(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("h"))
      .distinct()
    h.select(col("source").as("source_a"), col("h"))
      .join(h.select(col("source").as("source_b"), col("h")), "h")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** SOURCE TOTAL-VARIATION MATRIX (round 15) — how differently two
    * shards USE language, as one number per pair: total-variation
    * distance between per-source unigram distributions over the global
    * top-`topN` vocabulary + one OOV bucket (the grid-bound doctrine —
    * the cell set is CONSTANT, so the pair grid is |S|²·(topN+1),
    * never vocabulary-shaped). TV = ½Σ|p−q| with per-cell shares in
    * exact truncated ppm — identical truncation both engines, so the
    * matrix replays bit-for-bit. The mixture-planning complement of
    * [[crossSourceDupMatrix]]: that finds shards sharing DOCUMENTS,
    * this finds shards sharing (or not) a REGISTER.
    *
    * Output: (source_a, source_b, tv_ppm), a < b, ordered. */
  def sourceTvMatrix(docs: DataFrame, topN: Int = 32): DataFrame = {
    val toks = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(topN)
      .select(col("tok"), lit(true).as("in_vocab"))
    val cnt = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("source"),
        when(col("in_vocab"), col("tok")).otherwise(lit("__OOV__"))
          .as("cell"))
      .groupBy(col("source"), col("cell")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val p = cnt.join(broadcast(tot), "source")
      .select(col("source"), col("cell"),
        expr("(c * 1000000) div nullif(t, 0L)").as("ppm"))
    val cells = vocab.select(col("tok").as("cell"))
      .unionByName(toks.sparkSession.range(1)
        .select(lit("__OOV__").as("cell")))
    val srcs = tot.select(col("source"))
    val grid = srcs.select(col("source").as("source_a"))
      .crossJoin(broadcast(srcs.select(col("source").as("source_b"))))
      .filter(col("source_a") < col("source_b"))
      .crossJoin(broadcast(cells))
    grid
      .join(p.select(col("source").as("source_a"), col("cell"),
        col("ppm").as("pa")), Seq("source_a", "cell"), "left")
      .join(p.select(col("source").as("source_b"), col("cell"),
        col("ppm").as("pb")), Seq("source_b", "cell"), "left")
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(abs(coalesce(col("pa"), lit(0L)) -
        coalesce(col("pb"), lit(0L)))).as("s"))
      .select(col("source_a"), col("source_b"),
        expr("s div 2").as("tv_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** KEEP-BEST CROSS-SOURCE DEDUP (round 15) — the RESOLUTION step
    * [[crossSourceDupMatrix]] diagnoses: collapse each prefix-
    * fingerprint duplicate group to ONE survivor, chosen by source
    * priority (alphabetical source, then lowest doc_id — the
    * deterministic total order every keep-best dedup needs, or two
    * runs disagree). The group key is the same first-8-token md5 as
    * the matrix; selection is min-of-struct per group (one map-side-
    * combinable aggregation, no window over the corpus) joined back as
    * a semi-filter. Output is the per-source census a curation review
    * reads: docs in, survivors kept, duplicates yielded to a
    * higher-priority source.
    *
    * Output: (source, n_docs, n_kept, n_yielded), ordered. */
  def keepBestDedup(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("source"), col("doc_id"),
      md5(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("h"))
    val best = keyed.groupBy(col("h"))
      .agg(min(struct(col("source"), col("doc_id"))).as("b"))
      .select(col("h"), col("b.source").as("bsource"),
        col("b.doc_id").as("bdoc"))
    keyed.join(best, "h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("source") === col("bsource") &&
          col("doc_id") === col("bdoc"), 1L).otherwise(0L)).as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_yielded"))
      .orderBy(col("source"))
  }

  /** WORD-LENGTH HISTOGRAM per language (round 15) — the
    * tokenizer-sizing diagnostic beside [[vocabulary]]: the
    * distribution of whitespace-token lengths per language (clamped
    * at 17+ — the grid-bound doctrine), with per-language ppm shares.
    * Subword tokenizers budget by exactly this curve; a language
    * whose curve shifts long smells concatenation/boilerplate noise.
    * Empty tokens (consecutive spaces) are excluded — not words.
    *
    * Output: (lang, wlen, n_words, share_ppm), ordered. */
  def wordLenHist(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("lang"),
        least(length(col("w")).cast("long"), lit(17L)).as("wlen"))
      .groupBy(col("lang"), col("wlen"))
      .agg(count(lit(1)).as("n_words"))
    val tot = cnt.groupBy(col("lang")).agg(sum(col("n_words")).as("t"))
    cnt.join(broadcast(tot), "lang")
      .select(col("lang"), col("wlen"), col("n_words"),
        expr("(n_words * 1000000) div nullif(t, 0L)").as("share_ppm"))
      .orderBy(col("lang"), col("wlen"))
  }

  /** LANGUAGE × SOURCE mix (round 15) — the corpus composition matrix
    * every multilingual-training plan starts from: per (source, lang),
    * the doc count, the CHARACTER volume (chars is what a token budget
    * actually buys), and each cell's ppm share of its source — the
    * readout that catches a feed whose language mix silently shifted
    * ([[Relational.lengthDriftBySource]]'s categorical sibling). One
    * bounded grid aggregation + a per-source total attach; exact
    * integers.
    *
    * Output: (source, lang, n_docs, n_chars, share_ppm), ordered. */
  def langMix(docs: DataFrame): DataFrame = {
    val cnt = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("n_docs")).as("t"))
    cnt.join(broadcast(tot), "source")
      .select(col("source"), col("lang"), col("n_docs"), col("n_chars"),
        expr("(n_docs * 1000000) div nullif(t, 0L)").as("share_ppm"))
      .orderBy(col("source"), col("lang"))
  }
}
