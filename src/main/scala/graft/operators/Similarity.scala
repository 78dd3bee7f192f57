package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** B3 sim_topk + embedding near-dup + ANN — similarity search over the
  * `embeddings.embedding: array<float>` column.
  *
  * Portability trick: vectors are quantized to integers (×1000, exact in
  * double arithmetic since float×1000 fits 34 bits) before any dot
  * product, so dot products and squared norms are EXACT integers in both
  * Spark and the DuckDB oracle; the only floating-point steps —
  * sqrt and one division — are IEEE-deterministic on identical inputs,
  * making cosine scores bit-identical across engines.
  *
  * Scale: brute-force top-k is the correctness baseline (O(Q·N·d), fine
  * when the query set is small or broadcastable); [[annTopK]] is the
  * 100 TB path — random-hyperplane LSH buckets cut the candidate set per
  * query to one bucket, turning the cross join into an equi-join that
  * shuffles on the bucket key.
  */
object Similarity {

  /** embedding: array<float> → exact integer vector (×1000). round() is
    * half-away-from-zero in both Spark and DuckDB. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen Expression (graft.functions.LongArrayDot); the equivalent
    * `aggregate(zip_with(...))` HOF chain is interpreted and ~50× slower
    * in the all-pairs hot path. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.longArrayDot(a, b)

  /** Cosine from integer dot/norms: deterministic double. A zero vector
    * (zero norm) yields NaN explicitly — under ANSI mode the raw 0/0
    * division would otherwise throw DIVIDE_BY_ZERO and one degenerate
    * embedding would kill the whole job. CAUTION: in both Spark and
    * DuckDB, NaN compares GREATER than every number (`NaN >= t` is
    * true), so similarity consumers must exclude NaN explicitly — every
    * operator in this file does (threshold filters via [[defined]],
    * top-k via the NaN filter in topKPerGroup). */
  def cosine(dot: Column, normA: Column, normB: Column): Column = {
    val den = sqrt(normA.cast("double")) * sqrt(normB.cast("double"))
    when(den === 0.0, lit(Double.NaN)).otherwise(dot.cast("double") / den)
  }

  /** A usable similarity score: non-null and not NaN (a zero-norm vector
    * has UNDEFINED similarity — it must never surface as a near-dup or
    * a nearest neighbor). */
  private def defined(c: Column): Column = c.isNotNull && !isnan(c)

  /** Vectors with quantized form and squared norm precomputed. */
  def prepared(emb: DataFrame): DataFrame = {
    val q = quantize(col("embedding"))
    emb.select(col("vec_id"), col("label"), q.as("qv"))
      .withColumn("nrm", dotQ(col("qv"), col("qv")))
  }

  /** Brute-force cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest other vectors. The query side is tiny and broadcast;
    * the corpus side streams. The per-query top-k is a PARTIAL aggregator
    * (TopKByScore, map-side combine): each task reduces its slice to ≤ k
    * pairs per query before the shuffle, so shuffle volume is
    * O(k·queries·tasks) — independent of corpus size — where the
    * equivalent Window form would shuffle all nQueries·N scored rows. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val p = prepared(emb)
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val scored = corpus.join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
    topKPerGroup(scored, k)
  }

  /** MAXIMUM-INNER-PRODUCT top-k (round 11) — the serving query of
    * recommendation / retrieval systems where scores are LEARNED dot
    * products (user·item, query·passage): unlike cosine, magnitude
    * matters, so the ranking differs from [[bruteForceTopK]] whenever
    * norms vary — a high-norm "popular item" vector legitimately
    * outranks a better-angled low-norm one. Same distribution shape as
    * the cosine path (bounded broadcast query side, streaming corpus,
    * [[graft.functions.TopKAgg]] partial top-k before the exchange) and
    * SIMPLER arithmetic: the score is the exact integer dot of the
    * quantized vectors — no division, no sqrt — so the whole ranking,
    * ties included, replays in BIGINT on any engine. Zero-norm vectors
    * are legal here (ip = 0 is a defined score), unlike cosine's NaN
    * exclusion; null embeddings are still gated. At scale the LSH/IVF
    * routes apply through the standard norm-augmentation reduction
    * (append √(M²−‖x‖²) to unit-cap MIPS into cosine — Shrivastava &
    * Li 2014, public); this exact form is the correctness baseline
    * those serve paths verify against.
    *
    * Output: (q_id, rank, n_id, ip), rank 1-based by (ip desc, n_id). */
  def mipsTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val p = prepared(emb)
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"))
    // dots of ×1000-quantized unit-scale vectors are ≲ 2^26 — exact in
    // the aggregator's double lane, surfaced back as BIGINT
    val scored = corpus.join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("ip", dotQ(col("q_qv"), col("n_qv")).cast("double"))
      .filter(col("ip").isNotNull)
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(k)(col("ip"), col("n_id")).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("n_id"), col("col._1").cast("long").as("ip"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Shared partial-top-k tail: (q_id, cos, n_id) scored rows → the k
    * best per q_id as (q_id, rank, n_id, cos), rank 1-based in
    * (cos desc, n_id asc) order — same total order as the Window
    * formulation it replaces, but with map-side partial aggregation.
    * Undefined scores are excluded up front (see [[defined]]): a NaN
    * would otherwise rank FIRST (IEEE total order) and a zero-norm
    * vector would masquerade as every query's best neighbor; null would
    * crash the primitive-double aggregator input. */
  private[operators] def topKPerGroup(scored: DataFrame, k: Int): DataFrame =
    scored.filter(defined(col("cos"))).groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(k)(col("cos"), col("n_id")).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("n_id"), col("col._1").as("cos"))
      .orderBy(col("q_id"), col("rank"))

  /** Hard ceiling for [[nearDupPairs]]'s all-pairs join: the O(N²·d)
    * brute-force form exists as the oracle baseline and must not be
    * invocable on real data by accident — above this many input vectors
    * it throws, pointing at [[nearDupPairsLsh]]. Calibrated empirically:
    * 20k 64-dim vectors ≈ 3 min on a 32-core node (400M pairs), so this
    * bound caps the accident at minutes, not hours. */
  val AllPairsRowLimit: Long = 20000L

  /** LSH geometry + serve-contract defaults, shared by the ANN
    * operators AND SparkEntry's oracle generators (flip lists, query
    * gates, rank cut-offs derive from these) — change here and both
    * sides move together; a desync is impossible by construction. */
  val LshTables: Int = 16
  val LshBitsPerTable: Int = 4
  val LshNQueries: Int = 10
  val LshK: Int = 10

  /** All-pairs near-duplicate vectors: cosine ≥ threshold, a < b.
    * Brute force (the oracle form); the LSH-bucketed variant below is the
    * scale path. GATED: refuses inputs larger than `rowLimit` (one cheap
    * count against an O(N²) join) — use [[nearDupPairsLsh]] at scale. */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.4,
                   rowLimit: Long = AllPairsRowLimit): DataFrame = {
    // bounded probe, not a full count: scans at most rowLimit+1 rows,
    // so the gate stays cheap even when the input is the whole corpus
    val over = emb.limit((rowLimit + 1).toInt).count() > rowLimit
    require(!over,
      s"nearDupPairs is the O(N^2) all-pairs oracle baseline; input " +
        s"exceeds the $rowLimit-row limit. Use nearDupPairsLsh (bucketed " +
        s"equi-join + exact verify) at scale.")
    val p = prepared(emb)
    val a = p.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"), col("nrm").as("a_nrm"))
    val b = p.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"), col("nrm").as("b_nrm"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(dotQ(col("a_qv"), col("b_qv")), col("a_nrm"), col("b_nrm")))
      .filter(defined(col("cos")) && col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** LSH-bucketed near-dup pairs — the 100 TB path for [[nearDupPairs]]:
    * candidates are pairs sharing a bucket in ANY of the L hash tables
    * (equi-join on (table, bucket), shuffle-partitionable), then
    * exact-verified by cosine ≥ threshold. Precision 1 (exact verify);
    * recall 1-(1-p^r)^L per pair — spec-checked against brute force.
    *
    * Pipeline note: on duplicate-heavy corpora run exact dedup
    * (Relational.dedupExact on a content key) FIRST — d exact copies of
    * a vector co-bucket in every table and contribute d²/2 true pairs,
    * so the pair OUTPUT itself (not a flaw in the blocking) grows
    * quadratically in the duplication factor (measured 100× candidate
    * work on a 10×-duplicated stress set).
    *
    * Scale note: sign-LSH bucket occupancy is ~N/2^bitsPerTable
    * REGARDLESS of content, so `bitsPerTable` must grow with the corpus
    * (more tables to recover recall). The [[Dedup.boundedCandidatePairs]]
    * guard makes an under-provisioned key fail loudly at `maxBucket`
    * members per (table, bucket) — or drop those buckets under
    * [[BucketOverflow.Drop]] — never silently enumerate them. */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double = 0.4,
                      tables: Int = 16, bitsPerTable: Int = 4,
                      maxBucket: Int = 1024,
                      overflow: BucketOverflow = BucketOverflow.Fail): DataFrame = {
    val p = prepared(emb)
    val b = lshBuckets(p, tables, bitsPerTable)
    val cand = Dedup.boundedCandidatePairs(
        b.select(col("vec_id"), col("tbl"), col("bucket")),
        "vec_id", Seq("tbl", "bucket"), maxBucket, overflow, "nearDupPairsLsh")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    val pa = p.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"), col("nrm").as("a_nrm"))
    val pb = p.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"), col("nrm").as("b_nrm"))
    cand.join(pa, Seq("vec_a")).join(pb, Seq("vec_b"))
      .withColumn("cos", cosine(dotQ(col("a_qv"), col("b_qv")), col("a_nrm"), col("b_nrm")))
      .filter(defined(col("cos")) && col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** CANDIDATE-COSINE HISTOGRAM (round 12) — the threshold-calibration
    * audit for the embedding near-dup gate: every LSH candidate pair's
    * exact cosine, binned — the bimodal shape (near-dup mode vs
    * background mode) and the valley between them is HOW an operator
    * sets `nearDupPairsLsh`'s threshold on a new corpus, instead of
    * inheriting 0.4 on faith. Bins are floor(cos·`bins`) over the
    * bit-identical quantized cosine (identical IEEE ops on identical
    * integer inputs ⇒ identical bins on any engine); per bin: pair
    * count and the exact cosine range. Same bounded-bucket candidate
    * enumeration as the gate itself — the audit can never see a
    * different candidate set than the operator it calibrates.
    *
    * Scale shape: the production candidate path + one
    * map-side-combinable ≤(2·bins+1)-group aggregation. */
  def candidateCosHist(emb: DataFrame, tables: Int = 16,
                       bitsPerTable: Int = 4, maxBucket: Int = 1024,
                       overflow: BucketOverflow = BucketOverflow.Fail,
                       bins: Int = 20): DataFrame = {
    val p = prepared(emb)
    val b = lshBuckets(p, tables, bitsPerTable)
    val cand = Dedup.boundedCandidatePairs(
        b.select(col("vec_id"), col("tbl"), col("bucket")),
        "vec_id", Seq("tbl", "bucket"), maxBucket, overflow,
        "candidateCosHist")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    val pa = p.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"),
      col("nrm").as("a_nrm"))
    val pb = p.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"),
      col("nrm").as("b_nrm"))
    cand.join(pa, Seq("vec_a")).join(pb, Seq("vec_b"))
      .withColumn("cos",
        cosine(dotQ(col("a_qv"), col("b_qv")), col("a_nrm"), col("b_nrm")))
      .filter(defined(col("cos")))
      .select(floor(col("cos") * bins).cast("long").as("bin"), col("cos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("cos")).as("cos_min"), max(col("cos")).as("cos_max"))
      .orderBy(col("bin"))
  }

  /** Multi-table random-hyperplane LSH: `tables` independent hash tables
    * of `bitsPerTable` sign bits each, computed in one native-expression
    * pass (graft.functions.SignLshBuckets — deterministic LCG
    * hyperplanes). Returns one (table, bucket) row per input vector per
    * table. Recall for a neighbor at angle-similarity p is 1-(1-p^r)^L —
    * with r=4, L=16 and p≈0.6 that is ≈0.9, while each table still cuts
    * the candidate set 2^r-fold. */
  def lshBuckets(p: DataFrame, tables: Int = 16, bitsPerTable: Int = 4): DataFrame =
    p.select(col("vec_id"), col("qv"), col("nrm"),
        posexplode(graft.functions.VectorFunctions
          .signLshBuckets(col("qv"), tables, bitsPerTable)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")

  /** Deterministic seed centroids: the `nlist` corpus vectors with the
    * smallest md5(vec_id) — a repartition-stable sample (same trick as
    * doc_sample), collect-free. */
  private def seedCentroids(p: DataFrame, nlist: Int): DataFrame =
    p.select(col("vec_id").as("cent_id"), col("qv").as("c_qv"),
        col("nrm").as("c_nrm"), md5(col("vec_id").cast("string")).as("mk"))
      .orderBy(col("mk"), col("cent_id")).limit(nlist)
      .drop("mk")

  /** TRAIN the IVF coarse quantizer: a few DataFrame-native Lloyd's
    * (k-means) iterations, entirely collect-free — centroids live as a
    * broadcast DataFrame throughout, never on the driver.
    *
    * Per iteration: (1) assign each training vector to its
    * max-cosine centroid (broadcast nested-loop over ≤ nlist rows —
    * narrow, no shuffle); (2) recompute each centroid as the
    * element-wise mean of its members — posexplode to (cent_id, pos,
    * val), one aggregation keyed by (cent_id, pos) (exact long sums ⇒
    * deterministic under any partitioning), re-assembled with
    * array_sort(collect_list(struct(pos, mean))) so collect_list's
    * arbitrary order can't leak in. Means round back into the quantized
    * integer domain, so trained centroids speak the same exact-arithmetic
    * language as the data. Empty clusters drop out (nlist can shrink,
    * as in any Lloyd's variant without re-seeding).
    *
    * Scale: training runs on a bounded md5-deterministic sample
    * (`trainCap` rows), the standard IVF recipe — the quantizer needs a
    * representative sample, not the corpus; the full-corpus pass happens
    * once, at assignment time in [[ivfTopK]]. */
  def trainCentroids(p: DataFrame, nlist: Int, iters: Int,
                     trainCap: Int = 4096): DataFrame = {
    val train = p
      .withColumn("mk", md5(col("vec_id").cast("string")))
      .orderBy(col("mk"), col("vec_id")).limit(trainCap).drop("mk")
    var cent = broadcast(seedCentroids(p, nlist))
    for (_ <- 0 until iters) {
      val assigned = train.join(cent)
        .withColumn("c_cos",
          cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
        .groupBy(col("vec_id"))
        .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
          .as("cent_id"),
          first(col("qv")).as("qv"))
      val means = assigned
        .select(col("cent_id"), posexplode(col("qv")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => round(x.getField("m")).cast("long")).as("c_qv"))
      // A cluster mean can round to the zero vector (c_nrm = 0), whose
      // cosine is NaN against everything; NaN sorts above any number in
      // max_by/row_number orderings and would capture every assignment.
      // Degenerate centroids are dropped like empty clusters.
      cent = broadcast(means
        .withColumn("c_nrm", dotQ(col("c_qv"), col("c_qv")))
        .filter(col("c_nrm") > 0)
        .select(col("cent_id"), col("c_qv"), col("c_nrm")))
    }
    cent
  }

  /** IVF (inverted-file) ANN top-k — the second classic ANN family next
    * to [[annTopK]]'s LSH: a coarse quantizer of `nlist` centroids
    * partitions the corpus into inverted lists; a query probes its
    * `nprobe` nearest lists and exact-reranks only those candidates.
    *
    * Deterministic + collect-free: the quantizer is TRAINED with
    * [[trainCentroids]] (`trainIters` Lloyd's iterations over a bounded
    * deterministic sample; 0 = the flat md5-seeded quantizer), kept as a
    * broadcast DataFrame — no driver-side collect. Assignment is a
    * broadcast nested-loop over nlist centroids (O(N·nlist·d) narrow
    * work, no shuffle); candidate lookup is an equi-join on cent_id —
    * shuffle-partitionable like the LSH path. Recall vs
    * [[bruteForceTopK]] — and the trained-vs-flat improvement on
    * clustered data — are spec-checked.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4,
              trainIters: Int = 2): DataFrame = {
    val p = prepared(emb)
    val cent = broadcast(
      if (trainIters <= 0) seedCentroids(p, nlist)
      else trainCentroids(p, nlist, trainIters))
    ivfServe(p, cent, nQueries, k, nprobe)
  }

  /** Persist a TRAINED quantizer ([[trainCentroids]] output) as a tiny
    * parquet table — nlist rows of (cent_id, c_qv, c_nrm). A real IVF
    * deployment trains ONCE and reuses the quantizer at serve time;
    * re-training per query (a) wastes the Lloyd's iterations and (b)
    * silently re-assigns the inverted lists whenever the sample changes.
    * Pair with [[loadCentroids]] + [[ivfTopKWith]]. */
  def saveCentroids(cent: DataFrame, path: String): Unit =
    cent.select(col("cent_id"), col("c_qv"), col("c_nrm"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted quantizer for [[ivfTopKWith]]. */
  def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)

  /** IVF serve path: top-k over a PRE-TRAINED quantizer (typically
    * [[loadCentroids]]). Plans NO training jobs — the quantizer frame is
    * broadcast as-is; assignment, probing and rerank are identical to
    * [[ivfTopK]] (spec-checked bit-identical against in-session
    * training). */
  def ivfTopKWith(emb: DataFrame, centroids: DataFrame,
                  nQueries: Int = 10, k: Int = 10,
                  nprobe: Int = 4): DataFrame = {
    val need = Seq("cent_id", "c_qv", "c_nrm")
    require(need.forall(centroids.columns.contains),
      s"quantizer must carry ${need.mkString(", ")} — got " +
        centroids.columns.mkString(", "))
    ivfServe(prepared(emb),
      broadcast(centroids.select(need.map(col): _*)), nQueries, k, nprobe)
  }

  /** IVF QUANTIZATION-ERROR AUDIT (round 13) — per-centroid inertia of
    * the TRAINED quantizer: member count, exact mean squared distance
    * (floor-div — non-negative domain) and the total SSE, the
    * convergence/quality readout an operator checks before trusting an
    * IVF deployment (a centroid with huge inertia is a list whose
    * probes rerank garbage; training that didn't move inertia didn't
    * converge). Assignment is the serve path's max-cosine rule
    * verbatim (members are the vectors the list will actually hold —
    * an L2-assigned inertia would audit a different partition);
    * distances are the exact BIGINT ‖v‖²+‖c‖²−2⟨v,c⟩, summed in
    * DECIMAL(38,0), surfaced once through the via-string bridge. One
    * broadcast assignment pass + a ≤ nlist rollup.
    *
    * Output: (cent_id, n_members, sse_mean, sse), ordered. */
  def ivfInertiaWith(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val p = prepared(emb)
    val cent = broadcast(centroids
      .select(col("cent_id"), col("c_qv"), col("c_nrm")))
    p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("c_qv"), col("c_nrm")),
          struct(col("c_cos"), -col("cent_id"))).as("c"),
        first(col("qv")).as("qv"), first(col("nrm")).as("nrm"))
      .select(col("c.cent_id").as("cent_id"),
        (col("nrm") + col("c.c_nrm") -
          lit(2L) * dotQ(col("qv"), col("c.c_qv"))).as("dist"))
      .groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast(dec)).as("s"))
      .select(col("cent_id"), col("n_members"),
        expr("CAST(s div n_members AS BIGINT)").as("sse_mean"),
        col("s").cast("string").cast("double").as("sse"))
      .orderBy(col("cent_id"))
  }

  /** IVF LIST-SIZE BALANCE (round 13) — the audit that SIZES an IVF
    * deployment: per-centroid inverted-list occupancy under the fixed
    * seed quantizer (the `sim_ann_ivf_fixed` assignment verbatim, so
    * the whole audit replays in the oracle). Imbalance is what an
    * operator reads before choosing nlist/nprobe — a hot list means
    * probes scan far more than n/nlist·nprobe vectors, the IVF analog
    * of the LSH band-occupancy audit. Zero-occupancy lists keep a
    * structural row (a silently empty list is exactly the defect this
    * catches). Shares in integer ppm of exact counts. Output:
    * (cent_id, n_vecs, share_ppm), ordered. */
  def ivfListBalance(emb: DataFrame, nlist: Int = 16): DataFrame = {
    val p = prepared(emb)
    val cent = broadcast(seedCentroids(p, nlist))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))
    val total = assigned.agg(count(lit(1)).as("n_total"))
    cent.select(col("cent_id"))
      .join(assigned.groupBy(col("cent_id")).agg(count(lit(1)).as("n0")),
        Seq("cent_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("cent_id"), coalesce(col("n0"), lit(0L)).as("n_vecs"),
        expr("(coalesce(n0, 0L) * 1000000) div nullif(n_total, 0L)")
          .as("share_ppm"))
      .orderBy(col("cent_id"))
  }

  /** The IVF CODES relation — every vector's inverted-list assignment
    * (vec_id, cent_id) under a FIXED quantizer: the serve path's
    * argmax-cosine rule verbatim. This is the relation a deployed IVF
    * index PERSISTS and maintains incrementally — a corpus delta is
    * encoded against the same frozen quantizer and appended, never a
    * full re-encode (see `sim_ann_index_upsert`); assignment of
    * base ∪ delta equals assignment of base plus assignment of delta
    * exactly because the quantizer is fixed. */
  def ivfCodes(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = broadcast(centroids
      .select(col("cent_id"), col("c_qv"), col("c_nrm")))
    ivfAssign(prepared(emb), cent)
  }

  private def ivfAssign(p: DataFrame, cent: DataFrame): DataFrame =
    p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))

  /** IVF serve over a PERSISTED codes relation ([[ivfCodes]] output,
    * typically parquet maintained by incremental upsert): identical
    * probing and rerank to [[ivfTopKWith]], but the corpus-sized
    * assignment pass is REPLACED by the codes read — the plan runs no
    * encode job at all, the way a deployed index answers queries while
    * the codes table is maintained out-of-band. */
  def ivfServeWithCodes(emb: DataFrame, centroids: DataFrame,
                        codes: DataFrame, nQueries: Int = 10, k: Int = 10,
                        nprobe: Int = 4): DataFrame = {
    val need = Seq("cent_id", "c_qv", "c_nrm")
    require(need.forall(centroids.columns.contains),
      s"quantizer must carry ${need.mkString(", ")} — got " +
        centroids.columns.mkString(", "))
    val cent = broadcast(centroids.select(need.map(col): _*))
    ivfServeTail(prepared(emb), cent,
      codes.select(col("vec_id"), col("cent_id")), nQueries, k, nprobe)
  }

  private def ivfServe(p: DataFrame, cent: DataFrame, nQueries: Int,
                       k: Int, nprobe: Int): DataFrame =
    // assign every vector to its best centroid: argmax cosine via max_by
    ivfServeTail(p, cent, ivfAssign(p, cent), nQueries, k, nprobe)

  private def ivfServeTail(p: DataFrame, cent: DataFrame,
                           assigned: DataFrame, nQueries: Int,
                           k: Int, nprobe: Int): DataFrame = {
    // queries probe their nprobe best lists (same broadcast quantizer)
    val probes = p.filter(col("vec_id") < nQueries).join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    // candidates = members of probed lists; probes is ≤ nQueries·nprobe
    // rows — always broadcastable, so the corpus-sized assignment never
    // shuffles for this join
    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    // broadcast ONLY the bounded query set, never the corpus
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), Seq("q_id"))
      .join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
    topKPerGroup(scored, k)
  }

  /** SEMANTIC CONTAMINATION check (round 10) — the embedding-level
    * complement to the n-gram contamination family
    * (`contamination_check/ngram/bloom`): a benchmark answer that was
    * PARAPHRASED into the training set shares no 13-gram but sits at
    * high cosine, so decontamination pipelines run both. Same
    * machinery as [[semanticDedup]] — deterministic seed-centroid
    * clustering, intra-cluster pairs only through the bounded-bucket
    * guard — but pairs are kept only when they CROSS the split
    * (deterministic md5 holdout bucket, the engine-wide
    * Corpus.isHoldout contract): each holdout (test) vector reports
    * how many training vectors sit within `threshold` cosine in its
    * cluster, its strongest match, and the contamination verdict. One
    * row per test vector always (structural-empty doctrine), so
    * flagged + clean reconciles to the holdout size.
    *
    * Output: (test_vec, cent_id, n_train_matches, max_cos,
    * contaminated), ordered by test_vec. Fully DuckDB-replayable. */
  def semanticContamination(emb: DataFrame, nlist: Int = 16,
                            threshold: Double = 0.4,
                            maxCluster: Int = 4096,
                            overflow: BucketOverflow = BucketOverflow.Fail)
      : DataFrame = {
    val p = prepared(emb)
    val cent = broadcast(seedCentroids(p, nlist))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))
      .withColumn("is_test", Corpus.isHoldout(col("vec_id")))
    val cand = Dedup.boundedCandidatePairs(
        assigned.select(col("vec_id"), col("cent_id")),
        "vec_id", Seq("cent_id"), maxCluster, overflow,
        "semanticContamination")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    // the split flag is a PURE md5 expression of the id — no join back
    // to the assignment (which would re-run the corpus×centroid pass
    // once per role side); orient every cross-split pair as (test,
    // train) with two narrow column expressions
    val testA = Corpus.isHoldout(col("vec_a"))
    val testB = Corpus.isHoldout(col("vec_b"))
    val crossed = cand
      .filter(testA =!= testB)
      .select(
        when(testA, col("vec_a")).otherwise(col("vec_b")).as("t_id"),
        when(testA, col("vec_b")).otherwise(col("vec_a")).as("n_id"))
    val pt = p.select(col("vec_id").as("t_id"), col("qv").as("t_qv"),
      col("nrm").as("t_nrm"))
    val pn = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val hits = crossed.join(pt, Seq("t_id")).join(pn, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("t_qv"), col("n_qv")), col("t_nrm"), col("n_nrm")))
      .filter(defined(col("cos")) && col("cos") >= threshold)
      .groupBy(col("t_id"))
      .agg(count(lit(1)).as("nm"), max(col("cos")).as("mc"))
    assigned.filter(col("is_test"))
      .select(col("vec_id").as("test_vec"), col("cent_id"))
      .join(hits, col("test_vec") === col("t_id"), "left")
      .select(col("test_vec"), col("cent_id"),
        coalesce(col("nm"), lit(0L)).as("n_train_matches"),
        col("mc").as("max_cos"),
        col("nm").isNotNull.as("contaminated"))
      .orderBy(col("test_vec"))
  }

  /** MULTI-PROBE LSH ANN top-k (round 10; Lv et al., "Multi-Probe LSH",
    * VLDB 2007 — public literature): each query probes its base bucket
    * PLUS every Hamming-1 neighbor (one sign bit flipped) in every
    * table. A near neighbor that lands one hyperplane away — the
    * dominant miss mode of sign-LSH — is recovered without adding
    * tables: per-pair miss probability drops from (1−p^r)^L to
    * Π(1 − p^r − r·p^(r−1)(1−p)) at the cost of a (1+r)× larger probe
    * set, where extra TABLES would cost a full extra corpus hash pass
    * each. The probe set is still bounded (nQueries·L·(1+r) rows —
    * broadcastable), the corpus side is untouched (same single
    * [[lshBuckets]] pass as [[annTopK]]), and every step is exact
    * integer arithmetic — full DuckDB oracle like the base path.
    * Candidates are a SUPERSET of [[annTopK]]'s (flip 0 is the base
    * bucket), so recall is monotonically ≥ the single-probe path —
    * spec-asserted. */
  def annTopKMultiProbe(emb: DataFrame, nQueries: Int = LshNQueries,
                        k: Int = LshK, tables: Int = LshTables,
                        bitsPerTable: Int = LshBitsPerTable): DataFrame = {
    val p = prepared(emb)
    val buckets = lshBuckets(p, tables, bitsPerTable)
    val flips = array((lit(0L) +:
      (0 until bitsPerTable).map(b => lit(1L << b))): _*)
    val qp = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"),
        explode(flips).as("flip"))
      .select(col("q_id"), col("tbl"),
        col("bucket").bitwiseXOR(col("flip")).as("bucket"))
    val cand = buckets.join(broadcast(qp), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    // broadcast ONLY the bounded query set, never the corpus
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), Seq("q_id"))
      .join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
    topKPerGroup(scored, k)
  }

  /** ANN RECALL AUDIT (round 12) — "measure, don't guess" made a
    * first-class query: every approximate route in this file trades
    * recall for candidate volume, and the number that justifies the
    * trade should come from the engine itself, not a hand calculation.
    * Per method, one row: hits = |ANN top-k ∩ exact top-k| summed over
    * the query set, n_possible = |exact top-k| (handles short groups
    * where the corpus has fewer than k defined neighbors), and
    * recall_ppm = hits·10⁶ div n_possible — integer arithmetic end to
    * end, so the report itself replays exactly in the oracle.
    *
    * Methods audited: single-probe LSH and Hamming-1 multi-probe LSH
    * (the multiprobe candidate set is a superset, so its row must
    * dominate — spec-asserted). The IVF/PQ/HNSW routes publish recall
    * through their own specs; this KEY audits the LSH family because
    * both legs share one bucket pass and stay self-contained (no
    * trained state).
    *
    * Scale shape: the ground truth is the [[bruteForceTopK]] partial
    * top-k (bounded nQueries·k rows — broadcastable by construction),
    * each ANN leg is its production plan, and the intersection is a
    * broadcast left-semi join onto bounded frames. The only
    * corpus-sized work is the legs themselves. */
  def recallReport(emb: DataFrame, nQueries: Int = LshNQueries,
                   k: Int = LshK): DataFrame =
    recallReportImpl(emb, nQueries, k)

  /** Persistence parameter of [[rboAudit]] (Webber et al. 2010's p):
    * 0.9 weights the top of the list ~86% into the first 10 ranks —
    * the standard serving-quality setting. Shared with the oracle
    * generator (the per-rank weights are inlined as literals on both
    * sides, so the closing double sums are bit-identical). */
  val RboPersistence: Double = 0.9

  /** Truncated-RBO weight of a common item whose worse rank is m:
    * (1−p)·Σ_{d=m..k} p^(d−1)/d — an item in both prefixes from depth
    * m contributes 1/d to every prefix-agreement term from there on.
    * Computed once on the driver; the SAME doubles are inlined into
    * the DuckDB oracle text (shared-constants doctrine), so both
    * engines fold identical addends. */
  def rboWeights(k: Int, p: Double): IndexedSeq[Double] =
    (1 to k).map(m =>
      (1 - p) * (m to k).map(d => math.pow(p, d - 1) / d).sum)

  /** RANK-BIASED OVERLAP AUDIT (round 17, Webber et al. 2010 — the
    * TRUNCATED prefix form, no extrapolation) — the order-aware ANN
    * quality readout the recall keys cannot give: recall@k counts set
    * hits, so an ANN list with the right 10 items in scrambled order
    * scores 1.0; RBO@k discounts agreement geometrically by depth
    * (persistence [[RboPersistence]]), so getting the TOP ranks right
    * is what scores. Per query: join the exact cosine top-k
    * ([[bruteForceTopK]], the gated baseline) with the production LSH
    * top-k ([[annTopK]]) on item; a common item contributes the
    * closed-form per-rank weight of max(rank_exact, rank_ann); the
    * per-query sum folds a SORTED bounded list (≤ k items, pinned by
    * n_id — the chiSquare double-fold doctrine). Queries whose lists
    * share nothing still emit (rbo = 0) via the left join from the
    * exact query set.
    *
    * Scale shape: both legs are their production plans (bounded query
    * side broadcast, corpus streamed); everything after them is
    * nQueries·k-row arithmetic.
    *
    * Output: (q_id, n_common, rbo), one row per query, ordered. */
  def rboAudit(emb: DataFrame, nQueries: Int = LshNQueries,
               k: Int = LshK, p: Double = RboPersistence): DataFrame =
    rboFromRanked(
      bruteForceTopK(emb, nQueries, k)
        .select(col("q_id"), col("n_id"), col("rank").as("ra")),
      annTopK(emb, nQueries, k)
        .select(col("q_id"), col("n_id"), col("rank").as("rb")),
      k, p)

  /** [[rboAudit]]'s arithmetic over two already-ranked lists
    * ((q_id, n_id, ra) / (q_id, n_id, rb), ranks 1-based ≤ k) —
    * exposed for direct spec fixtures. */
  private[graft] def rboFromRanked(exact: DataFrame, ann: DataFrame,
                                       k: Int, p: Double): DataFrame = {
    val ws = rboWeights(k, p)
    val wcol = (1 to k).foldRight(lit(0.0)) { (m, els) =>
      when(greatest(col("ra"), col("rb")) === m, lit(ws(m - 1)))
        .otherwise(els)
    }
    val agg = exact.join(ann, Seq("q_id", "n_id"))
      .select(col("q_id"), col("n_id"), wcol.as("w"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_common"),
        aggregate(array_sort(collect_list(struct(col("n_id"), col("w")))),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("rbo"))
    exact.select(col("q_id")).distinct()
      .join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo"), lit(0.0)).as("rbo"))
      .orderBy(col("q_id"))
  }

  private def recallReportImpl(emb: DataFrame, nQueries: Int,
                               k: Int): DataFrame =
    recallRows(emb, Seq(
      "lsh" -> annTopK(emb, nQueries, k),
      "lsh_multiprobe" -> annTopKMultiProbe(emb, nQueries, k)),
      nQueries, k)

  /** The recall-audit core with pluggable ANN legs — `sim_recall_report`
    * audits the self-contained LSH family; the trained-index key passes
    * the SERVED IVF plan so the audit measures exactly what production
    * serves. */
  def recallRows(emb: DataFrame, legs: Seq[(String, DataFrame)],
                 nQueries: Int = LshNQueries, k: Int = LshK): DataFrame = {
    val ground = bruteForceTopK(emb, nQueries, k)
      .select(col("q_id"), col("n_id"))
      // every leg plus the count frame reads it — materialize the
      // bounded frame once
      .localCheckpoint(true)
    val g = ground.agg(count_distinct(col("q_id")).as("n_queries"),
      count(lit(1)).as("n_possible"))
    def leg(name: String, ann: DataFrame): DataFrame =
      ann.select(col("q_id"), col("n_id"))
        .join(broadcast(ground), Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(name).as("method"), col("n_hits"))
    legs.map { case (n, d) => leg(n, d) }
      .reduce(_ unionByName _)
      .crossJoin(broadcast(g))
      .select(col("method"), col("n_queries"), col("n_possible"),
        col("n_hits"),
        expr("CAST((n_hits * 1000000) div nullif(n_possible, 0L) AS BIGINT)")
          .as("recall_ppm"))
      .orderBy(col("method"))
  }

  /** Mean-pool document-embedding aggregation (round 9) — the missing
    * half of the chunk-embedding workflow: a corpus pipeline that dedups
    * and packs sequences also needs ONE vector per document, and the
    * standard reduction is the element-wise mean of its chunk vectors.
    * Runs in the exact integer domain like everything else in this file:
    * chunk vectors quantize (×1000), per-position sums are exact longs
    * under any partitioning, the mean is ONE IEEE division per element
    * (identical operands in any engine), rounded half-away back to the
    * quantized domain — the same arithmetic contract as
    * [[trainCentroids]]' cluster means, per-document instead of
    * per-cluster.
    *
    * Shape: posexplode → groupBy (doc, pos) with map-side partial sums —
    * shuffle volume O(docs·dim), never O(chunks·dim) — then one
    * per-doc reassembly via array_sort(collect_list(struct(pos, …)))
    * so collect_list's arbitrary order can't leak in. Output:
    * (doc_key, n_chunks, pooled: array<long>, pooled_nrm), ordered. */
  def meanPoolEmbeddings(emb: DataFrame, docKey: String = "label"): DataFrame = {
    val p = prepared(emb)
    p.select(col(docKey).as("doc_key"), posexplode(col("qv")))
      .groupBy(col("doc_key"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("cnt"))
      .groupBy(col("doc_key"))
      .agg(max(col("cnt")).as("n_chunks"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("cnt")))),
          x => round(x.getField("s").cast("double") / x.getField("cnt"))
            .cast("long")).as("pooled"))
      .withColumn("pooled_nrm", dotQ(col("pooled"), col("pooled")))
      .orderBy(col("doc_key"))
  }

  /** INT8 per-vector quantization — the vector-store compression
    * primitive: each embedding maps to 256 codes over its own [min,
    * max] range (asymmetric per-vector affine quantization, the scheme
    * FAISS calls SQ8 with per-vector scaling). 4× smaller vectors is
    * the difference between an index that fits executor memory at
    * 100 TB scale and one that doesn't, and the emitted per-vector
    * summary (range, code checksum, saturation count, total absolute
    * reconstruction error) is exactly what an index auditor reads to
    * decide whether SQ8 is safe for a given corpus.
    *
    * ENTIRELY integer arithmetic — deliberately stronger than the usual
    * float scale/zero-point formulation: inputs live in the exact ×1000
    * quantized domain ([[quantize]]), the code is `(q−mn)·255 DIV
    * (mx−mn)` and dequantization is BUCKET-CENTERED (the reconstruction
    * that halves worst-case error): `mn + ((2·code+1)·(mx−mn)+255) DIV
    * 510`, all exact longs with non-negative numerators (truncating and
    * flooring division agree), so there is NO floating point anywhere
    * and the result is bit-identical in any engine. Constant vectors
    * (mx = mn) code to 0 with zero error by definition.
    *
    * Shape: per-row array functions for the range (narrow), one
    * posexplode → groupBy(vec) for the positional aggregates — the same
    * O(rows·dim) one-shuffle shape as [[meanPoolEmbeddings]]. */
  def int8Quantize(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("n_dims", size(col("q")).cast("long"))
      .withColumn("mn", array_min(col("q")))
      .withColumn("mx", array_max(col("q")))
    base.select(col("vec_id"), col("n_dims"), col("mn"), col("mx"),
        posexplode(col("q")))
      .withColumn("code", when(col("mx") === col("mn"), lit(0L))
        .otherwise(expr("((col - mn) * 255) DIV (mx - mn)")))
      .withColumn("recon", col("mn") +
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(expr("((2 * code + 1) * (mx - mn) + 255) DIV 510")))
      .groupBy(col("vec_id"), col("n_dims"), col("mn"), col("mx"))
      .agg(sum((col("pos") + 1) * col("code")).as("code_checksum"),
        sum(when(col("code") === 255, lit(1L)).otherwise(lit(0L)))
          .as("n_saturated"),
        sum(abs(col("col") - col("recon"))).as("total_abs_err"))
      .orderBy(col("vec_id"))
  }

  /** PQ defaults — shared with SparkEntry's oracle generator so the two
    * sides can never silently desync (the sim_ann_lsh_multiprobe lesson):
    * 8 subspaces × 16 codes over the 64-dim embeddings, 2 Lloyd's
    * rounds on a 4096-vector deterministic sample. */
  val PqSubspaces = 8
  val PqCodes = 16
  val PqIters = 2
  val PqTrainCap = 4096

  /** The IVF-PQ serve path runs a FINER codebook than the embed_pq
    * report (64 codes = 6 bits/subspace vs 16): ADC ranking quality is
    * the product, and 4-bit sub-distances are too coarse to rank with.
    * Shared with the oracle generator like the other Pq* constants. */
  val IvfPqCodes = 64

  /** ADC shortlist size for the exact rerank (4·k at the default
    * k = 10) — the standard IVFPQ serving recipe: the compressed codes
    * RANK CHEAPLY, the shortlist reranks exactly, and recall recovers
    * most of the probe ceiling for a 4× widening of the exact work. */
  val IvfPqRerank = 40

  /** PRODUCT QUANTIZATION codebook training + encode report (round 11) —
    * the third compression primitive next to [[int8Quantize]] (SQ8) and
    * [[meanPoolEmbeddings]]: split each d-dim vector into `m` contiguous
    * subspaces, train an independent `kCodes`-entry codebook per
    * subspace (Lloyd's on squared-L2, the Jégou et al. 2011 PQ recipe —
    * public paper), and encode every vector as its per-subspace nearest
    * code. d floats become m log₂(kCodes)-bit codes — 64×4 B → 8 B here,
    * a 32× compression — which is what makes a corpus-scale ANN index
    * RAM-resident; the emitted per-(subspace, code) occupancy + total
    * squared reconstruction error is the codebook-health report an index
    * auditor reads before trusting PQ recall.
    *
    * EXACTER THAN THE IVF TRAINER: squared L2 over the ×1000-quantized
    * integer domain is pure BIGINT (dist = ‖a‖² + ‖c‖² − 2⟨a,c⟩, the
    * codegen'd integer dot — no sqrt, no division, no NaN gate), so
    * assignment and the error report replay bit-exactly in any engine;
    * the only doubles are the cluster means (exact integer sums, one
    * IEEE division, round half-away — the [[trainCentroids]] contract).
    *
    * Scale shape: training touches a bounded md5-deterministic sample
    * ([[trainCentroids]]' `trainCap` doctrine); codebooks are m·kCodes
    * rows — always broadcast; the corpus pass is one narrow
    * broadcast-join assignment (O(N·m·kCodes·L) work, no shuffle) and
    * the report aggregates to ≤ m·kCodes groups with map-side partial
    * aggregation. Seeds reuse [[seedCentroids]]' discipline — the
    * kCodes smallest-(md5, vec_id) vectors, sliced per subspace, code
    * label = seed vec_id — so no per-subspace window pass exists
    * anywhere. Empty/degenerate codes drop out exactly like Lloyd's
    * empty clusters; surviving-but-unused codes report n_vectors = 0
    * (structural-empty doctrine).
    *
    * Output: (sub_id, code, n_vectors, total_sq_err) ordered. */
  def pqCodebookStats(emb: DataFrame, dim: Int = 64, m: Int = PqSubspaces,
                      kCodes: Int = PqCodes, iters: Int = PqIters,
                      trainCap: Int = PqTrainCap): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val cb = pqTrain(p, dim, m, kCodes, iters, trainCap)
    // structural zeros without a join: every surviving code contributes
    // one (0, 0) row, so unused codes still report — and the broadcast
    // hint on the codebook never meets an outer join it can't serve
    pqAssign(pqSubSlices(p, m, dim / m), cb)
      .select(col("sub_id"), col("code"),
        lit(1L).as("one"), col("err"))
      .unionByName(cb.select(col("sub_id"), col("code"),
        lit(0L).as("one"), lit(0L).as("err")))
      .groupBy(col("sub_id"), col("code"))
      .agg(sum(col("one")).as("n_vectors"),
        sum(col("err")).as("total_sq_err"))
      .orderBy(col("sub_id"), col("code"))
  }

  /** One row per (vector, subspace): the sliced sub-vector + its norm —
    * the shared PQ front end. */
  private def pqSubSlices(df: DataFrame, m: Int, subLen: Int): DataFrame =
    df.select(col("vec_id"), posexplode(array((0 until m).map(s =>
        slice(col("qv"), s * subLen + 1, subLen)): _*)))
      .select(col("vec_id"), col("pos").cast("long").as("sub_id"),
        col("col").as("sv"))
      .withColumn("sn", dotQ(col("sv"), col("sv")))

  private def pqMdCapped(df: DataFrame, cap: Int): DataFrame =
    df.withColumn("mk", md5(col("vec_id").cast("string")))
      .orderBy(col("mk"), col("vec_id")).limit(cap).drop("mk")

  /** Per-subspace argmin code by exact integer distance, (dist, code)
    * total order — min over the struct is the same lexicographic order
    * DuckDB's ROW_NUMBER (dist, code) replays. `carryVec` threads the
    * sub-vector through for the M-step; the encode paths leave it off —
    * hauling the array through the aggregation buffers is the dominant
    * cost of a corpus-sized encode (measured on the ×10 stress). */
  private def pqAssign(data: DataFrame, codebook: DataFrame,
                       carryVec: Boolean = false): DataFrame = {
    val scored = data.join(codebook, Seq("sub_id"))
      .withColumn("dist",
        col("sn") + col("cn") - lit(2L) * dotQ(col("sv"), col("cv")))
    val aggs = min(struct(col("dist"), col("code"))).as("mm") +:
      (if (carryVec) Seq(first(col("sv")).as("sv")) else Nil)
    val out = scored.groupBy(col("vec_id"), col("sub_id"))
      .agg(aggs.head, aggs.tail: _*)
    val cols = Seq(col("vec_id"), col("sub_id"),
      col("mm.code").as("code"), col("mm.dist").as("err")) ++
      (if (carryVec) Seq(col("sv")) else Nil)
    out.select(cols: _*)
  }

  /** Train the per-subspace PQ codebooks (Lloyd's on integer L2 over
    * the md5-capped sample) and return the broadcast codebook frame
    * (sub_id, code, cv, cn) — shared by [[pqCodebookStats]] and the
    * [[ivfpqTopK]] serve path. */
  private def pqTrain(p: DataFrame, dim: Int, m: Int, kCodes: Int,
                      iters: Int, trainCap: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim ($dim) must divide into m ($m) equal subspaces")
    require(kCodes >= 1 && iters >= 0 && trainCap >= kCodes,
      s"need kCodes >= 1, iters >= 0, trainCap >= kCodes")
    val subLen = dim / m
    val tr = pqSubSlices(pqMdCapped(p, trainCap), m, subLen)
    val seeds = pqSubSlices(pqMdCapped(p, kCodes), m, subLen)
      .select(col("sub_id"), col("vec_id").as("code"),
        col("sv").as("cv"), col("sn").as("cn"))
    var cb = broadcast(seeds)
    for (_ <- 1 to iters) {
      val means = pqAssign(tr, cb, carryVec = true)
        .select(col("sub_id"), col("code"), posexplode(col("sv")))
        .groupBy(col("sub_id"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mval"))
        .groupBy(col("sub_id"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mval")))),
          x => round(x.getField("mval")).cast("long")).as("cv"))
      cb = broadcast(means.withColumn("cn", dotQ(col("cv"), col("cv"))))
    }
    cb
  }

  /** IVF-PQ ANN serving (round 11) — the FAISS-architecture composite
    * and the index every production vector store actually deploys: the
    * IVF coarse quantizer ([[trainCentroids]], trained Lloyd's) prunes
    * the corpus to `nprobe` inverted lists per query, and candidates
    * rank by ASYMMETRIC DISTANCE (ADC): the full-precision query
    * against each candidate's m-byte PQ code ([[pqTrain]] codebooks) —
    * the memory layout that keeps a corpus-scale index RAM-resident
    * (codes relation = m small ints per vector, never the vectors).
    * Codes here quantize RAW vectors, not per-list residuals — the
    * documented no-residual IVFPQ variant; residual coding drops into
    * the same shape with one extra centroid subtraction.
    *
    * The classic serve trick is kept intact and RELATIONAL: the
    * per-query DISTANCE TABLE (query sub-vector × every codebook entry,
    * nQueries·m·kCodes rows — bounded, broadcast) is joined to the
    * candidates' codes, so each (query, candidate) costs m integer
    * lookups + a sum, never a d-dim dot. ADC sums are exact BIGINTs
    * ((dist, n_id) total order — deterministic), and serving follows
    * the standard two-stage recipe: ADC ranks the candidate mass
    * cheaply into a `rerank`-row shortlist, the shortlist reranks with
    * TRUE cosine (nQueries·rerank rows — bounded, so the rank window
    * never sees the corpus), and the final top-k is by exact score
    * with the winning ADC kept as the audit column.
    *
    * Scale shape: nothing corpus-sized broadcasts — the corpus-side
    * relations (assignment, codes) shuffle on their keys; probes and
    * the distance table broadcast; the per-(q, n) ADC aggregation is
    * map-side-combinable with partial top-k before the final exchange.
    *
    * Output: (q_id, rank, n_id, adc, cos), ordered. */
  def ivfpqTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
                dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
                trainIters: Int = 2, m: Int = PqSubspaces,
                kCodes: Int = IvfPqCodes, pqIters: Int = PqIters,
                trainCap: Int = PqTrainCap,
                rerank: Int = IvfPqRerank): DataFrame =
    ivfpqTopKWith(emb,
      trainCentroids(prepared(emb), nlist, trainIters),
      nQueries, k, dim, nprobe, m, kCodes, pqIters, trainCap, rerank)

  /** Persist a trained PQ codebook ([[pqTrain]] shape — (sub_id, code,
    * cv, cn)) as a tiny parquet, mirroring [[saveCentroids]]: a real
    * IVFPQ deployment trains its codebooks ONCE beside the coarse
    * quantizer and serves both from disk. */
  def saveCodebook(cb: DataFrame, path: String): Unit =
    cb.select(col("sub_id"), col("code"), col("cv"), col("cn"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Train the default-geometry IVFPQ codebook for [[saveCodebook]]. */
  def trainPqCodebook(emb: DataFrame, dim: Int = 64, m: Int = PqSubspaces,
                      kCodes: Int = IvfPqCodes, pqIters: Int = PqIters,
                      trainCap: Int = PqTrainCap): DataFrame =
    pqTrain(prepared(emb)
        .filter(col("qv").isNotNull && size(col("qv")) === dim),
      dim, m, kCodes, pqIters, trainCap)

  /** Train the RESIDUAL IVFPQ codebook against a given coarse quantizer
    * (a [[trainCentroids]] / loaded [[saveCentroids]] table) for
    * [[saveCodebook]] — the exact `pqTrain(v − c(v))` the in-session
    * [[ivfpqResidualTopK]] runs, extracted so a deployment trains it
    * once beside the quantizer and serves both from disk (VERDICT r17
    * item 4). Assignment uses the same (c_cos, −cent_id) argmax as the
    * serve path, so base vectors residualize identically. */
  def trainResidualPqCodebook(emb: DataFrame, centroids: DataFrame,
                              dim: Int = 64, m: Int = PqSubspaces,
                              kCodes: Int = IvfPqCodes,
                              pqIters: Int = PqIters,
                              trainCap: Int = PqTrainCap): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val cent = broadcast(centroids
      .select(col("cent_id"), col("c_qv"), col("c_nrm")))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))
    val rvs = p.join(assigned, Seq("vec_id"))
      .join(cent.select(col("cent_id"), col("c_qv")), Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("qv"), col("c_qv"), (a, b) => a - b).as("qv"))
    pqTrain(rvs, dim, m, kCodes, pqIters, trainCap)
  }

  /** [[ivfpqTopK]] over a PRE-TRAINED coarse quantizer — the serve
    * form: the SAME persisted quantizer that serves `sim_ann_ivf_served`
    * (identical training contract) drops in here, so one trained
    * artifact serves both the exact-rerank IVF family and the
    * compressed-code IVFPQ family — the deployment shape, and the
    * engine's shared-computation doctrine applied across ANN
    * families. Pass `codebook0` (a loaded [[saveCodebook]] table) to
    * also skip PQ training — the fully-served form where the plan
    * contains NO training jobs at all. */
  def ivfpqTopKWith(emb: DataFrame, centroids: DataFrame,
                    nQueries: Int = 10, k: Int = 10,
                    dim: Int = 64, nprobe: Int = 4,
                    m: Int = PqSubspaces, kCodes: Int = IvfPqCodes,
                    pqIters: Int = PqIters, trainCap: Int = PqTrainCap,
                    rerank: Int = IvfPqRerank,
                    codebook0: Option[DataFrame] = None): DataFrame = {
    require(rerank >= k, s"rerank shortlist ($rerank) must cover k ($k)")
    val need = Seq("cent_id", "c_qv", "c_nrm")
    require(need.forall(centroids.columns.contains),
      s"quantizer must carry ${need.mkString(", ")} — got " +
        centroids.columns.mkString(", "))
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val cent = broadcast(centroids.select(need.map(col): _*))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))
    val probes = p.filter(col("vec_id") < nQueries).join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val cb = codebook0 match {
      case Some(loaded) =>
        val needCb = Seq("sub_id", "code", "cv", "cn")
        require(needCb.forall(loaded.columns.contains),
          s"codebook must carry ${needCb.mkString(", ")} — got " +
            loaded.columns.mkString(", "))
        broadcast(loaded.select(needCb.map(col): _*))
      case None => pqTrain(p, dim, m, kCodes, pqIters, trainCap)
    }
    val codes = pqAssign(pqSubSlices(p, m, dim / m), cb)
      .select(col("vec_id").as("n_id"), col("sub_id"), col("code"))
    // ADC distance table: query sub-vectors × the whole codebook
    val dt = broadcast(
      pqSubSlices(p.filter(col("vec_id") < nQueries), m, dim / m)
        .join(cb, Seq("sub_id"))
        .select(col("vec_id").as("q_id"), col("sub_id"), col("code"),
          (col("sn") + col("cn") - lit(2L) * dotQ(col("sv"), col("cv")))
            .as("sd")))
    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val adc = cand.join(codes, Seq("n_id"))
      .join(dt, Seq("q_id", "sub_id", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("sd")).as("adc"))
    // ADC SHORTLIST (partial top-R on -adc — exact in the double lane,
    // |adc| < 2^53) …
    val short = adc
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(rerank)(
        -col("adc").cast("double"), col("n_id")).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("e"))
      .select(col("q_id"), col("e._2").as("n_id"),
        (-col("e._1")).cast("long").as("adc"))
    // … then EXACT rerank of just the shortlist (nQueries·rerank rows —
    // the window is over a bounded relation, never the corpus)
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val rer = short
      .join(broadcast(queries), Seq("q_id")).join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
      .filter(!isnan(col("cos")))
    rer.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("adc"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** RESIDUAL-coded IVF-PQ (round 12) — the FAISS DEFAULT the round-11
    * no-residual variant documented as "drops into the same shape with
    * one extra centroid subtraction": PQ codes quantize each vector's
    * RESIDUAL v − c(v) against its assigned coarse centroid, not the
    * raw vector. Residuals concentrate near the origin (the coarse
    * quantizer has already explained the between-list variance), so
    * the same code budget spends its resolution on the within-list
    * detail — the reason production IVFPQ codes residuals.
    *
    * What changes relationally (everything else is [[ivfpqTopKWith]]
    * verbatim): (1) the encode input is the residual frame — one
    * narrow broadcast-centroid join + exact integer zip_with
    * subtraction past the assignment; (2) the PQ codebooks train on
    * residuals; (3) the ADC distance table becomes per-(query, PROBED
    * list) — the query's residual differs per list, so the table grows
    * by the nprobe factor (queries·nprobe·m·codes — still bounded,
    * still broadcast) and the ADC join keys on (q_id, cent_id,
    * sub_id, code) with the candidate's own list carried from the
    * assignment. Same exact-BIGINT arithmetic throughout → the ENTIRE
    * composite (coarse training, residuals, codebook training, ADC,
    * shortlist, rerank) replays in the DuckDB oracle.
    *
    * Output: (q_id, rank, n_id, adc, cos), ordered — the
    * [[ivfpqTopK]] contract.
    *
    * SERVE form (round 18, VERDICT r17 item 4): pass `centroids0` (a
    * loaded [[saveCentroids]] table — the SAME persisted quantizer
    * that serves `sim_ann_ivf_served`) to skip coarse training, and
    * `residualCodebook0` (a loaded [[saveCodebook]] table trained by
    * [[trainResidualPqCodebook]]) to skip PQ training — the deployed
    * shape where both artifacts train once and queries pay only the
    * encode + ADC + rerank. Training determinism makes the served
    * output bit-identical to the in-session form (spec-asserted), so
    * the unrolled-training oracle is shared verbatim. */
  def ivfpqResidualTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
                        dim: Int = 64, nlist: Int = 16, nprobe: Int = 4,
                        trainIters: Int = 2, m: Int = PqSubspaces,
                        kCodes: Int = IvfPqCodes, pqIters: Int = PqIters,
                        trainCap: Int = PqTrainCap,
                        rerank: Int = IvfPqRerank,
                        scope: CacheScope = CacheScope.off,
                        centroids0: Option[DataFrame] = None,
                        residualCodebook0: Option[DataFrame] = None): DataFrame = {
    require(rerank >= k, s"rerank shortlist ($rerank) must cover k ($k)")
    require(m >= 1 && dim % m == 0, s"dim ($dim) must divide into $m subspaces")
    val subLen = dim / m
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val centroids = centroids0.getOrElse(
      trainCentroids(prepared(emb), nlist, trainIters))
    val cent = broadcast(centroids
      .select(col("cent_id"), col("c_qv"), col("c_nrm")))
    // the assignment (nlist dot products per vector) feeds THREE
    // branches (residual build for PQ training, residual build for the
    // encode, candidate lists) — scope-persist so the nlist-wide pass
    // runs once; CacheScope.off recomputes per branch, leak-free
    val assigned = scope.track(p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id")))
    val probes = p.filter(col("vec_id") < nQueries).join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("pr") <= nprobe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    // corpus residuals: exact integer subtraction against the ASSIGNED
    // centroid (one broadcast join — the "one extra subtraction")
    val rvs = p.join(assigned, Seq("vec_id"))
      .join(cent.select(col("cent_id"), col("c_qv")), Seq("cent_id"))
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("qv"), col("c_qv"), (a, b) => a - b).as("qv"))
    val cb = residualCodebook0 match {
      case Some(loaded) =>
        val needCb = Seq("sub_id", "code", "cv", "cn")
        require(needCb.forall(loaded.columns.contains),
          s"codebook must carry ${needCb.mkString(", ")} — got " +
            loaded.columns.mkString(", "))
        broadcast(loaded.select(needCb.map(col): _*))
      case None => pqTrain(rvs, dim, m, kCodes, pqIters, trainCap)
    }
    val codes = pqAssign(pqSubSlices(rvs, m, subLen), cb)
      .select(col("vec_id").as("n_id"), col("sub_id"), col("code"))
    // per-(query, probed list) residual distance table: the query's
    // residual differs per probed centroid, so the bounded broadcast
    // table carries cent_id — nQueries·nprobe·m·kCodes rows
    val qres = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv"))
      .join(broadcast(probes), Seq("q_id"))
      .join(cent.select(col("cent_id"), col("c_qv")), Seq("cent_id"))
      .select(col("q_id"), col("cent_id"),
        zip_with(col("qv"), col("c_qv"), (a, b) => a - b).as("rv"))
    val qsub = qres.select(col("q_id"), col("cent_id"),
        posexplode(array((0 until m).map(s =>
          slice(col("rv"), s * subLen + 1, subLen)): _*)))
      .select(col("q_id"), col("cent_id"),
        col("pos").cast("long").as("sub_id"), col("col").as("sv"))
      .withColumn("sn", dotQ(col("sv"), col("sv")))
    val dt = broadcast(qsub.join(cb, Seq("sub_id"))
      .select(col("q_id"), col("cent_id"), col("sub_id"), col("code"),
        (col("sn") + col("cn") - lit(2L) * dotQ(col("sv"), col("cv")))
          .as("sd")))
    // candidates carry their OWN list id — the ADC key
    val cand = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("cent_id"), col("vec_id").as("n_id"))
      .distinct()
    val adc = cand.join(codes, Seq("n_id"))
      .join(dt, Seq("q_id", "cent_id", "sub_id", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("sd")).as("adc"))
    val short = adc
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKAgg.topK(rerank)(
        -col("adc").cast("double"), col("n_id")).as("tk"))
      .select(col("q_id"), explode(col("tk")).as("e"))
      .select(col("q_id"), col("e._2").as("n_id"),
        (-col("e._1")).cast("long").as("adc"))
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val rer = short
      .join(broadcast(queries), Seq("q_id")).join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
      .filter(!isnan(col("cos")))
    rer.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("n_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("adc"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** RANDOM-PROJECTION (Johnson–Lindenstrauss) reduction audit
    * (round 11) — the dimension-reduction primitive behind every
    * "project to 16-d before the expensive pass" trick, with its JL
    * guarantee made AUDITABLE: project each 64-d vector through 16
    * deterministic integer hyperplanes (the SignLshBuckets LCG
    * weights — a pure function of (j, i), shared verbatim with the
    * oracle — right-shifted into [−1024, 1023] via nonneg-division
    * then recentering, so floor ≡ truncate and no sign-division trap)
    * and report each vector's original and projected squared norms
    * plus their ratio. The ratio's concentration IS the JL lemma; a
    * broken projection (biased weights, dropped dims) shows as
    * dispersion. All integer arithmetic except the one ratio
    * division.
    *
    * Output: (vec_id, orig_nrm, proj_nrm, ratio), ordered. */
  def randomProjectionAudit(emb: DataFrame, dim: Int = 64,
                            outDim: Int = 16): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val projCols = (0 until outDim).map { j =>
      val w = (0 until dim).map(i => rpWeight(j, i))
      dotQ(col("qv"), array(w.map(lit(_)): _*))
    }
    val projNrm = projCols.map(c => c * c).reduce(_ + _)
    p.select(col("vec_id"), col("nrm").as("orig_nrm"),
        projNrm.as("proj_nrm"))
      .withColumn("ratio",
        col("proj_nrm").cast("double") / col("orig_nrm"))
      .orderBy(col("vec_id"))
  }

  /** The projection weight: the SignLshBuckets LCG raw value in
    * [0, 2^31), divided (nonneg — floor ≡ truncate) by 2^20 and
    * recentered to [−1024, 1023]. Shared with SparkEntry's oracle. */
  def rpWeight(j: Int, i: Int): Long = {
    val x = (j.toLong * 1000003L + i) * 1103515245L + 12345L
    val m = x % 2147483648L
    val raw = if (m < 0) m + 2147483648L else m
    raw / 1048576L - 1024L
  }

  /** TOP-EIGENVECTOR power iteration (round 11) — the principal
    * direction of the embedding cloud, the spectral half of the
    * collapse diagnostic ([[normHistogram]] sees magnitude collapse;
    * a dominant eigenvalue sees DIRECTIONAL collapse — anisotropy is
    * the first thing an embedding-quality paper measures): two
    * unrolled power-iteration steps over the exact integer GRAM matrix
    * (the fixed-unroll doctrine — IVF's Lloyd's, PageRank's
    * supersteps — applied to spectral analysis).
    *
    * Integer-exact by construction: G = Σ v·vᵀ accumulates d²
    * exact-long cells via ONE map-side-combinable aggregation (the
    * classic distributed Gram shape: shuffle is d² cells per task,
    * never the corpus); each matvec y = G·x is a d²-row join-aggregate
    * against the broadcast d-row x; rescaling is
    * sign(y)·((|y|·256) div max|y|) — truncating-division-on-
    * nonnegatives, identical in any engine, no normalization sqrt.
    * The Rayleigh quotient xᵀGx / xᵀx runs its quadratic form in
    * DECIMAL(38,0) sums (int64 would overflow at corpus scale) and
    * casts to double ONCE.
    *
    * Output: d rows — (comp, x_val, rayleigh), ordered by comp;
    * rayleigh (the dominant-eigenvalue estimate, constant across
    * rows) rides a broadcast 1-row gate frame. */
  def topEigvec(emb: DataFrame, dim: Int = 64, iters: Int = 2,
                rescale: Long = 256L): DataFrame = {
    require(iters >= 1 && rescale >= 2, "need iters >= 1, rescale >= 2")
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val gram = p.select(posexplode(col("qv")).as(Seq("i", "vi")),
        col("qv"))
      .select(col("i"), col("vi"), posexplode(col("qv")).as(Seq("j", "vj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("vi") * col("vj")).as("gij"))
    val spark0 = emb.sparkSession
    import spark0.implicits._
    var x = broadcast((0 until dim).map(j => (j, 1L)).toDF("j", "x"))
    for (_ <- 1 to iters) {
      val y = gram.join(x, Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("gij") * col("x")).as("y"))
      val m = y.agg(max(abs(col("y"))).as("m"))
      x = broadcast(y.crossJoin(broadcast(m))
        .select(col("i").as("j"),
          (signum(col("y")).cast("long") *
            expr(s"(abs(y) * $rescale) div greatest(m, 1)")).as("x")))
    }
    // Rayleigh quotient in decimal-exact arithmetic
    val xi = x.select(col("j").as("i"), col("x").as("xi"))
    val xj = x.select(col("j"), col("x").as("xj"))
    val num = gram.join(broadcast(xi), Seq("i")).join(broadcast(xj), Seq("j"))
      .agg(sum(col("gij").cast(DecimalType38) * col("xi") * col("xj"))
        .cast("double").as("num"))
    val den = x.agg(sum(col("x") * col("x")).as("den"))
    val rq = num.crossJoin(broadcast(den))
      .select((col("num") / col("den").cast("double")).as("rayleigh"))
    x.select(col("j").cast("long").as("comp"), col("x").as("x_val"))
      .crossJoin(broadcast(rq))
      .orderBy(col("comp"))
  }

  /** SIGN-BIT BALANCE (round 16) — the per-dimension health check
    * under every sign-LSH structure (`embed_sign_hamming`, the
    * SimHash family): bit i of the signature is informative only if
    * dimension i splits the corpus near 50/50 — a dimension that is
    * almost-always-positive contributes a constant bit, silently
    * shrinking the effective code length and densifying every bucket.
    * Exact integer censuses per dimension (positive / negative /
    * zero over the quantized grid), balance as one truncating ppm
    * division; ≤ dim rows out of one map-side-combinable pass.
    *
    * Output: (dim, n_pos, n_neg, n_zero, pos_ppm), ordered by dim. */
  def signBalance(emb: DataFrame, dim: Int = 64): DataFrame = {
    prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
      .select(posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(sum(when(col("v") > 0L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("v") < 0L, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("v") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim"), col("n_pos"), col("n_neg"), col("n_zero"),
        expr("CAST((n_pos * 1000000) div " +
          "nullif(n_pos + n_neg + n_zero, 0L) AS BIGINT)").as("pos_ppm"))
      .orderBy(col("dim"))
  }

  /** EMBEDDING ISOTROPY PROFILE (round 16) — the one-number spectral-
    * collapse readout on top of [[topEigvec]]: top_share = λ₁ / tr(G),
    * the fraction of total variance the first principal direction
    * carries (isotropic embeddings → 1/dim ≈ 0.016 at dim 64; a
    * collapsed space → 1 — the anisotropy monitor run before cosine
    * similarity is trusted, cf. Mu & Viswanath's all-but-the-top).
    * The TRACE is exact BIGINT for free — tr(G) = Σ‖v‖², the `nrm`
    * column [[prepared]] already carries, one narrow corpus pass with
    * no Gram join; λ₁ is [[topEigvec]]'s Rayleigh quotient (fixed
    * IEEE tree over exact integers), and top_share is ONE further
    * IEEE division.
    *
    * Output: one row (n_vecs, trace, rayleigh, top_share). */
  def isotropyProfile(emb: DataFrame, dim: Int = 64, iters: Int = 2,
                      rescale: Long = 256L): DataFrame = {
    val tr = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
      .agg(count(lit(1)).as("n_vecs"),
        coalesce(sum(col("nrm")), lit(0L)).as("trace"))
    val rq = topEigvec(emb, dim, iters, rescale)
      .agg(min(col("rayleigh")).as("rayleigh"))
    tr.crossJoin(broadcast(rq))
      .select(col("n_vecs"), col("trace"), col("rayleigh"),
        (col("rayleigh") / col("trace").cast("double")).as("top_share"))
  }

  private val DecimalType38 =
    org.apache.spark.sql.types.DecimalType(38, 0)

  /** TOP-2 PCA (round 12) — [[topEigvec]] extended to the second
    * principal direction by DEFLATED power iteration, the step that
    * turns the spectral diagnostic into an actual 2-D projection basis
    * (embedding-drift plots, anisotropy checks — "is the second
    * direction real or is the spectrum collapsed" is read off the two
    * Rayleigh quotients). Deflation is the classic projection removal
    * z = y − (⟨y, x₁⟩/⟨x₁, x₁⟩)·x₁ made INTEGER-EXACT by multiplying
    * through: z·s₁ = y·s₁ − ⟨y, x₁⟩·x₁ with s₁ = ⟨x₁, x₁⟩ — a scalar
    * multiple has the same direction, and the iteration rescales every
    * round anyway. To keep every product in int64, the Gram multiply's
    * output is rescaled to the ±`rescale` grid BEFORE deflating
    * (y ≤ 256, s₁ ≤ dim·256², ⟨y,x₁⟩ ≤ dim·256² — all far under 2^63);
    * like the unigram trainer's integer cost surrogate, the fixed-grid
    * iteration IS the algorithm, bit-replayable on any engine. The
    * `ortho_dot` audit column is the exact integer ⟨x₁, x₂⟩ — small
    * relative to s₁ when deflation worked.
    *
    * Scale shape: identical to [[topEigvec]] — one corpus-sized Gram
    * pass (dim²-bounded output, checkpointed: multiple x-chains read
    * it), then everything operates on 64-row broadcast frames.
    *
    * Output: (comp, x1_val, x2_val, rayleigh1, rayleigh2, ortho_dot),
    * ordered by comp. */
  def pca2(emb: DataFrame, dim: Int = 64, iters: Int = 2,
           rescale: Long = 256L): DataFrame = {
    require(iters >= 1 && rescale >= 2, "need iters >= 1, rescale >= 2")
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    // dim²-bounded (4096 rows at dim 64) — checkpoint so the two
    // iteration chains + two Rayleigh quotients + the audit all read
    // the one corpus pass. localCheckpoint ALONE is not enough here:
    // LogicalRDD.fromDataset rewrites stats from the origin plan (the
    // double-posexplode join estimates enormous), and the ~10 chained
    // gram references multiply sizeInBytes into a BigInteger whose
    // planning cost dwarfed the query (measured: 122 s at sf0.1, all
    // driver-side) — the Tokenizer.matFrame trap; re-wrapping the
    // checkpointed RDD resets each frame to a constant default size
    val gramCp = p.select(posexplode(col("qv")).as(Seq("i", "vi")),
        col("qv"))
      .select(col("i"), col("vi"), posexplode(col("qv")).as(Seq("j", "vj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("vi") * col("vj")).as("gij"))
      .localCheckpoint()
    val gram = gramCp.sparkSession.createDataFrame(gramCp.rdd, gramCp.schema)
    val spark0 = emb.sparkSession
    import spark0.implicits._
    // EVERY iteration frame is materialized (re-wrapped localCheckpoint,
    // the Tokenizer.matFrame discipline): the deflation references each
    // yp twice and each scaleTo references its input twice, so a lazy
    // chain MULTIPLIES the plan tree ~4-6× per iteration — the
    // optimizer's per-rule TreeNode walks then went quadratic in a
    // tens-of-thousands-node tree (measured: 122 s of pure DRIVER time
    // at sf0.1 for ~1 s of executor work). Each cut is a 64-row job.
    def matF(df: DataFrame): DataFrame = {
      val cp = df.localCheckpoint()
      cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
    }
    def ones: DataFrame =
      broadcast((0 until dim).map(j => (j, 1L)).toDF("j", "x"))
    def mul(x: DataFrame): DataFrame =
      gram.join(broadcast(x), Seq("j"))
        .groupBy(col("i")).agg(sum(col("gij") * col("x")).as("y"))
    def scaleTo(y: DataFrame): DataFrame = {
      val m = y.agg(max(abs(col("y"))).as("m"))
      y.crossJoin(broadcast(m))
        .select(col("i").as("j"),
          (signum(col("y")).cast("long") *
            expr(s"(abs(y) * $rescale) div greatest(m, 1)")).as("x"))
    }
    var x1 = ones
    for (_ <- 1 to iters) x1 = broadcast(matF(scaleTo(mul(x1))))
    val s1 = x1.agg(sum(col("x") * col("x")).as("s1"))
    val x1r = x1.select(col("j"), col("x").as("x1"))
    var x2 = ones
    for (_ <- 1 to iters) {
      val yp = matF(scaleTo(mul(x2)).join(broadcast(x1r), Seq("j")))
      val d = yp.agg(sum(col("x") * col("x1")).as("d"))
      val z = yp.crossJoin(broadcast(s1)).crossJoin(broadcast(d))
        .select(col("j").as("i"),
          (col("x") * col("s1") - col("d") * col("x1")).as("y"))
      x2 = broadcast(matF(scaleTo(z)))
    }
    def rq(x: DataFrame, out: String): DataFrame = {
      val xi = x.select(col("j").as("i"), col("x").as("xi"))
      val xj = x.select(col("j"), col("x").as("xj"))
      val num = gram.join(broadcast(xi), Seq("i"))
        .join(broadcast(xj), Seq("j"))
        .agg(sum(col("gij").cast(DecimalType38) * col("xi") * col("xj"))
          .cast("double").as("num"))
      val den = x.agg(sum(col("x") * col("x")).as("den"))
      num.crossJoin(broadcast(den))
        .select((col("num") / col("den").cast("double")).as(out))
    }
    val ortho = x1r.join(x2.select(col("j"), col("x").as("x2")), Seq("j"))
      .agg(sum(col("x1") * col("x2")).as("ortho_dot"))
    x1.select(col("j").cast("long").as("comp"), col("x").as("x1_val"))
      .join(x2.select(col("j").cast("long").as("comp"),
        col("x").as("x2_val")), Seq("comp"))
      .crossJoin(broadcast(rq(x1, "rayleigh1")))
      .crossJoin(broadcast(rq(x2, "rayleigh2")))
      .crossJoin(broadcast(ortho))
      .orderBy(col("comp"))
  }

  /** Embedding NORM histogram (round 11) — the embedding-collapse
    * diagnostic: a healthy encoder spreads vector norms; a collapsed
    * one piles them into one bucket, and a normalization bug shows as
    * a spike at a single exact value. Equi-width histogram over the
    * EXACT integer squared norms (the priceHistogram integer-binning
    * shape: 1-row broadcast bounds frame, `(v−lo)·nb div (range+1)`
    * buckets, ≤ nb rows out at any corpus size, zero FP binning
    * ambiguity). Null embeddings are gated (no norm to bin).
    *
    * Output: (bucket, n, nrm_min, nrm_max), ordered. */
  /** SQ bit widths for [[quantizeCurve]], shared with the oracle. */
  val SqCurveBits: Seq[Int] = Seq(4, 6, 8)

  /** The per-position absolute reconstruction error of W-bit per-vector
    * affine quantization, as ONE SQL text shared verbatim by the
    * engine expression and the oracle generator (nonneg operands
    * throughout, so truncating div ≡ floor on any engine — the
    * embed_quantize arithmetic, parameterized by level count). */
  private def sqErrSql(w: Int, div: String): String = {
    val L = (1 << w) - 1
    s"abs(qi - (mn + (CASE WHEN mx = mn THEN 0 " +
      s"ELSE ((2 * (((qi - mn) * $L) $div (mx - mn)) + 1) * (mx - mn) + $L) $div ${2 * L} END)))"
  }

  /** QUANTIZATION ERROR CURVE (round 12) — the compression-tuning
    * readout beside `embed_quantize`'s fixed 8-bit audit: total and
    * mean reconstruction error of per-vector affine quantization at
    * each width in [[SqCurveBits]] — the curve that decides whether a
    * RAM-resident index can afford to halve again (8→4 bits is
    * another 2× smaller; THIS is what it costs). One pass computes
    * every width's error from the same exploded positions (no second
    * scan per width); pure integer arithmetic identical to the 8-bit
    * audit, generated per width on both sides. Rows out = widths. */
  def quantizeCurve(emb: DataFrame,
                    bitsList: Seq[Int] = SqCurveBits): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === 64)
    val pos = p
      .withColumn("mn", array_min(col("qv")))
      .withColumn("mx", array_max(col("qv")))
      .select(col("mn"), col("mx"),
        posexplode(col("qv")).as(Seq("pos", "qi")))
    val aggs = count(lit(1)).as("n_positions") +:
      bitsList.map(w => sum(expr(sqErrSql(w, "div"))).as(s"e$w"))
    pos.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(bitsList.map(w =>
        struct(lit(w.toLong).as("bits"),
          lit(((1L << w) - 1)).as("levels"),
          col("n_positions"),
          col(s"e$w").as("total_abs_err"))): _*)).as("p"))
      .select(col("p.bits").as("bits"), col("p.levels").as("levels"),
        col("p.n_positions").as("n_positions"),
        col("p.total_abs_err").as("total_abs_err"),
        expr("CAST((total_abs_err * 1000) div nullif(n_positions, 0L) " +
          "AS BIGINT)").as("err_milli_per_pos"))
      .orderBy(col("bits"))
  }

  /** The oracle text of [[quantizeCurve]] — generated from the SAME
    * constants and error formula (DuckDB `//` replaces `div`; nonneg
    * operands make them identical). */
  private[graft] def sqlQuantizeCurve: String = {
    val legs = SqCurveBits.map(w =>
      s"CAST(SUM(${sqErrSql(w, "//")}) AS BIGINT) AS e$w").mkString(", ")
    val heads = SqCurveBits.map(w =>
      s"SELECT CAST($w AS BIGINT) AS bits, CAST(${(1L << w) - 1} AS BIGINT) AS levels, " +
        s"n_positions, e$w AS total_abs_err FROM a").mkString(" UNION ALL ")
    "WITH q AS (SELECT list_transform(embedding, " +
      "x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS v FROM embeddings), " +
      "b AS (SELECT list_min(v) AS mn, list_max(v) AS mx, v FROM q " +
      "WHERE v IS NOT NULL AND len(v) = 64), " +
      "e AS (SELECT mn, mx, unnest(v) AS qi FROM b), " +
      s"a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_positions, $legs FROM e), " +
      s"h AS ($heads) " +
      "SELECT bits, levels, n_positions, total_abs_err, " +
      "CAST(total_abs_err * 1000 // nullif(n_positions, 0) AS BIGINT) AS err_milli_per_pos " +
      "FROM h ORDER BY bits"
  }

  /** PER-DIMENSION EMBEDDING AUDIT (round 12) — the dead/collapsed-
    * dimension detector an embedding lake runs before building any
    * index: a dimension whose variance has collapsed carries no
    * information (a truncated-projection or mis-export bug shows up
    * here first), and anisotropy across dimensions is what decides
    * whether PQ subspaces and random projections behave. Per dimension
    * of the quantized grid: n, Σv, Σv², min, max — all exact BIGINTs —
    * plus the exact variance NUMERATOR n·Σv²−(Σv)² (never divided:
    * the scale-free comparison across dims needs no float) and the
    * `dead` flag (min = max). Null/wrong-dim embeddings are gated like
    * every embed sibling.
    *
    * Scale shape: one posexplode + one 64-group map-side-combinable
    * aggregation; 64 rows out at any corpus size. */
  def dimStats(emb: DataFrame, dim: Int = 64): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    p.select(posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("svv"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
      .select(col("dim").cast("long").as("dim"), col("n"), col("sv"),
        col("svv"), col("v_min"), col("v_max"),
        expr("n * svv - sv * sv").as("var_num"),
        (col("v_min") === col("v_max")).as("dead"))
      .orderBy(col("dim"))
  }

  def normHistogram(emb: DataFrame, nb: Int = 16): DataFrame = {
    require(nb >= 1, s"need nb >= 1, got $nb")
    val p = prepared(emb).filter(col("nrm").isNotNull)
      .select(col("nrm"))
    val bounds = p.agg(min(col("nrm")).as("lo"), max(col("nrm")).as("hi"))
    p.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"((nrm - lo) * $nb) div (hi - lo + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("nrm")).as("nrm_min"), max(col("nrm")).as("nrm_max"))
      .orderBy(col("bucket"))
  }

  /** NEAREST-CENTROID classification + confusion matrix (round 11) —
    * the evaluation primitive of every embedding pipeline: do the
    * vectors cluster by their labels? Train one centroid per label
    * (element-wise exact-integer mean, the [[trainCentroids]] /
    * [[meanPoolEmbeddings]] arithmetic contract — no iteration, labels
    * supervise), classify every vector by integer-L2 argmin
    * (‖a‖²+‖c‖²−2⟨a,c⟩ pure BIGINT, (dist, label) total order), and
    * emit the confusion matrix. The diagonal mass IS the embedding-
    * quality score a training run tracks.
    *
    * Scale: one posexplode-groupBy pass for the ≤ labels centroids
    * (broadcast thereafter), one narrow broadcast-join argmin over the
    * corpus, a ≤ labels² map-side-combined count. Output: (label,
    * pred_label, n), ordered. */
  /** One rounded-mean centroid per label over the quantized vectors —
    * shared by [[centroidClassify]] and [[embeddingOutliers]] so the
    * two can never disagree on what a label's center is. */
  private def labelCentroids(p: DataFrame): DataFrame =
    p.select(col("label"), posexplode(col("qv")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => round(x.getField("m")).cast("long")).as("cv"))
      .select(col("label").as("clabel"), col("cv"))
      .withColumn("cn", dotQ(col("cv"), col("cv")))

  /** EMBEDDING OUTLIER GATE (round 13) — per label, how far each
    * vector sits from its OWN label centroid, and the share past
    * `mult`× the label's mean squared distance: the embedding-space
    * quality filter that drops mislabeled / corrupted / off-manifold
    * vectors before they poison a training mix (the semantic twin of
    * the text side's quality gates). All arithmetic exact: integer
    * squared L2 via ‖a‖²+‖c‖²−2⟨a,c⟩ (the [[centroidClassify]]
    * contract — same [[labelCentroids]], same codegen'd dot), distance
    * sums in DECIMAL(38,0), mean by integral div (non-negative domain),
    * the flag a pure BIGINT comparison, share in integer ppm. One
    * broadcast-join distance pass + a ≤ labels rollup + one broadcast
    * of the ≤ labels mean frame — the corpus never shuffles.
    *
    * Output: (label, n, mean_dist, n_outliers, outlier_ppm),
    * ordered. */
  def embeddingOutliers(emb: DataFrame, dim: Int = 64,
                        mult: Int = 4): DataFrame = {
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val dists = p.join(broadcast(labelCentroids(p)),
        col("label") === col("clabel"))
      .select(col("label"),
        (col("nrm") + col("cn") - lit(2L) * dotQ(col("qv"), col("cv")))
          .as("dist"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val means = dists.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("dist").cast(dec)).as("sd"))
      .select(col("label"), col("n"),
        expr("CAST(sd div n AS BIGINT)").as("mean_dist"))
    dists.join(broadcast(means), Seq("label"))
      .groupBy(col("label"), col("n"), col("mean_dist"))
      .agg(sum(when(col("dist") > lit(mult.toLong) * col("mean_dist"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_ppm", expr(
        "CAST((n_outliers * 1000000) div nullif(n, 0L) AS BIGINT)"))
      .orderBy(col("label"))
  }

  def centroidClassify(emb: DataFrame, dim: Int = 64): DataFrame = {
    // degenerate-row gate, for parity with every other embed op
    // (normHistogram / topEigvec / pqCodebookStats): without it a NULL
    // or off-dim vector would corrupt its label's centroid DIFFERENTLY
    // per engine — posexplode drops null arrays while an oracle's
    // list_zip/list_reduce propagates NULL through the mean
    val p = prepared(emb)
      .filter(col("qv").isNotNull && size(col("qv")) === dim)
    val cents = labelCentroids(p)
    p.join(broadcast(cents))
      .withColumn("dist",
        col("nrm") + col("cn") - lit(2L) * dotQ(col("qv"), col("cv")))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("dist"), col("clabel"))).as("mm"))
      .select(col("label"), col("mm.clabel").as("pred_label"))
      .groupBy(col("label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("pred_label"))
  }

  /** k-NN SELF-join via LSH buckets — EVERY vector's k nearest
    * neighbors, the all-corpus form of [[annTopK]] (which serves a
    * bounded query set): the semantic-dedup / hard-negative-mining /
    * cluster-seeding primitive of an embedding pipeline. A bounded
    * query set broadcasts; a self-join cannot, so the structure changes:
    * candidates enumerate per (table, bucket) through the
    * [[Dedup.boundedCandidatePairs]] hot-bucket guard (one shuffle,
    * O(maxBucket) memory per bucket, loud failure on degenerate
    * occupancy), orient both ways, then two shuffle equi-joins attach
    * the vectors and the partial top-k aggregator reduces each task's
    * slice to ≤ k per query BEFORE the final exchange. Nothing
    * broadcasts the corpus; every stage is shuffle-partitionable — the
    * shape that survives a corpus-sized vector table. Same recall
    * profile as [[annTopK]] (identical bucket scheme; spec-checked
    * equal on a shared query slice); `bitsPerTable` must grow with the
    * corpus exactly as [[nearDupPairsLsh]] documents. */
  def knnJoinLsh(emb: DataFrame, k: Int = 5,
                 tables: Int = 16, bitsPerTable: Int = 4,
                 maxBucket: Int = 1024,
                 overflow: BucketOverflow = BucketOverflow.Fail): DataFrame = {
    val p = prepared(emb)
    val und = Dedup.boundedCandidatePairs(
      lshBuckets(p, tables, bitsPerTable)
        .select(col("vec_id"), col("tbl"), col("bucket")),
      "vec_id", Seq("tbl", "bucket"), maxBucket, overflow, "knnJoinLsh")
    val dir = und.select(col("doc_a").as("q_id"), col("doc_b").as("n_id"))
      .unionByName(und.select(col("doc_b").as("q_id"), col("doc_a").as("n_id")))
    val qs = p.select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
      col("nrm").as("q_nrm"))
    val ns = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val scored = dir.join(qs, Seq("q_id")).join(ns, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
    topKPerGroup(scored, k)
  }

  /** SIGN-BIT HAMMING HISTOGRAM (round 15) — the binary-embedding
    * (ITQ-lineage) compression audit: collapse each vector to a 63-bit
    * sign signature (bit d set iff quantized component d > 0; 63 bits
    * keeps the signature a positive BIGINT) and histogram the Hamming
    * distances over the LSH-bucketed candidate pairs — the curve that
    * says whether 8 bytes/vector preserve the neighborhood structure
    * (near pairs should concentrate in the low-Hamming buckets; a flat
    * curve means sign bits destroyed the geometry and binary recall
    * will be noise). Pairs come from the SAME bounded-bucket relation
    * as [[knnJoinLsh]] — never all-pairs; the xor + bit_count is
    * codegen'd integer work; the histogram is ≤ 16 structural rows.
    *
    * Overflow policy is DROP, not Fail (round 16, scale probe): this
    * is a DIAGNOSTIC histogram, and at crawl scale a popular sign
    * region (near-dup embeddings all co-bucket) will exceed any fixed
    * cap — the honest behavior is the documented truncation (over-cap
    * buckets contribute no pairs; the curve reads the sampled
    * neighborhood structure), not an abort of the audit that would
    * tell you about exactly that corpus. The serving-path keys
    * ([[knnJoinLsh]]) keep Fail — a recall contract can't silently
    * drop candidates.
    *
    * Output: (ham_bucket, n_pairs, min_ham, max_ham), bucket =
    * hamming div 4, ordered. */
  def signHammingHist(emb: DataFrame, tables: Int = 16,
                      bitsPerTable: Int = 4,
                      maxBucket: Int = 1024): DataFrame = {
    val p = prepared(emb)
    val sig = p.select(col("vec_id"), signSig.as("sig"))
    val und = Dedup.boundedCandidatePairs(
      lshBuckets(p, tables, bitsPerTable)
        .select(col("vec_id"), col("tbl"), col("bucket")),
      "vec_id", Seq("tbl", "bucket"), maxBucket, BucketOverflow.Drop,
      "signHammingHist")
    und.join(sig.select(col("vec_id").as("doc_a"), col("sig").as("sig_a")),
        Seq("doc_a"))
      .join(sig.select(col("vec_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("doc_b"))
      .select(expr("bit_count(sig_a ^ sig_b)").cast("long").as("ham"))
      .groupBy(expr("ham div 4").as("ham_bucket"))
      .agg(count(lit(1)).as("n_pairs"), min(col("ham")).as("min_ham"),
        max(col("ham")).as("max_ham"))
      .orderBy(col("ham_bucket"))
  }

  /** The 63-bit sign-signature expression shared by
    * [[signHammingHist]] and [[signHammingRecall]]. */
  private def signSig: Column = expr(
    "aggregate(sequence(0, CAST(least(size(qv), 63) - 1 AS INT)), 0L, " +
      "(acc, d) -> acc + IF(element_at(qv, CAST(d + 1 AS INT)) > 0, " +
      "shiftleft(1L, CAST(d AS INT)), 0L))")

  /** BINARY-RECALL CURVE (round 15) — the decision table
    * [[signHammingHist]]'s shape hints at, measured: recall@k of
    * brute-force HAMMING ranking against exact cosine ground truth at
    * bit budgets 16 / 32 / 63 (mask the signature's low b bits — the
    * memory-vs-recall dial a binary first-pass rerank is sized by;
    * full-scan of 8-byte codes IS the design point of binary
    * rerankers, so the corpus side streams while queries × budgets —
    * ≤ 30 rows — broadcast). Ranking ties break (hamming ASC, n_id
    * ASC) via the shared partial-top-k aggregator (score = −hamming),
    * so the whole curve replays exactly.
    *
    * Output: (bits, n_queries, n_possible, n_hits, recall_ppm),
    * ordered by bits. */
  def signHammingRecall(emb: DataFrame, nQueries: Int = LshNQueries,
                        k: Int = LshK): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb)
    val sigs = p.select(col("vec_id"), signSig.as("sig"))
    val gt = bruteForceTopK(emb, nQueries, k)
      .select(col("q_id"), col("n_id"))
    val budgets = Seq(16, 32, 63).toDF("bits")
    val queries = sigs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"))
      .crossJoin(budgets)
    val mask = expr("CASE WHEN bits >= 63 THEN 9223372036854775807L " +
      "ELSE shiftleft(1L, bits) - 1L END")
    val scored = sigs
      .select(col("vec_id").as("n_id"), col("sig").as("n_sig"))
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("m", mask)
      .withColumn("cos",
        -expr("bit_count((q_sig & m) ^ (n_sig & m))").cast("double"))
    val top = scored.groupBy(col("bits"), col("q_id"))
      .agg(graft.functions.TopKAgg.topK(k)(col("cos"), col("n_id")).as("tk"))
      .select(col("bits"), col("q_id"), explode(col("tk")).as("e"))
      .select(col("bits"), col("q_id"), col("e._2").as("n_id"))
    val denom = gt.agg(countDistinct(col("q_id")).as("n_queries"),
      count(lit(1)).as("n_possible"))
    val hits = top.join(gt, Seq("q_id", "n_id"))
      .groupBy(col("bits")).agg(count(lit(1)).as("n_hits"))
    budgets.join(hits, Seq("bits"), "left")
      .crossJoin(broadcast(denom))
      .select(col("bits"), col("n_queries"), col("n_possible"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("CAST((coalesce(n_hits, 0L) * 1000000) div " +
          "nullif(n_possible, 0L) AS BIGINT)").as("recall_ppm"))
      .orderBy(col("bits"))
  }

  /** kNN LABEL-PROBE ACCURACY (round 15) — the standard intrinsic
    * embedding-quality eval (a kNN probe): predict each vector's label
    * by majority vote of its [[knnJoinLsh]] top-k neighbors and score
    * the vote against the true label, per label. Vote ties break by
    * (votes DESC, label ASC) — deterministic; vectors whose LSH
    * buckets yield NO candidates get no prediction and are reported in
    * `n_nopred` rather than silently dropped (an encoder whose vectors
    * hash alone is itself a finding). Rides the bounded-bucket kNN
    * join unchanged — the accuracy layer adds one broadcast label
    * attach, a per-(query, label) vote rollup (≤ |labels| rows per
    * query) and a bounded vote window.
    *
    * Output: (label, n_vecs, n_pred, n_nopred, n_correct, acc_ppm),
    * ordered by label — acc_ppm is over predicted vectors. */
  def knnLabelAccuracy(emb: DataFrame, k: Int = 5,
                       tables: Int = 16, bitsPerTable: Int = 4,
                       maxBucket: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val knn = knnJoinLsh(emb, k, tables, bitsPerTable, maxBucket)
    val lbl = emb.select(col("vec_id"), col("label"))
    val votes = knn
      .join(lbl.select(col("vec_id").as("n_id"), col("label").as("n_label")),
        "n_id")
      .groupBy(col("q_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("n_label").asc)
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("n_label").as("pred"))
    val scored = lbl.join(pred, Seq("vec_id"), "left")
    scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("pred").isNotNull, 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("pred").isNull, 1L).otherwise(0L)).as("n_nopred"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n_vecs"), col("n_pred"), col("n_nopred"),
        col("n_correct"),
        expr("CAST((n_correct * 1000000) div nullif(n_pred, 0L) AS BIGINT)")
          .as("acc_ppm"))
      .orderBy(col("label"))
  }

  /** SEMANTIC deduplication (SemDeDup-lineage, round 10) — the
    * embedding-cluster dedup family: cluster the corpus with the
    * deterministic seed-centroid coarse quantizer (the
    * [[seedCentroids]] machinery sim_ann_ivf_fixed proved replayable),
    * then enumerate cosine pairs INTRA-CLUSTER ONLY and greedily drop
    * every vector that duplicates (cosine ≥ threshold) a smaller-id
    * vector in its own cluster. The cluster pass is what makes semantic
    * dedup tractable at corpus scale: candidate enumeration is
    * per-cluster, never all-pairs — the same blocking idea as LSH, but
    * with semantically-coherent blocks, so a near-duplicate pair that
    * LSH's random hyperplanes can split still co-clusters.
    *
    * Scale shape: centroid assignment is a broadcast nested-loop over
    * ≤ nlist rows (narrow, no shuffle); intra-cluster pairs route
    * through [[Dedup.boundedCandidatePairs]] (one shuffle keyed on
    * cent_id, O(maxCluster) buffers, fail-loud hot-cluster policy —
    * an under-provisioned nlist surfaces as an error naming this
    * operator, never a silent quadratic task); the exact-cosine verify
    * is two shuffle equi-joins + a narrow filter. Nothing broadcasts
    * the corpus; nlist must grow with the corpus exactly as SemDeDup
    * prescribes (k ∝ √N).
    *
    * Keep rule: greedy keep-lowest-id within a cluster (vec_b of every
    * thresholded pair is the duplicate) — the same canonical-min
    * doctrine as dedup_exact and multimodal_dhash, and deterministic
    * under any partitioning. Output: one row per corpus vector
    * (vec_id, cent_id, n_dup_of = #smaller-id intra-cluster dups it
    * matches, max_cos = its strongest such match or null, is_kept),
    * ordered by vec_id — fully DuckDB-replayable (integer-quantized
    * cosine + deterministic centroids). */
  def semanticDedup(emb: DataFrame, nlist: Int = 16, threshold: Double = 0.4,
                    maxCluster: Int = 4096,
                    overflow: BucketOverflow = BucketOverflow.Fail): DataFrame = {
    val p = prepared(emb)
    val cent = broadcast(seedCentroids(p, nlist))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c_cos"), -col("cent_id")))
        .as("cent_id"))
    val cand = Dedup.boundedCandidatePairs(
        assigned.select(col("vec_id"), col("cent_id")),
        "vec_id", Seq("cent_id"), maxCluster, overflow, "semanticDedup")
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    val pa = p.select(col("vec_id").as("vec_a"), col("qv").as("a_qv"),
      col("nrm").as("a_nrm"))
    val pb = p.select(col("vec_id").as("vec_b"), col("qv").as("b_qv"),
      col("nrm").as("b_nrm"))
    val dup = cand.join(pa, Seq("vec_a")).join(pb, Seq("vec_b"))
      .withColumn("cos",
        cosine(dotQ(col("a_qv"), col("b_qv")), col("a_nrm"), col("b_nrm")))
      .filter(defined(col("cos")) && col("cos") >= threshold)
    val flagged = dup.groupBy(col("vec_b").as("vec_id"))
      .agg(count(lit(1)).as("nd"), max(col("cos")).as("mc"))
    assigned.join(flagged, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"),
        coalesce(col("nd"), lit(0L)).as("n_dup_of"),
        col("mc").as("max_cos"),
        col("nd").isNull.as("is_kept"))
      .orderBy(col("vec_id"))
  }

  /** SEMANTIC DEDUP AT CLUSTER GRAIN (round 14) — the SemDeDup shape
    * (Abbas et al. 2023, arXiv:2303.09540): embedding-cluster the
    * corpus, and within each cluster drop every member that sits
    * above a cosine cap to its OWN centroid except the single
    * centroid-nearest one — the embedding-space counterpart of the
    * lexical near-dup gate, standard in LLM curation (a tight ball
    * around a centroid is one semantic document photocopied; the
    * best-aligned copy represents it). Members below the cap are
    * untouched — they are cluster NEIGHBORS, not duplicates.
    *
    * Unlike [[semanticDedup]] (pairwise cosines inside the bounded
    * bucket — O(cluster²)), the cluster-grain rule needs only each
    * member's cosine to its assigned centroid — O(N·nlist) narrow work
    * against the broadcast seed quantizer, NO pair relation at all:
    * the form that survives 100 TB unconditionally. Assignment is the
    * `sim_ann_ivf_fixed` seed-quantizer rule verbatim (fully
    * replayable); the keep rank is a per-(cluster, above-cap) window —
    * partitioned by construction. Keep-set reconciliation is
    * structural: per cluster, kept = (members below cap) + min(1,
    * members above cap) — the spec asserts it, the oracle hash-pins
    * every row. NaN/null cosines (zero-norm vectors) are never
    * "above" ([[defined]] gate) — a degenerate vector is kept, not
    * silently deduped against the centroid it isn't near.
    *
    * Output: (vec_id, cent_id, c_cos, keep), ordered by vec_id. */
  def semanticPrune(emb: DataFrame, nlist: Int = 16,
                    cap: Double = 0.35): DataFrame = {
    val p = prepared(emb)
    val cent = broadcast(seedCentroids(p, nlist))
    val assigned = p.join(cent)
      .withColumn("c_cos",
        cosine(dotQ(col("qv"), col("c_qv")), col("nrm"), col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("c_cos")),
        struct(col("c_cos"), -col("cent_id"))).as("c"))
      .select(col("vec_id"), col("c.cent_id").as("cent_id"),
        col("c.c_cos").as("c_cos"))
      .withColumn("above", defined(col("c_cos")) && col("c_cos") >= cap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cent_id"), col("above"))
      .orderBy(col("c_cos").desc, col("vec_id"))
    assigned.withColumn("rn", row_number().over(w))
      .select(col("vec_id"), col("cent_id"), col("c_cos"),
        (!col("above") || col("rn") === 1).as("keep"))
      .orderBy(col("vec_id"))
  }

  /** RANGE (radius) search (round 11) — the threshold dual of
    * [[annTopK]]: instead of "the k nearest", every corpus vector
    * within cosine ≥ `threshold` of each query — the retrieval shape
    * behind duplicate screening ("anything closer than 0.9?") and
    * recall-bounded filtering, where the ANSWER SIZE is data-dependent
    * and top-k silently truncates. Same candidate machinery as the
    * top-k path (per-table bucket equi-join, broadcast bounded query
    * set, exact rerank — identical recall caveats, spec-checked against
    * brute force), but the tail aggregates instead of ranking: per
    * query, candidate count, match count and the best match — one row
    * per query ALWAYS (structural-empty doctrine: a query whose buckets
    * are empty reports zeros, not absence). Zero-norm cosines are
    * excluded from matches by the NaN gate exactly as everywhere else.
    *
    * Output: (q_id, n_candidates, n_matches, max_cos), ordered. */
  def rangeSearch(emb: DataFrame, nQueries: Int = 10, threshold: Double = 0.3,
                  tables: Int = 16, bitsPerTable: Int = 4): DataFrame = {
    val p = prepared(emb)
    val buckets = lshBuckets(p, tables, bitsPerTable)
    val qb = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cand = buckets.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val hit = defined(col("cos")) && col("cos") >= threshold
    val agg = cand
      .join(broadcast(queries), Seq("q_id"))
      .join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("nc"),
        sum(when(hit, 1L).otherwise(0L)).as("nm"),
        max(when(hit, col("cos"))).as("mc"))
    queries.select(col("q_id")).join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("nc"), lit(0L)).as("n_candidates"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        col("mc").as("max_cos"))
      .orderBy(col("q_id"))
  }

  /** ANN top-k: candidate set = union over L hash tables of the query's
    * bucket, deduped, then exact cosine rerank. The per-table lookup is an
    * equi-join on (table, bucket) — shuffle-partitionable, no cross join —
    * the structure that survives 100 TB. Recall vs [[bruteForceTopK]] is
    * checked in tests (approximate by design). */
  def annTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
              tables: Int = 16, bitsPerTable: Int = 4): DataFrame = {
    val p = prepared(emb)
    val buckets = lshBuckets(p, tables, bitsPerTable)
    val qb = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cand = buckets.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    // broadcast ONLY the bounded query set, never the corpus
    val queries = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"))
    val corpus = p.select(col("vec_id").as("n_id"), col("qv").as("n_qv"),
      col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), Seq("q_id"))
      .join(corpus, Seq("n_id"))
      .withColumn("cos",
        cosine(dotQ(col("q_qv"), col("n_qv")), col("q_nrm"), col("n_nrm")))
    topKPerGroup(scored, k)
  }

  /** PER-LABEL CENTROID DRIFT (round 14) — the embedding-monitoring
    * readout every production vector pipeline runs on re-encode: for
    * each label, the cosine between the class centroid computed over
    * the EVEN vec_ids and over the ODD ones (the deterministic split-
    * half estimate of encoder stability — a drifted model, a changed
    * normalization, or a poisoned shard shows up as a label whose two
    * halves disagree). EXACT front: cosine of the integer SUM vectors
    * (scale-invariant — the count division cancels, so no
    * mean-vector rounding exists to diverge), per-term products in
    * DECIMAL(38,0) (sum-vector dots overflow int64 at warehouse
    * counts), ONE fixed IEEE tree through the via-string bridge. A
    * label with an EMPTY half is absent (no drift is measurable
    * against nothing — the inner pairing join drops it); a zero sum
    * vector yields NULL. One posexplode + one (label, half, dim)
    * aggregation + a label-keyed pairing join.
    *
    * Output: (label, n_even, n_odd, cos_drift), ordered by label. */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column) = c.cast("string").cast("double")
    val sums = emb
      .select(col("label"), (pmod(col("vec_id"), lit(2L)) === 0).as("even"),
        posexplode(quantize(col("embedding"))).as(Seq("dim", "x")))
      .groupBy(col("label"), col("even"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
    val a = sums.filter(col("even"))
      .select(col("label"), col("dim"), col("sx").as("sa"),
        col("cnt").as("ca"))
    val b = sums.filter(!col("even"))
      .select(col("label"), col("dim"), col("sx").as("sb"),
        col("cnt").as("cb"))
    a.join(b, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(
        expr("max(ca)").as("n_even"), expr("max(cb)").as("n_odd"),
        sum(col("sa").cast(dec) * col("sb")).as("dot"),
        sum(col("sa").cast(dec) * col("sa")).as("na2"),
        sum(col("sb").cast(dec) * col("sb")).as("nb2"))
      .select(col("label"), col("n_even"), col("n_odd"),
        when(col("na2") <= 0 || col("nb2") <= 0, lit(null).cast("double"))
          .otherwise(d(col("dot")) /
            (sqrt(d(col("na2"))) * sqrt(d(col("nb2"))))).as("cos_drift"))
      .orderBy(col("label"))
  }

  /** DIMENSION COVARIANCE / CORRELATION MATRIX (round 14) — the
    * upper-triangle d×d covariance of the quantized embedding space,
    * the diagnostic behind every whitening / PCA / dimension-collapse
    * question ("are half my dimensions redundant?") and the exact
    * big-brother of `embed_dim_stats`' per-dim moments. EXACT
    * ACCUMULATION: quantized ×1000 integers, per-row upper-triangle
    * products generated by ONE nested-transform HOF (d(d+1)/2 structs
    * per row — no self-join, no shuffle of the exploded relation
    * beyond the 2080-key hash aggregate, which map-side combines to
    * ≤ d(d+1)/2 rows per task), Σxy and Σx in DECIMAL(38,0) (the
    * supplierHhi headroom doctrine — squares overflow int64 at
    * warehouse row counts). cov_num = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ surfaces
    * VIA STRING (parity is dtype-kind sensitive; HUGEINT↔DECIMAL both
    * read as strings), and Pearson corr is the ONE fixed IEEE tree
    * d(cov)/(√d(varᵢ)·√d(varⱼ)) through the via-string bridge, NULL
    * when either variance is zero (a constant dimension has no
    * correlation, and IEEE ±Inf/NaN don't hash-compare).
    *
    * Scale shape: one corpus scan, one 2080-key aggregation, two
    * broadcast joins of the 64-row diagonal. Rows out = d(d+1)/2. */
  def covarianceMatrix(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: Column) = c.cast("string").cast("double")
    val q = emb.select(quantize(col("embedding")).as("q"))
    // round 19: the per-row upper-triangle products are a native JVM
    // loop (tri_upper_products) instead of the interpreted
    // nested-transform HOF chain — d(d+1)/2 lambda frames per vector
    // was the key's dominant cost; value/type-identical structs, so the
    // oracle's list_transform replay is unaffected (guide §4).
    val tri = q.select(explode(
      graft.functions.VectorFunctions.triUpperProducts(col("q"))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"), col("p.xy").as("xy"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(col("xy").cast(dec)).as("sxy"), count(lit(1)).as("n_vecs"))
    val sums = q.select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(sum(col("x").cast(dec)).as("sx"))
    val withCov = tri
      .join(broadcast(sums.select(col("dim").as("d1"), col("sx").as("sx1"))), "d1")
      .join(broadcast(sums.select(col("dim").as("d2"), col("sx").as("sx2"))), "d2")
      .withColumn("cov_num",
        col("n_vecs").cast(dec) * col("sxy") - col("sx1") * col("sx2"))
    val diag = withCov.filter(col("d1") === col("d2"))
      .select(col("d1").as("dim"), col("cov_num").as("varnum"))
    withCov
      .join(broadcast(diag.select(col("dim").as("d1"), col("varnum").as("v1"))), "d1")
      .join(broadcast(diag.select(col("dim").as("d2"), col("varnum").as("v2"))), "d2")
      .select(col("d1"), col("d2"), col("n_vecs"),
        col("cov_num").cast("string").as("cov_num"),
        when(col("v1") <= 0 || col("v2") <= 0, lit(null).cast("double"))
          .otherwise(d(col("cov_num")) / (sqrt(d(col("v1"))) * sqrt(d(col("v2")))))
          .as("corr"))
      .orderBy(col("d1"), col("d2"))
  }

  /** NORM PROFILE per label (round 15) — the first embedding-quality
    * readout a class-conditioned corpus gets: per label, the vector
    * count and the min / max / mean of the quantized squared norm (an
    * embedding family whose norms collapse toward 0 for one class is a
    * broken encoder run; norms tell before any similarity does). All
    * integers in the ×1000-quantized domain; the mean ships as an
    * exact div in ppm-of-quantized-units and the SUM rides
    * DECIMAL(38,0) (norm sums overflow int64 at corpus scale) via the
    * string bridge. One map-side-combinable aggregation; NULL vectors
    * are excluded (undefined norm — the [[prepared]] contract).
    *
    * Output: (label, n_vecs, min_nrm, max_nrm, sum_nrm, mean_nrm),
    * ordered. */
  def normByLabel(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    prepared(emb.filter(col("embedding").isNotNull))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("nrm")).as("min_nrm"), max(col("nrm")).as("max_nrm"),
        sum(col("nrm").cast(dec)).as("sum_dec"))
      .select(col("label"), col("n_vecs"), col("min_nrm"), col("max_nrm"),
        col("sum_dec").cast("string").as("sum_nrm"),
        expr("CAST(sum_dec div nullif(CAST(n_vecs AS DECIMAL(38,0)), 0) " +
          "AS BIGINT)").as("mean_nrm"))
      .orderBy(col("label"))
  }

  /** PER-DIMENSION DRIFT between corpus halves (round 15) — the
    * encoder-drift monitor: the embedding stream's first half
    * (vec_id < mid) vs its second, per dimension, exact mean shift in
    * ppm of a quantized unit — a dimension whose mean walked between
    * ingest epochs means the encoder (or its input mix) changed
    * mid-corpus, and every downstream index mixes two geometries.
    * Shift is the EXACT rational (s_hi·n_lo − s_lo·n_hi)·10⁶ /
    * (n_lo·n_hi) in DECIMAL — no per-half division before the
    * difference. One posexplode + a ≤ dim-bounded aggregation.
    *
    * Output: (dim, n_lo, n_hi, shift_ppm), ordered by dim. */
  def dimDrift(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val mid = emb.agg((max(col("vec_id")) + 1L).as("m")).head
    val m = if (mid.isNullAt(0)) 0L else mid.getLong(0) / 2L
    emb.filter(col("embedding").isNotNull)
      .select((col("vec_id") < m).as("lo"),
        posexplode(quantize(col("embedding"))).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(
        sum(when(col("lo"), 1L).otherwise(0L)).as("n_lo"),
        coalesce(sum(when(col("lo"), col("x").cast(dec))),
          lit(0).cast(dec)).as("s_lo"),
        sum(when(!col("lo"), 1L).otherwise(0L)).as("n_hi"),
        coalesce(sum(when(!col("lo"), col("x").cast(dec))),
          lit(0).cast(dec)).as("s_hi"))
      .select(col("d").cast("long").as("dim"), col("n_lo"), col("n_hi"),
        expr("CAST(CASE WHEN n_lo = 0 OR n_hi = 0 THEN NULL " +
          "WHEN s_hi * n_lo - s_lo * n_hi < 0 " +
          "THEN -((-(s_hi * n_lo - s_lo * n_hi) * 1000000) div " +
          "CAST(n_lo * n_hi AS DECIMAL(38,0))) " +
          "ELSE ((s_hi * n_lo - s_lo * n_hi) * 1000000) div " +
          "CAST(n_lo * n_hi AS DECIMAL(38,0)) END AS BIGINT)")
          .as("shift_ppm"))
      .orderBy(col("dim"))
  }

  /** LABEL-CENTROID COSINE MATRIX (round 15) — the class-separation
    * scorecard over the embedding space: pairwise cosine between every
    * label's mean vector (two classes whose centroids read cos ≈ 1
    * are indistinguishable to any downstream classifier — the check
    * that runs before anyone trains on the labels). EXACT by the
    * n-cancellation: cos(s_i/n_i, s_j/n_j) = cos(s_i, s_j), so the
    * matrix is computed on the integer SUM vectors — per-(label, dim)
    * sums in DECIMAL(38,0) (one bounded grid), dots and norms as
    * decimal products over the ≤ labels²·dim pair grid, ONE sqrt/div
    * tail per cell via the string bridge. Nothing wider than the
    * label × dim grid ever shuffles.
    *
    * Output: (label_a, label_b, n_a, n_b, dot, cos), ordered. */
  def centroidCosMatrix(emb: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sums = emb.filter(col("embedding").isNotNull)
      .select(col("label"),
        posexplode(quantize(col("embedding"))).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(sum(col("x").cast(dec)).as("s"), count(lit(1)).as("n"))
    val norms = sums.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("nn"), max(col("n")).as("n_vecs"))
    val a = sums.select(col("label").as("label_a"), col("d"),
      col("s").as("sa"))
    val b = sums.select(col("label").as("label_b"), col("d"),
      col("s").as("sb"))
    a.join(b, "d").filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("sa") * col("sb")).as("dot_dec"))
      .join(broadcast(norms.select(col("label").as("label_a"),
        col("nn").as("nna"), col("n_vecs").as("n_a"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"),
        col("nn").as("nnb"), col("n_vecs").as("n_b"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("dot_dec").cast("string").as("dot"),
        when(col("nna") <= 0 || col("nnb") <= 0, lit(null).cast("double"))
          .otherwise(col("dot_dec").cast("string").cast("double") /
            (sqrt(col("nna").cast("string").cast("double")) *
              sqrt(col("nnb").cast("string").cast("double")))).as("cos"))
      .orderBy(col("label_a"), col("label_b"))
  }
}
