package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic-sketch operators (round 9) — the two bounded-memory
  * summaries a 100 TB corpus pipeline leans on when exact relations stop
  * fitting anywhere: a Bloom-filter membership gate and a Count-Min
  * frequency sketch. Both are built from scratch on the engine's
  * portable-md5 doctrine, so — unusually for sketches — their outputs
  * (INCLUDING the false positives and overcounts) are deterministic,
  * repartition-stable, and exactly replayable by the DuckDB oracle:
  * a Bloom false positive is "all k probe positions collide with member
  * positions", a CMS overcount is "other tokens share my cells" — both
  * are pure functions of md5 arithmetic that any engine reproduces
  * bit-for-bit. Reference scope: the reference conduit has no sketch
  * surface; these belong to the mandated LLM-pipeline extension group
  * (same family as `contamination_ngram` / `corpus_stats`'s HLL leg).
  */
object Sketches {

  /** Portable position hash: the integer value of md5's first 7 hex
    * chars (28 bits, same bridge as [[graft.functions.PortableHash
    * .md5Prefix28]]) reduced mod `mod` — in SQL:
    * `CAST('0x' || substring(md5(s), 1, 7) AS BIGINT) % mod`. */
  private def md5Pos(s: Column, mod: Int): Column =
    graft.functions.VectorFunctions.md5HexPrefix(s, 7) % mod

  /** Distinct 13-gram fingerprints per document — EXACTLY the
    * `contamination_ngram` gram contract (winnowFps at w=1: every
    * window of one gram is its own minimum, so the selection degenerates
    * to all distinct gram hashes). One (doc_id, is_test, fp) row per
    * distinct gram. */
  private def gramFps(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), Corpus.isHoldout(col("doc_id")).as("is_test"),
      explode(graft.functions.VectorFunctions.winnowFps(col("text"), k, 1))
        .as("fp"))

  /** The `nHash` Bloom positions of a gram fingerprint: position i is
    * md5(fp ":" i) reduced into the bit space. Returned as an array so
    * build and probe share one derivation. */
  /** The `nHash` bloom bit positions of one fingerprint — the native
    * batched-draw expression (round 19): element i =
    * md5(fp || ":" || i) prefix-7 value mod mBits, byte-identical to
    * the transform(sequence(...)) HOF it replaces (which ran
    * interpreted per gram, formatting and hashing a fresh concat string
    * per probe). */
  private def bloomPositions(fp: Column, nHash: Int, mBits: Int): Column =
    graft.functions.VectorFunctions.md5SuffixDraws(fp, nHash, mBits)

  /** Bloom-filter decontamination PRE-GATE — the scale front end of
    * [[Corpus.contaminationNgrams]]: instead of equi-joining the full
    * training corpus's 13-gram relation against the benchmark's (one
    * shuffle over every gram of 100 TB), fold the benchmark (holdout)
    * grams into an `mBits`-bit Bloom mask ONCE — bounded at mBits/8
    * bytes no matter how many grams feed it ([[graft.functions
    * .BloomAgg]], OR-merged partial aggregation) — broadcast the mask
    * (16 KB at the default geometry), and test each training gram with
    * `nHash` O(1) bit probes. A "no" is definitive (no false negatives,
    * by construction); a "maybe" routes the document to the exact
    * join, which now runs over the tiny flagged slice instead of the
    * corpus. The probe side is a narrow scan — no shuffle, no join —
    * which is what survives 100 TB.
    *
    * Determinism: positions are md5 arithmetic, so WHICH grams false-
    * positive is itself deterministic and engine-portable — the DuckDB
    * oracle replays the gate exactly (mask bit set ⇔ position present
    * in the member-position set; the oracle tests set membership, the
    * engine tests the bit — identical by construction).
    *
    * Output: one row per training doc that has ≥ k tokens —
    * (doc_id, n_grams, n_flagged, bloom_hit), ordered. `n_flagged`
    * counts grams the mask says "maybe"; `bloom_hit` is the routing
    * verdict. */
  def bloomDecontaminate(docs: DataFrame, k: Int = 13,
                         mBits: Int = 131072, nHash: Int = 5): DataFrame = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val grams = gramFps(docs, k)
    val memberPos = grams.filter(col("is_test"))
      .select(explode(bloomPositions(col("fp"), nHash, mBits)).as("pos"))
      .distinct()
    val mask = memberPos
      .agg(graft.functions.BloomAgg.mask(mBits / 64)(col("pos")).as("mask"))
    // one-row mask frame rides a broadcast cross join (the engine's
    // standard gate-frame shape); each of the nHash probes is two array
    // ops — word = mask[pos >> 6], bit = word >> (pos & 63) — unrolled
    // statically so the whole gate stays inside codegen
    // round 19: all nHash probe positions come from ONE native
    // md5_suffix_draws evaluation (codegen subexpression elimination
    // shares the identical subtree across the unrolled probes) instead
    // of nHash separate concat+md5 chains per gram; values identical
    val probed = grams.filter(!col("is_test"))
      .crossJoin(broadcast(mask))
      .withColumn("maybe", (0 until nHash).map { i =>
        val p = element_at(bloomPositions(col("fp"), nHash, mBits), i + 1)
        val word = element_at(col("mask"), (shiftright(p, 6) + 1).cast("int"))
        call_function("bit_get", word, (p % 64).cast("int")) === 1
      }.reduce(_ && _))
    probed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("bloom_hit", col("n_flagged") > 0)
      .orderBy(col("doc_id"))
  }

  /** BLOOM FALSE-POSITIVE-RATE AUDIT (round 12) — "measure, don't
    * guess" for the decontamination pre-gate: the Bloom mask's whole
    * value proposition is a small, KNOWN false-positive rate, and the
    * number that sizes `mBits`/`nHash` should come from the engine on
    * the real gram distribution, not from the textbook formula alone.
    * At the GRAM level: distinct member (holdout) fingerprints fold
    * into the mask; every distinct non-member training fingerprint is
    * probed; a probe that is NOT a true member but still clears all
    * `nHash` bits is a measured false positive. All counts exact,
    * fpr_ppm integer; the md5-derived collisions replay bit-for-bit in
    * the oracle (same positions doctrine as `contamination_bloom`).
    * The no-false-negative guarantee is structural: n_flagged ≥
    * n_true_members (spec-asserted).
    *
    * Scale shape: same as the gate itself — bounded OR-merged mask
    * aggregation, broadcast mask, narrow probes, plus ONE gram-keyed
    * semi-join for ground truth; ONE row out. */
  def bloomFprAudit(docs: DataFrame, k: Int = 13,
                    mBits: Int = 131072, nHash: Int = 5): DataFrame = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val grams = gramFps(docs, k)
    val member = grams.filter(col("is_test")).select(col("fp")).distinct()
    val probes = grams.filter(!col("is_test")).select(col("fp")).distinct()
    val mask = member
      .select(explode(bloomPositions(col("fp"), nHash, mBits)).as("pos"))
      .distinct()
      .agg(graft.functions.BloomAgg.mask(mBits / 64)(col("pos")).as("mask"))
    // round 19: single native draws evaluation per probe row (see
    // bloomDecontaminate's probe note); values identical
    val probed = probes.crossJoin(broadcast(mask))
      .withColumn("maybe", (0 until nHash).map { i =>
        val p = element_at(bloomPositions(col("fp"), nHash, mBits), i + 1)
        val word = element_at(col("mask"), (shiftright(p, 6) + 1).cast("int"))
        call_function("bit_get", word, (p % 64).cast("int")) === 1
      }.reduce(_ && _))
      .join(member.withColumn("is_member", lit(true)), Seq("fp"), "left")
    val mcount = member.agg(count(lit(1)).as("n_member_grams"))
    probed.agg(
        count(lit(1)).as("n_probe_grams"),
        sum(when(col("is_member"), 1L).otherwise(0L)).as("n_true_members"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("maybe") && col("is_member").isNull, 1L).otherwise(0L))
          .as("n_false_pos"))
      .crossJoin(broadcast(mcount))
      .select(col("n_member_grams"), col("n_probe_grams"),
        col("n_true_members"), col("n_flagged"), col("n_false_pos"),
        expr("CAST((n_false_pos * 1000000) div " +
          "nullif(n_probe_grams - n_true_members, 0L) AS BIGINT)")
          .as("fpr_ppm"))
  }

  /** Count-Min heavy-hitter estimates — corpus token frequencies from a
    * `depth`×`width` counter grid instead of a |vocab|-sized relation:
    * every token occurrence increments one counter per row (cell =
    * md5(tok "#" r) mod width), and a token's estimate is the MIN of
    * its `depth` counters — an upper bound on the true count (never
    * under, one-sided error ≤ 2N/width with prob 1-2^-depth). The
    * sketch build is a narrow pass with map-side combine collapsing
    * each task to ≤ depth·width cells; the whole sketch is depth·width
    * rows (4096 at the defaults) REGARDLESS of corpus size — the
    * bounded-memory sibling of [[Corpus.corpusFreqScore]]'s exact vocab
    * join, for when the vocabulary itself is the thing that doesn't
    * fit. Same token contract as [[Corpus.vocabulary]] (split on a
    * single space).
    *
    * Output grades the sketch against truth on the exact top-`topK`
    * tokens: (tok, exact_cnt, cms_est, overcount), ordered
    * (exact_cnt desc, tok). The overcount column is deterministic —
    * md5 cell collisions replay exactly in the oracle. */
  def cmsHeavyHitters(docs: DataFrame, topK: Int = 20,
                      depth: Int = 4, width: Int = 1024): DataFrame = {
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    // round 19 (guide §4): all `depth` cell draws in one native digest
    // loop (md5_suffix_draws with the CMS "#" separator) instead of an
    // interpreted transform + per-row concat/md5 chain per token;
    // cell positions are byte-identical
    def cellsOf(tok: Column): Column =
      graft.functions.VectorFunctions.md5SuffixDraws(tok, depth, width, "#")
    val sketch = toks
      .select(posexplode(cellsOf(col("tok"))))
      .groupBy(col("pos").as("r"), col("col").as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(topK)
    val probes = top
      .select(col("tok"), col("exact_cnt"), posexplode(cellsOf(col("tok"))))
      .select(col("tok"), col("exact_cnt"),
        col("pos").as("r"), col("col").as("cell"))
    // probes are topK·depth rows; the sketch is depth·width rows — both
    // tiny and broadcastable, but the sketch side is the one that stays
    // bounded at any corpus size, so broadcast it
    probes.join(broadcast(sketch), Seq("r", "cell"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** HyperLogLog distinct-count sketch (round 10; Flajolet, Fusy,
    * Gandouet, Meunier 2007 — public) — the third sketch beside Bloom
    * and Count-Min, and the one a 100 TB pipeline reaches for first:
    * per-group distinct cardinalities from m = 2^b registers instead of
    * a distinct-sized shuffle. Register bucket = the low b bits of the
    * 28-bit md5 prefix; rho = 1 + leading-zero count of the remaining
    * 18 value bits (all-zero value caps at 19); register M_j = max rho.
    * The build is one groupBy with map-side max-combine — ≤ m rows per
    * group survive any corpus size.
    *
    * DETERMINISTIC ESTIMATE, unusually for HLL: the harmonic sum is
    * kept as the EXACT LONG S = Σ 2^(19 − M_j) (absent registers
    * contribute 2^19; max m·2^19 = 2^29, no overflow), and the only
    * floating-point steps — the α constant from fixed literals and ONE
    * multiply/divide chain in a fixed order — are IEEE-identical on
    * identical inputs, so even the estimation ERROR replays bit-for-bit
    * in the DuckDB oracle. Raw-estimate regime only by design: the
    * small-range linear-counting branch needs ln(); `zero_buckets` is
    * emitted so a consumer can apply it downstream.
    *
    * Output: (l_returnflag, exact_distinct, s_scaled, zero_buckets,
    * hll_est) over lineitem part keys, ordered. */
  def hllDistinct(lineitem: DataFrame, b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4,16], got $b")
    val m = 1 << b
    val rMax = 28 - b + 1
    val keyed = lineitem
      .select(col("l_returnflag"), col("l_partkey"))
      .withColumn("h", graft.functions.VectorFunctions
        .md5HexPrefix(col("l_partkey").cast("string"), 7))
      .withColumn("bucket", col("h") % m)
      .withColumn("v", expr(s"h div $m"))
      .withColumn("rho", when(col("v") === 0, lit(rMax.toLong))
        .otherwise(lit(rMax.toLong) - length(bin(col("v")))))
    val regs = keyed.groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val sums = regs.groupBy(col("l_returnflag"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rMax - mj AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("zero_buckets", lit(m.toLong) - col("n_present"))
      .withColumn("s_scaled",
        col("s_present") + col("zero_buckets") * lit(1L << rMax))
    val exact = lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    sums.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_distinct"),
        col("s_scaled"), col("zero_buckets"),
        (alpha * lit(m) * lit(m) * lit(1L << rMax) / col("s_scaled"))
          .as("hll_est"))
      .orderBy(col("l_returnflag"))
  }

  /** BLOOM MERGEABILITY AUDIT (round 15) — the [[hllMerge]] property
    * for the Bloom mask: masks built independently per shard and
    * OR-merged word-for-word must equal the single-pass global mask —
    * the identity that lets 1000 executors build the decontamination
    * gate without ever shuffling grams to one place. Shards are
    * DETERMINISTIC (doc_id mod nShards, never physical partitions);
    * the merge is an element-wise `zip_with(_, _, |)` fold over the
    * word arrays — the real mask path, then UNPACKED back to positions
    * (bit_count per word for the set-bit census, 64·wi + b for the
    * position sum) so the oracle's position-set arithmetic checks the
    * packing itself, not just set algebra. The merged and global rows
    * must be identical — that equality riding the hash compare IS the
    * audit.
    *
    * Output: (scope, n_keys, n_set_bits, pos_sum) for shard_0..3,
    * zz_global, zz_merged; ordered by scope.
    *
    * The deduped (shard, fp) relation feeds FOUR consumers (shard masks,
    * the independent global mask, per-shard key counts, the global
    * distinct count); `cache` persists it for the call so the 13-gram
    * explosion + distinct shuffle runs once — the global mask stays a
    * second aggregation over the SAME positions, which is the audit's
    * point. */
  def bloomMergeAudit(docs: DataFrame, k: Int = 13, mBits: Int = 131072,
                      nHash: Int = 5, nShards: Int = 4,
                      cache: CacheScope = CacheScope.off): DataFrame = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val w = mBits / 64
    val sharded = cache.track(gramFps(docs, k)
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("fp"))
      .distinct())
    // round 19: the position relation is tracked too — the shard-mask
    // and global-mask folds BOTH read it (the audit's independence is
    // in the two aggregation paths, not in re-deriving the positions),
    // so the gram explode + native draws run once instead of twice
    val pos = cache.track(sharded.select(col("shard"),
      explode(bloomPositions(col("fp"), nHash, mBits)).as("pos")))
    val shardMasks = pos.groupBy(col("shard"))
      .agg(graft.functions.BloomAgg.mask(w)(col("pos")).as("mask"))
    val merged = shardMasks
      .agg(expr(s"aggregate(collect_list(mask), array_repeat(0L, $w), " +
        "(a, m) -> zip_with(a, m, (x, y) -> x | y))").as("mask"))
      .select(lit("zz_merged").as("scope"), col("mask"))
    val global = pos
      .agg(graft.functions.BloomAgg.mask(w)(col("pos")).as("mask"))
      .select(lit("zz_global").as("scope"), col("mask"))
    val masks = shardMasks
      .select(concat(lit("shard_"), col("shard")).as("scope"), col("mask"))
      .unionByName(merged).unionByName(global)
    // unpack: census via bit_count, position sum via explicit bit walk
    val unpacked = masks.select(col("scope"),
      expr("aggregate(mask, 0L, (acc, x) -> acc + bit_count(x))")
        .as("n_set_bits"),
      expr("aggregate(transform(mask, (x, wi) -> " +
        "aggregate(filter(sequence(0, 63), b -> " +
        "bit_get(x, CAST(b AS INT)) = 1), 0L, " +
        "(a, b) -> a + CAST(wi AS BIGINT) * 64 + b)), 0L, " +
        "(a, s) -> a + s)").as("pos_sum"))
    val keyCounts = sharded
      .groupBy(concat(lit("shard_"), col("shard")).as("scope"))
      .agg(count(lit(1)).as("n_keys"))
      .unionByName(sharded.select(col("fp")).distinct()
        .agg(count(lit(1)).as("nk"))
        .select(explode(array(lit("zz_merged"), lit("zz_global")))
          .as("scope"), col("nk").as("n_keys")))
    unpacked.join(keyCounts, Seq("scope"))
      .select(col("scope"), col("n_keys"), col("n_set_bits"),
        col("pos_sum"))
      .orderBy(col("scope"))
  }

  /** LINEAR COUNTING (round 15) — the low-range distinct estimator
    * HLL itself falls back to when most registers are empty
    * (Whang et al.): hash each key into an m-bit bitmap and estimate
    * n̂ = −m·ln(1 − filled/m) from the occupancy alone. The bitmap is
    * the sketch: per group it is the SET of occupied buckets (a
    * distinct-aggregation, map-side combinable, mergeable by union —
    * the distributed property, same as [[hllDistinct]]'s max-merge).
    * The ln is NOT a libm call (cross-engine double drift — the
    * bit-length doctrine applies): −ln(1−ρ) expands as Σ ρᵏ/k, and
    * with ρ = filled/m every term is the exact rational fᵏ/(k·mᵏ⁻¹),
    * so the estimate is the DETERMINISTIC 8-term integer series
    * est_milli = Σₖ (1000·fᵏ) div (k·mᵏ⁻¹) in DECIMAL(38,0) —
    * identical truncation on both engines (documented estimator
    * variant; the truncated tail matters only as ρ → 1, where LC is
    * out of its regime anyway and [[hllDistinct]] takes over). Same
    * md5-derived bucket hash as HLL.
    *
    * Output: (l_returnflag, m, filled, zero_buckets, exact_distinct,
    * est_milli), ordered. */
  def linearCount(lineitem: DataFrame, b: Int = 10): DataFrame = {
    // upper bound 13, not 16: the 8th series term computes filled^8 ≤
    // m^8 = 2^(8b); at b=14+ a fully-occupied bitmap overflows both
    // DECIMAL(38,0) (Spark nulls the estimate) and DuckDB's HUGEINT
    // (errors) — exactly where the engines would diverge. 2^(8·13) =
    // 2^104 < 10^38 keeps every intermediate exact on both engines.
    require(b >= 4 && b <= 13, s"b must be in [4,13], got $b")
    val m = 1L << b
    val occupied = lineitem
      .select(col("l_returnflag"),
        (graft.functions.VectorFunctions
          .md5HexPrefix(col("l_partkey").cast("string"), 7) % m).as("bucket"))
      .distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("filled"))
    val series = (1 to 8).map { k =>
      val den = BigInt(m) pow (k - 1)
      val fk = (1 to k).map(_ => "CAST(filled AS DECIMAL(38,0))")
        .mkString(" * ")
      s"(($fk) * 1000) div (${k}L * CAST('$den' AS DECIMAL(38,0)))"
    }.mkString(" + ")
    val exact = lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    occupied.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), lit(m).as("m"), col("filled"),
        (lit(m) - col("filled")).as("zero_buckets"), col("exact_distinct"),
        expr(series).cast("long").as("est_milli"))
      .orderBy(col("l_returnflag"))
  }

  /** HLL MERGEABILITY AUDIT (round 13) — the property that makes a
    * sketch DISTRIBUTED: registers built independently per shard and
    * max-merged must equal the single-pass global registers, bucket
    * for bucket (max is associative/commutative — the whole reason HLL
    * survives a 1000-executor tree aggregation while an exact distinct
    * shuffles the corpus). This key PROVES it on the engine rather
    * than assuming it: per-(returnflag, linestatus) shard registers →
    * bucket-wise max-merge → compared against the direct global
    * registers; `n_mismatch` is structurally 0 and oracle-checked, and
    * the merged estimate reuses [[hllDistinct]]'s exact-long harmonic
    * form so the estimate itself also replays. Register relations are
    * ≤ shards·m rows — nothing data-sized past the first aggregation.
    *
    * Output (one row): n_shards, n_mismatch, exact_distinct, s_scaled,
    * zero_buckets, hll_est. */
  def hllMerge(lineitem: DataFrame, b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4,16], got $b")
    val m = 1 << b
    val rMax = 28 - b + 1
    val keyed = lineitem
      .select(concat(col("l_returnflag"), lit(":"), col("l_linestatus"))
        .as("shard"), col("l_partkey"))
      .withColumn("h", graft.functions.VectorFunctions
        .md5HexPrefix(col("l_partkey").cast("string"), 7))
      .withColumn("bucket", col("h") % m)
      .withColumn("v", expr(s"h div $m"))
      .withColumn("rho", when(col("v") === 0, lit(rMax.toLong))
        .otherwise(lit(rMax.toLong) - length(bin(col("v")))))
    val shardRegs = keyed.groupBy(col("shard"), col("bucket"))
      .agg(max(col("rho")).as("sj"))
    val merged = shardRegs.groupBy(col("bucket")).agg(max(col("sj")).as("mj"))
    val direct = keyed.groupBy(col("bucket")).agg(max(col("rho")).as("gj"))
    val nShards = shardRegs.select(col("shard")).distinct()
      .agg(count(lit(1)).as("n_shards"))
    val nMismatch = merged.join(direct, Seq("bucket"), "full_outer")
      .agg(coalesce(sum(when(col("mj") <=> col("gj"), 0L).otherwise(1L)),
        lit(0L)).as("n_mismatch"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val sums = merged
      .agg(coalesce(sum(expr(
          s"shiftleft(CAST(1 AS BIGINT), CAST($rMax - mj AS INT))")), lit(0L))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("zero_buckets", lit(m.toLong) - col("n_present"))
      .withColumn("s_scaled",
        col("s_present") + col("zero_buckets") * lit(1L << rMax))
    val exact = lineitem.agg(countDistinct(col("l_partkey"))
      .as("exact_distinct"))
    broadcast(nShards).crossJoin(broadcast(nMismatch))
      .crossJoin(broadcast(exact)).crossJoin(broadcast(sums))
      .select(col("n_shards"), col("n_mismatch"), col("exact_distinct"),
        col("s_scaled"), col("zero_buckets"),
        (alpha * lit(m) * lit(m) * lit(1L << rMax) / col("s_scaled"))
          .as("hll_est"))
  }

  /** KMV / THETA distinct-and-INTERSECTION sketch (round 11; the
    * bottom-k / theta-sketch lineage — Bar-Yossef et al. 2002, Dasgupta
    * et al. 2016, public) — the fifth sketch, and the only one that
    * answers SET-EXPRESSION cardinalities: HLL union-merges cheaply but
    * cannot intersect; a theta sketch keeps the k smallest hash values
    * per set, so "how many users did BOTH A and B" is answered from two
    * k-row summaries instead of a corpus-sized semi-join — the audience-
    * overlap / segment-intersection primitive of an events pipeline.
    *
    * Determinism (the house sketch discipline): the hash is the 48-bit
    * md5 prefix of the member key — uniform, but a pure function of the
    * data, so WHICH rows each sketch retains (and therefore the
    * estimation error itself) replays bit-for-bit in the oracle. 48 bits
    * keeps every hash, every product `c·2^48` (c < 2^7 here), and the
    * one IEEE division per estimate exactly representable in doubles.
    *
    * Estimators: per set, est = (k−1)·2^48 / h_k when the sketch is
    * full, else the exact retained count (the sketch holds the whole
    * set). Intersection: θ = k-th smallest of the DISTINCT union of the
    * two sketches (2^48 when the union underfills — degenerating to the
    * exact sketch-level intersection), I = common hashes below θ,
    * est = |I|·2^48 / θ.
    *
    * Scale shape: ONE map-side-combined distinct over (set, member-hash)
    * — shuffle O(distinct members), never O(events) — then
    * [[graft.functions.BottomKAgg]] reduces each task's slice to ≤ k
    * pairs per set before the exchange; everything downstream operates
    * on k-row arrays inside the projection (the 1-row frames ride the
    * engine's standard broadcast gate-frame shape). `exact_distinct`
    * audit columns come from the same distinct relation (the
    * cms/hll exact-vs-estimate report convention).
    *
    * Output: one row per event_type plus one `<a>_x_<b>` intersection
    * row — (scope, n_exact, n_retained, kth_hash, est), ordered. */
  def thetaSketch(events: DataFrame, k: Int = 64,
                  typeA: String = "click", typeB: String = "purchase"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val Space = 1L << 48
    val h = graft.functions.VectorFunctions
      .md5HexPrefix(col("user_id").cast("string"), 12)
    val du = events.select(col("event_type"), h.as("h")).distinct()
    val sk = du.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        graft.functions.BottomKAgg.bottomK(k)(col("h"), col("h")).as("samp"))
    val perType = sk.select(col("event_type").as("scope"),
        col("n_exact"),
        size(col("samp")).cast("long").as("n_retained"),
        element_at(col("samp"), size(col("samp"))).getField("_1")
          .as("kth_hash"))
      .withColumn("est",
        when(col("n_retained") < k, col("n_retained").cast("double"))
          .otherwise(lit((k - 1).toLong * Space).cast("double") /
            col("kth_hash").cast("double")))
    // intersection from the two k-row sketches: 1×1 gate frames. Each
    // side is a GLOBAL aggregate (first over the ≤1-row filtered
    // sketch, coalesced to the empty sketch), so it is structurally
    // 1 row even when the type has ZERO events — a bare filter+select
    // would yield 0 rows there, the crossJoin would erase the
    // `<a>_x_<b>` row, and the engine would diverge from the oracle's
    // always-emitted structural row (empty-side θ degenerates to 2^48,
    // est 0 — the module's structural-empty doctrine).
    def sideSketch(t: String, out: String): DataFrame =
      sk.filter(col("event_type") === t)
        .agg(coalesce(first(transform(col("samp"), s => s.getField("_1"))),
          typedLit(Array.empty[Long])).as(out))
    val ha = sideSketch(typeA, "ha")
    val hb = sideSketch(typeB, "hb")
    val exBoth = du.filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("h"))
      .agg(countDistinct(col("event_type")).as("nt"))
      .filter(col("nt") === 2)
      .agg(count(lit(1)).as("n_exact"))
    val inter = ha.crossJoin(broadcast(hb)).crossJoin(broadcast(exBoth))
      .withColumn("un", array_sort(array_union(col("ha"), col("hb"))))
      .withColumn("theta",
        when(size(col("un")) >= k, element_at(col("un"), k))
          .otherwise(lit(Space)))
      .withColumn("ii", filter(col("ha"),
        x => array_contains(col("hb"), x) && x < col("theta")))
      .select(lit(s"${typeA}_x_$typeB").as("scope"), col("n_exact"),
        size(col("ii")).cast("long").as("n_retained"),
        col("theta").as("kth_hash"),
        (size(col("ii")).cast("double") * lit(Space.toDouble) /
          col("theta").cast("double")).as("est"))
    perType.unionByName(inter).orderBy(col("scope"))
  }

  /** THETA A-NOT-B (round 16) — the set-DIFFERENCE estimator
    * completing [[thetaSketch]]'s family (DataSketches' third theta
    * operation beside union and intersection): "users who clicked but
    * never purchased" from two bounded k-row sketches, never from the
    * raw sets. Semantics follow the standard theta rule: θ =
    * min(θ_A, θ_B) (each side's θ is its k-th smallest hash, or the
    * full space 2^48 when the sketch holds the whole set), result =
    * A's retained hashes below θ and absent from B's sketch, est =
    * |result|·2^48/θ — the same deterministic md5 hash space as
    * [[thetaSketch]], so the estimate (INCLUDING its error) replays
    * bit-for-bit in the oracle. Both directions surface, each with the
    * exact difference cardinality as the audit column; both rows are
    * STRUCTURAL (1-row global aggregates per side — the thetaSketch
    * empty-side doctrine).
    *
    * Scale shape: identical to [[thetaSketch]] — one map-side-combined
    * distinct + BottomKAgg; everything downstream is k-row arrays in
    * 1×1 gate frames.
    *
    * Output: (scope, n_exact, n_retained, theta, est) for
    * `<a>_not_<b>` and `<b>_not_<a>`, ordered by scope. */
  def thetaAnotB(events: DataFrame, k: Int = 64,
                 typeA: String = "click", typeB: String = "purchase"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val Space = 1L << 48
    val h = graft.functions.VectorFunctions
      .md5HexPrefix(col("user_id").cast("string"), 12)
    val du = events.select(col("event_type"), h.as("h")).distinct()
    val sk = du.groupBy(col("event_type"))
      .agg(graft.functions.BottomKAgg.bottomK(k)(col("h"), col("h"))
        .as("samp"))
    def sideSketch(t: String, out: String): DataFrame =
      sk.filter(col("event_type") === t)
        .agg(coalesce(first(transform(col("samp"), s => s.getField("_1"))),
          typedLit(Array.empty[Long])).as(out))
    val ha = sideSketch(typeA, "ha")
    val hb = sideSketch(typeB, "hb")
    // exact per-direction difference cardinalities in ONE pass over
    // the (h, membership) relation
    val exact = du.filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("h"))
      .agg(max(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ia"),
        max(when(col("event_type") === typeB, 1L).otherwise(0L)).as("ib"))
      .agg(coalesce(sum(when(col("ia") === 1L && col("ib") === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("ex_ab"),
        coalesce(sum(when(col("ib") === 1L && col("ia") === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("ex_ba"))
    val base = ha.crossJoin(broadcast(hb)).crossJoin(broadcast(exact))
      .withColumn("tha", when(size(col("ha")) >= k,
        element_at(col("ha"), k)).otherwise(lit(Space)))
      .withColumn("thb", when(size(col("hb")) >= k,
        element_at(col("hb"), k)).otherwise(lit(Space)))
      .withColumn("theta", least(col("tha"), col("thb")))
    def direction(x: String, y: String, exCol: String, scope: String) =
      base.withColumn("dd", filter(col(x),
          v => v < col("theta") && !array_contains(col(y), v)))
        .select(lit(scope).as("scope"), col(exCol).as("n_exact"),
          size(col("dd")).cast("long").as("n_retained"),
          col("theta"),
          (size(col("dd")).cast("double") * lit(Space.toDouble) /
            col("theta").cast("double")).as("est"))
    direction("ha", "hb", "ex_ab", s"${typeA}_not_$typeB")
      .unionByName(direction("hb", "ha", "ex_ba", s"${typeB}_not_$typeA"))
      .orderBy(col("scope"))
  }

  /** QUANTILE sketch (round 11) — the fourth deterministic sketch next
    * to Bloom / CMS / HLL, and the one a data-quality dashboard reads
    * first: per-group percentiles of a measure from BOUNDED state. An
    * exact per-group quantile needs every row of the group through one
    * sort; this sketch keeps only the `r` rows with the smallest
    * md5-derived key per group — a deterministic reservoir. The md5 key
    * is uniform, so the keep-lowest-r rule IS a uniform r-sample
    * (classic bottom-k sampling), but unlike rand()-based reservoirs it
    * is a pure function of the data: any engine, any partitioning, any
    * run keeps the SAME rows, so the sample quantiles — including their
    * sampling error — replay bit-for-bit in the DuckDB oracle (the
    * `freq_cms` / `sketch_hll_distinct` discipline applied to
    * quantiles; nearest-rank over a 256-sample holds every percentile
    * within ~±3 rank points of exact at 95% confidence, and the
    * env-gated probe in SketchesSpec records the observed error).
    *
    * Scale shape: [[graft.functions.BottomKAgg]] is an Aggregator, so
    * each task reduces its slice map-side to ≤ r pairs per group before
    * the exchange — shuffle volume is r·groups·tasks, independent of
    * corpus size (a window-rank formulation would shuffle EVERY row).
    * The quantile extraction then runs entirely inside the projection:
    * sort the ≤ r sample values, pick nearest-rank positions with
    * integer arithmetic — no second shuffle.
    *
    * Output per group: (grp, n_rows, n_sample, p25, p50, p75, p90). */
  def quantileSketch(lineitem: DataFrame, r: Int = 256): DataFrame = {
    require(r >= 1, "sample size must be positive")
    // row key: (orderkey, linenumber) is the relation's primary key, so
    // the 28-bit md5 prefix is a deterministic uniform draw per row
    val hash = graft.functions.VectorFunctions.md5HexPrefix(
      concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string")), 7)
    val agg = lineitem
      .groupBy(col("l_returnflag").as("grp"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.BottomKAgg.bottomK(r)(
          hash, col("l_extendedprice")).as("samp"))
    val vals = sort_array(transform(col("samp"), s => s("_2")))
    val n = size(col("samp")).cast("long")
    // nearest-rank: the ceil(p·n/100)-th smallest sample value, all
    // integer arithmetic (div), 1-based on both engines
    def q(p: Int): Column =
      element_at(vals, expr(s"CAST(($p * size(samp) + 99) div 100 AS INT)"))
    agg.select(col("grp"), col("n_rows"), n.as("n_sample"),
        q(25).as("p25"), q(50).as("p50"), q(75).as("p75"), q(90).as("p90"))
      .orderBy(col("grp"))
  }

  /** QUANTILE-SKETCH MERGEABILITY AUDIT (round 17) — the merge law
    * the other sketch merges already pin (bloom OR, HLL register max,
    * theta bottom-k union) proven for the quantile reservoir:
    * bottom-k by (hash, value) is a MONOID — re-ranking the union of
    * per-shard bottom-k samples yields exactly the global bottom-k
    * sample, because any pair in the global bottom-k is necessarily
    * in its own shard's bottom-k. A 100 TB deployment therefore
    * computes per-shard samples map-side, merges r-sized states at
    * the coordinator, and serves global percentiles with NO second
    * data pass; this key audits merged-vs-direct elementwise
    * (n_mismatch = 0 IS the law; zip_with pads a length mismatch with
    * nulls, which count as mismatches like the oracle's full-outer
    * rank join) and surfaces the percentiles FROM the merged sample
    * (the state a coordinator would actually serve).
    *
    * Scale shape: one bounded-state partial aggregation per shard
    * (map-side combine), a ≤ shards·r-row exploded union re-ranked in
    * one r-bounded aggregate, and the direct global sample for the
    * audit. Nothing row-scale leaves the first aggregation.
    *
    * Output: ONE row (n_shards, n_sample, n_mismatch, p25, p50, p75,
    * p90). */
  def quantileMergeAudit(lineitem: DataFrame, r: Int = 256): DataFrame = {
    require(r >= 1, "sample size must be positive")
    val hash = graft.functions.VectorFunctions.md5HexPrefix(
      concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string")), 7)
    val keyed = lineitem.select(
      concat(col("l_returnflag"), lit(":"), col("l_linestatus"))
        .as("shard"),
      hash.as("h"), col("l_extendedprice").cast("double").as("v"))
    val shardSamp = keyed.groupBy(col("shard"))
      .agg(graft.functions.BottomKAgg.bottomK(r)(col("h"), col("v"))
        .as("samp"))
    val nShards = shardSamp.agg(count(lit(1)).as("n_shards"))
    val merged = shardSamp
      .select(explode(col("samp")).as("s"))
      .select(col("s._1").as("h"), col("s._2").as("v"))
      .agg(graft.functions.BottomKAgg.bottomK(r)(col("h"), col("v"))
        .as("msamp"))
    val direct = keyed
      .agg(graft.functions.BottomKAgg.bottomK(r)(col("h"), col("v"))
        .as("dsamp"))
    val vals = sort_array(transform(col("msamp"), s => s("_2")))
    def q(p: Int): Column =
      when(size(col("msamp")) === 0, lit(null).cast("double"))
        .otherwise(element_at(vals,
          expr(s"CAST(($p * size(msamp) + 99) div 100 AS INT)")))
    merged.crossJoin(broadcast(direct)).crossJoin(broadcast(nShards))
      .select(col("n_shards"),
        size(col("dsamp")).cast("long").as("n_sample"),
        aggregate(
          zip_with(col("msamp"), col("dsamp"),
            (m, d) => when(m === d, 0L).otherwise(1L)),
          lit(0L), (acc, x) => acc + x).as("n_mismatch"),
        q(25).as("p25"), q(50).as("p50"), q(75).as("p75"), q(90).as("p90"))
  }

  /** AMS F₂ / TUG-OF-WAR SKETCH (round 14) — the second-frequency-
    * moment estimator (Alon–Matias–Szegedy 1996), the fifth sketch in
    * the family and the one that answers "how SKEWED is this key?"
    * from bounded state: F₂ = Σ c_x² is the self-join size, the number
    * every shuffle-skew and join-plan decision turns on. Each of the
    * `nEst` estimators keeps one counter Z_j = Σ_x sign_j(x)·c_x with
    * md5-derived ±1 signs (4-wise-independence stand-in, and — the
    * module doctrine — fully deterministic, so the estimate INCLUDING
    * its sampling error replays bit-for-bit in DuckDB); E[Z²] = F₂.
    * The surfaced estimate is the LOWER MEDIAN of the 64 Z², err_ppm
    * its exact relative error against the exact F₂ — the sketch
    * audits itself like `sketch_bloom_fpr`/`dedup_minhash_est_error`.
    *
    * Scale shape: ONE full-data pass (the per-key count shuffle); the
    * ×nEst explode runs over the DISTINCT-KEY relation and map-side
    * combines to nEst rows per task; the median sorts a 64-element
    * array. Z and the squares live in DECIMAL(38,0) (counts overflow
    * int64 squared at warehouse scale) and surface VIA VARCHAR.
    *
    * Output: ONE row (n_rows, n_keys, n_estimators, f2_exact, f2_est,
    * err_ppm). */
  def amsF2(lineitem: DataFrame, nEst: Int = 64): DataFrame = {
    require(nEst >= 1, s"need at least one estimator, got $nEst")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val counts = lineitem.groupBy(col("l_partkey").as("key"))
      .agg(count(lit(1)).as("c"))
    val exact = counts.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      sum(col("c").cast(dec) * col("c")).as("f2_exact"))
    val sign = when(
      graft.functions.VectorFunctions.md5HexPrefix(
        concat(col("j").cast("string"), lit(":"),
          col("key").cast("string")), 1) % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    val med = counts
      .select(col("key"), col("c"),
        explode(sequence(lit(0), lit(nEst - 1))).as("j"))
      .withColumn("sgn", sign)
      .groupBy(col("j"))
      .agg(sum(col("sgn") * col("c")).as("z"))
      .select((col("z").cast(dec) * col("z")).as("f2_j"))
      .agg(expr("sort_array(collect_list(f2_j))").as("arr"))
      .select(expr("IF(size(arr) = 0, NULL, " +
        "element_at(arr, CAST((size(arr) + 1) div 2 AS INT)))")
        .as("f2_est_dec"))
    exact.crossJoin(broadcast(med))
      .select(col("n_rows"), col("n_keys"),
        lit(nEst.toLong).as("n_estimators"),
        col("f2_exact").cast("string").as("f2_exact"),
        col("f2_est_dec").cast("string").as("f2_est"),
        expr("CAST(abs(f2_est_dec - f2_exact) * 1000000 " +
          "div nullif(f2_exact, 0) AS BIGINT)").as("err_ppm"))
  }
}
