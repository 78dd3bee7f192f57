package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Third ANN family next to sign-LSH and IVF: a graph index — the
  * navigable-small-world construction underlying HNSW (Malkov &
  * Yashunin, "Efficient and robust approximate nearest neighbor search
  * using Hierarchical Navigable Small World graphs", TPAMI 2018), made
  * DETERMINISTIC and sharded the way a Spark cluster actually runs it.
  *
  * Where LSH answers "probably co-bucketed" and IVF answers "route to
  * the nprobe nearest lists", a graph index answers beam search over
  * neighbor-of-neighbor links — sub-linear per query within a shard
  * and much higher recall than LSH at equal candidate budgets on
  * clustered data.
  *
  * Round 10 raises the single-layer NSW to the FULL LAYER HIERARCHY:
  * each node draws a level from the md5 of its id (P(level ≥ l) =
  * 4^−l — the deterministic stand-in for HNSW's geometric draw, same
  * md5 doctrine as doc_sample/seedCentroids), upper layers form
  * exponentially sparser long-range graphs, and a search greedily
  * descends from the top entry point before running the layer-0 beam.
  * The hierarchy is exactly what buys budget: the descent lands the
  * beam next to the answer, so layer 0 needs a fraction of the flat
  * NSW's ef for the same recall (the round-9 baseline needed ef=256 —
  * a 12.8% scan budget — for 0.99 recall on uniform vectors; the
  * env-gated probe records the hierarchical budget/recall point in
  * BASELINE.md). [[nswTopK]] keeps the flat form (maxLevel = 0) as
  * the control.
  *
  * Distribution shape (the part that must survive 100 TB): the corpus
  * is NEVER broadcast and never leaves its partitions. Each partition
  * builds an in-memory index over ITS rows inside `mapPartitions` (the
  * executor-shard pattern every production graph-ANN deployment uses),
  * beam-searches the bounded broadcast query set, and emits ≤ k rows
  * per (query, shard); the partial top-k aggregator (TopKAgg) merges
  * shards map-side, so shuffle volume is O(queries·k·shards) —
  * independent of corpus size. Shard memory is
  * n_part·(dim·8 + ~3·m·4) bytes; at scale you size partitions the
  * same way you size IVF lists (repartition so a shard fits an
  * executor — the 100-TB knob is partition count, nothing else).
  *
  * Determinism doctrine (same as the rest of the engine): insertion
  * order is sorted vec_id, node levels are md5-derived, every candidate
  * ordering breaks ties by (cos DESC, id ASC), and the similarity
  * arithmetic is the exact integer-quantized dot + one IEEE division
  * used everywhere else — so scores are bit-identical to
  * [[Similarity.bruteForceTopK]]'s and two runs of the same build
  * produce the same graph and the same answers. Zero-norm vectors
  * (undefined cosine) are excluded from graph and queries up front,
  * mirroring [[Similarity]]'s NaN rule.
  *
  * Oracle status: the family is approximate by nature, so the search
  * paths are spec-driven — bit-exact scores vs brute force on the
  * overlap, run-to-run determinism, recall floors single- and
  * multi-shard, the no-corpus-broadcast plan property, and (env-gated
  * at sf0.1) the hierarchy's budget/recall advantage over the flat
  * control. Two paths additionally sit under the driver's full
  * rows+schema+hash oracle: the SERVE path (`sim_ann_hnsw_served` —
  * at validation scale its efSearch exceeds the corpus, the beam is
  * exhaustive, and the result equals the brute-force replay exactly,
  * the equality itself spec-pinned to the driver-gate fixture) and,
  * since round 13, CONSTRUCTION itself (`sim_ann_hnsw_build` — a
  * single-shard fixture built with efConstruction ≥ N, where every
  * construction beam is exhaustive and the whole insert/trim sequence
  * replays as an unrolled SQL fold; see the registry entry).
  */
object GraphAnn {

  /** Deterministic HNSW level draw: trailing zero bits of the 28-bit
    * md5 prefix of the id, two bits per level (P(level ≥ l) = 4^−l),
    * capped. maxLevel = 0 degrades to the flat NSW. */
  private[graft] def levelOf(id: Long, maxLevel: Int): Int = {
    if (maxLevel <= 0) return 0
    val hex = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(id.toString).substring(0, 7)
    val h = java.lang.Long.parseLong(hex, 16).toInt
    val t = Integer.numberOfTrailingZeros(h | (1 << 28))
    math.min(t / 2, maxLevel)
  }

  /** One shard's deterministic layered graph. Indices are positions in
    * the insertion (sorted-id) order; layer-0 adjacency is capped at
    * 2·m per node, upper layers at m, kept deterministic by trimming
    * under (cos DESC, id ASC) w.r.t. the owning node. */
  private[graft] final class NswIndex(m: Int, efConstruction: Int,
                                      maxLevel: Int = 0) {
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Long]]
    private val sqn = mutable.ArrayBuffer.empty[Double] // sqrt(norm)
    // adj(node)(lev) — one neighbor list per layer 0..level(node)
    private val adj = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1 // node with the highest level so far
    private var entryLevel: Int = -1

    /** cosine evaluations since construction — the scan-budget meter
      * the env-gated recall probe reads (budget = evals / (N·queries)). */
    var cosEvals: Long = 0L

    def size: Int = ids.length

    private def cap(lev: Int): Int = if (lev == 0) 2 * m else m

    private def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }

    /** Same IEEE steps as [[Similarity.cosine]]: exact long dot, one
      * double division by the product of precomputed sqrt norms. */
    private def cos(q: Array[Long], qs: Double, node: Int): Double = {
      cosEvals += 1
      dot(q, vecs(node)).toDouble / (qs * sqn(node))
    }

    /** (cos DESC, id ASC) — the engine's total order for neighbors. */
    private def better(cA: Double, iA: Int, cB: Double, iB: Int): Boolean =
      cA > cB || (cA == cB && ids(iA) < ids(iB))

    /** Greedy best-first beam search within ONE layer from `from`,
      * returning up to `ef` nodes sorted best-first. */
    private def searchLayer(q: Array[Long], qs: Double, from: Int,
                            ef: Int, lev: Int): Array[(Double, Int)] = {
      val visited = new java.util.BitSet(ids.length)
      implicit val ord: Ordering[(Double, Int)] = (a, b) =>
        if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
        else java.lang.Long.compare(ids(b._2), ids(a._2))
      val cand = mutable.PriorityQueue.empty[(Double, Int)] // best first
      val res = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse) // worst first
      val c0 = cos(q, qs, from)
      visited.set(from); cand.enqueue((c0, from)); res.enqueue((c0, from))
      while (cand.nonEmpty) {
        val (cc, ci) = cand.dequeue()
        val worst = res.head._1
        if (res.size >= ef && cc < worst) cand.clear() // done
        else {
          val layers = adj(ci)
          val nbs = if (lev < layers.length) layers(lev)
            else mutable.ArrayBuffer.empty[Int]
          var j = 0
          while (j < nbs.length) {
            val nb = nbs(j)
            if (!visited.get(nb)) {
              visited.set(nb)
              val c = cos(q, qs, nb)
              if (res.size < ef || c > res.head._1 ||
                (c == res.head._1 && ids(nb) < ids(res.head._2))) {
                cand.enqueue((c, nb)); res.enqueue((c, nb))
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      res.dequeueAll.reverse.toArray // best first
    }

    /** Full search: greedy descent from the top entry (ef = 1 per
      * upper layer), then the layer-0 beam with `ef`. */
    def search(q: Array[Long], qs: Double, ef: Int): Array[(Double, Int)] = {
      if (ids.isEmpty) return Array.empty
      var ep = entry
      var lev = entryLevel
      while (lev > 0) {
        ep = searchLayer(q, qs, ep, 1, lev).head._2
        lev -= 1
      }
      searchLayer(q, qs, ep, ef, 0)
    }

    /** Insert in caller-sorted id order: greedy-descend to the node's
      * level, beam each layer ≤ level, link the m (2m at layer 0) best
      * bidirectionally, trimming every adjacency deterministically. */
    def insert(id: Long, v: Array[Long], s: Double): Unit = {
      val node = ids.length
      val level = levelOf(id, maxLevel)
      ids += id; vecs += v; sqn += s
      adj += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (node == 0) { entry = 0; entryLevel = level; return }
      var ep = entry
      var lev = entryLevel
      while (lev > level) {
        ep = searchLayer(v, s, ep, 1, lev).head._2
        lev -= 1
      }
      while (lev >= 0) {
        val found = searchLayer(v, s, ep, efConstruction, lev)
        val links = found.take(cap(lev))
        links.foreach { case (_, nb) =>
          if (lev < adj(nb).length) {
            adj(node)(lev) += nb
            adj(nb)(lev) += node
            if (adj(nb)(lev).length > cap(lev)) trim(nb, lev)
          }
        }
        trim(node, lev)
        ep = found.head._2
        lev -= 1
      }
      if (level > entryLevel) { entry = node; entryLevel = level }
    }

    /** Keep the layer cap's best neighbors of `node` at `lev` by
      * (cos DESC, id ASC) w.r.t. node's own vector. */
    private def trim(node: Int, lev: Int): Unit = {
      if (adj(node)(lev).length <= cap(lev)) return
      val v = vecs(node); val s = sqn(node)
      val scored = adj(node)(lev).map(nb => (cos(v, s, nb), nb))
      val kept = scored.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
        .take(cap(lev)).map(_._2)
      adj(node)(lev).clear(); adj(node)(lev) ++= kept
    }

    /** Max out-degree at layer `lev` — the spec asserts the caps
      * (layer 0 ≤ 2·m, upper layers ≤ m) through this and through the
      * persisted adjacency of the serve path. */
    def maxDegree(lev: Int = 0): Int = {
      val ds = adj.collect { case layers if lev < layers.length =>
        layers(lev).length }
      if (ds.isEmpty) 0 else ds.max
    }

    /** Persisted-state export for the serve path: node `pos`'s
      * (id, vector, per-layer adjacency as node positions). */
    private[graft] def exportNode(node: Int)
        : (Long, Array[Long], Array[Array[Int]]) =
      (ids(node), vecs(node), adj(node).map(_.toArray).toArray)

    /** Directly install a node's persisted state (serve path) —
      * bypasses [[insert]] entirely: no beam search, no trimming, no
      * cosine evaluations. Caller supplies rows in original insertion
      * (pos) order; the entry point re-derives exactly as [[insert]]
      * left it (first node reaching the maximum level wins). */
    private[graft] def loadNode(id: Long, v: Array[Long],
                                layers: Array[Array[Int]]): Unit = {
      val node = ids.length
      ids += id; vecs += v; sqn += math.sqrt(dot(v, v).toDouble)
      adj += layers.map(l => mutable.ArrayBuffer.empty[Int] ++ l)
      val level = layers.length - 1
      if (entry < 0 || level > entryLevel) { entry = node; entryLevel = level }
    }
  }

  /** Flat single-layer NSW top-k (the round-8 control): every node at
    * level 0. Same output contract as [[Similarity.bruteForceTopK]]:
    * (q_id, rank, n_id, cos), self excluded. */
  def nswTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
              m: Int = 8, efConstruction: Int = 32,
              efSearch: Int = 64): DataFrame =
    graphTopK(emb, nQueries, k, m, efConstruction, efSearch, maxLevel = 0)

  /** HIERARCHICAL (HNSW) top-k (round 10): md5-deterministic layer
    * draws, greedy descent, layer-0 beam. Reaches the flat form's
    * recall at a fraction of the scan budget — the env-gated probe
    * records the measured point in BASELINE.md. */
  def hnswTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
               m: Int = 8, efConstruction: Int = 32,
               efSearch: Int = 48, maxLevel: Int = 6): DataFrame =
    graphTopK(emb, nQueries, k, m, efConstruction, efSearch, maxLevel)

  private def graphTopK(emb: DataFrame, nQueries: Int, k: Int,
                        m: Int, efConstruction: Int, efSearch: Int,
                        maxLevel: Int): DataFrame = {
    require(m >= 2 && efConstruction >= m && efSearch >= k,
      s"need m>=2, efConstruction>=m, efSearch>=k; " +
        s"got m=$m efC=$efConstruction efS=$efSearch k=$k")
    val spark = emb.sparkSession
    import spark.implicits._
    val p = Similarity.prepared(emb)
      .filter(col("nrm") > 0L)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .as[(Long, Array[Long], Long)]
    // bounded query set (the serve contract shared with sim_ann_lsh /
    // IVF: queries are few, the corpus is the big side)
    val queries = p.filter(_._1 < nQueries).collect()
      .map { case (id, v, n) => (id, v, math.sqrt(n.toDouble)) }
      .sortBy(_._1)
    val bq = spark.sparkContext.broadcast(queries)
    val perShard = p.mapPartitions { rows =>
      val sorted = rows.toArray.sortBy(_._1) // deterministic build order
      if (sorted.isEmpty || bq.value.isEmpty) Iterator.empty
      else {
        val idx = new NswIndex(m, efConstruction, maxLevel)
        sorted.foreach { case (id, v, n) =>
          idx.insert(id, v, math.sqrt(n.toDouble))
        }
        val shardIds = sorted.map(_._1)
        bq.value.iterator.flatMap { case (qId, qv, qs) =>
          idx.search(qv, qs, efSearch).iterator
            .map { case (c, node) => (qId, shardIds(node), c) }
            .filter { case (q, nId, _) => nId != q }
            .take(k)
        }
      }
    }.toDF("q_id", "n_id", "cos")
    Similarity.topKPerGroup(perShard, k)
  }

  /** BUILD-ONCE persistence for the graph index (round 11) — the
    * `sim_ann_ivf_served` doctrine applied to the best ANN family on
    * the board: [[hnswTopK]] rebuilds every shard's graph inside
    * `mapPartitions` on EVERY query, and at 100 TB the per-query index
    * build is the dominant cost. This writes each shard's full layered
    * state — one row per node: (shard, pos, vec_id, vector, per-layer
    * adjacency as node positions) — to parquet, keyed by shard, so
    * serving loads adjacency instead of re-running the O(N·efC) beam
    * construction. Same sharding as the query-time build (one index
    * per input partition), so [[hnswServedTopK]] answers BIT-IDENTICALLY
    * to [[hnswTopK]] over the same prepared frame. */
  def buildHnswIndex(emb: DataFrame, outDir: String, m: Int = 8,
                     efConstruction: Int = 32, maxLevel: Int = 6): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val p = Similarity.prepared(emb)
      .filter(col("nrm") > 0L)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .as[(Long, Array[Long], Long)]
    p.mapPartitions { rows =>
      val sorted = rows.toArray.sortBy(_._1)
      if (sorted.isEmpty) Iterator.empty
      else {
        val shard = org.apache.spark.TaskContext.getPartitionId()
        val idx = new NswIndex(m, efConstruction, maxLevel)
        sorted.foreach { case (id, v, n) =>
          idx.insert(id, v, math.sqrt(n.toDouble))
        }
        (0 until idx.size).iterator.map { pos =>
          val (id, vec, layers) = idx.exportNode(pos)
          (shard, pos, id, vec, layers.map(_.toSeq).toSeq)
        }
      }
    }.toDF("shard", "pos", "vec_id", "vec", "adj")
      .write.mode("overwrite").parquet(outDir)
  }

  /** INCREMENTAL INSERT into a persisted index (round 14) — the HNSW
    * half of the index-maintenance story `sim_ann_index_upsert` opened
    * for IVF: a corpus delta lands in the graph WITHOUT rebuilding it.
    * Each shard's persisted state reloads via [[NswIndex.loadNode]]
    * (zero beam work, zero cosine evaluations — the serve path's
    * loader), then the delta rows insert in sorted-id order through
    * the NORMAL construction beam against the already-built graph.
    *
    * The identity that makes this correct: HNSW construction is a
    * LEFT FOLD over the sorted insertion sequence — state after
    * inserting ids(base) then ids(delta) equals state after inserting
    * ids(base ∪ delta) whenever every base id precedes every delta id
    * (exactly the doc-id-ranged delta shape of a growing corpus), so
    * the upserted index is BIT-IDENTICAL to the from-scratch rebuild
    * on the union — which is what the oracle replays. Delta rows route
    * to shards by id hash (`id mod nShards`); on the single-shard
    * fixture this is the full identity, at scale it is the standard
    * keyed-shard layout (the build's partition knob, made explicit).
    * The fold-identity precondition is VALIDATED per shard, not
    * assumed (round 15, advisor): an index whose base shards were laid
    * out by a different rule (e.g. [[buildHnswIndex]]'s
    * partition-id sharding on a multi-partition frame) would silently
    * break the rebuild identity if a delta id slotted below a resident
    * id — so each shard asserts max(base id) < min(delta id) and
    * aborts the job naming the shard and both ids otherwise.
    *
    * Cost shape: O(|delta|·efC·log N) beam work against loaded
    * adjacency vs O(N·efC·log N) for a rebuild — the difference
    * between a nightly delta and re-encoding 100 TB. */
  def upsertHnswIndex(indexDir: String, delta: DataFrame, outDir: String,
                      m: Int = 8, efConstruction: Int = 32,
                      maxLevel: Int = 6): Unit = {
    val spark = delta.sparkSession
    import spark.implicits._
    val idxDf = spark.read.parquet(indexDir)
      .select(col("shard").cast("int"), col("pos").cast("int"),
        col("vec_id"), col("vec"), col("adj"))
      .as[(Int, Int, Long, Array[Long], Seq[Seq[Int]])]
    val maxShard = spark.read.parquet(indexDir).agg(max(col("shard"))).head
    val nShards = if (maxShard.isNullAt(0)) 1
      else maxShard.get(0).toString.toInt + 1
    val d = Similarity.prepared(delta).filter(col("nrm") > 0L)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .as[(Long, Array[Long], Long)]
    val ik = idxDf.groupByKey(_._1)
    val dk = d.groupByKey(t => math.floorMod(t._1, nShards.toLong).toInt)
    ik.cogroup(dk) { (shard, stateRows, deltaRows) =>
      val sorted = stateRows.toArray.sortBy(_._2)
      val index = new NswIndex(m, efConstruction, maxLevel)
      sorted.foreach { case (_, _, id, vec, layers) =>
        index.loadNode(id, vec, layers.map(_.toArray).toArray)
      }
      val deltaSorted = deltaRows.toArray.sortBy(_._1)
      // fold-identity gate: insertion is a left fold over sorted ids,
      // so base-then-delta == rebuild-on-union ONLY when every resident
      // id precedes every delta id in this shard — check it, loudly
      if (sorted.nonEmpty && deltaSorted.nonEmpty) {
        val maxBase = sorted.iterator.map(_._3).max
        val minDelta = deltaSorted.head._1
        require(maxBase < minDelta,
          s"hnsw upsert shard $shard violates the fold-identity " +
            s"precondition: resident id $maxBase >= delta id $minDelta " +
            "(delta ids must all follow the shard's base ids; rebuild " +
            "the index or re-range the delta)")
      }
      deltaSorted.foreach { case (id, v, n) =>
        index.insert(id, v, math.sqrt(n.toDouble))
      }
      (0 until index.size).iterator.map { pos =>
        val (id, vec, layers) = index.exportNode(pos)
        (shard, pos, id, vec, layers.map(_.toSeq).toSeq)
      }
    }.toDF("shard", "pos", "vec_id", "vec", "adj")
      .write.mode("overwrite").parquet(outDir)
  }

  /** SERVE from a persisted index: load each shard's adjacency rows
    * (one exchange keyed by shard — the load cost, paid per serve
    * batch, vs. [[hnswTopK]]'s full graph CONSTRUCTION per query),
    * reassemble the in-memory index via [[NswIndex.loadNode]] (no beam
    * search, no trims, zero cosine evaluations — construction is
    * structurally impossible here: this function never sees the
    * corpus), and beam-search the bounded broadcast query set. The
    * only scan in the serve plan is the index parquet; `queryEmb`
    * is collected driver-side before the plan exists.
    *
    * Determinism: nodes reload in insertion order, the entry point
    * re-derives identically, and sqrt-norms recompute from the exact
    * integer vectors — searches are bit-identical to the freshly built
    * index's (spec-asserted). */
  def hnswServedTopK(indexDir: String, queryEmb: DataFrame,
                     nQueries: Int = 10, k: Int = 10,
                     efSearch: Int = 48): DataFrame = {
    val spark = queryEmb.sparkSession
    import spark.implicits._
    val queries = Similarity.prepared(queryEmb)
      .filter(col("nrm") > 0L)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .as[(Long, Array[Long], Long)].collect()
      .map { case (id, v, n) => (id, v, math.sqrt(n.toDouble)) }
      .sortBy(_._1)
    val bq = spark.sparkContext.broadcast(queries)
    val idx = spark.read.parquet(indexDir)
      .select(col("shard").cast("int"), col("pos").cast("int"),
        col("vec_id"), col("vec"), col("adj"))
      .as[(Int, Int, Long, Array[Long], Seq[Seq[Int]])]
    val perShard = idx.groupByKey(_._1).flatMapGroups { (_, rows) =>
      val sorted = rows.toArray.sortBy(_._2)
      if (sorted.isEmpty || bq.value.isEmpty) Iterator.empty
      else {
        // build params are irrelevant at serve time (search reads only
        // adjacency + entry); constructed with the defaults for clarity
        val index = new NswIndex(8, 32, 6)
        sorted.foreach { case (_, _, id, vec, layers) =>
          index.loadNode(id, vec, layers.map(_.toArray).toArray)
        }
        val shardIds = sorted.map(_._3)
        bq.value.iterator.flatMap { case (qId, qv, qs) =>
          index.search(qv, qs, efSearch).iterator
            .map { case (c, node) => (qId, shardIds(node), c) }
            .filter { case (q, nId, _) => nId != q }
            .take(k)
        }
      }
    }.toDF("q_id", "n_id", "cos")
    Similarity.topKPerGroup(perShard, k)
  }
}
