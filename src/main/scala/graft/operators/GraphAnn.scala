package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Third ANN family next to sign-LSH and IVF: a graph index — the
  * navigable-small-world construction underlying HNSW (Malkov &
  * Yashunin, "Efficient and robust approximate nearest neighbor search
  * using Hierarchical Navigable Small World graphs", TPAMI 2018;
  * single-layer NSW form), made DETERMINISTIC and sharded the way a
  * Spark cluster actually runs it.
  *
  * Where LSH answers "probably co-bucketed" and IVF answers "route to
  * the nprobe nearest lists", a graph index answers beam search over
  * neighbor-of-neighbor links — sub-linear per query within a shard
  * and much higher recall than LSH at equal candidate budgets on
  * clustered data.
  *
  * Distribution shape (the part that must survive 100 TB): the corpus
  * is NEVER broadcast and never leaves its partitions. Each partition
  * builds an in-memory NSW over ITS rows inside `mapPartitions` (the
  * executor-shard pattern every production graph-ANN deployment uses),
  * beam-searches the bounded broadcast query set, and emits ≤ k rows
  * per (query, shard); the partial top-k aggregator (TopKAgg) merges
  * shards map-side, so shuffle volume is O(queries·k·shards) —
  * independent of corpus size. Shard memory is
  * n_part·(dim·8 + 2·m·4) bytes; at scale you size partitions the
  * same way you size IVF lists (repartition so a shard fits an
  * executor — the 100-TB knob is partition count, nothing else).
  *
  * Determinism doctrine (same as the rest of the engine): insertion
  * order is sorted vec_id, every candidate ordering breaks ties by
  * (cos DESC, id ASC), and the similarity arithmetic is the exact
  * integer-quantized dot + one IEEE division used everywhere else —
  * so scores are bit-identical to [[Similarity.bruteForceTopK]]'s and
  * two runs of the same build produce the same graph and the same
  * answers. Zero-norm vectors (undefined cosine) are excluded from
  * graph and queries up front, mirroring [[Similarity]]'s NaN rule.
  *
  * Spec-driven component (like the streaming faces): approximate by
  * nature, so it carries no SQL oracle — the spec asserts bit-exact
  * scores vs brute force on the overlap, run-to-run determinism,
  * recall floors single- and multi-shard, and the no-corpus-broadcast
  * plan property.
  */
object GraphAnn {

  /** One shard's deterministic single-layer NSW. Indices are positions
    * in the insertion (sorted-id) order; adjacency is capped at `m`
    * per node, kept sorted by (cos DESC, id ASC) w.r.t. the owning
    * node so trimming is deterministic. */
  private final class NswIndex(m: Int, efConstruction: Int) {
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Long]]
    private val sqn = mutable.ArrayBuffer.empty[Double] // sqrt(norm)
    private val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]

    def size: Int = ids.length

    private def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }

    /** Same IEEE steps as [[Similarity.cosine]]: exact long dot, one
      * double division by the product of precomputed sqrt norms. */
    private def cos(q: Array[Long], qs: Double, node: Int): Double =
      dot(q, vecs(node)).toDouble / (qs * sqn(node))

    /** (cos DESC, id ASC) — the engine's total order for neighbors. */
    private def better(cA: Double, iA: Int, cB: Double, iB: Int): Boolean =
      cA > cB || (cA == cB && ids(iA) < ids(iB))

    /** Greedy best-first beam search: returns up to `ef` nodes sorted
      * best-first. Entry is node 0 (the smallest id — fixed, so the
      * walk is reproducible). */
    def search(q: Array[Long], qs: Double, ef: Int): Array[(Double, Int)] = {
      if (ids.isEmpty) return Array.empty
      val visited = new java.util.BitSet(ids.length)
      // both heaps ordered with the deterministic tie-break
      implicit val ord: Ordering[(Double, Int)] = (a, b) =>
        if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
        else java.lang.Long.compare(ids(b._2), ids(a._2))
      val cand = mutable.PriorityQueue.empty[(Double, Int)] // best first
      val res = mutable.PriorityQueue.empty[(Double, Int)](ord.reverse) // worst first
      val c0 = cos(q, qs, 0)
      visited.set(0); cand.enqueue((c0, 0)); res.enqueue((c0, 0))
      while (cand.nonEmpty) {
        val (cc, ci) = cand.dequeue()
        val worst = res.head._1
        if (res.size >= ef && cc < worst) cand.clear() // done
        else {
          val nbs = adj(ci); var j = 0
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

    /** Insert in caller-sorted id order: link to the m best of an
      * efConstruction beam over the existing graph, bidirectionally,
      * trimming every adjacency back to m deterministically. */
    def insert(id: Long, v: Array[Long], s: Double): Unit = {
      val node = ids.length
      ids += id; vecs += v; sqn += s
      adj += mutable.ArrayBuffer.empty[Int]
      if (node == 0) return
      val found = search(v, s, efConstruction)
      val links = found.take(m)
      links.foreach { case (_, nb) =>
        adj(node) += nb
        adj(nb) += node
        if (adj(nb).length > m) trim(nb)
      }
      trim(node)
    }

    /** Keep the m best neighbors of `node` by (cos DESC, id ASC) w.r.t.
      * node's own vector. */
    private def trim(node: Int): Unit = {
      if (adj(node).length <= m) return
      val v = vecs(node); val s = sqn(node)
      val scored = adj(node).map(nb => (cos(v, s, nb), nb))
      val kept = scored.sortWith((a, b) => better(a._1, a._2, b._1, b._2))
        .take(m).map(_._2)
      adj(node).clear(); adj(node) ++= kept
    }

    /** Max out-degree — exposed so the spec can assert the bound. */
    def maxDegree: Int = if (adj.isEmpty) 0 else adj.map(_.length).max
  }

  /** ANN top-k via per-partition NSW shards: for each query vector
    * (vec_id < nQueries, zero-norm excluded), the k best candidates the
    * beam search surfaces, globally merged. Same output contract as
    * [[Similarity.bruteForceTopK]]: (q_id, rank, n_id, cos), self
    * excluded. */
  def nswTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10,
              m: Int = 8, efConstruction: Int = 32,
              efSearch: Int = 64): DataFrame = {
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
        val idx = new NswIndex(m, efConstruction)
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
}
