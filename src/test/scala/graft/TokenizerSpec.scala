package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

/** BPE merge-statistics training: hand-replayed merges on a corpus
  * engineered to exercise every branch — weighted pair counts, the
  * lexicographic tie-break, greedy non-overlapping application on a
  * repeated-symbol chain, and merged symbols compounding across steps. */
class TokenizerSpec extends SparkSpec {

  test("bpeMergeStats replays three hand-computed merge steps, " +
    "including the aaaa parity chain and rank tie-breaks") {
    import spark.implicits._
    // words after normalize: aaaa ×1, banana ×2, bandana ×1
    val docs = Seq((1L, "aaaa banana  BANANA bandana"))
      .toDF("doc_id", "text")
    val out = Tokenizer.bpeMergeStats(docs, steps = 3, topK = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getString(3), r.getLong(4)))).toMap
    // step 1 over single chars: an=6 beats na=5; aa ties ba at 3 and
    // wins lexicographically
    assert(out((1L, 1L)) == (("a", "n", 6L)))
    assert(out((1L, 2L)) == (("n", "a", 5L)))
    assert(out((1L, 3L)) == (("a", "a", 3L)))
    assert(out((1L, 4L)) == (("b", "a", 3L)))
    assert(out((1L, 5L)) == (("d", "a", 1L)))
    // step 2 after merging (a,n): banana = [b,an,an,a]; three pairs tie
    // at 3 and (a,a) < (an,a) < (b,an) lexicographically
    assert(out((2L, 1L)) == (("a", "a", 3L)))
    assert(out((2L, 2L)) == (("an", "a", 3L)))
    assert(out((2L, 3L)) == (("b", "an", 3L)))
    assert(out((2L, 4L)) == (("an", "an", 2L)))
    assert(out((2L, 5L)) == (("an", "d", 1L)))
    // step 3 after merging (a,a): greedy parity turned aaaa into
    // [aa,aa] — NOT [aa,a,a] — so (aa,aa) appears with weight 1
    assert(out((3L, 1L)) == (("an", "a", 3L)))
    assert(out((3L, 2L)) == (("b", "an", 3L)))
    assert(out((3L, 3L)) == (("an", "an", 2L)))
    assert(out((3L, 4L)) == (("aa", "aa", 1L)))
    assert(out((3L, 5L)) == (("an", "d", 1L)))
    assert(out.size == 15)
  }

  test("bpeCompression replays the hand-computed symbol-count curve") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa banana  BANANA bandana")).toDF("doc_id", "text")
    val out = Tokenizer.bpeCompression(docs, steps = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // step 0: chars — 4·1 + 6·2 + 7·1 = 23 over alphabet {a,b,n,d}
    assert(out(0L) == ((23L, 4L)))
    // merge (a,n): banana [b,an,an,a], bandana [b,an,d,an,a]
    assert(out(1L) == ((17L, 4L)))
    // merge (a,a): aaaa [aa,aa]; bare 'a' survives in banana
    assert(out(2L) == ((15L, 5L)))
    // merge (an,a): banana [b,an,ana], bandana [b,an,d,ana]
    assert(out(3L) == ((12L, 5L)))
  }

  test("bpeMergeStats on the fixture corpus: deterministic under " +
    "repartitioning, weights strictly positive and non-increasing per step") {
    val docs = Tables.documents(spark, sf0)
    val a = Tokenizer.bpeMergeStats(docs).collect()
    val b = Tokenizer.bpeMergeStats(docs.repartition(5)).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 15)
    a.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ws = rows.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(ws.forall(_ > 0L))
      assert(ws.zip(ws.tail).forall { case (hi, lo) => hi >= lo })
    }
  }
}
