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

  test("wordpieceTrainStats: the likelihood rule picks the collocated " +
    "pair over the merely-frequent one — diverging from BPE by hand") {
    import spark.implicits._
    // "ab" ×10, "xy" ×2: pair (a,b) weight 10 but freq(a)=freq(b)=10
    // -> score (10·1e9) div 100 = 1e8; pair (x,y) weight 2 with
    // freq(x)=freq(y)=2 -> score (2·1e9) div 4 = 5e8. WordPiece merges
    // xy FIRST; BPE (raw weight) merges ab.
    val docs = Seq((1L, (Seq.fill(10)("ab") ++ Seq.fill(2)("xy"))
      .mkString(" "))).toDF("doc_id", "text")
    val wp = Tokenizer.wordpieceTrainStats(docs, steps = 1, topK = 2)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(wp(1L) == (("x", "y", 2L, 500000000L)), s"got $wp")
    assert(wp(2L) == (("a", "b", 10L, 100000000L)), s"got $wp")
    val bpe = Tokenizer.bpeMergeStats(docs, steps = 1, topK = 1)
      .collect().head
    assert((bpe.getString(2), bpe.getString(3)) == (("a", "b")),
      "raw-weight BPE must still pick the frequent pair")
    // determinism under partitioning
    assert(Tokenizer.wordpieceTrainStats(docs, steps = 2, topK = 3)
      .collect().toSeq ==
      Tokenizer.wordpieceTrainStats(docs.repartition(5), steps = 2,
        topK = 3).collect().toSeq)
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

  test("unigramVocab matches an independent driver-side hard-EM replay " +
    "(seed ranks, Viterbi with exact tie-breaks, usage M-step) and is " +
    "repartition-deterministic") {
    val docs = Tables.documents(spark, sf0)
    val out = Tokenizer.unigramVocab(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out2 = Tokenizer.unigramVocab(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == out2.toSeq, "not repartition-deterministic")

    // ---- independent reference implementation (plain Scala) ----------
    val texts = docs.select(col("text")).collect().map(_.getString(0))
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      t.toLowerCase.trim.split(" +").filter(_.nonEmpty).foreach { w0 =>
        val w = w0.take(12)
        wc(w) = wc.getOrElse(w, 0L) + 1L
      }
    }
    def substrFreqs: Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        for (p <- 1 to w.length; k <- 1 to math.min(3, p)) {
          val piece = w.substring(p - k, p)
          m(piece) = m.getOrElse(piece, 0L) + c
        }
      }
      m.toMap
    }
    val singles = substrFreqs.keys.filter(_.length == 1).toSet
    def vocabOf(freqs: Map[String, Long]): Seq[(String, Long, Long)] = {
      val sf = singles.toSeq.map(p => p -> freqs.getOrElse(p, 0L))
      val mf = freqs.toSeq.filter(_._1.length >= 2)
        .sortBy { case (p, f) => (-f, p) }.take(32)
      val v = sf ++ mf
      val sorted = v.sortBy { case (p, f) => (-f, p) }
      sorted.zipWithIndex.map { case ((p, f), i) => (p, f, i + 1L) }
    }
    def usageUnder(rank: Map[String, Long]): Map[String, Long] = {
      val use = scala.collection.mutable.Map.empty[String, Long]
      wc.foreach { case (w, c) =>
        val n = w.length
        val cost = Array.fill(n + 1)(Long.MaxValue)
        val kc = Array.fill(n + 1)(0)
        cost(0) = 0L
        for (p <- 1 to n; k <- 1 to math.min(3, p)) {
          val piece = w.substring(p - k, p)
          rank.get(piece).foreach { r =>
            if (cost(p - k) != Long.MaxValue) {
              val cand = cost(p - k) + 1000000L + r
              // tie-break: smaller (cost, k) wins — k ascends, so only
              // strictly-better candidates replace
              if (cand < cost(p)) { cost(p) = cand; kc(p) = k }
            }
          }
        }
        var p = n
        while (p > 0) {
          val k = kc(p)
          val piece = w.substring(p - k, p)
          use(piece) = use.getOrElse(piece, 0L) + c
          p -= k
        }
      }
      use.toMap
    }
    var vocab = vocabOf(substrFreqs)
    for (_ <- 1 to 2)
      vocab = vocabOf(usageUnder(
        vocab.map { case (p, _, r) => p -> r }.toMap))
    val want = vocab.filter(_._3 <= 24L)
      .map { case (p, f, r) => (r, p, p.length.toLong, f) }
      .sortBy(_._1)
    assert(out.toSeq == want,
      s"engine vocab diverges from the reference replay:\n" +
        s"got  ${out.toSeq}\nwant $want")
    // non-vacuous: the trained head contains real multi-char pieces
    assert(out.exists(_._3 >= 2), "no multi-char piece learned")

    // ---- encode-side profile: third E-step under the final vocab ----
    val enc = Tokenizer.unigramEncode(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val u3 = usageUnder(vocab.map { case (p, _, r) => p -> r }.toMap)
    val wantEnc = u3.toSeq.groupBy(_._1.length).map { case (len, ps) =>
      len.toLong -> ((ps.size.toLong, ps.map(_._2).sum,
        len.toLong * ps.map(_._2).sum))
    }
    assert(enc == wantEnc,
      s"encode profile diverges:\ngot  $enc\nwant $wantEnc")
    // Viterbi segmentations TILE every (truncated) word: chars covered
    // must equal the corpus character count exactly
    val totalChars = wc.map { case (w, c) => w.length.toLong * c }.sum
    assert(enc.values.map(_._3).sum == totalChars,
      "encode does not tile the corpus exactly")
  }

  test("vocabCoverage: per-source coverage with a hand vocab cut, OOV " +
    "types exact, covered + uncovered tiles every occurrence") {
    import spark.implicits._
    // vocabSize 2 → vocab {a, b} (freqs 4, 3); source s1 all covered,
    // s2 has OOV types {x, y}
    val fix = Seq((1L, "a a b", "s1"), (2L, "a b b a", "s1"),
      (3L, "x y a x", "s2")).toDF("doc_id", "text", "source")
    val out = graft.operators.Corpus.vocabCoverage(fix, vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("s1") == ((7L, 7L, 0L, 1.0)), s"got ${out("s1")}")
    assert(out("s2") == ((4L, 1L, 2L, 0.25)), s"got ${out("s2")}")
    val corpus = graft.operators.Corpus
      .vocabCoverage(Tables.documents(spark, sf0)).collect()
    corpus.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0)
    }
  }

  test("bpeEncodeProfile: serve-side merges tile the encoded corpus " +
    "and replay the trained pairs on unseen words") {
    import spark.implicits._
    // train on a corpus where 'ab' is the clear first merge; encode
    // UNSEEN text containing ab runs — the aaaa-parity case must hold
    // on the serve path too
    val train = Seq((1L, "abab abab cd"), (2L, "abab ab cd")).toDF("doc_id", "text")
    val model = graft.operators.Tokenizer.bpeTrain(train, steps = 1)
    val serve = Seq((9L, "ababab xy")).toDF("doc_id", "text")
    val prof = graft.operators.Tokenizer.bpeEncodeProfile(model, serve)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "ababab" -> ab|ab|ab (3 2-char pieces), "xy" -> x|y (2 1-char)
    assert(prof(2L) == (1L, 3L, 6L), s"got $prof")
    assert(prof(1L) == (2L, 2L, 2L), s"got $prof")
    // tiling invariant: chars_covered sums to nonspace chars
    assert(prof.values.map(_._3).sum == "ababab".length + "xy".length)
  }

  test("wordpieceEncode: greedy longest-match replays by hand, tiles " +
    "the truncated corpus, and is repartition-invariant") {
    import spark.implicits._
    // words: aaab ×2, ab ×1. vocab: singles {a,b} + multi {aa:4, ab:3,
    // aaa:2, aab:2}. Greedy: aaab → aaa|b (longest-first, NOT aa|ab);
    // ab → ab. Profile: len1 {b}×2, len2 {ab}×1, len3 {aaa}×2.
    val docs = Seq((1L, "aaab  AAAB ab")).toDF("doc_id", "text")
    val out = Tokenizer.wordpieceEncode(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((1L, 2L, 2L)), 2L -> ((1L, 1L, 2L)),
      3L -> ((1L, 2L, 6L))), s"got $out")
    // corpus: greedy tiles every truncated word exactly; deterministic
    val corpus = Tables.documents(spark, sf0)
    val prof = Tokenizer.wordpieceEncode(corpus).collect()
    val totalChars = corpus
      .select(explode(split(regexp_replace(trim(lower(col("text"))),
        " +", " "), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(least(length(col("w")), lit(12)).cast("long")))
      .collect().head.getLong(0)
    assert(prof.map(_.getLong(3)).sum == totalChars,
      "wordpiece does not tile the corpus")
    assert(prof.toSeq ==
      Tokenizer.wordpieceEncode(corpus.repartition(7)).collect().toSeq)
  }
}
