package graft

import graft.functions.GraftFunctions

/** SQL-surface coverage of the native expressions: registered functions
  * callable from spark.sql, values consistent with the Column API. */
class GraftFunctionsSpec extends SparkSpec {

  test("nfc_normalize: decomposed accents compose, normalized text is a " +
    "no-op, the normalize pipeline makes decomposed twins dedup-equal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val decomposed = "cafe\u0301 re\u0301sume\u0301"
    assert(composed != decomposed) // different code points, same text
    val docs = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.nfcNormalize(col("text")).as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("n")).toMap
    assert(out(1L) == composed)     // already NFC: unchanged
    assert(out(2L) == composed)     // decomposed → composed
    assert(out(3L) == "plain ascii")
    assert(out(4L) == null)         // null-safe
    // the full normalizeText pass keys both twins to ONE fingerprint
    val fps = graft.operators.TextAnalysis
      .normalizeText(docs.filter(col("doc_id") <= 2))
      .select(col("doc_id"), md5(col("text_norm")).as("fp")).collect()
    assert(fps.map(_.getAs[String]("fp")).distinct.length == 1,
      "decomposed twin escaped the normalized fingerprint")
    // SQL door
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301') AS n")
      .head().getAs[String]("n") == "caf\u00e9")
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        |       word_shingles('a b c d', 3) AS sh,
        |       simhash64('a b c') AS fp,
        |       size(minhash_sig(word_shingles('a b c d', 3), 16)) AS sig_len,
        |       size(sign_lsh_buckets(array(1L, -2L, 3L), 4, 4)) AS n_tables,
        |       marker_counts('the cat and the hat', 'en:the|and,de:der|die') AS mc
        |""".stripMargin).collect().head
    assert(r.getAs[Long]("dot") == 32L)
    // long_array_agree: value-identical to the zip_with fold it
    // replaced (overlapping positions only; null child -> null)
    val ag = spark.sql(
      """SELECT long_array_agree(array(1L, 2L, 3L), array(1L, 5L, 3L)) AS a,
        |       long_array_agree(array(1L, 2L), array(1L, 2L, 9L)) AS b,
        |       long_array_agree(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c,
        |       long_array_agree(array(), array()) AS d
        |""".stripMargin).collect().head
    assert(ag.getAs[Long]("a") == 2L)
    assert(ag.getAs[Long]("b") == 2L)
    assert(ag.isNullAt(2))
    assert(ag.getAs[Long]("d") == 0L)
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b c", "b c d"))
    assert(r.getAs[Long]("fp") != 0L)
    assert(r.getAs[Int]("sig_len") == 16)
    assert(r.getAs[Int]("n_tables") == 4)
    assert(r.getAs[scala.collection.Seq[Long]]("mc").toSeq == Seq(3L, 0L))
  }

  test("top_token_count: SQL-callable, matches the sorted-run HOF on real docs") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT top_token_count('a b a b a') AS c")
      .collect().head.getAs[Long]("c") == 3L)
    assert(spark.sql("SELECT top_token_count('') AS c")
      .collect().head.getAs[Long]("c") == 1L) // the empty token, both forms
    val docs = Tables.documents(spark, sf0)
    import org.apache.spark.sql.functions.col
    val mismatches = docs.select(
        graft.operators.TextAnalysis.topTokenCntExpr(col("text")).as("native"),
        graft.operators.TextAnalysis.topTokenCntHofExpr(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0L)
    // multibyte tokens: UTF8String equality is byte-equality, so CJK /
    // accented tokens count identically in both formulations
    import spark.implicits._
    val uni = Seq("héllo wörld héllo 中文 中文 中文", "a é a é a").toDF("text")
    val uniRows = uni.select(
      graft.operators.TextAnalysis.topTokenCntExpr(col("text")).as("native"),
      graft.operators.TextAnalysis.topTokenCntHofExpr(col("text")).as("hof"))
      .collect()
    assert(uniRows.map(_.getAs[Long]("native")).toSeq == Seq(3L, 3L))
    assert(uniRows.forall(r => r.getAs[Long]("native") == r.getAs[Long]("hof")))
  }

  test("marker_counts matches the filter-HOF formulation on real docs") {
    import org.apache.spark.sql.functions._
    val markers = graft.operators.TextAnalysis.LangMarkers.map(_._2)
    val docs = Tables.documents(spark, sf0)
    val toks = split(col("text"), " ")
    val viaHof = markers.zipWithIndex.map { case (words, i) =>
      size(filter(toks, t => words.map(t === _).reduce(_ || _)))
        .cast("long").as(s"h_$i")
    }
    val viaNative = markers.indices.map(i =>
      graft.functions.VectorFunctions.markerCounts(col("text"), markers)
        .getItem(i).as(s"n_$i"))
    val diff = docs.select(viaHof ++ viaNative: _*)
      .filter(markers.indices
        .map(i => col(s"h_$i") =!= col(s"n_$i")).reduce(_ || _))
      .count()
    assert(diff == 0)
  }

  test("boundedCollect: exact under the cap, overflow marker above") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).map(i => (if (i <= 3) "small" else "big", i))
      .toDF("k", "v").repartition(7)
    val out = df.groupBy($"k")
      .agg(graft.functions.BoundedAgg.boundedCollect(5)($"v").as("ds"))
      .collect()
    val m = out.map(r =>
      r.getString(0) -> r.getAs[scala.collection.Seq[Long]]("ds")).toMap
    // ≤ cap: every element present exactly once, regardless of partitioning
    assert(m("small").sorted == Seq(1L, 2L, 3L))
    // > cap: bounded at cap+1 (overflow marker), never the full group
    assert(m("big").length == 6)
  }

  test("char_bigrams: value-identical to the transform(sequence) HOF " +
    "it replaced, incl. multi-byte chars; non-string fails analysis") {
    GraftFunctions.register(spark)
    // the exact composable form the LM keys used before round 19
    val hof = "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))"
    // domain = length(t) >= 2, the filter both LM keys apply before the
    // explode (below 2 chars the HOF's sequence(1, len-1) degenerates
    // to a DESCENDING sequence — an artifact the operators never
    // evaluate; the native form returns the sane empty array there)
    val rows = spark.sql(
      s"""SELECT t, char_bigrams(t) AS native, $hof AS hof FROM VALUES
         |  ('abcd'), ('café über'), ('éé'), ('ab')
         |  AS v(t)""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("native") ==
        r.getAs[scala.collection.Seq[String]]("hof"),
        s"mismatch for '${r.getString(0)}'")
    }
    // null in → null out (matches the HOF's null propagation)
    assert(spark.sql("SELECT char_bigrams(CAST(NULL AS STRING)) AS n")
      .head().isNullAt(0))
    // analysis-time rejection of non-string children
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_bigrams(42)").collect()
    }
  }

  test("word_bigram_pairs: value-identical to the slice/element_at HOF " +
    "it replaced, incl. empty tokens from repeated/trailing spaces") {
    GraftFunctions.register(spark)
    val hof = "transform(slice(split(t, ' '), 1, size(split(t, ' ')) - 1), " +
      "(w, i) -> named_struct('a', w, 'b', element_at(split(t, ' '), i + 2)))"
    val rows = spark.sql(
      s"""SELECT t, word_bigram_pairs(t) AS native, $hof AS hof FROM VALUES
         |  ('the cat sat'), ('a  b'), (' lead'), ('trail '), ('one'), ('')
         |  AS v(t)""".stripMargin).collect()
    rows.foreach { r =>
      val n = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("native")
        .map(x => (x.getString(0), x.getString(1)))
      val h = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hof")
        .map(x => (x.getString(0), x.getString(1)))
      assert(n == h, s"mismatch for '${r.getString(0)}'")
    }
  }

  test("md5_suffix_draws with '#' separator matches the CMS concat+md5 " +
    "chain it replaced") {
    GraftFunctions.register(spark)
    // the composable CMS cell form: integer of md5's first 7 hex chars
    // of (tok || '#' || r), mod width
    val r = spark.sql(
      """SELECT tok,
        |  transform(sequence(0, 3), r ->
        |    CAST(conv(substring(md5(concat(tok, '#', CAST(r AS STRING))), 1, 7), 16, 10) AS BIGINT) % 1024) AS hof
        |FROM VALUES ('the'), ('zipf'), ('') AS v(tok)""".stripMargin)
      .collect()
    val native = spark.sql(
      """SELECT tok FROM VALUES ('the'), ('zipf'), ('') AS v(tok)""")
      .select(org.apache.spark.sql.functions.col("tok"),
        graft.functions.VectorFunctions
          .md5SuffixDraws(org.apache.spark.sql.functions.col("tok"), 4, 1024, "#")
          .as("native"))
      .collect()
    r.zip(native).foreach { case (a, b) =>
      assert(a.getAs[scala.collection.Seq[Long]]("hof") ==
        b.getAs[scala.collection.Seq[Long]]("native"),
        s"mismatch for '${a.getString(0)}'")
    }
  }

  test("tri_upper_products: value/type-identical to the nested-transform " +
    "HOF embed_covariance replaced; non-bigint array fails analysis") {
    GraftFunctions.register(spark)
    val hof = "flatten(transform(q, (xi, i) -> " +
      "transform(slice(q, i + 1, size(q) - i), (xj, j) -> " +
      "named_struct('d1', i, 'd2', i + j, 'xy', xi * xj))))"
    val r = spark.sql(
      s"""SELECT tri_upper_products(q) AS native, $hof AS hof
         |FROM VALUES (array(3L, -2L, 7L)), (array(5L)) AS v(q)""".stripMargin)
      .collect()
    r.foreach { row =>
      val native = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("native")
      val viaHof = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("hof")
      assert(native.map(x => (x.getInt(0), x.getInt(1), x.getLong(2))) ==
        viaHof.map(x => (x.getInt(0), x.getInt(1), x.getLong(2))))
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT tri_upper_products(array(1, 2, 3))").collect()
    }
  }

  test("SQL and Column API agree") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("the quick brown fox jumps").toDF("text")
    val viaCol = df.select(
      graft.functions.VectorFunctions.simHash64(col("text"))).as[Long].head()
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT simhash64(text) FROM t").as[Long].head()
    assert(viaCol == viaSql)
  }
}
