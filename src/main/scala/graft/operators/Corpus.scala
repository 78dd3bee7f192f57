package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** The shared ~12.5% holdout predicate: md5 first hex digit ∈ {0,1}.
    * One definition so sampleDocs and trainTestSplit stay coupled —
    * the sample IS the test split. */
  private def isHoldout(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1).isin("0", "1")

  /** Deterministic ~12.5% document sample (the holdout bucket).
    * Reproducible under any partitioning (unlike rand()), and the same
    * rows come out of any engine. */
  def sampleDocs(docs: DataFrame): DataFrame =
    docs.filter(isHoldout(col("doc_id"))).orderBy(col("doc_id"))

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
}
