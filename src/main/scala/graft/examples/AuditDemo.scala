package graft.examples

import graft.operators.{Dedup, Relational, Sessionize, Similarity, Sketches, TextAnalysis}
import graft.Tables

/** Usage example: the engine's "measure, don't guess" audit surface run
  * as one data-health pass — the numbers an operator reads BEFORE
  * trusting a corpus or sizing an index:
  *
  *  - `stats_benford` / `order_pareto` — ingestion-bug and
  *    concentration audits over the money columns;
  *  - `text_zipf_fit` — template-spam slope of the vocabulary head;
  *  - `embed_dim_stats` — dead/collapsed embedding dimensions;
  *  - `sim_recall_report` — what the LSH index actually serves vs the
  *    exact ranking;
  *  - `dedup_minhash_est_error` — what the MinHash estimator's error
  *    really is on this corpus;
  *  - `sketch_bloom_fpr` — the decontamination pre-gate's measured
  *    false-positive rate;
  *  - `event_bot_detect` — machine-generated event spam.
  *
  * Every audit is integer-exact and oracle-replayable, so the numbers
  * printed here are the same on any engine that implements the
  * contracts.
  *
  * Run: sbt "runMain graft.examples.AuditDemo /root/testdata/sf0.001"
  */
object AuditDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.LocalSpark.session(cpus = "4")

    def show(title: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n=== $title")
      df.show(12, truncate = false)
    }

    show("Benford first-digit audit (orders)") {
      Relational.benfordAudit(Tables.orders(spark, sfDir))
    }
    show("Revenue concentration (top-N customer share)") {
      Relational.paretoReport(Tables.orders(spark, sfDir))
    }
    show("Zipf rank-frequency fit (documents)") {
      TextAnalysis.zipfFit(Tables.documents(spark, sfDir))
    }
    show("Embedding per-dimension health") {
      Similarity.dimStats(Tables.embeddings(spark, sfDir))
        .filter(org.apache.spark.sql.functions.col("dead"))
    }
    show("ANN recall vs brute force (ppm)") {
      Similarity.recallReport(Tables.embeddings(spark, sfDir))
    }
    show("MinHash estimator error vs exact Jaccard (ppm)") {
      Dedup.minHashEstimatorAudit(Tables.documents(spark, sfDir))
    }
    show("Bloom pre-gate measured FPR") {
      Sketches.bloomFprAudit(Tables.documents(spark, sfDir))
    }
    show("Gap-regularity bot flags (events)") {
      Sessionize.botDetect(Tables.events(spark, sfDir))
        .filter(org.apache.spark.sql.functions.col("is_bot"))
    }

    spark.stop()
  }
}
