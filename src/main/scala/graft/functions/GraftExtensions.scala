package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them alongside the Column API:
  *
  *   SELECT simhash64(text), word_shingles(text, 3) FROM docs
  *
  * Two doors: [[GraftExtensions]] for session construction
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`), and
  * [[GraftFunctions.register]] to add them to an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Seq[Expression] = {
    if (args.size != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.size}")
    args
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_array_dot" -> (args => {
      val a = arity("long_array_dot", args, 2); LongArrayDot(a(0), a(1))
    }),
    "long_array_agree" -> (args => {
      val a = arity("long_array_agree", args, 2); LongArrayAgree(a(0), a(1))
    }),
    "word_shingles" -> (args => {
      val a = arity("word_shingles", args, 2)
      WordShingles(a(0), intArg(a(1), "n"))
    }),
    "minhash_sig" -> (args => {
      val a = arity("minhash_sig", args, 2)
      MinHashSig(a(0), intArg(a(1), "numHashes"))
    }),
    "simhash64" -> (args => SimHash64(arity("simhash64", args, 1).head)),
    "nfc_normalize" -> (args =>
      NfcNormalize(arity("nfc_normalize", args, 1).head)),
    "winnow_fps" -> (args => {
      val a = arity("winnow_fps", args, 3)
      WinnowFps(a(0), intArg(a(1), "k"), intArg(a(2), "w"))
    }),
    "sign_lsh_buckets" -> (args => {
      val a = arity("sign_lsh_buckets", args, 3)
      SignLshBuckets(a(0), intArg(a(1), "tables"), intArg(a(2), "bitsPerTable"))
    }),
    // marker_counts(text, 'de:der|die,en:the|and') — marker lists as a
    // string literal: comma-separated lists, pipe-separated words,
    // optional "name:" prefix per list (ignored; positions index the
    // output array)
    "marker_counts" -> (args => {
      val a = arity("marker_counts", args, 2)
      val spec = a(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"marker spec must be a string literal, got $other")
      }
      val markers = spec.split(",").toSeq.map { list =>
        val body = list.indexOf(':') match {
          case -1 => list
          case i  => list.substring(i + 1)
        }
        body.split("\\|").toSeq.map(_.trim).filter(_.nonEmpty)
      }
      MarkerCounts(a(0), markers)
    }),
    "top_token_count" -> (args =>
      TopTokenCount(arity("top_token_count", args, 1).head)),
    "char_bigrams" -> (args =>
      CharBigrams(arity("char_bigrams", args, 1).head)),
    "word_bigram_pairs" -> (args =>
      WordBigramPairs(arity("word_bigram_pairs", args, 1).head)),
    "tri_upper_products" -> (args =>
      TriUpperProducts(arity("tri_upper_products", args, 1).head)))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
