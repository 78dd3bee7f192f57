package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Keys allowed to dump 0 rows at the verify SF (legitimately empty
    * shapes only — each needs a FIXTURES.md §zero-row-whitelist entry
    * explaining why empty IS the correct answer). Currently empty:
    * every board key produces rows at sf0.01 by design. */
  val ZeroRowWhitelist: Set[String] = Set.empty

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // dev loop: extra args scope the dump to the named keys (the driver
    // passes exactly two args, so its full-run contract is unchanged)
    val only = args.drop(2).toSet
    val scoped =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    val spark = LocalSpark.session()
    new java.io.File(outDir).mkdirs()
    scoped.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Vacuity gate (round 16, verdict): a 0-row result "passes"
        // parity no matter what the query computes (both sides empty).
        // Every key must produce rows at the verify SF, or be
        // explicitly whitelisted (FIXTURES.md §zero-row-whitelist).
        // The count reads parquet footer stats — no data scan.
        val n = spark.read.parquet(s"$outDir/$name").count()
        if (n == 0L && !ZeroRowWhitelist(name))
          throw new IllegalStateException(
            s"0 rows at $sfDir — parity would be vacuous; fix the " +
              "fixture grain or whitelist in FIXTURES.md")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      SparkEntry.harnessScope.release()
      SparkEntry.drainTransientScratch()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
