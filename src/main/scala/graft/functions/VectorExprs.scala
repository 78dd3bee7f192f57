package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the hot inner loop of the similarity
  * operators: exact integer dot product of two array<long> columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` — is a
  * higher-order function chain that Spark evaluates interpreted (HOFs are
  * CodegenFallback), allocating a lambda frame per element. Inside an
  * all-pairs join that's O(N²·d) interpreted steps and dominates the
  * benchmark (64 s of 125 s at sf0.1). This expression generates a tight
  * primitive loop inside whole-stage codegen instead — same semantics,
  * same exact integer result, ~50× less per-pair cost.
  *
  * Only the evaluation strategy changes; DuckDB-oracle parity is
  * unaffected because the value is the identical exact integer.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time type check (ADVICE r18, same hazard as LongArrayAgree)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireLongArray(prettyName, left, right)

  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two array<long> columns agree — the MinHash
  * signature-agreement kernel of the near-dup gate's candidate filters
  * and the estimator audit (round 18). The composable form —
  * `aggregate(zip_with(a, b, (x, y) => if(x = y) 1 else 0), 0, _+_)` —
  * is an interpreted HOF chain evaluated once per CANDIDATE PAIR inside
  * a join filter; this is [[LongArrayDot]]'s tight codegen loop with
  * `==` in place of `*`. Value-identical exact integer (overlapping
  * positions only, like zip_with's null-padded tail contributing 0), so
  * every DuckDB oracle replaying the agreement count is unaffected. */
case class LongArrayAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_agree"

  // analysis-time type check (ADVICE r18): int-packed ArrayData would
  // make getLong misread silently; fail analysis like the HOF fold would
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireLongArray(prettyName, left, right)

  /** Null ELEMENTS contribute 0 agreement (ADVICE r18) — identical to
    * the zip_with fold this replaced, where `if(null = x, 1, 0)` takes
    * the else branch. MinHash signatures are containsNull=false so the
    * board never hits this path; the guard keeps a future nullable-array
    * caller from getting silently inflated counts (getLong on a null
    * slot reads 0, so null==null would have counted as agreement). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        s += 1L
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) $s++;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayAgree =
    copy(left = newLeft, right = newRight)
}

/** Distinct word n-gram shingles of a single-space-separated string, in
  * first-occurrence order — one JVM loop instead of the
  * `array_distinct(transform(sequence(...), concat_ws(get(...))))` HOF
  * chain, which is interpreted and costs ~1 ms per document (it dominated
  * dedup_fuzzy at sf0.1: 5.9 s of 9.7 s just to produce shingles).
  *
  * Token semantics match Spark's `split(text, ' ')` and DuckDB's
  * `string_split(text, ' ')` exactly (consecutive/trailing separators
  * yield empty tokens), so the DuckDB oracle is unaffected.
  */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  /** Per-row loop shared by interpreted eval and generated code. */
  def shingleArray(s: UTF8String): ArrayData = {
    val toks = s.split(space, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = toks(i + j)
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any =
    shingleArray(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
      s"${ev.value} = $ref.shingleArray($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Engine-portable hash constants shared by the native MinHash/SimHash
  * expressions AND the DuckDB oracle SQL generators (SparkEntry) — ONE
  * source of truth, so the oracle replays the exact same arithmetic.
  *
  * The portability contract (same doctrine as [[WinnowFps]]): the only
  * non-SQL primitive is md5, which both engines expose with identical
  * semantics. Everything downstream of the digest is plain 64-bit
  * integer arithmetic kept strictly inside [0, 2^63) so neither engine
  * can overflow (Spark wraps silently, DuckDB raises — both are wrong).
  */
object PortableHash {
  /** MinHash modulus: 2^31 - 1 (Mersenne prime). Base hashes are 28-bit
    * md5 prefixes and multipliers are < 2^31, so a·h + b < 2^60. */
  val MinHashP: Long = 2147483647L

  /** Per-thread MD5 instance: `MessageDigest.getInstance` allocates (SPI
    * lookup + provider copy) and is NOT cheap per row; tasks are
    * single-threaded over rows, so one digest per thread, `reset()`
    * between uses, is both safe and allocation-free. JVM-static — never
    * serialized with an expression. */
  val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Per-thread content-keyed md5 memo SHARED by every digest consumer
    * ([[MinHashSig]], [[SimHash64]], [[WinnowFps]]): tokens and shingles
    * are Zipf-distributed, so the same string is digested across many
    * documents — and the three fingerprint expressions digest the same
    * shingle sets independently. The memo pays the MessageDigest cycle
    * once per distinct string per thread; every later occurrence (same
    * doc, later doc, or a DIFFERENT consumer expression) is a hash-map
    * probe with zero allocation on hit. Purely an evaluation-cost
    * change: the cached value IS the md5 digest, so results — and the
    * DuckDB oracle hashes — are byte-identical.
    *
    * Bounded by clear-on-full (capacity 2^16 entries ≈ a few MB/thread):
    * Zipf means the hot head re-enters immediately after a clear, so the
    * amortized hit rate survives eviction without LRU bookkeeping. Keys
    * probe as transient [[UTF8String]] slices (content hash/equals, no
    * allocation) and are CLONED only on insert — stored keys must own
    * their bytes because probe slices point into reused row buffers. */
  final class Md5Memo {
    private val cap = 1 << 16
    private val map =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Byte]](cap * 2)
    private val md = java.security.MessageDigest.getInstance("MD5")

    /** The 16-byte md5 digest of `key`'s bytes — cached; callers must
      * treat the returned array as read-only. */
    def digest(key: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
      var d = map.get(key)
      if (d == null) {
        md.reset()
        d = md.digest(key.getBytes)
        if (map.size() >= cap) map.clear()
        map.put(key.clone(), d)
      }
      d
    }
  }

  val md5Memo: ThreadLocal[Md5Memo] = ThreadLocal.withInitial(() => new Md5Memo)

  /** Deterministic affine-permutation parameters (a_i odd in [1, 2^31),
    * b_i in [0, 2^31)) from a fixed LCG — inlined as literals into the
    * oracle SQL, so any change here changes both engines together. */
  def minHashParams(k: Int): IndexedSeq[(Long, Long)] = {
    var s = 0x9E3779B97F4A7C15L
    (0 until k).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val a = (s >>> 33) | 1L
      s = s * 6364136223846793005L + 1442695040888963407L
      (a, s >>> 33)
    }
  }

  /** 28-bit base hash of a shingle: the integer value of the first 7
    * lowercase-hex chars of md5 — what DuckDB computes as
    * `CAST('0x' || substring(md5(s), 1, 7) AS BIGINT)`. */
  def md5Prefix28(digest: Array[Byte]): Long =
    ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
      ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xffL) >>> 4)

  /** Integer value of the first `nChars` lowercase-hex chars of an md5
    * digest — the general form of [[md5Prefix28]], byte-identical to
    * `conv(substring(md5(s), 1, nChars), 16, 10)` for nChars ≤ 15
    * (bounded so the value fits a non-negative long). */
  def hexPrefixVal(digest: Array[Byte], nChars: Int): Long = {
    var v = 0L
    var i = 0
    while (i < nChars) {
      val b = digest(i >> 1) & 0xff
      v = (v << 4) | (if ((i & 1) == 0) b >>> 4 else b & 0xf)
      i += 1
    }
    v
  }
}

/** MinHash signature of a shingle set in one pass: base = the 28-bit
  * md5-prefix of each shingle ([[PortableHash.md5Prefix28]]), then k
  * affine permutations g_i(x) = (a_i·x + b_i) mod (2^31-1), taking the
  * min per i. Null (not an empty array) when the shingle set is empty —
  * a no-content doc must not band-collide with other no-content docs.
  *
  * Replaces the explode(shingles × k seeds) formulation, which pushed
  * |shingles|·k rows (16.6M at sf0.1) through a shuffle just to take
  * mins — here it's one tight loop per document, no extra rows. The
  * md5-based base hash (round 7, was FNV-1a) makes every signature —
  * and therefore the whole banded candidate set — replayable by the
  * DuckDB oracle; see [[PortableHash]].
  */
case class MinHashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  private lazy val params = PortableHash.minHashParams(k).toArray
  private val P = PortableHash.MinHashP

  /** Per-row loop, shared by interpreted eval and the generated code
    * (the codegen emits ONE call into this compiled method, so the
    * surrounding operators stay inside whole-stage codegen instead of
    * falling back to interpreted expression trees). Returns null for an
    * empty shingle set. */
  def sig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val memo = PortableHash.md5Memo.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = PortableHash.md5Prefix28(memo.digest(arr.getUTF8String(i)))
      var h = 0
      while (h < k) {
        val g = (params(h)._1 * base + params(h)._2) % P
        if (g < mins(h)) mins(h) = g
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(v: Any): Any = sig(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      s"""
         |${ev.value} = $ref.sig($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Integer value of the first `nChars` hex chars of md5(s) — the
  * deterministic-draw primitive behind the md5 Poisson bootstrap, the
  * permutation test, the theta/KMV sketches and the holdout split.
  * Drop-in for the composable `conv(substring(md5(s), 1, nChars), 16,
  * 10)` chain, which per row formats a 32-char hex UTF8String, slices
  * it, and re-parses it through NumberConverter; here the digest bytes
  * feed [[PortableHash.hexPrefixVal]] directly (shared per-thread
  * digest memo — Zipf-repeated keys like user_id/l_partkey hit the
  * cache). Value is byte-identical, so every DuckDB oracle that
  * replays the conv-substring form is unaffected. nChars ≤ 15 keeps
  * the value in a non-negative long (the conv chain itself is only
  * used ≤ 12 chars). */
case class Md5HexPrefix(child: Expression, nChars: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nChars > 0 && nChars <= 15, s"nChars out of range: $nChars")

  // analysis-time type check (ADVICE r17): a non-string child fails in
  // CheckAnalysis like the conv/substring chain it replaced would, not
  // with a runtime ClassCastException mid-job (AbstractDataType is
  // private[sql] in Spark 4, so the check is direct, not ExpectsInputTypes)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireString(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hex_prefix"

  def value(s: org.apache.spark.unsafe.types.UTF8String): Long =
    PortableHash.hexPrefixVal(PortableHash.md5Memo.get().digest(s), nChars)

  override def nullSafeEval(v: Any): Any =
    value(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("md5HexPrefix", this,
        classOf[Md5HexPrefix].getName)
      s"${ev.value} = $ref.value($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5HexPrefix =
    copy(child = newChild)
}

/** The `n` md5 percent/residue draws of one key in a single tight
  * loop: element i = first-7-hex-chars value of md5(key || ":" || i)
  * mod `mod` — byte-identical to the unrolled
  * `conv(substring(md5(concat(key, ':', i)), 1, 7), 16, 10) % mod`
  * the DuckDB oracles replay. Replaces the explode(sequence(0, n-1))
  * → per-row concat → md5-hex → conv pipeline of the bootstrap /
  * permutation resamplers, which pushed n separate string-format +
  * parse chains per input row; here the key's bytes are fetched once
  * and the n digests run back-to-back on the per-thread digest with
  * precomputed ":i" suffix bytes. Consume with posexplode (pos = the
  * resample index i, col = the draw). */
case class Md5SuffixDraws(child: Expression, n: Int, mod: Int,
                          sep: String = ":")
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  require(n > 0, s"n must be positive: $n")
  require(mod > 0, s"mod must be positive: $mod")

  // analysis-time type check (ADVICE r17), matching Md5HexPrefix
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_suffix_draws"

  // sep parameterized (round 19): the CMS cell draws use "#" where the
  // bootstrap/bloom families use ":" — element i is the first-7-hex
  // value of md5(key || sep || i) mod `mod` either way
  private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(n)(i => (sep + i).getBytes("UTF-8"))

  def draws(key: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val md = PortableHash.md5.get()
    val kb = key.getBytes
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(kb)
      md.update(suffixes(i))
      out(i) = PortableHash.hexPrefixVal(md.digest(), 7) % mod
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    draws(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("md5SuffixDraws", this,
        classOf[Md5SuffixDraws].getName)
      s"${ev.value} = $ref.draws($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5SuffixDraws =
    copy(child = newChild)
}

/** Adjacent word pairs of a single-space-separated string (round 19):
  * one (a, b) struct per position — the collocation-mining fan-out —
  * in one byte-walk instead of the interpreted
  * `transform(slice(split(text, ' '), ...), (w, i) ->
  * named_struct('a', w, 'b', element_at(split(text, ' '), i + 2)))`
  * HOF chain, which re-evaluated the split inside the lambda per
  * token. Split semantics mirror Spark's `split(text, ' ')` with
  * limit -1 exactly: every single space is a boundary, consecutive
  * spaces produce empty tokens, and leading/trailing empties are KEPT.
  * n tokens → n−1 pairs; fewer than 2 tokens → empty array. */
case class WordBigramPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType, nullable = false),
    StructField("b", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_bigram_pairs"

  def pairs(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    var spaces = 0
    var i = 0
    while (i < nb) { if (b(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val toks = new Array[UTF8String](n)
    var t = 0
    var st = 0
    i = 0
    while (i <= nb) {
      if (i == nb || b(i) == ' ') {
        toks(t) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, st, i))
        t += 1
        st = i + 1
      }
      i += 1
    }
    val out = new Array[Any](n - 1)
    var k = 0
    while (k < n - 1) {
      out(k) = new GenericInternalRow(Array[Any](toks(k), toks(k + 1)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    pairs(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wordBigramPairs", this,
        classOf[WordBigramPairs].getName)
      s"${ev.value} = $ref.pairs($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordBigramPairs =
    copy(child = newChild)
}

/** Packed sign-LSH bucket keys: for each of `tables` hash tables, project
  * the integer vector onto `bitsPerTable` deterministic LCG hyperplanes
  * and pack the sign bits into a bucket id. One loop per vector instead
  * of tables×bits interpreted HOF aggregates. Returns array<long> of
  * length `tables` (index = table id). */
case class SignLshBuckets(child: Expression, tables: Int, bitsPerTable: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  /** Deterministic hyperplane weight: LCG over a wide (h, i) packing —
    * the prime stride keeps weights collision-free across hyperplanes for
    * any dimension below 1e6 (a h*64+i packing would alias hyperplane
    * h's tail with hyperplane h+1's head for vectors longer than 64). */
  private def weight(h: Int, i: Int): Long = {
    val x = (h.toLong * 1000003L + i) * 1103515245L + 12345L
    val m = x % 2147483648L
    (if (m < 0) m + 2147483648L else m) - 1073741824L
  }

  /** Per-row loop shared by interpreted eval and generated code. */
  def buckets(arr: ArrayData): ArrayData = {
    val d = arr.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val h = t * bitsPerTable + b
        var proj = 0L
        var i = 0
        while (i < d) { proj += arr.getLong(i) * weight(h, i); i += 1 }
        if (proj >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = buckets(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("signLsh", this, classOf[SignLshBuckets].getName)
      s"${ev.value} = $ref.buckets($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}

/** 64-bit SimHash of single-space-separated text in one pass: the token
  * hash is the big-endian long of the first 8 md5 digest bytes (= the
  * first 16 hex chars of `md5(token)`), each hash bit votes ±1
  * (term-frequency weighted), sign of the vote sum becomes the
  * fingerprint bit (votes ≥ 0 ⇒ bit set).
  *
  * Replaces an explode(tokens) + 64 × sum(when(...)) aggregation — a
  * shuffle of |tokens| rows with 64 aggregate buffers per doc — with a
  * narrow per-row loop. The md5 token hash (round 7, was FNV-1a) is the
  * portability contract: the DuckDB oracle reassembles the identical
  * fingerprint from `md5(token)` hex halves — see [[PortableHash]] and
  * the generated SQL in SparkEntry.
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private val space = UTF8String.fromString(" ")

  /** Per-row loop shared by interpreted eval and generated code (one
    * compiled call per row keeps whole-stage codegen alive). */
  def hash(s: UTF8String): Long = {
    val toks = s.split(space, -1)
    val memo = PortableHash.md5Memo.get()
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val d = memo.digest(toks(t))
      // big-endian: bit 63 of h = MSB of digest byte 0 = first hex digit
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) >= 0) fp |= (1L << b); b += 1 }
    fp
  }

  override def nullSafeEval(v: Any): Any = hash(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
      s"${ev.value} = $ref.hash($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Unicode NFC normalization (UAX #15 canonical composition) via
  * `java.text.Normalizer` — the normalization pass a text-dedup pipeline
  * runs BEFORE fingerprinting: composed vs decomposed accents ("é" as
  * U+00E9 vs e + U+0301) must hash identically or every decomposed twin
  * escapes exact dedup. Spark has no builtin for this; DuckDB's
  * `nfc_normalize` implements the same standard, so the composed
  * normalize→lower→collapse pipeline stays oracle-checkable. NFC is
  * idempotent, so re-normalizing already-clean text is a no-op (the
  * fast path: the JDK checks `isNormalized` internally). */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  /** Per-row normalize shared by interpreted eval and generated code. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = normalize(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("nfcNorm", this, classOf[NfcNormalize].getName)
      s"${ev.value} = $ref.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Per-marker-list token hit counts in ONE tokenize pass: tokens of the
  * single-space-separated text are looked up in a prebuilt token →
  * list-indices map, each hit incrementing its lists' counters. Returns
  * array<long> of length `markers.size` (index = marker-list position).
  *
  * Replaces langId's five interpreted `size(filter(tokens, t IN (...)))`
  * HOF chains (one tokenize + one lambda frame per token PER LANGUAGE)
  * with a single loop — same counts, so the DuckDB oracle is unaffected.
  */
case class MarkerCounts(child: Expression, markers: Seq[Seq[String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "marker_counts"

  private val space = UTF8String.fromString(" ")

  // token → indices of the marker lists containing it (a token may
  // legitimately appear in several lists)
  private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    markers.zipWithIndex.foreach { case (words, idx) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(idx) else prev :+ idx)
      }
    }
    m
  }

  /** Per-row loop shared by interpreted eval and generated code. */
  def counts(s: UTF8String): ArrayData = {
    val toks = s.split(space, -1)
    val counts = new Array[Long](markers.size)
    var i = 0
    while (i < toks.length) {
      val hit = lookup.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(v: Any): Any = counts(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("markerCounts", this, classOf[MarkerCounts].getName)
      s"${ev.value} = $ref.counts($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** Most-frequent-token count of single-space-separated text in ONE
  * hash-count pass — the hot scalar of the Gopher-style repetition gate
  * (TextAnalysis.topTokenCntExpr). Replaces an interpreted array_sort +
  * aggregate-HOF chain (O(n log n) plus a per-element Catalyst
  * interpreter walk over a 3-field struct) with an O(n) tight loop over
  * UTF8String tokens. Identical semantics: the longest run in the
  * sorted token array IS the max token multiplicity — including the
  * empty-string token an empty text tokenizes to (count 1 both ways).
  */
case class TopTokenCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = LongType
  override def prettyName: String = "top_token_count"

  private val space = UTF8String.fromString(" ")

  /** Per-row loop shared by interpreted eval and generated code. */
  def topCount(s: UTF8String): Long = {
    val toks = s.split(space, -1)
    val m = new java.util.HashMap[UTF8String, Array[Long]](toks.length * 2)
    var best = 0L
    var i = 0
    while (i < toks.length) {
      var c = m.get(toks(i))
      if (c == null) { c = Array(0L); m.put(toks(i), c) }
      c(0) += 1L
      if (c(0) > best) best = c(0)
      i += 1
    }
    best
  }

  override def nullSafeEval(v: Any): Any = topCount(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("topTokenCount", this, classOf[TopTokenCount].getName)
      s"${ev.value} = $ref.topCount($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Winnowing fingerprint selection in one pass (the hot loop behind
  * TextAnalysis.winnowFingerprints): normalize (lower/trim/collapse
  * spaces), hash every ordered word k-gram (first 4 md5 bytes as 8 hex
  * chars — identical to `substring(md5(gram), 1, 8)`), slide a w-window
  * and keep each window's LEXICOGRAPHIC minimum; returns the distinct
  * minima sorted. Replaces a transform/slice/array_min HOF chain that
  * was interpreted per element and dominated the query (7.3 s → the
  * expression's single JVM loop per doc); the md5-prefix/string-min
  * contract is unchanged, so the DuckDB oracle still verifies it. */
/** Hashed-n-gram linear quality score (round 10) — the whole
  * TextAnalysis.qualityModel feature pipeline as ONE per-row pass:
  * normalize (lower/trim/collapse — the WinnowFps contract), emit word
  * unigrams + adjacent bigrams, hash each feature through the shared
  * [[PortableHash.md5Memo]] (first 7 hex chars = first 28 digest bits),
  * bucket mod `buckets`, and accumulate the fixed integer weight table
  * w(b) = (b·2654435761) mod 2003 − 1001. Returns [n_features, score]
  * as exact longs — byte-identical to the explode → conv(md5) → groupBy
  * relational form it replaces (measured 7× slower at sf0.1: one
  * interpreted conv+substring+md5 chain per feature OCCURRENCE plus a
  * corpus-sized shuffle; here the md5 memo pays each distinct feature
  * once per thread and the scan stays narrow). */
case class QmScore(child: Expression, buckets: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(buckets >= 1, s"need buckets >= 1, got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qm_score"

  /** Per-row loop shared by interpreted eval and generated code. */
  def score(u: UTF8String): ArrayData = {
    val norm = u.toLowerCase.trim().toString
    val toks = norm.split(" +").filter(_.nonEmpty)
    val memo = PortableHash.md5Memo.get()
    var n = 0L
    var sc = 0L
    def add(s: String): Unit = {
      val d = memo.digest(UTF8String.fromString(s))
      // first 7 hex chars of the digest = bytes 0..2 + the high nibble
      // of byte 3, most-significant first (what CAST('0x'||substr(md5,
      // 1,7)) parses oracle-side)
      val h = ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
        ((d(2) & 0xFFL) << 4) | ((d(3) & 0xF0L) >> 4)
      sc += (h % buckets) * 2654435761L % 2003L - 1001L
      n += 1
    }
    var i = 0
    while (i < toks.length) { add(toks(i)); i += 1 }
    i = 0
    while (i < toks.length - 1) { add(toks(i) + " " + toks(i + 1)); i += 1 }
    new GenericArrayData(Array(n, sc))
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("qmScore", this, classOf[QmScore].getName)
      s"${ev.value} = $ref.score($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): QmScore =
    copy(child = newChild)
}

case class WinnowFps(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Per-row loop shared by interpreted eval and generated code. */
  def fingerprints(u: UTF8String): ArrayData = {
    // same normalization as regexp_replace(trim(lower(text)), " +", " "):
    // UTF8String.toLowerCase is what Spark's lower() uses
    val norm = u.toLowerCase.trim().toString
    val toks = norm.split(" +")
    val m = toks.length - k + 1
    val nw = m - w + 1
    if (nw <= 0) return new GenericArrayData(Array.empty[Any])
    val memo = PortableHash.md5Memo.get()
    val hashes = new Array[String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val d = memo.digest(UTF8String.fromString(sb.toString))
      // first 4 digest bytes = first 8 lowercase hex chars of md5
      val h = new Array[Char](8)
      var b = 0
      while (b < 4) {
        h(2 * b) = hexDigits((d(b) >> 4) & 0xf)
        h(2 * b + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      hashes(i) = new String(h)
      i += 1
    }
    val sel = new java.util.TreeSet[String]()
    var j = 0
    while (j < nw) {
      var mn = hashes(j)
      var x = j + 1
      while (x < j + w) {
        if (hashes(x).compareTo(mn) < 0) mn = hashes(x)
        x += 1
      }
      sel.add(mn)
      j += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    fingerprints(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
      s"${ev.value} = $ref.fingerprints($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** The character bigrams of a string in position order (round 19) — one
  * tight byte-walk instead of the interpreted
  * `transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))` HOF
  * chain the LM quality filters (`text_lm_perplexity`,
  * `text_lm_kneser_ney`) evaluated per character of the corpus.
  * Value-identical ON THE OPERATOR DOMAIN (length ≥ 2, the filter both
  * LM keys apply before the explode): SQL substring semantics are
  * code-point based, and the walk slices at UTF-8 char boundaries, so
  * every DuckDB oracle replaying the substring form is unaffected.
  * Below 2 chars the HOF's sequence(1, len-1) degenerates to a
  * DESCENDING sequence ([1, 0] → two copies of the whole string) —
  * an artifact the operators never evaluate; this form returns the
  * sane empty array there. */
case class CharBigrams(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigrams"

  def bigrams(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    // char-start byte offsets (one extra slot for the end sentinel)
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      c += 1
    }
    offs(c) = nb
    val nBg = math.max(c - 1, 0)
    val out = new Array[Any](nBg)
    var k = 0
    while (k < nBg) {
      out(k) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, offs(k), offs(math.min(k + 2, c))))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    bigrams(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("charBigrams", this,
        classOf[CharBigrams].getName)
      s"${ev.value} = $ref.bigrams($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

/** Upper-triangle outer products of a quantized vector (round 19): one
  * (d1, d2, xy = q[d1]·q[d2]) struct per pair d1 ≤ d2, ordered by
  * (d1, d2) — one JVM loop instead of the nested-transform HOF
  * `flatten(transform(q, (xi, i) -> transform(slice(q, i + 1, ...), ...)))`
  * that `embed_covariance` evaluated interpreted (d(d+1)/2 lambda frames
  * per row). Value- and type-identical to the HOF form (d1/d2 are the
  * INT lambda indices, xy the exact long product), so the DuckDB oracle
  * replaying the list_transform form is unaffected. Elements are
  * assumed non-null (the ×1000 quantization never produces null
  * elements from a non-null vector). */
case class TriUpperProducts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftExprChecks.requireLongArray(prettyName, child, child)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d1", IntegerType, nullable = false),
    StructField("d2", IntegerType, nullable = false),
    StructField("xy", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "tri_upper_products"

  def tri(arr: ArrayData): ArrayData = {
    val d = arr.numElements()
    val vals = new Array[Long](d)
    var i = 0
    while (i < d) { vals(i) = arr.getLong(i); i += 1 }
    val out = new Array[Any](d * (d + 1) / 2)
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = new GenericInternalRow(
          Array[Any](i, j, vals(i) * vals(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = tri(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("triUpperProducts", this,
        classOf[TriUpperProducts].getName)
      s"${ev.value} = $ref.tri($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TriUpperProducts =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[LongArrayDot]]. */
  def longArrayDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[LongArrayAgree]]. */
  def longArrayAgree(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayAgree(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[WordShingles]]. */
  def wordShingles(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), n))

  /** Column API for [[MinHashSig]]. */
  def minHashSig(shingleSet: Column, k: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingleSet), k))

  /** Column API for [[SimHash64]]. */
  def simHash64(text: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(text)))

  /** Column API for [[NfcNormalize]]. */
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(text)))

  /** Column API for [[SignLshBuckets]]. */
  def signLshBuckets(qv: Column, tables: Int, bitsPerTable: Int): Column =
    GraftColumnBridge.column(SignLshBuckets(
      GraftColumnBridge.expression(qv), tables, bitsPerTable))

  /** Column API for [[MarkerCounts]]. */
  def markerCounts(text: Column, markers: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(MarkerCounts(
      GraftColumnBridge.expression(text), markers))

  /** Column API for [[TopTokenCount]]. */
  def topTokenCount(text: Column): Column =
    GraftColumnBridge.column(TopTokenCount(GraftColumnBridge.expression(text)))

  /** Column API for [[WinnowFps]]. */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowFps(GraftColumnBridge.expression(text), k, w))

  /** Column API for [[QmScore]]. */
  def qmScore(text: Column, buckets: Long): Column =
    GraftColumnBridge.column(QmScore(GraftColumnBridge.expression(text), buckets))

  /** Column API for [[Md5HexPrefix]]. */
  def md5HexPrefix(s: Column, nChars: Int): Column =
    GraftColumnBridge.column(Md5HexPrefix(
      GraftColumnBridge.expression(s), nChars))

  /** Column API for [[Md5SuffixDraws]]. */
  def md5SuffixDraws(key: Column, n: Int, mod: Int,
                     sep: String = ":"): Column =
    GraftColumnBridge.column(Md5SuffixDraws(
      GraftColumnBridge.expression(key), n, mod, sep))

  /** Column API for [[WordBigramPairs]]. */
  def wordBigramPairs(text: Column): Column =
    GraftColumnBridge.column(WordBigramPairs(
      GraftColumnBridge.expression(text)))

  /** Column API for [[CharBigrams]]. */
  def charBigrams(text: Column): Column =
    GraftColumnBridge.column(CharBigrams(GraftColumnBridge.expression(text)))

  /** Column API for [[TriUpperProducts]]. */
  def triUpperProducts(q: Column): Column =
    GraftColumnBridge.column(TriUpperProducts(GraftColumnBridge.expression(q)))
}

/** Shared analysis-time input checks for the native expressions
  * (ADVICE r17): Spark 4's AbstractDataType/ExpectsInputTypes are
  * private[sql], so expressions outside that package implement
  * checkInputDataTypes() via these helpers instead. */
private[graft] object GraftExprChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def requireString(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires a string child, got ${other.catalogString}")
    }

  /** Both children must be array<bigint> (ADVICE r18): ArrayData.getLong
    * on an int-packed array misreads silently, so a long_array_agree /
    * long_array_dot call over array<int> must fail analysis, not return
    * wrong counts. NullType elements (the empty `array()` literal) are
    * admitted — a zero-length array has no elements to misread. */
  def requireLongArray(name: String, left: Expression,
                       right: Expression): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case ArrayType(NullType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint> children, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}
