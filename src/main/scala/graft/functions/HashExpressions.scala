package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (near-duplicate fingerprinting).
  *
  * For each of 64 bit positions, tokens vote +1/-1 according to the bit of
  * their 64-bit hash; the fingerprint sets bits with a positive tally. Two
  * documents' fingerprints differ in few bits iff their token multisets are
  * similar, so Hamming distance on the result is a near-dup measure that
  * needs only a 4×16-bit band self-join at scale (no n² pairs).
  *
  * Implemented as a native Catalyst Expression rather than a Scala UDF so the
  * per-token loop runs over UTF8String bytes with no row boxing/decoding.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = HashExpressions.hash64(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken-style): hash
  * every `k`-byte gram of the input with a polynomial rolling hash, then keep
  * the minimum hash of each `w`-gram window, deduplicated and sorted. The
  * selected hashes form a compact, position-robust fingerprint: documents
  * sharing long substrings share fingerprint hashes.
  *
  * Returns array<bigint>; empty array for inputs shorter than `k` bytes.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires string, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    // polynomial rolling hash with 64-bit wraparound: h_i+1 = (h_i - b_i*B^(k-1))*B + b_i+k
    val B = 1000003L
    var pow = 1L
    var j = 1
    while (j < k) { pow *= B; j += 1 }
    val grams = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xff); i += 1 }
    grams(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * B + (bytes(i + k - 1) & 0xff)
      grams(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    val lastStart = math.max(n - w, 0)
    while (start <= lastStart) {
      var m = grams(start)
      var jj = start + 1
      val end = math.min(start + w, n)
      while (jj < end) { if (grams(jj) < m) m = grams(jj); jj += 1 }
      selected.add(m)
      start += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}

/** Distinct word n-gram shingles of a token array: "w1 w2 w3" strings for
  * each sliding window of `n` tokens; inputs shorter than `n` yield one
  * shingle joining all tokens (matching the non-ANSI `concat_ws` +
  * out-of-range `element_at` composition it replaces). First-occurrence
  * order is preserved.
  *
  * Native because the HOF formulation (transform(sequence(...), i ->
  * concat_ws(' ', element_at(ws, i)...))) is interpreted, and Catalyst's
  * project-collapsing can re-inline the tokenizing `split` into every lambda
  * element — re-splitting the document once per shingle term (O(tokens²)
  * regex work observed at sf0.1).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (m < n) {
      val parts = new Array[UTF8String](m)
      var i = 0
      while (i < m) { parts(i) = arr.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(space, parts: _*))
    } else {
      var i = 0
      val parts = new Array[UTF8String](n)
      while (i <= m - n) {
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    }
    val res = new Array[Any](out.size())
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { res(o) = it.next(); o += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** MinHash signature: for each of `k` hash functions, the minimum hash over
  * the token array. One pass per row: each token is base-hashed once, then
  * `k` affine variants (odd multiplier + offset, SplitMix64-derived) update
  * the running minima — O(|tokens|·k) long ops, no per-hash array
  * materialization. The interpreted-HOF formulation of the same thing
  * (transform(sequence(0,k-1), i -> array_min(transform(tokens, t ->
  * xxhash64(t, i))))) costs two lambda dispatches and a k-element array per
  * token and measured ~100× slower at sf0.1.
  *
  * Signature values only need to be a consistent hash family — near-dup
  * recovery is verified against exact Jaccard in the spec suite.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  // Deterministic per-slot multipliers/offsets (SplitMix64 of the slot index;
  // multiplier forced odd so it is a bijection on Z/2^64).
  private lazy val mults: Array[Long] =
    Array.tabulate(k)(i => HashExpressions.splitmix64(2L * i + 1L) | 1L)
  private lazy val offs: Array[Long] =
    Array.tabulate(k)(i => HashExpressions.splitmix64(2L * i + 2L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = HashExpressions.hash64(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = mults(j) * h + offs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Dot product of two double arrays — the inner loop of every cosine /
  * distance computation in the similarity family. Native because the
  * functional formulation (aggregate(zip_with(a, b, *), 0.0, +)) allocates a
  * zipped array and dispatches two interpreted lambdas per element; this is
  * a single fused loop over the unsafe array data.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
}

/** Registration + shared hashing for graft's native expressions. */
object HashExpressions {

  /** SplitMix64 finalizer — cheap, well-mixed 64-bit hash of a long. */
  private[functions] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of a UTF8String (two murmur3 passes with different seeds
    * combined — stable across JVMs, operates directly on the string's bytes).
    */
  private[functions] def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** Register SQL-callable forms: simhash64(arr), winnow_fingerprint(str,k,w).
    * Idempotent; call once per session before using `expr`/`call_function`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      exprs => {
        def intArg(e: Expression): Int =
          e.eval(InternalRow.empty).asInstanceOf[Number].intValue
        WinnowFingerprint(exprs.head, intArg(exprs(1)), intArg(exprs(2)))
      }, "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue),
      "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval(InternalRow.empty).asInstanceOf[Number].intValue),
      "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs.head, exprs(1)), "built-in")
  }
}
