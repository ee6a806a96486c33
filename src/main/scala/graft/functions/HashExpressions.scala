package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

/** Registration + shared hashing for graft's native expressions. */
object HashExpressions {

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
  }
}
