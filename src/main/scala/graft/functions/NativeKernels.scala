package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Hot-loop kernels shared by the interpreted (`nullSafeEval`) and
  * generated-code (`doGenCode`) paths of graft's Catalyst expressions.
  *
  * Scala object methods get static forwarders, so whole-stage-generated Java
  * calls `graft.functions.NativeKernels.vecDot(a, b)` directly — the
  * expressions stay inside the codegen'd stage (no per-row fallback through
  * an interpreted Expression reference).
  */
object NativeKernels {

  /** 64-bit hash of a UTF8String (two murmur3 passes with different seeds
    * combined — stable across JVMs, operates directly on the string's bytes).
    */
  def hash64(s: UTF8String): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  /** 32-bit Hilbert curve index of (x, y) over the 16-bit-per-dimension
    * grid — the classic iterative xy→d conversion (Gray-code quadrant +
    * rotate). Hilbert is strictly continuous where Morton jumps: every
    * two consecutive indexes are grid NEIGHBORS, so equal-count curve
    * segments (files) have tighter (x, y) bounding boxes than Morton's on
    * the same data — fewer file opens for the same 2-D box predicate.
    * A 16-step loop with data-dependent rotations has no bounded Catalyst
    * column form (unrolling squares the expression tree per step), which
    * is why this is a native kernel behind a codegen expression, not
    * column arithmetic like [[graft.operators.Layout.morton16]].
    * Coordinates are masked to 16 bits, mirroring morton16.
    */
  def hilbert16(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve enters/exits correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** 63-bit Hilbert curve index of (x, y, z) over the 21-bit-per-dimension
    * grid — the 3-D analog of [[hilbert16]] and the locality-tighter twin
    * of [[graft.operators.Layout.morton21]]. Uses the classic
    * transpose-form conversion (Skilling, "Programming the Hilbert
    * curve", AIP Conf. Proc. 707, 2004 — the standard public n-D
    * formulation): fold the axes into the "transposed" Hilbert
    * representation (inverse-undo + Gray encode), then interleave the
    * transposed words MSB-first into one index. Like the 2-D kernel, the
    * data-dependent exchange/invert loop has no bounded Catalyst column
    * form, so it runs as a native kernel behind a codegen expression.
    * Coordinates are masked to 21 bits, mirroring morton21 (values up to
    * 2,097,151 per dimension; 63 bits total — the full non-negative
    * long range).
    */
  def hilbert21(x0: Long, y0: Long, z0: Long): Long = {
    val b = 21
    var xa = x0 & 0x1FFFFFL
    var xb = y0 & 0x1FFFFFL
    var xc = z0 & 0x1FFFFFL
    // axes -> transpose: inverse undo (high bit to low), then Gray encode
    var q = 1L << (b - 1)
    while (q > 1) {
      val p = q - 1
      if ((xa & q) != 0) xa ^= p // i = 0: the exchange branch is a no-op
      if ((xb & q) != 0) xa ^= p
      else { val t = (xa ^ xb) & p; xa ^= t; xb ^= t }
      if ((xc & q) != 0) xa ^= p
      else { val t = (xa ^ xc) & p; xa ^= t; xc ^= t }
      q >>= 1
    }
    xb ^= xa
    xc ^= xb
    var t2 = 0L
    q = 1L << (b - 1)
    while (q > 1) {
      if ((xc & q) != 0) t2 ^= q - 1
      q >>= 1
    }
    xa ^= t2; xb ^= t2; xc ^= t2
    // interleave the transposed words MSB-first: bit j of word i lands at
    // index bit 3j + (2 - i)
    var d = 0L
    var j = b - 1
    while (j >= 0) {
      d = (d << 1) | ((xa >>> j) & 1L)
      d = (d << 1) | ((xb >>> j) & 1L)
      d = (d << 1) | ((xc >>> j) & 1L)
      j -= 1
    }
    d
  }

  /** SplitMix64 finalizer — cheap, well-mixed 64-bit hash of a long. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def simhash64(arr: ArrayData): Long = {
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
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
    out
  }

  def minhashSig(arr: ArrayData, mults: Array[Long], offs: Array[Long]): ArrayData = {
    val k = mults.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
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

  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val space = UTF8String.fromString(" ")
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

  def winnowFingerprint(input: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = input.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    // polynomial rolling hash with 64-bit wraparound:
    // h_{i+1} = (h_i - b_i*B^(k-1))*B + b_{i+k}
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

  /** Sorted centroid-similarity scores for one normed vector: cosine vs
    * every centroid as (sim, bucket) structs ordered by (sim desc, bucket
    * desc) — byte-equal to the expression-forest form
    * `sort_array(array(struct(vec_dot(v, c_i) / (n * n_i), i)...), desc)`
    * it replaces (same add order in the dot product, same
    * Divide(dot, Multiply(n, cn)) float shape, same NaN-largest /
    * -0.0 < 0.0 comparator as Spark's struct ordering), so IVF bucket
    * assignments and probe lists are unchanged. One fused loop + one
    * O(nc log nc) index sort per row, vs nc struct constructions + a
    * comparator chain inside a single giant codegen method whose janino
    * compile dominated the ANN family's fixed cost at nc ≈ sqrt(n)
    * (measured: nc=45 codegen'd ran SLOWER than nc=90 with codegen
    * disabled — see SCALE.md similarity notes).
    *
    * `cents` is the flattened nc×d centroid matrix, `cnorms` the nc norms.
    */
  def centroidScores(v: ArrayData, n: Double, cents: Array[Double],
      cnorms: Array[Double], d: Int): ArrayData = {
    val nc = cnorms.length
    val sims = new Array[Double](nc)
    var i = 0
    while (i < nc) {
      var acc = 0.0
      val off = i * d
      var j = 0
      while (j < d) { acc += v.getDouble(j) * cents(off + j); j += 1 }
      sims(i) = acc / (n * cnorms(i))
      i += 1
    }
    val idx = new Array[Integer](nc)
    i = 0
    while (i < nc) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val x = sims(a.intValue()); val y = sims(b.intValue())
        // Spark's nan-safe double ordering (NaN largest), reversed for desc;
        // bucket desc breaks exact-sim ties like the struct comparator did.
        val c =
          if (x.isNaN && y.isNaN) 0
          else if (x.isNaN) -1
          else if (y.isNaN) 1
          else java.lang.Double.compare(y, x)
        if (c != 0) c else Integer.compare(b.intValue(), a.intValue())
      }
    })
    val out = new Array[Any](nc)
    i = 0
    while (i < nc) {
      val b = idx(i).intValue()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sims(b), b))
      i += 1
    }
    new GenericArrayData(out)
  }

  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** PQ asymmetric-distance score: `lut` is the query's flattened
    * m×ksub table of subspace dot products, `codes` a vector's m PQ codes;
    * the approximate inner product is Σ_j lut[j·ksub + codes[j]] — m array
    * reads and adds per candidate, no vector arithmetic at all.
    */
  def pqScore(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    var acc = 0.0
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      acc += lut.getDouble(j * ksub + codes.getInt(j))
      j += 1
    }
    acc
  }

  /** PQ encoding: nearest codebook entry (L2) per subspace of `v/n`.
    * `cb` is the flattened codebook, cb[(j·ksub + k)·sub + i]; one fused
    * loop replaces m·ksub interpreted struct+sort expressions per row.
    */
  def pqEncode(v: ArrayData, n: Double, cb: Array[Double], m: Int,
      ksub: Int, sub: Int): ArrayData = {
    val codes = new Array[Any](m)
    val inv = 1.0 / n
    val x = new Array[Double](sub) // normalized subvector, hoisted per j
    var j = 0
    while (j < m) {
      var i = 0
      while (i < sub) { x(i) = v.getDouble(j * sub + i) * inv; i += 1 }
      var best = 0; var bd = Double.MaxValue; var kk = 0
      while (kk < ksub) {
        var d = 0.0
        val base = (j * ksub + kk) * sub
        i = 0
        while (i < sub) {
          val t = x(i) - cb(base + i)
          d += t * t; i += 1
        }
        if (d < bd) { bd = d; best = kk }
        kk += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** PQ lookup table for a query `v/n`: flattened m×ksub subspace dot
    * products against the codebook (layout matches [[pqScore]]).
    */
  def pqLut(v: ArrayData, n: Double, cb: Array[Double], m: Int,
      ksub: Int, sub: Int): ArrayData = {
    val lut = new Array[Any](m * ksub)
    val inv = 1.0 / n
    val x = new Array[Double](sub) // normalized subvector, hoisted per j
    var j = 0
    while (j < m) {
      var i = 0
      while (i < sub) { x(i) = v.getDouble(j * sub + i) * inv; i += 1 }
      var kk = 0
      while (kk < ksub) {
        var acc = 0.0
        val base = (j * ksub + kk) * sub
        i = 0
        while (i < sub) { acc += x(i) * cb(base + i); i += 1 }
        lut(j * ksub + kk) = acc
        kk += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }
}
