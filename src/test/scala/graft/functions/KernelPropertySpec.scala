package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native kernels (pure JVM — no SparkSession), so
  * invariants hold on generated inputs, not just the fixtures. Uses
  * ScalaCheck generators sampled under fixed seeds (the scalatest-scalacheck
  * bridge artifact is not on the offline classpath).
  */
class KernelPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val tokens: Gen[List[String]] = Gen.listOf(token)

  private def arr(ts: Seq[String]) =
    new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])

  test("minhashSig: adding a token never raises any slot minimum") {
    val mults = Array.tabulate(16)(i => NativeKernels.splitmix64(2L * i + 1L) | 1L)
    val offs = Array.tabulate(16)(i => NativeKernels.splitmix64(2L * i + 2L))
    samples(Gen.zip(tokens, token), 200).foreach { case (ts, extra) =>
      val base = NativeKernels.minhashSig(arr(ts), mults, offs)
      val more = NativeKernels.minhashSig(arr(ts :+ extra), mults, offs)
      (0 until 16).foreach { j =>
        assert(more.getLong(j) <= base.getLong(j), s"ts=$ts extra=$extra")
      }
    }
  }

  test("minhashSig is order- and duplicate-invariant (set semantics)") {
    val mults = Array.tabulate(8)(i => NativeKernels.splitmix64(2L * i + 1L) | 1L)
    val offs = Array.tabulate(8)(i => NativeKernels.splitmix64(2L * i + 2L))
    samples(tokens, 200).filter(_.nonEmpty).foreach { ts =>
      val shuffled = new scala.util.Random(7).shuffle(ts) ++ ts
      val a = NativeKernels.minhashSig(arr(ts), mults, offs)
      val b = NativeKernels.minhashSig(arr(shuffled), mults, offs)
      (0 until 8).foreach(j => assert(a.getLong(j) === b.getLong(j), s"ts=$ts"))
    }
  }

  test("wordShingles: count ≤ max(m-n+1, 1); shingles have ≤ n tokens") {
    samples(Gen.zip(tokens, Gen.choose(2, 5)), 200).foreach { case (ts, n) =>
      val out = NativeKernels.wordShingles(arr(ts), n)
      val m = ts.length
      assert(out.numElements() <= math.max(m - n + 1, 1), s"ts=$ts n=$n")
      (0 until out.numElements()).foreach { i =>
        val parts = out.getUTF8String(i).toString.split(" ", -1)
        assert(parts.length <= n, s"ts=$ts n=$n")
      }
    }
  }

  test("simhash64: order-invariant over token multisets") {
    samples(tokens, 200).foreach { ts =>
      val a = NativeKernels.simhash64(arr(ts))
      val b = NativeKernels.simhash64(arr(new scala.util.Random(3).shuffle(ts)))
      assert(a === b, s"ts=$ts")
    }
  }

  test("vecDot: symmetric; self-dot non-negative") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))
    samples(Gen.zip(vec, vec), 200).foreach { case (x, y) =>
      val xa = new GenericArrayData(x.toArray[Any])
      val ya = new GenericArrayData(y.toArray[Any])
      assert(NativeKernels.vecDot(xa, ya) === NativeKernels.vecDot(ya, xa))
      assert(NativeKernels.vecDot(xa, xa) >= 0.0)
    }
  }

  test("pqScore equals the naive lookup sum; encode picks the argmin code") {
    val vec: Gen[List[Double]] =
      Gen.listOfN(8, Gen.choose(-1.0, 1.0))
    val m = 4; val ksub = 4; val sub = 2
    samples(Gen.zip(vec, Gen.listOfN(m * ksub * sub, Gen.choose(-1.0, 1.0))),
      200).foreach { case (v, cbList) =>
      val cb = cbList.toArray
      val va = new GenericArrayData(v.toArray[Any])
      val n = math.max(math.sqrt(v.map(x => x * x).sum), 1e-12)
      val codes = NativeKernels.pqEncode(va, n, cb, m, ksub, sub)
      val lut = NativeKernels.pqLut(va, n, cb, m, ksub, sub)
      (0 until m).foreach { j =>
        val c = codes.getInt(j)
        assert(c >= 0 && c < ksub)
        // argmin property: the chosen code's L2 distance is minimal
        def dist(k: Int): Double = (0 until sub).map { i =>
          val t = v(j * sub + i) / n - cb((j * ksub + k) * sub + i)
          t * t
        }.sum
        (0 until ksub).foreach(k =>
          assert(dist(c) <= dist(k) + 1e-12, s"j=$j c=$c k=$k"))
      }
      // score = sum of looked-up cells, exactly
      val naive = (0 until m).map(j => lut.getDouble(j * ksub + codes.getInt(j))).sum
      assert(NativeKernels.pqScore(lut, codes, ksub) === naive)
    }
  }

  test("winnowFingerprint: a shared long substring implies shared hashes") {
    val text = Gen.listOfN(32, Gen.alphaNumChar).map(_.mkString)
    val prefix = Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    samples(Gen.zip(text, prefix), 200).foreach { case (core, pre) =>
      val a = NativeKernels.winnowFingerprint(UTF8String.fromString(core), 8, 4)
      val b = NativeKernels.winnowFingerprint(
        UTF8String.fromString(pre + core), 8, 4)
      val as = (0 until a.numElements()).map(a.getLong).toSet
      val bs = (0 until b.numElements()).map(b.getLong).toSet
      assert(as.intersect(bs).nonEmpty, s"core=$core pre=$pre")
    }
  }
}
