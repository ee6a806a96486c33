package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("word_shingles: sliding n-grams, distinct, short-input join-all") {
    HashExpressions.register(spark)
    val got = Seq(
      ("a b c d", 0), ("a b", 1), ("x", 2), ("a b a b a b", 3))
      .toDF("text", "k")
      .select(col("k"), expr("word_shingles(split(text, ' '), 3)").as("sh"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a b"))
    assert(got(2) === Seq("x"))
    // duplicates collapse, first occurrence order kept
    assert(got(3) === Seq("a b a", "b a b"))
  }

  test("minhash_sig: k values, deterministic, permutation-invariant-ish") {
    HashExpressions.register(spark)
    val df = Seq(
      ("same", Seq("a", "b", "c")),
      ("same2", Seq("c", "b", "a")),   // same set, different order
      ("other", Seq("x", "y", "z"))
    ).toDF("id", "toks")
      .select(col("id"), expr("minhash_sig(toks, 16)").as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(df("same").length === 16)
    // min over a set is order-invariant
    assert(df("same") === df("same2"))
    assert(df("same") !== df("other"))
  }

  test("native word_shingles matches the HOF reference implementation") {
    HashExpressions.register(spark)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "one", "x y z x y z x y z", "  spaced   out   tokens  ")
      .toDF("text")
      .select(split(trim(lower(col("text"))), "\\s+").as("ws"))
    val native = texts.select(expr("word_shingles(ws, 3)"))
      .as[Seq[String]].collect()
    val reference = texts
      .select(graft.operators.Dedup.shinglesFromTokens(col("ws"), 3))
      .as[Seq[String]].collect()
    native.zip(reference).foreach { case (n, r) => assert(n === r) }
  }

  test("ngram_gen: one row per window, position-tagged, edge cases empty") {
    HashExpressions.register(spark)
    val rows = Seq(
      (0, "a b c d"), (1, "a b"), (2, "x"), (3, ""))
      .toDF("id", "text")
      .select(col("id"),
        expr("ngram_gen(split(trim(text), '\\\\s+'), 2)"))
      .as[(Int, Int, String)].collect().toSeq.sorted
    assert(rows.filter(_._1 == 0) ===
      Seq((0, 0, "a b"), (0, 1, "b c"), (0, 2, "c d")))
    assert(rows.filter(_._1 == 1) === Seq((1, 0, "a b")))
    // shorter than the window → zero rows, not null rows
    assert(!rows.exists(_._1 == 2))
    // split('') yields [""] — a single sub-window token, still no bigram
    assert(!rows.exists(_._1 == 3))
    // generator output matches the explode(transform(sequence)) formulation
    val hof = Seq("the quick brown fox the quick").toDF("text")
      .select(expr(
        """explode(transform(sequence(0, size(split(text,' ')) - 2),
          |  i -> struct(i AS pos,
          |    concat_ws(' ', split(text,' ')[i], split(text,' ')[i+1]) AS ngram)))
          |""".stripMargin))
      .select("col.pos", "col.ngram").as[(Int, String)].collect().toSeq
    val native = Seq("the quick brown fox the quick").toDF("text")
      .select(expr("ngram_gen(split(text, ' '), 2)"))
      .as[(Int, String)].collect().toSeq
    assert(native === hof)
  }

  test("GraftExtensions registers SQL functions via spark.sql.extensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // Reuses the already-running SparkContext; only the session (and its
      // injected functions) is new. withExtensions is the builder-level
      // route; spark.sql.extensions=graft.functions.GraftExtensions is the
      // equivalent static conf on a fresh JVM (it is read at SparkContext
      // creation, so it can't be exercised from this shared-context suite).
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = s2.sql(
        """SELECT simhash64(array('a','b')) AS h,
          |  size(minhash_sig(array('a'), 8)) AS k,
          |  word_shingles(array('a','b','c'), 2) AS sh,
          |  size(winnow_fingerprint('abcdefghijklmnop', 4, 3)) AS w
          |""".stripMargin).head()
      assert(row.getAs[Long]("h") !== 0L)
      assert(row.getAs[Int]("k") === 8)
      assert(row.getAs[Seq[String]]("sh") === Seq("a b", "b c"))
      assert(row.getAs[Int]("w") > 0)
      assert(s2.sql("SELECT ngram_gen(array('a','b','c'), 2)").count() === 2L)
      // the planner strategy for the native as-of join rides along
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.AsOfJoinStrategy))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("TempFnNames: per-object reuse, per-prefix separation, no collision") {
    val a = new Array[Double](4)
    val b = new Array[Double](4)
    val n1 = TempFnNames.nameFor(a, "p")
    assert(TempFnNames.nameFor(a, "p") == n1,
      "same object + prefix must reuse its binding (registry must not grow per call)")
    assert(TempFnNames.nameFor(b, "p") != n1,
      "distinct (value-equal) arrays must never share a binding")
    val n2 = TempFnNames.nameFor(a, "q")
    assert(n2 != n1 && TempFnNames.nameFor(a, "q") == n2,
      "one object may carry one binding per prefix without eviction")
    assert(TempFnNames.nameFor(a, "p") == n1,
      "acquiring a second prefix must not evict the first")
  }

  test("register: rebuilds never break live bindings; dead entries sweep") {
    // the recurring-ingest pattern, without the r5 eager-drop race: a
    // rebuild must NOT drop a predecessor whose object is still strongly
    // held (its bare Column keeps resolving), entries must not pin their
    // objects (weak builder), and once an object is collected its entry
    // sweeps away on the next register/sweep for the role.
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.functions.call_function
    val role = "tfn_probe"
    def registered(): Set[String] =
      spark.sessionState.functionRegistry.listFunction()
        .map(_.funcName).filter(_.startsWith(role)).toSet
    // mk builds from the handed object only — capturing the array would
    // pin it and invalidate the collectability assertion below
    val mk = (o: Array[Double], _: Seq[Expression]) =>
      Literal(o.length): Expression
    var a: Array[Double] = Array.fill(4)(1.0)
    val aRef = new java.lang.ref.WeakReference[AnyRef](a)
    val nameA = TempFnNames.register[Array[Double]](spark, role, a, mk)
    val bareA = call_function(nameA) // un-analyzed Column held across rebind
    val b = Array.fill(5)(2.0)
    val nameB = TempFnNames.register[Array[Double]](spark, role, b, mk)
    assert(registered() == Set(nameA, nameB),
      "rebind must keep the live predecessor's entry")
    assert(spark.range(1).select(bareA).head().getInt(0) == 4,
      "a bare Column from before the rebind must still analyze")
    assert(spark.range(1).select(call_function(nameB)).head().getInt(0) == 5)
    a = null // drop the last strong reference
    // the bounded recent-registration FIFO intentionally still pins `a`;
    // age it out eagerly so collectability is down to the weak entry alone
    TempFnNames.releaseStrongHolds(spark)
    var tries = 0
    while (aRef.get() != null && tries < 100) {
      System.gc(); Thread.sleep(10); tries += 1
    }
    assert(aRef.get() == null,
      "a registry entry must not pin its bound object")
    TempFnNames.sweepRole(spark, role)
    assert(registered() == Set(nameB),
      "collected predecessors sweep out of the registry")
  }

  test("register: no premature-GC window between register and analysis") {
    // a caller may hold the bound object only in a frame slot HotSpot has
    // already cleared by analysis time; the bounded strong FIFO must keep
    // the object alive across the register→first-build gap even when NO
    // caller reference survives.
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.functions.call_function
    val mk = (o: Array[Double], _: Seq[Expression]) =>
      Literal(o.length): Expression
    val name = TempFnNames.register[Array[Double]](
      spark, "tfn_window", Array.fill(7)(1.0), mk) // no ref kept
    (0 until 3).foreach { _ => System.gc(); Thread.sleep(10) }
    assert(spark.range(1).select(call_function(name)).head().getInt(0) == 7,
      "binding must survive GC between register and first analysis")
    TempFnNames.releaseStrongHolds(spark)
  }
}
