package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Scan-side membership probe against a pre-built Bloom filter — the sketch
  * form of a broadcast-semi-join prefilter.
  *
  * The filter rides along as a referenced object: the driver builds it once
  * (`df.stat.bloomFilter`, a distributed treeAggregate), the expression
  * serializes it to each executor with the plan, and codegen probes it with
  * one `mightContainLong` call per row — no UDF dispatch, no shuffle, and
  * the whole-stage span stays intact. At ~10 bits/item the filter for 100 M
  * reference keys is ~120 MB where the exact broadcast set would be GBs.
  *
  * One-sided error: `mightContainLong` has no false negatives, so a bloom
  * prefilter never drops a true match; false positives (rate `fpp`) either
  * pass to an exact verify stage or are accepted as over-flagging.
  */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, got ${other.catalogString}")
  }
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloom", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomExpressions {

  /** Column form: TRUE when `c` (bigint) might be in `bf`; never a false
    * negative.
    *
    * The filter object cannot ride through SQL text, and every public
    * Column-from-Expression bridge is `private[sql]`, so the expression is
    * bound by registering a session temp function whose builder closes over
    * `bf`. Names come from [[TempFnNames]]: one binding per live filter
    * object (re-binding the same filter every micro-batch reuses its
    * entry, so the registry — whose closure pins the filter — does not
    * grow with call count), distinct filters always get distinct names
    * (identityHashCode alone is not collision-free).
    */
  def bloomMightContain(spark: SparkSession, c: Column,
      bf: BloomFilter): Column = {
    val name = TempFnNames.nameFor(bf, "graft_bloom_probe")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      exprs => BloomMightContain(exprs.head, bf), "built-in")
    TempFnNames.bindRole(spark, "graft_bloom_probe", name)
    call_function(name, c)
  }
}

/** Stable unique temp-function names keyed by object identity: the same
  * object reuses its name (no per-call registry/heap growth), distinct
  * objects never collide (monotone suffix). Weak keys let a dropped filter
  * or codebook be collected once its registry entry is replaced.
  *
  * [[bindRole]] is the cleanup path for the recurring-rebuild pattern (a
  * fresh Bloom filter / codebook per ingest or micro-batch): each logical
  * role keeps exactly ONE live registry entry, and binding a new object to
  * the role drops the predecessor's entry — whose builder closure was the
  * only registry-side reference pinning the old (filter-sized) object.
  * Dropping is safe for any Column already incorporated into a DataFrame:
  * Dataset analysis is eager, so the resolved expression embeds the object
  * itself and never consults the registry again. The one unsupported shape
  * is holding a BARE un-analyzed Column across a later re-bind of the same
  * role — incorporate the Column into a DataFrame before rebuilding.
  */
private[functions] object TempFnNames {
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)
  // per-prefix maps: one object may carry several bindings (a PQ codebook
  // backs both the encode and the lut function) without evicting the other
  private val names = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Map[AnyRef, String]]()
  // role → the registry name currently holding it, PER function registry:
  // registries are per-SparkSession, so a process-global role map would
  // issue the drop against whichever session bound last and leave the
  // original session's entry pinned. Weak keys let a closed session's
  // bookkeeping be collected.
  private val roleNames = new java.util.WeakHashMap[
    AnyRef, java.util.concurrent.ConcurrentHashMap[String, String]]()

  def nameFor(obj: AnyRef, prefix: String): String = {
    val m = names.computeIfAbsent(prefix,
      _ => new java.util.WeakHashMap[AnyRef, String]())
    m.synchronized {
      val cached = m.get(obj)
      if (cached != null) cached
      else {
        val name = s"${prefix}_${nextId.incrementAndGet()}"
        m.put(obj, name)
        name
      }
    }
  }

  /** Record `name` as the current holder of `role`; drop the previous
    * holder's temp-function entry (if different) from the session registry
    * so rebuilt objects do not accumulate entries that pin them.
    */
  def bindRole(spark: SparkSession, role: String, name: String): Unit = {
    val registry = spark.sessionState.functionRegistry
    val m = roleNames.synchronized {
      var cur = roleNames.get(registry)
      if (cur == null) {
        cur = new java.util.concurrent.ConcurrentHashMap[String, String]()
        roleNames.put(registry, cur)
      }
      cur
    }
    val prev = m.put(role, name)
    if (prev != null && prev != name)
      registry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(prev))
  }
}
