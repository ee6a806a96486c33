package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, BindReferences, BoundReference,
  Expression, GenericInternalRow, AttributeSet, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport,
  InputAdapter, SparkPlan, SparkStrategy, WholeStageCodegenExec}
import org.apache.spark.sql.functions.col

/** Native backward as-of join — the custom-operator rung of the design
  * ladder (logical node + planner strategy + physical operator), used when
  * composition genuinely leaves performance on the table.
  *
  * Semantics (identical to [[graft.operators.TemporalJoins.asOfJoin]] and
  * to DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`): for each
  * left row, the single right row with the greatest `rightTime <=
  * leftTime` for the same key; all right columns null when none precedes.
  * NULL keys and NULL times never match (equi-join comparison semantics),
  * and null-keyed/timed right rows are skipped.
  *
  * Why a physical operator: the composed form pays one shuffle of
  * left ∪ right plus a window (sort + running `last(ignoreNulls)`) over the
  * UNION, materializing a null payload slot per left row before the window
  * fills it. This operator is the sort-merge-join shape instead: each side
  * shuffles once on its own key (EnsureRequirements co-partitions the two
  * ClusteredDistributions exactly as it does for SMJ), each partition is
  * sorted (key, time), and a single forward merge pass carries the latest
  * preceding right row per key — no union row-widening, no window state,
  * O(1) memory per partition beyond the carried row. At 100 TB: same cost
  * envelope as one sort-merge join; bucketed/pre-partitioned inputs skip
  * the exchanges entirely (the requirement is satisfied, not re-imposed).
  *
  * The logical node mints FRESH output attributes (exprIds) for both
  * sides, so self-lineage inputs (left and right carved from the same
  * scan, sharing attribute ids) stay unambiguous downstream without
  * relying on analyzer dedup — the physical mapping is positional, like
  * Generate/Aggregate.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    override val output: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  // the fresh output attrs are minted HERE, not consumed from children
  override def producedAttributes: AttributeSet = outputSet
  // The physical mapping is POSITIONAL over full child rows, so every
  // child column is semantically consumed: declaring them all as
  // references keeps optimizer column pruning from slimming a child and
  // silently shifting the positions (callers prune by selecting before
  // the join instead).
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Fresh positional output: left columns as-is, right columns nullable. */
  def freshOutput(left: LogicalPlan, right: LogicalPlan): Seq[Attribute] =
    (left.output ++ right.output.map(_.withNullability(true))).map(a =>
      AttributeReference(a.name, a.dataType, a.nullable, a.metadata)())
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, out, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, out, planLater(l), planLater(r),
        fwd) :: Nil
    case _ => Nil
  }
}

/** Column pruning THROUGH the as-of node — the optimizer-rule rung.
  *
  * The node's `references` override deliberately pins every child column
  * (the positional mapping would silently shift otherwise), which also
  * blinds the built-in ColumnPruning. This rule restores the pruning the
  * built-ins get, safely: when a parent Project consumes only part of the
  * join output, the node's output AND its children are narrowed in
  * lockstep — the same positions drop on both sides, so the positional
  * contract is preserved by construction. Key/time columns always survive
  * in the children (the merge consumes them) and stay in the output (the
  * parent Project drops them above).
  *
  * Runs in the user-rule batch, after the default optimizer: the inserted
  * child Projects still reach the scans because V1 `FileSourceStrategy`
  * (via `PhysicalOperation`) collapses Project/Filter chains into the
  * scan's `ReadSchema` at physical planning, independent of the logical
  * ColumnPruning pass. At 100 TB this is the difference between shuffling
  * a document table's every column through the as-of exchange and
  * shuffling three.
  */
object AsOfJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj: AsOfJoinPlan)
        if aj.output.size == aj.left.output.size + aj.right.output.size &&
          prunedIdx(p.references, aj).size < aj.output.size =>
      p.copy(child = prune(p.references, aj))
    // A Filter between the consumer Project and the join must not block
    // pruning (a silent full-width shuffle otherwise): keep the filter's
    // own references alive alongside the project's.
    case p @ Project(_, f @ Filter(_, aj: AsOfJoinPlan))
        if aj.output.size == aj.left.output.size + aj.right.output.size &&
          prunedIdx(p.references ++ f.condition.references, aj).size <
            aj.output.size =>
      p.copy(child =
        f.copy(child = prune(p.references ++ f.condition.references, aj)))
  }

  private def prune(needed: AttributeSet, aj: AsOfJoinPlan): AsOfJoinPlan = {
    val keep = prunedIdx(needed, aj)
    val nL = aj.left.output.size
    val (keepL, keepR) = keep.partition(_ < nL)
    aj.copy(
      left = Project(keepL.map(aj.left.output), aj.left),
      right = Project(keepR.map(i => aj.right.output(i - nL)), aj.right),
      output = keep.map(aj.output))
  }

  /** Output positions that must survive: referenced by the parent, or
    * carrying a key/time column the merge itself consumes.
    */
  private def prunedIdx(needed: AttributeSet, aj: AsOfJoinPlan): Seq[Int] = {
    val nL = aj.left.output.size
    val merge = AttributeSet(
      (aj.leftKeys :+ aj.leftTime).flatMap(_.references) ++
        (aj.rightKeys :+ aj.rightTime).flatMap(_.references))
    aj.output.zipWithIndex.collect { case (a, i)
        if needed.contains(a) || merge.contains(
          if (i < nL) aj.left.output(i) else aj.right.output(i - nL)) => i }
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    override val output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan,
    forward: Boolean = false) extends BinaryExecNode with CodegenSupport {

  override def producedAttributes: AttributeSet = outputSet

  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (key, time) ascending per side: the merge below is a single forward
  // pass over both sorted streams.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Child attr → corresponding fresh output attr (positional). */
  private def toOutput[T <: Expression](e: T): T = {
    val mapping = org.apache.spark.sql.catalyst.expressions.AttributeMap(
      (left.output ++ right.output).zip(output))
    e.transform { case a: Attribute => mapping.getOrElse(a, a) }
      .asInstanceOf[T]
  }

  /** The left side's partitioning, re-expressed in OUTPUT attrs: output
    * rows ride the left partitions unchanged, but the child's exprIds are
    * invisible above this node — without the remap a following
    * groupBy(key) would re-shuffle rows that are already clustered.
    */
  override def outputPartitioning: Partitioning =
    left.outputPartitioning match {
      case e: Expression => toOutput(e).asInstanceOf[Partitioning]
      case p => p // UnknownPartitioning and friends carry no expressions
    }

  /** Rows are emitted in left order: (key, time) ascending per partition. */
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(k => SortOrder(toOutput(k), Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // ---------------------------------------------------------------- codegen
  //
  // Whole-stage codegen over the sorted merge (the SortMergeJoinExec shape:
  // this node heads its stage, both sorted children arrive as inputRDDs and
  // the merge loop is generated straight-line Java). The carried-row state
  // is a handful of mutable slots — exactly the case codegen rewards: no
  // per-row UnsafeProjection round-trips, key/time comparisons inline to
  // primitive compares, and the output feeds the parent's consume without
  // an intermediate JoinedRow + projection pass.

  /** This node heads its codegen stage (like SortMergeJoinExec), but
    * CollapseCodegenStages only special-cases SMJ/SHJ when wrapping children
    * in InputAdapter(WholeStageCodegenExec(…)) subtrees — its default
    * recursion leaves OUR codegen-capable children (SortExec, or the scan
    * itself on pre-sorted bucketed layouts) bare inside the stage, where
    * `execute()` runs their interpreted doExecute and they lose the separate
    * whole-stage compilation they'd get under SMJ. Re-create the SMJ shape at
    * execution time: each bare CodegenSupport child gets its own
    * WholeStageCodegenExec here. InputAdapter children (non-codegen subtrees,
    * e.g. a bare exchange) pass through — wrapping them would only add a
    * copy loop.
    */
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left, right).map {
      case c: CodegenSupport if c.supportCodegen &&
          !c.isInstanceOf[InputAdapter] =>
        WholeStageCodegenExec(c)(codegenStageId = 0).execute()
      case c => c.execute()
    }

  // The emitted right-side variables alias the carried/head row's buffers,
  // which advance as the merge walks on — a buffering parent must copy.
  override def needCopyResult: Boolean = true

  // Stage head driving its own loop over inputRDDs — the limit guard in
  // doProduce is exactly the SMJ case the default (children-only) check
  // refuses.
  override def canCheckLimitNotReached: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator",
      "asofLeftInput", v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator",
      "asofRightInput", v => s"$v = inputs[1];", forceInline = true)
    // rHead outlives iterator advances on both sides (the sorter reuses and
    // frees row pages as it drains), so it owns its bytes: copy on read —
    // same contract as the interpreted path.
    val rHead = ctx.addMutableState("InternalRow", "asofRHead",
      v => s"$v = $rightInput.hasNext() " +
        s"? ((InternalRow) $rightInput.next()).copy() : null;")
    val advanceRight = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  $rHead = $rightInput.hasNext()
         |    ? ((InternalRow) $rightInput.next()).copy() : null;
         |}
       """.stripMargin)

    val leftRow = ctx.freshName("asofLeftRow")
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lkEv = leftKeys.map(
      BindReferences.bindReference(_, left.output).genCode(ctx))
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rHead
    val rkEv = rightKeys.map(
      BindReferences.bindReference(_, right.output).genCode(ctx))
    val rtEv = BindReferences.bindReference(rightTime, right.output)
      .genCode(ctx)

    def anyNull(evs: Seq[ExprCode]): String = {
      val vs = evs.map(_.isNull.toString).filter(_ != "false")
      if (vs.isEmpty) "false" else vs.mkString(" || ")
    }
    // Sequential multi-column compare into an int var already declared 0.
    def keyCmp(cmpVar: String, a: Seq[String], b: Seq[String]): String =
      leftKeys.indices.map { i =>
        s"if ($cmpVar == 0) $cmpVar = " +
          s"${ctx.genComp(leftKeys(i).dataType, a(i), b(i))};"
      }.mkString("\n")
    def timeCmp(a: ExprCode, b: ExprCode): String =
      ctx.genComp(leftTime.dataType, a.value.toString, b.value.toString)

    val lkAnyNull = ctx.freshName("asofLkNull")
    val matched = ctx.freshName("asofMatched")
    val scanning = ctx.freshName("asofScanning")
    val cmp = ctx.freshName("asofCmp")

    // Output variables: left columns straight off the left row; right
    // columns null-guarded on the matched row (SMJ's outer-side pattern).
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRNull")
      val value = ctx.freshName("asofRVal")
      val jt = CodeGenerator.javaType(a.dataType)
      val c =
        code"""boolean $isNull = $matched == null || $matched.isNullAt($i);
              |$jt $value = $isNull
              |  ? ${CodeGenerator.defaultValue(a.dataType)}
              |  : (${CodeGenerator.getValue(matched, a.dataType, i.toString)});
         """.stripMargin
      ExprCode(c, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    val mergeBody = if (forward) {
      // FORWARD: skip right rows strictly before (key, leftTime); the scan
      // head then IS the match iff it sits on the same key at-or-after.
      val ok = ctx.freshName("asofOk")
      val cmp2 = ctx.freshName("asofCmp2")
      ctx.INPUT_ROW = rHead
      val rkEv2 = rightKeys.map(
        BindReferences.bindReference(_, right.output).genCode(ctx))
      val rtEv2 = BindReferences.bindReference(rightTime, right.output)
        .genCode(ctx)
      s"""
         |if (!$lkAnyNull && !${ltEv.isNull}) {
         |  boolean $scanning = $rHead != null;
         |  while ($scanning) {
         |    ${rkEv.map(_.code).mkString("\n")}
         |    ${rtEv.code}
         |    int $cmp = 0;
         |    if (${anyNull(rkEv)}) { $cmp = -1; } else {
         |      ${keyCmp(cmp, rkEv.map(_.value.toString),
                    lkEv.map(_.value.toString))}
         |    }
         |    if ($cmp < 0 || ($cmp == 0 &&
         |        (${rtEv.isNull} || ${timeCmp(rtEv, ltEv)} < 0))) {
         |      $advanceRight();
         |      if ($rHead == null) { $scanning = false; }
         |    } else { $scanning = false; }
         |  }
         |}
         |boolean $ok = false;
         |if (!$lkAnyNull && !${ltEv.isNull} && $rHead != null) {
         |  ${rkEv2.map(_.code).mkString("\n")}
         |  ${rtEv2.code}
         |  int $cmp2 = 0;
         |  if (${anyNull(rkEv2)}) { $cmp2 = -1; } else {
         |    ${keyCmp(cmp2, rkEv2.map(_.value.toString),
                  lkEv.map(_.value.toString))}
         |  }
         |  $ok = $cmp2 == 0 && !${rtEv2.isNull} &&
         |    ${timeCmp(rtEv2, ltEv)} >= 0;
         |}
         |InternalRow $matched = $ok ? $rHead : null;
       """.stripMargin
    } else {
      // BACKWARD: carry the latest right row at-or-before per key. The
      // carried key lives in typed slots (never null when stored — null
      // keyed right rows are skipped before the store).
      val carried = ctx.addMutableState("InternalRow", "asofCarried")
      val carriedValid = ctx.addMutableState("boolean", "asofCarriedValid",
        v => s"$v = false;")
      val ckVars = rightKeys.map(k =>
        ctx.addMutableState(CodeGenerator.javaType(k.dataType), "asofCk"))
      val cmpC = ctx.freshName("asofCmpC")
      val storeCk = ckVars.zip(rkEv)
        .map { case (ck, ev) => s"$ck = ${ev.value};" }.mkString("\n")
      s"""
         |if (!$lkAnyNull) {
         |  if ($carriedValid) {
         |    int $cmpC = 0;
         |    ${keyCmp(cmpC, ckVars, lkEv.map(_.value.toString))}
         |    if ($cmpC != 0) { $carriedValid = false; $carried = null; }
         |  }
         |  boolean $scanning = $rHead != null;
         |  while ($scanning) {
         |    ${rkEv.map(_.code).mkString("\n")}
         |    ${rtEv.code}
         |    int $cmp = 0;
         |    if (${anyNull(rkEv)}) { $cmp = -1; } else {
         |      ${keyCmp(cmp, rkEv.map(_.value.toString),
                    lkEv.map(_.value.toString))}
         |    }
         |    if ($cmp < 0) { $advanceRight(); }
         |    else if ($cmp == 0 && !${rtEv.isNull} && !${ltEv.isNull} &&
         |        ${timeCmp(rtEv, ltEv)} <= 0) {
         |      $carried = $rHead.copy();
         |      $carriedValid = true;
         |      $storeCk
         |      $advanceRight();
         |    } else if ($cmp == 0 && ${rtEv.isNull}) { $advanceRight(); }
         |    else { $scanning = false; }
         |    if ($rHead == null) { $scanning = false; }
         |  }
         |}
         |InternalRow $matched =
         |  (!$lkAnyNull && $carriedValid && !${ltEv.isNull})
         |    ? $carried : null;
       """.stripMargin
    }

    // limitNotReachedCond lets a LocalLimit in the same stage short-circuit
    // the drive loop (SMJ emits the same guard) — without it a hit limit
    // silently drains the whole left partition.
    s"""
       |while ($limitNotReachedCond $leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkEv.map(_.code).mkString("\n")}
       |  ${ltEv.code}
       |  boolean $lkAnyNull = ${anyNull(lkEv)};
       |  $mergeBody
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(leftKeys, lOut)
      val rKeyGen = UnsafeProjection.create(rightKeys, rOut)
      val lTimeGen = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeGen = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        leftKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(leftTime.dataType))
      val resultProj = UnsafeProjection.create(
        (lOut ++ rOut).map(_.dataType).toArray)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // rHead outlives iterator advances on BOTH sides (the sorter reuses
      // and frees row pages as it drains), so it must own its bytes: copy.
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var carried: InternalRow = null        // latest right row ≤ current left
      var carriedKey: UnsafeRow = null
      def advanceRight(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null
      lIter.map { l =>
        val lk = lKeyGen(l)
        if (lk.anyNull) resultProj(joined(l, nullRight))
        else if (forward) {
          // FORWARD: earliest right row with rightTime >= leftTime. No
          // carry needed — the match is rHead itself once the scan stops
          // on (same key, rt >= lt). Skipped rows (rt < lt) can never
          // match a later left row: left times only grow within a key.
          val lt = lTimeGen(l)
          var scanning = rHead != null && !lt.isNullAt(0)
          while (scanning) {
            val rk = rKeyGen(rHead)
            val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
            if (cmp < 0 ||
                (cmp == 0 && (rTimeGen(rHead).isNullAt(0) ||
                  timeOrd.compare(rTimeGen(rHead), lt) < 0))) {
              advanceRight()
              if (rHead == null) scanning = false
            } else scanning = false
          }
          val ok = rHead != null && !lt.isNullAt(0) && {
            val rk = rKeyGen(rHead)
            !rk.anyNull && keyOrd.compare(rk, lk) == 0 &&
              !rTimeGen(rHead).isNullAt(0) &&
              timeOrd.compare(rTimeGen(rHead), lt) >= 0
          }
          resultProj(joined(l, if (ok) rHead else nullRight))
        } else {
          val lt = lTimeGen(l)
          if (carried != null && keyOrd.compare(carriedKey, lk) != 0) {
            carried = null; carriedKey = null
          }
          var scanning = rHead != null
          while (scanning) {
            val rk = rKeyGen(rHead)
            val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
            if (cmp < 0) advanceRight()           // behind: skip (or null key)
            else if (cmp == 0 && {
              val rt = rTimeGen(rHead)
              !rt.isNullAt(0) && !lt.isNullAt(0) &&
                timeOrd.compare(rt, lt) <= 0
            }) {
              carried = rHead.copy(); carriedKey = rk.copy()
              advanceRight()
            } else if (cmp == 0 && rTimeGen(rHead).isNullAt(0)) {
              advanceRight()                      // null time never matches
            } else scanning = false               // ahead of this left row
            if (rHead == null) scanning = false
          }
          val matched =
            if (carried != null && !lt.isNullAt(0)) carried else nullRight
          resultProj(joined(l, matched))
        }
      }
    }
  }
}

/** Builder: the public DataFrame surface over the plan above. */
object AsOfJoin {
  private val registrationLock = new Object

  /** Native as-of join; see [[AsOfJoinPlan]]. Output: all left columns,
    * then all right columns (nullable); `forward = true` flips the
    * direction to earliest-at-or-after. A later `.select` of a subset is
    * pruned through the node by [[AsOfJoinPruning]].
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      forward: Boolean = false): DataFrame =
    asOfMulti(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      forward)

  /** Multi-column-key form: the plan/exec carry `Seq` keys natively (the
    * grouped comparison walks every slot — AsOfJoinExec's keyCmp), this
    * just exposes them on the builder. Keys are compared positionally.
    */
  def asOfMulti(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      forward: Boolean = false): DataFrame = {
    require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
      s"key lists must be non-empty and same-length: $leftKeys vs $rightKeys")
    val spark = left.sparkSession
    // The experimental strategy/optimization lists are plain session-global
    // vars: an unsynchronized check-then-append from two threads can lose a
    // registration (last-writer-wins) or double-register. One global lock —
    // registration is rare and cheap, contention is irrelevant.
    AsOfJoin.registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
      }
      if (!spark.experimental.extraOptimizations.contains(AsOfJoinPruning)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ AsOfJoinPruning
      }
    }
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so both children expose distinct exprIds even
    // when carved from one scan; the node's own output is fresh regardless.
    val rAliased = right.select(
      right.columns.map(c => col(c).as(c)).toSeq: _*)
    val rPlan = rAliased.queryExecution.analyzed
    def attrOf(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      leftKeys.map(attrOf(lPlan, _)), rightKeys.map(attrOf(rPlan, _)),
      attrOf(lPlan, leftTime), attrOf(rPlan, rightTime),
      AsOfJoinPlan.freshOutput(lPlan, rPlan), forward)
    GraftSqlShim.ofRows(spark, node)
  }
}
