package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join — the whole-operator Catalyst extension rung
  * (custom LogicalPlan + SparkStrategy + SparkPlan, registered through
  * SparkSessionExtensions), built for the operator the brief and Spark
  * itself lack natively: for every left (probe) row, find the single
  * right (reference) row with the same key and the LARGEST right time
  * ≤ the left time (backward as-of, inclusive — DuckDB `ASOF JOIN ...
  * ON l.ts >= r.ts` semantics).
  *
  * Why a physical operator when q33 already composes the same semantics
  * from union + window: the compositional plan materializes the merged
  * stream through a window sort and carries every probe column through
  * it; this exec is the textbook ONE-PASS merge — both sides hash-
  * partitioned on the key (ClusteredDistribution → EnsureRequirements
  * co-partitions), partition-locally sorted by (keys…, time) (declared
  * requiredChildOrdering → SortExec), then a two-pointer scan holding
  * O(1) state per key: the reference side is read ONCE, never buffered,
  * never re-scanned, and nothing but the join's own shuffle moves. At
  * 100 TB that is the as-of plan you want: shuffle ∝ inputs, memory O(1)
  * per partition beyond the sorts. q95 grades the single-key form
  * against DuckDB's native ASOF JOIN; q102 grades the composite-key +
  * payload form; PlanAuditSpec pins the exec + its sorted-exchange
  * children; RelationalSpec pins row-identity with the window
  * composition on the same inputs.
  *
  * Scope (round-6 generalization of the round-5 single-key contract):
  * COMPOSITE int64 keys (lexicographic merge order), timestamp times,
  * INNER or LEFT-OUTER backward join emitting left columns + `asof_ts`
  * + any requested RIGHT-side payload columns (the matched row's
  * values — carried through the merge as O(#payload) copied values per
  * key, still never a buffered row; outer mode emits unmatched probes
  * with null asof/payload, q103). Null keys/times never match
  * (standard join-key semantics). Ties on the max reference time resolve to the
  * LAST row in sort order — callers wanting determinism with payloads
  * pre-aggregate the reference to unique (key, time), exactly as q102
  * does (and as any engine-portable as-of must: DuckDB leaves the tied
  * winner unspecified too).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    // LEFT-OUTER backward as-of: unmatched probes emit with null
    // asof_ts/payload (DuckDB `ASOF LEFT JOIN` semantics)
    outer: Boolean = false,
    // a constructor FIELD, not a body val: optimizer transforms copy()
    // the node, and a body-val attribute would mint a fresh exprId on
    // every copy while parent plans still reference the original
    asofAttr: AttributeReference =
      AttributeReference("asof_ts", TimestampType, nullable = false)())
    extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "AsOfJoin: key lists must be non-empty and same-length")
  require((leftKeys ++ rightKeys).forall(_.dataType == LongType),
    "AsOfJoin: keys must be BIGINT")
  require(leftTime.dataType == TimestampType &&
    rightTime.dataType == TimestampType,
    "AsOfJoin: times must be TIMESTAMP")
  override def output: Seq[Attribute] =
    left.output ++ ((asofAttr +: rightPayload).map(a =>
      if (outer) a.withNullability(true) else a))
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Public API: `asofJoin(probe, reference, key, key, ts, ts)` — the
    * single-key, no-payload form (q95's contract). */
  def asofJoin(probe: DataFrame, reference: DataFrame,
      probeKey: String, refKey: String,
      probeTime: String, refTime: String): DataFrame =
    asofJoin(probe, reference, Seq(probeKey), Seq(refKey),
      probeTime, refTime, Nil)

  /** General form: composite keys (positionally paired) and right-side
    * payload columns emitted alongside `asof_ts`. Resolves the named
    * columns on the analyzed inputs, installs the strategy on the
    * session (idempotent), and wraps the logical node as a DataFrame. */
  def asofJoin(probe: DataFrame, reference: DataFrame,
      probeKeys: Seq[String], refKeys: Seq[String],
      probeTime: String, refTime: String,
      payload: Seq[String], outer: Boolean = false): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val lp = probe.queryExecution.analyzed
    val rp = reference.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"asofJoin: no column '$name' in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      AsOfJoin(lp, rp,
        probeKeys.map(attr(lp, _)), refKeys.map(attr(rp, _)),
        attr(lp, probeTime), attr(rp, refTime),
        payload.map(attr(rp, _)), outer,
        AttributeReference("asof_ts", TimestampType, nullable = outer)()))
  }

  /** Idempotently register the planner strategy on a live session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }
}

/** Plans the logical AsOfJoin to its exec — the SparkStrategy rung. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightPayload, j.outer, j.asofAttr) :: Nil
    case _ => Nil
  }
}

/** One-pass sorted merge as-of join (see [[AsOfJoin]] Scaladoc). */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightPayload: Seq[Attribute],
    outer: Boolean,
    asofAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ ((asofAttr +: rightPayload).map(a =>
      if (outer) a.withNullability(true) else a))

  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofAttr)

  // co-partition both sides on the key columns; EnsureRequirements
  // inserts the exchanges (and reuses existing compatible partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  // partition-local (keys…, time) sort on both sides — the merge contract
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder.apply(a,
      org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder.apply(a,
      org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // probe-side ordering survives the merge (right side only advances)
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    def ordinals(child: SparkPlan, attrs: Seq[Attribute]): Array[Int] = {
      val out = attrs.map(a =>
        child.output.indexWhere(_.exprId == a.exprId)).toArray
      require(out.forall(_ >= 0),
        "AsOfJoinExec: join columns must be child outputs")
      out
    }
    val lk = ordinals(left, leftKeys)
    val rk = ordinals(right, rightKeys)
    val lt = ordinals(left, Seq(leftTime)).head
    val rt = ordinals(right, Seq(rightTime)).head
    val pOrds = ordinals(right, rightPayload)
    val pTypes = rightPayload.map(_.dataType).toArray
    val nKeys = lk.length
    val nPay = pOrds.length
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      // carried columns: asof_ts + the matched row's payload values
      val extra = new GenericInternalRow(1 + nPay)
      val rBuf = rIter.buffered
      // O(keys + payload) merge state: the best (largest ≤) reference
      // time seen for the key currently under the right pointer, plus
      // that row's payload values (copied — the iterator reuses rows)
      var haveMatch = false
      val matchKey = new Array[Long](nKeys)
      var matchTs = 0L
      val matchPay = new Array[Any](nPay)
      def keyCmpRightLeft(r: InternalRow, l: InternalRow): Int = {
        var i = 0
        while (i < nKeys) {
          val rv = r.getLong(rk(i)); val lv = l.getLong(lk(i))
          if (rv < lv) return -1
          if (rv > lv) return 1
          i += 1
        }
        0
      }
      def anyNullKey(row: InternalRow, ords: Array[Int]): Boolean = {
        var i = 0
        while (i < ords.length) {
          if (row.isNullAt(ords(i))) return true
          i += 1
        }
        false
      }
      def matchEqualsLeft(l: InternalRow): Boolean = {
        var i = 0
        while (i < nKeys) {
          if (matchKey(i) != l.getLong(lk(i))) return false
          i += 1
        }
        true
      }
      def nullExtended(l: InternalRow): InternalRow = {
        var i = 0
        while (i <= nPay) {
          extra.update(i, null); i += 1
        }
        proj(joined(l, extra))
      }
      lIter.flatMap { l =>
        if (anyNullKey(l, lk) || l.isNullAt(lt)) {
          // Null keys/times never MATCH, but LEFT JOIN semantics (and the
          // DuckDB ASOF LEFT JOIN twin) still EMIT the probe row null-
          // extended in outer mode — dropping it entirely is inner-join
          // behavior leaking into the outer path.
          if (outer) Some(nullExtended(l)) else None
        } else {
          val lTsV = l.getLong(lt)
          var scan = true
          while (scan && rBuf.hasNext) {
            val r = rBuf.head
            if (anyNullKey(r, rk) || r.isNullAt(rt)) { rBuf.next(); () }
            else {
              val cmp = keyCmpRightLeft(r, l)
              if (cmp < 0 || (cmp == 0 && r.getLong(rt) <= lTsV)) {
                if (cmp == 0) {
                  haveMatch = true
                  var i = 0
                  while (i < nKeys) {
                    matchKey(i) = r.getLong(rk(i)); i += 1
                  }
                  matchTs = r.getLong(rt)
                  i = 0
                  while (i < nPay) {
                    // copyValue: UTF8String/struct/array values returned
                    // from an UnsafeRow alias its (reused) buffer
                    matchPay(i) = InternalRow.copyValue(
                      r.get(pOrds(i), pTypes(i)))
                    i += 1
                  }
                }
                rBuf.next(); ()
              } else scan = false
            }
          }
          if (haveMatch && matchEqualsLeft(l)) {
            extra.setLong(0, matchTs)
            var i = 0
            while (i < nPay) {
              extra.update(i + 1, matchPay(i)); i += 1
            }
            Some(proj(joined(l, extra)))
          } else if (outer) {
            // LEFT-OUTER: unmatched probe emits with null asof/payload
            Some(nullExtended(l))
          } else None
        }
      }
    }
  }
}
