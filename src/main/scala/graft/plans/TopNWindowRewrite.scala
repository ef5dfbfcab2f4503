package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.expressions.TopK

/** Optimizer rule: rewrite the window top-N idiom
  *
  * {{{ Filter(rn <= k, Window([rn := row_number() OVER (PARTITION BY p ORDER BY o)], child)) }}}
  *
  * into a bounded top-k AGGREGATE + positional explode:
  *
  * {{{ Project(child.* from payload, rn := pos + 1,
  *       Generate(posexplode(topk_struct),
  *         Aggregate(p, topk(struct(orderKey..., struct(child.*)), k), child))) }}}
  *
  * Why: the window form shuffles and per-key sorts EVERY row, then discards
  * all but k per key; the aggregate form reduces each map partition to ≤ k
  * rows per key before the exchange, so shuffle volume drops from O(rows) to
  * O(keys·k) — at 100 TB the difference between a top-k and a global sort.
  * This is the rewrite engines apply by hand everywhere (latest-per-key,
  * dedup-by-rank, per-group sampling); doing it in the optimizer makes the
  * WINDOW SYNTAX the fast path instead of a scale trap.
  *
  * Semantics: identical output, with one caveat shared by the original —
  * `row_number` breaks ties between order-equal rows arbitrarily; the
  * rewrite breaks them by payload bytes, which is one of the legal
  * assignments (and deterministic, unlike WindowExec's partition-layout-
  * dependent choice). Queries with total orders are bit-identical.
  *
  * Conservative guards — the rule declines (leaves the plan unchanged) when:
  *   - the window computes anything besides a single `row_number`
  *   - the filter's rank bound is not a literal `<=`/`<`/`= 1` comparison
  *     (other conjuncts are fine: they are preserved above the rewrite)
  *   - k > maxK (huge k ⇒ the window form's sort is fine and the agg
  *     buffer would be large)
  *   - a DESCENDING order key has a type we cannot order-reverse exactly
  *     (see [[TopNWindowRewrite.reverseExact]] — numeric, boolean,
  *     timestamp and date are supported; strings/binary are not)
  *
  * Null ordering is preserved exactly: each order key becomes a
  * (null-position flag, direction-adjusted value) field pair, so
  * NULLS FIRST/LAST in either direction round-trips.
  */
case class TopNWindowRewrite(maxK: Int = 1000) extends Rule[LogicalPlan] {

  private object RankBound {
    /** Extract (k, otherConjuncts) from the filter condition. */
    def unapply(x: (Expression, ExprId)): Option[(Int, Seq[Expression])] = {
      val (cond, rnId) = x
      val conjuncts = splitConjuncts(cond)
      val (rankConds, rest) = conjuncts.partition(_.references.exists(_.exprId == rnId))
      rankConds match {
        case Seq(LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)))
          if a.exprId == rnId && k >= 1 => Some((k, rest))
        case Seq(LessThan(a: AttributeReference, Literal(k: Int, IntegerType)))
          if a.exprId == rnId && k >= 2 => Some((k - 1, rest))
        case Seq(EqualTo(a: AttributeReference, Literal(1, IntegerType)))
          if a.exprId == rnId => Some((1, rest))
        case Seq(EqualTo(Literal(1, IntegerType), a: AttributeReference))
          if a.exprId == rnId => Some((1, rest))
        case _ => None
      }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Exact order-reversal for a sort key, or None if the type has no safe
    * reversal (strings/binary/complex). Widenings are chosen so negation
    * cannot overflow or lose precision.
    */
  private def reverseExact(e: Expression): Option[Expression] = e.dataType match {
    case ByteType | ShortType | IntegerType =>
      Some(UnaryMinus(Cast(e, LongType), failOnError = false))
    case LongType =>
      Some(UnaryMinus(Cast(e, DecimalType(20, 0)), failOnError = false))
    case FloatType | DoubleType =>
      Some(UnaryMinus(e, failOnError = false))
    case d: DecimalType if d.precision < DecimalType.MAX_PRECISION =>
      Some(UnaryMinus(Cast(e, DecimalType(d.precision + 1, d.scale)), failOnError = false))
    case BooleanType =>
      Some(Not(e))
    case TimestampType =>
      Some(UnaryMinus(Cast(UnixMicros(e), DecimalType(20, 0)), failOnError = false))
    case DateType =>
      Some(UnaryMinus(Cast(UnixDate(e), LongType), failOnError = false))
    case _ => None
  }

  /** One sort key → struct fields replicating direction AND null ordering
    * under plain ascending nulls-first struct comparison.
    */
  private def sortKeyFields(so: SortOrder): Option[Seq[Expression]] = {
    val nullFlag = so.nullOrdering match {
      // ascending booleans sort false < true; null rows must get the
      // smaller flag for NullsFirst, the larger for NullsLast
      case NullsFirst => Not(IsNull(so.child))
      case NullsLast  => IsNull(so.child)
    }
    val valueKey = so.direction match {
      case Ascending  => Some(so.child)
      case Descending => reverseExact(so.child)
    }
    // float/double DESC: Spark orders NaN greater than everything, but
    // negation leaves NaN as NaN (still sorting greatest), which would
    // misplace NaN rows last instead of first — an explicit not-NaN flag
    // (false sorts first) restores NaN-first for descending keys.
    // Ascending needs nothing: NaN already sorts last either way.
    val nanFlag: Seq[Expression] = (so.direction, so.child.dataType) match {
      case (Descending, FloatType | DoubleType) => Seq(Not(IsNaN(so.child)))
      case _ => Nil
    }
    valueKey.map(v => (nullFlag +: nanFlag) :+ v)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _))
        if order.nonEmpty =>
      ((cond, rnAlias.exprId)) match {
        case RankBound((k, rest)) if k <= maxK
            // the whole row travels inside TopK's ordered struct, so EVERY
            // output column must be orderable (a MapType column would pass
            // analysis here and then throw at task execution)
            && child.output.forall(a =>
              org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(a.dataType)) =>
          val keyFields = order.map(sortKeyFields)
          if (keyFields.exists(_.isEmpty)) f
          else {
            val payload = CreateStruct.create(child.output)
            val sortKey = CreateStruct.create(keyFields.flatMap(_.get) :+ payload)
            val topkAgg = AggregateExpression(
              TopK(sortKey, k, descending = false),
              aggregate.Complete, isDistinct = false)
            val topkAlias = Alias(topkAgg, "__graft_topk")()
            val agg = Aggregate(part, Seq(topkAlias), child)

            val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
            val elemType = sortKey.dataType.asInstanceOf[StructType]
            val elemAttr = AttributeReference("__graft_elem", elemType, nullable = false)()
            val gen = Generate(
              PosExplode(topkAlias.toAttribute),
              unrequiredChildIndex = Seq(0), // topk array not needed above
              outer = false,
              qualifier = None,
              generatorOutput = Seq(posAttr, elemAttr),
              agg)

            val payloadIdx = elemType.fields.length - 1
            val payloadExpr = GetStructField(elemAttr, payloadIdx)
            val restored: Seq[NamedExpression] = child.output.zipWithIndex.map {
              case (a, i) =>
                Alias(GetStructField(payloadExpr, i, Some(a.name)), a.name)(
                  exprId = a.exprId, qualifier = a.qualifier)
            }
            val rnExpr = Alias(Add(posAttr, Literal(1)), rnAlias.name)(
              exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
            val project = Project(restored :+ rnExpr, gen)
            if (rest.isEmpty) project
            else Filter(rest.reduce(And), project)
          }
        case _ => f
      }
  }
}
