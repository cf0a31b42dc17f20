package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Automatic pane/slice optimization for sliding-window aggregates —
  * the reference's CustomSlidingWindow pane trick
  * (InorderTumblingWindow/CustomSlidingWindow.java:25-127) expressed
  * as a Catalyst optimizer rule.
  *
  * Spark plans `groupBy(window(ts, size, slide))` as an Expand that
  * replicates EVERY input row once per overlapping window
  * (size/slide ×) before the partial aggregation. This rule rewrites
  *
  *   Aggregate(keys + window, decomposable aggs, Expand(input))
  * into
  *   Aggregate(keys + window, recombine,
  *     Filter(pane fits window,
  *       Expand(pane → candidate windows,
  *         Aggregate(keys + pane, partial aggs, input))))
  *
  * so the input is aggregated ONCE per gcd(size, slide) pane and only
  * the tiny pane partials are replicated. Sound for algebraic
  * aggregates (SUM/COUNT/MIN/MAX, non-distinct, unfiltered): window
  * boundaries are slide-aligned and pane divides slide, so every pane
  * lies wholly inside or wholly outside every window.
  *
  * Opt-in via [[graft.GraftExtensions]] (injectOptimizerRule); the
  * equivalence against the unoptimized plan is spec-checked.
  */
object PaneSlidingAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Batch plans only. A streaming sliding agg keeps ONE state row per
    // (key, window) and merges each micro-batch's pre-shuffle partial
    // into it, so rewriting here would stack a second stateful
    // aggregate with its own state/watermark lifecycle behind the
    // planner's back. The streaming pane layout is instead expressed
    // natively by chained window re-aggregation —
    // [[graft.operators.Windows.streamingPaneSlidingAgg]] — which the
    // streaming planner understands (two state stores, pane partials
    // in the first, window re-agg in the second).
    case agg: Aggregate if !agg.isStreaming =>
      // peel an optional pruning Project and the TimeWindowing
      // validity filter off the Aggregate's child:
      //   Aggregate [Project] [Filter] Expand
      // For non-divisible size/slide TimeWindowing interposes
      // `ts ∈ [window.start, window.end)` (plus isnotnull guards)
      // between the Aggregate and the Expand; pane-candidate
      // filtering subsumes exactly that predicate, so it is safe to
      // absorb — but ONLY that predicate (anything else blocks the
      // rewrite: it could be a user filter).
      val peeled: Option[(Option[Expression], Expand)] = agg.child match {
        case e: Expand => Some((None, e))
        case Filter(c, e: Expand) => Some((Some(c), e))
        case Project(pl, Filter(c, e: Expand))
            if pl.forall(_.isInstanceOf[AttributeReference]) => Some((Some(c), e))
        case Project(pl, e: Expand)
            if pl.forall(_.isInstanceOf[AttributeReference]) => Some((None, e))
        case _ => None
      }
      (for {
        (condOpt, expand) <- peeled
        m <- eligible(agg, expand)
        if condOpt.forall(isWindowValidityFilter(_, m))
      } yield rewrite(agg, expand, m)).getOrElse(agg)
  }

  /** True iff `cond` is precisely TimeWindowing's validity predicate:
    * every conjunct is one of {isnotnull(window.start),
    * isnotnull(window.end), ts >= window.start, ts < window.end} over
    * exactly the matched ts/window attributes, with both bounds
    * present. (Null windows are dropped identically by the pane
    * plan's candidate filter: null pane → null ws → filtered.)
    */
  private def isWindowValidityFilter(cond: Expression, m: Match): Boolean = {
    def isWinField(e: Expression, ordinal: Int): Boolean = e match {
      case GetStructField(ar: AttributeReference, o, _) =>
        ar.exprId == m.windowAttr.exprId && o == ordinal
      case _ => false
    }
    def isTs(e: Expression): Boolean = e match {
      case ar: AttributeReference => ar.exprId == m.tsAttr.exprId
      case _ => false
    }
    def isLower(e: Expression): Boolean = e match {
      case GreaterThanOrEqual(a, b) => isTs(a) && isWinField(b, 0)
      case LessThanOrEqual(a, b) => isWinField(a, 0) && isTs(b)
      case _ => false
    }
    def isUpper(e: Expression): Boolean = e match {
      case LessThan(a, b) => isTs(a) && isWinField(b, 1)
      case GreaterThan(a, b) => isWinField(a, 1) && isTs(b)
      case _ => false
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    def isNullGuard(e: Expression): Boolean = e match {
      case IsNotNull(f) => isWinField(f, 0) || isWinField(f, 1)
      case _ => false
    }
    val cs = conjuncts(cond)
    cs.forall(c => isNullGuard(c) || isLower(c) || isUpper(c)) &&
      cs.exists(isLower) && cs.exists(isUpper)
  }

  /** (windowAttr, tsAttr, sizeMicros, slideMicros) */
  private case class Match(windowAttr: Attribute, tsAttr: Attribute,
                           size: Long, slide: Long)

  private def isWindowStruct(dt: DataType): Boolean = dt match {
    case StructType(Array(StructField("start", TimestampType, _, _),
                          StructField("end", TimestampType, _, _))) => true
    case _ => false
  }

  private def eligible(agg: Aggregate, expand: Expand): Option[Match] = {
    if (expand.projections.size < 2) return None
    // the window attribute: generated by the Expand (not in its child)
    // with the start/end struct shape, and used as a grouping key
    val childIds = expand.child.outputSet
    val winAttr = expand.output.find(a =>
      isWindowStruct(a.dataType) && !childIds.contains(a) &&
        agg.groupingExpressions.exists {
          case ar: AttributeReference => ar.exprId == a.exprId
          case _ => false
        })
    if (winAttr.isEmpty) return None
    val winIdx = expand.output.indexWhere(_.exprId == winAttr.get.exprId)
    val winExpr0 = expand.projections.head(winIdx)

    // TimeWindowing's generated shape: slide is the Remainder divisor,
    // size the Add offset that isn't the slide (negative-mod branch)
    val tsAttr = winExpr0.collectFirst {
      case a: AttributeReference if a.dataType == TimestampType => a }
    val slide = winExpr0.collectFirst {
      case Remainder(_, Literal(s: Long, LongType), _) => s }
    val size = slide.flatMap(s => winExpr0.collect {
      case Add(_, Literal(x: Long, LongType), _) => x }.find(x => x != s && x > 0))
    if (tsAttr.isEmpty || slide.isEmpty || size.isEmpty) return None
    if (size.get <= slide.get) return None
    // reject windows with a non-zero origin (window(ts, size, slide,
    // startTime)): the rewrite assumes epoch-aligned panes. In the
    // k=0 projection every Subtract offset must be 0.
    val nonZeroOrigin = winExpr0.collect {
      case Subtract(_, Literal(o: Long, LongType), _) if o != 0L => o
    }.nonEmpty
    if (nonZeroOrigin) return None

    // remaining grouping keys must be plain child attributes
    val plainKeys = agg.groupingExpressions.forall {
      case ar: AttributeReference =>
        ar.exprId == winAttr.get.exprId || childIds.contains(ar)
      case _ => false
    }
    // every projection must pass non-window child attrs through unchanged
    val passthrough = expand.projections.forall { proj =>
      proj.zip(expand.output).forall { case (e, out) =>
        out.exprId == winAttr.get.exprId || (e match {
          case ar: AttributeReference => ar.exprId == out.exprId
          case _ => false
        })
      }
    }
    // aggregates must be decomposable
    val decomposable = agg.aggregateExpressions.forall(ne => ne.collect {
      case ae: AggregateExpression => ae
    }.forall(ae => !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Count | _: Min | _: Max => true
      case _ => false
    })))
    if (plainKeys && passthrough && decomposable)
      Some(Match(winAttr.get, tsAttr.get, size.get, slide.get))
    else None
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  private def rewrite(agg: Aggregate, expand: Expand, m: Match): LogicalPlan = {
    val pane = gcd(m.size, m.slide)
    val nW = ((m.size + m.slide - 1) / m.slide).toInt + 1
    val input = expand.child

    val otherKeys = agg.groupingExpressions.collect {
      case ar: AttributeReference if ar.exprId != m.windowAttr.exprId => ar }

    // ---- level 1: per-pane partial aggregation over the raw input
    val tsLong = PreciseTimestampConversion(m.tsAttr, TimestampType, LongType)
    val paneExpr = Subtract(tsLong, Pmod(tsLong, Literal(pane, LongType)))
    val paneAlias = Alias(paneExpr, "_pane")()

    // one partial per DISTINCT aggregate (matched by canonical form,
    // so traversal order can't misalign them)
    val originals = agg.aggregateExpressions
      .flatMap(ne => ne.collect { case ae: AggregateExpression => ae })
      .groupBy(_.canonicalized).map(_._2.head).toSeq
    val partialAliases = originals.zipWithIndex.map { case (ae, i) =>
      Alias(ae, s"_p$i")() }
    val partialByCanon: Map[Expression, Attribute] =
      originals.zip(partialAliases).map { case (ae, al) =>
        (ae.canonicalized: Expression) -> al.toAttribute }.toMap
    // grouping uses the projected pane attribute; the Project below
    // computes it once per input row
    val partialAgg2 = Aggregate(
      otherKeys :+ paneAlias.toAttribute,
      otherKeys ++ (paneAlias.toAttribute +: partialAliases),
      Project(input.output :+ paneAlias, input))

    // ---- level 2: replicate pane partials to candidate windows
    val paneAttr = paneAlias.toAttribute
    val partialAttrs = partialAliases.map(_.toAttribute)
    val wsAttr = AttributeReference("_ws", LongType, nullable = true)()
    // pane passes through the Expand so the validity filter can see it
    val expandOut = (otherKeys :+ paneAttr :+ wsAttr) ++ partialAttrs
    val aligned = Subtract(paneAttr, Pmod(paneAttr, Literal(m.slide, LongType)))
    val projections = (0 until nW).map { k =>
      val ws = Subtract(aligned, Literal(k * m.slide, LongType))
      (otherKeys :+ paneAttr :+ ws) ++ partialAttrs
    }
    val paneExpand = Expand(projections, expandOut, partialAgg2)
    val valid = And(
      LessThanOrEqual(wsAttr, paneAttr),
      LessThanOrEqual(Add(paneAttr, Literal(pane, LongType)),
        Add(wsAttr, Literal(m.size, LongType))))
    val filtered = Filter(valid, paneExpand)

    // ---- rebuild the window struct under the ORIGINAL exprId
    val winStruct = CreateNamedStruct(Seq(
      Literal("start"), PreciseTimestampConversion(wsAttr, LongType, TimestampType),
      Literal("end"), PreciseTimestampConversion(Add(wsAttr, Literal(m.size, LongType)),
        LongType, TimestampType)))
    val winAlias = Alias(winStruct, m.windowAttr.name)(exprId = m.windowAttr.exprId)
    val reProject = Project((otherKeys :+ winAlias) ++ partialAttrs, filtered)

    // ---- level 3: recombine partials under the original output ids
    val finalAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transformUp {
        case ae: AggregateExpression =>
          val pAttr = partialByCanon(ae.canonicalized)
          val recombined = ae.aggregateFunction match {
            case _: Sum => ae.copy(aggregateFunction = Sum(pAttr))
            case _: Count => ae.copy(aggregateFunction = Sum(pAttr))
            case _: Min => ae.copy(aggregateFunction = Min(pAttr))
            case _: Max => ae.copy(aggregateFunction = Max(pAttr))
            case _ => ae
          }
          // recombined type can widen (sum of decimal sums) or change
          // nullability (sum of counts) — cast back to the original
          if (recombined.dataType == ae.dataType) recombined
          else Cast(recombined, ae.dataType)
      }.asInstanceOf[NamedExpression]
    }
    Aggregate(agg.groupingExpressions, finalAggExprs, reProject, agg.hint)
  }
}
