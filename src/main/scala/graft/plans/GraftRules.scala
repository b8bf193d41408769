package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Alias, ArrayAggregate, Attribute, AttributeReference, Cast, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LambdaFunction, LessThan, LessThanOrEqual, Literal, Multiply, NamedLambdaVariable, PredicateHelper, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.DotProductD

/** Catalyst optimizer rule: rewrite the naive higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProductD]]. The HOF form is what a user
  * naturally writes, but Spark evaluates lambda HOFs interpreted — ~10x
  * slower on 64-dim vectors (see DotProductD scaladoc). The shapes are
  * semantically identical on EVERY input: both are a left-to-right double
  * fold of pairwise products, and DotProductD reproduces the HOF's NULL
  * behavior (mismatched lengths and NULL elements both yield NULL), so the
  * rewrite is safe on arrays whose element type is nullable
  * (containsNull=true) — RuleSpec locks this.
  *
  * Fires only on the exact shape (multiply inside zip_with, 0.0 init, add
  * fold, double arrays) — anything else is left untouched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private object DoubleArrays {
    def unapply(e: Expression): Option[Expression] = e.dataType match {
      case t: org.apache.spark.sql.types.ArrayType if t.elementType == DoubleType => Some(e)
      case _ => None
    }
  }

  /** The multiply must use ONE variable from EACH zip_with argument —
    * (x,y)->x*y or (x,y)->y*x. Same-variable products like (x,y)->x*x are
    * sums of squares of one side, NOT a dot product, and must not match.
    */
  private def isCrossProduct(x: NamedLambdaVariable, y: NamedLambdaVariable,
                             lhs: Expression, rhs: Expression): Boolean =
    (lhs, rhs) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        (l.exprId == x.exprId && r.exprId == y.exprId) ||
          (l.exprId == y.exprId && r.exprId == x.exprId)
      case _ => false
    }

  private def isFold(acc: NamedLambdaVariable, v: NamedLambdaVariable,
                     lhs: Expression, rhs: Expression): Boolean =
    (lhs, rhs) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(DoubleArrays(a), DoubleArrays(b),
          LambdaFunction(Multiply(x1, y1, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(accRef, vRef, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isCrossProduct(x, y, x1, y1) && isFold(acc, v, accRef, vRef) &&
        isIdentityFinish(finish) =>
      DotProductD(a, b)
  }

  /** aggregate()'s finish lambda must be the identity (id -> id) for the
    * rewrite to be value-preserving.
    */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}

/** Catalyst optimizer rule: rewrite a pure band join
  *
  *   L JOIN R ON abs(L.c - R.c) <= w                 (or < w)
  *   L JOIN R ON R.c BETWEEN L.c - w1 AND L.c + w2   (incl. asymmetric /
  *   L JOIN R ON L.c - R.c <= w2 AND L.c - R.c >= w1  shifted windows —
  *                                any two-sided difference constraint)
  *
  * — which Catalyst can only execute as a nested loop (BNLJ/cartesian:
  * nothing to hash on; the per-pair predicate is the classic 100 TB scale
  * killer) — into the binned equi-join [[graft.operators.Joins.rangeJoin]]
  * builds by hand: bin both sides into width-w buckets of the band column
  * (truncating `div`), explode the SMALLER side into {bin-1, bin, bin+1},
  * equi-join on the bin, and re-apply the exact original predicate as a
  * residual filter.
  *
  * Completeness: every bin spans >= w consecutive integers (the
  * zero-straddling truncation bin spans 2w-1), so two values within w of
  * each other sit at most one bin apart — for ANY longs, negative
  * included. Each candidate pair meets exactly once (the non-exploded
  * side keeps a single bin). The residual filter makes the rewrite
  * value-preserving; NULL band values produce a NULL bin, which an
  * equi-join never matches — identical to the original predicate
  * evaluating to NULL. BandJoinSpec locks plan shape + result parity
  * (including duplicates) against the kill-switched plan.
  *
  * Guards: INNER join only; the band expressions must each reference
  * exactly one input and be deterministic; integral types only
  * (timestamp/double bands don't `div` exactly); fires only when the
  * condition has NO equi conjunct (with one, Catalyst already hash-joins
  * and the band is a cheap post-filter); merged width >= 1 (two-sided
  * bounds from separate conjuncts are intersected per column pair, strict
  * bounds tightened by one — exact on integers; for a shifted band
  * lo..hi the bin width is max(|lo|, |hi|), which still satisfies the
  * one-bin-apart invariant since every matching pair has
  * |difference| <= that width). One documented
  * divergence: a pair whose difference OVERFLOWS Long and wraps into
  * [-w, w] "matches" the naive non-ANSI plan but is not generated as a
  * candidate here (under ANSI the original query throws instead) — at
  * band widths vs 2^63 magnitudes this needs adversarial inputs, and the
  * kill switch `spark.graft.bandJoin.enabled` restores the naive plan.
  */
object RewriteBandJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.bandJoin.enabled", "true") == "true"

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Short, org.apache.spark.sql.types.ShortType) => Some(v.toLong)
      case Literal(v: Byte, org.apache.spark.sql.types.ByteType) => Some(v.toLong)
      case _ => None
    }
  }

  private def integral(x: Expression): Boolean = x.dataType match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         IntegerType | LongType => true
    case _ => false
  }

  /** One conjunct as difference bounds: Some((x, y, lo, hi)) meaning the
    * conjunct implies lo <= x - y <= hi (None = that end unconstrained).
    * Matches the abs form, the explicit-difference form
    * `(x - y) <=/< w`, the offset forms `x <=/< y + w`, `x >=/> y - w`
    * (what BETWEEN expands to), and the bare `x <= y`. Strict bounds
    * tighten by 1 — exact on integral domains.
    */
  private def boundsOf(e: Expression)
      : Option[(Expression, Expression, Option[Long], Option[Long])] = {
    // e = core + offset, with offset a literal
    def split(x: Expression): (Expression, Long) = x match {
      case Add(c, IntLit(w), _) => (c, w)
      case Add(IntLit(w), c, _) => (c, w)
      case Subtract(c, IntLit(w), _) => (c, -w)
      case _ => (x, 0L)
    }
    // canonical a <= b (+ strictness)
    val le: Option[(Expression, Expression, Boolean)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b, false))
      case LessThan(a, b) => Some((a, b, true))
      case GreaterThanOrEqual(a, b) => Some((b, a, false))
      case GreaterThan(a, b) => Some((b, a, true))
      case _ => None
    }
    le.flatMap { case (a, b, strict) =>
      def adj(w: Long) = if (strict) w - 1 else w
      (a, b) match {
        // |x - y| <= w
        case (Abs(Subtract(x, y, _), _), IntLit(w)) =>
          Some((x, y, Some(-adj(w)), Some(adj(w))))
        // (x - y) <= w
        case (Subtract(x, y, _), IntLit(w)) => Some((x, y, None, Some(adj(w))))
        // w <= (x - y)
        case (IntLit(w), Subtract(x, y, _)) =>
          Some((x, y, Some(if (strict) w + 1 else w), None))
        // (x + oa) <= (y + ob)  ⟺  x - y <= ob - oa   (covers bare x <= y)
        case _ =>
          val (ca, oa) = split(a)
          val (cb, ob) = split(b)
          if (ca.foldable || cb.foldable) None
          else Some((ca, cb, None, Some(adj(ob - oa))))
      }
    }
  }

  /** All complete bands in the condition between plans `l` and `r`:
    * (lExpr, rExpr, W) with every matching pair satisfying
    * |lExpr - rExpr| <= W. Bounds from separate conjuncts on the same
    * (x, y) pair are intersected, so BETWEEN-style two-conjunct windows
    * (including asymmetric and shifted ones) qualify.
    */
  private def bandsOf(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Expression, Long)] = {
    // orient so x is from l: flipping the pair negates and swaps bounds
    val oriented = conjuncts.flatMap(boundsOf).flatMap { case (x, y, lo, hi) =>
      if (!integral(x) || !integral(y) || !x.deterministic || !y.deterministic) None
      else if (x.references.subsetOf(l.outputSet) && x.references.nonEmpty &&
        y.references.subsetOf(r.outputSet) && y.references.nonEmpty)
        Some(((x.canonicalized, y.canonicalized), (x, y, lo, hi)))
      else if (x.references.subsetOf(r.outputSet) && x.references.nonEmpty &&
        y.references.subsetOf(l.outputSet) && y.references.nonEmpty)
        Some(((y.canonicalized, x.canonicalized), (y, x, hi.map(-_), lo.map(-_))))
      else None
    }
    oriented.groupBy(_._1).values.toSeq.flatMap { grp =>
      val (x, y, _, _) = grp.head._2
      val los = grp.flatMap(_._2._3)
      val his = grp.flatMap(_._2._4)
      if (los.isEmpty || his.isEmpty) None
      else {
        val (lo, hi) = (los.max, his.min)
        val w = math.max(math.abs(lo), math.abs(hi))
        // lo > hi = always-false predicate (leave the naive plan to emit
        // its empty result); w == 0 = an equality in disguise
        if (lo > hi || w < 1) None else Some((x, y, w))
      }
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression],
                              l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
      case _ => false
    }

  private def binExpr(c: Expression, w: Long): Expression =
    IntegralDivide(Cast(c, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // streaming joins excluded: Spark's stream-stream interval-join
      // machinery consumes the raw range condition for watermark state
      // cleanup — rewriting it away would trade a supported plan for an
      // unsupported one
      case j @ logical.Join(left, right, org.apache.spark.sql.catalyst.plans.Inner,
          Some(cond), hint) if !j.isStreaming && {
        val cs = splitConjunctivePredicates(cond)
        !hasEquiConjunct(cs, left, right) && bandsOf(cs, left, right).nonEmpty
      } =>
        val conjuncts = splitConjunctivePredicates(cond)
        // tightest band if several column pairs qualify
        val (lExpr, rExpr, w) = bandsOf(conjuncts, left, right).minBy(_._3)
        // explode the smaller side: 3 bin rows per input row there, one on
        // the big side (sizeInBytes is the same signal AQE's broadcast
        // decisions start from)
        val explodeLeft = left.stats.sizeInBytes <= right.stats.sizeInBytes
        val (expSide, expExpr, oneSide, oneExpr) =
          if (explodeLeft) (left, lExpr, right, rExpr)
          else (right, rExpr, left, lExpr)
        val base = binExpr(expExpr, w)
        val gen = Explode(CreateArray(Seq(
          Subtract(base, Literal(1L)), base, Add(base, Literal(1L)))))
        val binAttr = AttributeReference("_graft_band_bin", LongType)()
        val exploded = logical.Generate(gen, unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = expSide)
        val oneBin = Alias(binExpr(oneExpr, w), "_graft_band_bin_o")()
        val projected = logical.Project(oneSide.output :+ oneBin, oneSide)
        val (newL, newR) =
          if (explodeLeft) (exploded, projected) else (projected, exploded)
        val joined = logical.Join(newL, newR, org.apache.spark.sql.catalyst.plans.Inner,
          Some(EqualTo(binAttr, oneBin.toAttribute)), hint)
        logical.Project(j.output, logical.Filter(cond, joined))
    }
  }
}

/** SparkSessionExtensions entry point:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * Injects graft's optimizer rules into Catalyst. (Function registration
  * stays in Graft.init, which works on any already-built session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteGroupTopK)
    ext.injectOptimizerRule(_ => RewriteBandJoin)
    ext.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}
