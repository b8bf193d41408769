package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Statistics

/** Row-count statistics for the custom whole-operator logical nodes.
  *
  * Spark's stats visitors (`SizeInBytesOnlyStatsPlanVisitor` /
  * `BasicStatsPlanVisitor`) only consult `computeStats()` on LEAF nodes;
  * an unknown unary node falls back to the child's size estimate. Before
  * round 7 that meant a post-rewrite GroupTopK/MaxPerKey result carried
  * its CHILD's (much larger) estimate into join-side selection, so a
  * top-k result that easily fits under the broadcast threshold could
  * still plan as a shuffle join. The nodes therefore override `stats`
  * directly with the bound their semantics guarantee:
  *
  *   GroupTopK  ≤ k × distinct(group keys)
  *   MaxPerKey  ≈ distinct(group keys)   (plus extreme ties)
  *
  * Distinct-key counts come from CBO column statistics (ANALYZE … FOR
  * COLUMNS) via the independence-assumption product — the same estimate
  * stock aggregates use — capped at the child's row count. Without
  * column stats the child's statistics pass through unchanged (never a
  * fabricated bound).
  */
object PlanStats {

  /** Product of the grouping attributes' distinct counts, when every
    * grouping expression is an attribute with column stats; `Some(1)` for
    * the global (no-key) case. None ⇒ no safe estimate.
    */
  def distinctKeys(groupExprs: Seq[Expression], cs: Statistics): Option[BigInt] = {
    if (groupExprs.isEmpty) Some(BigInt(1))
    else {
      val counts = groupExprs.map {
        case a: Attribute => cs.attributeStats.get(a).flatMap(_.distinctCount)
        case _ => None
      }
      if (counts.forall(_.isDefined)) Some(counts.map(_.get).product)
      else None
    }
  }

  /** Child statistics shrunk to `rowBound` output rows (capped at the
    * child's own row count), sized by the child's per-row byte estimate
    * plus `extraPerRow` for appended columns. Falls back to the child's
    * statistics when no bound is known.
    */
  def bounded(cs: Statistics, rowBound: Option[BigInt],
              extraPerRow: Int): Statistics =
    rowBound match {
      case Some(bound) =>
        val rows = cs.rowCount.map(bound.min).getOrElse(bound).max(0)
        val perRow = cs.rowCount.filter(_ > 0)
          .map(n => cs.sizeInBytes / n).getOrElse(BigInt(64)) + extraPerRow
        Statistics(sizeInBytes = (rows * perRow).max(1),
          rowCount = Some(rows), attributeStats = cs.attributeStats)
      case None => cs
    }
}
