package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe GLOBAL ranking. `row_number() OVER (ORDER BY ...)` with no
  * partition key moves the whole relation to one task — the classic
  * single-partition-window cliff (Spark even logs a WindowExec warning).
  * The distributed shape: range-repartition on the sort key, rank WITHIN
  * each partition, then add per-partition offsets computed from a
  * partition-count-sized aggregate (broadcast back). One extra tiny
  * shuffle instead of one giant one.
  */
object Ranking {

  /** Dense 1-based global rank of every row under the total order given by
    * `order` (must be a total order — include a unique tiebreaker). The
    * rank is partitioning-invariant: range boundaries only decide WHERE a
    * row is ranked locally, never its global rank.
    */
  def globalRank(df: DataFrame, order: Seq[Column], numParts: Int = 32): DataFrame = {
    val reserved = Seq("_pid", "_lrn", "_n", "_off", "rank")
    require(!df.columns.exists(reserved.contains),
      s"globalRank: input columns may not include ${reserved.mkString("/")}")
    // materialize the partitioned relation ONCE: local ranks and partition
    // offsets both read `parted`, and correctness requires they observe the
    // SAME sampled range boundaries. Without this the two plan branches
    // only share boundaries via exchange reuse — which can be disabled
    // (spark.sql.exchange.reuse=false) or defeated by canonicalization
    // drift, silently producing inconsistent _pid assignments.
    val parted = df.repartitionByRange(numParts, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val pw = Window.partitionBy("_pid").orderBy(order: _*)
    val local = parted.withColumn("_lrn", row_number().over(pw))
    // partition-count-sized: the cumulative-offset window runs over ≤
    // numParts rows, so its single-partition execution is bounded
    val ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(ow), lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offs), Seq("_pid"))
      .withColumn("rank", col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }

  /** EXCLUSIVE global prefix sum of integral column `value` under the total
    * order `order`: adds `out` = sum(value) over all strictly-preceding
    * rows (0 for the first). Same distributed shape as [[globalRank]]:
    * range-repartition on the order, running sum WITHIN each partition,
    * plus per-partition totals accumulated over a ≤numParts-row aggregate
    * and broadcast back. Replaces the single-task
    * `sum(...) over (ORDER BY ... ROWS UNBOUNDED PRECEDING)` cliff.
    */
  def globalCumSum(df: DataFrame, order: Seq[Column], value: Column, out: String,
                   numParts: Int = 32): DataFrame = {
    val reserved = Seq("_pid", "_lcs", "_n", "_off", out)
    require(!df.columns.exists(reserved.contains),
      s"globalCumSum: input columns may not include ${reserved.mkString("/")}")
    val parted = df.repartitionByRange(numParts, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint() // one physical partitioning feeds BOTH branches
    val pw = Window.partitionBy("_pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("_lcs", coalesce(sum(value).over(pw), lit(0L)))
    val ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy("_pid").agg(sum(value).as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(ow), lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offs), Seq("_pid"))
      .withColumn(out, col("_off") + col("_lcs"))
      .drop("_pid", "_lcs", "_off")
  }
}
