package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join utilities for skew: explicit key salting.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions at
  * runtime and covers most cases; explicit salting is the tool when one
  * hot key dominates so badly that even split partitions overwhelm a task,
  * or when AQE is unavailable (streaming-static joins).
  *
  * Shape: the big side gets a deterministic salt in [0, factor) derived
  * from non-key columns (NOT rand() — keeps retries/speculative tasks
  * consistent); the small side is exploded `factor` times so every
  * (key, salt) bucket finds its match. Result is row-identical to the
  * unsalted join (proved in JoinsSpec); the shuffle key becomes
  * (key, salt), spreading a hot key over `factor` reducers.
  */
object Joins {

  /** Inner equi-join of `big` and `small` on `key`, salted `factor` ways.
    * `saltSource` must be deterministic per row (e.g. a row id column);
    * it only affects distribution, never the result.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, factor: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(factor)))
    val exploded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Range (band) join — an operator Spark has no native optimized form
    * of: all (left, right) pairs with the same `key` whose timestamps are
    * within `windowSec` of each other. A naive `|l.ts - r.ts| <= W` join
    * condition gives Catalyst nothing to hash on and degenerates to a
    * per-key nested loop; at 100 TB that is the scale-killer.
    *
    * Scale shape: BIN both sides into width-W buckets of epoch time,
    * explode the LEFT side into its bin and both neighbors, equi-join on
    * (key, bin), and apply the exact band predicate last. Any in-window
    * pair is at most one bin apart, so candidates are complete; the right
    * side keeps a single bin per row, so each candidate pair meets exactly
    * once (no distinct needed). The shuffle key is (key, bin) — bounded
    * bucket sizes, no nested loop anywhere (PlanSpec-locked).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    val reserved = Seq("_bin", "_lus", "_rus")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"rangeJoin: input columns may not include ${reserved.mkString("/")}")
    val w = windowSec * 1000000L // micros
    // integer `div`, not `/`: column division is double-typed and floor
    // rounding near bin edges would mis-bucket (epoch micros are positive,
    // so div == floor here)
    val lb = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bin",
        explode(array(Seq(-1L, 0L, 1L).map(d => expr(s"_lus div $w") + d): _*)))
    val rb = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bin", expr(s"_rus div $w"))
    lb.join(rb, Seq(key, "_bin"))
      .where(abs(col("_lus") - col("_rus")) <= w)
      .drop("_bin", "_lus", "_rus")
  }

  /** As-of (backward) join — an operator Spark has no native form of: for
    * every left row, the latest `rightVal` whose `rightTs` <= `leftTs`
    * within the same `key` (NULL when no prior right row exists).
    *
    * Implemented the scalable way: tag both sides, UNION, and take a
    * running `last(ignoreNulls)` over one (key, ts, side)-ordered window —
    * a single shuffle on `key`, O((|L|+|R|) log) per partition. The naive
    * inequality join is O(|L|x|R|) per key and is exactly what NOT to ship
    * at 100 TB.
    *
    * Right rows must be unique per (key, rightTs) — pre-aggregate
    * otherwise, or ties make "the latest value" ill-defined (DuckDB's
    * native ASOF JOIN, used as the oracle, has the same requirement).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVal: String): DataFrame = {
    val lCols = left.columns
    val reserved = Seq("_ts", "_side", "_v")
    require(!lCols.exists(c => reserved.contains(c) || c == rightVal),
      s"asofJoin: left columns may not include ${reserved.mkString("/")} or '$rightVal'")
    // The carried value is a STRUCT of (ts, val), not the bare val: a
    // matched right row whose value is NULL must still win over an older
    // non-null row (bare last(ignoreNulls) would skip it and silently
    // return the stale value). Right rows with NULL rightTs are unmatchable
    // by ts <= semantics and are dropped (they would otherwise sort
    // nulls-first and phantom-match every left row).
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t", right.schema(rightTs).dataType),
          org.apache.spark.sql.types.StructField("v", right.schema(rightVal).dataType)))))
    val r = right
      .where(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(col(rightTs).as("t"), col(rightVal).as("v")).as("_v"))
    val u = l.select((Seq(col(key), col("_ts"), col("_side"), col("_v")) ++
      lCols.filterNot(_ == key).map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at the same timestamp, so a
    // same-instant right value is visible to the left row (ts <= semantics)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_last", last(col("_v"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((lCols.map(c => col(c)) :+ col("_last").getField("v").as(rightVal)): _*)
  }

  /** Interval-overlap join — pairs every left interval [ls, le] with every
    * right interval [rs, re] that overlaps it ([ls,le] ∩ [rs,re] ≠ ∅,
    * bounds inclusive, non-negative integer coordinates), each pair emitted
    * EXACTLY once. The interval×interval generalization of rangeJoin's
    * point-in-band shape, and like it a binned EQUI-join — stock Spark
    * plans the raw overlap predicate (`ls <= re AND rs <= le`) as a
    * nested-loop cross product, the classic 100 TB scale killer.
    *
    * Mechanics: each interval is replicated into every width-`binW` bin it
    * touches (`sequence(s div W, e div W)`), the join runs on bin
    * equality, and the duplicate hits of a pair that shares several bins
    * are killed WITHOUT a distinct: the pair is kept only in its canonical
    * bin, the one containing max(ls, rs) — a bin both intervals touch iff
    * they overlap at all, and unique per pair by construction.
    *
    * Scale levers: replication factor is interval_length/binW + 1 per row
    * (pick binW near the typical interval length); bin hotness is bounded
    * by how many intervals cross one bin — salt or split a pathological
    * bin the same way the blocked joins handle mega-blocks.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, binW: Long): DataFrame = {
    require(binW > 0, "intervalOverlapJoin: binW must be positive")
    val reserved = Seq("_bin")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      "intervalOverlapJoin: input columns may not include _bin")
    val lb = left.withColumn("_bin",
      explode(sequence(expr(s"ls div $binW"), expr(s"le div $binW"))))
    val rb = right.withColumn("_bin",
      explode(sequence(expr(s"rs div $binW"), expr(s"re div $binW"))))
    lb.join(rb, Seq("_bin"))
      .where(col("ls") <= col("re") && col("rs") <= col("le") &&
        col("_bin") === expr(s"greatest(ls, rs) div $binW"))
      .drop("_bin")
  }
}
