package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Skyline (Pareto frontier) operator — all rows not DOMINATED on a
  * (minimize, maximize) dimension pair: y dominates x iff y.min <= x.min,
  * y.max >= x.max, and at least one is strict. The multi-criteria
  * shortlist query ("cheapest-but-largest parts") that SQL engines
  * integrate as a first-class operator (cf. "Integration of Skyline
  * Queries into Spark SQL", EDBT 2023 — listed in PAPERS.md); the
  * reference has nothing in this category (SURVEY.md §2.5).
  *
  * Scale shape — the classic TWO-PHASE distributed skyline:
  *   1. LOCAL skyline inside each of `SkylineShards` deterministic hash
  *      shards (window partitioned by the shard key): dominance is
  *      transitive, so every globally non-dominated row survives its
  *      shard's local pass, and each shard discards its own dominated
  *      mass BEFORE anything is collected onto one node. The global sort
  *      the textbook window formulation needs never happens on the full
  *      input.
  *   2. GLOBAL skyline over the union of local survivors — typically
  *      orders of magnitude smaller than the input (the frontier of a
  *      2-D point set is ~O(log n) under mild distributions).
  *
  * Per-phase formulation is a grouped running max, not a self-join: one
  * row per distinct minCol value carrying the group max, a rows-frame
  * running max over strictly-cheaper groups, and a semi-join back. Exact
  * on the raw column values (no arithmetic, so doubles compare
  * bit-identically across engines); SkylineSpec cross-checks against
  * brute force on random points.
  */
object Skyline {

  val SkylineShards = 32

  /** One dominance pass within each value of `shardCol`: group to one row
    * per (shard, minCol) carrying the group's max — the running max over
    * STRICTLY-cheaper groups is then an exact rows-frame window (keys are
    * distinct, so the frame is deterministic; a RANGE -1 frame would be
    * wrong on continuous values — "cheaper by >= 1.0", not "cheaper").
    * x survives iff no strictly-cheaper group reaches its max and it IS
    * its own group's max.
    */
  private def pass(in: DataFrame, shardCol: String, minCol: String,
                   maxCol: String): DataFrame = {
    val g = in.groupBy(col(shardCol), col(minCol))
      .agg(max(col(maxCol)).as("_gmax"))
    val w = Window.partitionBy(col(shardCol)).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gg = g.withColumn("_prevmax", max(col("_gmax")).over(w))
    in.join(gg, Seq(shardCol, minCol))
      .where((col("_prevmax").isNull || col("_prevmax") < col(maxCol)) &&
        col("_gmax") <= col(maxCol))
      .drop("_gmax", "_prevmax")
  }

  /** Rows of `df` not dominated under (minimize `minCol`, maximize
    * `maxCol`). `shardKey` must be a deterministic per-row expression.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                shardKey: Column): DataFrame = {
    // phase 1: shard-local skylines (parallel); phase 2: exact global
    // skyline over the shrunken union (one tiny partition)
    val local = pass(df.withColumn("_shard", shardKey), "_shard", minCol, maxCol)
    pass(local.withColumn("_shard", lit(0)), "_shard", minCol, maxCol)
      .select(df.columns.map(col).toSeq: _*) // joins moved the keys first
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pareto-optimal parts: no other part is both cheaper and larger.
    "q_skyline_parts" -> { (s, d) =>
      skyline2d(part(s, d).select("p_partkey", "p_retailprice", "p_size"),
        "p_retailprice", "p_size",
        pmod(xxhash64(col("p_partkey")), lit(SkylineShards)))
        .orderBy("p_partkey")
    }
  )

  val oracles: Map[String, String] = Map(
    // the obviously-correct quadratic NOT EXISTS definition
    "q_skyline_parts" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part x
        |WHERE NOT EXISTS (SELECT 1 FROM part y
        |  WHERE y.p_retailprice <= x.p_retailprice AND y.p_size >= x.p_size
        |    AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size))
        |ORDER BY p_partkey""".stripMargin
  )
}
