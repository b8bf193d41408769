package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._

/** Change-data-capture merge — the lakehouse MERGE INTO / SCD-2 pattern
  * (Delta/Iceberg upsert semantics re-expressed as a plain Spark plan).
  * The reference has nothing in this category (SURVEY.md §2.5): a
  * training-data pipeline that ingests refreshed crawls or re-labeled
  * batches needs exactly this apply-changes step to keep its dimension
  * tables (source registries, license states, quality labels) current
  * without rewriting history.
  *
  * Fixture framing: `customer` is the dimension snapshot (batch 0).
  * Batch 1 is derived deterministically from the fixture itself:
  *   - DELETE for every custkey ≡ 0 (mod [[DeleteMod]]) — account closed;
  *   - UPDATE for every remaining customer with orders — balance folded
  *     forward by their exact DECIMAL order total.
  * Deterministic changes keep the whole pack DuckDB-oracled (no
  * synthesized inputs — builder contract).
  *
  * Scale shape: one shuffle on the merge key for the change aggregation,
  * one key-partitioned window for version chaining — the same two
  * exchanges a real MERGE executes. History rows are (key, version)
  * pairs; nothing is corpus-sized. Money math is DECIMAL end-to-end
  * (exact, associative, bit-identical in DuckDB) and only rendered to
  * DOUBLE at the output boundary — the library-wide convention
  * (Relational.scala).
  */
object Cdc {

  /** custkey ≡ 0 (mod DeleteMod) rows become batch-1 tombstones. */
  val DeleteMod = 97

  /** (key, bal, op, batch) — version history input: batch-0 initial load
    * plus batch-1 updates ('U') and tombstones ('D').
    */
  private def history(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey").as("key"),
      col("c_acctbal").cast(DecimalType(18, 2)).as("bal"))
    val delta = orders(s, d).groupBy(col("o_custkey").as("key"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("delta"))
    val v0 = cust.select(col("key"), col("bal"), lit("U").as("op"),
      lit(0).as("batch"))
    val dels = cust.where(col("key") % DeleteMod === 0)
      .select(col("key"), lit(null).cast(DecimalType(18, 2)).as("bal"),
        lit("D").as("op"), lit(1).as("batch"))
    val upds = cust.where(col("key") % DeleteMod =!= 0)
      .join(delta, "key")
      .select(col("key"),
        (col("bal") + col("delta")).cast(DecimalType(18, 2)).as("bal"),
        lit("U").as("op"), lit(1).as("batch"))
    v0.unionByName(dels).unionByName(upds)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD-2 version history: every version row effective-dated by batch.
    // valid_to = the batch of the NEXT change to the key (lead over the
    // key-partitioned window) — a tombstone closes the prior version
    // without emitting a row of its own. is_current marks open versions.
    "merge_scd2" -> { (s, d) =>
      val w = Window.partitionBy("key").orderBy("batch")
      history(s, d)
        .withColumn("valid_to", lead("batch", 1).over(w))
        .where(col("op") === "U")
        .select(col("key").as("c_custkey"),
          col("bal").cast("double").as("acctbal"),
          col("batch").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("c_custkey", "valid_from")
    },

    // SCD-1 snapshot after the merge: the open versions only — what a
    // plain MERGE INTO (update-in-place + delete) would leave behind.
    "merge_current" -> { (s, d) =>
      val w = Window.partitionBy("key").orderBy("batch")
      history(s, d)
        .withColumn("valid_to", lead("batch", 1).over(w))
        .where(col("op") === "U" && col("valid_to").isNull)
        .select(col("key").as("c_custkey"),
          col("bal").cast("double").as("acctbal"))
        .orderBy("c_custkey")
    },

    // Merge audit: row counts per change class — the reconciliation
    // numbers (inserted/updated/deleted/unchanged) a pipeline logs after
    // every apply-changes run. One aggregation over the same history.
    "merge_audit" -> { (s, d) =>
      val perKey = history(s, d).groupBy("key")
        .agg(max(when(col("op") === "D", 1).otherwise(0)).as("deleted"),
          max(when(col("op") === "U" && col("batch") === 1, 1).otherwise(0))
            .as("updated"))
      perKey
        .select(when(col("deleted") === 1, "deleted")
          .when(col("updated") === 1, "updated")
          .otherwise("unchanged").as("change_class"))
        .groupBy("change_class").agg(count(lit(1)).as("n_keys"))
        .orderBy("change_class")
    },

    // Incremental aggregate-view maintenance: the per-priority order
    // rollup is kept as MERGEABLE partial states (count / DECIMAL sum /
    // min / max), and a delta batch folds in WITHOUT touching base rows —
    // partial states for base (o_orderkey ≢ 0 mod 10) and delta (≡ 0) are
    // computed independently, then one merge agg combines them. The merge
    // is exact because every state is associative (DECIMAL sum, not
    // float); CdcSpec proves merged == full recompute. At 100 TB this is
    // the difference between re-scanning the fact table per refresh and
    // scanning only the delta.
    "incr_agg_merge" -> { (s, d) =>
      val o = orders(s, d).select(col("o_orderpriority"),
        (col("o_orderkey") % 10 === 0).as("is_delta"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
        to_date(col("o_orderdate")).as("day"))
      val partials = o.groupBy("o_orderpriority", "is_delta")
        .agg(count(lit(1)).as("pn"), sum("price").as("psum"),
          min("day").as("pmin"), max("day").as("pmax"))
      partials.groupBy("o_orderpriority")
        .agg(sum("pn").as("n"),
          sum("psum").cast("double").as("total"),
          min("pmin").cast("string").as("first_day"),
          max("pmax").cast("string").as("last_day"),
          count(lit(1)).as("n_partials"))
        .orderBy("o_orderpriority")
    }
  )

  private def histCte: String =
    s"""cust AS (SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
       |         FROM customer),
       |delta AS (SELECT o_custkey AS key,
       |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
       |  FROM orders GROUP BY 1),
       |hist AS (
       |  SELECT key, bal, 'U' AS op, 0 AS batch FROM cust
       |  UNION ALL
       |  SELECT key, CAST(NULL AS DECIMAL(18,2)), 'D', 1 FROM cust
       |  WHERE key % $DeleteMod = 0
       |  UNION ALL
       |  SELECT c.key, CAST(c.bal + d.delta AS DECIMAL(18,2)), 'U', 1
       |  FROM cust c JOIN delta d USING (key) WHERE c.key % $DeleteMod <> 0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "merge_scd2" ->
      s"""WITH $histCte,
         |v AS (SELECT key, bal, op, batch,
         |    lead(batch) OVER (PARTITION BY key ORDER BY batch) AS valid_to
         |  FROM hist)
         |SELECT key AS c_custkey, CAST(bal AS DOUBLE) AS acctbal,
         |  batch AS valid_from, valid_to, valid_to IS NULL AS is_current
         |FROM v WHERE op = 'U' ORDER BY c_custkey, valid_from""".stripMargin,

    "merge_current" ->
      s"""WITH $histCte,
         |v AS (SELECT key, bal, op, batch,
         |    lead(batch) OVER (PARTITION BY key ORDER BY batch) AS valid_to
         |  FROM hist)
         |SELECT key AS c_custkey, CAST(bal AS DOUBLE) AS acctbal
         |FROM v WHERE op = 'U' AND valid_to IS NULL ORDER BY c_custkey""".stripMargin,

    "merge_audit" ->
      s"""WITH $histCte,
         |pk AS (SELECT key,
         |    max(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS deleted,
         |    max(CASE WHEN op = 'U' AND batch = 1 THEN 1 ELSE 0 END) AS updated
         |  FROM hist GROUP BY key)
         |SELECT CASE WHEN deleted = 1 THEN 'deleted'
         |            WHEN updated = 1 THEN 'updated'
         |            ELSE 'unchanged' END AS change_class,
         |  count(*) AS n_keys
         |FROM pk GROUP BY 1 ORDER BY change_class""".stripMargin,

    "incr_agg_merge" ->
      s"""WITH o AS (SELECT o_orderpriority, o_orderkey % 10 = 0 AS is_delta,
         |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         |    o_orderdate::DATE AS day
         |  FROM orders),
         |p AS (SELECT o_orderpriority, is_delta, count(*) AS pn,
         |    sum(price) AS psum, min(day) AS pmin, max(day) AS pmax
         |  FROM o GROUP BY 1, 2)
         |SELECT o_orderpriority, CAST(sum(pn) AS BIGINT) AS n,
         |  CAST(sum(psum) AS DOUBLE) AS total,
         |  CAST(min(pmin) AS VARCHAR) AS first_day,
         |  CAST(max(pmax) AS VARCHAR) AS last_day,
         |  count(*) AS n_partials
         |FROM p GROUP BY 1 ORDER BY o_orderpriority""".stripMargin
  )
}
