package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** SCD-2 merge invariants — the structural contract of an apply-changes
  * run, checked independently of the DuckDB hash compare.
  */
class CdcSpec extends SparkSpecBase {

  test("merge_scd2: version chains are well-formed") {
    val scd2 = Cdc.queries("merge_scd2")(spark, sfDir)
    scd2.persist()
    assert(scd2.count() > 0)
    // exactly one current version per key, or zero for deleted keys
    val perKey = scd2.groupBy("c_custkey")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"),
        count(lit(1)).as("n_versions"))
    perKey.persist()
    assert(perKey.where(col("n_current") > 1).count() == 0)
    // deleted keys: closed batch-0 version only, no current row
    val deleted = scd2.where(col("c_custkey") % Cdc.DeleteMod === 0)
    assert(deleted.where(col("is_current")).count() == 0)
    assert(deleted.where(col("valid_to") =!= 1).count() == 0)
    // is_current <=> valid_to IS NULL (definition round-trip)
    assert(scd2.where(col("is_current") =!= col("valid_to").isNull).count() == 0)
    // versions are effective-dated in order: valid_to > valid_from
    assert(scd2.where(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count() == 0)
    perKey.unpersist()
    scd2.unpersist()
  }

  test("merge_current == the open versions of merge_scd2") {
    val scd2 = Cdc.queries("merge_scd2")(spark, sfDir)
    val current = Cdc.queries("merge_current")(spark, sfDir)
    val open = scd2.where(col("is_current"))
      .select("c_custkey", "acctbal")
    assert(current.exceptAll(open).count() == 0)
    assert(open.exceptAll(current).count() == 0)
    // no deleted key survives into the snapshot
    assert(current.where(col("c_custkey") % Cdc.DeleteMod === 0).count() == 0)
  }

  test("merge_audit classes partition the key space") {
    val audit = Cdc.queries("merge_audit")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nKeys = graft.Tables.customer(spark, sfDir).count()
    assert(audit.values.sum == nKeys)
    assert(audit.getOrElse("deleted", 0L) > 0)
    assert(audit.getOrElse("updated", 0L) > 0)
  }
}
