package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Source/sink round trips at sf0.001 plus the partition-pruning check on
  * the partitioned parquet sink.
  */
class SourcesSpec extends SparkSpecBase {

  test("csv round trip is value-exact (incl. doubles)") {
    val got = Sources.csvRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
      .orderBy("p_partkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("json round trip is value-exact") {
    val got = Sources.jsonRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("orc round trip is value-exact") {
    val got = Sources.orcRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/nation.parquet").orderBy("n_nationkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("partitioned parquet read prunes to the filtered partition") {
    val df = Sources.partitionedParquet(spark, sfDir)
    // via Tables.events — a raw parquet read would hit Spark's
    // TIMESTAMP(NANOS) refusal now that the loader's flag is scoped
    val expected = Tables.events(spark, sfDir)
      .where(col("event_type") === "click").count()
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("click", expected)))
    // pruning: the physical scan's selected partitions must be 1
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters in:\n$scan")
  }
}
