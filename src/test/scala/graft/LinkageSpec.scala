package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

class LinkageSpec extends SparkSpecBase {

  // sf0.001 has 150 customers — the (length, 3-char-suffix) blocking key
  // makes every block a singleton there (no candidate pairs at all), so
  // the linkage invariants need the 1500-customer fixture
  private val linkDir = "/root/testdata/sf0.01"

  test("link_fuzzy_neighbors: symmetric relation, bounded distances, closest is sane") {
    val res = Linkage.queries("link_fuzzy_neighbors")(spark, linkDir)
    res.persist()
    assert(res.count() > 0)
    // levenshtein and blocking are symmetric -> total directed pair count is even
    val tot = res.agg(sum("n_close")).head.getLong(0)
    assert(tot % 2 == 0)
    assert(res.where(col("closest_dist") > Linkage.MaxDist ||
      col("closest_dist") < 1).count() == 0)
    assert(res.where(col("closest_key") === col("custkey")).count() == 0)
    res.unpersist()
  }

  test("link_block_stats: blocks partition the table, pair math is exact") {
    val res = Linkage.queries("link_block_stats")(spark, linkDir)
    res.persist()
    val nCust = Tables.customer(spark, linkDir).count()
    assert(res.agg(sum("n")).head.getLong(0) == nCust)
    assert(res.where(col("n_pairs") =!= col("n") * (col("n") - 1) / 2).count() == 0)
    res.unpersist()
  }
}
