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

  test("link_golden_record: clusters are transitive, masters maximize acctbal, fields reconcile") {
    val out = Linkage.queries("link_golden_record")(spark, linkDir).collect()
    assert(out.nonEmpty)
    val cust = Tables.customer(spark, linkDir)
      .select("c_custkey", "c_name", "c_acctbal").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    // independent transitive closure from the same fuzzy-pair definition
    val byBlk = cust.toSeq.groupBy { case (_, (n, _)) => (n.length, n.takeRight(3)) }
    val parent = scala.collection.mutable.Map(cust.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for ((_, mem) <- byBlk; Seq((ka, (na, _)), (kb, (nb, _))) <- mem.sortBy(_._1).combinations(2))
      if (lev(na, nb) <= Linkage.MaxDist) {
        val (ra, rb) = (find(ka), find(kb)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val clusters = cust.keys.groupBy(find).collect { case (_, ms) if ms.size >= 2 =>
      val m = ms.toSeq; m.min -> m
    }.toMap
    assert(out.length == clusters.size)
    out.foreach { r =>
      val (cid, n, mk, mn, mb) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))
      val mem = clusters(cid)
      assert(n == mem.size)
      assert(mb == mem.map(cust(_)._2).max)
      // master: highest balance, ties to lowest key
      val best = mem.toSeq.map(k => (k, cust(k)._2)).sortBy { case (k, b) => (-b, k) }.head._1
      assert(mk == best && mn == cust(best)._1)
    }
  }

  test("globalRank equals the single-window row_number under the same order") {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    val got = graft.operators.Ranking
      .globalRank(c, Seq(col("c_name"), col("c_custkey")), numParts = 7)
      .select("c_custkey", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c_name"), col("c_custkey"))
    val want = c.withColumn("rank", row_number().over(w).cast("long"))
      .select("c_custkey", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("globalCumSum: equals the single-window prefix sum at ANY partition count") {
    val li = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("v")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("v").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = li.withColumn("cum", coalesce(sum("cnt").over(w), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (np <- Seq(1, 7, 32)) {
      val got = graft.operators.Ranking
        .globalCumSum(li, Seq(col("v")), col("cnt"), "cum", numParts = np)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"numParts=$np")
    }
  }

  test("globalRank stays correct with exchange reuse DISABLED") {
    // ranks and offsets both derive from one materialized partitioning, so
    // correctness must not depend on the two branches' exchanges being
    // reused as one — prove it with reuse off
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
      val got = graft.operators.Ranking
        .globalRank(c, Seq(col("c_name"), col("c_custkey")), numParts = 7)
        .select("c_custkey", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c_name"), col("c_custkey"))
      val want = c.withColumn("rank", row_number().over(w).cast("long"))
        .select("c_custkey", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
    } finally spark.conf.unset("spark.sql.exchange.reuse")
  }

  test("sorted-neighborhood candidate join plans as a binned equi-join") {
    val df = graft.operators.Linkage.queries("link_sorted_neighborhood")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(df.count() > 0) // non-vacuous on the fixture
  }
}
