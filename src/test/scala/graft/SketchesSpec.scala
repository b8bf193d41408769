package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, functions => F}

import graft.functions.CountMinSketchAgg
import graft.operators.Sketches

class SketchesSpec extends SparkSpecBase {

  test("cms_matrix: every row of the sketch conserves the total token count") {
    val cells = Sketches.queries("cms_matrix")(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("t")).count()
    val byRow = cells.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byRow.keySet == (0 until CountMinSketchAgg.Depth).toSet)
    byRow.values.foreach(s => assert(s == total))
    assert(cells.forall(_.getLong(2) > 0))
    assert(cells.forall(r => r.getInt(1) >= 0 && r.getInt(1) < CountMinSketchAgg.Width))
  }

  test("cms merge is partition-order independent (1 vs many partitions)") {
    import spark.implicits._
    val cms = F.udaf(CountMinSketchAgg, Encoders.STRING)
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val one = toks.coalesce(1).agg(cms($"tok")).head.getSeq[Long](0)
    val many = toks.repartition(16).agg(cms($"tok")).head.getSeq[Long](0)
    assert(one == many)
  }

  test("cms_estimates: one-sided error — never underestimates, exact on heavy hitters") {
    val est = Sketches.queries("cms_estimates")(spark, sfDir).collect()
    assert(est.length == 10)
    est.foreach { r =>
      assert(r.getBoolean(3), s"underestimate on ${r.getString(0)}")
      assert(r.getLong(2) >= r.getLong(1))
    }
    // local reference for the bucket function on a known token
    val j0 = CountMinSketchAgg.bucket(0, "the")
    assert(j0 >= 0 && j0 < CountMinSketchAgg.Width)
  }
}
