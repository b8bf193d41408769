package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Salted join: result multiset identical to the plain join; shuffle key
  * actually includes the salt.
  */
class JoinsSpec extends SparkSpecBase {

  test("saltedJoin result is identical to the unsalted join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    val salted = Joins.saltedJoin(li, sup, "l_suppkey",
        saltSource = col("l_orderkey") * 10 + col("l_linenumber"), factor = 8)
      .select(plain.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    assert(salted === plain)
  }

  test("salted join shuffles on (key, salt)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_linenumber")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey").withColumnRenamed("s_suppkey", "l_suppkey")
      // big enough to avoid auto-broadcast? force shuffle join via hint
      .hint("shuffle_hash")
    val j = Joins.saltedJoin(li, sup, "l_suppkey", col("l_orderkey"), factor = 4)
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"salt column missing from plan:\n$plan")
  }
}
