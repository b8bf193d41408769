package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextHash._

/** One-off stage profiler for the dedup subtrees. */
object QProf {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.documents(spark, d)
    time("warmup-count")(docs.count())
    time("shingle-rows")(shingleRows(docs.select("doc_id", "text")).count())
    val exploded = shingleRows(docs.select("doc_id", "text"))
      .select(col("doc_id"), (h60(col("sh")) % 2147483647L).as("h"))
    time("shingle-md5")(exploded.agg(sum("h")).count())
    time("sig-32agg") {
      val aggs = (0 until 32).map(j => min((col("h") * (j * 1000003L + 7L)) % 2147483647L).as(s"s$j"))
      exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    time("sig-32agg-again") {
      val aggs = (0 until 32).map(j => min((col("h") * (j * 1000003L + 7L)) % 2147483647L).as(s"s$j"))
      exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).count()
    }
    spark.stop()
  }
}
