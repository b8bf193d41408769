package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: containmentPairs stage split (candidate mass,
  * verify join strategy) — written while chasing the r12-continuation
  * array-verify regression on this one query.
  * Usage: tools/run_main.sh graft.ContainProf [sfDir]
  */
object ContainProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs  ($r)")
    }
    // bench-faithful COLD pass first: no pre-materialized caches, noop
    // sink, adaptive plan inspected post-execution
    for (rep <- 1 to 2) {
      val full0 = operators.Dedup.containmentPairs(docs)
      val t0 = System.nanoTime()
      full0.write.format("noop").mode("overwrite").save()
      println(f"COLD_full rep$rep ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      println("cold join ops: " +
        "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
          .findAllIn(full0.queryExecution.executedPlan.toString)
          .toSeq.groupBy(identity).view.mapValues(_.size).toMap)
      Graft.releaseCaches(spark)
    }
    for (rep <- 1 to 2) {
      println(s"-- rep $rep")
      val e = operators.Dedup.shingleIndex(docs).persist()
      timed("e")(e.count())
      val st = operators.Dedup.prefixState(e).persist()
      timed("st")(st.count())
      val pref = operators.Dedup.prefixRows(e, 4, 5)
      timed("pref")(pref.count())
      val cand = pref.as("a")
        .join(e.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      timed("cand_raw")(cand.count())
      val cd = cand.distinct().persist()
      timed("cand_distinct")(cd.count())
      timed("full")(operators.Dedup.containmentPairs(docs).count())
      val full = operators.Dedup.containmentPairs(docs)
      val plan = full.queryExecution.executedPlan.toString
      println("join ops: " + "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
        .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
      Graft.releaseCaches(spark)
    }
    spark.stop()
  }
}
