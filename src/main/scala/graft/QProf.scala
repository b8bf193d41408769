package graft

import org.apache.spark.sql.SparkSession

/** One-off stage profiler (scratch main — retargeted per investigation).
  * Current target: does running a query at sf0.001 pre-compile the
  * generated code the SAME query at sf0.1 needs (codegen-cache warm via a
  * tiny scale factor)? Compare cold sf0.1 first-runs vs sf0.001-warmed
  * sf0.1 first-runs for representative floor queries.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val warm = "/root/testdata/sf0.001"
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$d/$t.parquet").count()
      spark.read.parquet(s"$warm/$t.parquet").count()
    }
    Tables.events(spark, d).count(); Tables.events(spark, warm).count()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cold = Seq("text_stats", "q_math_funcs", "ts_gapfill", "q_running_sum",
      "q_semi_join", "q_date_agg", "q_array_funcs", "dedup_exact")
    val warmed = Seq("text_langid", "q_window_funcs2", "ts_cusum", "q_rollup",
      "q_anti_join", "q_datetime_funcs", "q_map_funcs", "dedup_minhash_stats")
      .filter(SparkEntry.queries.contains)
    println(s"warmed set present: $warmed")
    // control group: straight cold at sf0.1
    for (name <- cold) {
      val dt = t {
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      Graft.releaseCaches(spark)
      println(f"COLD  $name%-22s $dt%.3f")
    }
    // experiment group: warm at sf0.001 first, then time at sf0.1
    for (name <- warmed) {
      val tw = t {
        try SparkEntry.queries(name)(spark, warm)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"WARMFAIL $name: ${e.getMessage.take(80)}") }
      }
      Graft.releaseCaches(spark)
      val dt = t {
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      Graft.releaseCaches(spark)
      println(f"WARMED $name%-22s warmCost=$tw%.3f timed=$dt%.3f")
    }
    // and re-time the cold group now that they ran once (identical source)
    for (name <- cold) {
      val dt = t {
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      Graft.releaseCaches(spark)
      println(f"RERUN $name%-22s $dt%.3f")
    }
    spark.stop()
  }
}
