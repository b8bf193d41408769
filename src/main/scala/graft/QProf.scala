package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler — current target: profile_orders' Expand x6
  * multi-distinct vs a per-column union of tiny single-column aggregates.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    // mirror of Profile.ordersCols rendering (strings pass through; the
    // decimal/date columns render to comparable strings there — for the
    // A/B only wall time matters, equality is checked on the real path)
    val df0 = Tables.orders(spark, dir)

    def asIs(): DataFrame = SparkEntry.queries("profile_orders")(spark, dir)

    def perCol(): DataFrame = {
      val colsQ = df0.columns.toSeq
      val nRows = df0.agg(count(lit(1)).as("n_rows"))
      colsQ.map { n =>
        df0.select(col(n)).groupBy(col(n)).agg(count(lit(1)).as("_c"))
          .agg(
            sum(when(col(n).isNull, col("_c")).otherwise(0L)).as("n_nulls"),
            count(when(col(n).isNotNull, lit(1))).as("n_distinct"),
            min(col(n)).cast("string").as("min_val"),
            max(col(n)).cast("string").as("max_val"))
          .select(lit(n).as("col_name"), col("n_nulls"), col("n_distinct"),
            col("min_val"), col("max_val"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(nRows))
        .orderBy("col_name")
    }

    def time(label: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save()
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    }
    time("asIs")(asIs())
    time("perCol")(perCol())

    // wn_fingerprints: Expand x2 multi-distinct vs distinct-first.
    // Selection emits exactly ONE (gpos, fph) per (doc_id, gi) — so
    // distinct triples == distinct (doc_id, gi) grain, and n_windows
    // over the deduped triples is a plain count.
    locally {
      import graft.operators.Winnow
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      def asIsWn() = SparkEntry.queries("wn_fingerprints")(spark, dir)
      def distinctFirst() = {
        val tri = Winnow.globalSelections(docs).distinct()
        tri.groupBy("doc_id")
          .agg(count(lit(1)).as("n_windows"),
            countDistinct(col("gpos"), col("fph")).as("n_fp"))
          .withColumn("density",
            round(col("n_fp").cast("double") / col("n_windows").cast("double"), 6))
          .orderBy("doc_id")
      }
      time("wn asIs")(asIsWn())
      time("wn distFirst")(distinctFirst())
      val a = asIsWn().collect().map(_.toString).sorted
      val b = distinctFirst().collect().map(_.toString).sorted
      println(s"WN EQUAL=${a.sameElements(b)}")
    }
    spark.stop()
  }
}
