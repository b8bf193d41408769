package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler — current target: the r11 additions' floors.
  * Separates one-time plan/codegen cost from steady-state execution by
  * running each query cold, then repeatedly in the same session (the
  * bench's per-query discipline releases caches between runs, mirrored
  * here), so a floor dominated by Janino compilation of a geometry the
  * sf0.001 warm pass never sees (the SIZED queries build a different
  * plan per corpus size) shows up as cold >> warm.
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)

    def time(label: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        Graft.releaseCaches(spark)
        println(f"$label%-32s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      }
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    // q_winsorize pass-1 A/B: percentile_cont ObjectAgg buffering vs the
    // globalRank discipline (rank within group = global rank - group
    // offset; interpolate at pos = p*(n-1) with Spark's own formula)
    def winsorizeRank(): DataFrame = {
      val s2 = spark
      val vals = Tables.lineitem(s2, dir)
        .select(col("l_returnflag").as("rf"), col("l_extendedprice").as("x"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = graft.operators.Ranking.globalRank(
        vals, Seq(asc("rf"), asc("x"), asc("l_orderkey"), asc("l_linenumber")))
      val counts = vals.groupBy("rf").agg(count(lit(1)).as("n"))
      val ow = Window.orderBy("rf").rowsBetween(Window.unboundedPreceding, -1)
      val offs = counts.withColumn("off", coalesce(sum("n").over(ow), lit(0L)))
      val targets = offs.select(col("rf"), col("n"), col("off"),
          explode(array(lit(0.01), lit(0.99))).as("p"))
        .select(col("rf"), col("p"),
          (col("p") * (col("n") - 1).cast("double")).as("pos"), col("off"))
        .select(col("rf"), col("p"),
          (col("pos") - floor(col("pos"))).as("frac"),
          explode(array(
            struct((floor(col("pos")).cast("long") + 1 + col("off")).as("rank"),
              lit("lo").as("role")),
            struct((ceil(col("pos")).cast("long") + 1 + col("off")).as("rank"),
              lit("hi").as("role")))).as("t"))
        .select(col("rf"), col("p"), col("frac"),
          col("t.rank").as("rank"), col("t.role").as("role"))
      val picked = ranked.select(col("rank"), col("x"))
        .join(broadcast(targets), Seq("rank"))
        .groupBy(col("rf"), col("p"), col("frac"))
        .agg(min(when(col("role") === "lo", col("x"))).as("xlo"),
          min(when(col("role") === "hi", col("x"))).as("xhi"))
        .select(col("rf"), col("p"),
          (col("xlo").cast("double") + col("frac") *
            (col("xhi").cast("double") - col("xlo").cast("double"))).as("bound"))
      val b = picked.groupBy(col("rf"))
        .agg(min(when(col("p") === 0.01, col("bound"))).as("p01"),
          min(when(col("p") === 0.99, col("bound"))).as("p99"))
      Tables.lineitem(s2, dir)
        .select(col("l_returnflag").as("rf2"), col("l_extendedprice").as("x"))
        .join(broadcast(b), col("rf2") === col("rf"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("x") < col("p01"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("x") > col("p99"), 1L).otherwise(0L)).as("n_high"),
          round(max(col("p01")), 6).as("p01_r"),
          round(max(col("p99")), 6).as("p99_r"),
          round((sum(when(col("x") >= col("p01") && col("x") <= col("p99"),
              col("x").cast(org.apache.spark.sql.types.DecimalType(12, 2))))
                .cast("double")
              + sum(when(col("x") < col("p01"), 1L).otherwise(0L)) * max(col("p01"))
              + sum(when(col("x") > col("p99"), 1L).otherwise(0L)) * max(col("p99")))
            / count(lit(1)), 6).as("wmean"))
        .orderBy("rf")
    }
    // nb scorer: occurrence-grain explode x classes vs (doc, tok)
    // count-grain (sum lp per occurrence == sum cnt*lp, decimal-exact)
    def nbCountGrain(): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      import graft.operators.{Learn, TextHash}
      val m = Learn.nbModel(spark, dir)
      val lp = m.cc.join(broadcast(m.ctot), "cls").crossJoin(broadcast(m.v))
        .select(col("cls"), col("tok"),
          round(log((col("cnt") + 1).cast("double") /
            (col("n_c") + col("v")).cast("double")), 6).as("lp"))
      val lpu = m.ctot.crossJoin(broadcast(m.v))
        .select(col("cls"),
          round(log(lit(1L).cast("double") /
            (col("n_c") + col("v")).cast("double")), 6).as("lpu"))
      val scores = Tables.documents(spark, dir)
        .select(col("doc_id"), explode(TextHash.toks(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tcnt"))
        .crossJoin(broadcast(m.pri.select("cls")))
        .join(broadcast(lp), Seq("cls", "tok"), "left")
        .join(broadcast(lpu), Seq("cls"))
        .select(col("doc_id"), col("cls"),
          (coalesce(col("lp"), col("lpu")).cast(DecimalType(18, 6)) *
            col("tcnt")).as("lpc"))
        .groupBy("doc_id", "cls")
        .agg(sum(col("lpc")).as("s"))
        .join(broadcast(m.pri), "cls")
        .select(col("doc_id"), col("cls"),
          (col("s") + col("lp_prior").cast(DecimalType(18, 6))).cast("double")
            .as("score"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cls").asc)
      scores.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .join(Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang"), col("cls").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }
    time("wz asIs")(SparkEntry.queries("q_winsorize")(spark, dir))
    time("wz rank")(winsorizeRank())
    val a = SparkEntry.queries("q_winsorize")(spark, dir).collect().map(_.toString).sorted
    val c = winsorizeRank().collect().map(_.toString).sorted
    println(s"WZ EQUAL=${a.sameElements(c)}")
    if (!a.sameElements(c)) { a.foreach(println); println("----"); c.foreach(println) }
    time("nb asIs")(SparkEntry.queries("nb_lang_confusion")(spark, dir))
    time("nb cntGrain")(nbCountGrain())
    val n1 = SparkEntry.queries("nb_lang_confusion")(spark, dir).collect().map(_.toString).sorted
    val n2 = nbCountGrain().collect().map(_.toString).sorted
    println(s"NB EQUAL=${n1.sameElements(n2)}")
    if (!n1.sameElements(n2)) { n1.foreach(println); println("----"); n2.foreach(println) }
    spark.stop()
  }
}
