package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Winnow

/** Scratch: wn_containment / wn_overlap_pairs — is the md5 selection
  * pipeline recomputed per consumer, and does persisting the df-capped
  * fingerprint relation pay?
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.init(spark)
    val shufRec = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        shufRec.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    import graft.Tables.documents

    def containmentPersist(s: SparkSession, d: String): DataFrame = {
      val fp = Winnow.docFps(documents(s, d).select("doc_id", "text"))
      val wF = Window.partitionBy("fph")
      val filt = fp.withColumn("nd", count(lit(1)).over(wF))
        .where(col("nd") <= Winnow.FpDfCap)
        .select("doc_id", "fph").persist()
      val nf = filt.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      filt.as("a").join(filt.as("b"),
          col("a.fph") === col("b.fph") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .join(nf.select(col("doc_id").as("doc_a"), col("nf").as("nf_a")), "doc_a")
        .join(nf.select(col("doc_id").as("doc_b"), col("nf").as("nf_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_shared"),
          round(col("n_shared").cast("double") /
            least(col("nf_a"), col("nf_b")).cast("double"), 6).as("containment"))
        .orderBy(desc("containment"), col("doc_a"), col("doc_b"))
        .limit(Winnow.TopPairs)
    }

    def run(label: String)(mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      Graft.releaseCaches(spark)
      for (_ <- 1 to 3) {
        shufRec.set(0)
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Graft.releaseCaches(spark)
        Thread.sleep(300)
        println(f"$label%-28s $dt%6.2fs shufRecords=${shufRec.get}")
      }
    }
    run("containment AS-IS")(SparkEntry.queries("wn_containment")(spark, dir))
    run("containment PERSIST")(containmentPersist(spark, dir))
    spark.stop()
  }
}
