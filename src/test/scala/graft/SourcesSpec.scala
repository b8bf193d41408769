package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Source/sink round trips at sf0.001 plus the partition-pruning check on
  * the partitioned parquet sink.
  */
class SourcesSpec extends SparkSpecBase {

  test("csv round trip is value-exact (incl. doubles)") {
    val got = Sources.csvRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
      .orderBy("p_partkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("json round trip is value-exact") {
    val got = Sources.jsonRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("orc round trip is value-exact") {
    val got = Sources.orcRoundtrip(spark, sfDir)
    val want = spark.read.parquet(s"$sfDir/nation.parquet").orderBy("n_nationkey")
    assert(got.collect().toSeq === want.collect().toSeq)
  }

  test("synth DSv2: doc_id range absorbed by the generator, text pruned at the source") {
    val df = Sources.synthPushdown(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // pushed range shows in the Scan description — ids [100,1100) only
    assert(plan.contains("ids=[100,1100)"), s"range not pushed:\n$plan")
    // text is never generated (pruned columns listed in the description)
    val colsPart = plan.split("cols=")(1).split("]")(0)
    assert(!colsPart.contains("text"), s"text not pruned: $colsPart")
    // generator correctness: exactly 1000 ids survive, langs partition them
    assert(df.agg(sum("n")).head.getLong(0) == 1000L)
    // row face agrees with the local row model
    val rows = Sources.synthRows(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == graft.sources.SynthDocs.langOf(id))
      assert(r.getString(2) == graft.sources.SynthDocs.textOf(id))
      assert(r.getLong(3) == graft.sources.SynthDocs.nTokens(id))
      assert(r.getString(2).split(" ").length.toLong == r.getLong(3))
    }
  }

  test("synth DSv2: ungrouped count/min/max absorbed by the scan (agg pushdown)") {
    val df = Sources.synthAggPushdown(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("agg=pushed"), s"aggregation not pushed:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown should leave no aggregate operator:\n$plan")
    assert(df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      == Seq((1400L, 100L, 1499L)))
    // declined shapes still compute correctly through the row path
    val grouped = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "500").load()
      .groupBy("lang").agg(count(lit(1)).as("n"))
    assert(!grouped.queryExecution.executedPlan.toString.contains("agg=pushed"))
    assert(grouped.agg(sum("n")).head.getLong(0) == 500L)
    // min over a non-derivable column declines too
    val mnTok = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "200").load().agg(min("n_tokens"))
    assert(!mnTok.queryExecution.executedPlan.toString.contains("agg=pushed"))
    assert(mnTok.head.getLong(0) >= graft.sources.SynthDocs.MinToks)
  }

  test("synth DSv2: runtime filtering narrows the generator to the join keys") {
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100.0")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.format("graft.sources.SynthDocsSource")
        .option("rows", "2000").option("slices", "4").load()
      // selective build side: 5 of 2000 ids survive its filter
      val dim = spark.range(0, 2000).where(col("id") % 400 === 0)
        .select(col("id").as("doc_id"))
      val joined = fact.join(dim, "doc_id").select("doc_id", "n_tokens")
      val rows = joined.collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq
        == Seq(0L, 400L, 800L, 1200L, 1600L))
      val plan = joined.queryExecution.executedPlan
      val planStr = plan.toString
      // a dynamic-pruning runtime filter must be attached to the V2 scan
      assert(planStr.contains("RuntimeFilters: [dynamicpruning"),
        s"no runtime filter injected:\n$planStr")
      // and the generator must have produced ONLY the surviving ids —
      // read the scan's output-rows metric after execution
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec => allNodes(q.plan)
        case other => other.children.flatMap(allNodes)
      })
      val scanRows = allNodes(plan)
        .filter(l => l.nodeName.contains("BatchScan")
          && l.toString.contains("SynthDocs")
          && l.metrics.contains("numOutputRows"))
        .map(_.metrics("numOutputRows").value).sum
      assert(scanRows == 5L, s"generator produced $scanRows rows, expected 5")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("synth DSv2: slices partition the id space without overlap") {
    val df = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "101").option("slices", "7").load()
    val ids = df.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 101L))
    assert(df.rdd.getNumPartitions == 7)
  }

  test("synth DSv2: pushed TopN/LIMIT narrows the generator to n rows") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      val n = df.collect().length // execute first, then read the metric
      allNodes(df.queryExecution.executedPlan)
        .filter(l => l.nodeName.contains("BatchScan")
          && l.toString.contains("SynthDocs")
          && l.metrics.contains("numOutputRows"))
        .map(_.metrics("numOutputRows").value).sum
    }
    def synth = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "2000").option("slices", "4").load()

    // ascending TopN composed with a pushed range filter: [100, 110) only
    val asc = synth.select("doc_id", "n_tokens")
      .where(col("doc_id") >= 100L).orderBy("doc_id").limit(10)
    assert(asc.collect().map(_.getLong(0)).toSeq == (100L until 110L))
    assert(scanRows(asc) == 10L, "generator must produce exactly n rows")

    // descending TopN: the scan keeps the TAIL of the range
    val desc = synth.select("doc_id").orderBy(col("doc_id").desc).limit(5)
    assert(desc.collect().map(_.getLong(0)).toSeq
      == Seq(1999L, 1998L, 1997L, 1996L, 1995L))
    assert(scanRows(desc) == 5L)

    // plain LIMIT (no order): n rows generated, n returned
    assert(scanRows(synth.select("doc_id").limit(7)) == 7L)

    // TopN on a non-id column must DECLINE — full scan, correct answer
    val byLang = synth.select("doc_id", "lang").orderBy(col("lang"), col("doc_id")).limit(3)
    val got = byLang.collect()
    assert(got.length == 3 && got.forall(_.getString(1) == "de"),
      s"lang TopN answer wrong: ${got.mkString(",")}")
    assert(scanRows(byLang) == 2000L, "non-id TopN must not narrow the scan")

    // a residual (non-id) filter must also decline the limit: narrowing
    // the range first would under-produce after the post-scan filter
    val resid = synth.select("doc_id", "lang")
      .where(col("lang") === "en").orderBy("doc_id").limit(4)
    val ids = resid.collect().map(_.getLong(0))
    assert(ids.length == 4 && scanRows(resid) == 2000L,
      "residual-filter LIMIT must scan the full range")
  }

  test("graftlines sink: staged commit promotes shards, stamps _SUCCESS, cleans staging") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft_lines_spec_").toString
    val src = Tables.documents(spark, sfDir).select(col("text").as("value"))
    src.write.format("graft.sources.GraftLinesSource")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).option("path", out).save()
    val names = Files.list(Paths.get(out)).iterator.asScala
      .map(_.getFileName.toString).toSet
    assert(names.contains("_SUCCESS"))
    assert(!names.contains("_staging"), s"staging dir survived commit: $names")
    assert(names.exists(n => n.startsWith("part-") && n.endsWith(".txt")))
    val back = spark.read.format("graft.sources.GraftLinesSource")
      .option("path", out).load()
    assert(back.collect().map(_.getString(0)).sorted.toSeq
      == src.collect().map(_.getString(0)).sorted.toSeq)
    // overwrite truncates: second (smaller) write fully replaces the first
    val small = Tables.documents(spark, sfDir).limit(3).select(col("text").as("value"))
    small.write.format("graft.sources.GraftLinesSource")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).option("path", out).save()
    assert(spark.read.format("graft.sources.GraftLinesSource")
      .option("path", out).load().count() == 3L)
  }

  test("graftlines sink: failed job aborts all-or-nothing (no visible shards)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val out = Files.createTempDirectory("graft_lines_abort_").toString
    val boom = udf((s: String) =>
      if (s.contains("customer")) throw new RuntimeException("poison row") else s)
    val poisoned = Tables.documents(spark, sfDir)
      .select(boom(col("text")).as("value"))
    intercept[Exception] {
      poisoned.write.format("graft.sources.GraftLinesSource")
        .mode(org.apache.spark.sql.SaveMode.Append).option("path", out).save()
    }
    val names = Files.list(Paths.get(out)).iterator.asScala
      .map(_.getFileName.toString).toSet
    assert(!names.exists(n => n.startsWith("part-") && n.endsWith(".txt")),
      s"torn write visible after abort: $names")
    assert(!names.contains("_SUCCESS"))
  }

  test("synth DSv2 catalog: SQL addressing with pushdown intact; unknown tables rejected") {
    val df = Sources.synthCatalogSql(spark, sfDir)
    // pushdown survives the catalog path: range absorbed, text pruned
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ids=[100,1100)"), s"range not pushed via catalog:\n$plan")
    assert(df.agg(sum("n")).head.getLong(0) == 1000L)
    // catalog DDL surface behaves: list works, missing table raises cleanly
    assert(spark.sql("SHOW TABLES IN graft_cat.synth").collect()
      .map(_.getString(1)).contains("docs_1000"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_cat.synth.nope").collect()
    }
    val e = intercept[Throwable] {
      spark.sql("ALTER TABLE graft_cat.synth.docs_1000 SET TBLPROPERTIES ('a'='b')")
    }
    assert(e.getMessage.contains("read-only"), s"unexpected: $e")
  }

  test("catalog function: h60 callable from SQL via magic-method binding") {
    val df = Sources.catalogFunctionHash(spark, sfDir)
    // magic `invoke` bound statically — no ApplyFunctionExpression row path
    assert(!df.queryExecution.optimizedPlan.toString.contains("ApplyFunctionExpression"),
      "magic method not bound; fell back to the reflective row path")
    // values equal the local reference hash
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Tables.documents(spark, sfDir).select("doc_id", "text").collect().foreach { r =>
      assert(got(r.getLong(0)) == graft.sources.SynthDocs.h60(r.getString(1)))
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cat.fns.nope('x')").collect()
    }
  }

  test("synth DSv2 streaming: micro-batched drain equals the batch table; restart resumes exactly") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("synth_stream_").toString
    def drain(rows: Long): Unit = {
      val q = spark.readStream.format("graft.sources.SynthDocsSource")
        .option("rows", rows.toString).option("maxPerTrigger", "37").load()
        .writeStream.format("parquet")
        .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(100L)
    val got1 = spark.read.parquet(s"$tmp/out")
    assert(got1.count() == 100L)
    // content identical to the batch face of the same table
    val batch = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "100").load().collect()
      .map(_.toString).sorted.toSeq
    assert(got1.collect().map(_.toString).sorted.toSeq == batch)
    // ceil(100/37) = 3 micro-batches committed
    assert(new java.io.File(s"$tmp/ck/commits").list().count(!_.startsWith(".")) == 3)
    // restart against a GROWN table: only ids 100..149 are new — exactly once
    drain(150L)
    val got2 = spark.read.parquet(s"$tmp/out")
    assert(got2.count() == 150L)
    assert(got2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 150L))
  }

  test("partitioned parquet read prunes to the filtered partition") {
    val df = Sources.partitionedParquet(spark, sfDir)
    // via Tables.events — a raw parquet read would hit Spark's
    // TIMESTAMP(NANOS) refusal now that the loader's flag is scoped
    val expected = Tables.events(spark, sfDir)
      .where(col("event_type") === "click").count()
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("click", expected)))
    // pruning: the physical scan's selected partitions must be 1
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters in:\n$scan")
  }

  test("graftlines DELETE: SQL row-level delete through the catalog, shards rewritten copy-on-write") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import graft.sources.GraftCatalog
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val root = s"${GraftCatalog.linesRoot}/delspec"
    val s = spark
    import s.implicits._
    (0 until 100).map(i => f"doc$i%03d").toDF("value")
      .repartition(4)
      .write.format("graft.sources.GraftLinesSource")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).option("path", root).save()

    // catalog face sees the table written through the format face
    assert(spark.sql("SHOW TABLES IN graft_cat.lines").collect()
      .map(_.getString(1)).contains("delspec"))
    assert(spark.sql("SELECT count(*) n FROM graft_cat.lines.delspec")
      .head.getLong(0) == 100L)

    // range + inequality delete: conjunction of translatable predicates
    spark.sql("""DELETE FROM graft_cat.lines.delspec
                 WHERE value >= 'doc010' AND value < 'doc020' AND value <> 'doc015'""")
    val left = spark.sql("SELECT value FROM graft_cat.lines.delspec")
      .collect().map(_.getString(0)).sorted
    assert(left.length == 91)
    assert(left.contains("doc015") && !left.contains("doc010") && !left.contains("doc019"))

    // prefix delete empties whole shards safely (files dropped, not torn)
    spark.sql("DELETE FROM graft_cat.lines.delspec WHERE value LIKE 'doc0%'")
    val after = spark.sql("SELECT value FROM graft_cat.lines.delspec")
      .collect().map(_.getString(0)).sorted
    assert(after.length == 0 ||
      after.forall(!_.startsWith("doc0")), s"prefix rows survived: ${after.take(5).toSeq}")
    // no torn temp files left behind
    val leftover = Files.list(Paths.get(root)).iterator.asScala
      .map(_.getFileName.toString).filter(_.endsWith(".del.tmp")).toSeq
    assert(leftover.isEmpty, s"torn rewrite temps: $leftover")

    // untranslatable predicate: honest analysis-time refusal, no data loss
    val before = spark.sql("SELECT count(*) FROM graft_cat.lines.delspec").head.getLong(0)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DELETE FROM graft_cat.lines.delspec WHERE length(value) = 6")
    }
    assert(spark.sql("SELECT count(*) FROM graft_cat.lines.delspec")
      .head.getLong(0) == before)
  }

  test("graftlines streaming write: interrupted run resumes from checkpoint " +
    "exactly-once; epoch shards are deterministic") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.streaming.Trigger
    val out = Files.createTempDirectory("graft_lines_stream_").toString
    val cp = Files.createTempDirectory("graft_lines_stream_cp_").toString
    def src = spark.readStream.format("graft.sources.SynthDocsSource")
      .option("rows", "2000").option("slices", "4").option("maxPerTrigger", "600")
      .load().select(col("text").as("value"))
    // phase 1: run continuously, stop as soon as a batch has committed —
    // an interruption at an arbitrary point in the epoch sequence
    val q1 = src.writeStream.format("graft.sources.GraftLinesSource")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.ProcessingTime("5 milliseconds")).start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while ((q1.lastProgress == null || q1.lastProgress.batchId < 1) &&
      System.nanoTime() < deadline) Thread.sleep(20)
    q1.stop(); q1.awaitTermination()
    // phase 2: restart from the same checkpoint, drain the rest
    val q2 = src.writeStream.format("graft.sources.GraftLinesSource")
      .option("path", out).option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    // read-back equals the batch projection — no loss, no duplicates
    val got = spark.read.format("graft.sources.GraftLinesSource")
      .option("path", out).load().collect().map(_.getString(0)).sorted.toSeq
    val expected = spark.read.format("graft.sources.SynthDocsSource")
      .option("rows", "2000").load()
      .select("text").collect().map(_.getString(0)).sorted.toSeq
    assert(got == expected, s"stream read-back diverged: got ${got.length} " +
      s"rows vs ${expected.length}")
    // multiple epochs really ran, and shard names are epoch-keyed
    val epochs = Files.list(Paths.get(out)).iterator.asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("part-e") => n.drop(6).takeWhile(_.isDigit) }
      .toSet
    assert(epochs.size >= 2, s"expected >=2 epochs, saw $epochs")
    // no staging garbage after a clean drain
    val st = graft.sources.GraftLines.stagingDir(out)
    assert(!Files.isDirectory(st) ||
      Files.list(st).iterator.asScala.isEmpty, "staging must be drained")
  }

  test("graftlines streaming write: epoch replay re-commits idempotently; " +
    "task abort leaves nothing") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val out = Files.createTempDirectory("graft_lines_replay_").toString
    val sw = new graft.sources.GraftLinesStreamingWrite(out, false)
    val fac = sw.createStreamingWriterFactory(null)
    def stage(taskId: Long, rows: Seq[String]) = {
      val w = fac.createWriter(0, taskId, 42L)
      rows.foreach(r => w.write(InternalRow(UTF8String.fromString(r))))
      w.commit()
    }
    val msg = stage(1L, Seq("alpha", "beta"))
    sw.commit(42L, Array(msg))
    val target = Paths.get(out, "part-e42-00000.txt")
    assert(Files.readAllLines(target).asScala.toSeq == Seq("alpha", "beta"))
    // replay WITHOUT re-staging (staging was consumed): promote is a no-op
    sw.commit(42L, Array(msg))
    assert(Files.readAllLines(target).asScala.toSeq == Seq("alpha", "beta"))
    // replay WITH re-staging (restarted query re-ran the epoch's tasks):
    // deterministic name -> atomic replace, never an appended duplicate
    sw.commit(42L, Array(stage(7L, Seq("alpha", "beta"))))
    assert(Files.readAllLines(target).asScala.toSeq == Seq("alpha", "beta"))
    assert(graft.sources.GraftLines.dataFiles(out).size == 1)
    // task abort: staged file deleted, nothing promoted
    val w = fac.createWriter(1, 9L, 43L)
    w.write(InternalRow(UTF8String.fromString("doomed")))
    w.abort()
    sw.abort(43L, Array.empty)
    assert(graft.sources.GraftLines.dataFiles(out).size == 1,
      "aborted epoch must not surface data")
    val staged = graft.sources.GraftLines.stagingDir(out)
    assert(Files.list(staged).iterator.asScala.isEmpty, "staging not cleaned")
  }

  test("graftlines streaming write: Complete-mode truncate replaces the snapshot per epoch") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val out = Files.createTempDirectory("graft_lines_trunc_").toString
    // truncateFirst = what Spark's WriteBuilder.truncate() sets for
    // outputMode("complete"): every epoch's commit REPLACES the visible
    // snapshot instead of accumulating epochs
    val sw = new graft.sources.GraftLinesStreamingWrite(out, true)
    val fac = sw.createStreamingWriterFactory(null)
    def stage(epoch: Long, taskId: Long, rows: Seq[String]) = {
      val w = fac.createWriter(0, taskId, epoch)
      rows.foreach(r => w.write(InternalRow(UTF8String.fromString(r))))
      w.commit()
    }
    def visible(): Seq[String] = graft.sources.GraftLines.dataFiles(out)
      .flatMap(p => Files.readAllLines(p).asScala).sorted.toSeq
    sw.commit(1L, Array(stage(1L, 1L, Seq("s1a", "s1b"))))
    assert(visible() == Seq("s1a", "s1b"))
    sw.commit(2L, Array(stage(2L, 2L, Seq("s2"))))
    assert(visible() == Seq("s2"), "epoch 2 must replace epoch 1's snapshot")
    assert(graft.sources.GraftLines.dataFiles(out)
      .forall(_.getFileName.toString.startsWith("part-e2-")))
    // epoch replay stays idempotent under truncate: same snapshot, once
    sw.commit(2L, Array(stage(2L, 9L, Seq("s2"))))
    assert(visible() == Seq("s2"))
    assert(graft.sources.GraftLines.dataFiles(out).size == 1)
    // PROMOTE-THEN-DELETE ordering (the r7 advisory): a commit whose
    // promote FAILS must leave the previous epoch's snapshot intact — a
    // delete-first implementation would already have truncated it,
    // exposing an empty directory no epoch ever committed
    val doomed = graft.sources.LinesCommitMessage(
      s"$out/_staging/does-not-exist.tmp", 0, 1L)
    intercept[java.io.IOException] { sw.commit(3L, Array(doomed)) }
    assert(visible() == Seq("s2"),
      "failed epoch-3 promote must not have truncated epoch 2")
  }

  test("graftlines streaming write: end-to-end through the catalog table") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.GraftCatalog
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[GraftCatalog].getName)
    val root = java.nio.file.Paths.get(s"${GraftCatalog.linesRoot}/streamcat")
    if (java.nio.file.Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator.asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists)
    }
    val cp = java.nio.file.Files.createTempDirectory("graft_cat_stream_cp_").toString
    val q = spark.readStream.format("graft.sources.SynthDocsSource")
      .option("rows", "300").option("maxPerTrigger", "100")
      .load().select(col("text").as("value"))
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .toTable("graft_cat.lines.streamcat")
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) n FROM graft_cat.lines.streamcat")
      .head.getLong(0) == 300L)
  }
}
