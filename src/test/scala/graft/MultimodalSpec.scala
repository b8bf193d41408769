package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal plumbing: binary columns + typed metadata + stubbed decode.
  * The decode output is fake (no codecs in this container); the schema,
  * partitioning, and batch shape are the real thing under test.
  */
class MultimodalSpec extends SparkSpecBase {

  test("mediaTable exposes bytes as binary with typed metadata struct") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val sch = m.schema
    assert(sch("bytes").dataType.typeName === "binary")
    assert(sch("meta").dataType.typeName === "struct")
    val r = m.orderBy("media_id").head
    val txt = spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id").head.getAs[String]("text")
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") === txt)
  }

  test("fakeDecodeFeatures is deterministic and in [-1, 1)") {
    val f = Multimodal.mediaTable(spark, sfDir)
      .select(Multimodal.fakeDecodeFeatures(col("bytes")).as("f"))
    val a = f.collect().map(_.getSeq[Double](0))
    val b = f.collect().map(_.getSeq[Double](0))
    assert(a.toSeq.map(_.toSeq) === b.toSeq.map(_.toSeq))
    assert(a.forall(_.forall(v => v >= -1.0 && v < 1.0)))
    assert(a.forall(_.length === Multimodal.FeatureDim))
  }

  test("decodePartitioned keeps rows on executors and preserves count/partitioning") {
    val s = spark
    import s.implicits._
    val src = Multimodal.mediaTable(spark, sfDir)
      .select(col("media_id"), col("bytes")).as[MediaRow]
      .repartition(7)
    val out = Multimodal.decodePartitioned(src)
    assert(out.rdd.getNumPartitions === 7, "mapPartitions must not reshuffle")
    assert(out.count() === src.count())
    val one = out.filter(_.media_id == 0L).head()
    assert(one.features.length === Multimodal.FeatureDim)
    // kernel-level determinism: same bytes -> same features
    val txt = spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id").head.getAs[String]("text")
    assert(one.features.toSeq === Multimodal.stubDecode(txt.getBytes("UTF-8")).toSeq)
  }

  test("mm_feature_dedup finds exactly the planted duplicate groups") {
    // independent ground truth: doc_ids with id % 4 == 0 share a payload
    // keyed on (id div 4) % DupGroups; all other payloads are the (unique
    // at this SF) document texts
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.filter(_ % 4 == 0)
      .groupBy(id => (id / 4) % Multimodal.DupGroups)
      .values.filter(_.length > 1)
      .map(g => (g.min, g.length.toLong))
      .toSeq.sorted
    assert(expected.nonEmpty, "fixture must plant duplicate groups")

    val got = Multimodal.queries("mm_feature_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected,
      s"planted groups mismatch: got ${got.take(5)}... expected ${expected.take(5)}...")
  }

  test("mm_meta_stats never scans the blob column") {
    val q = Multimodal.queries("mm_meta_stats")(spark, sfDir)
    // the optimized plan must not reference the blob column `bytes#N`
    // (\b won't do: Spark derives `_extract_n_bytes#N` from the meta struct,
    // and '_' is a word char, so a plain substring/boundary check misses)
    val plan = q.queryExecution.optimizedPlan.toString
    val blobRef = raw"(?<![A-Za-z0-9_])bytes#\d+".r
    assert(blobRef.findFirstIn(plan).isEmpty, s"blob column leaked into plan:\n$plan")
  }
}
