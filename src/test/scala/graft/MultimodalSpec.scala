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

  test("Ppm golden blob: decode is byte-exact, full header grammar, round-trip") {
    import graft.operators.Ppm
    // hand-written 2x2 blob exercising comments, CRLF, and multi-space
    // separators; raster = 12 known bytes
    val raster = Array[Byte](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120)
    val golden = ("P6 # a comment after the magic\r\n" +
      "# full-line comment\n" +
      "2\t2  # dims\n255\n").getBytes("US-ASCII") ++ raster
    val img = Ppm.decode(golden)
    assert(img.width === 2 && img.height === 2 && img.maxVal === 255)
    assert(img.rgb.toSeq === raster.toSeq, "raster must be byte-for-byte")
    // canonical encode of the decoded image re-decodes identically
    val re = Ppm.decode(Ppm.encode(img))
    assert(re.width === 2 && re.height === 2 && re.rgb.toSeq === raster.toSeq)
    // hand-checked kernels on the golden image: gray = [20, 50, 80, 110],
    // total 260, n 4 -> bits where gray*4 >= 260: pixels 2,3 -> ahash 0b1100
    assert(Ppm.gray(img).toSeq === Seq(20, 50, 80, 110))
    assert(Ppm.aHash(img) === 12L)
    // dhash bits (w-1)*h = 2: gray(1)>gray(0) and gray(3)>gray(2) -> 0b11
    assert(Ppm.dHash(img) === 3L)
    // malformed inputs fail loudly, never decode wrong
    for (bad <- Seq(
      golden.dropRight(1),                       // truncated raster
      golden.updated(1, '5'.toByte),             // wrong magic
      "P6\n2 2\n999\n".getBytes("US-ASCII") ++ raster)) { // maxval > 255
      intercept[IllegalArgumentException](Ppm.decode(bad))
    }
  }

  test("decodeStats keeps rows on executors and preserves count/partitioning") {
    val src = Multimodal.ppmTable(spark, sfDir).repartition(7)
    val out = Multimodal.decodeStats(src)
    assert(out.rdd.getNumPartitions === 7, "mapPartitions must not reshuffle")
    assert(out.count() === src.count())
    val one = out.filter(_.media_id == 1L).head()
    // media 1 seed = 1: width 8+1=9, height 5+1=6
    assert(one.width === 9 && one.height === 6 && one.n_pixels === 54)
  }

  test("mm_phash_dedup: planted groups surface with hamming 0 AND 1; " +
    "pairs are within-group near-dups") {
    val pairs = Multimodal.queries("mm_phash_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty, "planted dup groups must produce pairs")
    def grp(id: Long): Long =
      if (id % 4 == 0) (id / 4) % Multimodal.DupGroups else -id
    val sameGroup = pairs.filter { case (a, b, _) => grp(a) == grp(b) && a % 4 == 0 }
    assert(sameGroup.exists(_._3 == 0), "same-parity group pairs: hamming 0")
    assert(sameGroup.exists(_._3 == 1),
      "perturbed cross-parity pairs: hamming 1 — 'near' is non-vacuous")
    assert(pairs.forall(_._3 <= Multimodal.HamMax))
    // every within-group pair of the same parity MUST be found (identical
    // images -> identical dhash -> all bands agree)
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 4 == 0)
    val expectedExact = ids.groupBy(id => ((id / 4) % Multimodal.DupGroups, (id / 4) % 2))
      .values.filter(_.length > 1)
      .flatMap(g => g.sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(expectedExact.subsetOf(got),
      s"missing exact-dup pairs: ${(expectedExact -- got).take(5)}")
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
