package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, flowing through decode -> feature-extract ->
  * downstream (dedup / similarity) stages.
  *
  * The decode step is a STUB: this container has no image/audio codecs, so
  * `fakeDecodeFeatures` derives a deterministic feature vector from the
  * bytes themselves (md5-seeded). Swap [[fakeDecodeFeatures]] for a real
  * decoder (JNI/onnx on executors, or mapInPandas in PySpark) without
  * touching anything else — the schema, partitioning, and batch shape are
  * the real, tested plumbing.
  *
  * Scale notes: media bytes never hit the driver; every stage is a per-row
  * projection or a mapPartitions over executor-local batches. Binary
  * columns ride parquet page compression; metadata lives in a sibling
  * struct so planners can prune/filter WITHOUT touching the blob column
  * (verified: filters on meta push down while `bytes` stays unscanned).
  */
object Multimodal {

  val FeatureDim = 8

  /** Frame-sampling stride (keep every FrameStride-th frame). */
  val FrameStride = 3

  /** Media ingest: wrap a text fixture as opaque media blobs. In production
    * this is `spark.read.format("binaryFile")` or a parquet table of blobs;
    * here `documents.text` stands in as the payload so every stage (and the
    * DuckDB oracle) sees identical bytes.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("text/plain").as("mime"),
        // byte length of the payload, not the character count — they
        // diverge on any non-ASCII text
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        (col("doc_id") % 3).cast("int").as("channel")).as("meta"))

  /** STUB decode: deterministic pseudo-features from the blob. Feature j =
    * (h60(hex(bytes) || '#' || j) % 2000 - 1000) / 1000.0 in [-1, 1).
    * A real implementation decodes pixels/samples here; the signature
    * (binary -> array<double>) is the contract downstream stages rely on.
    */
  def fakeDecodeFeatures(bytes: Column): Column =
    transform(sequence(lit(0), lit(FeatureDim - 1)), j =>
      (h60(concat(hex(bytes), lit("#"), j.cast("string"))) % 2000L - 1000L)
        .cast("double") / 1000.0)

  private def fakeDecodeSql(bytes: String): String = {
    val f = (0 until FeatureDim).map { j =>
      s"CAST(${h60Sql(s"upper(hex($bytes)) || '#$j'")} % 2000 - 1000 AS DOUBLE) / 1000.0"
    }.mkString(", ")
    s"[$f]"
  }

  /** Duplicate-group count for [[mediaDupTable]]'s planted payloads. */
  val DupGroups = 25

  /** Media fixture WITH planted byte-identical duplicates: every 4th doc's
    * payload is replaced by one of [[DupGroups]] shared blobs (keyed on
    * media_id div 4 mod DupGroups), the rest keep their real text bytes.
    * Identical bytes => identical stub features, so the feature-dedup path
    * has non-vacuous groups to find at every SF (the raw documents fixture
    * has no exact duplicates, which made the r1 query return 0 rows).
    */
  def mediaDupTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(
        when(col("doc_id") % 4 === 0,
          concat(lit("dup-"), (expr("doc_id div 4") % DupGroups).cast("string")))
          .otherwise(col("text")),
        "UTF-8").as("bytes"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata projection/filter WITHOUT decoding: the blob column is never
    // read (column pruning on the struct sibling).
    "mm_meta_stats" -> { (s, d) =>
      mediaTable(s, d)
        .where(col("meta.n_bytes") > 200)
        .groupBy(col("meta.channel").as("channel"))
        .agg(count(lit(1)).as("n"), sum(col("meta.n_bytes")).as("total_bytes"))
        .orderBy("channel")
    },

    // Decode -> feature-extract: the full plumbing with the stubbed decoder.
    "mm_features" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("media_id"), fakeDecodeFeatures(col("bytes")).as("f"))
        .select(col("media_id"),
          round(element_at(col("f"), 1), 6).as("f0"),
          round(element_at(col("f"), 2), 6).as("f1"),
          round(aggregate(col("f"), lit(0.0), (a, x) => a + x * x), 6).as("sq_norm"))
        .orderBy("media_id")
    },

    // Cross-pack composition: decode -> feature vectors -> similarity
    // search. Top-3 most similar media per query by stub-feature cosine —
    // the broadcast-query-batch ANN shape from Similarity applied to
    // decoded media features (swap the stub for a real encoder and this is
    // image near-dup search).
    "mm_feature_topk" -> { (s, d) =>
      graft.Graft.init(s)
      val f = mediaTable(s, d)
        .select(col("media_id"), fakeDecodeFeatures(col("bytes")).as("f"))
        .withColumn("nrm", sqrt(dot(col("f"), col("f"))))
      val q = f.where(col("media_id") < 5)
        .select(col("media_id").as("q_id"), col("f").as("qe"), col("nrm").as("qn"))
      val c = f.select(col("media_id").as("cand_id"), col("f").as("ce"),
        col("nrm").as("cn"))
      Similarity.ranked(broadcast(q).join(c, col("q_id") =!= col("cand_id")), k = 3)
    },

    // Video-style frame sampling: each blob is treated as a clip of
    // meta-derived frame count; frames are sampled at a fixed stride
    // (sequence(0, n-1, stride) — generated directly, no generate-all-
    // then-filter) and fingerprinted per frame. Pure per-row generator +
    // projection: no shuffle, blob bytes read once. Swap the stub
    // fingerprint for a real frame decoder and this is the
    // frame-dedup/scene-cut ingestion path.
    "mm_frame_sample" -> { (s, d) =>
      mediaTable(s, d)
        .select(col("media_id"), col("bytes"),
          (col("meta.n_bytes") % 7 + 2).cast("long").as("n_frames"))
        .select(col("media_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(FrameStride.toLong)))
            .as("frame_idx"),
          col("bytes"))
        .select(col("media_id"), col("n_frames"), col("frame_idx"),
          (h60(concat(hex(col("bytes")), lit("@"), col("frame_idx").cast("string")))
            % 1000000007L).as("frame_sig"))
        .orderBy("media_id", "frame_idx")
    },

    // Feature-space near-dup over the planted-duplicate media fixture:
    // groups whose stub features collide — the decode -> dedup composition
    // end-to-end. Grouping is on the feature ARRAY itself (no string
    // formatting in the key: array grouping hashes raw doubles identically
    // in both engines; casting the array to a string would hinge on each
    // engine's list-rendering format).
    "mm_feature_dedup" -> { (s, d) =>
      mediaDupTable(s, d)
        .select(col("media_id"), fakeDecodeFeatures(col("bytes")).as("f"))
        .groupBy("f")
        .agg(min("media_id").as("keep_id"), count(lit(1)).as("n"))
        .where(col("n") > 1)
        .select(col("keep_id"), col("n"))
        .orderBy("keep_id")
    }
  )

  case class MediaRow(media_id: Long, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, features: Array[Double])

  /** STUB decode kernel (JVM side): md5-seeded pseudo-features. A real
    * implementation would decode pixels/samples here (and is where a
    * native/onnx library gets called once per executor-local batch).
    */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(bytes)
    Array.tabulate(FeatureDim) { j =>
      val b = java.util.Arrays.copyOfRange(h, j, j + 8)
      (java.nio.ByteBuffer.wrap(b).getLong % 1000L) / 1000.0
    }
  }

  /** Batch-shaped decode over executor-local partitions — the Scala analog
    * of `mapInPandas`: one iterator per partition, rows never collected to
    * the driver, output schema fixed by the `MediaFeatures` encoder. Heavy
    * per-batch init (codec/model load) belongs at the top of the
    * mapPartitions closure, amortized across the partition.
    */
  def decodePartitioned(ds: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition init happens here (e.g. codec handle) — STUB: none
      rows.map(r => MediaFeatures(r.media_id, stubDecode(r.bytes)))
    }
  }

  val oracles: Map[String, String] = Map(
    "mm_meta_stats" ->
      """SELECT CAST(doc_id % 3 AS INTEGER) AS channel, count(*) AS n,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents WHERE octet_length(encode(text)) > 200
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "mm_features" ->
      s"""WITH m AS (SELECT doc_id AS media_id, encode(text) AS bytes FROM documents),
         |f AS (SELECT media_id, ${fakeDecodeSql("bytes")} AS f FROM m)
         |SELECT media_id,
         |  round(f[1], 6) AS f0,
         |  round(f[2], 6) AS f1,
         |  round(list_sum(list_transform(f, x -> x * x)), 6) AS sq_norm
         |FROM f ORDER BY media_id""".stripMargin,

    "mm_feature_topk" ->
      s"""WITH m AS (SELECT doc_id AS media_id, encode(text) AS bytes FROM documents),
         |f AS (SELECT media_id, ${fakeDecodeSql("bytes")} AS f FROM m),
         |b AS (SELECT media_id, f, sqrt(${dotSql("f", "f", FeatureDim)}) AS nrm FROM f),
         |p AS (SELECT q.media_id AS q_id, c.media_id AS cand_id,
         |  round(${dotSql("q.f", "c.f", FeatureDim)} / (q.nrm * c.nrm), 6) AS cos
         |  FROM b q JOIN b c ON q.media_id <> c.media_id
         |  WHERE q.media_id < 5),
         |r AS (SELECT q_id, cand_id, cos,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rnk
         |  FROM p)
         |SELECT q_id, cand_id, cos, rnk FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH m AS (SELECT doc_id AS media_id, encode(text) AS bytes,
         |    octet_length(encode(text)) % 7 + 2 AS n_frames FROM documents),
         |x AS (SELECT media_id, CAST(n_frames AS BIGINT) AS n_frames,
         |    unnest(range(0, n_frames, $FrameStride)) AS frame_idx, bytes FROM m)
         |SELECT media_id, n_frames, frame_idx,
         |  ${h60Sql("upper(hex(bytes)) || '@' || CAST(frame_idx AS VARCHAR)")} % 1000000007 AS frame_sig
         |FROM x ORDER BY media_id, frame_idx""".stripMargin,

    "mm_feature_dedup" ->
      s"""WITH m AS (SELECT doc_id AS media_id,
         |  encode(CASE WHEN doc_id % 4 = 0
         |              THEN 'dup-' || CAST((doc_id // 4) % $DupGroups AS VARCHAR)
         |              ELSE text END) AS bytes
         |  FROM documents),
         |f AS (SELECT media_id, ${fakeDecodeSql("bytes")} AS f FROM m)
         |SELECT min(media_id) AS keep_id, count(*) AS n
         |FROM f GROUP BY f HAVING count(*) > 1 ORDER BY keep_id""".stripMargin
  )
}
