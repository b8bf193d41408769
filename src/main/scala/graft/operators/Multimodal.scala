package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, flowing through decode -> feature-extract ->
  * downstream (dedup / similarity) stages.
  *
  * Two decode tiers:
  *   - REAL decode: [[Ppm]] is a genuine binary-PPM (P6) image codec; the
  *     `mm_decode_*`/`mm_phash_*` queries synthesize per-doc PPM blobs
  *     (pixels planted from doc_id arithmetic — FIXTURES.md §4 — so the
  *     DuckDB oracle reproduces the decoded stats in closed form), decode
  *     them bytes→pixels in one `mapPartitions` pass, and run perceptual
  *     average/difference hashes on the pixels.
  *   - Pseudo-features: `fakeDecodeFeatures` derives a deterministic
  *     md5-seeded feature vector straight from the bytes — the stand-in
  *     for a learned ENCODER (embedding model), which no container codec
  *     can supply. The similarity/dedup compositions downstream of it are
  *     encoder-agnostic: swap in onnx per-partition and nothing changes.
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
    },

    // REAL decode end-to-end: synthetic PPM blobs -> header parse ->
    // raster -> per-image dims + exact integer gray stats + perceptual
    // hashes, all in ONE mapPartitions pass (bytes read once, never on the
    // driver). The oracle reproduces every column in closed form from the
    // doc_id-planted pixel function — if the parser mis-slices the raster
    // by even one byte, every hash diverges.
    "mm_decode_stats" -> { (s, d) =>
      decodeStats(ppmTable(s, d)).toDF()
        .select(col("media_id"), col("width"), col("height"), col("n_pixels"),
          col("gray_sum"),
          round(col("gray_sum").cast("double") / col("n_pixels").cast("double"), 6)
            .as("gray_mean"),
          col("ahash"), col("dhash"))
        .orderBy("media_id")
    },

    // Perceptual near-dup over DECODED pixels: dHash signatures banded
    // into DHashBands 6-bit chunks; candidate pairs must share image
    // geometry AND ≥1 band chunk (equi-join — never all-pairs; pigeonhole
    // makes the banding LOSSLESS for hamming ≤ HamMax < #bands), then
    // verify exact hamming via bit_count(xor). The planted dup groups
    // surface as hamming-0 (same parity) and hamming-1 (the perturbed
    // channel) pairs. At 100 TB the same plan holds: the band chunk is
    // the shuffle key and each bucket is collision-bounded.
    "mm_phash_dedup" -> { (s, d) =>
      val stats = decodeStats(ppmTable(s, d)).toDF()
        .select("media_id", "width", "height", "dhash")
        .localCheckpoint() // decoded once; both join sides read the blocks
      val banded = stats.select(col("media_id"), col("width"), col("height"),
        col("dhash"),
        explode(array((0 until DHashBands).map(i =>
          struct(lit(i).as("band"),
            expr(s"shiftright(dhash, ${i * DHashBandBits}) & ${(1 << DHashBandBits) - 1}")
              .as("chunk"))): _*)).as("bc"))
        .select(col("media_id"), col("width"), col("height"), col("dhash"),
          col("bc.band").as("band"), col("bc.chunk").as("chunk"))
      banded.as("a").join(banded.as("b"),
          col("a.width") === col("b.width") &&
            col("a.height") === col("b.height") &&
            col("a.band") === col("b.band") &&
            col("a.chunk") === col("b.chunk") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
          col("a.dhash").as("da"), col("b.dhash").as("db"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(da ^ db) as int)"))
        .where(col("hamming") <= HamMax)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    }
  )

  case class MediaRow(media_id: Long, bytes: Array[Byte])

  /** Per-image decode output: dimensions, exact integer gray statistics,
    * and the two perceptual bit-signatures.
    */
  case class MediaStats(media_id: Long, width: Int, height: Int,
                        n_pixels: Int, gray_sum: Long, ahash: Long, dhash: Long)

  // ------------------------------------------------------ real PPM decode

  /** Seed base for planted duplicate-image groups — outside the doc_id
    * range so dup seeds never collide with a real doc's seed.
    */
  val PpmDupSeedBase = 1000000L

  /** Seed for doc `id`'s synthetic image: every 4th doc shares a group
    * seed (geometry AND pixels), the rest are unique — the planted
    * near-dup structure `mm_phash_dedup` must find.
    */
  def ppmSeed(id: Long): Long = {
    // The dup-seed namespace is only disjoint while doc ids stay below
    // the base — fail LOUDLY if a larger fixture ever violates that
    // (silent reuse would contaminate the planted near-dup structure:
    // doc base+g would synthesize pixel-for-pixel dup group g's image).
    // The oracle carries the same guard (error() in ppmHashCtes).
    require(id < PpmDupSeedBase,
      s"doc_id $id >= PpmDupSeedBase ($PpmDupSeedBase): raise the base")
    if (id % 4 == 0) PpmDupSeedBase + (id / 4) % DupGroups else id
  }

  /** Pixel-0 override for dup docs: alternating group members get pixel 0
    * forced to gray 0 vs gray 255 — a GUARANTEED flip of dHash bit 0
    * (bit0 = gray(1)>gray(0): against 0 it is set whenever gray(1)>0,
    * against 255 it is never set), and ONLY that bit can flip (pixel 0
    * enters exactly one dHash comparison). The planted groups therefore
    * contain both hamming-0 (same parity) and hamming-1 (cross-parity)
    * pairs: "near"-dup is non-vacuous, not exact-dup in disguise.
    * Returns -1 for non-dup docs (no override).
    */
  def ppmPert(id: Long): Int =
    if (id % 4 == 0) 255 * ((id / 4) % 2).toInt else -1

  /** Synthesize the doc's PPM blob: w = 8+seed%2, h = 5+seed%3 (≤ 9×7 —
    * small by design, but big enough that dHash carries 35-56 bits: at
    * ≤ 30 bits the hamming-2 ball covers so much of the signature space
    * that accidental pairs drown the planted ones — measured 205k pairs
    * at sf0.1 with 4..7×3..5 images); grayscale r=g=b, pixel p value =
    * h60("ppm:" + seed + ":" + p) mod 256 — the repo's md5-based
    * cross-engine hash, so pixels are FULLY mixed per (seed, pixel).
    * Additive/polynomial pixel functions were measured and rejected:
    * the seed enters them as a constant gray offset, which preserves
    * almost every gradient sign mod wraps, so different seeds land
    * within hamming 2 of each other and the pair relation explodes
    * (188-638k accidental pairs at sf0.1; ~planted-only with md5).
    * Same closed form the oracle uses.
    */
  def synthPpmBlob(id: Long): Array[Byte] = {
    val seed = ppmSeed(id); val pert = ppmPert(id)
    val w = (8 + seed % 2).toInt; val h = (5 + seed % 3).toInt
    val rgb = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val v =
        if (p == 0 && pert >= 0) pert
        else (h60Jvm(s"ppm:$seed:$p") % 256).toInt
      var c = 0
      while (c < 3) { rgb(3 * p + c) = v.toByte; c += 1 }
      p += 1
    }
    Ppm.encode(Ppm.Image(w, h, 255, rgb))
  }

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** JVM mirror of [[TextHash.h60]] (first 15 md5 hex chars as a long) for
    * the synth kernel, which runs inside a UDF, not as a Column. The first
    * 15 hex chars are the first 60 BITS, so the value is the unsigned
    * first-8-bytes word shifted right a nibble — no hex strings on the
    * per-pixel path (the string-formatting version cost ~3 s/5k docs).
    */
  def h60Jvm(s: String): Long = {
    val md = mdLocal.get(); md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private val synthPpmUdf = udf(synthPpmBlob _)

  /** (media_id, bytes) of synthetic PPM images — binary blobs flowing
    * through the plan exactly like `spark.read.format("binaryFile")` rows.
    */
  def ppmTable(s: SparkSession, d: String)
      : org.apache.spark.sql.Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id").as("media_id"),
        synthPpmUdf(col("doc_id")).as("bytes"))
      .as[MediaRow]
  }

  /** REAL batch-shaped decode over executor-local partitions — the Scala
    * analog of `mapInPandas`: one iterator per partition, rows never
    * collected to the driver, output schema fixed by the `MediaStats`
    * encoder. Heavy per-partition init (a native codec handle, an onnx
    * session) belongs at the top of the closure, amortized across the
    * partition; [[Ppm.decode]] needs none.
    */
  def decodeStats(ds: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[MediaStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val img = Ppm.decode(r.bytes)
        val g = Ppm.gray(img)
        var tot = 0L; var i = 0
        while (i < g.length) { tot += g(i); i += 1 }
        MediaStats(r.media_id, img.width, img.height, g.length, tot,
          Ppm.aHash(img), Ppm.dHash(img))
      }
    }
  }

  /** dHash band layout for the LSH-style candidate join: 7 bands × 8 bits
    * cover the fixture's ≤ 56 dHash bits; two signatures within hamming
    * distance [[HamMax]] < #bands must agree on ≥ 1 whole band
    * (pigeonhole), so banding loses no pair the verify step would keep.
    */
  val DHashBands = 7
  val DHashBandBits = 8
  /** Max hamming distance for a verified near-dup pair. */
  val HamMax = 2

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
         |FROM f GROUP BY f HAVING count(*) > 1 ORDER BY keep_id""".stripMargin,

    "mm_decode_stats" ->
      s"""WITH $ppmHashCtes
         |SELECT media_id, width, height, CAST(n AS INTEGER) AS n_pixels,
         |  gray_sum,
         |  round(CAST(gray_sum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gray_mean,
         |  ahash, dhash
         |FROM hh ORDER BY media_id""".stripMargin,

    "mm_phash_dedup" ->
      s"""WITH $ppmHashCtes,
         |bands AS (SELECT media_id, width, height, dhash, b.band,
         |    (dhash >> (b.band * $DHashBandBits)) & ${(1 << DHashBandBits) - 1} AS chunk
         |  FROM hh CROSS JOIN (SELECT unnest(range(0, $DHashBands)) AS band) b),
         |cand AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
         |    a.dhash AS da, b.dhash AS db
         |  FROM bands a JOIN bands b ON a.width = b.width AND a.height = b.height
         |    AND a.band = b.band AND a.chunk = b.chunk AND a.media_id < b.media_id)
         |SELECT media_a, media_b, CAST(bit_count(xor(da, db)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(da, db)) <= $HamMax
         |ORDER BY media_a, media_b""".stripMargin
  )

  /** CTE chain mirroring [[synthPpmBlob]] + the [[Ppm]] kernels in closed
    * form — seed/pert → dims → per-pixel integer gray list → exact sums →
    * aHash/dHash (1-based list indexing; `1::BIGINT << p` keeps the bit
    * ops in 64-bit integers). Defines `hh(media_id, width, height, n,
    * gray_sum, ahash, dhash)`.
    */
  private def ppmHashCtes: String =
    s"""m AS (SELECT doc_id AS media_id,
       |    CASE WHEN doc_id >= $PpmDupSeedBase
       |         THEN CAST(error('doc_id exceeds PpmDupSeedBase') AS BIGINT)
       |         WHEN doc_id % 4 = 0
       |         THEN $PpmDupSeedBase + (doc_id // 4) % $DupGroups
       |         ELSE doc_id END AS seed,
       |    CASE WHEN doc_id % 4 = 0 THEN 255 * ((doc_id // 4) % 2)
       |         ELSE -1 END AS pert
       |  FROM documents),
       |dm AS (SELECT media_id, CAST(8 + seed % 2 AS INTEGER) AS width,
       |    CAST(5 + seed % 3 AS INTEGER) AS height, seed, pert FROM m),
       |gl AS (SELECT media_id, width, height, width * height AS n,
       |    list_transform(range(0, width * height), p ->
       |      CASE WHEN p = 0 AND pert >= 0 THEN pert
       |           ELSE ${h60Sql("'ppm:' || CAST(seed AS VARCHAR) || ':' || CAST(p AS VARCHAR)")} % 256
       |      END) AS gr
       |  FROM dm),
       |gs AS (SELECT media_id, width, height, n, gr,
       |    CAST(list_sum(gr) AS BIGINT) AS gray_sum FROM gl),
       |hh AS (SELECT media_id, width, height, n, gray_sum,
       |    CAST(list_sum(list_transform(range(0, n), p ->
       |      CASE WHEN gr[p + 1] * n >= gray_sum
       |           THEN 1::BIGINT << p ELSE 0::BIGINT END)) AS BIGINT) AS ahash,
       |    CAST(list_sum(list_transform(range(0, (width - 1) * height), q ->
       |      CASE WHEN gr[(q // (width - 1)) * width + (q % (width - 1)) + 2] >
       |                gr[(q // (width - 1)) * width + (q % (width - 1)) + 1]
       |           THEN 1::BIGINT << q ELSE 0::BIGINT END)) AS BIGINT) AS dhash
       |  FROM gs)""".stripMargin
}
