package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Substring, TextAnalysis, TextHash}

/** The r10 chunked position-scan rewrites (TextHash.ownedPositions and
  * its consumers) must be ROW-SET IDENTICAL to the direct per-position
  * forms they replaced — the chunking is a physical rewrite only. Docs
  * span many chunks (multi-kilochar synthetics + fixture docs) so the
  * ownership tiling, the chunk-tail least() bound, and the final partial
  * chunk are all exercised.
  */
class ChunkedScanSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = {
    val rng = new scala.util.Random(17)
    def junk(n: Int) = (0 until n).map(_ =>
      if (rng.nextInt(6) == 0) ' ' else ('a' + rng.nextInt(26)).toChar).mkString
    (Seq(
      (0L, junk(10000)),            // ~78 chunks at stride 128
      (1L, junk(128)),              // exactly one stride
      (2L, junk(129)),              // one char into the second chunk
      (3L, junk(19)),               // shorter than ExactLen
      (4L, junk(20)),               // exactly ExactLen
      (5L, "abab" * 700)            // periodic: every gram repeated
    ) ++ Tables.documents(spark, sfDir).where(col("doc_id") < 10)
      .select("doc_id", "text").collect()
      .map(r => (100L + r.getLong(0), r.getString(1)))).toDF("doc_id", "text")
  }

  private def assertSetEqual(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, s"$what diverges")
    assert(a.count() > 0, s"$what vacuous")
  }

  test("ownedPositions tiles every position exactly once with chunk-local equivalence") {
    for (w <- Seq(1, 8, 20, 64)) {
      val got = TextHash.ownedPositions(docs, w)
        .select(col("doc_id"), col("i"),
          col("chunk").substr(col("li"), lit(w)).as("g"))
      val ref = docs.where(length(col("text")) >= w)
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("text")) - (w - 1))).as("i"),
          col("text"))
        .select(col("doc_id"), col("i"),
          col("text").substr(col("i"), lit(w)).as("g"))
      assertSetEqual(got, ref, s"ownedPositions(w=$w)")
    }
  }

  test("exactGramsOf equals the unchunked per-position hash relation") {
    val got = Substring.exactGramsOf(docs)
    val ref = docs.where(length(col("text")) >= Substring.ExactLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${Substring.ExactLen - 1}), " +
          s"i -> named_struct('i', i, 'h', xxhash64(substring(text, i, ${Substring.ExactLen}))))"))
        .as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    assertSetEqual(got, ref, "exactGramsOf")
  }

  test("charEntropy equals a split-based character count") {
    val got = TextAnalysis.charEntropy(docs)
    // independent reference: count chars via split-to-array explode
    val Fix = 1e9
    val cells = docs.select(col("doc_id"),
        explode(split(col("text"), "(?!^)")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val n = cells.groupBy("doc_id").agg(sum("c").as("n"))
    val p = col("c").cast("double") / col("n").cast("double")
    val ref = cells.join(n, "doc_id")
      .select(col("doc_id"), col("n"),
        round(-p * log(p) * Fix).cast("long").as("ec"))
      .groupBy("doc_id")
      .agg(first("n").as("n_chars"),
        round(sum("ec") / Fix, 6).as("char_entropy"))
    val g2 = got.select("doc_id", "n_chars", "char_entropy")
    val r2 = ref.select(col("doc_id"), col("n_chars").cast(g2.schema("n_chars").dataType),
      col("char_entropy"))
    assertSetEqual(g2, r2, "charEntropy")
  }

  test("cdcChunks equals the unchunked position-scan form") {
    import graft.operators.TextHash.h60
    val got = Retrieval.cdcChunks(docs)
    val d = docs.select(col("doc_id"), col("text"), length(col("text")).as("n"))
    val cuts = d
      .select(col("doc_id"), col("text"),
        explode(when(col("n") >= Retrieval.CdcW,
          sequence(lit(1), col("n") - (Retrieval.CdcW - 1)))
          .otherwise(array().cast("array<int>"))).as("p"))
      .where(h60(col("text").substr(col("p"), lit(Retrieval.CdcW)))
        % Retrieval.CdcD === 0)
      .select(col("doc_id"), (col("p") + Retrieval.CdcW - 1).cast("long").as("e"))
    val ends = cuts.union(d.select(col("doc_id"), col("n").cast("long").as("e")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("e")
    val ref = ends
      .withColumn("b", coalesce(lag("e", 1).over(w), lit(0L)))
      .join(d, "doc_id")
      .select(col("doc_id"), (col("b") + 1).as("chunk_start"),
        (col("e") - col("b")).as("chunk_len"),
        col("text").substr((col("b") + 1).cast("int"),
          (col("e") - col("b")).cast("int")).as("chunk"))
    assertSetEqual(got, ref, "cdcChunks")
  }

  test("cdcChunks two-level block assembly holds past one super-block") {
    // the L1 super-block is 64·2048 = 131,072 chars; a ~300k-char doc
    // forces 3 super-blocks so the (sbid, j) -> bid tiling and the
    // truncated tail super-block are both exercised. Reference: raw
    // substr spans (O(len) per chunk — fine at this length, quadratic
    // at probe scale, which is why the engine form exists).
    import graft.operators.TextHash.h60
    val rng = new scala.util.Random(23)
    val big = (0 until 300123).map(_ =>
      if (rng.nextInt(6) == 0) ' ' else ('a' + rng.nextInt(26)).toChar).mkString
    val bdocs = Seq((0L, big), (1L, big.take(131072)), (2L, big.take(131073)))
      .toDF("doc_id", "text")
    val got = Retrieval.cdcChunks(bdocs)
    val d = bdocs.select(col("doc_id"), col("text"), length(col("text")).as("n"))
    val cuts = d
      .select(col("doc_id"), col("text"),
        explode(when(col("n") >= Retrieval.CdcW,
          sequence(lit(1), col("n") - (Retrieval.CdcW - 1)))
          .otherwise(array().cast("array<int>"))).as("p"))
      .where(h60(col("text").substr(col("p"), lit(Retrieval.CdcW)))
        % Retrieval.CdcD === 0)
      .select(col("doc_id"), (col("p") + Retrieval.CdcW - 1).cast("long").as("e"))
    val ends = cuts.union(d.select(col("doc_id"), col("n").cast("long").as("e")))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("e")
    val ref = ends
      .withColumn("b", coalesce(lag("e", 1).over(w), lit(0L)))
      .join(d, "doc_id")
      .select(col("doc_id"), (col("b") + 1).as("chunk_start"),
        (col("e") - col("b")).as("chunk_len"),
        col("text").substr((col("b") + 1).cast("int"),
          (col("e") - col("b")).cast("int")).as("chunk"))
    assertSetEqual(got, ref, "cdcChunks multi-super-block")
  }

  test("source_style_cosine's carried gram matrix equals the direct form") {
    // the Drift rewire: window-3 grams with a carried source column —
    // COUNTS must match (the cosine is over the count matrix), so compare
    // at the aggregated (source, gram, c) grain
    val sd = docs.withColumn("source", concat(lit("s"), col("doc_id") % 3))
    val got = TextHash.ownedPositions(
        sd.select(col("doc_id"), col("source"), col("text")),
        window = 3, carry = Seq("source"))
      .select(col("source"), col("chunk").substr(col("li"), lit(3)).as("gram"))
      .groupBy("source", "gram").agg(count(lit(1)).as("c"))
    val ref = sd
      .select(col("source"), col("text"),
        explode(when(length(col("text")) >= 3,
          sequence(lit(1), length(col("text")) - 2))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("source"), col("text").substr(col("i"), lit(3)).as("gram"))
      .groupBy("source", "gram").agg(count(lit(1)).as("c"))
    assertSetEqual(got, ref, "style gram matrix")
  }

  test("retrieval chunk windows equal the direct stride-window form") {
    // drive the grouped-chunk rewrite through its public query on the
    // fixture, against the direct per-window reference over the same table
    val got = Retrieval.queries("chunk_overlap")(spark, sfDir)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "chunk")
    val ref = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("n_chars") - 1, lit(Retrieval.ChunkStride)))
          .as("s"))
      .select(col("doc_id"),
        (col("s") / Retrieval.ChunkStride).cast("long").as("chunk_id"),
        col("s").as("chunk_start"),
        col("text").substr(col("s") + 1, lit(Retrieval.ChunkWidth)).as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .select("doc_id", "chunk_id", "chunk_start", "chunk_len", "chunk")
    assertSetEqual(got, ref, "chunk windows")
  }
}
