package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text hashing primitives shared by the dedup /
  * similarity / text-analysis packs.
  *
  * Every hash bottoms out in md5 so the DuckDB oracle can reproduce it
  * bit-for-bit: both engines agree on md5 hex, and 15 hex chars (60 bits)
  * fit a signed BIGINT. Engine-native hashes (Spark xxhash64 / DuckDB hash)
  * are NOT interchangeable and are deliberately avoided in oracled queries.
  *
  * Scale note: all of these are pure per-row expressions — embarrassingly
  * parallel maps with no shuffle; they stay inside whole-stage codegen.
  */
object TextHash {
  /** Mersenne prime 2^31-1; modulus for minhash permutations. */
  val P = 2147483647L

  /** Self-registering safety net: h60/dot resolve through the session
    * function registry (call_function), so a library caller composing
    * e.g. Dedup.signatureIndex on a session that never saw Graft.init
    * would die at analysis with UNRESOLVED_ROUTINE. Guarded by a registry
    * lookup so the per-plan-build cost is one hash probe (Graft.init's
    * createOrReplace would WARN-log on every call); the public entry
    * points ALSO init on their own DataFrame's session — the
    * active-session heuristic can miss exotic multi-session builds.
    */
  private def ensureInit(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      if (!s.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier("graft_h60")))
        graft.Graft.init(s)
    }

  /** 60-bit hash of a string: first 15 hex chars of md5, parsed base-16.
    * DuckDB equivalent: CAST(('0x' || substr(md5(x),1,15)) AS BIGINT).
    * Implemented as the single codegen'd [[graft.functions.Md5Hash60]]
    * expression (registered by Graft.init) — bit-identical to the composed
    * `conv(substring(md5(c), 1, 15), 16, 10)` but without the per-row hex
    * materialization + base-16 reparse (~0.55 s / 1.45M rows recovered;
    * Md5Hash60Spec proves value equality including NULL and "").
    */
  def h60(c: Column): Column = {
    ensureInit()
    call_function("graft_h60", c)
  }

  /** SQL snippet (DuckDB) mirroring [[h60]]. */
  def h60Sql(x: String): String =
    s"CAST(('0x' || substr(md5($x),1,15)) AS BIGINT)"

  /** Every 1-based text position i that starts a full `window`-char gram,
    * with a CHUNK-local view: (doc_id, i, chunk, li) where
    * `substr(chunk, li, k)` for k ≤ window reads the same bytes as
    * `substr(text, i, k)`. The point is the physical shape:
    * UTF8String.substring scans from the string START (O(position)), so
    * any per-position substring loop over the raw document goes quadratic
    * on long docs — the r9 winnow probe measured 2.2M-char docs
    * unfinishable, and the r10 probe caught the substring-grain family
    * burning 1,580 s CPU per task in the same scan. Here the text is cut
    * into stride-aligned chunks of `stride + window - 1` chars via a
    * 1-row-explode Generate barrier (evaluated ONCE per chunk row — the
    * barrier keeps projection collapse from inlining the chunk substring
    * into the per-position stage), and chunk k OWNS global 0-based starts
    * [k·stride, (k+1)·stride): ownership tiles the position space with NO
    * seam duplicates, and the chunk's last char k·stride+stride+window-2
    * covers every owned gram — so the emitted (doc_id, i) set is exactly
    * the unchunked one (consumers' specs prove row-set equality). Every
    * expression stays in whole-stage codegen; per-position scans are
    * bounded by the chunk, not the document.
    */
  /** L1-block multiplier: blocks of `BlockChunks · stride` chars are cut
    * from the document first, then chunks are cut from BLOCKS — because
    * the chunk extraction substring is itself O(offset), single-level
    * fine chunking costs len²/(2·stride) in extraction scans alone
    * (measured: the r10 probe's first run saw winnow at stride 114 spend
    * ~21 GB of char scans per 2.2M-char giant extracting 127-char chunks
    * — 210 s vs 64 s for the coarse-chunk r9 form). Two levels cost
    * len²/(2·B) + len·B/(2·stride): ~366M char-ops per giant at B =
    * 64·128, and nothing at fixture lengths (single block).
    */
  val BlockChunks = 64

  /** Grid-restricted variant of the position scan: emits only positions
    * with `(i - 1) % grid == 0` (the stride-sampled span/window grids);
    * `fullWindowOnly=false` keeps tail positions whose window is
    * truncated by the document end (RAG chunk windows want them).
    */
  def ownedPositions(docs: DataFrame, window: Int, stride: Int = 128,
                     grid: Int = 1, fullWindowOnly: Boolean = true,
                     carry: Seq[String] = Nil): DataFrame = {
    require(window >= 1 && stride >= 1 && grid >= 1,
      "need window>=1, stride>=1, grid>=1")
    require(stride % grid == 0, s"stride $stride must be a multiple of grid $grid")
    val b = BlockChunks * stride // L1 block stride (multiple of grid)
    val bl = b + window - 1
    val c = stride + window - 1
    val cc = carry.map(col)
    val last =
      if (fullWindowOnly) length(col("text")) - window
      else length(col("text")) - 1
    docs
      .where(length(col("text")) >= (if (fullWindowOnly) window else 1))
      // L1: block offsets + block text, materialized once per block row
      .select(col("doc_id") +: cc :+ col("text") :+ last.as("lastp") :+
        explode(sequence(lit(0), last, lit(b))).as("boff"): _*)
      .select(col("doc_id") +: cc :+ col("boff") :+
        (least(lit(b), col("lastp") - col("boff") + 1)).as("bn") :+
        explode(array(col("text").substr(col("boff") + 1, lit(bl))))
          .as("btext"): _*)
      // L2: chunk offsets within the block (local), chunk text from the
      // BLOCK — extraction scan bounded by the block, not the document
      .select(col("doc_id") +: cc :+ col("boff") :+ col("btext") :+ col("bn") :+
        explode(sequence(lit(0), col("bn") - 1, lit(stride))).as("coff"): _*)
      .select(col("doc_id") +: cc :+ col("boff") :+ col("coff") :+
        least(lit(stride), col("bn") - col("coff")).as("ni") :+
        explode(array(col("btext").substr(col("coff") + 1, lit(c))))
          .as("chunk"): _*)
      // positions on the grid within the chunk (grid divides stride and
      // the block stride, so local grid phase is always 1)
      .select(col("doc_id") +: cc :+ col("boff") :+ col("coff") :+ col("chunk") :+
        explode(sequence(lit(1), col("ni"), lit(grid))).as("li"): _*)
      .select(col("doc_id") +: cc :+
        (col("boff") + col("coff") + col("li")).as("i") :+
        col("chunk") :+ col("li"): _*)
  }

  /** Whitespace tokens of lowercased text. DuckDB:
    * string_split_regex(lower(x), '\s+') — both return [""] for "".
    */
  def toks(c: Column): Column = split(lower(c), "\\s+")

  def toksSql(x: String): String = s"string_split_regex(lower($x), '\\s+')"

  /** Word n-gram shingles (n=3) of a token array; empty when < 3 tokens
    * (guarded: Spark's sequence(0, negative) would count DOWN).
    * DuckDB: list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2]).
    */
  def shingles3(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))

  def shingles3Sql(t: String): String =
    s"CASE WHEN len($t) >= 3 THEN list_transform(range(1, len($t)-1), " +
      s"i -> $t[i] || ' ' || $t[i+1] || ' ' || $t[i+2]) ELSE [] END"

  /** (doc_id, sh) rows: one row per word 3-shingle, via posexplode + window
    * lead. Semantically identical to explode(shingles3(...)) but an order of
    * magnitude faster: the array-HOF form is interpreted AND Catalyst
    * inlines the split() into the lambda, re-tokenizing the text once per
    * shingle index (O(tokens^2) per doc — measured 8s for 260k shingles at
    * sf0.1 vs <1s for this shape). One shuffle on doc_id, which the usual
    * downstream groupBy(doc_id) then reuses (no second exchange).
    */
  def shingleRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      // concat_ws silently skips nulls -> a trailing 2-token "shingle";
      // filter instead of relying on concat semantics
      .where(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("sh"))
  }

  /** Sequential-fold dot product of two double arrays. Matches DuckDB's
    * list_sum(list_transform(range(1,n+1), i -> a[i]*b[i])) bit-for-bit
    * (both are left-to-right double accumulation; verified empirically —
    * DuckDB's list_dot_product does NOT match, it accumulates in float32).
    *
    * Delegates to the codegen'd graft_dot expression (graft.functions
    * .DotProductD) — callers must run Graft.init(spark) first. The
    * equivalent HOF formulation (aggregate + zip_with) is 10x slower:
    * Spark evaluates lambda HOFs interpreted.
    */
  def dot(a: Column, b: Column): Column = {
    ensureInit() // same safety net as [[h60]]
    call_function("graft_dot", a, b)
  }

  /** Cast a float array to double element-wise (float*float in a zip_with
    * lambda would multiply in float32 and break oracle parity).
    */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dotSql(a: String, b: String, n: Int): String =
    s"list_sum(list_transform(range(1, ${n + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
}
