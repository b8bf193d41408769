package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import TextHash.{toks, toksSql}

/** In-engine BPE (byte-pair-encoding) tokenizer TRAINING — the classic
  * Sennrich et al. merge loop, run entirely as relational operations:
  *
  *   1. collapse the corpus to the word-count table (ONE corpus pass; the
  *      training loop never touches the corpus again — the classic BPE
  *      trick of training on the word VOCABULARY with multiplicities);
  *   2. symbolize each word into characters;
  *   3. per round: count adjacent symbol pairs weighted by word count
  *      (vocab-sized explode), pick the most frequent pair (ties broken
  *      lexicographically so training is deterministic), and merge it
  *      greedily LEFT-TO-RIGHT in every word.
  *
  * Scale shape: after step 1 everything is vocabulary-sized. At 100 TB the
  * corpus pass is the only heavy stage (map-side-combined groupBy); the
  * merge rounds shuffle a vocab-sized relation and localCheckpoint like
  * the other iterative kernels.
  *
  * Cross-engine exactness: a word's symbol sequence is ONE string with
  * symbols joined by the `Sep` control char (absent from the corpus —
  * spec-checked), so the greedy merge is a pure string fold: the last
  * symbol equals `a` iff the accumulator ends with Sep+a (or IS a), and
  * merging rewrites that suffix to a||b. The identical fold runs as
  * `aggregate` here and `list_reduce` in the DuckDB oracle; pair counting,
  * argmax tie-breaks, and every string op are engine-identical, so all
  * `Merges` rounds reproduce bit-for-bit.
  *
  * Greedy-left-to-right correctness of the fold: after a merge the last
  * symbol is a||b, which can never equal `a` again (b is non-empty), so
  * overlapping re-merges ("aaa" with pair (a,a) → "aa","a") fall out of
  * plain string equality — no lookahead state needed.
  */
object BpeTrainer {

  /** Merge rounds — fixed so the oracle can unroll the identical loop. */
  val Merges = 6

  /** Symbol separator (U+001F unit separator; not in the fixture corpus). */
  val Sep = "\u001f"

  /** (word, cnt) — the corpus collapsed to its vocabulary. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(toks(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** word → its characters joined by [[Sep]]. */
  private def symbolize(w: Column): Column =
    array_join(transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1))), Sep)

  /** Run the merge loop; returns (merges table, final word symbolization).
    * merges: (round, a, b, merged, support); words: (word, cnt, sym).
    */
  def train(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    var words = wordCounts(documents(s, d))
      .select(col("word"), col("cnt"), symbolize(col("word")).as("sym"))
      .localCheckpoint()
    var merges = Seq.empty[DataFrame]
    var exhausted = false
    // merge rounds are vocabulary-sized — size their shuffles to the word
    // table, not the session (Graft.withIterShufflePartitions); words is
    // already checkpointed, so the count reads materialized blocks
    graft.Graft.withIterShufflePartitions(s, words.count()) {
    for (r <- 1 to Merges if !exhausted) {
      val pairs = words
        .select(col("cnt"), split(col("sym"), Sep).as("syms"))
        // single-symbol words have no pairs — and sequence(1, 0) DESCENDS
        // in Spark, so they must be filtered before the transform
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> named_struct('a', syms[i-1], 'b', syms[i]))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("cnt").as("total"))
      // The selected merge is ONE row of model state — fetch it to the
      // driver (the Learn/Clustering driver-fold shape) instead of
      // checkpointing a 1-row frame and cross-joining it back; a
      // degenerate corpus that runs out of pairs stops the loop here.
      val bestRows = pairs.orderBy(desc("total"), asc("a"), asc("b"))
        .limit(1).collect()
      if (bestRows.isEmpty) { exhausted = true }
      else {
      val (ma, mb, mTotal) =
        (bestRows(0).getString(0), bestRows(0).getString(1), bestRows(0).getLong(2))
      merges :+= s.range(1).select(lit(r).as("round"), lit(ma).as("a"),
        lit(mb).as("b"), lit(ma + mb).as("merged"), lit(mTotal).as("support"))
      words = words
        .select(col("word"), col("cnt"),
          foldOnceAB(col("sym"), lit(ma), lit(mb)).as("sym"))
        .localCheckpoint()
      }
    }
    } // withIterShufflePartitions
    // a fully degenerate corpus (all words single-symbol) exhausts before
    // recording ANY merge — return an empty merges table with the right
    // schema instead of letting reduce throw on the empty seq
    val mergesOut = merges.reduceOption(_.unionByName(_)).getOrElse(
      s.range(0).select(lit(0).as("round"), lit("").as("a"), lit("").as("b"),
        lit("").as("merged"), lit(0L).as("support")))
    (mergesOut, words)
  }

  /** substr(acc, 1, length(acc) - length(a)) as a Column helper. */
  private def substring_index_tail(acc: Column, a: Column): Column =
    acc.substr(lit(1), length(acc) - length(a))

  /** One application of the training fold for the (a, b) columns in
    * scope — shared verbatim by the trainer loop and [[applyMerges]].
    */
  private def foldOnce(sym: Column): Column = foldOnceAB(sym, col("a"), col("b"))

  /** [[foldOnce]] with explicit merge-pair columns — the trainer passes
    * the round's collected pair as literals.
    */
  private def foldOnceAB(sym: Column, a: Column, b: Column): Column =
    aggregate(split(sym, Sep), lit(""),
      (acc, sChar) =>
        when(acc === "", sChar)
          .when((acc === a ||
              acc.endsWith(concat(lit(Sep), a))) && sChar === b,
            concat(substring_index_tail(acc, a), a, b))
          .otherwise(concat(acc, lit(Sep), sChar)))

  /** Apply a FROZEN merge table to any `word` relation with the exact
    * fold the trainer used, in round order — the deploy-time re-encoder.
    * Unlike the training-words join in bpe_doc_tokens, this segments
    * UNSEEN words too (characters, minus whichever merges apply), which
    * is what a shipped tokenizer must do. Each round's 1-row merge
    * broadcasts through an always-true LEFT join so an absent round
    * (degenerate training) passes rows through unchanged. Adds/updates
    * `sym`; all other input columns survive.
    */
  def applyMerges(words: DataFrame, merges: DataFrame): DataFrame = {
    var cur = words.withColumn("sym", symbolize(col("word")))
    for (r <- 1 to Merges) {
      val m = merges.where(col("round") === r).select(col("a"), col("b"))
      cur = cur.join(broadcast(m), lit(true), "left")
        .withColumn("sym",
          when(col("a").isNull, col("sym")).otherwise(foldOnce(col("sym"))))
        .drop("a", "b")
    }
    cur
  }

  /** Per-document token stats of `docs` (doc_id, text) re-encoded under a
    * frozen merge table — the bpe_doc_tokens contract computed through
    * [[applyMerges]] instead of the training-words join, usable per
    * micro-batch in a stream (stateless given the broadcast merges).
    */
  def encodeDocs(docs: DataFrame, merges: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .where(length(col("word")) > 0)
    applyMerges(words, merges)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("sym"), Sep))).as("n_subwords"),
        sum(length(col("word"))).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
          .as("chars_per_subword"))
  }

  /** Greedy longest-match segmentation of the corpus vocabulary against
    * the trained piece inventory (alphabet ∪ merge outputs) — the OTHER
    * standard subword inference algorithm (WordPiece/BERT-style longest
    * prefix first), run against the same artifact the merge-replay encoder
    * uses, so the two can be audited against each other.
    *
    * Returns (word, cnt, pos, idx, piece). Scale shape: segmentation runs
    * on the DISTINCT-WORD vocabulary, never the corpus; the best-piece
    * table is (word-chars × distinct-piece-lengths)-sized with the tiny
    * piece inventory broadcast; the walk advances every word one piece per
    * round (≤ max word length rounds of vocab-sized state, localCheckpoint
    * per round like every iterative kernel). Greedy always advances:
    * every character of every corpus word is itself a piece (the alphabet
    * comes from the same word relation), so best-piece exists at every
    * position.
    */
  def greedySegments(s: SparkSession, d: String): DataFrame = {
    val (merges, words) = train(s, d)
    greedySegmentsFrom(s, merges, words)
  }

  /** [[greedySegments]] on an already-trained (merges, words) pair — lets
    * the audit query train once and feed both inference paths.
    */
  def greedySegmentsFrom(s: SparkSession, merges: DataFrame,
                         words: DataFrame): DataFrame = {
    val wl = words.select(col("word"), col("cnt"), length(col("word")).as("len"))
    val alpha = wl
      .select(explode(transform(sequence(lit(1), col("len")),
        i => substring(col("word"), i, lit(1)))).as("p"))
      .distinct()
    val pieces = alpha
      .union(merges.where(length(col("merged")) > 0).select(col("merged").as("p")))
      .distinct()
    val lens = pieces.select(length(col("p")).as("l")).distinct()
    // best[word, pos] = longest piece matching at pos — one equi-join on
    // the candidate substring; recomputed NEVER (checkpointed: it feeds
    // every walk round, and its lineage contains the whole training run)
    val best = wl
      .select(col("word"), col("len"), explode(sequence(lit(1), col("len"))).as("pos"))
      .join(broadcast(lens), col("pos") + col("l") - 1 <= col("len"))
      .select(col("word"), col("pos"), col("l"),
        col("word").substr(col("pos"), col("l")).as("c"))
      .join(broadcast(pieces), col("c") === col("p"))
      .groupBy("word", "pos").agg(max("l").as("bl"))
      .localCheckpoint()
    var active = wl
      .select(col("word"), col("cnt"), col("len"), lit(1).as("pos"), lit(0).as("idx"))
      .localCheckpoint()
    var out = Seq.empty[DataFrame]
    // walk rounds are vocabulary-sized (best is checkpointed — the count
    // reads materialized blocks); size their shuffles to the state
    graft.Graft.withIterShufflePartitions(s, best.count()) {
      while (!active.isEmpty) {
        val step = active.join(best, Seq("word", "pos"))
          .select(col("word"), col("cnt"), col("len"), col("pos"), col("idx"),
            col("word").substr(col("pos"), col("bl")).as("piece"), col("bl"))
          .localCheckpoint()
        out :+= step.select("word", "cnt", "pos", "idx", "piece")
        active = step
          .select(col("word"), col("cnt"), col("len"),
            (col("pos") + col("bl")).as("pos"), (col("idx") + 1).as("idx"))
          .where(col("pos") <= col("len"))
          .localCheckpoint()
      }
    }
    // empty-corpus degenerate: no walk rounds ran — empty frame, right schema
    out.reduceOption(_.unionByName(_)).getOrElse(
      s.range(0).select(lit("").as("word"), lit(0L).as("cnt"),
        lit(0).as("pos"), lit(0).as("idx"), lit("").as("piece")))
  }

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The learned merge table — the tokenizer artifact itself.
    "bpe_merges" -> { (s, d) =>
      train(s, d)._1.orderBy("round")
    },

    // Final per-word segmentation after all rounds (Sep swapped for '|'
    // so the output column stays a plain scalar for the driver harness).
    "bpe_word_encoding" -> { (s, d) =>
      train(s, d)._2
        .select(col("word"), col("cnt"),
          size(split(col("sym"), Sep)).as("n_syms"),
          regexp_replace(col("sym"), Sep, "|").as("segments"))
        .orderBy("word")
    },

    // The tokenizer APPLIED back to the corpus: per-document subword
    // counts under the trained merges — word stream joined to the
    // (vocab-sized, broadcast) segmentation table, the deploy step after
    // training. compression = chars per subword, the signal tokenizer
    // quality is judged by.
    "bpe_doc_tokens" -> { (s, d) =>
      val segs = train(s, d)._2
        .select(col("word"), size(split(col("sym"), Sep)).as("n_syms"))
      documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .join(broadcast(segs), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("n_syms").as("n_subwords"),
          sum(length(col("word"))).as("n_chars"))
        .select(col("doc_id"), col("n_words"), col("n_subwords"),
          round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
            .as("chars_per_subword"))
        .orderBy("doc_id")
    },

    // Greedy longest-match (WordPiece/BERT-style) encoding of the corpus
    // vocabulary against the SAME trained piece inventory the merge-replay
    // encoder uses — per word: piece count + the segmentation itself.
    "wp_greedy_encoding" -> { (s, d) =>
      greedySegments(s, d)
        .groupBy("word")
        .agg(first("cnt").as("cnt"), count(lit(1)).as("n_pieces"),
          array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("piece")))),
            t => t.getField("piece")), "|").as("segments"))
        .orderBy("word")
    },

    // The two inference algorithms audited against each other on the same
    // vocabulary: corpus-weighted fertility of greedy longest-match vs
    // merge-replay, plus how often they produce the IDENTICAL
    // segmentation. Greedy can only ever use fewer-or-equal pieces per
    // word than merge order allows when its longest-prefix choice lines
    // up; the audit measures the divergence a deployment would see from
    // swapping inference code paths. All ratios from exact long sums.
    "wp_vs_bpe_fertility" -> { (s, d) =>
      val (merges, words) = train(s, d) // ONE training run feeds both paths
      val wp = greedySegmentsFrom(s, merges, words)
        .groupBy("word")
        .agg(first("cnt").as("cnt"), count(lit(1)).as("wp_n"),
          array_join(transform(
            array_sort(collect_list(struct(col("idx"), col("piece")))),
            t => t.getField("piece")), "|").as("wp_seg"))
      val bpe = words
        .select(col("word"), size(split(col("sym"), Sep)).as("bpe_n"),
          regexp_replace(col("sym"), Sep, "|").as("bpe_seg"))
      wp.join(bpe, "word")
        .agg(count(lit(1)).as("n_words"),
          round(sum(col("cnt") * col("wp_n")).cast("double") /
            sum(col("cnt")).cast("double"), 6).as("wp_fertility"),
          round(sum(col("cnt") * col("bpe_n")).cast("double") /
            sum(col("cnt")).cast("double"), 6).as("bpe_fertility"),
          sum(when(col("wp_seg") === col("bpe_seg"), 1L).otherwise(0L))
            .as("n_identical"))
        .withColumn("agree_frac",
          round(col("n_identical").cast("double") / col("n_words").cast("double"), 6))
    },

    // Tokenizer fertility audit — the standard tokenizer quality probe:
    // subwords-per-word (fertility; 1.0 = every word is one token) and
    // chars-per-subword (compression) per source. High-fertility sources
    // are where a vocabulary underfits — the signal that decides vocab
    // size / retraining before a 100 TB encode run. Same broadcast-segs
    // join as bpe_doc_tokens, rolled up to the (bounded) source grain.
    "bpe_fertility" -> { (s, d) =>
      val segs = train(s, d)._2
        .select(col("word"), size(split(col("sym"), Sep)).as("n_syms"))
      documents(s, d)
        .select(col("source"), explode(toks(col("text"))).as("word"))
        .where(length(col("word")) > 0)
        .join(broadcast(segs), "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum("n_syms").as("n_subwords"),
          sum(length(col("word"))).as("n_chars"))
        .select(col("source"), col("n_words"), col("n_subwords"),
          round(col("n_subwords").cast("double") / col("n_words").cast("double"), 6)
            .as("fertility"),
          round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
            .as("chars_per_subword"))
        .orderBy("source")
    }
  )

  // -------------------------------------------------------------- oracles

  private def foldSql: String =
    s"""list_reduce(string_split(sym, chr(31)), (acc, s) -> CASE
       |  WHEN (acc = b.a OR ends_with(acc, chr(31) || b.a)) AND s = b.b
       |  THEN substr(acc, 1, len(acc) - len(b.a)) || b.a || b.b
       |  ELSE acc || chr(31) || s END)""".stripMargin

  private def trainCtes: String = {
    val sb = new StringBuilder(
      s"""wc AS (SELECT word, count(*) AS cnt FROM (
         |    SELECT unnest(${toksSql("text")}) AS word FROM documents)
         |  WHERE len(word) > 0 GROUP BY word),
         |w0 AS (SELECT word, cnt,
         |    list_aggr(list_transform(range(1, len(word) + 1),
         |      i -> substr(word, CAST(i AS INTEGER), 1)), 'string_agg', chr(31)) AS sym
         |  FROM wc)""".stripMargin)
    for (r <- 1 to Merges) {
      val p = r - 1
      sb.append(
        s""",
           |p$r AS (SELECT p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS total FROM (
           |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
           |      i -> struct_pack(a := syms[i], b := syms[i+1]))) AS p
           |    FROM (SELECT cnt, string_split(sym, chr(31)) AS syms FROM w$p))
           |  GROUP BY 1, 2),
           |b$r AS (SELECT a, b, total FROM p$r ORDER BY total DESC, a, b LIMIT 1),
           |w$r AS (SELECT word, cnt, $foldSql AS sym
           |  FROM w$p CROSS JOIN b$r b)""".stripMargin)
    }
    sb.toString
  }

  /** CTE list mirroring [[greedySegmentsFrom]]: piece inventory from the
    * unrolled training (alphabet ∪ b1..bN merge outputs), the best-piece
    * table, and the greedy walk as a RECURSIVE CTE (the oracle's stand-in
    * for the bounded walk loop; `segs` = (word, cnt, idx, piece)). Callers
    * must open the chain with WITH RECURSIVE.
    */
  private def greedyCtes: String = {
    val mg = (1 to Merges).map(r => s"SELECT a || b AS p FROM b$r")
      .mkString(" UNION ALL ")
    s"""mg AS ($mg),
       |alpha AS (SELECT DISTINCT substr(word, CAST(i AS INTEGER), 1) AS p
       |  FROM (SELECT word, unnest(range(1, len(word) + 1)) AS i FROM wc)),
       |pieces AS (SELECT p FROM alpha UNION SELECT p FROM mg WHERE len(p) > 0),
       |lens AS (SELECT DISTINCT len(p) AS l FROM pieces),
       |wpos AS (SELECT word, unnest(range(1, len(word) + 1)) AS pos FROM wc),
       |cand AS (SELECT wpos.word, pos, l,
       |    substr(wpos.word, CAST(pos AS INTEGER), CAST(l AS INTEGER)) AS c
       |  FROM wpos CROSS JOIN lens WHERE pos + l - 1 <= len(wpos.word)),
       |best AS (SELECT word, pos, max(l) AS bl
       |  FROM cand JOIN pieces ON cand.c = pieces.p GROUP BY word, pos),
       |walk(word, cnt, pos, idx) AS (
       |  SELECT word, cnt, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM wc
       |  UNION ALL
       |  SELECT w.word, w.cnt, w.pos + b.bl, w.idx + 1
       |  FROM walk w JOIN best b ON w.word = b.word AND w.pos = b.pos),
       |segs AS (SELECT w.word, w.cnt, w.idx,
       |    substr(w.word, CAST(w.pos AS INTEGER), CAST(b.bl AS INTEGER)) AS piece
       |  FROM walk w JOIN best b ON w.word = b.word AND w.pos = b.pos)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "wp_greedy_encoding" ->
      s"""WITH RECURSIVE $trainCtes,
         |$greedyCtes
         |SELECT word, CAST(any_value(cnt) AS BIGINT) AS cnt,
         |  count(*) AS n_pieces,
         |  string_agg(piece, '|' ORDER BY idx) AS segments
         |FROM segs GROUP BY word ORDER BY word""".stripMargin,

    "wp_vs_bpe_fertility" ->
      s"""WITH RECURSIVE $trainCtes,
         |$greedyCtes,
         |wp AS (SELECT word, any_value(cnt) AS cnt, count(*) AS wp_n,
         |    string_agg(piece, '|' ORDER BY idx) AS wp_seg
         |  FROM segs GROUP BY word),
         |bpe AS (SELECT word,
         |    CAST(len(string_split(sym, chr(31))) AS INTEGER) AS bpe_n,
         |    replace(sym, chr(31), '|') AS bpe_seg FROM w$Merges)
         |SELECT count(*) AS n_words,
         |  round(CAST(sum(cnt * wp_n) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
         |    AS wp_fertility,
         |  round(CAST(sum(cnt * bpe_n) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
         |    AS bpe_fertility,
         |  CAST(sum(CASE WHEN wp_seg = bpe_seg THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_identical,
         |  round(CAST(sum(CASE WHEN wp_seg = bpe_seg THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS agree_frac
         |FROM wp JOIN bpe USING (word)""".stripMargin,
    "bpe_merges" -> {
      val rows = (1 to Merges).map(r =>
        s"SELECT $r AS round, a, b, a || b AS merged, total AS support FROM b$r")
        .mkString("\n", "\nUNION ALL\n", "\n")
      s"WITH $trainCtes $rows ORDER BY round"
    },

    "bpe_word_encoding" ->
      s"""WITH $trainCtes
         |SELECT word, cnt,
         |  CAST(len(string_split(sym, chr(31))) AS INTEGER) AS n_syms,
         |  replace(sym, chr(31), '|') AS segments
         |FROM w$Merges ORDER BY word""".stripMargin,

    "bpe_doc_tokens" ->
      s"""WITH $trainCtes,
         |segs AS (SELECT word,
         |    CAST(len(string_split(sym, chr(31))) AS INTEGER) AS n_syms
         |  FROM w$Merges),
         |dw AS (SELECT doc_id, unnest(${toksSql("text")}) AS word FROM documents),
         |j AS (SELECT doc_id, dw.word, n_syms FROM dw
         |  JOIN segs ON dw.word = segs.word WHERE len(dw.word) > 0)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_subwords,
         |  round(CAST(sum(len(word)) AS DOUBLE) / CAST(sum(n_syms) AS DOUBLE), 6)
         |    AS chars_per_subword
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bpe_fertility" ->
      s"""WITH $trainCtes,
         |segs AS (SELECT word,
         |    CAST(len(string_split(sym, chr(31))) AS INTEGER) AS n_syms
         |  FROM w$Merges),
         |dw AS (SELECT source, unnest(${toksSql("text")}) AS word FROM documents),
         |j AS (SELECT source, dw.word, n_syms FROM dw
         |  JOIN segs ON dw.word = segs.word WHERE len(dw.word) > 0)
         |SELECT source, count(*) AS n_words,
         |  CAST(sum(n_syms) AS BIGINT) AS n_subwords,
         |  round(CAST(sum(n_syms) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS fertility,
         |  round(CAST(sum(len(word)) AS DOUBLE) / CAST(sum(n_syms) AS DOUBLE), 6)
         |    AS chars_per_subword
         |FROM j GROUP BY source ORDER BY source""".stripMargin
  )
}
