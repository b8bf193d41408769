package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import TextHash.{toks, toksSql}

/** In-engine unigram-LM (SentencePiece-style, Kudo 2018 "Subword
  * Regularization") tokenizer training — the third member of the subword
  * family next to [[BpeTrainer]]'s merge loop and its WordPiece greedy
  * inference, and the one whose training step is a per-word VITERBI
  * decode rather than a greedy merge pick:
  *
  *   1. collapse the corpus to the word-count table (one corpus pass —
  *      the same word-grain trick as BPE; training never re-reads text);
  *   2. candidate inventory: every single character (coverage guarantee)
  *      plus the top-[[VocabExtra]] multi-char substrings (length <=
  *      [[MaxPieceLen]]) by corpus-weighted occurrence count, with
  *      initial piece log-probs from those counts;
  *   3. E-step: exact Viterbi segmentation of every distinct word under
  *      the current probs — each word's candidate spans equi-join the
  *      broadcast inventory ONCE, collect into a per-word array, and the
  *      DP + backtrack run as a single per-row aggregate expression
  *      (positions bounded by [[MaxWordLen]]);
  *   4. M-step: re-estimate piece probabilities from the Viterbi paths
  *      (piece counts weighted by word counts) — one grouped pass over
  *      the exploded segmentations.
  *
  * Scale shape: after step 1 everything is vocabulary-sized, and the
  * whole decode is ONE shuffle (the per-word candidate collect) plus an
  * embarrassingly parallel O(len * MaxPieceLen) per-row expression — no
  * per-position rounds, no corpus re-reads. The piece inventory is tiny
  * and broadcasts.
  *
  * Cross-engine exactness: scores are integer sums of 1e-9 fixed-point
  * log-probs (round(ln(p)*1e9) as BIGINT), so Viterbi comparisons are
  * exact integer comparisons in both engines. The DP picks, per (word,
  * pos), the max of (score9, -n_pieces, last_piece_len) — a total order
  * whose backtracked path equals the global optimum under (score9 DESC,
  * n_pieces ASC, reversed-piece-length-sequence DESC): score and count
  * are additive so the lexicographic prefix order survives any common
  * continuation, and on full ties the reversed length sequence compares
  * the last piece first, exactly the per-position key. The DuckDB oracle
  * brute-force ENUMERATES every segmentation by recursive CTE (bounded:
  * fixture words are <= 8 chars) and ranks by that same global key —
  * engine-DP-vs-oracle-enumeration equality IS the correctness check.
  */
object UnigramLm {

  /** Longest candidate piece (single digit — the oracle's reversed
    * length-sequence tie-break compares digit strings).
    */
  val MaxPieceLen = 4

  /** Words longer than this are excluded from training (none in the
    * fixture; a real corpus pre-splits rare megawords). Bounds the DP
    * round count.
    */
  val MaxWordLen = 16

  /** Multi-char pieces kept in the inventory (single chars always stay). */
  val VocabExtra = 48

  /** (word, cnt, len) — the corpus collapsed to its bounded-length
    * vocabulary.
    */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(toks(col("text"))).as("word"))
      .where(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"), length(col("word")).as("len"))

  /** The trained piece inventory: (piece, wcnt, logp9) — all single
    * chars plus the top-[[VocabExtra]] multi-char substrings by
    * corpus-weighted occurrence count (every span occurrence counts,
    * weighted by word count), log-probs normalized over the SELECTED
    * inventory as 1e-9 fixed-point integers.
    */
  private def inventory(wc: DataFrame): DataFrame = {
    val sub = wc
      .select(col("cnt"), col("word"), col("len"),
        explode(sequence(lit(1), col("len"))).as("j"))
      .select(col("cnt"), col("word"), col("len"), col("j"),
        explode(sequence(lit(1), least(lit(MaxPieceLen), col("len") - col("j") + 1)))
          .as("l"))
      .select(col("cnt"), col("word").substr(col("j"), col("l")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("wcnt"))
    val chars = sub.where(length(col("piece")) === 1)
    val multi = sub.where(length(col("piece")) > 1)
      .orderBy(desc("wcnt"), asc("piece")).limit(VocabExtra)
    val inv = chars.unionByName(multi)
    val tot = inv.agg(sum("wcnt").as("tot"))
    inv.crossJoin(broadcast(tot))
      .select(col("piece"), col("wcnt"), col("tot"),
        round(log(col("wcnt").cast("double") / col("tot").cast("double")) * 1e9)
          .cast("long").as("logp9"))
  }

  /** The whole Viterbi DP + backtrack as ONE per-word expression over the
    * word's pre-joined candidate array `cands` of (j, l, lp) spans
    * (start, length, fixed-point log-prob). dp[p+1] holds the best
    * (score9, -n_pieces, last_piece_len) for the prefix ending at p —
    * array_max over structs IS the lexicographic Viterbi key. The
    * backtrack runs in the aggregate's FINISH lambda, where `dp` is a
    * bound lambda variable, not a column reference: Catalyst cannot
    * re-inline (and so re-evaluate) the DP into each lookup the way it
    * would across collapsed projections — the O(len^2) trap
    * TextHash.shingleRows documents. Every position extends (single
    * chars are always pieces), so array_max never sees an empty set.
    */
  private def viterbiExpr: String =
    s"""aggregate(
       |  sequence(1, len),
       |  array(named_struct('s9', CAST(0 AS BIGINT), 'nn', 0, 'bl', 0)),
       |  (acc, p) -> acc || array(array_max(transform(
       |    filter(cands, c -> c.j + c.l = p + 1),
       |    c -> named_struct('s9', element_at(acc, c.j).s9 + c.lp,
       |                      'nn', element_at(acc, c.j).nn - 1,
       |                      'bl', c.l)))),
       |  dp -> named_struct(
       |    's9', element_at(dp, len + 1).s9,
       |    'np', -element_at(dp, len + 1).nn,
       |    'ps', aggregate(
       |      sequence(1, len),
       |      named_struct('pos', len, 'ps', CAST(array() AS ARRAY<STRING>)),
       |      (st, x) -> IF(st.pos <= 0, st,
       |        named_struct(
       |          'pos', st.pos - element_at(dp, st.pos + 1).bl,
       |          'ps', concat(array(substring(word,
       |            st.pos - element_at(dp, st.pos + 1).bl + 1,
       |            element_at(dp, st.pos + 1).bl)), st.ps))),
       |      st -> st.ps)))""".stripMargin

  /** Train and Viterbi-decode: returns (pieces, words) where pieces =
    * (piece, wcnt, tot, logp9) and words = (word, cnt, len, score9, np,
    * ps) with ps the best segmentation left-to-right. ONE shuffle builds
    * the per-word candidate arrays (span explode -> broadcast piece join
    * -> collect_list); the DP itself is a per-row expression — at 100 TB
    * this is a single vocabulary-sized pass, not max-word-length rounds
    * of vocabulary-sized shuffles (the measured-faster alternative: the
    * bounded-round relational DP cost ~4x more wall time per query at
    * sf0.1 in per-round job overhead alone).
    */
  def train(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val wc = wordCounts(documents(s, d)).localCheckpoint()
    val pieces = inventory(wc).localCheckpoint()
    val cands = wc
      .select(col("word"), col("cnt"), col("len"),
        explode(sequence(lit(1), col("len"))).as("j"))
      .select(col("word"), col("cnt"), col("len"), col("j"),
        explode(sequence(lit(1), least(lit(MaxPieceLen), col("len") - col("j") + 1)))
          .as("l"))
      .select(col("word"), col("cnt"), col("len"), col("j"), col("l"),
        col("word").substr(col("j"), col("l")).as("c"))
      .join(broadcast(pieces.select(col("piece"), col("logp9"))),
        col("c") === col("piece"))
      .groupBy("word", "cnt", "len")
      .agg(collect_list(struct(col("j").as("j"), col("l").as("l"),
        col("logp9").as("lp"))).as("cands"))
    val words = cands
      .select(col("word"), col("cnt"), col("len"), expr(viterbiExpr).as("v"))
      .select(col("word"), col("cnt"), col("len"),
        col("v.s9").as("score9"), col("v.np").as("np"), col("v.ps").as("ps"))
      .localCheckpoint()
    (pieces, words)
  }

  /** Fixed-point log-prob penalty for a character absent from the frozen
    * inventory (deploy-time unknown fallback; ln(1e-9) ~ -20.7 — worse
    * than any trained piece, so unks never displace a known path).
    */
  val UnkLogp9: Long = math.round(math.log(1e-9) * 1e9)

  /** Viterbi-encode ANY (doc_id, text) relation under a FROZEN piece
    * inventory — the deploy-time face. Unlike training, unseen words and
    * even unseen CHARACTERS must encode: a single char absent from the
    * inventory becomes its own piece at the [[UnkLogp9]] penalty, so the
    * DP always completes. Known words reproduce their training
    * segmentation exactly (same inventory, same DP). Per-document
    * roll-up mirrors BpeTrainer.encodeDocs; stateless given the
    * broadcast inventory, so a stream applies it per micro-batch and
    * matches batch exactly (StreamingSpec proves it).
    */
  def encodeDocs(docs: DataFrame, pieces: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .where(length(col("word")).between(1, MaxWordLen))
    val wl = words.select("word").distinct()
      .select(col("word"), length(col("word")).as("len"))
    val spans = wl
      .select(col("word"), col("len"),
        explode(sequence(lit(1), col("len"))).as("j"))
      .select(col("word"), col("len"), col("j"),
        explode(sequence(lit(1), least(lit(MaxPieceLen), col("len") - col("j") + 1)))
          .as("l"))
      .select(col("word"), col("len"), col("j"), col("l"),
        col("word").substr(col("j"), col("l")).as("c"))
    val known = spans
      .join(broadcast(pieces.select(col("piece"), col("logp9"))),
        col("c") === col("piece"))
      .select(col("word"), col("len"), col("j"), col("l"), col("logp9"))
    val unk = spans.where(col("l") === 1)
      .join(broadcast(pieces.select(col("piece"))),
        col("c") === col("piece"), "left_anti")
      .select(col("word"), col("len"), col("j"), col("l"),
        lit(UnkLogp9).as("logp9"))
    val seg = known.unionByName(unk)
      .groupBy("word", "len")
      .agg(collect_list(struct(col("j").as("j"), col("l").as("l"),
        col("logp9").as("lp"))).as("cands"))
      .select(col("word"), expr(viterbiExpr).as("v"))
      .select(col("word"), size(col("v.ps")).as("n_pieces"))
    words.join(broadcast(seg), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_pieces").as("n_subwords"),
        sum(length(col("word"))).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        round(col("n_chars").cast("double") / col("n_subwords").cast("double"), 6)
          .as("chars_per_subword"))
  }

  // -------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The trained inventory with initial log-probs and the one-EM-round
    // re-estimate: em_cnt = corpus-weighted count of each piece in the
    // Viterbi paths, em_logp its re-normalized log-prob (NULL for pieces
    // the decode never used — the rows an EM iteration would prune).
    "ulm_vocab" -> { (s, d) =>
      val (pieces, words) = train(s, d)
      val em = words.select(col("cnt"), explode(col("ps")).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("em_cnt"))
      val emTot = em.agg(sum("em_cnt").as("em_tot"))
      pieces
        .join(em, Seq("piece"), "left")
        .crossJoin(broadcast(emTot))
        .select(col("piece"), length(col("piece")).cast("long").as("l"), col("wcnt"),
          round(log(col("wcnt").cast("double") / col("tot").cast("double")), 6)
            .as("logp"),
          coalesce(col("em_cnt"), lit(0L)).as("em_cnt"),
          when(col("em_cnt") > 0,
            round(log(col("em_cnt").cast("double") / col("em_tot").cast("double")), 6))
            .as("em_logp"))
        .orderBy("piece")
    },

    // Per-word Viterbi segmentation under the initial probs — the
    // E-step artifact: piece count, exact integer path score (shown at
    // 1e-9 scale), and the segmentation itself.
    "ulm_word_encoding" -> { (s, d) =>
      train(s, d)._2
        .select(col("word"), col("cnt"),
          size(col("ps")).cast("long").as("n_pieces"),
          round(col("score9").cast("double") / 1e9, 6).as("score"),
          array_join(col("ps"), "|").as("segments"))
        .orderBy("word")
    },

    // The EM-improvement law, made checkable: the M-step's re-estimated
    // probabilities are the multinomial MLE of the Viterbi paths' piece
    // usage, so the corpus complete-data log-likelihood of those SAME
    // paths is non-decreasing under them (Gibbs' inequality) — gain >= 0
    // always, and its size is how far the seed counts were from the
    // usage distribution. Both likelihoods are exact DECIMAL sums of
    // cnt-weighted fixed-point log-probs over the identical path table;
    // pieces the decode never used cannot appear in a path, so the EM
    // side is total.
    "ulm_em_gain" -> { (s, d) =>
      val dec = DecimalType(38, 0)
      val (pieces, words) = train(s, d)
      val use = words.select(col("cnt"), explode(col("ps")).as("piece"))
      val em = use.groupBy("piece").agg(sum("cnt").as("em_cnt"))
      val emTot = em.agg(sum("em_cnt").as("em_tot"))
      val emP = em.crossJoin(broadcast(emTot))
        .select(col("piece"),
          round(log(col("em_cnt").cast("double") / col("em_tot").cast("double")) * 1e9)
            .cast("long").as("em_logp9"))
      use
        .join(broadcast(pieces.select(col("piece"), col("logp9"))), "piece")
        .join(broadcast(emP), "piece")
        .agg(sum(col("cnt").cast(dec) * col("logp9")).as("l0"),
          sum(col("cnt").cast(dec) * col("em_logp9")).as("l1"))
        .select(round(col("l0").cast("double") / 1e9, 6).as("ll_seed"),
          round(col("l1").cast("double") / 1e9, 6).as("ll_em"),
          round((col("l1") - col("l0")).cast("double") / 1e9, 6).as("em_gain"))
    },

    // The tokenizer applied back to the corpus, per source: fertility
    // (subwords per word) and compression (chars per subword) — the
    // deploy-side quality roll-up, mirroring bpe_fertility so the two
    // trainers are directly comparable.
    "ulm_fertility" -> { (s, d) =>
      val perWord = train(s, d)._2
        .select(col("word"), size(col("ps")).as("n_pieces"))
      documents(s, d)
        .select(col("source"), explode(toks(col("text"))).as("word"))
        .where(length(col("word")).between(1, MaxWordLen))
        .join(broadcast(perWord), "word")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
          sum("n_pieces").as("n_subwords"),
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

  /** Inventory CTEs mirroring [[inventory]] term for term. */
  private def invCtes: String =
    s"""wc AS (SELECT word, count(*) AS cnt, len(word) AS wl FROM (
       |    SELECT unnest(${toksSql("text")}) AS word FROM documents)
       |  WHERE len(word) BETWEEN 1 AND $MaxWordLen GROUP BY word),
       |sub AS (SELECT substr(word, CAST(j AS INTEGER), CAST(l AS INTEGER)) AS piece,
       |    CAST(sum(cnt) AS BIGINT) AS wcnt FROM (
       |    SELECT word, cnt, j, unnest(range(1, least($MaxPieceLen, wl - j + 1) + 1)) AS l
       |    FROM (SELECT word, cnt, wl, unnest(range(1, wl + 1)) AS j FROM wc))
       |  GROUP BY 1),
       |inv AS (SELECT piece, wcnt FROM sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, wcnt FROM (SELECT piece, wcnt FROM sub WHERE len(piece) > 1
       |    ORDER BY wcnt DESC, piece LIMIT $VocabExtra)),
       |tot AS (SELECT CAST(sum(wcnt) AS BIGINT) AS tot FROM inv),
       |pieces AS (SELECT piece, wcnt, tot,
       |    CAST(round(ln(CAST(wcnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9)
       |      AS BIGINT) AS logp9
       |  FROM inv CROSS JOIN tot)""".stripMargin

  /** Brute-force path enumeration + global ranking, yielding one best
    * row per word (`best`) and its exploded pieces (`bseg`). The lseq
    * key PREPENDS each piece's single-digit length, so a string DESC
    * compare ranks by last-piece-length-first — the engine DP's
    * backtracked tie-break. `seg` is carried as a LIST(VARCHAR), never a
    * separator-joined string: a separator round-trip
    * (string_split(seg, '|')) would silently mis-split any piece that
    * itself contained the separator — impossible on the fixture's
    * alphabetic vocabulary, but a latent corruption for arbitrary input,
    * and the engine side carries a true array (`ps`) anyway.
    */
  private def vitCtes: String =
    s"""paths(word, cnt, wl, pos, score9, np, lseq, seg) AS (
       |  SELECT word, cnt, wl, 0, CAST(0 AS BIGINT), 0, '',
       |    CAST([] AS VARCHAR[]) FROM wc
       |  UNION ALL
       |  SELECT p.word, p.cnt, p.wl, p.pos + len(pc.piece),
       |    p.score9 + pc.logp9, p.np + 1,
       |    CAST(len(pc.piece) AS VARCHAR) || p.lseq,
       |    list_append(p.seg, pc.piece)
       |  FROM paths p JOIN pieces pc
       |    ON pc.piece = substr(p.word, CAST(p.pos + 1 AS INTEGER), len(pc.piece))
       |      AND p.pos + len(pc.piece) <= p.wl),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY word
       |    ORDER BY score9 DESC, np ASC, lseq DESC) AS rn
       |  FROM paths WHERE pos = wl),
       |best AS (SELECT word, cnt, np, score9, seg FROM ranked WHERE rn = 1),
       |bseg AS (SELECT word, cnt, unnest(seg) AS piece
       |  FROM best)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ulm_vocab" ->
      s"""WITH RECURSIVE $invCtes,
         |$vitCtes,
         |em AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS em_cnt
         |  FROM bseg GROUP BY piece),
         |emt AS (SELECT CAST(sum(em_cnt) AS BIGINT) AS em_tot FROM em)
         |SELECT p.piece, len(p.piece) AS l, p.wcnt,
         |  round(ln(CAST(p.wcnt AS DOUBLE) / CAST(p.tot AS DOUBLE)), 6) AS logp,
         |  coalesce(em.em_cnt, 0) AS em_cnt,
         |  CASE WHEN em.em_cnt > 0 THEN
         |    round(ln(CAST(em.em_cnt AS DOUBLE) / CAST(emt.em_tot AS DOUBLE)), 6)
         |  END AS em_logp
         |FROM pieces p LEFT JOIN em ON p.piece = em.piece CROSS JOIN emt
         |ORDER BY p.piece""".stripMargin,

    "ulm_word_encoding" ->
      s"""WITH RECURSIVE $invCtes,
         |$vitCtes
         |SELECT word, cnt, CAST(np AS BIGINT) AS n_pieces,
         |  round(CAST(score9 AS DOUBLE) / 1e9, 6) AS score,
         |  array_to_string(seg, '|') AS segments
         |FROM best ORDER BY word""".stripMargin,

    "ulm_em_gain" ->
      s"""WITH RECURSIVE $invCtes,
         |$vitCtes,
         |em AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS em_cnt
         |  FROM bseg GROUP BY piece),
         |emt AS (SELECT CAST(sum(em_cnt) AS BIGINT) AS em_tot FROM em),
         |emp AS (SELECT piece,
         |    CAST(round(ln(CAST(em_cnt AS DOUBLE) / CAST(em_tot AS DOUBLE)) * 1e9)
         |      AS BIGINT) AS em_logp9
         |  FROM em CROSS JOIN emt),
         |ll AS (SELECT
         |    sum(CAST(cnt AS HUGEINT) * p.logp9) AS l0,
         |    sum(CAST(cnt AS HUGEINT) * emp.em_logp9) AS l1
         |  FROM bseg JOIN pieces p ON bseg.piece = p.piece
         |    JOIN emp ON bseg.piece = emp.piece)
         |SELECT round(CAST(l0 AS DOUBLE) / 1e9, 6) AS ll_seed,
         |  round(CAST(l1 AS DOUBLE) / 1e9, 6) AS ll_em,
         |  round(CAST(l1 - l0 AS DOUBLE) / 1e9, 6) AS em_gain
         |FROM ll""".stripMargin,

    "ulm_fertility" ->
      s"""WITH RECURSIVE $invCtes,
         |$vitCtes,
         |pw AS (SELECT word, CAST(np AS BIGINT) AS n_pieces FROM best),
         |dw AS (SELECT source, unnest(${toksSql("text")}) AS word FROM documents),
         |j AS (SELECT source, dw.word, n_pieces FROM dw
         |  JOIN pw ON dw.word = pw.word
         |  WHERE len(dw.word) BETWEEN 1 AND $MaxWordLen)
         |SELECT source, count(*) AS n_words,
         |  CAST(sum(n_pieces) AS BIGINT) AS n_subwords,
         |  round(CAST(sum(n_pieces) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS fertility,
         |  round(CAST(sum(len(word)) AS DOUBLE) / CAST(sum(n_pieces) AS DOUBLE), 6)
         |    AS chars_per_subword
         |FROM j GROUP BY source ORDER BY source""".stripMargin
  )
}
