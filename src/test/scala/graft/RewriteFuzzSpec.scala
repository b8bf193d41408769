package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential fuzz for the whole rewrite pipeline (SURVEY §5 tier-1
  * property testing applied to the Catalyst rules): generate hundreds of
  * random query SHAPES per rule family — band predicates, self-join
  * extremes, row_number filters, max-per-key filters, and mixed
  * compositions — execute each with every kill switch ON and OFF, and
  * assert row-for-row equality. RuleSpec proves pairwise composition on
  * hand-picked queries; this sweeps the shape space the hand-picked set
  * can't cover (random widths incl. 0, strict vs non-strict bounds,
  * BETWEEN vs offset forms, multi-key partitions, min/sum/count extremes,
  * null-bearing order columns, k = 1 edges).
  *
  * Deterministically seeded: every draw comes from ScalaCheck generators
  * advanced from a FIXED `Seed`, so a failure reproduces exactly.
  *
  * Vacuity guard: the generator marks each shape `mustFire` when the
  * rule's documented guards say it qualifies, and the harness asserts the
  * rewrite really fired for every such shape — a fuzz suite whose
  * rewrites silently stopped matching would otherwise pass forever.
  * Deliberate decline shapes (zero-width bands, probe-side filters) stay
  * in the sweep with mustFire = false: their correctness IS the on == off
  * equality.
  */
class RewriteFuzzSpec extends SparkSpecBase {

  private val ShapesPerFamily = 200

  /** Deterministic sample stream from a fixed seed. */
  private def sample[A](g: Gen[A], seed: Long, n: Int): Seq[A] = {
    var s = Seed(seed)
    (0 until n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, s)
      s = s.next
      a
    }
  }

  /** Small fixture with the adversarial ingredients the rules must hold
    * under: low-cardinality keys (ties everywhere), NULL values, negative
    * values, duplicate whole rows, and a unique id for deterministic
    * rank tie-breaks.
    */
  private lazy val fuzzTable: String = {
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = (0 until 120).map { i =>
      Row(
        i.toLong,
        rnd.nextInt(5),
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(21).toLong - 5L),
        java.lang.Long.valueOf(rnd.nextInt(50).toLong),
        rnd.nextInt(3))
    } ++ Seq( // duplicate whole rows (multiplicity must survive rewrites)
      Row(120L, 1, java.lang.Long.valueOf(7L), java.lang.Long.valueOf(9L), 0),
      Row(121L, 1, java.lang.Long.valueOf(7L), java.lang.Long.valueOf(9L), 0),
      // adversarial pair for the agg-side-filter family: in key 9, the
      // group's max(w) row has NULL v, and another row's v equals the
      // UNFILTERED max — so `max(w) ... WHERE v IS NOT NULL` joined on
      // t.v = m.mx returns nothing while an unguarded window form would
      // keep id 201 (falsification-checked: the pre-guard rule fails on
      // this shape; random draws alone never landed w's max inside v's
      // range)
      Row(200L, 9, null, java.lang.Long.valueOf(7L), 0),
      Row(201L, 9, java.lang.Long.valueOf(7L), java.lang.Long.valueOf(5L), 0))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", IntegerType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("w", LongType, nullable = false),
      StructField("g2", IntegerType, nullable = false)))
    // PARQUET-backed, not an RDD/LocalRelation: column pruning over a
    // non-pruning relation inserts a Project between agg-side filters and
    // the relation, which structurally declines the self-join rewrites —
    // the fuzz would sweep shapes the rules can never fire on (found via
    // falsification: the pre-guard rule passed an RDD-backed killer shape
    // it demonstrably fails on over parquet)
    val tmp = java.nio.file.Files.createTempDirectory("fuzz_t_").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("fuzz_t")
    "fuzz_t"
  }

  private val AllSwitches = Seq(
    "spark.graft.bandJoin.enabled", "spark.graft.maxJoinElim.enabled",
    "spark.graft.groupTopK.enabled", "spark.graft.maxPerKey.enabled")

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Run every shape with rewrites ON, asserting each shape the generator
    * marked `mustFire` really fired its rewrite (per-shape, not a
    * fraction: a rule that silently stops matching any sub-shape fails
    * here), then all again with every kill switch OFF, and demand
    * equality shape by shape. Shapes with mustFire = false are the
    * generator's DELIBERATE decline cases (guards like band width >= 1 or
    * probe-side filters breaking sameResult) — their correctness is the
    * on == off equality.
    */
  private def differential(family: String, shapes: Seq[(String, Boolean)],
                           fired: DataFrame => Boolean): Unit = {
    Graft.init(spark)
    assert(shapes.count(_._2) * 2 >= shapes.length,
      s"$family generator drifted: most shapes are decline cases")
    val on = shapes.zipWithIndex.map { case ((q, mustFire), i) =>
      val df = spark.sql(q)
      if (mustFire) assert(fired(df),
        s"$family shape #$i did not fire its rewrite:\n$q\n${physical(df)}")
      rows(q)
    }
    AllSwitches.foreach(k => spark.conf.set(k, "false"))
    try shapes.zip(on).zipWithIndex.foreach { case (((q, _), want), i) =>
      val got = rows(q)
      assert(got == want,
        s"$family shape #$i diverged (rewrites on vs off):\n$q\n" +
          s"on=${want.take(5)}...\noff=${got.take(5)}...")
    } finally AllSwitches.foreach(spark.conf.unset)
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  // ------------------------------------------------------------ families

  test(s"band-join fuzz: $ShapesPerFamily random band shapes, on == off") {
    val t = fuzzTable
    val gen: Gen[(String, Boolean)] = for {
      w1 <- Gen.chooseNum(0L, 3L)
      w2 <- Gen.chooseNum(0L, 3L)
      form <- Gen.chooseNum(0, 4)
      idGuard <- Gen.oneOf(true, false)
    } yield {
      val band = form match {
        case 0 => s"abs(a.v - b.v) <= $w1"
        case 1 => s"abs(a.v - b.v) < ${w1 + 1}"
        case 2 => s"(a.v - b.v) BETWEEN ${-w1} AND $w2"
        case 3 => s"a.v <= b.v + $w1 AND a.v >= b.v - $w2"
        case _ => s"(a.v - b.v) <= $w1 AND (b.v - a.v) <= $w2"
      }
      // the rule's documented width >= 1 guard: a zero-width band is an
      // equality in disguise and DECLINES (still correct, just unrewritten)
      val width = form match {
        case 0 | 1 => w1
        case _ => math.max(w1, w2)
      }
      val guard = if (idGuard) " AND a.id < b.id" else ""
      (s"SELECT a.id AS ia, b.id AS ib, a.v AS va, b.v AS vb " +
        s"FROM $t a JOIN $t b ON $band$guard", width >= 1)
    }
    differential("bandJoin", sample(gen, 101L, ShapesPerFamily),
      df => {
        val p = physical(df)
        !p.contains("CartesianProduct") && !p.contains("NestedLoop")
      })
  }

  test(s"max-self-join fuzz: $ShapesPerFamily random extreme shapes, on == off") {
    val t = fuzzTable
    val gen: Gen[(String, Boolean)] = for {
      agg <- Gen.oneOf("max(v)", "min(v)", "sum(v)", "count(v)", "count(*)")
      twoKeys <- Gen.oneOf(true, false)
      projectMx <- Gen.oneOf(true, false)
      preFilter <- Gen.chooseNum(0, 5) // 4/6 clean, 2/6 decline cases
    } yield {
      val keys = if (twoKeys) "k, g2" else "k"
      val on = (if (twoKeys) "t.k = m.k AND t.g2 = m.g2" else "t.k = m.k") +
        " AND t.v = m.mx"
      val proj = if (projectMx) "t.id, t.k, t.v, m.mx" else "t.id, t.k, t.v"
      // a probe-side filter pushes below the join, the two sides stop
      // being sameResult-equal, and the rewrite (correctly) declines —
      // keep such shapes in the sweep as decline cases
      val where = preFilter match {
        case 4 => " WHERE t.w >= 10"
        case 5 => " WHERE t.id % 2 = 0"
        case _ => ""
      }
      (s"SELECT $proj FROM $t t JOIN " +
        s"(SELECT $keys, $agg AS mx FROM $t GROUP BY $keys) m ON $on$where",
        preFilter <= 3)
    }
    differential("maxSelfJoin", sample(gen, 202L, ShapesPerFamily),
      df => !df.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test(s"max-self-join AGG-SIDE-filter fuzz: $ShapesPerFamily shapes, " +
    "on == off under constraint-prop on AND off") {
    // The shape family the round-7 review found unguarded: the agg side
    // alone filters rows (incl. IsNotNull on the compared column v) while
    // aggregating v or a DIFFERENT column w. With constraint propagation
    // ON the probe gains the inferred isnotnull and many shapes soundly
    // fire; with it OFF the asymmetric-filter guards must decline.
    // mustFire is undecidable here without replicating the guard chain,
    // so this family is pure differential: on == off is the contract.
    val t = fuzzTable
    Graft.init(spark)
    val gen: Gen[(String, Boolean)] = for {
      aggCol <- Gen.oneOf("v", "w")
      fn <- Gen.oneOf("max", "min", "sum", "count")
      filt <- Gen.oneOf("", " WHERE v IS NOT NULL", " WHERE w >= 10",
        " WHERE v IS NOT NULL AND w >= 10")
      cp <- Gen.oneOf(true, false)
    } yield (s"SELECT t.k, t.v, t.w FROM $t t JOIN " +
      s"(SELECT k, $fn($aggCol) AS mx FROM $t$filt GROUP BY k) m " +
      "ON t.k = m.k AND t.v = m.mx", cp)
    // corner shapes pinned on top of the random draws: the exact
    // killer combination (max of a FOREIGN column + agg-side IsNotNull
    // on v + constraint-prop off) must be in every run — the 200 random
    // draws can miss the 1/64 combination entirely
    val pinned = Seq("", " WHERE v IS NOT NULL", " WHERE w >= 10",
      " WHERE v IS NOT NULL AND w >= 10").map { filt =>
      // projection reads exactly the agg side's column set {k, v, w}:
      // an extra probe-only column (id) would asymmetrically prune the
      // two parquet scans and structurally decline the rule before the
      // filter guard is ever consulted
      (s"SELECT t.k, t.v, t.w FROM $t t JOIN " +
        s"(SELECT k, max(w) AS mx FROM $t$filt GROUP BY k) m " +
        "ON t.k = m.k AND t.v = m.mx", false)
    }
    (pinned ++ sample(gen, 303L, ShapesPerFamily)).zipWithIndex.foreach {
      case ((q, cp), i) =>
        spark.conf.set("spark.sql.constraintPropagation.enabled", cp.toString)
        try {
          val on = rows(q)
          AllSwitches.foreach(k => spark.conf.set(k, "false"))
          val off = try rows(q) finally AllSwitches.foreach(spark.conf.unset)
          assert(on == off,
            s"agg-side-filter shape #$i diverged (constraintProp=$cp):\n$q\n" +
              s"on=${on.take(5)}...\noff=${off.take(5)}...")
        } finally spark.conf.unset("spark.sql.constraintPropagation.enabled")
    }
  }

  test(s"group-top-k fuzz: $ShapesPerFamily random row_number filters, on == off") {
    val t = fuzzTable
    val gen: Gen[(String, Boolean)] = for {
      k <- Gen.chooseNum(1, 4)
      twoKeys <- Gen.oneOf(true, false)
      ordCol <- Gen.oneOf("v DESC NULLS LAST", "v ASC NULLS FIRST", "w DESC")
      strict <- Gen.oneOf(true, false)
      keepRank <- Gen.oneOf(true, false)
    } yield {
      val part = if (twoKeys) "k, g2" else "k"
      val pred = if (strict) s"rn < ${k + 1}" else s"rn <= $k"
      val outer = if (keepRank) "*" else "id, k, v"
      (s"SELECT $outer FROM (SELECT id, k, g2, v, w, " +
        s"row_number() OVER (PARTITION BY $part ORDER BY $ordCol, id) AS rn " +
        s"FROM $t) WHERE $pred", true)
    }
    differential("groupTopK", sample(gen, 303L, ShapesPerFamily),
      df => physical(df).contains("GroupTopK"))
  }

  test(s"max-per-key fuzz: $ShapesPerFamily random extreme-window filters, on == off") {
    val t = fuzzTable
    val gen: Gen[(String, Boolean)] = for {
      fn <- Gen.oneOf("max", "min")
      twoKeys <- Gen.oneOf(true, false)
      postFilter <- Gen.chooseNum(0, 2)
    } yield {
      val part = if (twoKeys) "k, g2" else "k"
      val post = postFilter match {
        case 0 => ""
        case 1 => " AND w >= 5"
        case _ => " AND id % 3 = 0"
      }
      (s"SELECT id, k, v FROM (SELECT id, k, g2, v, w, " +
        s"$fn(v) OVER (PARTITION BY $part) AS mx FROM $t) " +
        s"WHERE v = mx$post", true)
    }
    differential("maxPerKey", sample(gen, 404L, ShapesPerFamily),
      df => physical(df).contains("MaxPerKey"))
  }

  test(s"flush-guard fuzz: $ShapesPerFamily shapes under randomized tiny flush guards, on == off") {
    // The physical operators' memory guards (GroupTopK
    // maxKeysPerPartition; MaxPerKey maxKeysPerPartition +
    // maxBufferedRows) promise ANSWER-PRESERVING degradation: a flush
    // weakens the map-side prune, never the result. Drive both operators
    // through random shapes under randomized TINY guards (1-6 keys, 1-10
    // rows vs the fixture's 5+ keys per partition and up to 124 buffered
    // rows — every shape flushes, most flush repeatedly) and demand
    // equality with the rewrites off entirely.
    val t = fuzzTable
    Graft.init(spark)
    val guardKeys = Seq("spark.graft.groupTopK.maxKeysPerPartition",
      "spark.graft.maxPerKey.maxKeysPerPartition",
      "spark.graft.maxPerKey.maxBufferedRows")
    // conf-plumbing falsification probe: an illegal guard value must
    // reach the operator and trip its require — proving the execution
    // path reads THESE confs (a fuzz that silently ran on defaults
    // would pass forever)
    val probeTopK = s"SELECT id FROM (SELECT id, row_number() OVER " +
      s"(PARTITION BY k ORDER BY id) AS rn FROM $t) WHERE rn <= 2"
    val probeMpk = s"SELECT id FROM (SELECT id, v, max(v) OVER " +
      s"(PARTITION BY k) AS mx FROM $t) WHERE v = mx"
    spark.conf.set("spark.graft.groupTopK.maxKeysPerPartition", "0")
    intercept[Throwable] { spark.sql(probeTopK).collect() }
    spark.conf.unset("spark.graft.groupTopK.maxKeysPerPartition")
    spark.conf.set("spark.graft.maxPerKey.maxBufferedRows", "0")
    intercept[Throwable] { spark.sql(probeMpk).collect() }
    spark.conf.unset("spark.graft.maxPerKey.maxBufferedRows")

    val gen: Gen[(String, Boolean, Int, Int)] = for {
      isTopK <- Gen.oneOf(true, false)
      k <- Gen.chooseNum(1, 4)
      twoKeys <- Gen.oneOf(true, false)
      ordCol <- Gen.oneOf("v DESC NULLS LAST", "v ASC NULLS FIRST", "w DESC")
      fn <- Gen.oneOf("max", "min")
      maxKeys <- Gen.chooseNum(1, 6)
      maxRows <- Gen.chooseNum(1, 10)
    } yield {
      val part = if (twoKeys) "k, g2" else "k"
      val q =
        if (isTopK)
          s"SELECT id, k, v FROM (SELECT id, k, g2, v, w, row_number() OVER " +
            s"(PARTITION BY $part ORDER BY $ordCol, id) AS rn FROM $t) WHERE rn <= $k"
        else
          s"SELECT id, k, v FROM (SELECT id, k, g2, v, w, $fn(v) OVER " +
            s"(PARTITION BY $part) AS mx FROM $t) WHERE v = mx"
      (q, isTopK, maxKeys, maxRows)
    }
    val shapes = sample(gen, 606L, ShapesPerFamily)
    val on = shapes.zipWithIndex.map { case ((q, isTopK, mk, mr), i) =>
      spark.conf.set("spark.graft.groupTopK.maxKeysPerPartition", mk.toString)
      spark.conf.set("spark.graft.maxPerKey.maxKeysPerPartition", mk.toString)
      spark.conf.set("spark.graft.maxPerKey.maxBufferedRows", mr.toString)
      try {
        val df = spark.sql(q)
        assert(physical(df).contains(if (isTopK) "GroupTopK" else "MaxPerKey"),
          s"flush-guard shape #$i did not fire its operator:\n$q\n${physical(df)}")
        rows(q)
      } finally guardKeys.foreach(spark.conf.unset)
    }
    AllSwitches.foreach(k => spark.conf.set(k, "false"))
    try shapes.zip(on).zipWithIndex.foreach { case (((q, _, mk, mr), want), i) =>
      val got = rows(q)
      assert(got == want,
        s"flush-guard shape #$i diverged (guards $mk keys/$mr rows):\n$q\n" +
          s"on=${want.take(5)}...\noff=${got.take(5)}...")
    } finally AllSwitches.foreach(spark.conf.unset)
  }

  test(s"mixed-composition fuzz: $ShapesPerFamily random rule stacks, on == off") {
    val t = fuzzTable
    val gen: Gen[(String, Boolean)] = for {
      template <- Gen.chooseNum(0, 2)
      k <- Gen.chooseNum(1, 3)
      agg <- Gen.oneOf("max(v)", "min(v)")
      w <- Gen.chooseNum(1L, 2L) // width >= 1: template 1's band must fire
    } yield (template match {
      case 0 =>
        // self-join extreme collapsed, then row_number <= k on top
        s"""SELECT * FROM (
           |  SELECT t.id, t.k, t.v, row_number() OVER (
           |    PARTITION BY t.k ORDER BY t.w DESC, t.id) AS rn
           |  FROM $t t JOIN (SELECT k, $agg AS mx FROM $t GROUP BY k) m
           |    ON t.k = m.k AND t.v = m.mx)
           |WHERE rn <= $k""".stripMargin
      case 1 =>
        // band join feeding a per-key extreme filter
        s"""SELECT id, kk, s FROM (
           |  SELECT p.id, p.kk, p.s, max(p.s) OVER (PARTITION BY p.kk) AS mx
           |  FROM (SELECT a.id, a.k AS kk, a.v + b.v AS s
           |        FROM $t a JOIN $t b ON abs(a.v - b.v) <= $w) p)
           |WHERE s = mx""".stripMargin
      case _ =>
        // top-k per key over a max-per-key survivor set
        s"""SELECT * FROM (
           |  SELECT id, k, v, row_number() OVER (
           |    PARTITION BY k ORDER BY id) AS rn
           |  FROM (SELECT id, k, g2, v, max(w) OVER (PARTITION BY g2) AS mw, w
           |        FROM $t) WHERE w = mw)
           |WHERE rn <= $k""".stripMargin
    }, true)
    differential("mixed", sample(gen, 505L, ShapesPerFamily),
      df => {
        val p = physical(df)
        (p.contains("GroupTopK") || p.contains("MaxPerKey")) &&
          !p.contains("CartesianProduct") && !p.contains("NestedLoop")
      })
  }
}
