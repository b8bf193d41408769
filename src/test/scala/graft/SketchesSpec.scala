package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoders, functions => F}

import graft.functions.{BloomFilterAgg, CountMinSketchAgg, HyperLogLogAgg, MisraGriesAgg}
import graft.operators.Sketches

class SketchesSpec extends SparkSpecBase {

  test("cms_matrix: every row of the sketch conserves the total token count") {
    val cells = Sketches.queries("cms_matrix")(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("t")).count()
    val byRow = cells.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byRow.keySet == (0 until CountMinSketchAgg.Depth).toSet)
    byRow.values.foreach(s => assert(s == total))
    assert(cells.forall(_.getLong(2) > 0))
    assert(cells.forall(r => r.getInt(1) >= 0 && r.getInt(1) < CountMinSketchAgg.Width))
  }

  test("cms merge is partition-order independent (1 vs many partitions)") {
    import spark.implicits._
    val cms = F.udaf(CountMinSketchAgg, Encoders.STRING)
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val one = toks.coalesce(1).agg(cms($"tok")).head.getSeq[Long](0)
    val many = toks.repartition(16).agg(cms($"tok")).head.getSeq[Long](0)
    assert(one == many)
  }

  test("cms_estimates: one-sided error — never underestimates, exact on heavy hitters") {
    val est = Sketches.queries("cms_estimates")(spark, sfDir).collect()
    assert(est.length == 10)
    est.foreach { r =>
      assert(r.getBoolean(3), s"underestimate on ${r.getString(0)}")
      assert(r.getLong(2) >= r.getLong(1))
    }
    // local reference for the bucket function on a known token
    val j0 = CountMinSketchAgg.bucket(0, "the")
    assert(j0 >= 0 && j0 < CountMinSketchAgg.Width)
  }

  test("bloom: set bits match the local position function exactly") {
    val bits = Sketches.queries("bloom_bits")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val want = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => BloomFilterAgg.positions(r.getString(0)))
      .map(_.toLong).toSet
    assert(bits == want)
    assert(bits.forall(p => p >= 0 && p < BloomFilterAgg.M))
  }

  test("bloom merge is partition-order independent (1 vs many partitions)") {
    import spark.implicits._
    val bloom = F.udaf(BloomFilterAgg, Encoders.STRING)
    val keys = Tables.documents(spark, sfDir).select(col("text").as("k"))
    val one = keys.coalesce(1).agg(bloom($"k")).head.getSeq[Long](0)
    val many = keys.repartition(16).agg(bloom($"k")).head.getSeq[Long](0)
    assert(one == many)
  }

  test("hll_registers: populated registers match the local slot function exactly") {
    val got = Sketches.queries("hll_registers")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val want = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .collect().map(_.getString(0))
      .map(HyperLogLogAgg.slot)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(got == want)
    assert(got.keys.forall(i => i >= 0 && i < HyperLogLogAgg.M))
    assert(got.values.forall(r => r >= 1 && r <= 61))
  }

  test("hll merge is partition-order independent (1 vs many partitions)") {
    import spark.implicits._
    val hll = F.udaf(HyperLogLogAgg, Encoders.STRING)
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val one = toks.coalesce(1).agg(hll($"tok")).head.getSeq[Int](0)
    val many = toks.repartition(16).agg(hll($"tok")).head.getSeq[Int](0)
    assert(one == many)
  }

  test("hll estimate lands within 20% of the exact distinct count") {
    import spark.implicits._
    val hll = F.udaf(HyperLogLogAgg, Encoders.STRING)
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val regs = toks.agg(hll($"tok")).head.getSeq[Int](0)
    val exact = toks.distinct().count().toDouble
    val est = HyperLogLogAgg.estimate(regs)
    assert(est / exact > 0.8 && est / exact < 1.25,
      s"est=$est exact=$exact")
    // and the oracled audit query agrees
    val check = Sketches.queries("hll_distinct_check")(spark, sfDir).head()
    assert(check.getInt(0) == HyperLogLogAgg.M)
    assert(check.getLong(2) == exact.toLong)
    assert(check.getBoolean(3))
  }

  test("qsketch cells conserve group counts and match the local bin function") {
    val cells = Sketches.queries("qsketch_cells")(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // independent local reference histogram
    val ref = li.groupBy { case (f, c) =>
      (f, graft.functions.HistQuantileAgg.binOf(c))
    }.view.mapValues(_.length.toLong).toMap
    val got = cells.map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === ref)
  }

  test("qsketch merge is partition-order independent (1 vs many partitions)") {
    import spark.implicits._
    val qsk = F.udaf(graft.functions.HistQuantileAgg, Encoders.scalaLong)
    val cents = Tables.lineitem(spark, sfDir)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
    val one = cents.coalesce(1).agg(qsk($"c")).head.getSeq[Long](0)
    val many = cents.repartition(16).agg(qsk($"c")).head.getSeq[Long](0)
    assert(one == many)
  }

  test("qsketch quantile bins contain the true order statistics (check query all-hit)") {
    val check = Sketches.queries("qsketch_check")(spark, sfDir).collect()
    assert(check.length == 9) // 3 flags x 3 quantiles
    check.foreach { r => assert(r.getBoolean(4), s"miss: $r") }
  }

  test("bloom gate: no false negatives; stats row reconciles with gate rows") {
    val gate = Sketches.queries("bloom_gate")(spark, sfDir).collect()
    assert(gate.nonEmpty)
    // one-sided contract: every exact member tests positive
    gate.filter(_.getBoolean(1)).foreach(r => assert(r.getBoolean(2)))
    val stats = Sketches.queries("bloom_gate_stats")(spark, sfDir).head()
    assert(stats.getLong(0) == gate.length)
    assert(stats.getLong(1) == gate.count(_.getBoolean(1)))
    assert(stats.getLong(2) == gate.count(_.getBoolean(2)))
    assert(stats.getLong(3) == gate.count(r => r.getBoolean(2) && !r.getBoolean(1)))
    assert(stats.getLong(4) == 0L)
  }

  test("hll_by_source_check: grouped estimates in range, merge equals global") {
    val rows = Sketches.queries("hll_by_source_check")(spark, sfDir).collect()
    Graft.releaseCaches(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)                 // exact distinct
      assert(r.getBoolean(3), s"estimate out of range for ${r.getString(0)}")
      assert(r.getBoolean(4), "per-source merge != global sketch")
    }
  }

  /** Sequential classic Misra-Gries — the single-partition reference. */
  private def mgSequential(items: Seq[String], k: Int): Map[String, Long] =
    items.foldLeft(Map.empty[String, Long])(new MisraGriesAgg(k).reduce)

  private def benfordItems: Seq[String] =
    (1L to 20000L).map(i => (i * i).toString.take(1))

  test("misra-gries: single partition equals the sequential reference") {
    import spark.implicits._
    val mg = F.udaf(new MisraGriesAgg(6), Encoders.STRING)
    val got = benfordItems.toDF("item").coalesce(1)
      .agg(mg($"item")).head.getMap[String, Long](0).toMap
    assert(got == mgSequential(benfordItems, 6))
  }

  test("misra-gries: k >= domain is exact and partition-independent") {
    import spark.implicits._
    val mg = F.udaf(new MisraGriesAgg(64), Encoders.STRING)
    val exact = benfordItems.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    for (p <- Seq(1, 4, 32)) {
      val got = benfordItems.toDF("item").repartition(p)
        .agg(mg($"item")).head.getMap[String, Long](0).toMap
      assert(got == exact, s"not exact at $p partitions")
    }
  }

  test("misra-gries contract holds under every partitioning (decrement mode)") {
    import spark.implicits._
    val k = 6
    val mg = F.udaf(new MisraGriesAgg(k), Encoders.STRING)
    val exact = benfordItems.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = benfordItems.size.toLong
    for (p <- Seq(1, 4, 16, 64)) {
      val got = benfordItems.toDF("item").repartition(p)
        .agg(mg($"item")).head.getMap[String, Long](0).toMap
      assert(got.size <= k, s"summary exceeds k at $p partitions")
      val s = got.values.sum
      exact.foreach { case (t, c) =>
        val est = got.getOrElse(t, 0L)
        assert(est <= c, s"overestimate of $t at $p partitions")
        assert(c - est <= (n - s).toDouble / (k + 1),
          s"bound violated for $t at $p partitions: $c - $est > ${(n - s).toDouble / (k + 1)}")
      }
      // no-false-negative corollary: every item above N/(k+1) survives
      exact.filter(_._2 > n.toDouble / (k + 1)).keys
        .foreach(t => assert(got.contains(t), s"guaranteed hitter $t missing at $p partitions"))
    }
  }

  test("misra-gries merge: over-full union subtracts the (k+1)-th largest") {
    val agg = new MisraGriesAgg(2)
    val merged = agg.merge(Map("a" -> 10L, "b" -> 4L), Map("b" -> 3L, "c" -> 5L))
    // combined: a=10 b=7 c=5 -> subtract 3rd largest (5): a=5 b=2
    assert(merged == Map("a" -> 5L, "b" -> 2L))
    // ties at the cut all drop together; size stays <= k
    val tied = agg.merge(Map("a" -> 5L, "b" -> 5L), Map("c" -> 5L, "d" -> 5L))
    assert(tied.isEmpty)
  }
}
