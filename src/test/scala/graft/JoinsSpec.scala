package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Salted join: result multiset identical to the plain join; shuffle key
  * actually includes the salt.
  */
class JoinsSpec extends SparkSpecBase {

  test("saltedJoin result is identical to the unsalted join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_name")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    val salted = Joins.saltedJoin(li, sup, "l_suppkey",
        saltSource = col("l_orderkey") * 10 + col("l_linenumber"), factor = 8)
      .select(plain.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
      .collect().toSeq
    assert(salted === plain)
  }

  test("asofJoin picks the latest right value at or before each left ts") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def t(sec: Int) = new Timestamp(sec * 1000L)
    val clicks = Seq((1L, "u", t(5)), (2L, "u", t(15)), (3L, "u", t(30)), (4L, "v", t(10)))
      .toDF("event_id", "user", "ts")
    val purchases = Seq(("u", t(10), 100.0), ("u", t(15), 200.0), ("u", t(20), 300.0))
      .toDF("user", "pts", "pval")
    val out = graft.operators.Joins
      .asofJoin(clicks, purchases, "user", "ts", "pts", "pval")
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(out.toSeq === Seq(
      1L -> None,          // click before any purchase
      2L -> Some(200.0),   // same-instant purchase visible (ts <= semantics)
      3L -> Some(300.0),   // latest prior
      4L -> None))         // other key, no purchases
  }

  test("asofJoin: a matched NULL value wins over an older non-null; NULL rightTs never matches") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def t(sec: Int) = new Timestamp(sec * 1000L)
    val clicks = Seq((1L, "u", t(15)), (2L, "w", t(5))).toDF("event_id", "user", "ts")
    val purchases = Seq(
      ("u", Option(t(5)), Option(100.0)),
      ("u", Option(t(10)), None),          // matched row with NULL value
      ("w", Option.empty[Timestamp], Option(7.0))) // NULL ts: unmatchable
      .toDF("user", "pts", "pval")
    val out = graft.operators.Joins
      .asofJoin(clicks, purchases, "user", "ts", "pts", "pval")
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      1L -> None,   // the t=10 NULL-valued purchase is the match, NOT t=5's 100.0
      2L -> None))  // NULL-ts purchase must not phantom-match
  }

  test("asofJoin plans a single shuffle on the key (no inequality join)") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    val clicks = Seq((1L, "u", new Timestamp(0L))).toDF("event_id", "user", "ts")
    val purchases = Seq(("u", new Timestamp(0L), 1.0)).toDF("user", "pts", "pval")
    val j = graft.operators.Joins.asofJoin(clicks, purchases, "user", "ts", "pts", "pval")
    val plan = j.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"asofJoin must not plan a join:\n$plan")
  }

  test("rangeJoin equals the naive non-equi join on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("value"))
    val w = 600L
    val naive = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          abs(unix_micros(col("ts")) - unix_micros(col("pts"))) <= w * 1000000L)
      .select("event_id", "pts", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).sorted.toSeq
    val binned = Joins.rangeJoin(clicks, purchases.withColumnRenamed("p_user", "user_id"),
        "user_id", "ts", "pts", w)
      .select("event_id", "pts", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).sorted.toSeq
    assert(binned.nonEmpty, "fixture should produce in-window pairs")
    assert(binned === naive)
  }

  test("rangeJoin boundary: exactly-at-window and one-past pairs, across bin edges") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    // window 10s; right rows at the exact window edge (inclusive), one past
    // it, and in a neighboring bin
    val l = Seq((1L, "u", t(100))).toDF("event_id", "user", "ts")
    val r = Seq(("u", t(90), 1.0), ("u", t(110), 2.0), ("u", t(89), 3.0),
      ("u", t(111), 4.0), ("u", t(101), 5.0))
      .toDF("user", "pts", "value")
    val got = Joins.rangeJoin(l, r, "user", "ts", "pts", 10L)
      .select("value").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got === Seq(1.0, 2.0, 5.0))
  }

  test("intervalOverlapJoin: exactly-once parity with the naive overlap join") {
    val s = spark
    import s.implicits._
    // seeded random intervals, lengths 0..30 over a 0..400 range — many
    // span several 8-wide bins, many share multiple bins
    val rnd = new scala.util.Random(19L)
    val left = (1 to 120).map { i =>
      val st = rnd.nextInt(400).toLong; (i.toLong, st, st + rnd.nextInt(31))
    }.toDF("lid", "ls", "le")
    val right = (1 to 150).map { i =>
      val st = rnd.nextInt(400).toLong; (i.toLong, st, st + rnd.nextInt(31))
    }.toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(left, right, 8L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = left.as("a").crossJoin(right.as("b"))
      .where(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted === want.sorted) // same pairs AND same multiplicity (exactly once)
    assert(got.distinct.size === got.size, "a pair was emitted more than once")
  }

  test("intervalOverlapJoin plans as an equi-join, not a nested loop") {
    val s = spark
    import s.implicits._
    val left = (1 to 50).map(i => (i.toLong, i.toLong * 3, i.toLong * 3 + 10)).toDF("lid", "ls", "le")
    val right = (1 to 50).map(i => (i.toLong, i.toLong * 2, i.toLong * 2 + 5)).toDF("rid", "rs", "re")
    val p = Joins.intervalOverlapJoin(left, right, 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the naive predicate, by contrast, IS a nested loop
    val naive = left.join(right, col("ls") <= col("re") && col("rs") <= col("le"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))
  }

  test("salted join shuffles on (key, salt)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_linenumber")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey").withColumnRenamed("s_suppkey", "l_suppkey")
      // big enough to avoid auto-broadcast? force shuffle join via hint
      .hint("shuffle_hash")
    val j = Joins.saltedJoin(li, sup, "l_suppkey", col("l_orderkey"), factor = 4)
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), s"salt column missing from plan:\n$plan")
  }
}
