package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Engine-tier tests through the DataFrame and SQL APIs, mirroring the
  * reference's integration suite (reference: tests/regexp-tests.rs:5-221).
  */
class RegexpIntegrationSpec extends SparkSpecBase {

  // Edge-case table from reference tests/regexp-tests.rs:35-46, verbatim.
  private val edgeCases = Seq(
    ("", "(.*)", 1, ""),
    ("abc", "\\d+", 1, ""),
    ("123", "(\\d+)", 2, ""),
    ("123-456", "(\\d+)-(\\d+)", 2, "456"),
    ("foo$bar", "(\\w+)\\$(\\w+)", 2, "bar"))

  test("edge-case table through SQL (reference :29-67)") {
    edgeCases.foreach { case (input, pattern, group, expected) =>
      val df = spark.sql(
        s"SELECT regexp_extract_ref('${input.replace("$", "$")}', '${pattern.replace("\\", "\\\\")}', $group) AS extracted")
      assert(df.collect()(0).getString(0) == expected,
        s"input=$input pattern=$pattern group=$group")
    }
  }

  test("DataFrame API with CSV scan (reference :5-27, EP1)") {
    val path = getClass.getResource("/test-data.csv").getPath
    val df = spark.read.option("header", "true").csv(path)
      .na.fill("", Seq("text", "expected"))
      .select(col("expected"),
        Graft.regexp_extract_ref(col("text"), lit("(\\d+)-(\\d+)"), lit(1)).as("got"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(0), s"row: $r")
    }
  }

  test("null handling via CASE/CAST/derived table SQL (reference :69-102)") {
    val rows = spark.sql(
      """SELECT id, regexp_extract_ref(
        |  CASE WHEN id % 2 = 0 THEN CAST(id AS STRING) ELSE NULL END,
        |  '(\\d+)', 1) AS extracted
        |FROM VALUES (1),(2),(3),(4) AS t(id) ORDER BY id""".stripMargin).collect()
    assert(rows.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ==
      Seq(null, "2", null, "4"))
  }

  test("error cases through SQL return '' not exceptions (reference :193-221)") {
    val r1 = spark.sql("SELECT regexp_extract_ref('test', '[invalid', 1) AS x").collect()
    assert(r1(0).getString(0) == "")
    val r2 = spark.sql("SELECT regexp_extract_ref('123-456', '(\\\\d+)-(\\\\d+)', 5) AS x").collect()
    assert(r2(0).getString(0) == "")
  }

  test("10k-row throughput smoke (reference :104-147)") {
    val t0 = System.nanoTime()
    val n = spark.range(10000)
      .select(Graft.regexp_extract_ref(
        concat(lit("val-"), col("id").cast("string"), lit("-end")),
        lit("-(\\d+)-"), lit(1)).as("x"))
      .where(col("x") =!= "").count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10k rows in $secs%.3f s (${10000 / secs}%.0f rows/s)")
    assert(n == 10000L)
  }

  test("concurrent queries on one session (reference :149-191)") {
    val pool = Executors.newFixedThreadPool(5)
    val futures = (0 until 5).map { i =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          Thread.sleep(i * 50L)
          spark.sql("SELECT regexp_extract_ref('abc-123-def', '-(\\\\d+)-', 1) AS x")
            .collect()(0).getString(0)
        }
      })
    }
    futures.foreach(f => assert(f.get(60, TimeUnit.SECONDS) == "123"))
    pool.shutdown()
  }

  test("per-row (non-literal) pattern and index columns (SURVEY.md §2.2 last rows)") {
    val df = spark.createDataFrame(Seq(
      ("100-200", "(\\d+)-(\\d+)", 1),
      ("100-200", "(\\d+)-(\\d+)", 2),
      ("100-200", "(\\d+)", 1),
      ("100-200", "[bad", 1))).toDF("s", "p", "i")
      .select(Graft.regexp_extract_ref(col("s"), col("p"), col("i")).as("x"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("100", "200", "100", ""))
  }

  test("null propagation in each argument position (reference :194-211)") {
    val rows = spark.sql(
      """SELECT
        | regexp_extract_ref(NULL, '(a)', 1) AS a,
        | regexp_extract_ref('x', NULL, 1) AS b,
        | regexp_extract_ref('x', '(x)', NULL) AS c""".stripMargin).collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
  }
}
