package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for integration specs (one per suite class —
  * getOrCreate reuses the single JVM-wide session across suites).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.sessionLock.synchronized {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Graft.init(s)
  }
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpecBase {
  /** Suites run in parallel threads inside one forked JVM; any test that
    * clears/replaces the JVM-wide default session (e.g. to build one with
    * different SparkSessionExtensions) must hold this lock so a concurrent
    * suite's lazy `getOrCreate` cannot observe the cleared state and mint
    * an unexpected second session.
    */
  val sessionLock = new Object
}
