package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RegexCache, RegExpExtractRefKernel}

/** Kernel-tier tests: call the row kernel directly with no SparkSession,
  * mirroring the reference's 6 unit tests (reference: src/regexp-extract.rs:117-229,
  * EP3 in SURVEY.md §3).
  */
class RegexpKernelSpec extends AnyFunSuite {

  private def ex(s: String, p: String, idx: Int): String = {
    val r = RegExpExtractRefKernel.extract(
      UTF8String.fromString(s), UTF8String.fromString(p), idx, new RegexCache)
    r.toString
  }

  test("basic group 1 (reference :121-138)") {
    assert(ex("100-200", "(\\d+)-(\\d+)", 1) == "100")
    assert(ex("300-400", "(\\d+)-(\\d+)", 1) == "300")
    assert(ex("500-600", "(\\d+)-(\\d+)", 1) == "500")
  }

  test("group 2 (reference :140-157)") {
    assert(ex("100-200", "(\\d+)-(\\d+)", 2) == "200")
    assert(ex("123-456", "(\\d+)-(\\d+)", 2) == "456")
  }

  test("no match -> empty string (reference :159-175)") {
    assert(ex("abc", "(\\d+)", 1) == "")
    assert(ex("def", "(\\d+)", 1) == "")
  }

  test("invalid group index -> empty string (reference :177-192)") {
    assert(ex("100-200", "(\\d+)-(\\d+)", 3) == "")
    assert(ex("123", "(\\d+)", 2) == "")
  }

  test("negative group index -> empty string (reference src/regexp-extract.rs:94)") {
    assert(ex("100-200", "(\\d+)-(\\d+)", -1) == "")
  }

  test("group 0 = whole match (reference src/regexp-extract.rs:101)") {
    assert(ex("x100-200y", "(\\d+)-(\\d+)", 0) == "100-200")
  }

  test("invalid regex -> empty string (reference :213-228)") {
    assert(ex("test", "[invalid", 1) == "")
    assert(ex("100-200", "[invalid", 0) == "")
  }

  test("non-participating group -> empty string (SURVEY.md §2.2)") {
    assert(ex("a", "(a)|(b)", 2) == "")
  }

  test("empty input (reference tests/regexp-tests.rs:37)") {
    assert(ex("", "(.*)", 1) == "")
  }

  test("special chars (reference tests/regexp-tests.rs:44)") {
    assert(ex("foo$bar", "(\\w+)\\$(\\w+)", 2) == "bar")
    assert(ex("test$value", "(\\d+)-(\\d+)", 1) == "")
  }

  test("pattern memoization keeps per-row patterns correct") {
    val cache = new RegexCache
    def exc(s: String, p: String, i: Int) = RegExpExtractRefKernel
      .extract(UTF8String.fromString(s), UTF8String.fromString(p), i, cache).toString
    assert(exc("100-200", "(\\d+)", 1) == "100")
    assert(exc("100-200", "(\\d+)-(\\d+)", 2) == "200") // pattern switch
    assert(exc("300-400", "(\\d+)-(\\d+)", 2) == "400") // memo hit
    assert(exc("x", "[bad", 1) == "")                   // invalid after valid
    assert(exc("y", "[bad", 1) == "")                   // memoized invalid
    assert(exc("500-600", "(\\d+)", 1) == "500")        // valid after invalid
  }
}
