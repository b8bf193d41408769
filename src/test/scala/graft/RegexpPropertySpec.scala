package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{RegexCache, RegExpExtractRefKernel}

/** Property tests for the regexp_extract_ref kernel (SURVEY.md §5 tier 1 —
  * no SparkSession needed; mirrors the reference's kernel-contract tests
  * with generated inputs). Runs under ScalaCheck's own sbt framework.
  */
object RegexpPropertySpec extends Properties("RegExpExtractRefKernel") {

  private def run(s: String, p: String, i: Int): String =
    RegExpExtractRefKernel.extract(
      UTF8String.fromString(s), UTF8String.fromString(p), i, new RegexCache).toString

  private val asciiStr: Gen[String] = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  property("(.*) group 1 is the identity on any single-line string") =
    forAll(asciiStr) { s => run(s, "(.*)", 1) == s }

  property("group 0 equals the whole match wherever a match exists") =
    forAll(asciiStr) { s =>
      run(s, "[a-z0-9A-Z]*", 0) == run(s, "([a-z0-9A-Z]*)", 1)
    }

  property("negative or out-of-range group index is always empty") =
    forAll(asciiStr, Gen.chooseNum(2, 99)) { (s, g) =>
      run(s, "(.*)", -g) == "" && run(s, "(.*)", g) == ""
    }

  property("invalid patterns never throw, always empty") =
    forAll(asciiStr) { s =>
      run(s, "[invalid", 1) == "" && run(s, "(unclosed", 1) == ""
    }

  property("Rust-rejected constructs are empty for any subject/context (reference src/regexp-extract.rs:106-109)") =
    forAll(asciiStr, asciiStr,
      Gen.oneOf("(a)\\1", "(?=x)", "(?!x)", "(?<=x)", "(?<!y)", "(?>a)",
        "a*+", "a++", "a?+", "\\k<g>", "\\Qq\\E", "x\\Z", "y\\G")) { (s, pre, bad) =>
      // the divergent construct anywhere in the pattern rejects the whole
      // pattern, exactly like a Rust compile error does
      run(s, pre.filter(_.isLetterOrDigit) + bad, 0) == "" &&
        run(s, bad, 1) == ""
    }

  property("guard never fires on plain alphanumeric capture patterns") =
    forAll(asciiStr.suchThat(_.nonEmpty)) { s =>
      run(s, "(" + s.take(8) + ")", 1) == s.take(8)
    }

  property("memo cache never changes results under alternating patterns") = {
    val cache = new RegexCache
    def runShared(s: String, p: String) = RegExpExtractRefKernel.extract(
      UTF8String.fromString(s), UTF8String.fromString(p), 1, cache).toString
    forAll(asciiStr, asciiStr) { (a, b) =>
      runShared(a, "([a-z]+)") == run(a, "([a-z]+)", 1) &&
        runShared(b, "([0-9]+)") == run(b, "([0-9]+)", 1)
    }
  }
}
