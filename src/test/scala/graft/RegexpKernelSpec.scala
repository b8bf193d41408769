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

  test("Rust-dialect guard: backrefs/lookaround compile-fail -> \"\" (reference cargo.toml:10, src/regexp-extract.rs:106-109)") {
    // Java's Pattern compiles AND matches every one of these; the reference's
    // regex crate rejects them at compile time, which maps to "".
    assert(ex("aa", "(a)\\1", 1) == "")          // backreference
    assert(ex("aa", "(?<g>a)\\k<g>", 1) == "")   // named backreference
    assert(ex("abc", "a(?=b)", 0) == "")         // lookahead
    assert(ex("abc", "a(?!z)", 0) == "")         // negative lookahead
    assert(ex("abc", "(?<=a)b", 0) == "")        // lookbehind
    assert(ex("abc", "(?<!y)b", 0) == "")        // negative lookbehind
    assert(ex("abc", "(?>ab)c", 0) == "")        // atomic group
    assert(ex("aaa", "a*+", 0) == "")            // possessive quantifiers
    assert(ex("aaa", "a++", 0) == "")
    assert(ex("aaa", "a?+", 0) == "")
    assert(ex("aaa", "a{2}+", 0) == "")          // possessive bounded quantifier
    assert(ex("aaa", "a{1,2}+", 0) == "")
    assert(ex("aaa", "a{1,}+", 0) == "")
    assert(ex("a(b", "\\Qa(b\\E", 0) == "")      // \Q..\E quoting
    assert(ex("a\nb", "a\\Rb", 0) == "")         // \R linebreak
    assert(ex("ab", "a\\Z", 0) == "")            // \Z anchor (Rust has only \z)
  }

  test("Rust-dialect guard: shared constructs still pass") {
    assert(ex("ab", "(?<name>a)b", 1) == "a")    // named group: both dialects
    assert(ex("ab", "(?:a)(b)", 1) == "b")       // non-capturing group
    assert(ex("a+b", "a\\+(b)", 1) == "b")       // escaped '+' stays literal
    assert(ex("**x", "\\*+(x)", 1) == "x")       // escaped-star repetition
    assert(ex("a1", "[\\w]([0-9])", 1) == "1")   // class escapes unaffected
    assert(ex("end", "en\\w$", 0) == "end")      // $ anchor: both dialects
    assert(ex("aab", "a*?ab", 0) == "aab")       // lazy quantifiers: both
    assert(ex("xy", "x.?", 0) == "xy")           // '?' alone is fine
    assert(ex("aaa", "a{2}", 0) == "aa")         // plain bounded quantifier
    assert(ex("a{2}", "a\\{2}", 0) == "a{2}")    // escaped '{' stays literal
    assert(ex("x{y", "x{y?", 0) == "x{y")        // non-quantifier '{' is literal in both
  }

  test("Rust-dialect spellings are followed, not rejected (reference regex-crate semantics)") {
    // (?P<name>...) — Rust named group, Java alone would throw -> "" wrongly
    assert(ex("ab", "(?P<g>a)b", 1) == "a")
    // \v — Rust: literal VT only; Java alone would treat it as the
    // vertical-whitespace CLASS and match \n
    assert(ex("a\u000bb", "a\\vb", 0) == "a\u000bb")
    assert(ex("a\nb", "a\\vb", 0) == "")
    assert(ex("x\u000b", "[\\v]", 0) == "\u000b")
    assert(ex("\n", "[\\v]", 0) == "")
    // '(?P<' inside a character class is just the literal chars ( ? P < —
    // the named-group rewrite must not fire there
    assert(ex("P", "[(?P<]", 0) == "P")
  }

  test("Rust-dialect guard: rejection is memo-stable") {
    val cache = new RegexCache
    def exc(s: String, p: String) = RegExpExtractRefKernel
      .extract(UTF8String.fromString(s), UTF8String.fromString(p), 0, cache).toString
    assert(exc("aa", "(a)\\1") == "")
    assert(exc("bb", "(a)\\1") == "")   // memoized rejection
    assert(exc("ab", "ab") == "ab")     // valid after rejected
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
