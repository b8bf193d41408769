package graft.functions

import java.util.regex.{Matcher, Pattern, PatternSyntaxException}

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mutable last-pattern memo. One instance per expression instance (interpreted
  * path) or per generated-code object (codegen path); never shared across
  * threads, so no synchronization. The reference compiles the regex per row
  * (reference: src/regexp-extract.rs:97); memoizing the last pattern preserves
  * per-row-pattern semantics while making the constant-pattern case fast.
  */
final class RegexCache {
  var lastPattern: String = null
  var compiled: Pattern = null // null => lastPattern failed to compile
}

/** Row kernel for regexp_extract_ref. Static (object) so generated Java code
  * can call it via the static forwarder.
  *
  * Semantics (the reference parity contract, SURVEY.md §2.2; derived from
  * reference readme.md:60-76 + src/regexp-extract.rs:85-111):
  *   - no match                         -> ""
  *   - group idx > group count          -> ""   (Spark built-in throws)
  *   - negative group idx               -> ""   (Spark built-in throws)
  *   - group idx 0                      -> whole match
  *   - matched but non-participating    -> ""
  *   - invalid regex pattern            -> ""   (Spark built-in throws)
  *   - any NULL input                   -> NULL (handled by TernaryExpression)
  */
object RegExpExtractRefKernel {

  /** Rust `regex`-crate dialect guard. The reference compiles patterns with
    * regex 1.10 (reference: cargo.toml:10), which REJECTS constructs Java's
    * `Pattern` happily compiles; a compile failure there returns ""
    * (reference: src/regexp-extract.rs:106-109). Without this guard, a
    * pattern like `(a)\1` silently *matches* here instead of returning "".
    *
    * Rejected (scanned outside character classes only — inside a class the
    * divergent escapes are compile errors in Java too, which already maps
    * to "" via the compile catch):
    *   - backreferences `\1`..`\9`, named `\k<name>`, octal `\0`
    *   - lookaround `(?=` `(?!` `(?<=` `(?<!` and atomic groups `(?>`
    *   - possessive quantifiers `*+` `++` `?+` `{n}+` `{n,m}+` (double
    *     repetition is a Rust parse error; Java makes it possessive)
    *   - Java-only escapes `\G \Z \Q \E \R \X \h \H \V`
    * `(?<name>...)` named groups are valid in BOTH dialects and pass.
    * Known remaining divergence (documented, unguarded): inline flags with
    * different meanings, e.g. `(?U)` is Java's unicode-classes flag but
    * Rust's swap-greediness flag — both compile, semantics differ.
    */
  /** Does `pat(from)` start a syntactically valid bounded quantifier
    * `{m}` / `{m,}` / `{m,n}`? Returns the index just past '}' or -1.
    */
  private def boundedQuantEnd(pat: String, from: Int): Int = {
    val n = pat.length
    var j = from + 1
    val d0 = j
    while (j < n && pat.charAt(j).isDigit) j += 1
    if (j == d0) return -1 // no digits after '{'
    if (j < n && pat.charAt(j) == ',') {
      j += 1
      while (j < n && pat.charAt(j).isDigit) j += 1
    }
    if (j < n && pat.charAt(j) == '}') j + 1 else -1
  }

  def rustRejects(pat: String): Boolean = {
    val javaOnlyEscapes = "kGZQERXhHV"
    val n = pat.length
    var i = 0
    var depth = 0 // character-class nesting level

    while (i < n) {
      val c = pat.charAt(i)
      if (c == '\\') {
        if (i + 1 < n) {
          val e = pat.charAt(i + 1)
          if (depth == 0 && (e.isDigit || javaOnlyEscapes.indexOf(e.toInt) >= 0))
            return true
          i += 1 // consume the escaped char so `\[` / `\*` stay literal
        }
      } else if (c == '[') depth += 1
      else if (c == ']') { if (depth > 0) depth -= 1 }
      else if (depth == 0 && c == '(' && i + 2 < n && pat.charAt(i + 1) == '?') {
        val g = pat.charAt(i + 2)
        if (g == '=' || g == '!' || g == '>') return true
        if (g == '<' && i + 3 < n) {
          val h = pat.charAt(i + 3)
          if (h == '=' || h == '!') return true
        }
      } else if (depth == 0 && (c == '*' || c == '+' || c == '?') &&
                 i + 1 < n && pat.charAt(i + 1) == '+') {
        // quantifier followed by '+': Java possessive, Rust parse error.
        // (A dangling first quantifier is an error in both engines, so
        // flagging without checking for a preceding atom never diverges.)
        return true
      } else if (depth == 0 && c == '{') {
        // `{m}`/`{m,n}` followed by '+' is the possessive form too; a
        // literal non-quantifier `{` is handled by toJavaDialect (Rust
        // treats it as a literal, Java throws) and must not be flagged
        val end = boundedQuantEnd(pat, i)
        if (end >= 0) {
          if (end < n && pat.charAt(end) == '+') return true
          i = end - 1 // resume right after '}'
        }
      }
      i += 1
    }
    false
  }

  /** Rewrite Rust-dialect spellings that Java either rejects or interprets
    * DIFFERENTLY into their Java equivalent, so the kernel follows the
    * reference's regex-crate semantics (reference: cargo.toml:10):
    *   - `(?P<name>...)` — valid Rust named group, Java syntax error.
    *     Java spells it `(?<name>...)` (Rust accepts both).
    *   - `\v` — vertical TAB literal in Rust; Java treats `\v` as the
    *     vertical-whitespace CLASS (matches \n too). `\x0B` is the literal
    *     in both.
    *   - a `{` that does not start a valid bounded quantifier — a literal
    *     in Rust, but Java throws "Illegal repetition". Escaped to `\{`.
    */
  def toJavaDialect(pat: String): String = {
    val sb = new java.lang.StringBuilder(pat.length)
    val n = pat.length
    var i = 0
    var depth = 0 // character-class nesting ('{' is a literal in a class for both)
    while (i < n) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < n) {
        if (pat.charAt(i + 1) == 'v') sb.append("\\x0B")
        else { sb.append(c); sb.append(pat.charAt(i + 1)) }
        i += 2
      } else if (c == '(' && depth == 0 && i + 3 < n && pat.charAt(i + 1) == '?' &&
                 pat.charAt(i + 2) == 'P' && pat.charAt(i + 3) == '<') {
        sb.append("(?<")
        i += 4
      } else if (c == '{' && depth == 0 && boundedQuantEnd(pat, i) < 0) {
        sb.append("\\{")
        i += 1
      } else {
        if (c == '[') depth += 1
        else if (c == ']' && depth > 0) depth -= 1
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  def extract(s: UTF8String, p: UTF8String, idx: Int, cache: RegexCache): UTF8String = {
    val pat = p.toString
    if (cache.lastPattern == null || cache.lastPattern != pat) {
      cache.lastPattern = pat
      cache.compiled =
        if (rustRejects(pat)) null
        else
          try Pattern.compile(toJavaDialect(pat))
          catch { case _: PatternSyntaxException => null }
    }
    if (cache.compiled == null) return UTF8String.EMPTY_UTF8
    val m: Matcher = cache.compiled.matcher(s.toString)
    if (!m.find() || idx < 0 || idx > m.groupCount()) return UTF8String.EMPTY_UTF8
    val g = m.group(idx)
    if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
  }
}

/** `regexp_extract_ref(str, pattern, idx)` — the reference's one operator as a
  * native Catalyst expression with whole-stage-codegen support.
  *
  * Registered under a distinct name: Spark silently prefers built-ins in SQL,
  * and the built-in `regexp_extract` throws where the reference returns ""
  * (SURVEY.md §7.4).
  *
  * Deterministic (reference declares Volatility; the function is pure), so
  * Catalyst may constant-fold literal calls and push projections freely.
  */
case class RegExpExtractRef(subject: Expression, regexp: Expression, idx: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = idx

  // Seq is covariant, so Seq[DataType] satisfies Seq[AbstractDataType]
  // (AbstractDataType itself is private[sql] in Spark 4).
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_extract_ref"

  @transient private lazy val cache = new RegexCache

  override protected def nullSafeEval(s: Any, p: Any, i: Any): Any =
    RegExpExtractRefKernel.extract(
      s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String], i.asInstanceOf[Int], cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheClass = classOf[RegexCache].getName
    val cacheRef = ctx.addMutableState(cacheClass, "graftRegexCache",
      v => s"$v = new $cacheClass();")
    val kernel = "graft.functions.RegExpExtractRefKernel"
    nullSafeCodeGen(ctx, ev, (s, p, i) =>
      s"${ev.value} = $kernel.extract($s, $p, $i, $cacheRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, idx = newThird)
}

object RegExpExtractRef {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RegExpExtractRef].getName, "regexp_extract_ref")
}
