package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels for fuzzy record linkage, matching DuckDB's
  * `jaro_winkler_similarity` / `damerau_levenshtein` semantics exactly so
  * the oracle compare is bit-for-bit:
  *
  *  - both operate on UTF-8 BYTES, not code points (DuckDB probe:
  *    jaro_winkler_similarity('éa','éb') = 0.8222… — the 2-byte é counts
  *    as a 2-byte common prefix; damerau_levenshtein('é','e') = 2);
  *  - Jaro-Winkler: prefix weight 0.1 over ≤ 4 common prefix bytes,
  *    applied only when the plain Jaro similarity exceeds the classic 0.7
  *    boost threshold (probe: 'abqqqq'/'abzzzz' — jaro 0.5556 stays
  *    unboosted); empty-vs-anything AND empty-vs-empty are 0.0;
  *  - Damerau-Levenshtein is the UNRESTRICTED distance (adjacent
  *    transposition + later edits on the transposed block,
  *    Lowrance-Wagner DP), not the restricted OSA variant (probe:
  *    'ca'→'abc' = 2 where OSA gives 3).
  *
  * The kernels are static (object) methods so generated code calls them
  * directly — per-row work stays inside whole-stage codegen like the
  * built-in `levenshtein`, which uses the same call-a-kernel shape.
  */
object StringSimKernels {

  /** Plain Jaro similarity over byte arrays. */
  def jaro(s: Array[Byte], t: Array[Byte]): Double = {
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(math.max(ls, lt) / 2 - 1, 0)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // transpositions = FLOOR(raw out-of-order count / 2): the raw count can
    // be odd (a 3-cycle like '021' vs '102'), and DuckDB/rapidfuzz (and
    // Apache Commons) use integer division here — /2.0 diverges on exactly
    // those pairs (found via oracle mismatch on 'Customer#000000021' vs
    // 'Customer#000001021': 0.960131 ≠ DuckDB's 0.966013).
    val md = m.toDouble
    (md / ls + md / lt + (md - (trans / 2)) / md) / 3.0
  }

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val j = jaro(s, t)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(s.length, t.length))
    while (l < max && s(l) == t(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner DP with a
    * 256-entry last-seen-byte table). O(|s|·|t|) time and space — entity
    * keys are short; long-document similarity belongs to the minhash /
    * simhash machinery, not edit distance.
    */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes
    val t = b.getBytes
    val m = s.length
    val n = t.length
    if (m == 0) return n.toLong
    if (n == 0) return m.toLong
    val inf = m + n
    val da = new Array[Int](256)
    // d is (m+2) x (n+2), with d(0)(0)=inf borders and d(1)(1)=0 origin
    val d = Array.ofDim[Int](m + 2, n + 2)
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    d(0)(0) = inf
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k = da(t(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trn = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trn))
        j += 1
      }
      da(s(i - 1) & 0xff) = i
      i += 1
    }
    d(m + 1)(n + 1).toLong
  }
}

/** `graft_jaro_winkler(a, b)`: DuckDB-parity Jaro-Winkler similarity. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_damerau(a, b)`: DuckDB-parity unrestricted Damerau-Levenshtein. */
case class DamerauLevenshteinDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_damerau"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimKernels.damerauLevenshtein($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
