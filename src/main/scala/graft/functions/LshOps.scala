package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded hyperplane-LSH sign keys as a LOOP-codegen expression — the
  * [[PqOps]] pattern applied to the second family the fleet-wide
  * BytecodeAudit flagged once it learned to descend into cachedPlans:
  * the unrolled bands x planesPerBand x Dim sign projection behind
  * `dedup_embedding_cosine` generated 17,968 B (fixture 16x4 geometry)
  * and 28,170 B (sized 16x8) of bytecode in one method — past HotSpot's
  * 8000-byte JIT window, so those stages ran on the
  * `hugeMethodLimit` Volcano fallback from the day they were written
  * (hidden behind the banded relation's .persist()). The same
  * arithmetic as three nested loops is ~1 KB: whole-stage codegen'd AND
  * JIT-compiled.
  *
  * Bit-parity contract with the unrolled form (and the DuckDB oracle's
  * `sizedKeySql`/`pairBandKeySql`): bit j of band b = sign
  * (dot(e, plane[b*pb + j]) >= 0.0) with the dot a left-to-right double
  * fold over the Dim dims — the identical association order `graft_dot`
  * and DuckDB's `list_sum(list_transform(...))` use. Keys assemble as
  * `|= (1L << j)`, equal to the old sum of disjoint `1L << j` terms.
  *
  * The seeded plane matrix lives HERE (seed 7, 6-dp-rounded gaussians,
  * one Random stream per (bands, planesPerBand) geometry — the format
  * `Similarity.planes` documents); `Similarity.pairPlanesFor` aliases
  * this method so the oracle SQL literals and the kernel constants can
  * never diverge. The expression carries only (bands, planesPerBand) —
  * planes are derived, keeping case-class equality (and codegen
  * subexpression elimination) trivially correct.
  *
  * Null contract — ONE deliberate divergence from the unrolled form: a
  * NULL or non-Dim-length vector yields NULL (the row drops out of the
  * posexplode, excluding the vector from candidate generation). The
  * unrolled form mapped such vectors to all-zero keys (`graft_dot`
  * returns NULL on length mismatch, and `when(NULL >= 0, ..)` takes the
  * 0 branch) — silently steering every malformed vector into the SAME
  * bucket, a mega-bucket hazard at corpus scale. No fixture or oracle
  * row exercises malformed vectors, so results are unchanged where
  * defined (DedupSpec pins kernel == unrolled on valid inputs).
  */
object LshOps {
  val Dim = 64

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** Deterministic banded planes for a (bands, planesPerBand) geometry:
    * seed 7, 6-dp-rounded, one stream per geometry.
    */
  def planes(bands: Int, planesPerBand: Int): Array[Array[Double]] =
    cache.computeIfAbsent((bands, planesPerBand), { _ =>
      val r = new scala.util.Random(7)
      Array.fill(bands * planesPerBand, Dim)(math.rint(r.nextGaussian() * 1e6) / 1e6)
    })

  /** Input usable iff exactly Dim elements (mirrors graft_dot's
    * length-equality contract; element reads use getDouble like the
    * unrolled form did). Static forwarder for generated Java.
    */
  def usable(x: ArrayData): Boolean = x.numElements() == Dim

  /** The `bands` sign keys of a Dim-vector: bit j of band b = sign of
    * the left-to-right dot with plane b*pb+j.
    */
  def bandKeys(x: ArrayData, bands: Int, pb: Int): Array[Long] = {
    val ps = planes(bands, pb)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < pb) {
        val p = ps(b * pb + j)
        var s = 0.0
        var k = 0
        while (k < Dim) { s += x.getDouble(k) * p(k); k += 1 }
        if (s >= 0.0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    out
  }
}

/** `graft_lsh_band_keys(e)` for a fixed (bands, planesPerBand) geometry:
  * array of the `bands` sign keys, NULL on NULL/non-64-dim input.
  */
case class LshBandKeys(child: Expression, bands: Int, planesPerBand: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 62,
    s"invalid LSH geometry ($bands, $planesPerBand)")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_band_keys"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (!LshOps.usable(x)) null
    else new GenericArrayData(LshOps.bandKeys(x, bands, planesPerBand))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |if (!graft.functions.LshOps.usable($a)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    graft.functions.LshOps.bandKeys($a, $bands, $planesPerBand));
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
