package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels for text canonicalization — the step a
  * multilingual dedup key needs before hashing (the same document arrives
  * composed from one crawler and decomposed from another, and byte-level
  * md5 treats them as different texts). Spark ships no NFC/accent-strip
  * function, so these are codegen'd expressions over the standard
  * `java.text.Normalizer`:
  *
  *  - graft_nfc: Unicode NFC (canonical decomposition + composition) —
  *    byte-identical to DuckDB's `nfc_normalize` (both implement UAX #15;
  *    probed across composed/decomposed/compatibility cases).
  *  - graft_strip_accents: NFD then drop NON_SPACING_MARK (Mn) code
  *    points — the documented utf8proc algorithm behind DuckDB's
  *    `strip_accents` (probed: é→e, ĄĆĘ→ACE but Ł keeps its stroke — Ł's
  *    bar is part of the letter, not a combining mark; ø/Æ/ß unchanged).
  *
  * Static kernels called from generated code, like StringSimKernels —
  * per-row work stays inside whole-stage codegen.
  */
object UnicodeNormKernels {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-is-identity for ASCII (and most already-composed text)
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormKernels.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNormKernels.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StripAccents(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(s: Any): Any =
    UnicodeNormKernels.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.UnicodeNormKernels.stripAccents($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
