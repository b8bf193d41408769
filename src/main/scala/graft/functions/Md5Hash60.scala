package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static kernel for [[Md5Hash60]] — generated code calls it via the
  * static forwarder. One MessageDigest per thread, reused across rows: the
  * composed `conv(substring(md5(x), 1, 15), 16, 10)` pipeline this replaces
  * pays, per row, a digest PLUS a 32-char hex UTF8String materialization, a
  * substring copy, and NumberConverter's per-character base-16 parse loop —
  * measured ~0.55 s per 1.45M rows at sf0.1, pure overhead since the first
  * 15 hex chars ARE the first 60 bits of the digest.
  */
object Md5Hash60 {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` (15 hex chars = 60 bits =
    * the top 64 bits of the digest shifted right by the dropped nibble).
    */
  def h60(bytes: Array[Byte]): Long = {
    val dig = md.get().digest(bytes)
    (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
      ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
      ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
      ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
  }
}

/** 60-bit md5 prefix as LONG — the engine-wide [[graft.operators.TextHash]]
  * hash primitive as ONE codegen'd expression. Value contract (and the
  * DuckDB oracle mirror) is unchanged from the composed form:
  * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`. NULL → NULL; string
  * inputs arrive as their UTF-8 bytes via the same implicit BinaryType
  * cast the built-in `md5` uses.
  */
case class Md5Hash60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  protected override def nullSafeEval(input: Any): Any =
    Md5Hash60.h60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash60.h60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
