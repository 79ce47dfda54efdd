package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native `md5_prefix(x, hexChars)`: the first `hexChars` hex digits of
  * md5(x) as a non-negative bigint — the engine-portable uniform hash
  * behind the KMV sketches (48-bit), MinHash base hash and row-bucket
  * splits (32-bit). Value-identical to the composed form
  * `conv(substring(md5(x), 1, n), 16, 10) :: bigint` and to DuckDB's
  * `('0x' || substr(md5(x),1,n))::BIGINT`, so every oracle stays
  * bit-exact.
  *
  * Why a custom Expression (preference order (b)): the composed form
  * allocates a 32-char hex string, a substring, and a radix-parse per
  * row — on a hot tokenized path (explode → hash → aggregate) that is
  * three garbage allocations per WORD. This node digests the raw bytes
  * into a long with a thread-local reused MessageDigest, inside
  * whole-stage codegen. */
case class Md5Prefix(child: Expression, hexChars: Int)
    extends UnaryExpression {

  require(hexChars > 0 && hexChars <= 14 && hexChars % 2 == 0,
    s"md5_prefix supports 2..14 even hex chars (fits a positive long), " +
      s"got $hexChars")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix expects string or binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      Md5Prefix.hash(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes,
        hexChars)
    case _ => Md5Prefix.hash(v.asInstanceOf[Array[Byte]], hexChars)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"graft.functions.Md5Prefix.hash($bytes, $hexChars)"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix = copy(child = newChild)
}

object Md5Prefix {

  private val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First `hexChars`/2 digest bytes big-endian as a long — exactly the
    * numeric value of the md5 hex prefix. Static so generated code
    * calls it directly; the digest instance is reused per thread (a
    * fresh MessageDigest per row is most of the composed form's cost
    * after the string allocations). */
  def hash(bytes: Array[Byte], hexChars: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val n = hexChars / 2
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** Column-API surface. */
  def md5_prefix(c: Column, hexChars: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5Prefix(ColumnBridge.expression(c), hexChars))
  }

  /** SQL builder: `md5_prefix(x, n)` with a literal int n. */
  def sqlBuilder: Seq[Expression] => Expression = exprs => {
    require(exprs.size == 2, "md5_prefix(x, hexChars) takes 2 arguments")
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, t)
          if t == IntegerType || t == LongType || t == ShortType ||
            t == ByteType =>
        v.asInstanceOf[Number].intValue()
      case other => throw new IllegalArgumentException(
        s"md5_prefix hexChars must be an integer literal, got $other")
    }
    Md5Prefix(exprs.head, n)
  }
}
