package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the portable 60-bit hash (graft.ops.Portable):
  *
  *   conv(substring(md5(s), 1, 15), 16, 10) :: long
  *
  * The composed expression allocates a hex string and parses it through
  * BigInteger per call; the dedup/fingerprint queries evaluate it
  * millions of times. This computes the identical value directly: the
  * first 15 hex digits of an MD5 are the digest's top 60 bits, i.e.
  * (big-endian long of bytes 0..7) >>> 4. Thread-local MessageDigest,
  * no intermediate strings.
  */
object Portable60 {
  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** first 60 bits of md5(utf8 bytes), as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

case class Portable60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "p60"

  override def nullSafeEval(input: Any): Any =
    Portable60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Portable60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
