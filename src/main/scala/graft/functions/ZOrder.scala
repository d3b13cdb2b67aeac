package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two bucketed dimensions — the layout
  * key behind multi-dimensional data skipping (the technique Delta/Iceberg
  * expose as `OPTIMIZE ZORDER BY`): sorting a table by the interleaved
  * key clusters rows so that EVERY per-file min/max range on BOTH
  * dimensions is tight, which turns two-sided range predicates into file
  * pruning at the scan. At 100 TB the sort is one range exchange
  * (repartitionByRange on the key) and the payoff is permanent: each of
  * the resulting files covers a small rectangle of the (x, y) domain
  * instead of a full-width stripe, so a `WHERE x BETWEEN … AND y
  * BETWEEN …` scan reads O(matching cells) files, not the whole table.
  *
  * Bit-spreading is the classic magic-mask ladder (public domain —
  * "Interleave bits by Binary Magic Numbers", Sean Eron Anderson's Bit
  * Twiddling Hacks), expressible verbatim in ANSI SQL for the DuckDB
  * oracle: each dimension is masked to `bits` ≤ 16 low bits, so the
  * interleaved key fits in 32 bits and every shift stays far from the
  * int64 sign bit in both engines.
  */
object ZOrder2 {
  /** spread the low 16 bits of v to even bit positions (0,2,4,…,30). */
  @inline def spread16(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** interleave the low `bits` of x (even positions) and y (odd). */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    spread16(x & mask) | (spread16(y & mask) << 1)
  }

  /** the same spread ladder as ANSI SQL over an integer expression —
    * keeps the oracle a mechanical transliteration, not a re-derivation. */
  def spreadSql(e: String, bits: Int): String = {
    val m = (1L << bits) - 1L
    val s0 = s"(($e) & $m)"
    val s1 = s"((($s0 | ($s0 << 8)) & 16711935))"   // 0x00FF00FF
    val s2 = s"((($s1 | ($s1 << 4)) & 252645135))"  // 0x0F0F0F0F
    val s3 = s"((($s2 | ($s2 << 2)) & 858993459))"  // 0x33333333
    s"((($s3 | ($s3 << 1)) & 1431655765))"          // 0x55555555
  }

  /** zorder2(x, y, bits) as oracle SQL. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    s"(${spreadSql(x, bits)} | (${spreadSql(y, bits)} << 1))"
}

case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits > 0 && bits <= 16, s"bits must be in 1..16, got $bits")

  // declare LONG inputs so the analyzer inserts casts for int/short
  // arguments: without this the interpreted path's asInstanceOf[Long]
  // throws on a java.lang.Integer while codegen silently widens —
  // inconsistent eval modes for the same expression
  // (return type inferred — AbstractDataType is private[sql] in Spark 4)
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrder2.interleave($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
