package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native little-endian fixed-width integer codec — the codegen upgrade
  * of the account decoders' per-byte string plumbing (guide §4: prefer
  * whole-stage-codegen-friendly expressions in the hot path).
  *
  * The S2 decode family previously built every integer field from
  * builtins alone: `try_cast(conv(hex(concat(substring(rec, off+n-1, 1),
  * …, substring(rec, off, 1))), 16, 10) AS bigint)` — per field, n
  * single-byte binary slices, a concat, a hex STRING, a base-16 string
  * parse and a decimal re-parse, ~3n+3 intermediate objects per row per
  * field; a 14-field record paid ~170 allocations/row before the first
  * aggregate. These expressions do the same arithmetic directly on the
  * record bytes inside whole-stage codegen: zero intermediate objects,
  * one bounds-checked loop.
  *
  * Semantics are the EXACT twins of the replaced expression trees
  * (ExpressionsSpec pins them against the old builtin forms on random
  * and edge inputs):
  *
  *  - `le_decode(bin, off, n)`: decode `n` little-endian bytes at
  *    1-based `off`. Null on null input. Bytes past the end of `bin`
  *    are absent (the old concat skipped empty slices), so a truncated
  *    record decodes its available low bytes; NO byte available (off
  *    past the end) is null (conv('') is null). An 8-byte value with
  *    the top bit set is null (try_cast of the unsigned decimal
  *    overflows a bigint — the layouts declare every u64 below 2^63).
  *    `off < 1` is null (the old form's negative-offset substring
  *    wraparound is not reproduced; every layout offset is ≥ 9).
  *  - `le_encode(v, n)`: encode `v`'s low `n` bytes little-endian.
  *    Null on null input. Values wider than the field wrap to their
  *    low bytes (u8/u32 record semantics — the old pmod-by-2^8n mask,
  *    which for a power-of-two modulus is exactly the bitwise mask,
  *    negative inputs included).
  *
  * `n` must be a foldable integer literal in [1, 8] — a field width is
  * part of a record LAYOUT, never data — enforced at analysis time.
  */
private[graft] trait LEWidth { self: Expression =>
  def nBytes: Expression

  protected def widthOrNeg: Int =
    if (nBytes.foldable) {
      nBytes.eval() match {
        case i: Int if i >= 1 && i <= 8 => i
        case _ => -1
      }
    } else -1

  protected def checkWidth(name: String): TypeCheckResult =
    if (widthOrNeg > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name: byte width must be a literal integer in [1, 8], got ${nBytes.sql}")
}

/** `le_decode(bin, off, n) → bigint` — see the file doc. */
final case class LEDecode(bin: Expression, off: Expression, nBytes: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with LEWidth {
  override def prettyName: String = "le_decode"
  override def first: Expression = bin
  override def second: Expression = off
  override def third: Expression = nBytes
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base else checkWidth(prettyName)
  }

  override def nullSafeEval(binV: Any, offV: Any, nV: Any): Any = {
    val b = binV.asInstanceOf[Array[Byte]]
    val o = offV.asInstanceOf[Long]
    val n = nV.asInstanceOf[Int]
    if (o < 1L || o > b.length) null
    else {
      val start = o.toInt - 1
      val avail = math.min(b.length - start, n)
      var v = 0L
      var i = 0
      while (i < avail) { v |= (b(start + i) & 0xffL) << (8 * i); i += 1 }
      if (avail == 8 && v < 0L) null else v
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, o, n) => {
      val start = ctx.freshName("start")
      val avail = ctx.freshName("avail")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      s"""
         |if ($o < 1L || $o > (long) $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $start = (int) $o - 1;
         |  final int $avail = java.lang.Math.min($b.length - $start, $n);
         |  long $v = 0L;
         |  for (int $i = 0; $i < $avail; $i++) {
         |    $v |= ($b[$start + $i] & 0xFFL) << (8 * $i);
         |  }
         |  if ($avail == 8 && $v < 0L) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $v; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(bin = newFirst, off = newSecond, nBytes = newThird)
}

/** `le_encode(v, n) → binary` — see the file doc. */
final case class LEEncode(value: Expression, nBytes: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with LEWidth {
  override def prettyName: String = "le_encode"
  override def left: Expression = value
  override def right: Expression = nBytes
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base else checkWidth(prettyName)
  }

  override def nullSafeEval(vV: Any, nV: Any): Any = {
    val v = vV.asInstanceOf[Long]
    val n = nV.asInstanceOf[Int]
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((v >>> (8 * i)) & 0xffL).toByte; i += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) (($v >>> (8 * $i)) & 0xFFL);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(value = newLeft, nBytes = newRight)
}
