package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Fixed-width float-vector ⇄ binary codec — the encoding that lets a
  * RELATIONAL primary store hold the embeddings table: `list<float>` has
  * no stock JDBC type mapping in any dialect, but every store has a
  * BLOB, so [[graft.JdbcLoad]] writes `float_vec_to_binary(embedding)`
  * and [[graft.Tables]] transparently decodes a BinaryType embedding
  * column on read. Same byte-level codec discipline as the reference's
  * bigint↔bytes32 field-element encoding (packages/hive-sdk/src/
  * swarmteams/client.ts:65-81): fixed width, explicit endianness,
  * loud-by-null on malformed input.
  *
  * Layout: 4 bytes per element, IEEE-754 single, LITTLE-endian,
  * `floatToRawIntBits` (raw, not canonicalizing: a non-canonical NaN
  * round-trips bit-identically — the codec must never change stored
  * bytes). Malformed input folds to null rather than throwing, the
  * engine's malformed-vector posture ([[DotLong]] nulls ragged pairs):
  * a null ELEMENT on encode (the fixed-width layout has no slot for it)
  * and a length not divisible by 4 on decode. Both directions are
  * native expressions with `doGenCode` — one static call inside the
  * surrounding whole-stage-codegen span, no UDF boundary — and are
  * registered as SQL functions by [[graft.GraftExtensions]].
  */
object FloatVecCodec {
  /** Encode helper shared by eval and generated code; null ⇒ the input
    * held a null element (no fixed-width representation). */
  def encodeOrNull(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val bits = java.lang.Float.floatToRawIntBits(a.getFloat(i))
      val o = i * 4
      out(o) = bits.toByte
      out(o + 1) = (bits >>> 8).toByte
      out(o + 2) = (bits >>> 16).toByte
      out(o + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  /** Decode helper shared by eval and generated code; null ⇒ the byte
    * length is not a multiple of 4 (not this codec's output). */
  def decodeOrNull(b: Array[Byte]): ArrayData = {
    if (b.length % 4 != 0) return null
    val n = b.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val o = i * 4
      val bits = (b(o) & 0xff) |
        ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) |
        ((b(o + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `float_vec_to_binary(array<float>) → binary` — see [[FloatVecCodec]]. */
final case class FloatsToBinary(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  override def prettyName: String = "float_vec_to_binary"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  // always nullable: the null-element fold exists even over non-null input
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FloatVecCodec.encodeOrNull(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("enc")
      s"""
         |byte[] $r = graft.functions.FloatVecCodec.encodeOrNull($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `binary_to_float_vec(binary) → array<float>` — see [[FloatVecCodec]]. */
final case class BinaryToFloats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {
  override def prettyName: String = "binary_to_float_vec"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  // decoded elements are never null — the codec has no null slot
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  // always nullable: the bad-length fold exists even over non-null input
  override def nullable: Boolean = true

  override def nullSafeEval(b: Any): Any =
    FloatVecCodec.decodeOrNull(b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("dec")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.FloatVecCodec.decodeOrNull($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
