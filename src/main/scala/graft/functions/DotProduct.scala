package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot-product expressions — the codegen upgrade of the
  * JVM-kernel UDFs they replace (brief preference order: native
  * `Expression` with `doGenCode` > Scala UDF): the generated tight loop
  * runs INSIDE whole-stage codegen over Tungsten `ArrayData`, with no
  * UDF serialization boundary, no Row→Seq conversion, and no codegen
  * fence splitting the surrounding stage.
  *
  * Semantics vs the replaced UDFs: null input → null and accumulation is
  * strictly left-to-right, so double results are bit-identical on every
  * well-formed pair. Two degenerate cases are deliberately TIGHTENED, not
  * copied: a ragged (length-mismatched) pair is null, where the UDFs
  * computed a silently partial dot over min(length); and a null ELEMENT
  * yields null output, where the UDF path would have thrown on unboxing.
  * Catalog embeddings are fixed-width with no null elements, so no
  * catalog result changes — malformed input now surfaces as a null
  * score instead of a wrong one or a crash.
  */
abstract class DotProductBase extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {
  // always nullable: the ragged-pair null exists even over non-null inputs
  override def nullable: Boolean = true
  // the REGISTERED catalog name, not a class-name derivation: analyzer
  // errors and EXPLAIN print prettyName, and "dotlong" is a function a
  // user who copies it from the message cannot resolve (r13 sweep)
}

/** `dot_long(array<bigint>, array<bigint>) → bigint` — exact integer
  * inner product (the quantized similarity tier). "Exact" is enforced,
  * not assumed: an overflowing accumulation folds to NULL (exact
  * Math.addExact/multiplyExact, JIT intrinsics) instead of silently
  * wrapping — this is a PUBLIC registered SQL function, and the
  * catalog's upstream quantization envelope (|q| ≤ 10^6) does not
  * bound what user SQL feeds it; a wrapped Long is a plausible wrong
  * score, the exact class the ragged-pair null exists to prevent
  * (r13 third sweep). */
final case class DotLong(left: Expression, right: Expression) extends DotProductBase {
  override def prettyName: String = "dot_long"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else try {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        i += 1
      }
      acc
    } catch { case _: ArithmeticException => null }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  try {
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $acc = java.lang.Math.addExact($acc,
         |        java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |    }
         |  } catch (java.lang.ArithmeticException e) { ${ev.isNull} = true; }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `dot_float(array<float>, array<float>) → double` — float inner
  * product accumulated in double, strictly left-to-right (bit-identical
  * to the UDF kernel it replaces). */
final case class DotFloat(left: Expression, right: Expression) extends DotProductBase {
  override def prettyName: String = "dot_float"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
