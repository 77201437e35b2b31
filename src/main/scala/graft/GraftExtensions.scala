package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BinaryToFloats, DotFloat, DotLong, FloatsToBinary, LEDecode, LEEncode, PiiRedact}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the native Catalyst expressions as SQL functions, so both
  * the DataFrame API (`call_function`) and plain `spark.sql("SELECT
  * dot_long(a, b) …")` reach the codegen'd kernels — the library surface
  * a SQL-first user of the reference would expect. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  /** Analyzer-facing builder: a SQL call with the wrong argument count
    * must surface as an AnalysisException naming the function, not a raw
    * IndexOutOfBoundsException from `children(1)`. */
  private def binary(name: String)(build: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression =
    children => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> children.length.toString, "docroot" -> ""))
      build(children(0), children(1))
    }

  /** Unary twin of [[binary]] — same named-AnalysisException arity guard. */
  private def unary(name: String)(build: Expression => Expression)
      : Seq[Expression] => Expression =
    children => {
      if (children.length != 1)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "1",
            "actualNum" -> children.length.toString, "docroot" -> ""))
      build(children(0))
    }

  /** Ternary twin of [[binary]] — same named-AnalysisException arity guard. */
  private def ternary(name: String)(
      build: (Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression =
    children => {
      if (children.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> "3",
            "actualNum" -> children.length.toString, "docroot" -> ""))
      build(children(0), children(1), children(2))
    }

  private val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dot_long"),
        info(classOf[DotLong], "dot_long",
          "dot_long(a, b) - exact integer inner product of two bigint arrays; null on null or ragged input"),
        binary("dot_long")(DotLong(_, _))),
      (FunctionIdentifier("dot_float"),
        info(classOf[DotFloat], "dot_float",
          "dot_float(a, b) - float inner product accumulated in double, left-to-right; null on null or ragged input"),
        binary("dot_float")(DotFloat(_, _))),
      (FunctionIdentifier("float_vec_to_binary"),
        info(classOf[FloatsToBinary], "float_vec_to_binary",
          "float_vec_to_binary(v) - fixed-width LE IEEE-754 encoding of a float array (the relational-store vector codec); null on null input or a null element"),
        unary("float_vec_to_binary")(FloatsToBinary(_))),
      (FunctionIdentifier("binary_to_float_vec"),
        info(classOf[BinaryToFloats], "binary_to_float_vec",
          "binary_to_float_vec(b) - decode the fixed-width LE float-vector codec; null on null input or a length not divisible by 4"),
        unary("binary_to_float_vec")(BinaryToFloats(_))),
      (FunctionIdentifier("pii_redact"),
        info(classOf[PiiRedact], "pii_redact",
          "pii_redact(s) - fused PII mask (emails -> <EMAIL>, 6+-digit runs -> <ID>, residual digits -> #) with match counts as struct<redacted, n_emails, n_ids>; null on null input"),
        unary("pii_redact")(PiiRedact(_))),
      (FunctionIdentifier("le_decode"),
        info(classOf[LEDecode], "le_decode",
          "le_decode(bin, off, n) - decode n little-endian bytes at 1-based off as bigint; null on null input, no byte in range, or an 8-byte value past bigint range"),
        ternary("le_decode")(LEDecode(_, _, _))),
      (FunctionIdentifier("le_encode"),
        info(classOf[LEEncode], "le_encode",
          "le_encode(v, n) - encode v's low n bytes little-endian as binary; null on null input"),
        binary("le_encode")(LEEncode(_, _))))

  /** Registers the graft functions into an ALREADY-RUNNING session's
    * registry — the path for sessions the library does not own (the
    * driver passes its own `SparkSession` into `SparkEntry.queries`).
    * Idempotent; `registerFunction` overwrites in place. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
