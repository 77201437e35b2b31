package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `pii_redact(s) → struct<redacted string, n_emails bigint, n_ids
  * bigint>` — the fused single-kernel form of the three-stage PII mask
  * (emails → `<EMAIL>`, then 6+-digit id runs → `<ID>`, then residual
  * digit runs → `#`, with per-row match counts).
  *
  * Why fused (r18, r17 verdict #6): the declarative form walked the
  * same string FIVE times per row — three `regexp_replace` plus two
  * `regexp_extract_all`, the latter allocating an array of every match
  * purely to take its size — and at the sf10 tier that projection was
  * 9.7 s of pure regex re-scanning. This kernel makes exactly ONE
  * alternation pass (email branch first, digit-run branch classified
  * by length) and allocates nothing but the output builder.
  *
  * Equivalence to the staged form is structural, not approximate:
  * Java's non-overlapping left-to-right `find()` loop is precisely the
  * semantics of `regexp_replace`, a greedy `[0-9]{6,}` consumes an
  * entire maximal digit run (so "one match per run of length ≥ 6" is
  * the `n_ids` count), and the residual `[0-9]+` → `#` stage only ever
  * sees runs the id stage left behind — the single-scan argument lives
  * at [[PiiRedact.kernel]]. The mask order (emails first: an email's
  * local part may contain digit runs that must become part of
  * `<EMAIL>`) is pinned by the txt_redact_pii oracle, which still
  * states the staged form in portable SQL.
  *
  * Null propagates (a null input row yields a null struct); the output
  * struct's fields are never individually null.
  */
final case class PiiRedact(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "pii_redact"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ids", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    PiiRedact.kernel(input.asInstanceOf[UTF8String])

  // one static call inside the surrounding whole-stage-codegen span —
  // the kernel is regex-bound, so (unlike the dot products) there is
  // nothing to gain from emitting the loops inline; the call keeps the
  // stage fused with no iterator fence
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiRedact.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiRedact {
  /** The portable email core (char classes + bounded repetition —
    * identical under Java regex and DuckDB's RE2), shared verbatim with
    * the txt_redact_pii oracle SQL. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  // ONE alternation pass, email branch first. Equivalence to the staged
  // (emails over raw, then digit runs over s1) form:
  //  - the email branch fires at exactly the staged form's match starts:
  //    a digit-initial email is tried as EMAIL before the digit branch
  //    can touch it, and an email attempt that fails from the start of a
  //    [A-Za-z0-9._%+-]+ run fails from every position inside it (the @
  //    and domain positions don't depend on where the local part began),
  //    so the digit branch can never consume the head of a real email;
  //  - "<EMAIL>" contains no digits and its insertion separates any
  //    digit runs flanking the match, so s1's maximal digit runs are
  //    exactly raw's maximal digit runs outside email matches — each
  //    classified here by length exactly as the greedy [0-9]{6,} /
  //    residual [0-9]+ stages classify them.
  // PropertiesSpec pins kernel == staged-regex reference on generated
  // adversarial strings (digit-initial emails, 5/6/7-digit runs, runs
  // abutting emails).
  private val fusedP =
    java.util.regex.Pattern.compile(s"($emailPattern)|([0-9]+)")

  def kernel(u: UTF8String): InternalRow = {
    val raw = u.toString
    val m = fusedP.matcher(raw)
    val out = new java.lang.StringBuilder(raw.length)
    var nEmails = 0L
    var nIds = 0L
    var last = 0
    while (m.find()) {
      out.append(raw, last, m.start())
      if (m.start(1) >= 0) { nEmails += 1; out.append("<EMAIL>") }
      else if (m.end(2) - m.start(2) >= 6) { nIds += 1; out.append("<ID>") }
      else out.append('#')
      last = m.end()
    }
    out.append(raw, last, raw.length)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(out.toString), nEmails, nIds))
  }
}
