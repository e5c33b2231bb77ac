package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass-per-row PII kernel. The t14 operator needs six regex scans
  * per document when spelled with built-ins (three `regexp_extract_all`
  * counts + three chained `regexp_replace`), each paying its own
  * UTF8String↔String conversion and, for the extracts, materializing
  * match arrays that only ever get `size()`d. This kernel converts the
  * row ONCE, counts with bare `Matcher.find()` loops (no allocation),
  * and scrubs with the SAME sequential `replaceAll` chain Spark's
  * regexp_replace executes — java.util.regex semantics are preserved
  * bit-for-bit (counts on the RAW text; email→ip→id replacement order),
  * so the DuckDB oracle twin is untouched.
  */
object TextScrub {
  // the single definition of the PII patterns (TextOps re-exports these)
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IpRe = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val IdRe = "\\d{6,}"

  private val emailP = Pattern.compile(EmailRe)
  private val ipP = Pattern.compile(IpRe)
  private val idP = Pattern.compile(IdRe)

  private def count(p: Pattern, s: String): Long = {
    val m = p.matcher(s)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  def piiScan(text: UTF8String): InternalRow = {
    val s = text.toString
    val scrubbed = idP.matcher(
      ipP.matcher(
        emailP.matcher(s).replaceAll("<EMAIL>"))
        .replaceAll("<IP>"))
      .replaceAll("<ID>")
    InternalRow(count(emailP, s), count(ipP, s), count(idP, s),
      UTF8String.fromString(scrubbed))
  }

  def scrub(text: UTF8String): UTF8String =
    UTF8String.fromString(
      idP.matcher(
        ipP.matcher(
          emailP.matcher(text.toString).replaceAll("<EMAIL>"))
          .replaceAll("<IP>"))
        .replaceAll("<ID>"))
}

/** pii_scan(text) → struct<n_emails, n_ips, n_ids: bigint,
  * scrubbed: string>. Deterministic; duplicate GetStructField consumers
  * collapse to one evaluation per row via codegen subexpression
  * elimination. */
case class PiiScan(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("n_ids", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextScrub.piiScan(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScrub.piiScan($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): PiiScan =
    copy(child = c)
  override def prettyName: String = "pii_scan"
}

/** scrub_pii(text) → string: just the redaction chain, for pipeline
  * stages that don't need the counts. */
case class ScrubPii(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextScrub.scrub(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextScrub.scrub($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): ScrubPii =
    copy(child = c)
  override def prettyName: String = "scrub_pii"
}
