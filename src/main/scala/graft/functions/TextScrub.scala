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

/** One-pass text normalization (the t09 chain without regex). The
  * built-in spelling is four regex scans per row (lower → `[0-9]+`→"0"
  * → drop `[^a-z0-9 ]` → collapse `" +"` → trim) plus a fifth
  * regexp_extract_all for the digit-run count. Every kept character is
  * ASCII, so after UTF8String.toLowerCase (the exact Lower kernel Spark
  * applies) a single byte scan reproduces the chain: digit runs emit
  * one '0' (a run broken by ANY non-digit — including a char the filter
  * later drops — restarts, exactly like the regex), kept letters/spaces
  * append with space-run collapsing, and leading/trailing spaces never
  * materialize. Byte-level is exact because every non-ASCII char's
  * UTF-8 bytes are ≥ 0x80 and the filter drops the whole char either
  * way. */
object TextNorm {
  def normScan(text: UTF8String): InternalRow = {
    val b = text.toLowerCase.getBytes
    val sb = new java.lang.StringBuilder(b.length)
    var i = 0
    var inDigits = false
    var lastSpace = true // swallows leading spaces (the trim)
    while (i < b.length) {
      val c = b(i).toInt & 0xff
      if (c >= '0' && c <= '9') {
        if (!inDigits) { sb.append('0'); lastSpace = false }
        inDigits = true
      } else {
        inDigits = false
        if (c >= 'a' && c <= 'z') { sb.append(c.toChar); lastSpace = false }
        else if (c == ' ' && !lastSpace) { sb.append(' '); lastSpace = true }
      }
      i += 1
    }
    var len = sb.length
    while (len > 0 && sb.charAt(len - 1) == ' ') len -= 1 // trailing trim
    // digit-run count over the RAW text (the t09 n_num_runs column)
    val rb = text.getBytes
    var runs = 0L
    var in = false
    var j = 0
    while (j < rb.length) {
      val c = rb(j).toInt & 0xff
      if (c >= '0' && c <= '9') { if (!in) runs += 1; in = true }
      else in = false
      j += 1
    }
    InternalRow(UTF8String.fromString(sb.substring(0, len)), runs)
  }
}

/** norm_scan(text) → struct<norm: string, n_num_runs: bigint>. */
case class NormScan(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("norm", StringType, nullable = false),
    StructField("n_num_runs", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextNorm.normScan(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normScan($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NormScan =
    copy(child = c)
  override def prettyName: String = "norm_scan"
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
