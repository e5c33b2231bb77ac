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
    val e = count(emailP, s)
    val i = count(ipP, s)
    val d = count(idP, s)
    // clean-document fast path: the counts already prove the replace
    // chain is an identity, so skip its three scans and the re-encode —
    // exact by construction (replaceAll with zero matches returns the
    // input), and clean docs are the overwhelming majority of any real
    // corpus
    val scrubbed =
      if (e == 0 && i == 0 && d == 0) text
      else UTF8String.fromString(
        idP.matcher(
          ipP.matcher(
            emailP.matcher(s).replaceAll("<EMAIL>"))
            .replaceAll("<IP>"))
          .replaceAll("<ID>"))
    InternalRow(e, i, d, scrubbed)
  }

  def scrub(text: UTF8String): UTF8String = {
    val s = text.toString
    // same clean fast path via early-exit find()s (no counting needed)
    if (!emailP.matcher(s).find() && !ipP.matcher(s).find() &&
        !idP.matcher(s).find()) text
    else UTF8String.fromString(
      idP.matcher(
        ipP.matcher(
          emailP.matcher(s).replaceAll("<EMAIL>"))
          .replaceAll("<IP>"))
        .replaceAll("<ID>"))
  }
}

/** Canonical-form fingerprint in one pass: the exact-dedup key
  * md5(lower(trim(regexp_replace(text, '\s+', ' ')))) shared by t04, d01,
  * d08, and the pipeline's exact-dedup stage — without the regex pass or
  * the three intermediate strings. Exactness: lowercasing commutes with
  * whitespace collapse (Java `\s` is the ASCII set [ \t\n\x0B\f\r] and no
  * Unicode case mapping produces or consumes ASCII whitespace), so the
  * kernel lowercases once via UTF8String.toLowerCase (Spark's own Lower
  * kernel), then collapses \s runs to single spaces byte-wise — non-ASCII
  * UTF-8 bytes are ≥ 0x80 and pass through untouched — dropping leading/
  * trailing runs (= trim after collapse). MD5 of the canonical bytes,
  * lowercase hex, exactly like Spark's md5(). ExprSpec pins equality
  * against the built-in chain on adversarial fixtures. */
object CanonFp {
  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private val hex = "0123456789abcdef".getBytes

  def canonFp(text: UTF8String): UTF8String = {
    val b = text.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 0 && isWs(c)) {
        if (n > 0) pendingSpace = true
      } else {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = c; n += 1
      }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(out, 0, n)
    val digest = md.digest()
    val hexOut = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hexOut(2 * j) = hex((digest(j) >> 4) & 0xf)
      hexOut(2 * j + 1) = hex(digest(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hexOut)
  }
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

/** One-pass quality-signal scan (the t02 chain without regex). The
  * built-in spelling pays three scans per row — `size(split(trim(text),
  * '\s+'))`, a `regexp_replace` keeping only punctuation, and an
  * interpreted HOF `filter(toks, x -> x IN stopwords)` that first
  * materializes the token array. One byte pass reproduces all three
  * counts exactly: Java-regex `\s` is the six ASCII bytes
  * [ \t\n\x0B\f\r] and the punctuation class is ASCII, so byte-level is
  * character-exact on UTF-8 (continuation bytes are ≥ 0x80). Token
  * count replicates `split`'s edges bit-for-bit: Spark's `trim` strips
  * only 0x20; split is Pattern.split(limit = -1), so a leading
  * non-space whitespace char yields a leading empty token, a trailing
  * one yields a trailing empty token (kept — unlike Java String.split),
  * and an empty/all-space trim yields [""]. Stopword membership is tested
  * in place on the token's byte range — no array, no per-token regex. */
object QualityScan {
  /** Canonical stopword list (TextOps re-exports; the oracle SQL and
    * this kernel must agree). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "on", "for", "with")

  private val stopBytes: Array[Array[Byte]] =
    Stopwords.map(_.getBytes("UTF-8")).toArray

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private def isStop(b: Array[Byte], start: Int, len: Int): Boolean = {
    var s = 0
    while (s < stopBytes.length) {
      val w = stopBytes(s)
      if (w.length == len) {
        var i = 0
        while (i < len && b(start + i) == w(i)) i += 1
        if (i == len) return true
      }
      s += 1
    }
    false
  }

  def qualityScan(text: UTF8String): InternalRow = {
    val b = text.getBytes
    var punct = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i).toInt & 0xff
      if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':')
        punct += 1
      i += 1
    }
    // trim(text) strips only 0x20; split('\s+') then tokenizes
    var lo = 0
    var hi = b.length - 1
    while (lo < b.length && b(lo) == ' ') lo += 1
    while (hi >= lo && b(hi) == ' ') hi -= 1
    var nTok = 0L
    var nStop = 0L
    if (lo > hi) nTok = 1L // "".split -> [""]
    else {
      // Spark's split uses Pattern.split(limit = -1): a leading \s+
      // match emits a leading "" token AND a trailing match emits a
      // trailing "" token (unlike Java String.split, which strips
      // trailing empties).
      if (isWs(b(lo).toInt & 0xff)) nTok += 1
      if (isWs(b(hi).toInt & 0xff)) nTok += 1
      i = lo
      while (i <= hi) {
        if (isWs(b(i).toInt & 0xff)) i += 1
        else {
          val start = i
          while (i <= hi && !isWs(b(i).toInt & 0xff)) i += 1
          nTok += 1
          if (isStop(b, start, i - start)) nStop += 1
        }
      }
    }
    InternalRow(nTok, punct, nStop)
  }
}

/** quality_scan(text) → struct<n_tokens, n_punct, n_stop: bigint>. */
case class QualityScanExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    QualityScan.qualityScan(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityScan.qualityScan($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): QualityScanExpr =
    copy(child = c)
  override def prettyName: String = "quality_scan"
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

/** canon_fp(text) → string: one-pass canonical-form md5 fingerprint
  * (see [[CanonFp]]). */
case class CanonFpExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    CanonFp.canonFp(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonFp.canonFp($c)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): CanonFpExpr =
    copy(child = c)
  override def prettyName: String = "canon_fp"
}
