package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenizing kernels for the per-byte text operators (t05 BPE
  * counts, t11 n-gram repetition, t12 chunking). The regex + HOF
  * spellings they replace were the three heaviest honest-work tails of
  * the sf10 audit (t12 35.8 s, t05 26.5 s, t11 17.9 s): each re-scanned
  * the text with a Java regex, materialized the full token array (one
  * UTF8String per token), then ran interpreted HOF lambdas
  * (`transform`/`slice`) or a second kernel over that array. These
  * kernels do the whole computation in one scan over the UTF-8 bytes,
  * allocating nothing per token.
  *
  * Byte-identity contract: outputs equal the regex spellings exactly —
  *  - whitespace tokens reproduce `split(trim(text), '\\s+')` (Spark trim
  *    strips ASCII 0x20 only; Java split keeps a LEADING empty token when
  *    the string starts with a separator and, at limit -1, a TRAILING one
  *    when it ends with one; the empty string yields a single empty
  *    token). ASCII `\s` = [ \t\n\x0B\f\r]: UTF-8 guarantees these bytes
  *    never occur inside a multi-byte sequence, so the byte scan splits
  *    exactly where the regex does.
  *  - n-gram hashes join token bytes with 0x20 — the same streamed FNV-1a
  *    as [[HashImpls.ngramHashes]] (ExprSpec pins equality).
  *  - chunk md5 equals md5(concat_ws(' ', slice(toks, i*C+1, C))) —
  *    digest streamed straight from the text bytes.
  * ExprSpec proves each equality on adversarial fixtures (tabs at edges,
  * empty strings, multi-byte UTF-8, separator runs).
  */
object TokenImpls {

  /** Java-regex `\s` without UNICODE_CHARACTER_CLASS (what
    * regexp/split compile to): ASCII space, \t, \n, \x0B, \f, \r. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Token (start, end) byte offsets of `split(trim(text), '\s+')`,
    * packed pairwise. See the class doc for the exact edge semantics. */
  private[functions] def tokenBounds(bytes: Array[Byte]): Array[Int] = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    if (lo == hi) return Array(lo, lo) // "" splits to [""]
    var n = 0
    val out = new Array[Int](2 * (count(bytes, lo, hi) max 1))
    if (isWs(bytes(lo))) { out(0) = lo; out(1) = lo; n = 1 } // leading ""
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        if (tokStart < i) { out(2 * n) = tokStart; out(2 * n + 1) = i; n += 1 }
        while (i < hi && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    if (tokStart < hi) { out(2 * n) = tokStart; out(2 * n + 1) = hi; n += 1 }
    else { out(2 * n) = hi; out(2 * n + 1) = hi; n += 1 } // trailing ""
    if (2 * n == out.length) out else java.util.Arrays.copyOf(out, 2 * n)
  }

  /** Upper bound on token count (separator-run count + 2 edge empties). */
  private def count(bytes: Array[Byte], lo: Int, hi: Int): Int = {
    var c = 2
    var i = lo
    var inTok = false
    while (i < hi) {
      val ws = isWs(bytes(i))
      if (!ws && !inTok) c += 1
      inTok = !ws
      i += 1
    }
    c
  }

  /** Growable open-addressing set of non-zero longs (zero tracked by
    * flag) — the distinct counter shared by the kernels; load ≤ 0.5. */
  private final class LongSet(initial: Int) {
    private var cap = { var c = 8; while (c < initial * 2) c <<= 1; c }
    private var table = new Array[Long](cap)
    private var hasZero = false
    var size = 0L
    def add(v: Long): Unit = {
      if (v == 0L) { if (!hasZero) { hasZero = true; size += 1 }; return }
      var idx = (v ^ (v >>> 32)).toInt & (cap - 1)
      while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & (cap - 1)
      if (table(idx) == 0L) {
        table(idx) = v; size += 1
        if (size * 2 >= cap) grow()
      }
    }
    private def grow(): Unit = {
      val old = table
      cap <<= 1
      table = new Array[Long](cap)
      var i = 0
      while (i < old.length) {
        val v = old(i)
        if (v != 0L) {
          var idx = (v ^ (v >>> 32)).toInt & (cap - 1)
          while (table(idx) != 0L) idx = (idx + 1) & (cap - 1)
          table(idx) = v
        }
        i += 1
      }
    }
  }

  @inline private def fnvBytes(h0: Long, bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = h0
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** t11's counts in one scan: (n_grams, n_distinct) ==
    * (when(size(toks) >= n, size - n + 1).otherwise(1),
    *  size(ngramHashes(toks, n))) — same streamed space-joined FNV-1a
    * gram hashes, distinct-counted in the primitive set instead of
    * sort+dedup of a materialized array. */
  def ngramStats(text: UTF8String, n: Int): InternalRow = {
    val bytes = text.getBytes
    val bounds = tokenBounds(bytes)
    val m = bounds.length / 2
    val nGrams = if (m >= n) m - n + 1 else 1
    val lim = if (m >= n) n else m
    val set = new LongSet(nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0xcbf29ce484222325L
      var g = 0
      while (g < lim) {
        if (g > 0) h = (h ^ 0x20L) * 0x100000001b3L
        h = fnvBytes(h, bytes, bounds(2 * (i + g)), bounds(2 * (i + g) + 1))
        g += 1
      }
      set.add(h)
      i += 1
    }
    InternalRow(nGrams.toLong, set.size)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** t12's chunks in one scan: array of (n_toks, chunk_md5) per C-token
    * chunk, md5 streamed over token bytes joined by 0x20 — equals
    * md5(concat_ws(' ', slice(toks, i*C+1, C))) without materializing
    * tokens, chunks, or joined strings. */
  def chunkScan(text: UTF8String, c: Int): ArrayData = {
    val bytes = text.getBytes
    val bounds = tokenBounds(bytes)
    val m = bounds.length / 2
    val nChunks = (m - 1) / c + 1
    val out = new Array[Any](nChunks)
    val md = java.security.MessageDigest.getInstance("MD5")
    var ci = 0
    while (ci < nChunks) {
      md.reset()
      val start = ci * c
      val end = math.min(start + c, m)
      var i = start
      while (i < end) {
        if (i > start) md.update(0x20.toByte)
        md.update(bytes, bounds(2 * i), bounds(2 * i + 1) - bounds(2 * i))
        i += 1
      }
      val digest = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(digest(b) & 0xf)
        b += 1
      }
      out(ci) = InternalRow((end - start).toLong,
        UTF8String.fromString(new String(hex)))
      ci += 1
    }
    new GenericArrayData(out)
  }

  /** t05's counts in one scan of the LOWERCASED text (same
    * UTF8String.toLowerCase the built-in `lower` calls): total and
    * distinct matches of the BPE pre-tokenizer
    * `[a-z]+|[0-9]+|[^a-z0-9\s]` — letter runs, digit runs, single
    * non-space code points (Java character classes match full code
    * points, so a 4-byte emoji is one token). Distinct via 64-bit FNV
    * stand-ins for the token strings (the repo-wide ~2^-64 collision
    * convention). */
  def bpeStats(text: UTF8String): InternalRow = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    val set = new LongSet(64)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        var j = i + 1
        while (j < n && bytes(j) >= 'a' && bytes(j) <= 'z') j += 1
        set.add(fnvBytes(0xcbf29ce484222325L, bytes, i, j)); total += 1
        i = j
      } else if (b >= '0' && b <= '9') {
        var j = i + 1
        while (j < n && bytes(j) >= '0' && bytes(j) <= '9') j += 1
        set.add(fnvBytes(0xcbf29ce484222325L, bytes, i, j)); total += 1
        i = j
      } else if (isWs(b)) {
        i += 1
      } else {
        // one code point: UTF-8 length from the lead byte (ASCII
        // punctuation = 1; continuation bytes never start a token here)
        val len =
          if ((b & 0x80) == 0) 1
          else if ((b & 0xe0) == 0xc0) 2
          else if ((b & 0xf0) == 0xe0) 3
          else 4
        val j = math.min(i + len, n)
        set.add(fnvBytes(0xcbf29ce484222325L, bytes, i, j)); total += 1
        i = j
      }
    }
    InternalRow(total, set.size)
  }
}

/** ngram_scan(text, n) → struct<n_grams: bigint, n_distinct: bigint>. */
case class NgramScan(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TokenImpls.ngramStats(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenImpls.ngramStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): NgramScan =
    copy(child = c)
  override def prettyName: String = "ngram_scan"
}

/** chunk_scan(text, c) → array<struct<n_toks: bigint, chunk_md5: string>>. */
case class ChunkScan(child: Expression, c: Int) extends UnaryExpression {
  require(c > 0, "chunk size must be positive")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TokenImpls.chunkScan(v.asInstanceOf[UTF8String], c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TokenImpls.chunkScan($in, $c)")
  override protected def withNewChildInternal(ch: Expression): ChunkScan =
    copy(child = ch)
  override def prettyName: String = "chunk_scan"
}

/** bpe_scan(text) → struct<n_bpe_tokens: bigint, n_distinct_bpe: bigint>. */
case class BpeScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_distinct_bpe", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TokenImpls.bpeStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenImpls.bpeStats($c)")
  override protected def withNewChildInternal(c: Expression): BpeScan =
    copy(child = c)
  override def prettyName: String = "bpe_scan"
}
