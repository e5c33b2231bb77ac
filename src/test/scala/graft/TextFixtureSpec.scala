package graft

import graft.text.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Value gates for text operators whose interesting inputs don't occur in
  * the synthetic corpus: the driver oracle pins t14 on PII-free data
  * (zero-hit identity), so the actual redaction path is proven here on
  * planted PII. */
class TextFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("piiScrub counts and redacts planted emails, IPs, and id numbers") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact john.doe@example.com or jane_x@sub.domain.org today"),
      (2L, "server at 192.168.1.100 and 10.0.0.1 responded"),
      (3L, "customer id 1234567 ref 987654321 short 12345"),
      (4L, "clean text with no sensitive content at all"))
      .toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap

    assert(out(1L)._1 == ((2L, 0L, 0L)))
    assert(out(2L)._1 == ((0L, 2L, 0L)))
    // 12345 is 5 digits — below the 6+ id rule, must survive
    assert(out(3L)._1 == ((0L, 0L, 2L)))
    assert(out(4L)._1 == ((0L, 0L, 0L)))

    assert(out(1L)._2 == md5hex("contact <EMAIL> or <EMAIL> today"))
    assert(out(2L)._2 == md5hex("server at <IP> and <IP> responded"))
    assert(out(3L)._2 == md5hex("customer id <ID> ref <ID> short 12345"))
    assert(out(4L)._2 == md5hex("clean text with no sensitive content at all"))
  }

  test("t22 char entropy matches a direct per-string computation, and " +
    "degenerate docs hit the boundaries") {
    import spark.implicits._
    val docs = FixtureData.docTexts ++ Seq(
      90L -> "aaaaaaaa",   // one symbol: entropy exactly 0
      91L -> "ababababab", // two symbols, uniform: entropy ln 2
      92L -> "x")          // single char
    val out = TextOps.charEntropy(
        docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    docs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).map { case (_, v) => v.length.toLong }
      val n = text.length.toLong
      val expected = math.log(n.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / n
      val (nc, nd, mx, ent) = out(id)
      assert(nc == n, s"doc $id n_chars")
      assert(nd == text.toSet.size, s"doc $id n_distinct_chars")
      assert(mx == counts.max, s"doc $id max_char_count")
      // ent is rounded to 4dp; allow the half-step plus float noise
      assert(math.abs(ent - expected) <= 5.001e-5, s"doc $id entropy")
    }
    assert(out(90L)._4 == 0.0 && out(92L)._4 == 0.0)
    assert(math.abs(out(91L)._4 - FixtureData.round4(math.log(2))) < 1e-12)
  }
}
