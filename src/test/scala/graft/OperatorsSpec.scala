package graft

import org.apache.spark.sql.functions.{count, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

/** Structural sanity for the query inventory at sf0.001. Value-level
  * correctness is enforced by the DuckDB oracle gate (tools/check_oracle.py
  * over graft.Verify output); these specs pin invariants that hold at any
  * scale factor.
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = TestSpark.tables

  test("every SURVEY §2 query runs and q-oracle keys line up") {
    val qs = SparkEntry.queries
    assert(qs.size >= 109, s"expected >=109 inventory entries, got ${qs.size}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    // the inventory is a ++ of module maps: a duplicated key would
    // silently drop an operator — the merged size must equal the sum
    val moduleSizes =
      operators.Reference.queries.size + operators.Relational.queries.size +
        operators.Extended.queries.size + operators.Grouped.queries.size +
        operators.Analytics.queries.size + operators.CatalogOps.queries.size +
        operators.GraphOps.queries.size +
        text.TextOps.queries.size +
        dedup.Dedup.queries.size + similarity.Similarity.queries.size +
        pipeline.PipelineQueries.queries.size +
        streaming.StreamQueries.queries.size + 7 // the 7 inline m-entries
    assert(qs.size == moduleSizes,
      s"key collision between module query maps: ${qs.size} != $moduleSizes")
  }

  test("driver entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q95 native as-of join is row-identical to the q33 composition") {
    // two independent spellings of the same semantics: the custom
    // one-pass merge exec vs union + window last-non-null
    val native = operators.Relational.q95(t).collect().toSeq
    val composed = operators.Relational.q33(t).collect().toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("q102 composite-key as-of with payload is row-identical to the " +
    "window composition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val native = operators.Relational.q102(t).collect().toSeq
    // the q33 union + last-ignoreNulls composition lifted to the
    // composite (uid, class) key, payload carried inside the struct
    val mo = t.orders
      .groupBy(col("o_custkey").as("uid"),
        when(col("o_orderpriority").startsWith("1"), 2L)
          .when(col("o_orderpriority").startsWith("2"), 1L)
          .otherwise(0L).as("mkey"),
        col("o_orderdate").cast("timestamp").as("ots"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("day_cents"))
      .select(col("uid"), col("mkey"), col("ots").as("ts"),
        struct(col("ots"), col("day_cents")).as("ref"),
        lit(false).as("is_probe"))
    val ev = t.events.select(col("user_id").as("uid"), col("ts"),
        when(col("event_type") === "purchase", 2L)
          .when(col("event_type") === "view", 1L).otherwise(0L).as("mkey"))
      .select(col("uid"), col("mkey"), col("ts"),
        lit(null).cast(mo.schema("ref").dataType).as("ref"),
        lit(true).as("is_probe"))
    val w = Window.partitionBy(col("uid"), col("mkey"))
      .orderBy(col("ts"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = mo.unionByName(ev)
      .withColumn("m", last(col("ref"), ignoreNulls = true).over(w))
      .filter(col("is_probe") && col("m").isNotNull)
      .groupBy(col("uid").as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("m.ots")).as("asof_date"),
        sum(col("m.day_cents")).as("sum_asof_cents"))
      .orderBy("user_id")
      .collect().toSeq
    assert(native.nonEmpty && native == composed)
  }

  test("q103 outer as-of: matched rows agree with q102's inner join and " +
    "unmatched probes survive with zeroed payload") {
    import org.apache.spark.sql.functions._
    val inner = operators.Relational.q102(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val outer = operators.Relational.q103(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(outer.nonEmpty)
    // every inner row's (n, cents) must reappear as the outer row's
    // (n_matched, cents); users absent from inner must still appear
    outer.foreach { case (uid, nEvents, nMatched, cents) =>
      assert(nMatched <= nEvents)
      inner.get(uid) match {
        case Some((n, c)) => assert(nMatched == n && cents == c,
          s"user $uid: outer ($nMatched,$cents) != inner ($n,$c)")
        case None => assert(nMatched == 0L && cents == 0L,
          s"user $uid unmatched must zero out: ($nMatched,$cents)")
      }
    }
    // the outer spelling must actually add coverage somewhere
    assert(outer.exists { case (_, ne, nm, _) => nm < ne },
      "fixture must contain unmatched probes (else q103 degenerates)")
    val plan = operators.Relational.q103(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin") && !plan.contains("Window"))
  }

  test("q102 plans the AsOfJoinExec (no window fallback)") {
    val plan = operators.Relational.q102(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin") && !plan.contains("Window"),
      s"q102 must plan the generalized exec:\n$plan")
  }

  test("q01 counts partition the table") {
    val total = operators.Reference.q01(t)
      .agg(org.apache.spark.sql.functions.sum("total")).head().getLong(0)
    assert(total == t.lineitem.count())
  }

  test("q02 pct shares sum to ~100") {
    val pcts = operators.Reference.q02(t).collect().map(_.getDouble(2))
    assert(math.abs(pcts.sum - 100.0) < 0.1)
  }

  test("q86 keep-latest partitions users and equals the window spelling") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val agg = operators.Analytics.q86(t)
    val rows = agg.collect()
    assert(rows.map(_.getLong(1)).sum ==
      t.events.select("user_id").distinct().count())
    // the max(struct) reduction must equal the row_number() window
    // spelling exactly (same tie-break: ts, then unique event_id)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val alt = t.events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_latest_cents"))
      .orderBy("event_type")
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    assert(canon(agg) == canon(alt))
  }

  test("q87 streaks partition each user's active days") {
    import org.apache.spark.sql.functions._
    val rows = operators.Analytics.q87(t).collect()
    assert(rows.map(_.getLong(3)).sum ==
      t.events.select(col("user_id"), to_date(col("ts"))).distinct().count())
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3), "n_streaks <= n_active_days")
      assert(r.getLong(2) <= r.getLong(3), "longest_streak <= n_active_days")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("t23 quota sample keeps exactly least(Quota, n_l) docs per language " +
    "and the prefilter retains the true hash-rank top-Quota") {
    import org.apache.spark.sql.functions._
    val kept = text.TextOps.t23(t)
    val perLang = kept.groupBy("lang").agg(count(lit(1)).as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nl = t.documents.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == nl.keySet)
    perLang.foreach { case (lang, k) =>
      assert(k == math.min(40L, nl(lang)), s"lang $lang kept $k of ${nl(lang)}")
    }
    // the threshold pass must reproduce the unfiltered ranking exactly
    val full = t.documents
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("samp_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("h"), col("doc_id"))).cast("bigint"))
      .filter(col("samp_rank") <= 40)
      .select(col("doc_id"), col("lang"), col("samp_rank"))
      .orderBy("lang", "samp_rank")
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    assert(canon(kept) == canon(full))
  }

  test("t24 mixture weights conserve the token budget in exact integers") {
    val rows = text.TextOps.t24(t).collect()
    val totTokens = rows.map(_.getLong(2)).sum
    val budgetPerSource = totTokens / (2L * rows.length)
    rows.foreach { r =>
      val (srcTokens, wbp, planned) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(wbp == math.min(10000L, budgetPerSource * 10000L / srcTokens))
      assert(planned == srcTokens * wbp / 10000L)
      assert(planned <= srcTokens)
      // an uncapped source never plans more than its budget share
      if (wbp < 10000L) assert(planned <= budgetPerSource)
    }
  }

  test("q90 parameter binding equals literal inlining") {
    import org.apache.spark.sql.functions._
    val bound = operators.Analytics.q90(t).collect()
    val literal = t.events
      .filter(col("event_type").isin("click", "purchase") && col("value") >= 10.0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_value_cents"))
      .orderBy("event_type").collect()
    assert(bound.nonEmpty &&
      bound.map(_.toString).toSeq == literal.map(_.toString).toSeq)
  }

  test("q89 pipe syntax plans identically to the nested DataFrame spelling") {
    import org.apache.spark.sql.functions._
    val piped = operators.Analytics.q89(t)
    val nested = t.events
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy((col("user_id") % 10).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents"))
      .filter(col("n_events") > 0)
      .orderBy("bucket", "event_type")
    assert(piped.columns.sorted.toSeq == nested.columns.sorted.toSeq)
    val canon = (df: org.apache.spark.sql.DataFrame) =>
      df.select(df.columns.sorted.map(col): _*)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    assert(canon(piped).nonEmpty && canon(piped) == canon(nested))
  }

  test("d11 incremental classes partition the incoming batch") {
    import org.apache.spark.sql.functions._
    val rows = text.TextOps.d11(t).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"classes must partition n_incoming for ${r.getString(0)}")
    }
    assert(rows.map(_.getLong(1)).sum ==
      t.documents.filter(
        substring(md5(col("doc_id").cast("string")), 32, 1) >= "d").count())
    // the hash split must sample a broad source cross-section, which the
    // correlated doc_id-mod-k split did not (4 of 20 sources)
    assert(rows.length >= 10, s"expected a broad source spread, got ${rows.length}")
  }

  test("w03 band query is selective and stable across reruns (cached layout)") {
    val a = operators.CatalogOps.w03(t).collect()
    assert(a.nonEmpty)
    // middle-20% x middle-20% bands must actually select a proper subset
    val selected = a.map(_.getLong(1)).sum
    assert(selected > 0 && selected < t.events.count())
    val b = operators.CatalogOps.w03(t).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("w04 merged-schema read keeps every event and the NULL bucket") {
    val rows = operators.CatalogOps.w04(t).collect()
    assert(rows.map(_.getLong(2)).sum == t.events.count())
    assert(rows.exists(_.getString(1) == "pre_evolution"),
      "pre-evolution rows must surface as the explicit NULL bucket")
    assert(rows.exists(r => r.getString(1).startsWith("ch")),
      "evolved rows must carry the new column")
  }

  test("w02 compacted layout preserves every event") {
    val rows = operators.CatalogOps.w02(t).collect()
    assert(rows.map(_.getLong(1)).sum == t.events.count())
  }

  test("q83 null-safe join keeps the NULL bucket and partitions orders") {
    val rows = operators.Analytics.q83(t).collect()
    assert(rows.exists(_.getString(0) == "bucket_-1"),
      "NULL keys must match via <=> instead of dropping")
    assert(rows.map(_.getLong(1)).sum == t.orders.count())
  }

  test("t19 per-source doc counts partition the corpus; rule accounting " +
    "is internally consistent") {
    val rows = text.TextOps.t19(t).collect()
    assert(rows.map(_.getLong(1)).sum == t.documents.count())
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(r.getLong(2) <= n)                     // n_pass
      (3 to 6).foreach(i => assert(r.getLong(i) <= n)) // per-rule fails
      // a doc passes iff it fails zero rules, so n - n_pass is bounded
      // by the sum of per-rule failures
      assert(n - r.getLong(2) <= (3 to 6).map(r.getLong).sum)
      val rate = r.getDouble(7)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("t20 terciles partition each source into near-equal buckets") {
    val rows = text.TextOps.t20(t).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sizes = rs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1,
        s"$src: ntile buckets must differ by at most one doc, got ${sizes.toSeq}")
      assert(rs.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L, 3L)))
    }
  }

  test("q85 new-user counts telescope into the cumulative curve and " +
    "total to the distinct user population") {
    val rows = operators.Analytics.q85(t).collect()
    val newUsers = rows.map(_.getLong(1))
    val cum = rows.map(_.getLong(2))
    // cum is the running sum of new_users in day order
    assert(cum.toSeq == newUsers.scanLeft(0L)(_ + _).tail.toSeq)
    assert(cum.last == t.events.select("user_id").distinct().count())
    // days arrive sorted and unique
    val days = rows.map(_.getDate(0).toString)
    assert(days.toSeq == days.toSeq.sorted && days.distinct.length == days.length)
  }

  test("t21 doc counts partition the corpus; vocab is bounded by tokens") {
    val rows = text.TextOps.t21(t).collect()
    assert(rows.map(_.getLong(1)).sum == t.documents.count())
    rows.foreach { r =>
      val (nTok, vocab, ttr) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(vocab >= 1L && vocab <= nTok)
      // ttr_x10k = round(vocab/n_tokens * 1e4) stays in (0, 10000]
      assert(ttr >= 1L && ttr <= 10000L)
    }
  }

  test("q21 star join covers every region present in customer data") {
    val regions = operators.Relational.q21(t)
      .select("region").distinct().count()
    assert(regions == 5)
  }

  test("q22 + q23 partition customers") {
    import org.apache.spark.sql.functions.sum
    def safeSum(df: org.apache.spark.sql.DataFrame): Long = {
      val r = df.agg(sum("n_cust")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val semi = safeSum(operators.Relational.q22(t))
    val anti = safeSum(operators.Relational.q23(t))
    assert(semi + anti == t.customer.count())
  }

  test("q24 emits at most 3 rows per customer, ranked") {
    val bad = operators.Relational.q24(t)
      .groupBy("o_custkey").count().filter("count > 3").count()
    assert(bad == 0)
  }

  test("q31 session counts bounded by event counts") {
    val r = operators.Relational.q31(t)
    assert(r.filter("n_sessions > n_events").count() == 0)
  }

  test("q42 approx distinct within rsd of exact") {
    val approx = operators.Relational.q42(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = operators.Relational.q27(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (g, (p, s)) =>
      assert(math.abs(approx(g)._1 - p) <= math.max(3, p * 0.1))
      assert(math.abs(approx(g)._2 - s) <= math.max(3, s * 0.1))
    }
  }

  test("q34 approx percentiles within the sketch's rank-error band of exact " +
    "(sf0.01)") {
    import org.apache.spark.sql.functions._
    val t1 = Tables(spark, "/root/testdata/sf0.01")
    val approx = operators.Reference.q34(t1).head()
    // accuracy=10000 bounds rank error at n/10000 of the ordering; a
    // correct sketch's value must therefore lie between the exact
    // percentiles at p -/+ eps for eps far above 1/10000 (20x here, plus
    // 0.01 absolute for the 2dp rounding both columns apply). A broken
    // sketch constant lands whole percentile bands away.
    val eps = 0.002
    val bands = t1.orders.agg(
      round(percentile(col("o_totalprice"), lit(0.25 - eps)), 2),
      round(percentile(col("o_totalprice"), lit(0.25 + eps)), 2),
      round(percentile(col("o_totalprice"), lit(0.50 - eps)), 2),
      round(percentile(col("o_totalprice"), lit(0.50 + eps)), 2),
      round(percentile(col("o_totalprice"), lit(0.75 - eps)), 2),
      round(percentile(col("o_totalprice"), lit(0.75 + eps)), 2)).head()
    Seq(0, 1, 2).foreach { i =>
      val (lo, hi) = (bands.getDouble(2 * i), bands.getDouble(2 * i + 1))
      val v = approx.getDouble(i)
      assert(v >= lo - 0.01 && v <= hi + 0.01,
        s"p${Seq(25, 50, 75)(i)} approx $v outside exact band [$lo, $hi]")
    }
  }

  test("q42 approx distinct within rsd band of q27 exact (sf0.01)") {
    val t1 = Tables(spark, "/root/testdata/sf0.01")
    val approx = operators.Relational.q42(t1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = operators.Relational.q27(t1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // rsd=0.02: assert within 5 sigma (10%) — catches a broken register
    // constant while never flaking on legitimate sketch variance
    exact.foreach { case (g, (p, s)) =>
      assert(math.abs(approx(g)._1 - p) <= math.max(3, p * 0.1))
      assert(math.abs(approx(g)._2 - s) <= math.max(3, s * 0.1))
    }
  }

  test("q75 densify emits every calendar cell and zero-fills the gaps") {
    val rows = operators.Analytics.q75(t).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2), r.getLong(3)))
    val groups = rows.map(_._1).distinct
    // every group covers all 31 January days
    groups.foreach { g =>
      assert(rows.count(_._1 == g) == 31, s"group $g must have 31 days")
    }
    // sf0.001 has day gaps: the zero-fill path must actually fire, and a
    // zero-revenue day is exactly a zero-count day
    val zeroDays = rows.filter(_._4 == 0L)
    assert(zeroDays.nonEmpty, "fixture SF must exercise the gap fill")
    assert(zeroDays.forall(_._3 == 0L))
  }

  test("q43 stratified sample respects fractions roughly") {
    val sampled = operators.Relational.q43(t).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = t.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("purchase") == totals("purchase")) // fraction 1.0
    assert(sampled("view") < totals("view") / 2)      // fraction 0.1
  }

  test("q43 hash gate matches an independent MessageDigest replay") {
    // membership must be a pure function of (event_id, event_type): replay
    // the 48-bit md5 gate row by row with java.security against the
    // DataFrame result — counts AND id-checksums per stratum must agree
    val thr = operators.Relational.Q43Thresholds.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = t.events.select("event_id", "event_type").collect()
      .flatMap { r =>
        val (id, tpe) = (r.getLong(0), r.getString(1))
        val hex = md.digest(s"q43:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
        if (java.lang.Long.parseLong(hex, 16) < thr.getOrElse(tpe, 0L))
          Some(tpe -> id) else None
      }
      .groupBy(_._1)
      .map { case (tpe, rows) => tpe -> (rows.length.toLong, rows.map(_._2).sum) }
    val got = operators.Relational.q43(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("stat.sampleBy API parity: seeded stratified sampling stays " +
    "deterministic and honors zero fractions") {
    // q43's round-8 rebase moved the GRADED query off stat.sampleBy (its
    // RNG stream is engine-private, so no cross-engine oracle can replay
    // it) — but the API itself is part of the surface a reference user
    // would reach for, so keep it exercised at spec level.
    val fractions = Map("purchase" -> 1.0, "view" -> 0.2, "click" -> 0.0)
    def draw() = t.events.stat
      .sampleBy("event_type", fractions, seed = 42L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("event_id").as("checksum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val a = draw()
    val b = draw()
    assert(a == b, "same seed must reproduce the identical sample")
    val totals = t.events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a("purchase")._1 == totals("purchase")) // fraction 1.0 keeps all
    assert(!a.contains("click")) // fraction 0.0 keeps none
    assert(a("view")._1 < totals("view") / 2) // 0.2 stays well under half
  }

  test("d02 minhash candidates verified by d04 exact jaccard") {
    val est = dedup.Dedup.d02(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = dedup.Dedup.d04(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // every high-estimate pair (n_matches/32 >= 0.8) must be genuinely
    // similar
    est.filter(_._2 * 10 >= 32 * 8).keys.foreach { k =>
      assert(exact.contains(k) && exact(k) >= 5000L,
        s"pair $k est>=0.8 but exact_x1e4=${exact.get(k)}")
    }
  }

  test("s01 top-1 for each query vector is itself with sim 1.0") {
    val top1 = similarity.Similarity.s01(t).filter("rn = 1").collect()
    assert(top1.length == 10)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("s02 ANN results are a subset of brute-force candidates per query") {
    val ann = similarity.Similarity.s02(t).collect()
    assert(ann.nonEmpty)
    // self-match must be present for every query that shares its own bucket
    val selfRows = ann.filter(r => r.getLong(0) == r.getLong(1))
    assert(selfRows.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-9))
  }

  test("d06 clusters equal a driver-side union-find over the same pairs") {
    // d06 clusters the d04-verified exact-Jaccard pairs (the round-6
    // rebase) — union-find over that SAME relation, not d02's estimates
    val pairs = dedup.Dedup.d04(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toSeq
      .groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).sorted }
    val got = dedup.Dedup.d06(t).collect()
      .map(r => r.getLong(0) -> r.getString(2).split(",").map(_.toLong).toSeq)
      .toMap
    assert(got.keySet == expected.keySet.map(identity))
    expected.foreach { case (c, ms) => assert(got(c) == ms, s"cluster $c") }
  }

  test("q91 sketch union merges losslessly and lands inside the HLL error " +
    "bound") {
    val r = operators.Analytics.q91(t).head()
    def num(i: Int) = r.get(i).asInstanceOf[Number].doubleValue
    val estUnion = num(1)
    val estDirect = num(2)
    val exact = num(3)
    // HLL register merge is max-per-register, so the union of per-group
    // sketches IS the sketch of the whole table — estimates must agree
    // exactly, not approximately (mergeability is the 100 TB claim)
    assert(estUnion == estDirect,
      s"union estimate $estUnion != direct estimate $estDirect")
    // default lgK=12 → relative standard error ~1.6%; 5σ gate
    assert(math.abs(estUnion - exact) / exact < 0.08,
      s"HLL estimate $estUnion outside error bound of exact $exact")
  }

  test("m03 fingerprint rollup partitions the corpus and bounds uniques") {
    val rows = multimodal.BinaryPipeline.m03(t).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == t.documents.count(),
      s"per-source payload counts must partition the corpus, got $total")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"${r.getString(0)}: unique fingerprints exceed payloads")
      assert(r.getLong(3) > 0, s"${r.getString(0)}: empty byte volume")
    }
  }

  test("d12 curve is monotone in the threshold and anchored to d04 at 0.3") {
    val curve = dedup.Dedup.d12(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.nonEmpty, "threshold curve must have rows at sf0.001")
    // raising the threshold can only shrink the pair set and its blast
    // radius
    curve.sliding(2).foreach {
      case Array((tl, pl, dl), (th, ph, dh)) =>
        assert(tl < th && ph <= pl && dh <= dl,
          s"curve not monotone: ($tl,$pl,$dl) -> ($th,$ph,$dh)")
      case _ =>
    }
    // the 0.3 point IS d04's verified pair set
    assert(curve.head._1 == 3L)
    assert(curve.head._2 == dedup.Dedup.d04(t).count(),
      "curve at threshold 3 must count exactly d04's pairs")
  }

  test("s09 per-query recall equals the s01/s02 set intersection") {
    def byQ(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = byQ(similarity.Similarity.s01(t))
    val approx = byQ(similarity.Similarity.s02(t))
    val got = similarity.Similarity.s09(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (q, ex) =>
      val (k, nHit) = got(q)
      assert(k == ex.size, s"q$q k")
      val expectHit = (ex & approx.getOrElse(q, Set.empty)).size
      assert(nHit == expectHit,
        s"q$q: s09 reports $nHit hits, set intersection has $expectHit")
    }
  }

  test("p02 observed counters equal a dedicated audit recomputation") {
    import org.apache.spark.sql.functions._
    val r = pipeline.PipelineQueries.p02(t).head()
    val audited = pipeline.TrainingDataPipeline.exactDedup(
        pipeline.TrainingDataPipeline.qualityFilter(t.documents))
      .agg(count(lit(1)), coalesce(sum(length(col("text"))), lit(0L)))
      .head()
    assert(r.getLong(0) == audited.getLong(0), "rows_out")
    assert(r.getLong(1) == audited.getLong(1), "total_chars")
    assert(r.getLong(2) == 0L, "null_texts must be zero post-quality-gate")
  }

  test("s10 filtered top-k only returns rows satisfying the predicate and " +
    "never a self-match") {
    val rows = similarity.Similarity.s10(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) % 2 == 0, s"label filter violated: ${r.getInt(2)}")
      assert(r.getLong(0) != r.getLong(1), "self-match in filtered top-k")
    }
    // per-query result counts are capped at k and keys are the query set
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach(g => assert(g.length <= 5))
  }

  test("t26 equals a driver-side DSIR recomputation (hashed buckets, " +
    "Laplace smoothing, quantized log-ratios), doc for doc") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = t.documents.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, text) =>
      text.trim.split("\\s+", -1).map(tok =>
        (id, src, md5hex(tok).substring(0, 2)))
    }
    val cr = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = toks.filter(_._2 == "src0").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    val tr = toks.length.toLong
    val tt = toks.count(_._2 == "src0").toLong
    val lam = cr.map { case (b, c) =>
      val ratio = ((ct.getOrElse(b, 0L) + 1.0) / (tt + 256.0)) *
        ((tr + 256.0) / (c + 1.0))
      b -> BigDecimal(math.log(ratio) * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expect = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.length.toLong, ts.map(x => lam(x._3)).sum)
    }.toMap
    val got = text.TextOps.t26(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got.size == expect.size)
    expect.foreach { case (id, (n, iw)) =>
      val (gn, giw, gkeep) = got(id)
      assert(gn == n, s"doc $id: n_toks $gn != $n")
      assert(giw == iw, s"doc $id: iw_q4 $giw != $iw")
      assert(gkeep == (iw > 0L), s"doc $id: keep flag")
    }
    // the model targets src0, so src0's aggregate per-token evidence
    // must exceed the rest of the corpus's (the DSIR selection signal)
    val bySrc = docs.map(_._2).toSet.map { s: String =>
      val ids = docs.filter(_._2 == s).map(_._1).toSet
      val (nt, iw) = ids.foldLeft((0L, 0L)) { case ((a, b), id) =>
        (a + expect(id)._1, b + expect(id)._2)
      }
      s -> (iw.toDouble / nt)
    }.toMap
    val others = bySrc.filter(_._1 != "src0").values
    assert(bySrc("src0") > others.sum / others.size,
      "src0 per-token evidence must beat the corpus average")
  }

  test("g01 equals a driver-side integer PageRank recomputation on the " +
    "collected graph, node for node") {
    import org.apache.spark.sql.functions.expr
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        expr("l_orderkey = o_orderkey"))
      .select(expr("l_suppkey * 2").as("src"),
        expr("o_custkey * 2 + 1").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val outdeg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = und.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 8) {
      val contribs = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      und.foreach { case (s, d) => contribs(d) += r(s) / outdeg(s) }
      r = r.keys.map(n => n -> (150000L + (850L * contribs(n)) / 1000L)).toMap
    }
    val got = operators.GraphOps.g01(t).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(got.size == r.size, s"node count ${got.size} != ${r.size}")
    r.foreach { case (n, v) =>
      assert(got(n) == v, s"node $n: engine ${got(n)} != reference $v")
    }
    // rank mass: damping pins totals near n·1e6 (truncation loses <1
    // unit per edge per step, identically on any engine)
    val total = got.values.sum
    val n = got.size.toLong
    assert(total > n * 900000L && total < n * 1100000L,
      s"rank mass $total drifted from ${n * 1000000L}")
  }

  test("g02 equals a driver-side 8-round min-label propagation and, " +
    "where converged, the true union-find components") {
    import org.apache.spark.sql.functions.expr
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        expr("l_orderkey = o_orderkey"))
      .select(expr("l_suppkey * 2").as("src"),
        expr("o_custkey * 2 + 1").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var l = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 8) {
      l = l.map { case (n, v) => n -> math.min(v, adj(n).map(l).min) }
    }
    val got = operators.GraphOps.g02(t).collect()
      .map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(got.size == l.size)
    l.foreach { case (n, v) =>
      assert(got(n) == v, s"node $n: engine ${got(n)} != reference $v")
    }
    // independent union-find ground truth: labels that HAVE converged
    // (fixpoint reached in 8 rounds) must equal the true component min
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val compMin = adj.keys.groupBy(find).flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }
    val next = l.map { case (n, v) => n -> math.min(v, adj(n).map(l).min) }
    if (next == l) // converged: the propagation answer IS the components
      compMin.foreach { case (n, m) => assert(got(n) == m, s"node $n") }
  }

  test("g04 equals a driver-side 4-round mode-label propagation with " +
    "(count desc, label asc) ties, community for community") {
    import org.apache.spark.sql.functions.expr
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        expr("l_orderkey = o_orderkey"))
      .select(expr("l_suppkey * 2").as("src"),
        expr("o_custkey * 2 + 1").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    // neighbors ∪ self — the self-loop vote the engine folds into its join
    val adj = und.groupBy(_._1).view
      .mapValues(es => es.map(_._2) :+ es.head._1).toMap
    var l = adj.keys.map(n => n -> n).toMap
    for (round <- 1 to 4) {
      l = l.map { case (n, _) =>
        val votes = adj(n).map(l).groupBy(identity).view
          .mapValues(_.length).toSeq
        // argmax by (count desc, label asc)
        n -> votes.minBy { case (lbl, c) => (-c, lbl) }._1
      }
      // round-1 degeneracy the engine exploits (round-8 rewrite): with
      // identity labels every vote is distinct, so the mode argmax IS
      // plain min over (neighbors ∪ self)
      if (round == 1)
        l.foreach { case (n, lbl) =>
          assert(lbl == (adj(n) :+ n).min,
            s"round-1 mode != min at node $n")
        }
    }
    val expected = l.values.groupBy(identity).map { case (c, vs) =>
      c -> vs.size.toLong
    }
    val members = l.toSeq.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    val got = operators.GraphOps.g04(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == expected.size,
      s"community count ${got.size} != ${expected.size}")
    expected.foreach { case (c, n) =>
      assert(got(c)._1 == n, s"community $c size ${got(c)._1} != $n")
      assert(got(c)._2 == members(c),
        s"community $c member checksum ${got(c)._2} != ${members(c)}")
    }
    // LPA must be strictly coarser than or equal to trivial labeling,
    // and communities can only shrink in count vs node count
    assert(got.size <= l.size)
  }

  test("g05 equals a driver-side 8-round multi-source BFS, hop for hop") {
    import org.apache.spark.sql.functions.expr
    val pairs = t.lineitem.select("l_orderkey", "l_suppkey")
      .join(t.orders.select("o_orderkey", "o_custkey"),
        expr("l_orderkey = o_orderkey"))
      .select(expr("l_suppkey * 2").as("src"),
        expr("o_custkey * 2 + 1").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = adj.keys.filter(n => n % 2 == 0 && n <= 10).toSet
    assert(seeds.nonEmpty, "fixture must contain seed suppliers 1..5")
    // textbook frontier BFS as the independent ground truth (a different
    // algorithm than the engine's synchronous min-plus rounds)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var hop = 0L
    while (frontier.nonEmpty && hop < 8) {
      hop += 1
      val next = frontier.flatMap(adj(_)).filterNot(dist.contains)
      next.foreach(n => dist += n -> hop)
      frontier = next
    }
    val expected = dist.groupBy(_._2).map { case (d, m) =>
      d -> ((m.size.toLong, m.keys.sum))
    }
    val got = operators.GraphOps.g05(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, s"g05 $got != BFS ground truth $expected")
  }

  test("t25 covers every document, bounds n_boiler by n_grams, and " +
    "reports the exact half-up basis-point ratio") {
    val rows = text.TextOps.t25(t).collect()
    assert(rows.length == t.documents.count())
    rows.foreach { r =>
      val (ng, nb, bp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ng >= 1, "whole-text fallback guarantees >=1 gram per doc")
      assert(nb >= 0 && nb <= ng)
      assert(bp == (20000 * nb + ng) / (2 * ng),
        s"doc ${r.getLong(0)}: bp $bp != half-up of $nb/$ng")
    }
  }

  test("t25 flags a planted template phrase: docs sharing a 5-gram in " +
    ">20% of a source are reported boilerplate-positive") {
    import spark.implicits._
    val boiler = "terms of service apply here"
    // 10 docs in one source: 4 share the template 5-gram (40% > 20% and
    // >= 3 docs), 6 are unique filler
    val docs = (0L until 10L).map { i =>
      val text =
        if (i < 4) s"unique lead $i $boiler trailing words $i"
        else s"totally unique filler ${i}a ${i}b ${i}c ${i}d ${i}e ${i}f"
      (i, text, "en", "srcX", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("t25fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = text.TextOps.t25(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L until 4L).foreach(i =>
      assert(out(i) > 0, s"template doc $i reported zero boilerplate grams"))
    (4L until 10L).foreach(i =>
      assert(out(i) == 0, s"unique doc $i falsely flagged"))
  }

  test("s12 MIPS ranks by raw dot product and the norm-augmentation " +
    "reduction to cosine preserves exactly that ranking") {
    val vecs = t.embeddings.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val m2 = vecs.values.map(v => dot(v, v)).max
    val rows = similarity.Similarity.s12(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, g) =>
      // engine top-k must be the driver-side dot-product top-k
      val expect = vecs.keys.filter(_ != q).toSeq
        .map(id => (id, BigDecimal(dot(vecs(id), vecs(q)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (id, ip) => (-ip, id) }.take(5)
      val got = g.sortBy(_.getLong(3)).map(r =>
        (r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect, s"q$q: $got != $expect")
      // the published MIPS→cosine reduction: augment x with
      // sqrt(M²−‖x‖²), query with 0 — augmented cosine is dot(x,q)
      // / (M·‖q‖), a positive monotone map of dot, so the ANN paths
      // (s02–s06) solve MIPS unchanged on the augmented space
      val qn = math.sqrt(dot(vecs(q), vecs(q)))
      if (qn > 0) {
        val augRank = vecs.keys.filter(_ != q).toSeq
          .map { id =>
            val x = vecs(id)
            val cos = dot(x, vecs(q)) / (math.sqrt(m2) * qn)
            (id, cos)
          }
          .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
        val dotRank = vecs.keys.filter(_ != q).toSeq
          .map(id => (id, dot(vecs(id), vecs(q))))
          .sortBy { case (id, d) => (-d, id) }.take(5).map(_._1)
        assert(augRank == dotRank, s"q$q: augmentation broke rank order")
      }
    }
  }

  test("s11 hybrid fusion is exact RRF arithmetic over its reported leg " +
    "ranks, never a self-match, and fused order is (rrf_u desc, doc_id)") {
    val rows = similarity.Similarity.s11(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, d) = (r.getLong(0), r.getLong(1))
      val (bm, vec, rrf) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(q != d, "self-match leaked into the fused list")
      assert(bm >= 0 && bm <= 20 && vec >= 0 && vec <= 20)
      assert(bm > 0 || vec > 0, "a fused row must come from some leg")
      val expect = (if (bm > 0) 1000000000L / (60 + bm) else 0L) +
        (if (vec > 0) 1000000000L / (60 + vec) else 0L)
      assert(rrf == expect, s"q$q d$d: rrf_u $rrf != recomputed $expect")
    }
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length <= 10)
      val sorted = g.sortBy(_.getLong(5))
      assert(sorted.map(_.getLong(5)).toSeq == (1L to g.length).toSeq)
      // fused_rank must be the (rrf_u desc, doc_id asc) order
      val resorted = g.sortBy(r => (-r.getLong(4), r.getLong(1)))
      assert(sorted.map(_.getLong(1)).toSeq == resorted.map(_.getLong(1)).toSeq)
    }
  }

  test("s11 keyword leg ranks by the quantized BM25 score: a doc on both " +
    "legs outranks per-leg later docs after fusion ties break") {
    // structural floor: every query with any keyword hits fuses at least
    // one doc carrying a nonzero bm_rank (the corpus shares vocabulary)
    val rows = similarity.Similarity.s11(t).collect()
    val withBm = rows.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(withBm.nonEmpty, "no query fused any keyword-leg doc")
  }

  test("w07 rewrites only the target partition: purge applied, every " +
    "other partition's files byte-untouched") {
    import org.apache.spark.sql.functions._
    val (dir, target, untouched) = operators.CatalogOps.w07Layout(t)
    assert(untouched,
      "dynamic overwrite must not rewrite non-target partition files")
    val back = spark.read.parquet(dir)
    assert(back.filter(col("dt") === lit(target) &&
      col("event_type") === "error").count() == 0,
      s"target partition $target must hold no purged rows")
    // non-target partitions keep every raw row
    val rawOther = t.events
      .filter(to_date(col("ts")) =!= lit(target)).count()
    val backOther = back.filter(col("dt") =!= lit(target)).count()
    assert(backOther == rawOther,
      s"non-target rows $backOther != raw $rawOther")
  }

  test("st09 streaming observed counters equal the batch audit") {
    import org.apache.spark.sql.functions._
    val r = streaming.StreamQueries.st09(spark, t.dir).head()
    val batch = t.events.agg(
      count(lit(1)),
      coalesce(sum(expr("cast(round(value * 100) as bigint)")), lit(0L)),
      coalesce(sum(when(col("value") < 0, 1L).otherwise(0L)), lit(0L)))
      .head()
    assert(r.getLong(0) == batch.getLong(0), "n_events")
    assert(r.getLong(1) == batch.getLong(1), "sum_value_cents")
    assert(r.getLong(2) == batch.getLong(2), "n_negative")
  }

  test("multi-probe raises recall over single-probe LSH vs exact ground truth") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(similarity.Similarity.s01(t))
    val single = pairs(similarity.Similarity.s02(t))
    val multi = pairs(similarity.Similarity.s04(t))
    val rSingle = (single & exact).size.toDouble / exact.size
    val rMulti = (multi & exact).size.toDouble / exact.size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti < single-probe $rSingle")
    // synthetic vectors are near-orthogonal, so exact top-5 "neighbors"
    // are weakly locality-sensitive — recall floor is modest at this SF
    assert(rMulti >= 0.2, s"multi-probe recall unexpectedly low: $rMulti")
  }
}
