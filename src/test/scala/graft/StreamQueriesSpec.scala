package graft

import graft.operators.Relational
import graft.streaming.StreamQueries
import org.scalatest.funsuite.AnyFunSuite

/** st01/st02 end-to-end: the full streaming engine path (FileStreamSource
  * → AvailableNow micro-batches → state store → sink) must reproduce the
  * batch twins' results EXACTLY on the driver testdata — same guarantee
  * the driver's DuckDB gate checks, proven here at sf0.001 row-for-row.
  */
class StreamQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("st01 streaming window agg equals batch q30 exactly") {
    val streamed = StreamQueries.st01(spark, TestSpark.sfDir)
    val batch = Relational.q30(TestSpark.tables)
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st02 streaming sessionization equals batch q31 exactly") {
    val streamed = StreamQueries.st02(spark, TestSpark.sfDir)
    val batch = Relational.q31(TestSpark.tables)
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st03 streaming dedup+count equals batch count-distinct exactly") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.st03(spark, TestSpark.sfDir)
    val batch = TestSpark.tables.events
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st04 streaming interval join equals the batch self-join exactly") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.st04(spark, TestSpark.sfDir)
    val ev = TestSpark.tables.events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st10 streaming curation gates equal the batch quality∘dedup " +
    "composition exactly") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.st10(spark, TestSpark.sfDir)
    val batch = graft.pipeline.TrainingDataPipeline
      .qualityFilter(TestSpark.tables.documents)
      .select(col("source"),
        graft.functions.exprs.canon_fp(col("text")).as("fp"))
      .distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"))
      .orderBy("source")
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st06 transformWithState totals equal the batch rollup exactly") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.st06(spark, TestSpark.sfDir)
    val batch = TestSpark.tables.events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_value_cents"))
      .orderBy("user_id")
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
    // the RocksDB provider override must not leak into the session
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").exists(_.contains("RocksDB")))
  }

  test("st07 streaming left-outer join equals the batch LEFT JOIN exactly " +
    "(null-side rows included)") {
    import org.apache.spark.sql.functions._
    val streamed = StreamQueries.st07(spark, TestSpark.sfDir)
    val ev = TestSpark.tables.events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("p_ts")).as("n_matched"))
      .orderBy("user_id")
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
    // the gate is only meaningful if eviction actually emitted null-side
    // rows: some click must be unmatched (n_rows > n_matched)
    val unmatched = streamed.filter(col("n_rows") > col("n_matched")).count()
    assert(unmatched > 0,
      "no unmatched clicks — the null-side flush path was not exercised")
  }

  test("st08 flatMapGroupsWithState sessionization equals the batch q31 " +
    "summary (timeout flush of trailing open sessions included)") {
    val streamed = StreamQueries.st08(spark, TestSpark.sfDir)
    val batch = operators.Relational.q31(TestSpark.tables)
    assert(streamed.columns.toSeq == batch.columns.toSeq)
    val (s, b) = (canon(streamed), canon(batch))
    assert(s.nonEmpty && s == b)
  }

  test("st01 reruns get fresh sinks (bench reruns each query)") {
    val a = canon(StreamQueries.st01(spark, TestSpark.sfDir))
    val b = canon(StreamQueries.st01(spark, TestSpark.sfDir))
    assert(a == b)
  }
}
