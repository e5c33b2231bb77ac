package graft

import org.apache.spark.sql.SparkSession

/** Plan audit tool: prints the formatted physical plan for each named
  * query (all queries if none named). Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  * With SPARK_GRAFT_EXPLAIN_RUN=1 the query is EXECUTED first and the
  * final adaptive plan is printed instead — this is where AQE's runtime
  * decisions (ReusedExchange/stage reuse, skew splits, bhj conversions)
  * become visible; the static plan hides them.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val run = sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (run) {
        df.queryExecution.toRdd.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
