package graft

import org.apache.spark.sql.SparkSession

/** One-off executed-plan dumper for g01's inner plan — NOT committed. */
object ScratchDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (plan, caches) = operators.GraphOps.g01Plan(Tables(spark, sfDir))
    plan.queryExecution.toRdd.foreach(_ => ())
    val s = plan.queryExecution.executedPlan.toString
    println("DUMPSTART")
    val ex = "Exchange hashpartitioning\\(([a-z]+)#".r
    println("hash exchanges by column: " +
      ex.findAllMatchIn(s).map(_.group(1)).toSeq.groupBy(identity)
        .map { case (k, v) => s"$k=${v.size}" }.mkString(", "))
    println("reused: " + "ReusedExchange".r.findAllIn(s).length +
      "  shj: " + "ShuffledHashJoin".r.findAllIn(s).length +
      "  bhj: " + "BroadcastHashJoin".r.findAllIn(s).length)
    println(s)
    caches.foreach(_.unpersist())
    spark.stop()
  }
}
