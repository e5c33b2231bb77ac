package graft

import org.apache.spark.sql.SparkSession

/** Front-door session builder with the engine's recommended configuration:
  * AQE (runtime coalescing + skew-join splitting), sane local shuffle
  * parallelism, UTC, and the graft SQL functions registered.
  *
  * On a cluster, pass the real master/shuffle-partition count (a common
  * starting point is 2–3× total executor cores; AQE coalesces down).
  */
object GraftSession {
  def build(master: String = "local[*]",
            shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // incremental partitioned writes must only replace the partitions
      // they produce (the default STATIC overwrite deletes the whole
      // table root); the writer also requests this per-write
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // read TIMESTAMP(NANOS) parquet as long once, session-wide (the
      // Tables facade rebuilds microsecond timestamps from it)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    // getOrCreate may return a pre-existing session whose extensions were
    // fixed at creation; registering directly makes the functions available
    // either way.
    functions.GraftExtensions.register(spark)
    spark
  }
}
