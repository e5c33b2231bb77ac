package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface mirroring the reference's data loading and ETL sink.
  *
  * Reference (Surabhi_Srinath_NYC_Taxi_Assignment_FInal.txt):
  *  - lines 31–55: external CSV table via OpenCSVSerde, explicit schema,
  *    `skip.header.line.count=1` → [[CsvSource.read]]
  *  - lines 252–278: ORC table PARTITIONED BY (yr, mnth), CLUSTERED/SORTED
  *    BY tip_amount INTO 5 BUCKETS, SNAPPY → [[PartitionedWriter]]
  */
object CsvSource {

  /** CSV with header + explicit schema (never infer at scale — schema
    * inference is an extra full scan of 100 TB). */
  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
}

object Compactor {

  /** Small-file compaction: rewrite a columnar directory into files of
    * ~targetBytes each. At 100 TB the small-file problem (per-micro-batch
    * streaming sinks, over-parallel writers) dominates NameNode/listing
    * and scan-planning cost; periodic compaction is standard table
    * maintenance. Output file count = ceil(totalBytes / targetBytes);
    * round-robin repartition balances rows regardless of input skew.
    * Writes to `outPath` (never in-place — readers of `inPath` are
    * unaffected until the catalog/pointer swap). Returns (filesBefore,
    * filesAfter). */
  /** Recursively enumerate data files under `p` (skips hidden/_metadata
    * files and anything inside hidden dirs like `_temporary`). Recursion
    * matters: partitioned layouts nest data files under partition dirs, and
    * a top-level-only listing would see zero files → sizing degenerates to
    * a single output file. */
  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val it = fs.listFiles(p, /* recursive = */ true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(p.toUri.getPath)
      val hidden = rel.split('/').exists(seg =>
        seg.startsWith("_") || seg.startsWith("."))
      if (s.isFile && !hidden) buf += s
    }
    buf.result()
  }

  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20,
              format: String = "parquet"): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inFiles = dataFiles(fs, hPath)
    require(inFiles.nonEmpty, s"Compactor: no data files found under $inPath")
    val totalBytes = inFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.format(format).load(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .format(format)
      .save(outPath)
    val outFiles = dataFiles(fs, new org.apache.hadoop.fs.Path(outPath))
    (inFiles.length, outFiles.length)
  }
}

object JsonLinesSource {

  /** JSON-lines (one object per line — the de-facto web-crawl / training
    * corpus interchange format) with an explicit schema. PERMISSIVE mode
    * routes malformed lines into `_corrupt` instead of failing the job —
    * at 100 TB there WILL be corrupt lines, and a fail-fast read loses the
    * whole task. Callers filter `_corrupt IS NULL` for the clean set and
    * can quarantine the rest. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Line-delimited JSON write (gzip — splittable formats beat it at
    * scale, but jsonl interchange is usually consumed whole-file). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
}

object PartitionedWriter {

  /** Partitioned columnar write (parquet/orc), the reference's
    * PARTITIONED BY (yr, mnth). `maxRecordsPerFile` guards the small-file /
    * giant-file extremes; dynamic partition overwrite only rewrites the
    * partitions present in `df` — it must be REQUESTED explicitly (the
    * per-write option below): Spark's default is STATIC, which deletes
    * the entire output path, destroying partitions absent from `df` on
    * any incremental run. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       format: String = "parquet",
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)

  /** Partitioned + bucketed + sorted table, the reference's CLUSTERED BY
    * (tip_amount) SORTED BY (tip_amount) INTO 5 BUCKETS. Bucketing
    * requires the catalog (saveAsTable); co-locates future joins/aggs on
    * the bucket column with zero shuffle. */
  def writeBucketedTable(df: DataFrame, table: String,
                         partitionCols: Seq[String],
                         bucketCol: String, nBuckets: Int = 5,
                         format: String = "parquet"): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format(format)
      .saveAsTable(table)

  /** Z-order (Morton) clustered layout: interleave the bits of two
    * numeric columns and range-partition + sort on the interleaved value,
    * so every output file covers a NARROW range in BOTH columns — parquet
    * min/max row-group stats then prune scans filtered on EITHER column,
    * which a single-column sort only gives you for its leading column.
    * This is the data-skipping layout trick for multi-dimensional
    * predicates at 100 TB (the same idea behind lakehouse OPTIMIZE
    * ZORDER BY).
    *
    * Columns are linearly scaled to 16 bits from their observed min/max
    * (one tiny agg job); production tables with skewed distributions
    * would quantile-scale instead. The bit-spreading is plain integer
    * arithmetic — codegen'd, map-only; the only shuffle is the range
    * partitioner's. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
                  numFiles: Int = 8): Unit = {
    def spread16(c: Column): Column = {
      var x = c.bitwiseAND(lit(0xFFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    }
    val Row(lo1: Long, hi1: Long, lo2: Long, hi2: Long) = df.agg(
      min(col(c1).cast("long")), max(col(c1).cast("long")),
      min(col(c2).cast("long")), max(col(c2).cast("long"))).head()
    def scaled(c: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      // scale in double: (x-lo)*65535 in long arithmetic overflows for
      // ranges wider than 2^63/65535 (epoch-nano columns); the double
      // path loses only sub-bucket precision, which the 16-bit
      // quantization discards anyway
      else ((col(c).cast("double") - lit(lo.toDouble)) * lit(65535.0)
        / lit((hi - lo).toDouble)).cast("long")
    val z = spread16(scaled(c1, lo1, hi1).cast("long"))
      .bitwiseOR(shiftleft(spread16(scaled(c2, lo2, hi2).cast("long")), 1))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(path)
  }

  /** The reference's full ETL: clean lineitem⨝orders rows → derived
    * (yr, mnth) partitions (ref lines 264–271). */
  def cleanedPartitionedETL(t: graft.Tables, path: String,
                            format: String = "parquet"): Unit = {
    val dh = (unix_timestamp(col("l_shipdate")) -
      unix_timestamp(col("o_orderdate"))) / 3600.0
    val cleaned = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("dh", dh)
      .filter(col("dh") >= 0 && col("dh") <= 8760 &&
        col("l_tax").isin(0.0, 0.02, 0.04, 0.06, 0.08) &&
        col("l_quantity") > 0 && col("l_discount") >= 0 &&
        col("l_extendedprice") >= 0 && year(col("l_shipdate")) === 1996)
      .withColumn("yr", year(col("l_shipdate")))
      .withColumn("mnth", month(col("l_shipdate")))
      .drop("dh")
    writePartitioned(cleaned, path, Seq("yr", "mnth"), format)
  }
}
