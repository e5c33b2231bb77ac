package graft

import java.nio.file.Files

import graft.sources.{Compactor, CsvSource, JsonLinesSource, PartitionedWriter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = TestSpark.tables

  test("CsvSource reads header csv with explicit schema (OpenCSVSerde analog)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "id,name,amount\n1,alpha,10.5\n2,beta,20.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("amount", DoubleType)))
    val df = CsvSource.read(spark, dir, schema)
    assert(df.count() == 2)
    assert(df.filter("name = 'beta'").head().getDouble(2) == 20.25)
  }

  test("JsonLinesSource parses jsonl, quarantining corrupt lines instead of failing") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(java.nio.file.Path.of(dir, "docs.jsonl"),
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "hallo welt", "lang": "de"}
        |{not valid json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = JsonLinesSource.read(spark, dir, schema).cache()
    assert(df.filter(col("_corrupt").isNull).count() == 2)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    assert(df.filter("doc_id = 2").head().getString(1) == "hallo welt")
    // roundtrip the clean subset
    val out = Files.createTempDirectory("graft-jsonl-out").toString
    JsonLinesSource.write(df.filter(col("_corrupt").isNull).drop("_corrupt"), out)
    assert(spark.read.json(out).count() == 2)
    df.unpersist()
  }

  test("writePartitioned lays out yr=/mnth= dirs and readback prunes partitions") {
    val dir = Files.createTempDirectory("graft-part").toString
    PartitionedWriter.cleanedPartitionedETL(t, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() > 0)
    assert(back.select("yr").distinct().head().getInt(0) == 1996)
    // partition dirs exist on disk
    val yrDirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("yr="))
    assert(yrDirs.nonEmpty)
    // partition filter prunes: plan should not list every mnth partition
    val plan = back.filter(col("mnth") === 3).queryExecution.executedPlan.toString
    assert(back.filter(col("mnth") === 3).count() > 0)
    assert(!plan.contains("mnth=7"))
  }

  test("mergeSchema read unifies evolved schemas across parquet batches") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "text").write.parquet(dir + "/batch=1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang").write.parquet(dir + "/batch=2")
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.toSet == Set("id", "text", "lang", "batch"))
    // old rows surface the new column as null instead of failing
    assert(back.filter(col("lang").isNull).count() == 1)
    assert(back.count() == 2)
  }

  test("Compactor rewrites a many-small-files dir into few target-size files") {
    val small = Files.createTempDirectory("graft-small").toString
    val compacted = Files.createTempDirectory("graft-compacted").toString
    t.lineitem.limit(20000).repartition(40).write.mode("overwrite").parquet(small)
    val (before, after) = Compactor.compact(spark, small, compacted,
      targetBytes = 4L << 20)
    assert(before == 40)
    assert(after < before, s"expected compaction, got $before -> $after")
    assert(spark.read.parquet(compacted).count() ==
      spark.read.parquet(small).count())
  }

  test("ORC roundtrip (the reference's STORED AS ORC + SNAPPY)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    PartitionedWriter.cleanedPartitionedETL(t, dir, format = "orc")
    val back = spark.read.orc(dir)
    assert(back.count() > 0)
    assert(back.columns.contains("l_extendedprice"))
    // query-surface equality: the same aggregation over the ORC read and
    // over the parquet source must agree (the ORC path is a first-class
    // input, not just a sink)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      .orderBy("l_returnflag")
      .collect().toSeq
    val viaParquet = {
      val p = Files.createTempDirectory("graft-etl-parquet").toString
      PartitionedWriter.cleanedPartitionedETL(t, p, format = "parquet")
      agg(spark.read.parquet(p))
    }
    assert(agg(back) == viaParquet)
  }

  test("Compactor sizes output from a partitioned (nested) layout") {
    val small = Files.createTempDirectory("graft-small-part").toString
    val compacted = Files.createTempDirectory("graft-compacted-part").toString
    // partitioned write nests data files under lang=... dirs — a
    // non-recursive listing would see 0 data files and collapse everything
    // into one output file regardless of size
    t.documents.repartition(8).write.mode("overwrite")
      .partitionBy("lang").parquet(small)
    // size the target from the MEASURED input so the >1-file assertion
    // can't flake if testdata or parquet overhead changes: total/3 bytes
    // per file forces ~3 output files whatever the corpus size
    val total = java.nio.file.Files.walk(java.nio.file.Paths.get(small))
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .mapToLong(p => java.nio.file.Files.size(p)).sum()
    val (before, after) = Compactor.compact(spark, small, compacted,
      targetBytes = math.max(1L, total / 3))
    assert(before > 0, "recursive listing must find nested data files")
    assert(after > 1, s"output should be sized from real bytes, got $after file(s)")
    assert(spark.read.parquet(compacted).count() ==
      spark.read.parquet(small).count())
  }

  test("joining two co-bucketed tables plans no shuffle (the point of CLUSTERED BY)") {
    val o = t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = t.lineitem.select(col("l_orderkey"), col("l_quantity"))
    PartitionedWriter.writeBucketedTable(o, "g_orders_b", Seq.empty, "o_orderkey", 8)
    PartitionedWriter.writeBucketedTable(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "g_line_b", Seq.empty, "o_orderkey", 8)
    val joined = spark.table("g_orders_b")
      .join(spark.table("g_line_b"), "o_orderkey")
      .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed join: no shuffle before the join (only the final agg may
    // exchange)
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join should not shuffle on the bucket key:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE g_orders_b"); spark.sql("DROP TABLE g_line_b")
  }

  test("writeBucketedTable persists a 5-bucket sorted table (reference's clustered ORC)") {
    val cleaned = t.lineitem.limit(1000)
      .withColumn("yr", year(col("l_shipdate")))
    PartitionedWriter.writeBucketedTable(
      cleaned, "graft_bucketed_test", Seq.empty, "l_extendedprice", 5)
    val back = spark.table("graft_bucketed_test")
    assert(back.count() == 1000)
    val desc = spark.sql("DESCRIBE EXTENDED graft_bucketed_test").collect().map(_.mkString(" "))
    assert(desc.exists(_.contains("5")), "bucket spec recorded")
    spark.sql("DROP TABLE graft_bucketed_test")
  }

  test("zorderWrite clusters BOTH columns into narrow per-file ranges") {
    // per-file value span of a column, summed over files: the proxy for
    // how much a min/max-pruned scan can skip
    def spanSum(path: String, c: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(sum(col("span"))).head().getLong(0)

    val li = t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val plainDir = Files.createTempDirectory("graft-plain").toString
    graft.sources.PartitionedWriter.zorderWrite(li, "l_partkey", "l_suppkey", zDir, 8)
    li.repartition(8).write.mode("overwrite").parquet(plainDir)

    assert(spark.read.parquet(zDir).count() == li.count())
    // z-order must beat round-robin layout on BOTH dimensions — that is
    // the whole point vs a single-column sort
    assert(spanSum(zDir, "l_partkey") < (spanSum(plainDir, "l_partkey") * 0.8).toLong,
      "partkey ranges not clustered")
    assert(spanSum(zDir, "l_suppkey") < (spanSum(plainDir, "l_suppkey") * 0.8).toLong,
      "suppkey ranges not clustered")
  }
}
