package graft

import java.nio.file.Files

import graft.pipeline.TrainingDataPipeline
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = TestSpark.tables

  test("full curation pipeline: quality → exact dedup → near-dup → write") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val stats = TrainingDataPipeline.run(t, out)
    assert(stats.input == 500)
    assert(stats.afterQuality <= stats.input && stats.afterQuality > 0)
    assert(stats.afterExact <= stats.afterQuality)
    assert(stats.afterNearDup <= stats.afterExact)
    // near-dup stage removes the planted near-duplicates found by d02
    val planted = dedup.Dedup.d02(t).count()
    if (planted > 0) assert(stats.afterNearDup < stats.afterExact)
    // partitioned-by-lang layout on disk, readable back
    val back = spark.read.parquet(out)
    assert(back.count() == stats.afterNearDup)
    assert(back.select("lang").distinct().count() == 5)
  }

  test("observe metrics accumulate data-quality counters during the job") {
    val df = TrainingDataPipeline.curatedWithMetrics(t)
    // the metrics belong to the QueryExecution that ran the action, so
    // drive THIS plan (count() would build a separate execution)
    val n = df.collect().length.toLong
    val metrics = df.queryExecution.observedMetrics("curation_dq")
    assert(metrics.getAs[Long]("rows_out") == n)
    assert(metrics.getAs[Long]("total_chars") > 0)
    assert(metrics.getAs[Long]("null_texts") == 0)
  }
}
