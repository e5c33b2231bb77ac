package graft

import java.nio.file.Files

/** A tiny fixture corpus written as parquet and read through the same
  * `Tables` facade the production pipelines use. Shared by the dedup and
  * similarity fixture specs: known near-duplicate documents (planted
  * pairs and a 3-doc chain) and embedding vectors (a planted identical
  * pair + near-copy), so operator outputs can be checked against
  * expectations computed directly from the golden-pinned kernels.
  */
object FixtureData {

  private val base = "large scale web corpus deduplication removes near " +
    "duplicate documents from training data pipelines at massive scale " +
    "every day across shards"

  /** 6 docs: 1–2 near-dups (last token differs), 7 near-dup of 1 (middle
    * token differs) forming a chain, 3–4 exact dups, 5 unrelated. */
  val docTexts: Seq[(Long, String)] = Seq(
    1L -> base,
    2L -> (base.dropRight(1) + "z"),
    3L -> ("identical fixture document with exactly the same tokens in " +
      "every copy stored twice for exact duplication checks"),
    4L -> ("identical fixture document with exactly the same tokens in " +
      "every copy stored twice for exact duplication checks"),
    5L -> ("completely unrelated text about cooking pasta with tomato " +
      "sauce and fresh basil leaves in a small kitchen"),
    7L -> base.replace("massive", "gigantic"))

  /** 149 16-dim vectors (ids 0–148, so the s03 centroid filter
    * vec_id % 37 == 0 selects 5 inverted lists and NProbe=4 must choose).
    * vec 11 is an exact copy of 10, vec 12 a near-copy. */
  val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(99)
    def rv() = Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    val raw = (0L to 148L).map(i => i -> rv()).toMap
    val ten = raw(10L)
    val near = ten.zipWithIndex.map { case (v, i) => if (i == 0) v + 0.05f else v }
    (0L to 148L).map {
      case 11L => 11L -> ten.clone()
      case 12L => 12L -> near
      case i   => i -> raw(i)
    }
  }

  lazy val tables: Tables = {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fixture-tables").toString
    docTexts.map { case (id, text) =>
      (id, text, "en", s"src$id", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  /** Spark's round(double, 4): HALF_UP on the shortest decimal repr. */
  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
}
