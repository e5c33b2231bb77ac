package graft.dedup

import graft.Tables
import graft.functions.exprs._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the LLM-pipeline dedup
  * operators (SURVEY §2 d02–d04; exact dedup d01 lives in text.TextOps).
  *
  * Shape at 100 TB:
  *  - Signatures (MinHash k=32 / SimHash64) are computed by single-pass
  *    codegen'd Catalyst expressions (graft.functions) — map-only.
  *  - Candidate generation is LSH banding: equi-join on (band_id, band
  *    signature), so shuffle volume is O(rows × bands), never O(pairs).
  *  - Hot buckets (boilerplate text at web scale) would blow up the
  *    within-bucket self-join quadratically: buckets larger than
  *    MaxBucket are dropped, the standard web-dedup guard (those pairs
  *    are caught by the other bands with high probability).
  *  - Verification (exact n-gram Jaccard) runs only on the candidate
  *    pairs, joined back to shingle sets.
  */
object Dedup {

  private val K = 32          // MinHash permutations
  private val Bands = 8       // LSH bands of 4 rows each
  private val RowsPerBand = K / Bands
  private val Seed = 42L
  private val MaxBucket = 64  // hot-bucket guard
  private val MinEstJaccard = 0.5
  private val MaxHamming = 8

  private def tokensCol = expr("split(trim(text), '\\\\s+')")

  /** Word 3-gram shingles (whole text as one shingle for tiny docs). */
  private def shinglesCol = expr(
    """CASE WHEN size(toks) >= 3
      | THEN transform(sequence(1, size(toks) - 2),
      |                i -> concat_ws(' ', slice(toks, i, 3)))
      | ELSE array(concat_ws(' ', toks)) END""".stripMargin)

  /** doc_id, sig (MinHash), exploded LSH bands → (band_id, band_sig). */
  private def banded(t: Tables): DataFrame = {
    val sigs = t.documents
      .withColumn("toks", tokensCol)
      .select(col("doc_id"), minhash_sigs(shinglesCol, K, Seed).as("sig"))
    val bandArr = array((0 until Bands).map(b =>
      slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)): _*)
    sigs.select(col("doc_id"), col("sig"),
      posexplode(bandArr).as(Seq("band_id", "band_sig")))
  }

  /** d02 — MinHash+LSH candidate pairs with estimated Jaccard. */
  def d02(t: Tables): DataFrame = {
    val b = banded(t)
    val counts = b.groupBy("band_id", "band_sig")
      .agg(count(lit(1)).as("bucket_n"))
    val kept = b.join(counts, Seq("band_id", "band_sig"))
      .filter(col("bucket_n") <= MaxBucket)
    val a = kept.select(col("band_id"), col("band_sig"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val c = kept.select(col("band_id"), col("band_sig"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(c, Seq("band_id", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccard_est(col("sig_a"), col("sig_b")).as("est"))
      .distinct()
      .filter(col("est") >= MinEstJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("est"), 4).as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** d03 — SimHash near-dup candidates: 4×16-bit chunk banding, exact
    * hamming verification via bit_count(xor). */
  def d03(t: Tables): DataFrame = {
    val sh = t.documents
      .withColumn("toks", tokensCol)
      .select(col("doc_id"), simhash64(col("toks")).as("sh"))
    val chunks = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk_id", "chunk_val")))
    val a = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("chunk_id"), col("chunk_val"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= MaxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** d04 — exact n-gram Jaccard verification of the MinHash candidates
    * (LSH recall, exact precision). */
  def d04(t: Tables): DataFrame = {
    val b = banded(t)
    val cands = {
      val a = b.select(col("band_id"), col("band_sig"), col("doc_id").as("doc_a"))
      val c = b.select(col("band_id"), col("band_sig"), col("doc_id").as("doc_b"))
      a.join(c, Seq("band_id", "band_sig"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    }
    val sets = t.documents
      .withColumn("toks", tokensCol)
      .select(col("doc_id"), array_distinct(shinglesCol).as("grams"))
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("grams").as("g_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("grams").as("g_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("g_a"), col("g_b"))) * 1.0 /
          size(array_union(col("g_a"), col("g_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  val queries: Map[String, Tables => DataFrame] = Map(
    "d02_dedup_minhash" -> d02,
    "d03_dedup_simhash" -> d03,
    "d04_ngram_jaccard" -> d04)

  /** MinHash/SimHash pipelines are not ANSI-SQL-expressible (custom hash
    * kernels) → driver records rows-only checks; determinism is guaranteed
    * by fixed seeds + sorted output. */
  val oracles: Map[String, String] = Map.empty
}
