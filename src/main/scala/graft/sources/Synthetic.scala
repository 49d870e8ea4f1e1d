package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for benchmark/recall harnesses.
  *
  * The driver testdata's `embeddings` table is near-random (same-label
  * and cross-label cosine both ≈ 0), so ANN recall on it mostly
  * measures the probed fraction, not retrieval quality. The CLUSTERED
  * corpus here plants well-separated Gaussian-ish clusters so recall
  * floors become meaningful: a bucketed/multiprobe/IVF search that
  * cannot find within-cluster neighbors on this data is broken, full
  * stop.
  *
  * Construction is pure column expressions and fully deterministic —
  * no RNG state, no seed plumbing: center(c,d) and noise(i,d) come
  * from the classic fract(sin(x)·43758.5453) hash, so the same
  * (n, dim, clusters, noise) always writes byte-identical vectors,
  * and generation is embarrassingly parallel over `spark.range`.
  */
object Synthetic {

  /** fract(sin(x)·43758.5453)·2−1 ∈ [−1, 1) — the shader-folklore
    * pseudo-random hash, good enough for planted geometry.
    */
  private def sinHash(x: Column): Column = {
    val s = sin(x) * lit(43758.5453123)
    (s - floor(s)) * 2 - 1
  }

  /** Planted-cluster embeddings with the testdata schema
    * (vec_id long, embedding array&lt;float&gt;[dim], label long = the
    * planted cluster id — ground truth, unlike the testdata's
    * decorative label). Expected geometry at the defaults: center
    * coords uniform in [−1,1) (‖center‖² ≈ dim/3), per-dim noise
    * amplitude `noise` → within-cluster cosine ≈ 0.9, cross-cluster
    * ≈ 0 — separated, not degenerate.
    */
  def clusteredEmbeddings(spark: SparkSession, n: Long, dim: Int = 64,
      clusters: Int = 20, noise: Double = 0.25): DataFrame = {
    val c = (col("id") % clusters).cast("double")
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (sinHash(c * lit(97.131) + d * lit(31.717) + lit(0.5)) +
          lit(noise) * sinHash(col("id").cast("double") * lit(12.9898)
            + d * lit(78.233) + lit(1.5))).cast("float")).as("embedding"),
      (col("id") % clusters).as("label"))
  }

  /** Write a clustered corpus dir consumable by [[Tables]] (only the
    * embeddings table — the ANN/recall queries read nothing else).
    */
  def writeClusteredCorpus(spark: SparkSession, dir: String, n: Long,
      dim: Int = 64, clusters: Int = 20, noise: Double = 0.25): Unit =
    clusteredEmbeddings(spark, n, dim, clusters, noise)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
}
