package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.operators.{Bpe, Pca, Relational3, Similarity, UnigramLm}

/** r13 gate class: the six formerly-rows-only trained/probabilistic
  * queries are now verdict grids the driver hash-compares against an
  * oracle-re-derived constant-true grid. The driver proves the grids
  * at sf0.01; this spec proves the VERDICTS also hold at the tiny
  * sf0.001 — a tolerance that only clears at one corpus size is a
  * tuned constant, not a property. (The grid LABELS are covered by
  * the driver's hash compare; here only the booleans matter.)
  */
class GateGridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = Tables(spark, TestSpark.sf)

  private def allTrue(df: org.apache.spark.sql.DataFrame, boolCols: Seq[String]): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty, "gate grid is empty")
    boolCols.foreach { c =>
      val idx = df.schema.fieldIndex(c)
      val bad = rows.filterNot(_.getBoolean(idx))
      assert(bad.isEmpty, s"gate column $c has false verdicts: ${bad.take(3).mkString("; ")}")
    }
  }

  test("q_approx_distinct: every per-group estimate within 10% of exact") {
    allTrue(Relational3.qApproxDistinct(t), Seq("within_tol"))
  }

  test("embed_ivf_kmeans: every vector's assigned cell is the argmin over the trained centroids") {
    allTrue(Similarity.ivfKmeansGate(t), Seq("assign_ok"))
  }

  test("embed_pq_opq: rotation orthonormal per subspace; balanced allocation dominates contiguous") {
    allTrue(Pca.opqGate(t), Seq("ortho_ok", "balance_ok"))
  }

  test("bpe_train_fast: fast-trained table encodes within 5% of the sequential table") {
    allTrue(Bpe.bpeTrainFastGate(t), Seq("quality_within_tol"))
  }

  test("unigram_lm_train: charset coverage, count-consistent log-probs, normalization, vocab bound") {
    allTrue(UnigramLm.trainGate(t), Seq("ok"))
  }

  test("unigram_encode: full-corpus reconstruction and compression per length bucket") {
    allTrue(UnigramLm.encodeGate(t), Seq("reconstruct_ok", "compress_ok"))
  }
}
