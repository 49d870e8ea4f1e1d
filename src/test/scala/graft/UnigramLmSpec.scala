package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLm

/** Contract spec for the unigram-LM tokenizer trainer (rows-only at
  * the gate — EM has no SQL twin): segmentation correctness, coverage,
  * compression on planted structure, and run-to-run determinism.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wf(rows: (String, Long)*) = rows.toDF("word", "freq")

  test("segment: Viterbi picks the higher-probability decomposition") {
    // lp(ab) beats lp(a)+lp(b): one piece wins
    val lp = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0)
    assert(UnigramLm.segment("abab", lp, maxLen = 4) == List("ab", "ab"))
    // without the multi-symbol piece it falls back to symbols
    assert(UnigramLm.segment("abab", lp - "ab", maxLen = 4) == List("a", "b", "a", "b"))
  }

  test("segment: supplementary-plane symbols are one unit, not two surrogates") {
    val g = new String(Character.toChars(0x1D11E)) // musical G clef
    val lp = Map(g -> -1.0, "x" -> -1.0)
    assert(UnigramLm.segment(s"$g x$g".replace(" ", ""), lp, maxLen = 2)
      == List(g, "x", g))
  }

  test("train: planted repetition grows multi-symbol pieces; encode compresses") {
    val words = wf(("ababab", 100L), ("abab", 80L), ("ab", 60L), ("ba", 5L))
    val inv = UnigramLm.trainOf(words, targetVocab = 8, seedSize = 20,
      maxPieceLen = 3, rounds = 3)
    val pieces = inv.select("piece").as[String].collect().toSet
    assert(pieces.exists(p => p.length > 1 && p.contains("ab")),
      s"no multi-symbol ab-piece in $pieces")
    val enc = UnigramLm.encodeOf(words, inv, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getString(2)))
    val per = enc.groupBy(_._1).view.mapValues(_.length).toMap
    assert(per("ababab") < 6, s"encode did not compress: $per") // fewer pieces than symbols
    // reconstruction: pieces concatenate back to every word
    enc.groupBy(_._1).foreach { case (w, ps) =>
      assert(ps.map(_._2).mkString == w, s"pieces of $w do not reconstruct")
    }
  }

  test("train: every corpus symbol survives as a single-symbol piece (coverage floor)") {
    val words = wf(("xyzzy", 10L), ("qq", 1L), ("z", 1L))
    val inv = UnigramLm.trainOf(words, targetVocab = 5, seedSize = 4,
      maxPieceLen = 3, rounds = 3)
    val singles = inv.filter(col("n_syms") === 1)
      .select("piece").as[String].collect().toSet
    assert(Set("x", "y", "z", "q").subsetOf(singles), s"missing symbols: $singles")
  }

  test("train: deterministic run-to-run") {
    val words = wf(("hashjoin", 40L), ("hash", 30L), ("join", 30L), ("scan", 9L))
    def run() = UnigramLm.trainOf(words, targetVocab = 10, seedSize = 30,
      maxPieceLen = 4, rounds = 3).collect().map(_.toSeq).toList
    assert(run() == run())
  }

  test("train on the gate corpus: full reconstruction through the encode pass") {
    val t = graft.sources.Tables(spark, TestSpark.sf)
    val words = graft.operators.WordPipeline.tokens(t)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val inv = UnigramLm.trainOf(words)
    // collect_list is unordered after the shuffle: sort by pos first
    val enc = UnigramLm.encodeOf(words, inv)
      .groupBy("word")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        x => x.getField("piece")), "").as("re"))
      .filter(col("word") =!= col("re"))
    assert(enc.count() == 0L, "some corpus word failed to reconstruct")
  }
}
