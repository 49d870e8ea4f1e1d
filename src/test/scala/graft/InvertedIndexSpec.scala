package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, InvertedIndex}

/** Phrase search and containment: synthetic docs where the expected
  * matches are computable by hand.
  */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phrase search finds exact spans, counts multiplicity, ignores partial matches") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma and again alpha beta gamma"),
      (3L, "beta alpha gamma"),        // words present, order wrong
      (4L, "alpha beta"),              // prefix only
      (5L, "x alpha beta gamma")).toDF("doc_id", "text")
    val hits = InvertedIndex.phraseSearchOf(docs, Seq("alpha beta gamma"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 2L, 5L -> 1L))
  }

  test("phrase with a repeated word does not double count") {
    val docs = Seq((1L, "go go go stop"), (2L, "go stop go")).toDF("doc_id", "text")
    val hits = InvertedIndex.phraseSearchOf(docs, Seq("go go"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hits == Map(1L -> 2L)) // "go go go" contains two overlapping "go go"
  }

  test("containment flags a short doc embedded in a long one where jaccard does not") {
    val short = "one two three four five"
    val long  = s"$short plus a very long unrelated tail of many extra words goes here now ok"
    val docs  = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairsOf(docs, 3, 0.7).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(cont.head.getDouble(3) == 1.0) // every shingle of the short doc is in the long one
    val jac = Dedup.ngramJaccardPairsOf(docs, 3, 0.7).count()
    assert(jac == 0) // symmetric jaccard misses the asymmetric embed
  }
}
