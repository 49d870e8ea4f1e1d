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

  // --------------------------------------- reciprocal-rank fusion

  test("rrfFusion: the arms disagree and fusion reflects BOTH rankings") {
    // doc 1 IS the query direction (cosine exactly 1.0 -> vsm rank 1);
    // bm25's tf saturation + length norm rank the short exact doc
    // first too, but doc 2 still appears in both arms at rank 2
    val docs = Seq(
      (1L, "spark"),
      (2L, "spark spark rocket"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val rows = InvertedIndex.rrfFusionOf(docs, Seq("spark"), k = 10, armK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // only the two matching docs are retrieved; doc 3 is in neither arm
    assert(rows.map(_._1).toSet == Set(1L, 2L))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 == 1L, "whole-doc term match must be the top cosine")
    assert(byId(2L)._3 == 2L)
    // rrf is the closed form of the two returned ranks
    for ((id, r1, r2, rrf) <- rows)
      assert(rrf == math.rint((1.0 / (r1 + 60) + 1.0 / (r2 + 60)) * 1e6) / 1e6,
        s"doc $id rrf $rrf != closed form of ranks ($r1, $r2)")
    // fusion order follows the summed reciprocal ranks
    assert(rows.sortBy(r => (-r._4, r._1)).toSeq == rows.toSeq)
  }

  test("rrfFusion: a doc in a single arm scores only that arm's reciprocal") {
    // armK = 1 keeps exactly one doc per arm; construct docs so the
    // arms pick DIFFERENT docs: doc 1 is the pure-direction cosine
    // winner, doc 2 the higher-tf bm25 winner (long enough that its
    // cosine drops below doc 1's, short enough that bm25 still grows)
    val docs = Seq(
      (1L, "spark"),
      (2L, "spark spark spark spark rocket"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val rows = InvertedIndex.rrfFusionOf(docs, Seq("spark"), k = 10, armK = 1)
      .collect()
    if (rows.length == 2) {
      // arms disagreed: each doc has exactly one NULL rank and rrf = 1/61
      for (r <- rows) {
        assert(r.isNullAt(1) ^ r.isNullAt(2), s"expected one-arm membership: $r")
        assert(r.getDouble(3) == math.rint(1.0 / 61 * 1e6) / 1e6)
      }
    } else {
      // arms agreed on one doc: both ranks 1, rrf = 2/61
      assert(rows.length == 1 && rows(0).getLong(1) == 1L && rows(0).getLong(2) == 1L)
      assert(rows(0).getDouble(3) == math.rint(2.0 / 61 * 1e6) / 1e6)
    }
  }

  // --------------------------------- Rocchio pseudo-relevance feedback

  test("rocchio: expansion surfaces a term co-occurring with the query in feedback docs") {
    import spark.implicits._
    // "anchor" query; docs about anchors always mention "windlass";
    // a distractor doc mentions windlass without anchor.
    // windlass: df 4 of 8 (idf ln 2) but tf 2 in every feedback doc →
    // Σtf·idf = 6·ln2 ≈ 4.16, beating any once-only word (ln 8 ≈ 2.08)
    val docs = Seq(
      (1L, "anchor windlass windlass chain"),
      (2L, "anchor windlass windlass rope"),
      (3L, "anchor windlass windlass harbor"),
      (4L, "galley stove pots pans"),
      (5L, "windlass maintenance manual"),
      (6L, "random noise words"),
      (7L, "more filler text here"),
      (8L, "unrelated filler doc")).toDF("doc_id", "text")
    val got = graft.operators.InvertedIndex
      .rocchioExpandOf(docs, Seq("anchor"), r = 3, e = 1, k = 5)
      .collect().map(_.getLong(0))
    // doc 5 has no "anchor" but must enter the round-2 ranking via the
    // expanded term (windlass dominates the feedback centroid)
    assert(got.contains(5L), s"expanded retrieval missed doc 5: ${got.toSeq}")
  }

  test("rocchio: with e = 0 the ranking degrades to plain BM25 on the original terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark scan order"), (2L, "spark spark scan"),
      (3L, "noise words here"), (4L, "order scan spark spark")).toDF("doc_id", "text")
    val plain = graft.operators.InvertedIndex.rocchioExpandOf(
      docs, Seq("spark"), r = 2, e = 0, k = 4).collect().map(r => (r.getLong(0), r.getDouble(1)))
    // round-2 term set == original, so scores equal single-pass BM25
    assert(plain.nonEmpty && plain.forall(_._2 > 0))
    assert(!plain.map(_._1).contains(3L))
  }

  test("rocchio: ranks are 1..n dense in score order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha alpha"), (3L, "alpha gamma beta"))
      .toDF("doc_id", "text")
    val rows = graft.operators.InvertedIndex
      .rocchioExpandOf(docs, Seq("alpha"), r = 2, e = 1, k = 3).collect()
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }
}
