package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusScience, Dedup, Linkage, Privacy, QualityRules}
import graft.sources.Tables

/** q_k_anonymity / q_l_diversity: the release-audit grids — exact
  * band/class/row accounting on a hand-built population.
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("k-anonymity bands: class sizes 1/3/6 land in bands 1, 2-4, 5-9") {
    import spark.implicits._
    val rows =
      Seq((1, "X", 100.0)) ++                       // k = 1 class
      (1 to 3).map(_ => (2, "X", 100.0)) ++          // k = 3 class
      (1 to 6).map(_ => (3, "Y", 100.0))             // k = 6 class
    val cust = rows.zipWithIndex
      .map { case ((n, seg, bal), i) => (i.toLong, n, seg, bal) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Privacy.kAnonymityOf(cust)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (1L, "1", 1L, 1L, 0.1, 1),
      (2L, "2-4", 1L, 3L, 0.3, 1),
      (5L, "5-9", 1L, 6L, 0.6, 0)))
  }

  test("l-diversity: a large-but-homogeneous class reads l = 1") {
    import spark.implicits._
    // nation 1: segments X,X,Y -> l=2 k=3; nation 2: X only -> l=1 k=1
    val cust = Seq(
      (1L, 1, "X", 0.0), (2L, 1, "X", 0.0), (3L, 1, "Y", 0.0),
      (4L, 2, "X", 0.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Privacy.lDiversityOf(cust)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 1L, 0.25), (2L, 1L, 3L, 0.75)))
  }
}

/** q_fuzzy_linkage: blocked levenshtein linkage — twin-name ambiguity
  * resolves to the min partkey; blocking keeps comparisons in-block.
  */
class FuzzyLinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("name twins in one block: both probes link to the min twin key") {
    import spark.implicits._
    val part = Seq(
      (1L, "small ring", "B1", 5, "T", 0.0),
      (2L, "small ring", "B1", 5, "T", 0.0),   // exact name twin of 1
      (3L, "red widget", "B1", 5, "T", 0.0),
      (4L, "blue bolt", "B2", 7, "T", 0.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_size", "p_type", "p_retailprice")
    val got = Linkage.fuzzyLinkageOf(part)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
    // names contain no 'q', so each dirty name is exactly 1 edit away
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 1L, 1),  // twins 1,2 both in-range; min key 1 wins
      (2L, 1L, 2L, 1L, 0),  // probe 2 resolves to its twin -> ambiguous
      (3L, 1L, 1L, 3L, 1),
      (4L, 1L, 1L, 4L, 1)))
  }

  test("corpus: every probe links within distance 1 and stays in-block") {
    val rows = Linkage.fuzzyLinkage(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) <= 1L, s"unlinked probe: $r")
      assert(r.getLong(3) >= 1L)
      assert(!r.isNullAt(4))
    }
    // the min-partkey probe of every name-block group must link back
    assert(rows.count(_.getInt(5) == 1) > 0)
  }
}

/** dedup_sentences: corpus-level boilerplate sentence removal with the
  * minChars eligibility guard and exact char accounting.
  */
class DedupSentencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("boilerplate in 3 docs drops everywhere; short dups survive") {
    import spark.implicits._
    val boiler = "all rights reserved worldwide please" // 36 chars
    val docs = Seq(
      (1L, s"$boiler. unique alpha text here. ok."),
      (2L, s"$boiler. unique beta. ok."),
      (3L, s"$boiler. gamma! ok."),
      (4L, "totally original content. ok."),
      (5L, "")).toDF("doc_id", "text")
    val got = Dedup.dedupSentencesOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      // doc, sents, eligible, dropped, chars_dropped, chars_kept, share
      (1L, 3L, 2L, 1L, 36L, 24L, 0.5),   // "unique alpha text here"(22) + "ok"(2)
      (2L, 3L, 1L, 1L, 36L, 13L, 1.0),   // "unique beta"(11) under minChars
      (3L, 3L, 1L, 1L, 36L, 7L, 1.0),
      (4L, 2L, 1L, 0L, 0L, 26L, 0.0),    // "ok" repeats but is too short to drop
      (5L, 0L, 0L, 0L, 0L, 0L, 0.0)))    // empty doc still reports
  }
}

/** quality_readability: Flesch reading ease with the vowel-run
  * syllable heuristic — exact hand-computed counts and bands.
  */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hand-computed counts, formula, and band boundaries") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"),
      (2L, "")).toDF("doc_id", "text")
    val got = QualityRules.readabilityOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getString(5)))
    // doc 1: 6 words, 2 sentences, 6 vowel runs
    // 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19 -> easy
    assert(got(0) == (1L, 6L, 2L, 6L, 119.19, "easy"))
    // empty doc: raw zeros, clamped denominators -> 206.835 - 1.015 - 0
    assert(got(1)._2 == 0L && got(1)._6 == "easy")
  }

  test("monosyllabic run of long sentences reads harder than short ones") {
    import spark.implicits._
    // same words, one sentence vs many: words/sentence drives the score down
    val many = (1 to 30).map(_ => "we go now.").mkString(" ")
    val one  = (1 to 30).map(_ => "we go now").mkString(" ") + "."
    val docs = Seq((1L, many), (2L, one)).toDF("doc_id", "text")
    val s = QualityRules.readabilityOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(s(2L) < s(1L))
  }
}

/** q_word_burstiness: exact VMR moments — uniform words read 0,
  * clumped words read high.
  */
class BurstinessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("uniform word VMR = 0; 4-in-one-doc word VMR = 3") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b b b b u"), (2L, "u"), (3L, "u"), (4L, "u")).toDF("doc_id", "text")
    val got = CorpusScience.wordBurstinessOf(docs, minDf = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // ties on total_count=4 break by word: 'b' first
    assert(got.toSeq == Seq(
      ("b", 1L, 4L, 3.0, 4.0),   // sx2/sx - sx/D = 16/4 - 4/4
      ("u", 4L, 4L, 0.0, 1.0)))  // exactly one per doc: zero dispersion
  }
}

/** q_ngram_novelty: first-occurrence attribution — copies read 0,
  * originals read 1, short docs report zero n-grams.
  */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a verbatim copy of an earlier doc has zero novelty") {
    import spark.implicits._
    val nine  = "a b c d e f g h i"          // 2 distinct 8-grams
    val eight = "p q r s t u v w"            // 1 fresh 8-gram
    val docs = Seq(
      (1L, nine, "s1"), (2L, nine, "s2"),     // doc 2 is a mirror
      (3L, eight, "s1"), (4L, "too short", "s1"))
      .toDF("doc_id", "text", "source")
    val got = CorpusScience.ngramNoveltyOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 0L, 0.0),
      (3L, 1L, 1L, 1.0),
      (4L, 0L, 0L, 0.0)))
  }
}
