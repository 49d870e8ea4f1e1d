package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, FileCorpus, Layout}
import graft.sources.Tables

/** pack_sequences: causal-LM fixed-length packing — exact integer
  * token accounting, conservation, and the split/carry-in semantics a
  * masking strategy depends on.
  */
class PackSequencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def t = Tables(spark, TestSpark.sf)

  test("hand-walked manifest: splits, carry-ins, final partial sequence") {
    import spark.implicits._
    // token counts 3, 5, 4, 2 at L=4 → doc 20 is cut at seq0's right
    // edge and carries into seq1; seq3 is the 2-token partial tail
    val docs = Seq(
      (10L, "a b c"),
      (20L, "d e f g h"),
      (30L, "i j k l"),
      (40L, "m n")).toDF("doc_id", "text")
    val rows = Layout.packSequencesOf(docs, seqLen = 4L, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (0L, 2L, 2L, 1L, 4L),  // doc10 whole + doc20's first token, doc20 split
      (1L, 1L, 0L, 0L, 4L),  // doc20's carried remainder exactly fills it
      (2L, 1L, 1L, 0L, 4L),
      (3L, 1L, 1L, 0L, 2L))) // partial tail
  }

  test("corpus properties: token conservation, every non-final sequence full") {
    val L = 512L
    val seqs = Layout.packSequences(t, seqLen = L).collect()
    val totalTokens = t.documents
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long"))).head.getLong(0)
    assert(seqs.map(_.getLong(4)).sum == totalTokens, "packing must conserve tokens")
    val last = seqs.map(_.getLong(0)).max
    seqs.filter(_.getLong(0) != last).foreach { r =>
      assert(r.getLong(4) == L, s"non-final seq ${r.getLong(0)} not full: ${r.getLong(4)}")
    }
    // every doc starts exactly once; ids are the contiguous range
    assert(seqs.map(_.getLong(2)).sum == t.documents.count())
    assert(seqs.map(_.getLong(0)).toSeq == (0L to last).toSeq)
    // started + carry-ins account for all contributions
    seqs.foreach(r => assert(r.getLong(1) >= r.getLong(2) && r.getLong(3) <= r.getLong(1)))
  }
}

/** stop_shingles: the df-tail manifest the containment/Jaccard
  * `maxShingleDf` cap is tuned from.
  */
class StopShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("boilerplate header dominates the manifest with exact fan-out math") {
    import spark.implicits._
    // the DedupSpec cap corpus: a header shared by all 40 docs, unique tails
    val header = "terms of service all rights reserved please read carefully before use"
    val docs = (1L to 40L).map(i => (i, s"$header a$i b$i c$i")).toDF("doc_id", "text")
    val rows = Dedup.stopShinglesOf(docs, n = 3, k = 8).collect()
    assert(rows.length == 8)
    // header has 11 words → 9 tri-shingles wholly inside it, df = 40
    // each (shingles bridging into the unique tails have df 1); the
    // top-8 are the first 8 of that equal-df block, fan-out 40·39 each
    rows.foreach { r =>
      assert(r.getLong(1) == 40L, s"df: $r")
      assert(r.getLong(2) == 40L * 39L, s"fanout: $r")
    }
    // ties broken on shingle text: ascending within the equal-df block
    val shingles = rows.map(_.getString(0)).toSeq
    assert(shingles == shingles.sorted, "equal-df ties must order by shingle text")
    // share: the 9 hot shingles carry ALL fan-out (df-1 tail is 0) → 1/9 each
    rows.foreach(r => assert(math.abs(r.getDouble(3) - 1.0 / 9) < 1e-5, s"share: $r"))
  }

  test("k caps the manifest; an all-unique corpus yields zero shares") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, s"u$i v$i w$i x$i y$i")).toDF("doc_id", "text")
    val rows = Dedup.stopShinglesOf(docs, n = 3, k = 3).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
    }
  }
}

/** dedup_lines: cross-file boilerplate line removal over the
  * reference's Gutenberg books (real license furniture) plus a planted
  * corpus pinning the exact threshold semantics.
  */
class DedupLinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted corpus: exactly the >= minFiles lines drop, chars conserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-lines").toFile
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        lines.mkString("\n").getBytes("UTF-8"))
    val boiler = "COMMON LICENSE BOILERPLATE LINE"
    write("a.txt", Seq(boiler, "alpha unique content", "shared by two"))
    write("b.txt", Seq(boiler, "beta unique content", "shared by two"))
    write("c.txt", Seq(boiler, "gamma unique content"))
    val rows = FileCorpus.dedupLinesIn(spark, dir.getPath, minFiles = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // only the 3-file line is boilerplate; the 2-file line survives
    assert(rows("a.txt") == ((3L, 1L, "alpha unique content".length + "shared by two".length)))
    assert(rows("b.txt") == ((3L, 1L, "beta unique content".length + "shared by two".length)))
    assert(rows("c.txt") == ((2L, 1L, "gamma unique content".length.toLong)))
    // at minFiles = 2 the shared line drops too
    val at2 = FileCorpus.dedupLinesIn(spark, dir.getPath, minFiles = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(at2("a.txt") == 2L && at2("b.txt") == 2L && at2("c.txt") == 1L)
  }

  test("Gutenberg books: real license boilerplate detected, accounting consistent") {
    val stats = FileCorpus.fileLineStats(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = FileCorpus.dedupLines(spark).collect()
    assert(rows.map(_.getString(0)).toSet == stats.keySet, "file set must match line stats")
    rows.foreach { r =>
      val (nLines, sumChars) = stats(r.getString(0))
      assert(r.getLong(1) == nLines, s"line count drifted for ${r.getString(0)}")
      assert(r.getLong(2) <= nLines && r.getLong(3) <= sumChars)
    }
    // the license apparatus repeats across the corpus: boilerplate must
    // actually fire on real data, in most files
    val withBoiler = rows.count(_.getLong(2) > 0)
    assert(withBoiler * 2 > rows.length,
      s"expected license boilerplate in most books, got $withBoiler/${rows.length}")
  }
}
