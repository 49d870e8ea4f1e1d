package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Positional inverted index + exact phrase search — the IR primitive
  * a corpus engine needs for "find documents containing this exact
  * span" (quote detection, template hunting, eval-answer lookup).
  *
  * The algorithm is the classic posting-intersection: explode
  * (doc, position, word) postings, join the phrase's words against
  * them, and a phrase occurrence exists wherever all words of the
  * phrase land on one anchor (pos − idx constant). Everything after
  * the postings explode is keyed by doc_id, so at 100 TB the match
  * work is co-partitioned per document and the phrase table (a few
  * rows) is broadcast — no shuffle ever carries postings for words
  * the phrases don't mention, because the broadcast join prunes them
  * map-side.
  */
object InvertedIndex {

  /** (doc_id, pos, word) positional postings over normalized text. */
  def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(split(TextAnalysis.normalizedText(col("text")), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")

  /** Occurrence counts per (phrase, doc): a phrase matches at anchor a
    * iff every phrase word idx sits at position a + idx.
    */
  def phraseSearchOf(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val phr = phrases.toDF("phrase")
      .select(col("phrase"), posexplode(split(col("phrase"), " ")).as(Seq("idx", "word")))
    val plen = phr.groupBy("phrase").agg(count(lit(1)).as("plen"))
    postingsOf(docs)
      .join(broadcast(phr), "word")
      .groupBy(col("phrase"), col("doc_id"), (col("pos") - col("idx")).as("anchor"))
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(plen), "phrase")
      .filter(col("n_matched") === col("plen"))
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy("phrase", "doc_id")
  }

  /** Gated form over three phrases present in the synthetic corpus. */
  val gatePhrases: Seq[String] = Seq("big order scan", "group slow spark", "sort slow hash")

  def phraseSearchQuery(t: Tables): DataFrame =
    phraseSearchOf(t.documents, gatePhrases)

  def phraseSearchSql(phrases: Seq[String] = gatePhrases): String = {
    val values = phrases.map(p => s"('$p')").mkString(", ")
    s"""WITH postings AS (
       |  SELECT doc_id, i AS pos, tk[i + 1] AS word
       |  FROM (
       |    SELECT doc_id,
       |      regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS tk
       |    FROM documents),
       |    unnest(range(0, len(tk))) AS r(i)
       |  WHERE tk[i + 1] <> ''
       |), phr AS (
       |  SELECT phrase, i AS idx, pw[i + 1] AS word
       |  FROM (SELECT phrase, string_split(phrase, ' ') AS pw
       |        FROM (VALUES $values) v(phrase)),
       |    unnest(range(0, len(pw))) AS r(i)
       |), plen AS (SELECT phrase, count(*) AS plen FROM phr GROUP BY phrase),
       |m AS (
       |  SELECT phrase, doc_id, pos - idx AS anchor, count(*) AS n_matched
       |  FROM postings JOIN phr USING (word)
       |  GROUP BY phrase, doc_id, pos - idx
       |)
       |SELECT phrase, doc_id, count(*) AS n_occurrences
       |FROM m JOIN plen USING (phrase)
       |WHERE n_matched = plen
       |GROUP BY phrase, doc_id
       |ORDER BY phrase, doc_id""".stripMargin
  }
}
