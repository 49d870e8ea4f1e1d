package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TextFiles

/** File-corpus queries over the reference's own sample books
  * (/root/reference/sample_data/books — 28 Project Gutenberg texts):
  * the extractor surface (§2.1) exercised end-to-end and oracle-gated
  * via DuckDB's read_text over the same files.
  */
object FileCorpus {

  val BooksDir = "/root/reference/sample_data/books"

  private def fname(pathCol: org.apache.spark.sql.Column) =
    element_at(split(pathCol, "/"), -1)

  /** Per-file line statistics from the distributed line source
    * (FileToTextLinesTransformer analog, oracle-checked).
    */
  def fileLineStats(spark: SparkSession): DataFrame =
    TextFiles.lines(spark, "*.txt", BooksDir)
      .groupBy(fname(col("file_path")).as("fname"))
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("line"))).as("sum_chars"))
      .orderBy("fname")

  val fileLineStatsSql: String =
    s"""WITH lines AS (
       |  SELECT string_split(filename, '/')[-1] AS fname, trim(l) AS line
       |  FROM (
       |    SELECT filename,
       |      unnest(string_split(replace(replace(content, chr(65279), ''), chr(13), ''), chr(10))) AS l
       |    FROM read_text('$BooksDir/*.txt'))
       |  WHERE trim(l) <> ''
       |)
       |SELECT fname, count(*) AS n_lines, CAST(sum(length(line)) AS BIGINT) AS sum_chars
       |FROM lines GROUP BY fname ORDER BY fname""".stripMargin

  /** Whole-file word counts — the reference's ReduceItemTransformer
    * (count) over FileTextReaderTransformer, per file, oracle-checked.
    */
  def fileWordCounts(spark: SparkSession): DataFrame =
    TextFiles.wholeText(spark, "*.txt", BooksDir)
      .select(fname(col("file_path")).as("fname"),
        explode(split(col("content"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("fname")
      .agg(count(lit(1)).as("n_words"), countDistinct(lower(col("w"))).as("n_distinct"))
      .orderBy("fname")

  val fileWordCountsSql: String =
    s"""WITH words AS (
       |  SELECT string_split(filename, '/')[-1] AS fname, w
       |  FROM (
       |    SELECT filename, unnest(regexp_split_to_array(content, '\\s+')) AS w
       |    FROM read_text('$BooksDir/*.txt'))
       |  WHERE w <> ''
       |)
       |SELECT fname, count(*) AS n_words, count(DISTINCT lower(w)) AS n_distinct
       |FROM words GROUP BY fname ORDER BY fname""".stripMargin
}
