package graft

import org.apache.spark.sql.functions._
import graft.operators.ArabicCorpus
import graft.sinks.Sinks

/** The reference's flagship job end-to-end, Spark-native — what a
  * python-multiproc-bigdata user runs after switching:
  *
  * reference (v2/main.py): walk dir → read files → Arabic tokenize →
  * per-file counts + unique words → derive word_len/word_truncated →
  * CSV or DB loaders behind a ConditionalLoader, load-balanced over
  * hand-managed processes.
  *
  * here: ONE declarative plan over the same sample corpus; loaders are
  * partition-parallel writes. Usage:
  * `sbt "runMain graft.Flagship [inDir] [outDir]"`
  */
object Flagship {
  def main(args: Array[String]): Unit = {
    val inDir    = args.headOption.getOrElse(ArabicCorpus.SampleDir)
    val outDir   = args.lift(1).getOrElse("target/flagship_out")
    val saveToDb = args.lift(2).contains("--db")

    val spark = GraftSession.local("graft-flagship")
    val t0    = System.nanoTime()

    val words = ArabicCorpus.wordStats(spark, inDir).cache()
    val nRows = words.count()

    // ConditionalLoader analog: CSV by default, JDBC when --db
    Sinks.conditional(!saveToDb)(words) { df =>
      Sinks.loadBalanced(df, 4)(Sinks.csv(_, s"$outDir/words_csv"))
    }
    Sinks.conditional(saveToDb)(words) { df =>
      Sinks.jdbc(df, s"jdbc:derby:$outDir/words_db;create=true", "words")
    }

    val summary = words.agg(countDistinct(col("file_path")).as("files")).head()
    val secs    = (System.nanoTime() - t0) / 1e9
    println(f"[flagship] files=${summary.getLong(0)} uniqueWordRows=$nRows elapsed=$secs%.1fs")
    spark.stop()
  }
}
