package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interchange-format round trips for the corpus tables.
  *
  * Parquet is the engine's home format, but LLM training corpora move
  * between systems as compressed JSONL (the de-facto interchange format
  * for text datasets) and ORC (the other columnar format Spark ships a
  * vectorized reader for). Each round trip here writes the documents
  * table in the foreign format and reads it back with an EXPLICIT
  * schema — schema inference on JSONL is a full extra pass over the
  * data and can widen types (a doc_id column of small ints infers as
  * long only if the sampled partition says so), so a 100 TB pipeline
  * always carries the schema. Both are driver-gated against the parquet
  * oracle: the round trip must be value-exact, including multi-line
  * text (JSON escapes newlines inside the string — one JSON object per
  * line holds), unicode, and column types.
  *
  * Maps the reference's loader/extractor pairing (CSV_FileLoader,
  * v2/core/loaders/files.py:11 ↔ FilesListExtractor,
  * v2/core/extractors/files.py:7) onto columnar/JSONL formats with
  * distributed, partitioned writes.
  */
object Formats {

  private def scratch(name: String): String = {
    val dir = java.nio.file.Paths.get(s"target/format_roundtrip/$name")
    java.nio.file.Files.createDirectories(dir.getParent)
    dir.toString
  }

  /** documents → gzip JSONL → read back (explicit schema). */
  def documentsViaJsonl(t: Tables): DataFrame = {
    val docs = t.documents
    val out = scratch("documents_jsonl")
    docs.write.mode("overwrite").option("compression", "gzip").json(out)
    docs.sparkSession.read.schema(docs.schema).json(out)
      .orderBy("doc_id")
  }

  /** documents → ORC (zlib) → read back (explicit schema). */
  def documentsViaOrc(t: Tables): DataFrame = {
    val docs = t.documents
    val out = scratch("documents_orc")
    docs.write.mode("overwrite").orc(out)
    docs.sparkSession.read.schema(docs.schema).orc(out)
      .orderBy("doc_id")
  }

  /** documents → CSV (quoted, gzip) → read back (r12). CSV is the
    * REFERENCE's native interchange format (CSV_FileLoader,
    * v2/core/loaders/files.py:11 — its primary sink), so the corpus
    * tables must survive it too. The gate proves the full quote/
    * escape/multiline path: embedded newlines, quotes and unicode in
    * `text` round-trip because the writer quotes every field and the
    * reader runs multiLine with the matching escape char. The 100 TB
    * caveat lives in the plan: multiLine CSV is NOT splittable (a
    * record may span block boundaries), so read parallelism is
    * file-count-bound — the writer's one-file-per-task partitioned
    * output is what keeps the round trip parallel.
    */
  def documentsViaCsv(t: Tables): DataFrame =
    csvRoundTrip(t.documents, scratch("documents_csv")).orderBy("doc_id")

  /** The reusable CSV seam (exposed for the adversarial spec): write
    * with every field quoted + `"` as the escape char, read back with
    * the matching multiLine/escape config and the EXPLICIT schema.
    */
  def csvRoundTrip(docs: DataFrame, out: String): DataFrame = {
    docs.write.mode("overwrite")
      .option("header", "true").option("compression", "gzip")
      .option("quoteAll", "true").option("escape", "\"")
      // the WRITER's ignore*WhiteSpace options default to TRUE and trim
      // whitespace at value boundaries — a text corpus must round-trip
      // a trailing newline byte-exactly (adversarial spec)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // the WRITER must emit the same null sentinel the reader maps
      // back (ADVICE r12): its default writes null as the empty string,
      // so a null text/lang field would silently round-trip to "" —
      // a value change, not an error (adversarial spec has a null row)
      .option("nullValue", "\u0000")
      .csv(out)
    docs.sparkSession.read.schema(docs.schema)
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      // the reader's nullValue DEFAULTS to the empty string, which
      // silently turns a quoted "" back into null — a sentinel that can
      // never occur in text keeps empty strings empty (adversarial spec)
      .option("nullValue", "\u0000")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(out)
  }

  /** The shared oracle: the round trip must reproduce the parquet
    * table exactly.
    */
  val documentsSql: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"

  /** documents → parquet partitioned by (lang, source) → read back one
    * partition slice (r14). THE scale pillar the other round trips
    * don't exercise: a partition-key predicate prunes DIRECTORIES at
    * planning time, so a 100 TB lake laid out this way scans only the
    * matched partitions — the scan shows the predicate under
    * `PartitionFilters` with an empty data-filter pushdown, and the
    * partition columns come back from directory names, not file bytes
    * (PartitionPruneSpec pins both, plus the files-read count).
    * Hive-style lang=/source= layout is also what makes per-language
    * mixture jobs (`domain_mix`, `q_mix_epochs`) pay only for the
    * slices they touch.
    */
  def documentsPartitionedPrune(t: Tables, lang: String = "en",
      source: String = "src0"): DataFrame = {
    val docs = t.documents
    val out = scratch("documents_partitioned")
    // cluster by the partition columns before the partitioned write
    // (guide §6): each write task then owns whole (lang, source) dirs —
    // parallel, and one file per partition dir instead of one per
    // (input task × dir)
    // explicit partition count: with the default count AQE coalesced
    // the 0.9 MB exchange to ONE write task, serializing the ~15
    // partition-dir writes behind one committer (measured 1.4 s wall,
    // 0.6 s cpu — the rest is per-dir file open/commit latency)
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("lang"), col("source"))
      .write.mode("overwrite").partitionBy("lang", "source").parquet(out)
    docs.sparkSession.read.parquet(out)
      .filter(col("lang") === lang && col("source") === source)
      // partition columns read back LAST; restore the contract order
      .select(docs.columns.map(col).toIndexedSeq: _*)
      .orderBy("doc_id")
  }

  def partitionedPruneSql(lang: String = "en", source: String = "src0"): String =
    s"""SELECT doc_id, text, lang, source, n_chars FROM documents
       |WHERE lang = '$lang' AND source = '$source' ORDER BY doc_id""".stripMargin
}
