package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** HTML main-text extraction — the first stage of every web-crawl
  * training pipeline (the CommonCrawl → WET shape): strip
  * script/style payloads, drop boilerplate containers
  * (nav/header/footer/aside — the readability heuristic's "chrome"
  * classes), flatten the remaining markup, decode entities, collapse
  * whitespace. Pure per-row string work: map-only, codegen'd
  * `regexp_replace` chains, no shuffle, trivially 100 TB-parallel.
  *
  * The gated query plants deterministic HTML around each document's
  * (escaped) text — the [[TextAnalysis.piiRedactQuery]] planting
  * pattern, since the corpus stores extracted text already — then
  * proves the extractor inverts it: identical regex pipeline in
  * DuckDB, hash-gated. Planting covers the three failure classes the
  * extractor must handle: executable payloads (script/style),
  * boilerplate chrome with LINKS (nav/footer), and entity-encoded
  * body text.
  */
object Html {

  /** Escape text into HTML body form (&, <, > — amp first). */
  def escapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** The extraction pipeline. Stage order matters and is part of the
    * contract: payload blocks first (their CONTENT must go, not just
    * their tags), then chrome containers, then residual tags, then
    * entity decoding (&amp; strictly last, so "&amp;lt;" decodes to
    * the literal "&lt;" and never to "<"), then whitespace collapse.
    */
  def extractText(html: Column): Column = {
    val noPayload = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noChrome = regexp_replace(noPayload,
      "(?is)<(nav|header|footer|aside)[^>]*>.*?</(nav|header|footer|aside)>", " ")
    val noTags = regexp_replace(noChrome, "<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Link density of the RAW html: <a> tag count per KB — the classic
    * boilerplate-page signal read before extraction.
    */
  def linkDensity(html: Column): Column =
    round(size(regexp_extract_all(html, lit("(?i)<a\\s"), lit(0))).cast("double") * 1024.0 /
      greatest(length(html).cast("double"), lit(1.0)), 6)

  /** Deterministic planted page: payload + chrome + entity-escaped
    * body + entity-bearing footer, all varying with doc_id.
    */
  private def plantedHtml(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>body{margin:0;color:#222}</style>" +
        "<script type=\"text/javascript\">var id="), docId.cast("string"),
      lit(";if(id<10){track(id)}</script></head><body>" +
        "<nav class=\"top\"><a href=\"/\">home</a> <a href=\"/about\">about</a></nav>" +
        "<div class=\"content\"><h1>Entry "), docId.cast("string"),
      lit("</h1><p>"), escapeHtml(text),
      lit("</p></div><footer>&copy; 2026 Example &amp; Co. &#39;fine&#39; &lt;print&gt;</footer></body></html>"))

  /** Gated query: plant → extract → fingerprint. The extracted text
    * must contain the original document text verbatim (decoded), plus
    * the deterministic non-chrome headline — md5 pins it exactly.
    */
  def htmlExtractQuery(t: Tables): DataFrame = {
    val html = plantedHtml(col("doc_id"), col("text"))
    val extracted = extractText(html)
    t.documents.select(
      col("doc_id"),
      length(html).cast("long").as("n_chars_html"),
      length(extracted).cast("long").as("n_chars_text"),
      md5(extracted).as("text_fp"),
      linkDensity(html).as("link_density"))
      .orderBy("doc_id")
  }

  val htmlExtractSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>body{margin:0;color:#222}</style>' ||
      |    '<script type="text/javascript">var id=' || CAST(doc_id AS VARCHAR) ||
      |    ';if(id<10){track(id)}</script></head><body>' ||
      |    '<nav class="top"><a href="/">home</a> <a href="/about">about</a></nav>' ||
      |    '<div class="content"><h1>Entry ' || CAST(doc_id AS VARCHAR) ||
      |    '</h1><p>' ||
      |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
      |    '</p></div><footer>&copy; 2026 Example &amp; Co. &#39;fine&#39; &lt;print&gt;</footer></body></html>'
      |    AS html
      |  FROM documents
      |), ext AS (
      |  SELECT doc_id, html,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
      |            '(?is)<(nav|header|footer|aside)[^>]*>.*?</(nav|header|footer|aside)>', ' ', 'g'),
      |          '<[^>]+>', ' ', 'g'),
      |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |        '&#39;', ''''), '&amp;', '&'),
      |      '\s+', ' ', 'g')) AS extracted
      |  FROM planted
      |)
      |SELECT doc_id,
      |  CAST(length(html) AS BIGINT) AS n_chars_html,
      |  CAST(length(extracted) AS BIGINT) AS n_chars_text,
      |  md5(extracted) AS text_fp,
      |  round(CAST(len(regexp_extract_all(html, '(?i)<a\s')) AS DOUBLE) * 1024.0 /
      |    greatest(CAST(length(html) AS DOUBLE), 1.0), 6) AS link_density
      |FROM ext ORDER BY doc_id""".stripMargin
}
