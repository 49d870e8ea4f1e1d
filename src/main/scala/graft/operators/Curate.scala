package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** End-to-end corpus curation — the composed training-data pipeline
  * the individual operators exist to serve, as ONE declarative plan:
  *
  *   annotate (lang, quality, fingerprint)   — one scan, all columns
  *   → exact/normalized dedup                — keep min doc_id per fp
  *   → near-dup removal                      — MinHash-LSH losers out
  *   → quality gate                          — blended score ≥ τ
  *
  * All three annotation columns ride one scan; the dedup branches
  * (fingerprint groupBy, MinHash shingling) are separate column-pruned
  * passes over text, but everything that SHUFFLES is digest- or
  * pair-sized — ids and 16-byte hashes, never documents. A production
  * run at 100 TB would persist the annotate output and feed both
  * branches from it; the composition here keeps each stage exactly
  * the gated operator it reuses. Hash-gated against a DuckDB oracle
  * built from the same stage SQLs.
  */
object Curate {

  def curate(t: Tables, minQuality: Double = 0.5): DataFrame = {
    val annotated = t.documents.select(
      col("doc_id"),
      md5(TextAnalysis.normalizedText(col("text"))).as("fp"),
      TextAnalysis.langIdCol(col("text")).as("lang_pred"),
      TextAnalysis.qualityCol(col("text")).as("quality"))
    // canonical representative per normalized fingerprint
    val keeps = annotated.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // near-dup losers: the larger id of every LSH candidate pair
    val losers = Dedup.minhashLshPairs(t).select(col("doc_b").as("doc_id")).distinct()
    annotated
      .join(keeps, Seq("doc_id"), "left_semi")
      .join(losers, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= minQuality)
      .select("doc_id", "lang_pred", "quality")
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment (80/10/10) keyed on
    * md5(doc_id) — reproducible across runs, engines and cluster
    * sizes, with no RNG state to coordinate. The summary (split ×
    * language × count) is the stratification report a pipeline emits
    * to prove the split didn't skew a language; row-level assignment
    * is the same expression without the final aggregate.
    */
  def trainSplit(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), TextAnalysis.langIdCol(col("text")).as("lang_pred"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy("split", "lang_pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang_pred")

  def trainSplitSql(): String =
    s"""WITH lang AS (SELECT doc_id, lang_pred FROM (${TextAnalysis.langIdSql})),
       |b AS (
       |  SELECT doc_id, lang_pred,
       |    ('0x' || substr(md5('split:' || doc_id), 1, 8))::BIGINT % 100 AS bucket
       |  FROM lang
       |)
       |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  lang_pred, count(*) AS n_docs
       |FROM b GROUP BY 1, 2 ORDER BY split, lang_pred""".stripMargin

  /** Temperature-weighted domain mixing: per-source sampling rates
    * r_g = min(1, T·w_g/n_g) with w_g ∝ n_g^α (α<1 upweights small
    * sources — the multilingual/domain-balance move every training mix
    * uses), T = targetFrac·N docs overall. The per-doc keep decision
    * is a deterministic md5 fraction against the group's rate, so the
    * sample is reproducible across runs, engines and cluster sizes and
    * needs no RNG coordination. At 100 TB the rate table is a
    * per-source handful of rows (broadcast); the corpus is touched by
    * exactly one scan + one map-side filter — nothing shuffles.
    * Rates are rounded to 9dp so the last-ulp accumulation difference
    * in Σw_g between engines cannot flip a keep decision.
    */
  def domainMix(t: Tables, alpha: Double = 0.5, targetFrac: Double = 0.3): DataFrame = {
    val counts = t.documents.groupBy("source")
      .agg(count(lit(1)).as("n_g"))
      .withColumn("w_g", pow(col("n_g").cast("double"), alpha))
    val z = counts.agg(sum(col("w_g")).as("z"), sum(col("n_g")).as("n_total"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col("source"),
        round(least(lit(1.0),
          lit(targetFrac) * col("n_total") * col("w_g") / col("z") / col("n_g")), 9).as("rate"))
    val u = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    t.documents
      .join(broadcast(rates), "source")
      .filter(u < col("rate"))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")
  }

  def domainMixSql(alpha: Double = 0.5, targetFrac: Double = 0.3): String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_g, pow(CAST(count(*) AS DOUBLE), $alpha) AS w_g
       |  FROM documents GROUP BY source
       |), z AS (SELECT sum(w_g) AS z, sum(n_g) AS n_total FROM counts),
       |rates AS (
       |  SELECT source, round(least(1.0, $targetFrac * n_total * w_g / z / n_g), 9) AS rate
       |  FROM counts CROSS JOIN z
       |)
       |SELECT doc_id, d.source AS source, lang
       |FROM documents d
       |JOIN rates r ON d.source = r.source
       |WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      / 1152921504606846976.0 < rate
       |ORDER BY doc_id""".stripMargin

  /** Canonicalize one URL column: lowercase, drop fragment, scheme,
    * `www.`, default ports, tracking query params (utm_*, fbclid,
    * gclid, ref), empty left-over `?`/`&`, and trailing slashes. Pure
    * regexp chain — codegen'd, no UDF — and every pattern avoids
    * lookarounds so the DuckDB (RE2) twin evaluates identically.
    * Whole-URL lowercasing is a declared heuristic (paths are
    * case-sensitive in theory, never meaningfully in crawl dedup).
    */
  def canonicalUrl(c: Column): Column = {
    val lowered  = lower(trim(c))
    val noFrag   = regexp_replace(lowered, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^https?://", "")
    val noWww    = regexp_replace(noScheme, "^www\\.", "")
    // ([/?]|$) anchors the port: without it ':8080' would match ':80'
    // and corrupt the host into 'example.com80/...'; '?' is included so
    // a default port directly before the query string still strips
    val noPort   = regexp_replace(noWww, "^([^/:]+):(80|443)([/?]|$)", "$1$3")
    // leading-separator form eats consecutive tracking params in one
    // pass and cannot false-match inside another key (e.g. href=)
    val noTrack  = regexp_replace(noPort, "[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&]*", "")
    // if the strip removed the '?', promote the first surviving '&';
    // [^?&] keeps the capture before the FIRST '&' — a greedy [^?]+
    // would swallow intermediate '&'s and promote the last one,
    // mangling 'a.com/x&id=2&b=3' into 'a.com/x&id=2?b=3'
    val requery  = regexp_replace(noTrack, "^([^?&]+)&", "$1?")
    val noDangle = regexp_replace(requery, "[?&]+$", "")
    regexp_replace(noDangle, "/+$", "")
  }

  /** URL canonicalization + dedup — the crawl-pipeline step before any
    * content dedup: page variants that differ only in scheme, case,
    * `www.`, default port, fragment, tracking params or trailing slash
    * are one fetch identity. The gate plants deterministic messy URLs
    * from doc_id (the `pii_redact` trick — the data has no URL column,
    * so the query manufactures the five variant shapes and must
    * collapse them). Output is the canonical-URL manifest (variant
    * count + representative doc): one scan, one groupBy on the
    * canonical string — at 100 TB only (url-hash, doc_id) pairs
    * shuffle.
    */
  def urlCanonicalize(t: Tables): DataFrame = {
    val base = concat(lit("example"), (col("doc_id") % 97).cast("string"),
      lit(".com/path/p"), (col("doc_id") % 97).cast("string"))
    val url =
      when(col("doc_id") % 5 === 0, concat(lit("https://"), base))
        .when(col("doc_id") % 5 === 1, upper(concat(lit("http://"), base, lit("/"))))
        .when(col("doc_id") % 5 === 2, concat(lit("https://www."), base, lit("?utm_source=feed")))
        .when(col("doc_id") % 5 === 3, concat(lit("http://"),
          regexp_replace(base, "\\.com/", ".com:80/"), lit("#frag")))
        .otherwise(concat(lit("https://"), base, lit("?id=1&utm_campaign=x")))
    t.documents
      .select(col("doc_id"), canonicalUrl(url).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
      .orderBy("canonical_url")
  }

  def urlCanonicalizeSql: String =
    """WITH planted AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'https://' || base
      |      WHEN 1 THEN upper('http://' || base || '/')
      |      WHEN 2 THEN 'https://www.' || base || '?utm_source=feed'
      |      WHEN 3 THEN 'http://' || replace(base, '.com/', '.com:80/') || '#frag'
      |      ELSE 'https://' || base || '?id=1&utm_campaign=x'
      |    END AS url
      |  FROM (
      |    SELECT doc_id,
      |      'example' || CAST(doc_id % 97 AS VARCHAR) || '.com/path/p' || CAST(doc_id % 97 AS VARCHAR) AS base
      |    FROM documents)
      |), canon AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              regexp_replace(
      |                regexp_replace(
      |                  regexp_replace(lower(trim(url)), '#.*$', ''),
      |                  '^https?://', ''),
      |                '^www\.', ''),
      |              '^([^/:]+):(80|443)([/?]|$)', '\1\3'),
      |            '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&]*', '', 'g'),
      |          '^([^?&]+)&', '\1?'),
      |        '[?&]+$', ''),
      |      '/+$', '') AS canonical_url
      |  FROM planted
      |)
      |SELECT canonical_url, count(*) AS n_variants, min(doc_id) AS first_doc
      |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin

  def curateSql(minQuality: Double = 0.5): String =
    s"""WITH keeps AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM documents
       |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |), losers AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM (${Dedup.minhashLshPairsSql()})
       |), lang AS (SELECT doc_id, lang_pred FROM (${TextAnalysis.langIdSql})),
       |qual AS (SELECT doc_id, quality FROM (${TextAnalysis.qualityScoreSql}))
       |SELECT lang.doc_id AS doc_id, lang.lang_pred, qual.quality
       |FROM lang
       |JOIN qual ON lang.doc_id = qual.doc_id
       |JOIN keeps ON lang.doc_id = keeps.doc_id
       |ANTI JOIN losers ON lang.doc_id = losers.doc_id
       |WHERE qual.quality >= $minQuality
       |ORDER BY doc_id""".stripMargin
}
