package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Published rule-based corpus filters — the Gopher quality rules
  * (Rae et al. 2021, "Scaling Language Models", table A1) and the C4
  * cleaning heuristics (Raffel et al. 2020, §2.2) — adapted to this
  * corpus's word/sentence granularity (the testdata documents are
  * single-line). Everything is higher-order array functions over one
  * `split` of the text (whole-stage codegen, no UDFs, no explode —
  * per-doc rule evaluation never shuffles; only the final ordered
  * output does), which is the shape that matters when the rules run
  * as the first gate over 100 TB of raw text.
  */
object QualityRules {

  private def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => w =!= "")

  // ------------------------------------------------------ Gopher rules

  private case class GopherFeats(nWords: Column, meanLen: Column,
      symbolR: Column, alphaR: Column, stopN: Column)

  private def gopherFeats(text: Column): GopherFeats = {
    val w       = words(text)
    val nWords  = size(w).cast("long")
    // ANSI sessions throw on /0 — an empty crawl doc must FAIL the
    // gate (n_words bound), not kill the job; ratios read 0 for it
    val denom   = greatest(nWords, lit(1L))
    val meanLen = aggregate(w, lit(0L), (acc, x) => acc + length(x)).cast("double") / denom
    val hashes  = length(text) - length(regexp_replace(text, "#", ""))
    val dots    = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val stops   = array(TextAnalysis.stopList("en").map(lit): _*)
    GopherFeats(nWords, meanLen,
      (hashes + dots).cast("double") / denom,
      size(filter(w, x => x.rlike("[a-z]"))).cast("double") / denom,
      size(filter(w, x => array_contains(stops, x))).cast("long"))
  }

  private def gopherDecision(f: GopherFeats, minWords: Int, maxWords: Int): Column =
    when(f.nWords.between(minWords, maxWords) && f.meanLen.between(3.0, 10.0) &&
      f.symbolR < 0.1 && f.alphaR > 0.8 && f.stopN >= 2, 1).otherwise(0)

  /** The combined Gopher keep decision as a single reusable column —
    * the form a streaming gate or a composed curation stage consumes
    * (same expressions as [[gopherRulesOf]], whole-stage codegen'd).
    */
  def gopherPassCol(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    gopherDecision(gopherFeats(text), minWords, maxWords)

  /** Word-level Gopher filters: word-count bounds, mean-word-length
    * band, symbol-to-word ratio (# and ... as in the paper), fraction
    * of words containing an alphabetic character, and a minimum
    * stop-word hit count. Emits each feature plus the combined
    * `gopher_pass` flag so downstream curation can re-weight
    * individual rules without re-scanning text.
    */
  def gopherRulesOf(documents: DataFrame,
                    minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val f = gopherFeats(col("text"))
    val GopherFeats(nWords, meanLen, symbolR, alphaR, stopN) = f
    documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolR, 6).as("symbol_ratio"),
      round(alphaR, 6).as("alpha_ratio"),
      stopN.as("stop_hits"),
      gopherDecision(f, minWords, maxWords).as("gopher_pass"))
      .orderBy("doc_id")
  }

  def gopherRules(t: Tables): DataFrame = gopherRulesOf(t.documents)

  def gopherRulesSql(minWords: Int = 50, maxWords: Int = 100000): String =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), w -> w <> '') AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS DOUBLE) / greatest(len(w), 1) AS mean_len,
       |    CAST((length(text) - length(regexp_replace(text, '#', '', 'g')))
       |       + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3
       |       AS DOUBLE) / greatest(len(w), 1) AS symbol_r,
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / greatest(len(w), 1) AS alpha_r,
       |    CAST(len(list_filter(w, x -> list_contains([${TextAnalysis.stopListSql("en")}], x)))
       |       AS BIGINT) AS stop_hits
       |  FROM f
       |)
       |SELECT doc_id, n_words,
       |  round(mean_len, 6) AS mean_word_len,
       |  round(symbol_r, 6) AS symbol_ratio,
       |  round(alpha_r, 6) AS alpha_ratio,
       |  stop_hits,
       |  CASE WHEN n_words BETWEEN $minWords AND $maxWords
       |    AND mean_len BETWEEN 3.0 AND 10.0
       |    AND symbol_r < 0.1 AND alpha_r > 0.8 AND stop_hits >= 2
       |    THEN 1 ELSE 0 END AS gopher_pass
       |FROM g ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- C4 rules

  /** C4 cleaning heuristics at sentence granularity: a sentence
    * (period-delimited span) is retained when it has ≥ `minSentWords`
    * words; the document survives when ≥ `minSentences` sentences
    * survive and none of the blacklist markers (curly brace — code;
    * "lorem ipsum" — placeholder; "javascript" — boilerplate warnings)
    * appear. Same single-pass, no-shuffle shape as the Gopher gate.
    *
    * On the synthetic testdata corpus every document fails (the texts
    * carry no terminal punctuation, so no sentence survives) — which
    * is real C4 behavior, not a bug: its terminal-punctuation rule
    * discards punctuation-less text wholesale. The discriminating
    * cases are pinned in Analytics2Spec on hand-built documents.
    */
  def c4RulesOf(documents: DataFrame,
                minSentWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val sents  = split(col("text"), "\\.")
    val nSents = size(filter(sents, s => trim(s) =!= "")).cast("long")
    val kept   = size(filter(sents,
      s => size(filter(split(trim(s), "\\s+"), x => x =!= "")) >= minSentWords)).cast("long")
    val lower_ = lower(col("text"))
    val brace  = when(col("text").contains("{") || col("text").contains("}"), 1).otherwise(0)
    val lorem  = when(lower_.contains("lorem ipsum"), 1).otherwise(0)
    val js     = when(lower_.contains("javascript"), 1).otherwise(0)
    documents.select(
      col("doc_id"),
      nSents.as("n_sentences"),
      kept.as("n_kept_sentences"),
      round(kept.cast("double") / greatest(nSents, lit(1L)), 6).as("kept_ratio"),
      brace.as("has_brace"), lorem.as("has_lorem"), js.as("has_js"),
      when(kept >= minSentences && brace === 0 && lorem === 0 && js === 0, 1)
        .otherwise(0).as("c4_keep"))
      .orderBy("doc_id")
  }

  def c4Rules(t: Tables): DataFrame = c4RulesOf(t.documents)

  def c4RulesSql(minSentWords: Int = 5, minSentences: Int = 3): String =
    s"""WITH f AS (
       |  SELECT doc_id, text, regexp_split_to_array(text, '\\.') AS sents
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(sents, s -> trim(s) <> '')) AS BIGINT) AS n_sentences,
       |    CAST(len(list_filter(sents, s ->
       |      len(list_filter(regexp_split_to_array(trim(s), '\\s+'), x -> x <> ''))
       |        >= $minSentWords)) AS BIGINT) AS n_kept,
       |    CASE WHEN contains(text, '{') OR contains(text, '}') THEN 1 ELSE 0 END AS has_brace,
       |    CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END AS has_lorem,
       |    CASE WHEN contains(lower(text), 'javascript') THEN 1 ELSE 0 END AS has_js
       |  FROM f
       |)
       |SELECT doc_id, n_sentences, n_kept AS n_kept_sentences,
       |  round(CAST(n_kept AS DOUBLE) / greatest(n_sentences, 1), 6) AS kept_ratio,
       |  has_brace, has_lorem, has_js,
       |  CASE WHEN n_kept >= $minSentences AND has_brace = 0 AND has_lorem = 0
       |    AND has_js = 0 THEN 1 ELSE 0 END AS c4_keep
       |FROM g ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- blocklist gate

  /** Default blocked terms — a deterministic stand-in for the badword
    * list C4 filters against (Raffel et al. 2020 §2.2 drop any page
    * containing a term from the "List of Dirty, Naughty, Obscene..."
    * list). Two terms that occur in the corpus (so both branches of
    * the gate are exercised) plus one that never does (so a zero-hit
    * term costs nothing and proves absence is handled).
    */
  val DefaultBlocklist: Seq[String] = Seq("slow", "big", "deprecated")

  /** Blocklist filter: per-doc occurrence count of blocked terms,
    * distinct blocked terms present, hit ratio, and the keep decision.
    * Two policies are emitted side by side: C4's any-hit drop
    * (`strict_keep`) and a thresholded variant (`ratio_keep`, keep
    * while hits/words ≤ `maxRatio`) — real pipelines run the threshold
    * on technical corpora where strict C4 would empty the corpus.
    *
    * Scale shape: the list rides inline in the expression (array
    * literal → whole-stage codegen, zero shuffle, zero extra scan) —
    * right for the 10²-term lists in published pipelines. A 10⁵-term
    * production list instead broadcast-semi-joins the exploded tokens
    * (the [[Decontaminate]] shape); the per-doc output contract is
    * identical, so the swap is local to this function.
    */
  def blocklistOf(documents: DataFrame,
                  terms: Seq[String] = DefaultBlocklist,
                  maxRatio: Double = 0.05): DataFrame = {
    val w       = words(col("text"))
    val blocked = array(terms.map(lit): _*)
    val nWords  = size(w).cast("long")
    val hits    = size(filter(w, x => array_contains(blocked, x))).cast("long")
    val nTerms  = size(array_intersect(array_distinct(w), blocked)).cast("long")
    val ratio   = hits.cast("double") / greatest(nWords, lit(1L))
    documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      hits.as("blocked_hits"),
      nTerms.as("blocked_terms"),
      round(ratio, 6).as("blocked_ratio"),
      when(hits === 0, 1).otherwise(0).as("strict_keep"),
      when(ratio <= maxRatio, 1).otherwise(0).as("ratio_keep"))
      .orderBy("doc_id")
  }

  def blocklist(t: Tables): DataFrame = blocklistOf(t.documents)

  /** The thresholded blocklist keep decision as a reusable column —
    * the form [[Curate.filterFunnelOf]] composes (same expressions as
    * `ratio_keep` in [[blocklistOf]]).
    */
  def blocklistKeepCol(text: Column,
                       terms: Seq[String] = DefaultBlocklist,
                       maxRatio: Double = 0.05): Column = {
    val w       = words(text)
    val blocked = array(terms.map(lit): _*)
    val hits    = size(filter(w, x => array_contains(blocked, x))).cast("long")
    when(hits.cast("double") / greatest(size(w).cast("long"), lit(1L)) <= maxRatio, 1)
      .otherwise(0)
  }

  def blocklistSql(terms: Seq[String] = DefaultBlocklist,
                   maxRatio: Double = 0.05): String = {
    val list = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), w -> w <> '') AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    CAST(len(list_filter(w, x -> list_contains([$list], x))) AS BIGINT) AS hits,
       |    CAST(len(list_intersect(list_distinct(w), [$list])) AS BIGINT) AS blocked_terms,
       |    CAST(len(list_filter(w, x -> list_contains([$list], x))) AS DOUBLE)
       |      / greatest(len(w), 1) AS ratio
       |  FROM f
       |)
       |SELECT doc_id, n_words, hits AS blocked_hits, blocked_terms,
       |  round(ratio, 6) AS blocked_ratio,
       |  CASE WHEN hits = 0 THEN 1 ELSE 0 END AS strict_keep,
       |  CASE WHEN ratio <= $maxRatio THEN 1 ELSE 0 END AS ratio_keep
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- information-theoretic

  /** Information-theoretic quality signals (the CCNet/RedPajama family
    * of gibberish detectors): per-doc character entropy (low = runs/
    * spam, high = random noise), word entropy, and type-token ratio.
    * All three are row-local higher-order folds over one split — no
    * shuffle before the output sort, the first-gate shape. Both
    * engines fold the distinct-symbol distribution in SORTED symbol
    * order (the RAKE sorted-fold discipline): float addition isn't
    * associative, so a nondeterministic fold order would flap the 6dp
    * gate.
    *
    * The keep band rejects BOTH tails of char entropy (repetitive spam
    * below, random noise above) plus a TTR floor — bounds loose enough
    * that natural text passes (ASCII English sits near 2.8–3.1 nats).
    */
  def entropyOf(documents: DataFrame,
                minH: Double = 1.5, maxH: Double = 4.5,
                minTtr: Double = 0.05): DataFrame = {
    // native one-pass expression — the composed aggregate/filter HOF
    // form is O(n·distinct) through the interpreted lambda evaluator
    // and read 98 s at sf0.1 (see EntropyExpr's scaladoc); identical
    // sorted-fold semantics, so the oracle twin is unchanged
    def entropy(syms: Column): Column = graft.functions.EntropyExpr.entropy(syms)
    val chars = filter(split(lower(trim(col("text"))), ""), c => c =!= "" && c =!= " ")
    val w     = words(col("text"))
    val hc    = entropy(chars)
    val hw    = entropy(w)
    val ttr   = size(array_distinct(w)).cast("double") / greatest(size(w), lit(1)).cast("double")
    documents.select(
      col("doc_id"),
      size(chars).cast("long").as("n_sym_chars"),
      round(hc, 6).as("char_entropy"),
      size(w).cast("long").as("n_words"),
      round(hw, 6).as("word_entropy"),
      round(ttr, 6).as("ttr"),
      when(hc.between(minH, maxH) && ttr >= minTtr, 1).otherwise(0).as("entropy_keep"))
      .orderBy("doc_id")
  }

  def entropyRules(t: Tables): DataFrame = entropyOf(t.documents)

  def entropySql(minH: Double = 1.5, maxH: Double = 4.5,
                 minTtr: Double = 0.05): String = {
    def entropy(syms: String) =
      s"""CASE WHEN len($syms) > 0 THEN list_reduce(
         |      list_prepend(0.0, list_transform(list_sort(list_distinct($syms)),
         |        s -> CAST(len(list_filter($syms, x -> x = s)) AS DOUBLE) / len($syms))),
         |      (acc, p) -> acc - p * ln(p)) ELSE 0.0 END""".stripMargin
    s"""WITH f AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(trim(text)), ''), c -> c <> '' AND c <> ' ') AS chars,
       |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), w -> w <> '') AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |    CAST(len(chars) AS BIGINT) AS n_sym_chars,
       |    ${entropy("chars")} AS hc,
       |    CAST(len(w) AS BIGINT) AS n_words,
       |    ${entropy("w")} AS hw,
       |    CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) AS ttr
       |  FROM f
       |)
       |SELECT doc_id, n_sym_chars,
       |  round(hc, 6) AS char_entropy,
       |  n_words,
       |  round(hw, 6) AS word_entropy,
       |  round(ttr, 6) AS ttr,
       |  CASE WHEN hc BETWEEN $minH AND $maxH AND ttr >= $minTtr
       |    THEN 1 ELSE 0 END AS entropy_keep
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- per-source pass rates

  /** Quality-rule pass rates per source — the monitoring rollup that
    * says WHICH feed needs cleaning (the per-doc queries say which
    * docs): Gopher and C4 decisions joined per doc, exact pass counts
    * per source, rates single unrounded divisions of LONGs. A source
    * whose gopher rate drops release-over-release is the drift alarm
    * `q_psi_drift` then localizes.
    */
  def passRatesBySourceOf(documents: DataFrame): DataFrame = {
    val g = gopherRulesOf(documents).select(col("doc_id"), col("gopher_pass"))
    val c = c4RulesOf(documents).select(col("doc_id"), col("c4_keep"))
    documents.select(col("doc_id"), col("source"))
      .join(g, "doc_id").join(c, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        // the per-doc flags are 0/1 INTs (the gated queries' own
        // schema) — sum them directly, both = product
        sum(col("gopher_pass").cast("long")).as("n_gopher_pass"),
        sum(col("c4_keep").cast("long")).as("n_c4_keep"),
        sum((col("gopher_pass") * col("c4_keep")).cast("long")).as("n_both"))
      .select(col("source"), col("n_docs"), col("n_gopher_pass"), col("n_c4_keep"),
        col("n_both"),
        (col("n_gopher_pass").cast("double") / col("n_docs").cast("double"))
          .as("gopher_rate"),
        (col("n_c4_keep").cast("double") / col("n_docs").cast("double"))
          .as("c4_rate"),
        (col("n_both").cast("double") / col("n_docs").cast("double"))
          .as("both_rate"))
      .orderBy("source")
  }

  def passRatesBySource(t: Tables): DataFrame = passRatesBySourceOf(t.documents)

  def passRatesBySourceSql(): String =
    s"""WITH g AS (
       |  SELECT doc_id, gopher_pass FROM (${gopherRulesSql()})
       |), c AS (
       |  SELECT doc_id, c4_keep FROM (${c4RulesSql()})
       |)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(g.gopher_pass) AS BIGINT) AS n_gopher_pass,
       |  CAST(sum(c.c4_keep) AS BIGINT) AS n_c4_keep,
       |  CAST(sum(g.gopher_pass * c.c4_keep) AS BIGINT) AS n_both,
       |  CAST(sum(g.gopher_pass) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS gopher_rate,
       |  CAST(sum(c.c4_keep) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS c4_rate,
       |  CAST(sum(g.gopher_pass * c.c4_keep) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS both_rate
       |FROM documents d JOIN g USING (doc_id) JOIN c USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ------------------------------------------------------ readability

  /** Flesch reading-ease per document — the classic readability
    * signal (Flesch 1948; used as a curation feature alongside the
    * Gopher/C4 gates):
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)
    *
    * Syllables are approximated as vowel-run count ([aeiouy]+ groups
    * in the lowercased text — the standard cheap heuristic; both
    * engines count via the same two-regex reduce: vowel runs → 'V',
    * strip non-'V', length). Sentences = count of [.!?]+ separator
    * runs (split-length − 1, identical keep-trailing-empty split
    * semantics on both engines). Entirely row-local — one projection,
    * no shuffle before the output sort, the first-gate shape like
    * [[entropyOf]]. Denominators clamp at 1; raw counts are emitted
    * unclamped so a 0-word doc is visible as such.
    */
  def readabilityOf(documents: DataFrame,
                    easyMin: Double = 70.0, hardMax: Double = 30.0): DataFrame = {
    val nWords = size(words(col("text"))).cast("long")
    val nSents = (size(split(col("text"), "[.!?]+")) - 1).cast("long")
    val nSyll = length(
      regexp_replace(regexp_replace(lower(col("text")), "[aeiouy]+", "V"),
        "[^V]", "")).cast("long")
    val wD = greatest(nWords, lit(1L)).cast("double")
    val sD = greatest(nSents, lit(1L)).cast("double")
    val flesch = lit(206.835) - lit(1.015) * (nWords.cast("double") / sD) -
      lit(84.6) * (nSyll.cast("double") / wD)
    documents.select(
      col("doc_id"),
      nWords.as("n_words"),
      nSents.as("n_sents"),
      nSyll.as("n_syllables"),
      round(flesch, 6).as("flesch"),
      when(flesch < hardMax, "difficult")
        .when(flesch < easyMin, "standard")
        .otherwise("easy").as("band"))
      .orderBy("doc_id")
  }

  def readability(t: Tables): DataFrame = readabilityOf(t.documents)

  def readabilitySql(easyMin: Double = 70.0, hardMax: Double = 30.0): String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      w -> w <> '')) AS BIGINT) AS n_words,
       |    CAST(len(regexp_split_to_array(text, '[.!?]+')) - 1 AS BIGINT) AS n_sents,
       |    CAST(length(regexp_replace(
       |      regexp_replace(lower(text), '[aeiouy]+', 'V', 'g'),
       |      '[^V]', '', 'g')) AS BIGINT) AS n_syllables
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, n_words, n_sents, n_syllables,
       |    206.835 - 1.015 * (CAST(n_words AS DOUBLE) / greatest(n_sents, 1))
       |      - 84.6 * (CAST(n_syllables AS DOUBLE) / greatest(n_words, 1)) AS fl
       |  FROM f
       |)
       |SELECT doc_id, n_words, n_sents, n_syllables,
       |  round(fl, 6) AS flesch,
       |  CASE WHEN fl < $hardMax THEN 'difficult'
       |       WHEN fl < $easyMin THEN 'standard'
       |       ELSE 'easy' END AS band
       |FROM g ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ code detect

  /** Code-vs-prose detector — the curation signal that routes
    * source-code text away from (or into) a natural-language training
    * mix (the C4/Gopher pipelines drop brace-bearing pages for this
    * reason; a code-targeted mix inverts the gate). Two surface cues,
    * both countable without parsing: the density of code punctuation
    * (`{}()[];=<>` per char) and reserved-word hits per 100 tokens
    * (`def/class/return/...` under the same `\b` ASCII word-boundary
    * semantics in Java regex and RE2). The composite
    * score = 10·symbol_ratio + kw_per_100/10 is an explicit, fixed
    * linear blend — a trained classifier would replace the weights,
    * not the plumbing. All counts are exact LONGs and the blend is
    * evaluated in identical operand order, so the `is_code` boundary
    * decision cannot diverge between engines. Entirely row-local —
    * one projection, no shuffle before the output sort, the same
    * first-gate shape as [[readabilityOf]]: at 100 TB this runs at
    * scan speed in one whole-stage-codegen'd pass.
    */
  def codeDetectOf(documents: DataFrame, tau: Double = 0.5): DataFrame = {
    val nChars = length(col("text")).cast("long")
    val nSym = size(regexp_extract_all(col("text"),
      lit("[{}()\\[\\];=<>]"), lit(0))).cast("long")
    val nKw = size(regexp_extract_all(lower(col("text")),
      lit("\\b(def|class|return|import|function|var|const|void|if|else|for|while)\\b"),
      lit(0))).cast("long")
    val nTok = size(words(col("text"))).cast("long")
    val symRatio = nSym.cast("double") / greatest(nChars, lit(1L)).cast("double")
    val kwPer100 = lit(100.0) * nKw.cast("double") /
      greatest(nTok, lit(1L)).cast("double")
    val score = lit(10.0) * symRatio + kwPer100 / lit(10.0)
    documents.select(col("doc_id"),
        nChars.as("n_chars"), nSym.as("n_symbols"),
        nKw.as("n_keywords"), nTok.as("n_tokens"),
        round(symRatio, 6).as("symbol_ratio"),
        round(kwPer100, 6).as("kw_per_100"),
        round(score, 6).as("code_score"),
        (score >= tau).as("is_code"))
      .orderBy("doc_id")
  }

  def codeDetect(t: Tables): DataFrame = codeDetectOf(t.documents)

  def codeDetectSql(tau: Double = 0.5): String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len(regexp_extract_all(text, '[{}()\\[\\];=<>]')) AS BIGINT)
       |      AS n_symbols,
       |    CAST(len(regexp_extract_all(lower(text),
       |      '\\b(def|class|return|import|function|var|const|void|if|else|for|while)\\b'))
       |      AS BIGINT) AS n_keywords,
       |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      w -> w <> '')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), g AS (
       |  SELECT doc_id, n_chars, n_symbols, n_keywords, n_tokens,
       |    CAST(n_symbols AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE)
       |      AS sym_ratio,
       |    100.0 * CAST(n_keywords AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)
       |      AS kw_per_100
       |  FROM f
       |)
       |SELECT doc_id, n_chars, n_symbols, n_keywords, n_tokens,
       |  round(sym_ratio, 6) AS symbol_ratio,
       |  round(kw_per_100, 6) AS kw_per_100,
       |  round(10.0 * sym_ratio + kw_per_100 / 10.0, 6) AS code_score,
       |  10.0 * sym_ratio + kw_per_100 / 10.0 >= $tau AS is_code
       |FROM g ORDER BY doc_id""".stripMargin
}
