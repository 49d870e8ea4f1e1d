package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Incremental-maintenance operators: CDC snapshot merge and
  * deterministic stratified sampling — the bookkeeping half of a
  * continuously-ingesting training-data pipeline (the reference's
  * loaders only ever append — v2/core/loaders; these are the
  * update/delete and re-balance shapes appends eventually need).
  */
object Incremental {

  /** CDC snapshot merge (upsert/delete): apply a change LOG to a base
    * snapshot, latest-wins per key. The driver-gated form derives both
    * inputs from `documents` deterministically:
    *   base      = docs with doc_id % 4 != 0 (yesterday's snapshot)
    *   changelog = two generations of changes over the even ids —
    *     seq 1 upserts (n_chars + 1000); seq 2 DELETES ids % 6 == 0
    *     and re-upserts ids % 10 == 0 (n_chars + 2000)
    *   so the merge exercises every CDC case: insert (even ids the
    *   base never had), update, delete, and a later change overriding
    *   an earlier one.
    *
    * Scale shape: latest-wins is ONE map-side-combined max(struct(seq,
    * …)) aggregate over the log — no window, no per-key sort; the
    * merge is an anti join of base against change keys plus the
    * surviving upserts — key-only shuffles. This is the standard
    * lakehouse MERGE plan (Delta/Iceberg express the same thing with a
    * file-level pre-prune on top).
    */
  def mergeUpsertOf(base: DataFrame, changes: DataFrame): DataFrame = {
    // latest change per key: max over (seq, op, payload...) structs —
    // seq is the leading field, so struct-max IS latest-wins, and ties
    // cannot exist (seq unique per key by contract)
    val latest = changes
      .groupBy("doc_id")
      .agg(max(struct(col("seq"), col("op"), col("lang"), col("source"), col("n_chars")))
        .as("c"))
      .select(col("doc_id"), col("c.op").as("op"), col("c.lang").as("lang"),
        col("c.source").as("source"), col("c.n_chars").as("n_chars"))
    base.join(latest.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(latest.filter(col("op") === "u")
        .select("doc_id", "lang", "source", "n_chars"))
      .orderBy("doc_id")
  }

  def mergeUpsert(t: Tables): DataFrame = {
    val docs = t.documents.select("doc_id", "lang", "source", "n_chars")
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val gen1 = evens.select(col("doc_id"), lit(1L).as("seq"), lit("u").as("op"),
      col("lang"), col("source"), (col("n_chars") + 1000).as("n_chars"))
    val gen2del = evens.filter(col("doc_id") % 6 === 0)
      .select(col("doc_id"), lit(2L).as("seq"), lit("d").as("op"),
        col("lang"), col("source"), col("n_chars"))
    val gen2upd = evens.filter(col("doc_id") % 10 === 0 && col("doc_id") % 6 =!= 0)
      .select(col("doc_id"), lit(2L).as("seq"), lit("u").as("op"),
        col("lang"), col("source"), (col("n_chars") + 2000).as("n_chars"))
    mergeUpsertOf(base, gen1.unionByName(gen2del).unionByName(gen2upd))
  }

  val mergeUpsertSql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 4 <> 0
      |), evens AS (
      |  SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 2 = 0
      |), changelog AS (
      |  SELECT doc_id, 1 AS seq, 'u' AS op, lang, source, n_chars + 1000 AS n_chars FROM evens
      |  UNION ALL
      |  SELECT doc_id, 2, 'd', lang, source, n_chars FROM evens WHERE doc_id % 6 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'u', lang, source, n_chars + 2000 FROM evens
      |  WHERE doc_id % 10 = 0 AND doc_id % 6 <> 0
      |), latest AS (
      |  SELECT doc_id, op, lang, source, n_chars FROM (
      |    SELECT doc_id, op, lang, source, n_chars,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
      |    FROM changelog)
      |  WHERE rn = 1
      |)
      |SELECT b.doc_id AS doc_id, b.lang AS lang, b.source AS source, b.n_chars AS n_chars
      |FROM base b ANTI JOIN latest l ON b.doc_id = l.doc_id
      |UNION ALL
      |SELECT doc_id, lang, source, n_chars FROM latest WHERE op = 'u'
      |ORDER BY doc_id""".stripMargin

  /** SCD Type-2 snapshot merge — the versioned-dimension twin of
    * [[mergeUpsertOf]]: apply a NEW full snapshot to a
    * validity-ranged dimension, closing changed/absent versions at
    * the snapshot date and opening new ones. The four cases a
    * Kimball-style dimension load must handle:
    *   unchanged  → current row rides through untouched
    *   changed    → current row closes (valid_to = asOf), a new
    *                current version opens at asOf
    *   absent     → current row closes (full-snapshot semantics: not
    *                in the feed ⇒ gone from the source)
    *   new key    → a first version opens at asOf
    * History rows (is_current = false on input) ride through
    * untouched — the merge only ever touches the current generation.
    *
    * Scale shape: one inner join + two anti joins of the CURRENT
    * slice against the snapshot, all on the dimension key — key-only
    * shuffles, and under AQE the three branches reuse the same two
    * exchanges. No window anywhere: SCD2 needs per-key latest, and
    * the current-generation invariant (exactly one open row per key)
    * supplies it structurally.
    */
  def scd2Of(dim: DataFrame, snapshot: DataFrame, asOf: String): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val snap = snapshot.select(col("key"), col("attr").as("new_attr"))
    val matched = current.join(snap, Seq("key"))
    val closeDate = lit(asOf).cast("date")
    val unchanged = matched.filter(col("attr") === col("new_attr"))
      .select(col("key"), col("attr"), col("valid_from"), col("valid_to"), col("is_current"))
    val closedChanged = matched.filter(col("attr") =!= col("new_attr"))
      .select(col("key"), col("attr"), col("valid_from"),
        closeDate.as("valid_to"), lit(false).as("is_current"))
    val openedChanged = matched.filter(col("attr") =!= col("new_attr"))
      .select(col("key"), col("new_attr").as("attr"), closeDate.as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    val closedAbsent = current.join(snap.select("key"), Seq("key"), "left_anti")
      .select(col("key"), col("attr"), col("valid_from"),
        closeDate.as("valid_to"), lit(false).as("is_current"))
    val openedNew = snap.join(current.select("key"), Seq("key"), "left_anti")
      .select(col("key"), col("new_attr").as("attr"), closeDate.as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    history.select("key", "attr", "valid_from", "valid_to", "is_current")
      .unionByName(unchanged).unionByName(closedChanged).unionByName(openedChanged)
      .unionByName(closedAbsent).unionByName(openedNew)
      .orderBy("key", "valid_from")
  }

  /** Gated form: the customer dimension versioned on account balance.
    * Base generation opens 1995-01-01; the incoming snapshot moves
    * every 3rd balance by +100 (exact 2dp arithmetic), drops every
    * 7th customer, and introduces a new key (custkey + 1000000) for
    * every 5th — so all four SCD2 cases occur, plus a pre-existing
    * closed history row that must ride through untouched.
    */
  def mergeScd2(t: Tables): DataFrame = {
    val cust = t.customer.select(col("c_custkey").as("key"), col("c_acctbal").as("attr"))
    val dim = cust
      .select(col("key"), col("attr"),
        lit("1995-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
      .unionByName(
        // planted history: an older closed version for every 11th key
        cust.filter(col("key") % 11 === 0)
          .select(col("key"), (col("attr") - 500).as("attr"),
            lit("1994-01-01").cast("date").as("valid_from"),
            lit("1995-01-01").cast("date").as("valid_to"), lit(false).as("is_current")))
    val snapshot = cust.filter(col("key") % 7 =!= 0)
      .select(col("key"),
        when(col("key") % 3 === 0, col("attr") + 100).otherwise(col("attr")).as("attr"))
      .unionByName(cust.filter(col("key") % 5 === 0)
        .select((col("key") + 1000000L).as("key"), col("attr")))
    scd2Of(dim, snapshot, "1996-06-01")
  }

  val mergeScd2Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey AS key, c_acctbal AS attr FROM customer
      |), dim AS (
      |  SELECT key, attr, DATE '1995-01-01' AS valid_from,
      |    CAST(NULL AS DATE) AS valid_to, true AS is_current FROM cust
      |  UNION ALL
      |  SELECT key, attr - 500, DATE '1994-01-01', DATE '1995-01-01', false
      |  FROM cust WHERE key % 11 = 0
      |), snap AS (
      |  SELECT key, CASE WHEN key % 3 = 0 THEN attr + 100 ELSE attr END AS new_attr
      |  FROM cust WHERE key % 7 <> 0
      |  UNION ALL
      |  SELECT key + 1000000, attr FROM cust WHERE key % 5 = 0
      |), current AS (SELECT * FROM dim WHERE is_current
      |), history AS (SELECT * FROM dim WHERE NOT is_current
      |), matched AS (
      |  SELECT c.key, c.attr, c.valid_from, s.new_attr
      |  FROM current c JOIN snap s ON c.key = s.key
      |)
      |SELECT key, attr, valid_from, valid_to, is_current FROM history
      |UNION ALL
      |SELECT key, attr, valid_from, NULL, true FROM matched WHERE attr = new_attr
      |UNION ALL
      |SELECT key, attr, valid_from, DATE '1996-06-01', false FROM matched WHERE attr <> new_attr
      |UNION ALL
      |SELECT key, new_attr, DATE '1996-06-01', NULL, true FROM matched WHERE attr <> new_attr
      |UNION ALL
      |SELECT c.key, c.attr, c.valid_from, DATE '1996-06-01', false
      |FROM current c ANTI JOIN snap s ON c.key = s.key
      |UNION ALL
      |SELECT s.key, s.new_attr, DATE '1996-06-01', NULL, true
      |FROM snap s ANTI JOIN current c ON s.key = c.key
      |ORDER BY key, valid_from""".stripMargin

  /** Right-to-be-forgotten purge audit: given a deletion cohort (the
    * gate derives it deterministically — every 13th customer), count
    * the rows each table would lose, including the rows reached only
    * THROUGH another table (lineitems of the purged customers'
    * orders — the cascade a compliance pipeline must follow). Counts,
    * not the deletes themselves: the report is the audit artifact; the
    * deletes are `left_anti` joins with exactly these shapes. Scale:
    * the cohort is an id list (broadcast against customer; the
    * orders/lineitem probes are key joins), rows never widen.
    */
  def purgeUser(t: Tables): DataFrame = {
    val cohort = t.customer.filter(col("c_custkey") % 13 === 0)
      .select(col("c_custkey").as("k"))
    val custRows = t.customer.join(cohort, col("c_custkey") === col("k"), "left_semi")
      .agg(count(lit(1)).as("n_rows")).select(lit("customer").as("table"), col("n_rows"))
    val orderRows = t.orders.join(cohort, col("o_custkey") === col("k"), "left_semi")
      .agg(count(lit(1)).as("n_rows")).select(lit("orders").as("table"), col("n_rows"))
    val lineRows = t.lineitem.join(
        t.orders.join(cohort, col("o_custkey") === col("k"), "left_semi")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_rows")).select(lit("lineitem").as("table"), col("n_rows"))
    val evRows = t.events.join(cohort, col("user_id") === col("k"), "left_semi")
      .agg(count(lit(1)).as("n_rows")).select(lit("events").as("table"), col("n_rows"))
    custRows.unionByName(orderRows).unionByName(lineRows).unionByName(evRows)
      .orderBy("table")
  }

  val purgeUserSql: String =
    """WITH cohort AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 13 = 0),
      |po AS (SELECT o_orderkey FROM orders SEMI JOIN cohort ON o_custkey = k)
      |SELECT 'customer' AS "table", count(*) AS n_rows FROM customer SEMI JOIN cohort ON c_custkey = k
      |UNION ALL
      |SELECT 'orders', count(*) FROM orders SEMI JOIN cohort ON o_custkey = k
      |UNION ALL
      |SELECT 'lineitem', count(*) FROM lineitem SEMI JOIN po ON l_orderkey = o_orderkey
      |UNION ALL
      |SELECT 'events', count(*) FROM events SEMI JOIN cohort ON user_id = k
      |ORDER BY "table"""".stripMargin

  /** Declarative data-quality expectations (the Deequ/Great-
    * Expectations shape): each constraint evaluates to a measured
    * metric and a pass flag IN ONE map-side-combined aggregate pass
    * over the table — violations never materialize, nothing but the
    * final constraint rows leaves the executors. The suite here pins
    * the documents table's contract: completeness (no null text/
    * source), uniqueness of doc_id, n_chars consistency with the
    * text column, and a bounded lang domain.
    */
  def expectations(t: Tables): DataFrame = {
    val d = t.documents
    val agg = d.agg(
      count(lit(1)).as("n"),
      sum(when(col("text").isNull || col("source").isNull, 1L).otherwise(0L)).as("null_rows"),
      countDistinct(col("doc_id")).as("distinct_ids"),
      sum(when(length(col("text")) =!= col("n_chars"), 1L).otherwise(0L)).as("bad_len"),
      sum(when(!col("lang").isin("en", "fr", "es", "de", "zh", "ar"), 1L).otherwise(0L))
        .as("bad_lang"))
    agg.select(
      array(
        struct(lit("completeness_text_source").as("constraint"),
          col("null_rows").cast("double").as("metric"),
          (col("null_rows") === 0).as("pass")),
        struct(lit("uniqueness_doc_id").as("constraint"),
          col("distinct_ids").cast("double").as("metric"),
          (col("distinct_ids") === col("n")).as("pass")),
        struct(lit("consistency_n_chars").as("constraint"),
          col("bad_len").cast("double").as("metric"),
          (col("bad_len") === 0).as("pass")),
        struct(lit("domain_lang").as("constraint"),
          col("bad_lang").cast("double").as("metric"),
          (col("bad_lang") === 0).as("pass"))).as("cs"))
      .select(explode(col("cs")).as("c"))
      .select(col("c.constraint").as("constraint"), col("c.metric").as("metric"),
        col("c.pass").as("pass"))
      .orderBy("constraint")
  }

  val expectationsSql: String =
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN text IS NULL OR source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rows,
      |    count(DISTINCT doc_id) AS distinct_ids,
      |    CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS bad_len,
      |    CAST(sum(CASE WHEN lang NOT IN ('en','fr','es','de','zh','ar') THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang
      |  FROM documents
      |)
      |SELECT 'completeness_text_source' AS "constraint", CAST(null_rows AS DOUBLE) AS metric, null_rows = 0 AS pass FROM a
      |UNION ALL
      |SELECT 'uniqueness_doc_id', CAST(distinct_ids AS DOUBLE), distinct_ids = n FROM a
      |UNION ALL
      |SELECT 'consistency_n_chars', CAST(bad_len AS DOUBLE), bad_len = 0 FROM a
      |UNION ALL
      |SELECT 'domain_lang', CAST(bad_lang AS DOUBLE), bad_lang = 0 FROM a
      |ORDER BY "constraint"""".stripMargin

  /** Corpus snapshot diff — the data-versioning query behind every
    * "what changed since the last crawl" audit: two snapshots compared
    * by key and content fingerprint into added / removed / changed
    * counts per source, plus total byte drift. The gate derives the
    * "previous" snapshot deterministically (odd ids only, every 6th
    * doc's text perturbed via its fingerprint) so all three diff
    * classes are exercised. One full-outer join on doc_id; only
    * (doc_id, 16-byte fp, n_chars) rows shuffle — text is reduced to
    * its digest at the scan.
    */
  def snapshotDiff(t: Tables): DataFrame = {
    def fingerprinted(df: DataFrame): DataFrame = df.select(
      col("doc_id"), col("source"),
      md5(TextAnalysis.normalizedText(col("text"))).as("fp"), col("n_chars"))
    val current = fingerprinted(t.documents)
    // previous snapshot: evens are new this crawl (absent before);
    // every 6th odd doc re-crawled with different content (fp of the
    // fp — deterministic, engine-portable); plus phantom docs at
    // offset ids that this crawl no longer has (the removed class)
    val previous = fingerprinted(t.documents)
      .filter(col("doc_id") % 2 === 1)
      .withColumn("fp", when(col("doc_id") % 6 === 3, md5(col("fp"))).otherwise(col("fp")))
      .unionByName(fingerprinted(t.documents)
        .filter(col("doc_id") % 40 === 1)
        .withColumn("doc_id", col("doc_id") + 5000000L))
    current.select(col("doc_id"), col("source").as("src_cur"), col("fp").as("fp_cur"),
        col("n_chars").as("nc_cur"))
      .join(previous.select(col("doc_id"), col("source").as("src_prev"),
        col("fp").as("fp_prev"), col("n_chars").as("nc_prev")), Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_cur"), col("src_prev")).as("source"),
        when(col("fp_prev").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_cur") =!= col("fp_prev"), "changed")
          .otherwise("unchanged").as("change"),
        coalesce(col("nc_cur"), lit(0L)).as("nc_cur"),
        coalesce(col("nc_prev"), lit(0L)).as("nc_prev"))
      .filter(col("change") =!= "unchanged")
      .groupBy("source", "change")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc_cur") - col("nc_prev")).as("byte_drift"))
      .orderBy("source", "change")
  }

  val snapshotDiffSql: String =
    """WITH cur AS (
      |  SELECT doc_id, source,
      |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp, n_chars
      |  FROM documents
      |), prev AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 6 = 3 THEN md5(fp) ELSE fp END AS fp, n_chars
      |  FROM cur WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id + 5000000, source, fp, n_chars
      |  FROM cur WHERE doc_id % 40 = 1
      |), diff AS (
      |  SELECT coalesce(c.source, p.source) AS source,
      |    CASE WHEN p.fp IS NULL THEN 'added'
      |         WHEN c.fp IS NULL THEN 'removed'
      |         WHEN c.fp <> p.fp THEN 'changed'
      |         ELSE 'unchanged' END AS change,
      |    coalesce(c.n_chars, 0) AS nc_cur, coalesce(p.n_chars, 0) AS nc_prev
      |  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
      |)
      |SELECT source, change, count(*) AS n_docs,
      |  CAST(sum(nc_cur - nc_prev) AS BIGINT) AS byte_drift
      |FROM diff WHERE change <> 'unchanged'
      |GROUP BY source, change ORDER BY source, change""".stripMargin

  /** Deterministic stratified sample: up to `n` docs per stratum
    * (source), chosen by md5-hash order so the pick is reproducible
    * across runs, engines and cluster sizes. Two phases so no stratum
    * is ever globally sorted: (1) per-stratum counts (broadcast-sized)
    * set a hash-threshold that passes ~`oversample`·n candidates;
    * (2) only the candidates are ranked (tiny per-stratum windows) and
    * capped at n. The threshold arithmetic is fixed-point (integer
    * hash against a rounded rate) and the ORACLE APPLIES THE SAME
    * FORMULA, so both engines pick identical rows even in the
    * (vanishingly rare, deliberately accepted) case where the bound
    * admits fewer than n — the trade that keeps phase 2's window input
    * O(n) per stratum instead of the whole stratum.
    */
  def stratifiedSample(t: Tables, n: Int = 20, oversample: Int = 8): DataFrame = {
    val u = conv(substring(md5(concat(lit("strat:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    val counts = t.documents.groupBy("source").agg(count(lit(1)).as("n_g"))
      .select(col("source"),
        round(least(lit(1.0), lit(n.toDouble * oversample) / col("n_g")), 9).as("rate"))
    val w = Window.partitionBy(col("source")).orderBy(col("u"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("source"), u.as("u"))
      .join(broadcast(counts), "source")
      .filter(col("u") < col("rate"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk")
  }

  def stratifiedSampleSql(n: Int = 20, oversample: Int = 8): String =
    s"""WITH u AS (
       |  SELECT doc_id, source,
       |    ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      / 1152921504606846976.0 AS u
       |  FROM documents
       |), rates AS (
       |  SELECT source, round(least(1.0, ${n.toDouble * oversample} / count(*)), 9) AS rate
       |  FROM documents GROUP BY source
       |), ranked AS (
       |  SELECT u.source, u.doc_id,
       |    row_number() OVER (PARTITION BY u.source ORDER BY u.u, u.doc_id) AS rk
       |  FROM u JOIN rates r ON u.source = r.source
       |  WHERE u.u < r.rate
       |)
       |SELECT source, rk, doc_id FROM ranked WHERE rk <= $n
       |ORDER BY source, rk""".stripMargin
}
