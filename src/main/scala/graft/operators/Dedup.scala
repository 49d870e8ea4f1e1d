package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication for large-scale corpora.
  *
  * Exact dedup groups on a content hash, never the raw text: at 100 TB
  * the shuffle moves 32-char digests, not documents. Near-dup (MinHash/
  * SimHash/Jaccard) works on exploded shingles and self-joins on
  * bucket keys so candidate generation is linear-ish, not O(n²).
  * All hashing is md5-derived → bit-identical in the DuckDB oracle.
  */
object Dedup {

  /** Exact duplicate groups by content hash; keeps the smallest doc_id
    * as the canonical representative.
    */
  def exactOf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  def exact(t: Tables): DataFrame = exactOf(t.documents)

  val exactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Normalized-fingerprint dedup (case/whitespace-insensitive). */
  def byFingerprint(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), md5(TextAnalysis.normalizedText(col("text"))).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val byFingerprintSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
      |       min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Near-dup CLUSTERS from pair edges: iterative min-label
    * propagation (the GraphX connected-components algorithm as plain
    * DataFrame joins — each iteration is one co-partitioned join +
    * aggregate, converging in O(cluster diameter) rounds, which for
    * near-dup clusters is tiny). Output: (id, label) where label is
    * the smallest doc id in the component — the canonical survivor.
    */
  def nearDupClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels  = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    // ONE action per iteration: the changed-count materializes the
    // cached iteration result, and the next labels are a zero-cost
    // projection over that same cache — the previous iteration's cache
    // is dropped one step behind so no lineage ever recomputes. (The
    // driver loop itself is the fixed cost here; halving its jobs
    // halves the operator's wall time on small graphs.)
    var prevCache: DataFrame = labels
    var changed = 1L
    var i       = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      // Every 5 rounds, cut the lineage. Reason that always holds:
      // the LOGICAL plan doubles every iteration (cache only
      // short-circuits physical re-execution), so plan analysis and
      // per-action plan strings grow 2^i — the checkpoint resets the
      // plan to a leaf, capping growth at 2^5. Fault tolerance depends
      // on WHICH checkpoint: with a checkpoint dir configured
      // (sc.setCheckpointDir — any production run) this is a RELIABLE
      // checkpoint and replay after executor loss is bounded to ≤5
      // rounds; without one it falls back to localCheckpoint, which
      // stores executor-LOCAL blocks — losing an executor then fails
      // the job rather than replaying from iteration 0, an accepted
      // trade in local/test mode where there is no HDFS to write to.
      val stepped = labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
      val cut = i % 5 == 4
      val sc = stepped.sparkSession.sparkContext
      val updated =
        (if (cut && sc.getCheckpointDir.isDefined) {
          // persist first: eager checkpoint runs TWO jobs (materialize +
          // reliable write) and would otherwise recompute the iteration's
          // join from lineage for the second one. Checkpoint files live
          // until app end unless spark.cleaner.referenceTracking
          // .cleanCheckpoints=true — set it in long-running deployments.
          val persisted = stepped.persist()
          val cp = persisted.checkpoint()
          persisted.unpersist(blocking = false)
          cp
        } else if (cut) stepped.localCheckpoint()
         else stepped).cache()
      changed = updated.filter(col("label") < col("old_label")).count()
      prevCache.unpersist(blocking = false)
      prevCache = updated
      labels = updated.select(col("id"), col("label"))
      i += 1
    }
    edges.unpersist(blocking = false)
    // A component with diameter > maxIter would exit with split labels
    // (multiple "canonical" docs per real cluster) — refuse to return
    // a silently-wrong clustering.
    if (changed > 0)
      throw new IllegalStateException(
        s"nearDupClusters did not converge after $maxIter iterations " +
          s"($changed labels still changing) — raise maxIter")
    labels
  }

  /** Blocked fuzzy-duplicate pairs: candidates meet only within a
    * blocking key (first token here — at scale the blocker IS the
    * shuffle key, so edit distance runs on co-partitioned small
    * groups, never all n² pairs), then built-in `levenshtein`
    * (codegen'd) filters to ≤ maxDist.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String, maxDist: Int = 1): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      split(col(nameCol), " ").getItem(0).as("block"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= maxDist &&
        col("a.name") =!= col("b.name"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
  }

  /** Gated form of [[fuzzyPairs]]: fuzzy-duplicate DISTINCT part names
    * (canonical id = min partkey per name). Deduping the name domain
    * first keeps the pair count scale-independent — the raw id×id pair
    * set grows quadratically with block size, the name×name set
    * doesn't.
    */
  def fuzzyNamePairs(t: Tables, maxDist: Int = 3): DataFrame = {
    val names = t.part.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("id"))
      .select(col("id"), col("p_name").as("name"))
    fuzzyPairs(names, "id", "name", maxDist).orderBy("id_a", "id_b")
  }

  def fuzzyNamePairsSql(maxDist: Int = 3): String =
    s"""WITH names AS (SELECT min(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name),
       |k AS (SELECT id, name, string_split(name, ' ')[1] AS block FROM names)
       |SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
       |FROM k a JOIN k b ON a.block = b.block AND a.id < b.id
       |WHERE levenshtein(a.name, b.name) <= $maxDist AND a.name <> b.name
       |ORDER BY id_a, id_b""".stripMargin

  /** Gated form of [[nearDupClusters]]: components over the n-gram
    * Jaccard pair edges. The DuckDB oracle is a recursive-CTE
    * reachability closure + min-per-node — an independent algorithm
    * arriving at the same labels, which is exactly what makes it a
    * strong gate for the label-propagation loop.
    */
  def nearDupClustersQuery(t: Tables, n: Int = 3, threshold: Double = 0.6): DataFrame =
    nearDupClusters(ngramJaccardPairs(t, n, threshold)).orderBy("id")

  def nearDupClustersSql(n: Int = 3, threshold: Double = 0.6): String =
    s"""WITH RECURSIVE pe AS (SELECT doc_a, doc_b FROM (
       |${ngramJaccardPairsSql(n, threshold)}
       |)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pe UNION SELECT doc_b, doc_a FROM pe),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
       |)
       |SELECT id, min(r) AS label FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** Incremental dedup: drop incoming docs whose fingerprint already
    * exists in the known corpus — the production shape for continuous
    * ingestion (new crawl batch vs data lake). `known` is just the
    * fingerprint column of the existing corpus; the anti-join shuffles
    * 16-byte digests, never documents, and batch-internal duplicates
    * are collapsed first so the join side stays minimal.
    */
  def incrementalExact(newDocs: DataFrame, knownFingerprints: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fp = newDocs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      md5(TextAnalysis.normalizedText(col(textCol))).as("fp"))
    val batchUnique = fp
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
    batchUnique
      .join(knownFingerprints.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .join(fp.select("doc_id", "text"), "doc_id")
      .select("doc_id", "fp", "text")
  }

  /** Gated form of [[incrementalExact]]: even doc_ids play the known
    * corpus (only their fingerprints cross the join), odd doc_ids the
    * incoming crawl batch. Output = the batch's surviving canonical
    * rows. Oracle: the same split as two DuckDB CTEs with an
    * anti-join — batch-internal dupes collapse to min doc_id first,
    * exactly as the operator does.
    */
  def incrementalQuery(t: Tables): DataFrame = {
    val docs  = t.documents
    val known = docs.filter(col("doc_id") % 2 === 0)
      .select(md5(TextAnalysis.normalizedText(col("text"))).as("fp"))
    incrementalExact(docs.filter(col("doc_id") % 2 === 1), known)
      .select(col("doc_id"), col("fp")).orderBy("doc_id")
  }

  val incrementalSql: String =
    """WITH fp AS (
      |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents
      |), known AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
      |batch AS (
      |  SELECT min(doc_id) AS doc_id, fp FROM fp WHERE doc_id % 2 = 1 GROUP BY fp
      |)
      |SELECT doc_id, fp FROM batch ANTI JOIN known USING (fp)
      |ORDER BY doc_id""".stripMargin

  /** Repeated-span (boilerplate) detection at sub-document
    * granularity: each doc is cut into consecutive non-overlapping
    * `k`-word chunks; a chunk seen in more than one document is
    * boilerplate (license headers, navigation text, templated spans) —
    * the unit a training-data pipeline removes when whole-document
    * dedup is too coarse. Only 16-byte chunk hashes shuffle; partial
    * aggregation collapses per-partition repeats map-side. Trailing
    * sub-`k` fragments are skipped so chunk identity is
    * position-stable.
    */
  def repeatedChunksOf(docs: DataFrame, k: Int = 10): DataFrame =
    docs
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("w"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(w) + ${k - 1}) div $k - 1)")).as("i"), col("w"))
      .select(col("doc_id"), slice(col("w"), col("i") * k + 1, lit(k)).as("chunk"))
      .filter(size(col("chunk")) === k)
      .select(col("doc_id"), md5(array_join(col("chunk"), " ")).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_total"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("chunk_hash")

  def repeatedChunks(t: Tables, k: Int = 10): DataFrame = repeatedChunksOf(t.documents, k)

  def repeatedChunksSql(k: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
       |  FROM documents
       |), chunks AS (
       |  SELECT doc_id, md5(array_to_string(w[i*$k+1 : i*$k+$k], ' ')) AS chunk_hash
       |  FROM toks, unnest(range(0, (len(w)+${k - 1})//$k)) r(i)
       |  WHERE len(w[i*$k+1 : i*$k+$k]) = $k
       |)
       |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_total,
       |  min(doc_id) AS first_doc
       |FROM chunks GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1
       |ORDER BY chunk_hash""".stripMargin

  /** Exact substring-level dedup (ref v2/core/transformers.py's
    * unique-filter generalized below document granularity; the design
    * follows the published suffix-dedup recipe — Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — in
    * its scalable rolling-window form): every OVERLAPPING `k`-word
    * window is hashed; a window seen in ≥2 distinct documents marks
    * its token range as duplicated; per document, flagged ranges
    * coalesce into maximal spans — the exact byte ranges a curation
    * pass would cut, where [[repeatedChunksOf]]'s non-overlapping grid
    * only says "this doc has boilerplate somewhere near here".
    *
    * Scale shape: windows ≈ one row per corpus TOKEN, but each row is
    * (doc_id, start, 8-byte hash) — text never shuffles. The repeated
    * set comes from a map-side-combined count over window hashes; the
    * flag-back is a semi join on the hash; span coalescing is
    * gaps-and-islands under a Window PARTITIONED BY doc_id (per-doc
    * state only, never global). Contiguous windows (next start ≤
    * prev start + k) merge: their token ranges overlap or abut, so
    * the duplicated text is one unbroken span.
    */
  /** Near-dup cluster size histogram: how many clusters of each size
    * the connected-components pass produced — the one-glance dedup
    * shape report (a long tail of pairs is normal; a giant component
    * usually means boilerplate gluing unrelated docs together, the
    * known failure mode of transitive-closure dedup). Two map-side-
    * combined aggregates over the (doc, label) table; rows shrink at
    * every step.
    */
  def clusterSizeStats(t: Tables, n: Int = 3, threshold: Double = 0.6): DataFrame =
    clusterSizeStatsOf(nearDupClustersQuery(t, n, threshold))

  /** The production entry point the gated query's doc-comment points
    * at: size-histogram over an ALREADY-COMPUTED (persisted) clusters
    * table — two tiny aggregates, no re-run of the iterative
    * connected-components pass. The gated `dedup_cluster_stats`
    * composes the full pipeline so the oracle can replay it; a
    * pipeline that has written `dedup_clusters` output calls this.
    */
  def clusterSizeStatsOf(clusters: DataFrame): DataFrame =
    clusters
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("cluster_size")

  def clusterSizeStatsSql(n: Int = 3, threshold: Double = 0.6): String =
    s"""WITH clusters AS (
       |${nearDupClustersSql(n, threshold)}
       |), sizes AS (
       |  SELECT label, count(*) AS cluster_size FROM clusters GROUP BY label
       |)
       |SELECT cluster_size, count(*) AS n_clusters
       |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** MinHash-LSH band planner: for a `k`-hash signature, every
    * (bands, rowsPerBand) factorization evaluated on the S-curve
    * P(collide | J=s) = 1 − (1 − s^r)^b at the target similarity and
    * at the false-positive reference point — the table an operator of
    * [[minhashLshPairs]] reads to pick parameters instead of
    * folklore. Pure per-row math over ≤ log₂k rows; `pick = true`
    * marks the factorization maximizing recall(τ) − fp(τ_low) (ties →
    * more rows per band, i.e. the cheaper candidate set).
    */
  def lshBandPlan(k: Int = 128, tau: Double = 0.7, tauLow: Double = 0.3): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val base = (1 to k).filter(k % _ == 0)
      .map(r => ((k / r).toLong, r.toLong))
      .toDF("bands", "rows_per_band")
    def sCurve(s: Double) =
      round(lit(1.0) - pow(lit(1.0) - pow(lit(s), col("rows_per_band").cast("double")),
        col("bands").cast("double")), 6)
    val planned = base
      .withColumn("recall_at_tau", sCurve(tau))
      .withColumn("fp_at_low", sCurve(tauLow))
      .withColumn("quality", round(col("recall_at_tau") - col("fp_at_low"), 6))
    val best = planned.agg(max(struct(col("quality"), col("rows_per_band"))).as("m"))
      .select(col("m.quality").as("bq"), col("m.rows_per_band").as("br"))
    planned.crossJoin(broadcast(best))
      .withColumn("pick", col("quality") === col("bq") && col("rows_per_band") === col("br"))
      .select("bands", "rows_per_band", "recall_at_tau", "fp_at_low", "quality", "pick")
      .orderBy("rows_per_band")
  }

  def lshBandPlanSql(k: Int = 128, tau: Double = 0.7, tauLow: Double = 0.3): String = {
    val divisors = (1 to k).filter(k % _ == 0)
      .map(r => s"(${(k / r).toLong}, ${r.toLong})").mkString(", ")
    s"""WITH base AS (
       |  SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band
       |  FROM (VALUES $divisors) t(b, r)
       |), planned AS (
       |  SELECT bands, rows_per_band,
       |    round(1.0 - pow(1.0 - pow($tau, CAST(rows_per_band AS DOUBLE)), CAST(bands AS DOUBLE)), 6) AS recall_at_tau,
       |    round(1.0 - pow(1.0 - pow($tauLow, CAST(rows_per_band AS DOUBLE)), CAST(bands AS DOUBLE)), 6) AS fp_at_low
       |  FROM base
       |), q AS (
       |  SELECT *, round(recall_at_tau - fp_at_low, 6) AS quality FROM planned
       |), best AS (
       |  SELECT quality AS bq, rows_per_band AS br FROM q
       |  ORDER BY quality DESC, rows_per_band DESC LIMIT 1
       |)
       |SELECT bands, rows_per_band, recall_at_tau, fp_at_low, quality,
       |  quality = bq AND rows_per_band = br AS pick
       |FROM q CROSS JOIN best
       |ORDER BY rows_per_band""".stripMargin
  }

  /** The rolling-window table [[substringSpansOf]] is built on:
    * (doc_id, start, 8-byte win_hash), one row per overlapping k-word
    * window — text is dropped at the scan, so any downstream
    * filtering/joining moves 16-byte rows only. Exposed so composers
    * (e.g. [[Curate.curate]]) can restrict the window set (semi join
    * on ids) BEFORE span derivation without re-deriving this shape.
    */
  def windowHashesOf(docs: DataFrame, k: Int = 10): DataFrame =
    // per-window md5 is the scan stage's CPU; see [[Par.spread]]
    Par.spread(docs, "doc_id")
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(w) - $k)")).as("i"), col("w"))
      .select(col("doc_id"), col("i").cast("long").as("start"),
        conv(substring(md5(array_join(slice(col("w"), col("i") + 1, lit(k)), " ")),
          1, 15), 16, 10).cast("long").as("win_hash"))

  def substringSpansOf(docs: DataFrame, k: Int = 10): DataFrame =
    substringSpansFromWins(windowHashesOf(docs, k), k)

  /** Repeated-set → flag-back → gaps-and-islands over a prebuilt
    * window-hash table (see [[windowHashesOf]]).
    */
  def substringSpansFromWins(wins: DataFrame, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val repeated = wins
      .groupBy("win_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("win_hash")
    val flagged = wins.join(repeated, Seq("win_hash"), "left_semi")
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    flagged
      .withColumn("gap",
        when(col("start") - lag(col("start"), 1).over(byDoc) <= k, 0).otherwise(1))
      .withColumn("island", sum(col("gap")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
      .orderBy("doc_id", "span_start")
  }

  def substringSpans(t: Tables, k: Int = 10): DataFrame = substringSpansOf(t.documents, k)

  def substringSpansSql(k: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
       |  FROM documents
       |), wins AS (
       |  SELECT doc_id, i AS start,
       |    ('0x' || substr(md5(array_to_string(w[i+1 : i+$k], ' ')), 1, 15))::BIGINT AS win_hash
       |  FROM toks, unnest(range(0, len(w) - $k + 1)) r(i)
       |  WHERE len(w) >= $k
       |), repeated AS (
       |  SELECT win_hash FROM wins GROUP BY win_hash HAVING count(DISTINCT doc_id) > 1
       |), flagged AS (
       |  SELECT doc_id, start FROM wins SEMI JOIN repeated USING (win_hash)
       |), gaps AS (
       |  SELECT doc_id, start,
       |    CASE WHEN start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) <= $k
       |         THEN 0 ELSE 1 END AS gap
       |  FROM flagged
       |), islands AS (
       |  SELECT doc_id, start,
       |    sum(gap) OVER (PARTITION BY doc_id ORDER BY start) AS island
       |  FROM gaps
       |)
       |SELECT doc_id, min(start) AS span_start, max(start) + ${k - 1} AS span_end,
       |  count(*) AS n_windows
       |FROM islands GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  /** doc_id × distinct word-`n`-gram shingle (the unit for MinHash and
    * Jaccard), as a 60-bit md5-derived integer: joins/shuffles carry
    * 8-byte keys instead of 32-char digests, and the value is portable
    * (`('0x' || substr(md5(s),1,15))::BIGINT` in DuckDB).
    */
  def shinglesOf(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    // distinct happens INSIDE the expression (row-local == global here,
    // one row per doc) — no dedup shuffle before the hash.
    // NO Par.spread here (measured A/B at sf0.1: dedup_containment
    // 1.31→1.84 s, dedup_ngram_jaccard 1.15→1.68 s with a spread —
    // the shingle consumers immediately re-shuffle by shingle_hash, so
    // the extra exchange only added a stage)
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.ShinglesExpr.distinctShingles(col(textCol), n)).as("shingle"))
      .filter(col("shingle") =!= "")
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("shingle_hash"))

  def shingles(t: Tables, n: Int = 3): DataFrame = shinglesOf(t.documents, n)

  /** Stop-shingle manifest (r14) — the data-derived input to the
    * `maxShingleDf` cap on [[containmentPairsOf]] /
    * [[ngramJaccardPairsOf]] (whose scaladocs say "tune τ to the
    * corpus df tail" — this is the table that tail is read from): the
    * top-`k` shingles by document frequency, each with the ORDERED
    * self-join fan-out it would contribute (df·(df−1) — exactly the
    * quantity the cap exists to bound) and its share of the corpus's
    * total fan-out. A curation run reads the head of this table to
    * pick the cap where the share curve flattens, instead of a
    * folklore constant.
    *
    * Plan: one scan (shingles exploded row-locally, as everywhere
    * else) + one shingle-keyed aggregate (map-side combine collapses
    * per-partition repeats, so distinct-shingle rows shuffle, not
    * occurrences) + a 1-row total broadcast + a k-row TakeOrdered.
    * The shingle TEXT survives only as the aggregate key and the
    * top-k exemplar column humans read; ties at the cut break on the
    * text, so the manifest is deterministic in both engines.
    */
  def stopShingles(t: Tables, n: Int = 3, k: Int = 20): DataFrame =
    stopShinglesOf(t.documents, n, k)

  def stopShinglesOf(docs: DataFrame, n: Int, k: Int): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(graft.functions.ShinglesExpr.distinctShingles(col("text"), n)).as("shingle"))
      .filter(col("shingle") =!= "")
    val byDf = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .withColumn("fanout_rows", col("df") * (col("df") - 1))
    val tot = byDf.agg(sum(col("fanout_rows")).as("_tot"))
    byDf.crossJoin(broadcast(tot))
      .withColumn("share", round(when(col("_tot") > 0,
        col("fanout_rows").cast("double") / col("_tot")).otherwise(lit(0.0)), 6))
      .select(col("shingle"), col("df"), col("fanout_rows"), col("share"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)
  }

  def stopShinglesSql(n: Int = 3, k: Int = 20): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, shingle
       |  FROM (
       |    SELECT doc_id,
       |      array_to_string(toks[i + 1 : i + $n], ' ') AS shingle
       |    FROM (
       |      SELECT doc_id,
       |        regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |      FROM documents),
       |      unnest(range(0, len(toks) - $n + 1)) AS r(i)
       |  ) WHERE shingle <> ''
       |), bydf AS (
       |  SELECT shingle, count(*) AS df, count(*) * (count(*) - 1) AS fanout_rows
       |  FROM sh GROUP BY shingle
       |), tot AS (SELECT sum(fanout_rows) AS t FROM bydf)
       |SELECT shingle, CAST(df AS BIGINT) AS df, CAST(fanout_rows AS BIGINT) AS fanout_rows,
       |  round(CASE WHEN t > 0 THEN CAST(fanout_rows AS DOUBLE) / t ELSE 0.0 END, 6) AS share
       |FROM bydf CROSS JOIN tot
       |ORDER BY df DESC, shingle LIMIT $k""".stripMargin

  /** Word-shingle Jaccard near-duplicate pairs: explode distinct
    * shingles → self-join on shingle hash → |A∩B| per pair → Jaccard
    * with per-doc totals. Pairs emitted once (a < b). The shared-
    * shingle join is the skew point at scale — AQE skew-join splits
    * hot shingles, and `maxShingleDf` is the stop-shingle lever: a
    * shingle shared by d docs contributes d·(d−1)/2 join rows, so
    * capping document frequency at τ bounds per-key fan-out at
    * τ·(τ−1)/2 regardless of corpus size. The cap is applied before
    * BOTH the size counts and the join, i.e. Jaccard is computed
    * consistently over the capped shingle universe (hot boilerplate
    * shingles carry no similarity signal anyway — that is why
    * stop-shingles are droppable).
    */
  def ngramJaccardPairsOf(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
      maxShingleDf: Option[Long] = None): DataFrame = {
    val raw    = shinglesOf(docs, n)
    val sh     = (maxShingleDf match {
      case Some(cap) =>
        // df per shingle is a map-side-combined count on the join key;
        // the filtered set is what every downstream step sees.
        val keep = raw.groupBy("shingle_hash")
          .agg(count(lit(1)).as("df")).filter(col("df") <= cap)
          .select("shingle_hash")
        raw.join(keep, "shingle_hash").select("doc_id", "shingle_hash")
      case None => raw
    }).cache()
    val sizes  = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // pin the pair-expansion width (the jaccardPairsQuery finding,
    // guide §2.5): per-shingle fanout is d·(d−1)/2 rows, so the join's
    // ROW cost ≫ its byte size and AQE's bytes-based coalescing
    // under-parallelizes it; both join sides share this one exchange
    val shJ = sh.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("shingle_hash"))
    // The self-join side is big by construction — force a shuffle hash
    // join (hash-partition on shingle_hash; no broadcast, no sort).
    val inter  = shJ.as("a").hint("SHUFFLE_HASH")
      .join(shJ.as("b").hint("SHUFFLE_HASH"),
        col("a.shingle_hash") === col("b.shingle_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
      // raw-ratio filter to match the oracle exactly; round only for output
      .filter(col("n_common").cast("double") /
        (col("size_a") + col("size_b") - col("n_common")) >= threshold)
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")), 6))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def ngramJaccardPairs(t: Tables, n: Int = 3, threshold: Double = 0.6): DataFrame =
    ngramJaccardPairsOf(t.documents, n, threshold)

  /** Shingle containment C(A→B) = |A∩B| / |A| on ORDERED pairs — the
    * asymmetric near-dup signal Jaccard misses: a short doc fully
    * embedded in a long one scores C≈1 while Jaccard stays low because
    * the union is dominated by the long doc. Same shuffle shape as
    * [[ngramJaccardPairsOf]] (shingle-key self-join, integer keys,
    * SHUFFLE_HASH) and the same `maxShingleDf` stop-shingle lever
    * (r11 verdict #3: the scaladoc claimed the lever before the
    * signature exposed it): a shingle shared by d docs contributes
    * d·(d−1) ORDERED join rows — worse than Jaccard's d·(d−1)/2 —
    * so capping document frequency at τ bounds per-key fan-out at
    * τ·(τ−1) regardless of corpus size. As in the Jaccard form the
    * cap is applied before BOTH the per-doc sizes and the join, so
    * containment is computed consistently over the capped shingle
    * universe (a boilerplate shingle in every doc carries no
    * containment signal — that is what makes stop-shingles droppable).
    */
  def containmentPairsOf(docs: DataFrame, n: Int = 3, threshold: Double = 0.7,
      maxShingleDf: Option[Long] = None): DataFrame = {
    val raw   = shinglesOf(docs, n)
    val sh    = (maxShingleDf match {
      case Some(cap) =>
        val keep = raw.groupBy("shingle_hash")
          .agg(count(lit(1)).as("df")).filter(col("df") <= cap)
          .select("shingle_hash")
        raw.join(keep, "shingle_hash").select("doc_id", "shingle_hash")
      case None => raw
    }).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // pin the pair-expansion width — see ngramJaccardPairsOf (ordered
    // pairs: d·(d−1) fanout per shingle, rows ≫ bytes)
    val shJ = sh.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("shingle_hash"))
    shJ.as("a").hint("SHUFFLE_HASH")
      .join(shJ.as("b").hint("SHUFFLE_HASH"),
        col("a.shingle_hash") === col("b.shingle_hash") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
      // filter on the RAW ratio (like the oracle), round only for output —
      // filtering the rounded value would diverge at a τ−ε boundary
      .filter(col("n_common").cast("double") / col("size_a") >= threshold)
      .withColumn("containment", round(col("n_common").cast("double") / col("size_a"), 6))
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("containment"))
      .orderBy("doc_a", "doc_b")
  }

  def containmentPairs(t: Tables, n: Int = 3, threshold: Double = 0.7): DataFrame =
    containmentPairsOf(t.documents, n, threshold)

  /** The capped form as its own gated query (τ = [[ContainmentDfCap]]):
    * identical SQL twin with the df filter in the shingle CTE, so the
    * hash gate proves cap consistency (sizes AND join both capped)
    * against an independent engine, and the ×100 bench rung next to the
    * uncapped form evidences what the lever buys at scale. τ = 5 is
    * deliberately low for the TEST corpus — its shingle-df distribution
    * tops out at 25 (sf0.1) / 7 (sf0.01), so any τ the data never
    * reaches would leave the filter path un-exercised by both the gate
    * and the rung; production tunes τ to the corpus df tail (drop the
    * top ~0.1% hottest shingles), not to an absolute constant.
    */
  val ContainmentDfCap = 5L
  def containmentPairsCapped(t: Tables, n: Int = 3, threshold: Double = 0.7): DataFrame =
    containmentPairsOf(t.documents, n, threshold, maxShingleDf = Some(ContainmentDfCap))

  def containmentPairsSql(n: Int = 3, threshold: Double = 0.7,
      maxShingleDf: Option[Long] = None): String = {
    // the df is counted over the DISTINCT (doc, shingle) pairs — same
    // universe the Spark side counts — so the cap filter is a separate
    // CTE on sh_all, never a QUALIFY (which DuckDB evaluates before
    // DISTINCT collapses within-doc repeats)
    val shCte = maxShingleDf match {
      case Some(cap) =>
        s"""sh AS (
           |  SELECT doc_id, shingle_hash FROM sh_all
           |  WHERE shingle_hash IN (
           |    SELECT shingle_hash FROM sh_all GROUP BY shingle_hash HAVING count(*) <= $cap)
           |)""".stripMargin
      case None => "sh AS (SELECT doc_id, shingle_hash FROM sh_all)"
    }
    s"""WITH sh_all AS (
       |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle_hash
       |  FROM (
       |    SELECT doc_id,
       |      array_to_string(toks[i + 1 : i + $n], ' ') AS shingle
       |    FROM (
       |      SELECT doc_id,
       |        regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |      FROM documents),
       |      unnest(range(0, len(toks) - $n + 1)) AS r(i)
       |  ) WHERE shingle <> ''
       |), $shCte, sizes AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc_id <> b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT doc_a, doc_b, n_common,
       |  round(CAST(n_common AS DOUBLE) / sa.n_shingles, 6) AS containment
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_a
       |WHERE CAST(n_common AS DOUBLE) / sa.n_shingles >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  def ngramJaccardPairsSql(n: Int = 3, threshold: Double = 0.6): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle_hash
       |  FROM (
       |    SELECT doc_id,
       |      array_to_string(toks[i + 1 : i + $n], ' ') AS shingle
       |    FROM (
       |      SELECT doc_id,
       |        regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |      FROM documents),
       |      unnest(range(0, len(toks) - $n + 1)) AS r(i)
       |  ) WHERE shingle <> ''
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT doc_a, doc_b, n_common,
       |  round(CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common), 6) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE CAST(n_common AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_common) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- MinHash + LSH ----

  /** Portable 32-bit hash: first 8 hex chars of md5 → long. Identical
    * in DuckDB (`('0x' || substr(md5(x),1,8))::BIGINT`), which is what
    * makes the whole MinHash pipeline oracle-checkable.
    */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** MinHash hash family: ONE md5 per shingle yields a 32-bit base;
    * the k per-seed hashes are the universal family
    * h_i = (a_i·base + b_i) mod p with p = 4294967311 (prime > 2^32).
    * a_i < 2^31 keeps a_i·base < 2^63 — exact int64 arithmetic on any
    * engine, md5 cost paid once instead of k×. The per-seed constants
    * are md5-derived at plan-build time and inlined as literals in
    * both the Spark plan and the DuckDB oracle.
    */
  private val MinhashP = 4294967311L

  private def coef(tag: String, i: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
  private def aCoef(i: Int): Long = (coef("a", i) % (1L << 31)) | 1L
  private def bCoef(i: Int): Long = coef("b", i)

  private def seedHash(base: Column, i: Int): Column =
    (base * aCoef(i) + bCoef(i)) % MinhashP

  private def seedHashSql(base: String, i: Int): String =
    s"($base * ${aCoef(i)} + ${bCoef(i)}) % $MinhashP"

  /** Shingles with their 32-bit base hash (low 32 bits of the 60-bit
    * shingle hash — no second digest).
    */
  private def shingleBases(t: Tables, n: Int): DataFrame =
    shingles(t, n).withColumn("base", col("shingle_hash") % 4294967296L)

  /** Wide MinHash signature: one row per doc, k minhash columns m0..mk-1.
    * A single groupBy(doc) shuffle with map-side partial mins — the
    * k-fold work happens column-wise, never as extra rows.
    */
  def minhashWide(t: Tables, k: Int = 16, n: Int = 3): DataFrame =
    minhashWideOf(t.documents, k, n)

  /** [[minhashWide]] over an explicit `(doc_id, text)` frame — the
    * form the persistent-index build/probe path consumes.
    */
  def minhashWideOf(docs: DataFrame, k: Int = 16, n: Int = 3): DataFrame =
    shinglesOf(docs, n).withColumn("base", col("shingle_hash") % 4294967296L)
      .groupBy("doc_id")
      .agg(min(seedHash(col("base"), 0)).as("m0"),
        (1 until k).map(i => min(seedHash(col("base"), i)).as(s"m$i")): _*)

  /** One band key per (doc, band) from a wide signature: md5 over that
    * band's minhash slice. Shared by the in-memory pair join and the
    * persistent index build/probe, so an indexed corpus and a live
    * computation can never disagree on bucket identity.
    */
  private def bandKeysOfSig(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    sig.select(col("doc_id"), posexplode(array(
      (0 until bands).map { b =>
        md5(concat_ws(",",
          (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"m$i").cast("string")): _*))
      }: _*)).as(Seq("band", "band_key")))
  }

  /** MinHash signatures in long form: (doc_id, seed, minhash) —
    * unpivoted from the wide aggregate (k rows per doc AFTER the
    * shuffle, not before).
    */
  def minhash(t: Tables, k: Int = 16, n: Int = 3): DataFrame =
    minhashWide(t, k, n)
      .select(col("doc_id"), posexplode(
        array((0 until k).map(i => col(s"m$i")): _*)).as(Seq("seed", "minhash")))

  def minhashOrdered(t: Tables, k: Int = 16, n: Int = 3): DataFrame =
    minhash(t, k, n).orderBy("doc_id", "seed")

  private def shinglesCteSql(n: Int): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle_hash
       |  FROM (
       |    SELECT doc_id, array_to_string(toks[i + 1 : i + $n], ' ') AS shingle
       |    FROM (
       |      SELECT doc_id,
       |        regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |      FROM documents),
       |      unnest(range(0, len(toks) - $n + 1)) AS r(i)
       |  ) WHERE shingle <> ''
       |), based AS (
       |  SELECT doc_id, shingle_hash % 4294967296 AS base FROM sh
       |)""".stripMargin

  def minhashSql(k: Int = 16, n: Int = 3): String = {
    val seeds = (0 until k).map(i => s"($i, ${aCoef(i)}, ${bCoef(i)})").mkString(", ")
    s"""${shinglesCteSql(n)}
       |SELECT doc_id, i AS seed, min((base * a + b) % $MinhashP) AS minhash
       |FROM based, (VALUES $seeds) AS s(i, a, b)
       |GROUP BY doc_id, i
       |ORDER BY doc_id, seed""".stripMargin
  }

  /** MinHash-LSH near-dup pairs: band the k-wide signature into
    * `bands` buckets of `rowsPerBand`, bucket-join to get candidates,
    * then estimate Jaccard as the fraction of agreeing signature
    * positions. Candidate generation never compares all n² pairs —
    * only docs sharing a band bucket meet, and the band id inside the
    * join key spreads bucket skew across the shuffle.
    */
  def minhashLshPairs(t: Tables, k: Int = 16, n: Int = 3,
      rowsPerBand: Int = 2, estThreshold: Double = 0.5): DataFrame =
    minhashLshPairsFromSig(minhashWide(t, k, n).cache(), k, rowsPerBand, estThreshold)

  /** The LSH pair join from an EXISTING wide-signature table — what
    * lets a persisted signature artifact (the curate production path,
    * [[minhashIndexBuild]]'s `sigs/`) reuse the exact candidate + est
    * semantics of [[minhashLshPairs]] without re-shingling.
    */
  def minhashLshPairsFromSig(sig: DataFrame, k: Int = 16,
      rowsPerBand: Int = 2, estThreshold: Double = 0.5): DataFrame = {
    // One band key per (doc, band): md5 over that band's minhash slice.
    val bandKeys = bandKeysOfSig(sig, k, rowsPerBand)
    val cands = bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Estimated Jaccard = fraction of agreeing positions, computed
    // column-wise on the wide signatures (two hash joins, no re-agg).
    val matches = (0 until k)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands
      .join(sig.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(matches.cast("double") / k, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= estThreshold)
      .orderBy("doc_a", "doc_b")
  }

  // ---- Persistent MinHash-LSH index (batch write-once / probe-many) ----

  /** Build the on-disk MinHash-LSH index for a corpus: `bands/`
    * ((corpus_doc, band, band_key) — the bucket table candidates join
    * against) and `sigs/` (the wide signatures — what the probe's
    * est-Jaccard re-rank reads). This is the daily-ingest shape at
    * 100 TB: signatures and band keys for the accumulated corpus are
    * computed ONCE here, and every subsequent probe batch joins
    * against the artifact instead of re-shingling the whole corpus
    * the way each [[minhashLshPairs]] run does. Both tables carry only
    * fixed-width digests (never text), and `bands/` is written
    * bucketed-by-nothing deliberately: the probe join key is
    * (band, band_key), which parquet row-group stats already prune
    * poorly for random digests, so the cheap-and-uniform layout is a
    * plain partition spread (the band id inside the join key spreads
    * bucket skew across the shuffle exactly as in the in-memory form).
    * Batch twin of the streaming [[graft.streaming.Streams.buildBandIndex]]
    * seed, with the signature table added so probes can re-rank
    * without touching the corpus.
    */
  def minhashIndexBuild(docs: DataFrame, indexDir: String, k: Int = 16,
      n: Int = 3, rowsPerBand: Int = 2): Unit = {
    val sig = minhashWideOf(docs, k, n).persist()
    try {
      bandKeysOfSig(sig, k, rowsPerBand)
        .withColumnRenamed("doc_id", "corpus_doc")
        .write.mode("overwrite").parquet(s"$indexDir/bands")
      sig.withColumnRenamed("doc_id", "corpus_doc")
        .write.mode("overwrite").parquet(s"$indexDir/sigs")
      ArtifactMeta.write(docs.sparkSession, indexDir,
        Map("k" -> k, "n" -> n, "rowsPerBand" -> rowsPerBand))
    } finally { sig.unpersist(blocking = false); () }
  }

  /** Probe a batch of documents against a persisted
    * [[minhashIndexBuild]] artifact: near-dup candidates are the
    * (probe, corpus) pairs sharing any band bucket, est-Jaccard is the
    * agreeing-position fraction between the probe's freshly computed
    * signature and the INDEXED signature — the corpus is never
    * re-shingled. Emits (doc_a, doc_b) with doc_a < doc_b so that
    * probing a corpus against its own index reproduces
    * [[minhashLshPairs]] bit-for-bit (each pair is found from both
    * ends; the ordered distinct collapses them) — that equivalence is
    * the correctness oracle for the whole artifact path. Scale shape:
    * probe-side shingling is proportional to the BATCH, the index scan
    * is a column-pruned parquet read of digests, and the candidate
    * join carries (band, band_key) digest keys with AQE skew handling,
    * identical to the in-memory form.
    */
  def minhashIndexProbe(probeDocs: DataFrame, indexDir: String, k: Int = 16,
      n: Int = 3, rowsPerBand: Int = 2, estThreshold: Double = 0.5): DataFrame = {
    val spark = probeDocs.sparkSession
    // a banding mismatch vs the build makes every band key miss —
    // "zero candidates" would read as "no near-dups"; fail loudly
    ArtifactMeta.validate(spark, indexDir, "minhash-lsh index",
      Map("k" -> k, "n" -> n, "rowsPerBand" -> rowsPerBand))
    // deliberately NOT cached: this is the probe-MANY path — a cache
    // pinned here outlives the call (the returned plan references it,
    // so neither side can safely unpersist) and a daily-ingest driver
    // would leak one signature table per batch. The two uses below
    // are canonically identical aggregates, so ReusedExchange serves
    // the second from the first's shuffle output within the one plan.
    val sig = minhashWideOf(probeDocs, k, n)
    val probeKeys = bandKeysOfSig(sig, k, rowsPerBand)
    val idxBands = spark.read.parquet(s"$indexDir/bands")
    val idxSigs  = spark.read.parquet(s"$indexDir/sigs")
    // sig lookup keys stay DIRECTED (probe side → in-memory sig,
    // corpus side → artifact sig); the pair is ordered only at emit.
    // Ordering before the sig joins would look doc_a up in the probe
    // sigs, which fails whenever the corpus doc has the smaller id.
    val cands = probeKeys
      .join(idxBands, Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("corpus_doc"))
      .select(col("doc_id").as("probe_doc"), col("corpus_doc"))
      .distinct()
    val matches = (0 until k)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands
      .join(sig.as("sa"), col("probe_doc") === col("sa.doc_id"))
      .join(idxSigs.withColumnRenamed("corpus_doc", "sig_doc").as("sb"),
        col("corpus_doc") === col("sig_doc"))
      .select(least(col("probe_doc"), col("corpus_doc")).as("doc_a"),
        greatest(col("probe_doc"), col("corpus_doc")).as("doc_b"),
        round(matches.cast("double") / k, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= estThreshold)
      // self-probe finds each pair from both ends with the SAME est
      // (position agreement is symmetric) — the ordered distinct
      // collapses them to the in-memory form's one row
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Incrementally ABSORB a new batch into a persisted
    * [[minhashIndexBuild]] artifact: the batch's band keys and
    * signatures append as new parquet files — existing files are
    * never rewritten, so the append is (a) proportional to the BATCH,
    * not the corpus, and (b) safe to run while probes read the index
    * (parquet readers list files at plan time; a concurrent probe
    * sees either the old or the new file set, both consistent). This
    * is the batch twin of the streaming absorb
    * ([[graft.streaming.Streams.nearDupIngest]]); the daily shape is
    * probe-then-append: reject the batch's near-dups against the
    * index, then absorb the survivors so tomorrow's batch dedups
    * against them too. Spec pins append-then-probe ≡ probing a
    * from-scratch rebuild over the union corpus.
    */
  def minhashIndexAppend(newDocs: DataFrame, indexDir: String, k: Int = 16,
      n: Int = 3, rowsPerBand: Int = 2): Unit = {
    // appending bands built under different parameters would poison
    // the index with keys nothing can ever collide with
    ArtifactMeta.validate(newDocs.sparkSession, indexDir, "minhash-lsh index",
      Map("k" -> k, "n" -> n, "rowsPerBand" -> rowsPerBand))
    val sig = minhashWideOf(newDocs, k, n).persist()
    try {
      bandKeysOfSig(sig, k, rowsPerBand)
        .withColumnRenamed("doc_id", "corpus_doc")
        .write.mode("append").parquet(s"$indexDir/bands")
      sig.withColumnRenamed("doc_id", "corpus_doc")
        .write.mode("append").parquet(s"$indexDir/sigs")
    } finally { sig.unpersist(blocking = false); () }
  }

  /** Gated replay of the artifact path: build the index for the
    * corpus, then probe the corpus against it — by the ordered-pair
    * collapse in [[minhashIndexProbe]] this must equal
    * [[minhashLshPairs]], so the DuckDB oracle is the SAME SQL. (The
    * production path builds once and probes many; the gated form
    * rebuilds so the oracle replays the whole chain — the
    * dedup_cluster_stats precedent.) The probe side joins `sa` from
    * its own in-memory signatures and `sb` from the parquet artifact,
    * so a build/probe signature mismatch cannot hash-match.
    */
  def minhashIndexRoundTrip(t: Tables, k: Int = 16, n: Int = 3,
      rowsPerBand: Int = 2, estThreshold: Double = 0.5): DataFrame = {
    val dir = s"target/graft-lsh-index-${math.abs(t.dir.hashCode)}"
    minhashIndexBuild(t.documents, dir, k, n, rowsPerBand)
    minhashIndexProbe(t.documents, dir, k, n, rowsPerBand, estThreshold)
  }

  /** Gated dump of the index's band table (the build half of the
    * artifact on its own): one (corpus_doc, band, band_key) row per
    * band per document, ordered. Oracle: the bands CTE of
    * [[minhashLshPairsSql]].
    */
  def minhashIndexBands(t: Tables, k: Int = 16, n: Int = 3,
      rowsPerBand: Int = 2): DataFrame = {
    val dir = s"target/graft-lsh-index-${math.abs(t.dir.hashCode)}-bands"
    minhashIndexBuild(t.documents, dir, k, n, rowsPerBand)
    t.spark.read.parquet(s"$dir/bands")
      .select(col("corpus_doc"), col("band").cast("long").as("band"), col("band_key"))
      .orderBy("corpus_doc", "band")
  }

  def minhashIndexBandsSql(k: Int = 16, n: Int = 3, rowsPerBand: Int = 2): String = {
    val bands    = k / rowsPerBand
    val sigCols  = (0 until k).map(i => s"min(${seedHashSql("base", i)}) AS m$i").mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id AS corpus_doc, CAST($b AS BIGINT) AS band, md5($cols) AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""${shinglesCteSql(n)}, sig AS (
       |  SELECT doc_id, $sigCols FROM based GROUP BY doc_id
       |)
       |$bandRows
       |ORDER BY corpus_doc, band""".stripMargin
  }

  /** Per-ROW LSH band keys — the whole shingle → minhash → band chain
    * folded into one projection via the distinct-shingles expression
    * and in-expression array folds: each doc's band keys derive from
    * its own text alone, so there is NO shuffle and NO per-doc
    * aggregation state. Bit-identical to the [[minhashWide]] +
    * band-explode path (spec-pinned); this is the form a STREAMING
    * near-dup gate needs, because a stateless projection keeps the
    * stream side of a stream-static join free of stateful operators.
    * Docs with fewer than n words have no shingles and emit no keys,
    * matching the grouped path's semantics.
    */
  def bandKeysInline(docs: DataFrame, k: Int = 16, n: Int = 3,
      rowsPerBand: Int = 2): DataFrame = {
    val bands = k / rowsPerBand
    // materialize the base-hash array as a column FIRST: filter and
    // projection are separate operators, so referencing the shingle
    // expression in both would tokenize every document twice
    val bases = transform(
      graft.functions.ShinglesExpr.distinctShingles(col("text"), n),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % 4294967296L)
    val sigs = (0 until k).map(i =>
      array_min(transform(col("bases"), b => seedHash(b, i))))
    val bandKey = (b: Int) => md5(concat_ws(",",
      (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => sigs(i).cast("string")): _*))
    // shingle-less docs emit an EMPTY band array (posexplode of empty =
    // no rows) instead of being filtered out: a size() filter would be
    // pushed below the projection and re-evaluate the shingle
    // expression per row, defeating the tokenize-once structure.
    // (CollapseProject won't inline `bases` into the k references
    // either — it refuses to duplicate non-cheap expressions.)
    val bandArr = when(size(col("bases")) > 0,
      array((0 until bands).map(b => bandKey(b)): _*))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col("doc_id"), bases.as("bases"))
      .select(col("doc_id"), posexplode(bandArr).as(Seq("band", "band_key")))
  }

  def minhashLshPairsSql(k: Int = 16, n: Int = 3,
      rowsPerBand: Int = 2, estThreshold: Double = 0.5): String = {
    val bands    = k / rowsPerBand
    val sigCols  = (0 until k).map(i => s"min(${seedHashSql("base", i)}) AS m$i").mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    val matches = (0 until k)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""${shinglesCteSql(n)}, sig AS (
       |  SELECT doc_id, $sigCols FROM based GROUP BY doc_id
       |), bands AS (
       |  $bandRows
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  round(CAST($matches AS DOUBLE) / $k, 6) AS est_jaccard
       |FROM cands
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b
       |WHERE CAST($matches AS DOUBLE) / $k >= $estThreshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---- SimHash ----

  /** 32-bit SimHash over token counts: bit j of the fingerprint is the
    * sign of Σ_tokens count × (±1 by bit j of h32(token)). Pure
    * expression pipeline: tokenize → count → 32-way bit vote (one
    * groupBy doc). Near-dup = small hamming distance (spec-tested;
    * `bit_count(xor)` gives the distance).
    */
  def simhash(t: Tables): DataFrame = {
    // Wide bit votes: 32 sum columns in ONE groupBy(doc) — no 32×
    // row explosion; the fingerprint assembles from the vote signs.
    val counted = WordPipeline.tokens(t)
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", h32(col("word")))
    val votes = counted.groupBy("doc_id").agg(
      sum(when(expr(s"shiftright(h, 0) & 1") === 1, col("cnt")).otherwise(-col("cnt"))).as("v0"),
      (1 until 32).map(b =>
        sum(when(expr(s"shiftright(h, $b) & 1") === 1, col("cnt")).otherwise(-col("cnt"))).as(s"v$b")): _*)
    votes
      .select(col("doc_id"),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  val simhashSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lower(trim(w)) AS word
      |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
      |  WHERE lower(trim(w)) <> ''
      |), counted AS (
      |  SELECT doc_id, word, count(*) AS cnt,
      |    ('0x' || substr(md5(word), 1, 8))::BIGINT AS h
      |  FROM toks GROUP BY doc_id, word
      |), votes AS (
      |  SELECT doc_id, bit,
      |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN cnt ELSE -cnt END) AS vote
      |  FROM counted, unnest(range(0, 32)) AS r(bit)
      |  GROUP BY doc_id, bit
      |)
      |SELECT doc_id,
      |  CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << bit ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------- LSH candidate eval

  /** Gated evaluation of the MinHash-LSH candidate generator against
    * the exact n-gram Jaccard pairs — `embed_ann_eval`'s discipline
    * applied to the text-dedup stack: recall (what share of true
    * ≥threshold pairs the banded join surfaces) and candidate
    * precision (what share of surfaced candidates are truly near-dup).
    * Both sides are themselves hash-gated deterministic queries, so
    * the DuckDB oracle re-derives the numbers end-to-end from the two
    * oracles composed as CTEs. Counts are exact LONGs; the two rates
    * are single unrounded divisions; empty sides read NULL. This is
    * the number that justifies the band plan: if recall here drops,
    * `lsh_band_plan` picks new (bands, rows) — the eval closes that
    * loop.
    */
  def lshEvalOf(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
      k: Int = 16, rowsPerBand: Int = 2, estThreshold: Double = 0.5): DataFrame = {
    val exact = ngramJaccardPairsOf(docs, n, threshold)
      .select(col("doc_a"), col("doc_b"))
    val cand = minhashLshPairsFromSig(
        minhashWideOf(docs, k, n).cache(), k, rowsPerBand, estThreshold)
      .select(col("doc_a").as("c_a"), col("doc_b").as("c_b"))
    val hits = exact.join(cand,
      col("doc_a") === col("c_a") && col("doc_b") === col("c_b"), "inner")
    exact.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_candidates"), col("n_hit"),
        when(col("n_true") > 0,
          col("n_hit").cast("double") / col("n_true").cast("double")).as("recall"),
        when(col("n_candidates") > 0,
          col("n_hit").cast("double") / col("n_candidates").cast("double"))
          .as("candidate_precision"))
  }

  def lshEval(t: Tables): DataFrame = lshEvalOf(t.documents)

  def lshEvalSql(n: Int = 3, threshold: Double = 0.6, k: Int = 16,
      rowsPerBand: Int = 2, estThreshold: Double = 0.5): String =
    s"""WITH exact_pairs AS (
       |  SELECT doc_a, doc_b FROM (${ngramJaccardPairsSql(n, threshold)})
       |), cand AS (
       |  SELECT doc_a AS c_a, doc_b AS c_b
       |  FROM (${minhashLshPairsSql(k, n, rowsPerBand, estThreshold)})
       |), hits AS (
       |  SELECT count(*) AS n_hit
       |  FROM exact_pairs e JOIN cand c ON c.c_a = e.doc_a AND c.c_b = e.doc_b
       |)
       |SELECT (SELECT count(*) FROM exact_pairs) AS n_true,
       |  (SELECT count(*) FROM cand) AS n_candidates,
       |  n_hit,
       |  CASE WHEN (SELECT count(*) FROM exact_pairs) > 0 THEN
       |    CAST(n_hit AS DOUBLE)
       |      / CAST((SELECT count(*) FROM exact_pairs) AS DOUBLE) END AS recall,
       |  CASE WHEN (SELECT count(*) FROM cand) > 0 THEN
       |    CAST(n_hit AS DOUBLE)
       |      / CAST((SELECT count(*) FROM cand) AS DOUBLE) END AS candidate_precision
       |FROM hits""".stripMargin

  // ------------------------------------------- estimator calibration

  /** MinHash estimator calibration — how far the k-permutation
    * estimate strays from exact Jaccard on the pairs the banded join
    * actually surfaces: abs-error quantiles (exact interpolating
    * percentiles) + max over all banded candidates, est and exact
    * both taken from the two gated queries' own 6dp-rounded outputs
    * so every error value is engine-identical. This is the number
    * that justifies k=16 signatures (expected |err| ~ 1/√k ≈ 0.25
    * WORST-case band, much tighter in the high-similarity region the
    * bands select for); if p90 here widens, raise k before trusting
    * `est_jaccard` as a dedup threshold. Exact Jaccard is computed
    * once by the same co-occurrence aggregate the threshold query
    * already runs — the candidate join then SHRINKS that table.
    */
  def estCalibrationOf(docs: DataFrame, n: Int = 3, k: Int = 16,
      rowsPerBand: Int = 2): DataFrame = {
    val exact = ngramJaccardPairsOf(docs, n, 0.0)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cand = minhashLshPairsFromSig(
        minhashWideOf(docs, k, n).cache(), k, rowsPerBand, 0.0)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    cand.join(exact, Seq("doc_a", "doc_b"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(abs_err, 0.5)").as("p50_abs_err"),
        expr("percentile(abs_err, 0.9)").as("p90_abs_err"),
        max(col("abs_err")).as("max_abs_err"))
  }

  def estCalibration(t: Tables): DataFrame = estCalibrationOf(t.documents)

  def estCalibrationSql(n: Int = 3, k: Int = 16, rowsPerBand: Int = 2): String =
    s"""WITH exact_pairs AS (
       |  SELECT doc_a, doc_b, jaccard FROM (${ngramJaccardPairsSql(n, 0.0)})
       |), cand AS (
       |  SELECT doc_a, doc_b, est_jaccard
       |  FROM (${minhashLshPairsSql(k, n, rowsPerBand, 0.0)})
       |), errs AS (
       |  SELECT abs(c.est_jaccard - e.jaccard) AS abs_err
       |  FROM cand c JOIN exact_pairs e USING (doc_a, doc_b)
       |)
       |SELECT count(*) AS n_pairs,
       |  quantile_cont(abs_err, 0.5) AS p50_abs_err,
       |  quantile_cont(abs_err, 0.9) AS p90_abs_err,
       |  max(abs_err) AS max_abs_err
       |FROM errs""".stripMargin

  /** WITHIN-document repeated-span removal — the intra-doc REWRITE
    * companion to [[substringSpansOf]]'s cross-doc reporter and
    * `quality_repetition`'s scorer (Gopher/RefinedWeb pipelines run
    * exactly this cut: a crawl page repeating its own boilerplate
    * paragraph keeps ONE copy). Semantics are position-exact: every
    * overlapping `k`-token window is hashed; a window whose hash
    * already occurred EARLIER in the same document marks its token
    * range; marked ranges coalesce into maximal spans; the rewrite
    * keeps every unmarked token in original order. Position 0 can
    * never be marked (the first window is by definition a first
    * occurrence), so the kept text is never empty.
    *
    * The gate pins the rewrite itself, not just counts: `kept_fp` is
    * the md5 of the kept tokens in order — any off-by-one in span
    * arithmetic or ordering moves it.
    *
    * Scale shape: windows are (doc_id, start, hash) rows — one per
    * corpus token, text never in the exploded stream; both windows
    * (first-occurrence min and islands) are PARTITIONED BY doc_id, so
    * state is per-doc, never global; the only doc-sized rows are the
    * final kept-text assembly, which any rewrite must materialize
    * anyway (and which stays one map-side array op per doc).
    */
  def withinDocDedup(t: Tables, k: Int = 3): DataFrame =
    withinDocDedupOf(t.documents, k)

  def withinDocDedupOf(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("w"))
      .filter(size(col("w")) >= k)
    val wins = toks
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0, size(w) - $k)")).as("j"))
      .select(col("doc_id"), col("j"),
        md5(array_join(slice(col("w"), col("j") + 1, lit(k)), " ")).as("h"))
    val wFirst = Window.partitionBy(col("doc_id"), col("h"))
    val marked = wins
      .withColumn("first_j", min(col("j")).over(wFirst))
      .filter(col("j") > col("first_j"))
      .select(col("doc_id"), explode(expr(s"sequence(j, j + ${k - 1})")).as("pos"))
      .distinct()
    val wPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      .withColumn("grp", col("pos") - row_number().over(wPos))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("cut_tokens"),
        countDistinct(col("grp")).as("n_spans"))
    val cuts = marked.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cuts"))
    val kept = toks.join(cuts, Seq("doc_id"))
      .withColumn("keptArr", expr("filter(w, (x, i) -> NOT array_contains(cuts, i))"))
      .select(col("doc_id"),
        size(col("keptArr")).cast("long").as("kept_tokens"),
        md5(array_join(col("keptArr"), " ")).as("kept_fp"))
    spans.join(kept, Seq("doc_id"))
      .select("doc_id", "cut_tokens", "n_spans", "kept_tokens", "kept_fp")
      .orderBy("doc_id")
  }

  def withinDocDedupSql(k: Int = 3): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    regexp_split_to_array(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, w, len(w) AS n FROM d WHERE len(w) >= $k
       |), wins AS (
       |  SELECT doc_id, i AS j, md5(array_to_string(w[i + 1 : i + $k], ' ')) AS h
       |  FROM t, unnest(range(0, n - $k + 1)) r(i)
       |), dup AS (
       |  SELECT doc_id, j FROM (
       |    SELECT doc_id, j, min(j) OVER (PARTITION BY doc_id, h) AS fj FROM wins)
       |  WHERE j > fj
       |), marked AS (
       |  SELECT DISTINCT doc_id, j + o AS pos FROM dup, unnest(range(0, $k)) r(o)
       |), spans AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS cut_tokens,
       |    CAST(count(DISTINCT grp) AS BIGINT) AS n_spans
       |  FROM (SELECT doc_id, pos,
       |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |        FROM marked)
       |  GROUP BY doc_id
       |), posx AS (
       |  SELECT doc_id, i AS p, w[i + 1] AS tok FROM t, unnest(range(0, n)) r(i)
       |), kept AS (
       |  SELECT posx.doc_id, p, tok
       |  FROM posx LEFT JOIN marked m ON m.doc_id = posx.doc_id AND m.pos = posx.p
       |  WHERE m.pos IS NULL
       |), keptagg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
       |    md5(string_agg(tok, ' ' ORDER BY p)) AS kept_fp
       |  FROM kept GROUP BY doc_id
       |)
       |SELECT s.doc_id, s.cut_tokens, s.n_spans, ka.kept_tokens, ka.kept_fp
       |FROM spans s JOIN keptagg ka ON ka.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------- cross-doc sentence dedup

  /** CCNet-style corpus-level SENTENCE dedup — the grain between
    * doc-level fingerprints and k-word substring spans: a normalized
    * sentence occurring in ≥ `minDocs` DISTINCT documents is shared
    * boilerplate (cookie banners, license footers) and is dropped
    * from every document that carries it. Only sentences of
    * ≥ `minChars` chars participate — short interjections ("Yes.")
    * would otherwise be spuriously corpus-frequent.
    *
    * Scale shape: sentences reduce to (md5, doc_id, len) AT THE SCAN
    * — no sentence text ever shuffles; the df aggregate and the
    * drop-set membership join both key on the 32-char digest, and
    * the per-doc manifest is one doc-keyed aggregate. Identical at
    * 100 TB: the df table is vocabulary-sized (distinct sentences),
    * not corpus-sized. The companion of [[FileCorpus.dedupLines]]
    * (file grain) and [[substringSpansOf]] (span grain).
    */
  def dedupSentencesOf(docs: DataFrame, minDocs: Long = 3L,
                       minChars: Int = 20): DataFrame = {
    val sents = docs
      .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("s0"))
      .select(col("doc_id"), trim(regexp_replace(col("s0"), "\\s+", " ")).as("s"))
      .filter(col("s") =!= "")
      .select(col("doc_id"), md5(lower(col("s"))).as("h"),
        length(col("s")).cast("long").as("len"))
    val dropSet = sents.filter(col("len") >= minChars)
      .select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("h"), lit(1).as("is_dup"))
    val dropped = col("is_dup").isNotNull && col("len") >= minChars
    val perDoc = sents
      .join(dropSet, Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sents"),
        sum(when(col("len") >= minChars, 1L).otherwise(0L)).as("n_eligible"),
        sum(when(dropped, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(dropped, col("len")).otherwise(0L)).as("chars_dropped"),
        sum(when(!dropped, col("len")).otherwise(0L)).as("chars_kept"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_eligible"), lit(0L)).as("n_eligible"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("chars_dropped"), lit(0L)).as("chars_dropped"),
        coalesce(col("chars_kept"), lit(0L)).as("chars_kept"),
        round(coalesce(col("n_dropped"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_eligible"), lit(0L)), lit(1L)).cast("double"), 6)
          .as("drop_share"))
      .orderBy("doc_id")
  }

  def dedupSentences(t: graft.sources.Tables): DataFrame =
    dedupSentencesOf(t.documents)

  def dedupSentencesSql(minDocs: Long = 3L, minChars: Int = 20): String =
    s"""WITH s0 AS (
       |  SELECT doc_id, trim(regexp_replace(s, '\\s+', ' ', 'g')) AS s
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]+')) AS s
       |        FROM documents)
       |), sents AS (
       |  SELECT doc_id, md5(lower(s)) AS h, CAST(length(s) AS BIGINT) AS len
       |  FROM s0 WHERE s <> ''
       |), dup AS (
       |  SELECT h FROM (
       |    SELECT h, count(DISTINCT doc_id) AS df FROM sents
       |    WHERE len >= $minChars GROUP BY h)
       |  WHERE df >= $minDocs
       |), flagged AS (
       |  SELECT s.doc_id, s.len,
       |    CASE WHEN d.h IS NOT NULL AND s.len >= $minChars THEN 1 ELSE 0 END AS drp
       |  FROM sents s LEFT JOIN dup d ON s.h = d.h
       |), pd AS (
       |  SELECT doc_id, count(*) AS n_sents,
       |    CAST(sum(CASE WHEN len >= $minChars THEN 1 ELSE 0 END) AS BIGINT) AS n_eligible,
       |    CAST(sum(drp) AS BIGINT) AS n_dropped,
       |    CAST(sum(CASE WHEN drp = 1 THEN len ELSE 0 END) AS BIGINT) AS chars_dropped,
       |    CAST(sum(CASE WHEN drp = 0 THEN len ELSE 0 END) AS BIGINT) AS chars_kept
       |  FROM flagged GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  coalesce(pd.n_sents, 0) AS n_sents,
       |  coalesce(pd.n_eligible, 0) AS n_eligible,
       |  coalesce(pd.n_dropped, 0) AS n_dropped,
       |  coalesce(pd.chars_dropped, 0) AS chars_dropped,
       |  coalesce(pd.chars_kept, 0) AS chars_kept,
       |  round(CAST(coalesce(pd.n_dropped, 0) AS DOUBLE)
       |    / greatest(coalesce(pd.n_eligible, 0), 1), 6) AS drop_share
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
}
