package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Benchmark decontamination: find training documents that share
  * enough word-n-gram shingles with an evaluation/benchmark document
  * to be considered contaminated (the training-data-hygiene step every
  * LLM pipeline runs before a training mix is frozen).
  *
  * Scale shape — the asymmetry IS the design: benchmark suites are
  * MBs while the training corpus is the 100 TB side, so the eval
  * shingle set is broadcast and the training shingles stream past it
  * map-side. No shuffle ever carries training text; the only shuffle
  * is the (train,eval) overlap count over the matched subset, which is
  * tiny (most training shingles match nothing and die in the
  * broadcast-hash probe). Shingles are the same 60-bit md5 integers as
  * [[Dedup.shinglesOf]] — 8-byte keys, DuckDB-portable.
  */
object Decontaminate {

  /** (train_id, eval_id, n_overlap, contamination) for every pair
    * sharing ≥ `minOverlap` distinct shingles; `contamination` is the
    * fraction of the EVAL doc's shingles found in the training doc
    * (eval-centric: 1.0 = the whole benchmark item leaked).
    */
  def contaminationPairsOf(train: DataFrame, eval: DataFrame, n: Int = 3,
      minOverlap: Long = 3): DataFrame = {
    val trainSh = Dedup.shinglesOf(train, n)
      .withColumnRenamed("doc_id", "train_id")
    val evalSh = Dedup.shinglesOf(eval, n)
      .withColumnRenamed("doc_id", "eval_id")
    val evalSizes = evalSh.groupBy("eval_id").agg(count(lit(1)).as("eval_size"))
    trainSh
      .join(broadcast(evalSh), "shingle_hash")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .join(broadcast(evalSizes), "eval_id")
      .select(col("train_id"), col("eval_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("eval_size"), 6).as("contamination"))
      .orderBy("train_id", "eval_id")
  }

  /** Gated form: doc_id % 19 == 0 plays the benchmark suite, the rest
    * the training corpus, over the documents table.
    */
  def contaminationQuery(t: Tables, n: Int = 3, minOverlap: Long = 3): DataFrame = {
    val docs = t.documents
    contaminationPairsOf(
      docs.filter(col("doc_id") % 19 =!= 0),
      docs.filter(col("doc_id") % 19 === 0), n, minOverlap)
  }

  /** Bloom-filter decontamination — the scale path for when even the
    * eval SHINGLE TABLE outgrows an exact broadcast (a full benchmark
    * battery is tens of GB of shingles; a Bloom filter over them is
    * tens of MB at 1% FPR). The eval shingles aggregate into one
    * Bloom filter (Spark's own `BloomFilterAggregate` — partial
    * filters OR together map-side, so the build is one shuffle of
    * fixed-size bitmaps, not shingles), delivered to the probe side as
    * a scalar subquery — the exact mechanism Spark's runtime row-group
    * filtering uses — and every training shingle tests membership
    * map-side. No false negatives: every exactly-contaminated doc is
    * flagged (spec-pinned against [[contaminationQuery]]); false
    * positives only ever ADD candidate docs, which a second exact pass
    * over the (tiny) flagged subset would confirm. Probabilistic ⇒
    * rows-only gate, like the ANN family; the flag set itself is
    * deterministic (fixed hash seeds, order-independent OR-merge).
    */
  def bloomContaminatedDocs(t: Tables, n: Int = 3, minHits: Long = 3,
      expectedItems: Long = 200000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = t.documents
    val evalSh = Dedup.shinglesOf(docs.filter(col("doc_id") % 19 === 0), n)
    val bloomPlan = evalSh
      .agg(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(col("shingle_hash")), expectedItems)
        .toAggregateExpression()).as("bloom"))
      .queryExecution.analyzed
    val mightContain = Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan), Bridge.expression(col("shingle_hash"))))
    Dedup.shinglesOf(docs.filter(col("doc_id") % 19 =!= 0), n)
      .filter(mightContain)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bloom_hits"))
      .filter(col("n_bloom_hits") >= minHits)
      .orderBy("doc_id")
  }

  /** Per-source contamination rollup — the model-card table a release
    * review reads (share of each training source that overlaps the
    * eval suite), composed from [[contaminationQuery]]'s exact pair
    * set: distinct contaminated train docs → left join back to the
    * training manifest → per-source rate. The pair set is the
    * expensive part and it is the already-gated query; the rollup adds
    * one broadcast-sized join (contaminated ids ≪ corpus) and one
    * source-keyed aggregate of exact LONGs.
    */
  def contaminationRates(t: Tables, n: Int = 3, minOverlap: Long = 3): DataFrame = {
    val contaminated = contaminationQuery(t, n, minOverlap)
      .select(col("train_id")).distinct()
    t.documents.filter(col("doc_id") % 19 =!= 0)
      .join(broadcast(contaminated), col("doc_id") === col("train_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train_docs"),
        sum(when(col("train_id").isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .select(col("source"), col("n_train_docs"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") / col("n_train_docs"), 6)
          .as("contamination_rate"))
      .orderBy("source")
  }

  def contaminationRatesSql(n: Int = 3, minOverlap: Long = 3): String =
    s"""WITH pairs AS (${contaminationSql(n, minOverlap)}),
       |bad AS (SELECT DISTINCT train_id FROM pairs)
       |SELECT source, count(*) AS n_train_docs,
       |  CAST(sum(CASE WHEN train_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  round(CAST(sum(CASE WHEN train_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
       |    AS contamination_rate
       |FROM documents d LEFT JOIN bad ON d.doc_id = bad.train_id
       |WHERE d.doc_id % 19 <> 0
       |GROUP BY source ORDER BY source""".stripMargin

  def contaminationSql(n: Int = 3, minOverlap: Long = 3): String =
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
       |), ev AS (SELECT doc_id AS eval_id, shingle_hash FROM sh WHERE doc_id % 19 = 0),
       |tr AS (SELECT doc_id AS train_id, shingle_hash FROM sh WHERE doc_id % 19 <> 0),
       |sizes AS (SELECT eval_id, count(*) AS eval_size FROM ev GROUP BY eval_id),
       |ov AS (
       |  SELECT train_id, eval_id, count(*) AS n_overlap
       |  FROM tr JOIN ev USING (shingle_hash)
       |  GROUP BY train_id, eval_id
       |  HAVING count(*) >= $minOverlap)
       |SELECT train_id, eval_id, n_overlap,
       |  round(CAST(n_overlap AS DOUBLE) / eval_size, 6) AS contamination
       |FROM ov JOIN sizes USING (eval_id)
       |ORDER BY train_id, eval_id""".stripMargin

  /** The Bloom path's no-false-negative contract as a HASH-GATED
    * verdict set (r12 sketch-family gate): for every EXACTLY
    * contaminated training doc, `flagged` must read true from the
    * probabilistic pass. This is the strongest gate in the family —
    * the oracle RE-DERIVES the exact contaminated set itself (the
    * gated exact query's own SQL as a CTE) rather than a static grid,
    * so the hash compares real ids, and a Bloom path that dropped even
    * one contaminated doc (a broken hash seed, a mis-merged filter, a
    * wrong minHits) flips that row to false. False POSITIVES are
    * legal by design and invisible here: the bloom set only ever adds
    * candidates, which the documented second exact pass confirms.
    */
  def bloomGate(t: Tables, n: Int = 3, minOverlap: Long = 3): DataFrame = {
    val exact = contaminationQuery(t, n, minOverlap)
      .select(col("train_id").as("doc_id")).distinct()
    val bloom = bloomContaminatedDocs(t, n, minHits = minOverlap)
      .select(col("doc_id"), lit(true).as("flagged"))
    exact.join(bloom, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("flagged"), lit(false)).as("flagged"))
      .orderBy("doc_id")
  }

  def bloomGateSql(n: Int = 3, minOverlap: Long = 3): String =
    s"""SELECT DISTINCT train_id AS doc_id, true AS flagged
       |FROM (${contaminationSql(n, minOverlap)})
       |ORDER BY doc_id""".stripMargin
}
