package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout clustering for scan pruning at rest.
  *
  * Sorting 100 TB by one key gives perfect pruning on that key and
  * none on any other; interleaving the bits of two keys (a Z-order /
  * Morton curve) gives *both* dimensions locality, so parquet
  * row-group min/max stats prune selective filters on either column.
  * The z-value is pure column math (portable to the oracle, codegen'd
  * in Spark); the layout step is `repartitionByRange(zval)` +
  * `sortWithinPartitions`, i.e. exactly what a writer does before
  * `partitioned_write`.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative ints:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. Expressed as
    * floor-div/mod arithmetic (not shifts) because both engines then
    * evaluate the identical formula; powers of two are exact doubles
    * so the long casts are exact.
    */
  def zvalue(x: Column, y: Column, bits: Int = 10): Column =
    // statically unrolled (bits is a plan-time constant): a flat sum of
    // codegen'd arithmetic, where a higher-order fold would run
    // interpreted per row
    (0 until bits).map { i =>
      pmod(floor(x / lit(math.pow(2.0, i))).cast("long"), lit(2L)) * lit(1L << (2 * i)) +
        pmod(floor(y / lit(math.pow(2.0, i))).cast("long"), lit(2L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** Cluster rows along the z-curve of the two columns: range-
    * partition on the z-value (balanced output files), sort within
    * partitions (row-group locality inside each file).
    */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String, bits: Int = 10,
      partitions: Int = 32): DataFrame = {
    val z = df.withColumn("_z", zvalue(col(xCol), col(yCol), bits))
    z.repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Gated z-value computation over events (dims: user bucket × value
    * bucket). The layout operator itself is spec-gated on pruning
    * effectiveness — per-partition bounding boxes, LayoutSpec.
    */
  def qZorder(t: Tables, bits: Int = 10): DataFrame =
    t.events
      .select(col("event_id"),
        pmod(col("user_id"), lit(1024L)).as("ux"),
        pmod(floor(col("value")).cast("long"), lit(1024L)).as("vy"))
      .select(col("event_id"), zvalue(col("ux"), col("vy"), bits).as("zval"))
      .orderBy("event_id")

  /** Token-budget shard packing — the pre-tokenization layout step
    * that sizes training shards by TOKENS, not bytes or rows (a shard
    * of long documents would otherwise tokenize to many × the step
    * budget). Greedy assignment by document order needs each doc's
    * GLOBAL prefix token sum; the textbook form — one window over a
    * global ORDER BY — funnels the whole corpus through a single task.
    * This is the distributed two-phase prefix sum instead:
    *
    *   1. bucket docs into `buckets` contiguous doc_id ranges (range
    *      bounds from a 1-row min/max scalar, broadcast);
    *   2. per-bucket token totals — an ordinary parallel aggregate;
    *   3. exclusive running offsets over the ≤`buckets` totals — a
    *      triangular self-join (≤buckets² rows, broadcast-sized), so
    *      no unpartitioned window exists anywhere in the plan;
    *   4. offsets broadcast back; each bucket computes its exact
    *      global running sum with a bucket-local window.
    *
    * Shard id = floor(exclusive-prefix / tokensPerShard); the gated
    * output is the per-shard manifest (doc count, token sum, doc_id
    * span) a writer would hand to the tokenizer fleet. Oracle computes
    * the same thing with the naive global window — fine at oracle
    * scale, and an independent plan for the same semantics.
    */
  def packShards(t: Tables, tokensPerShard: Long = 2000L, buckets: Int = 32): DataFrame =
    packShardsOf(t.documents, tokensPerShard, buckets)

  /** (doc_id, n_tokens, _prev): each document's EXACT exclusive global
    * prefix token sum in doc_id order — the distributed two-phase
    * prefix sum described on [[packShards]], shared with
    * [[packSequencesOf]] (r14). No unpartitioned window exists
    * anywhere in the plan:
    *   - contiguous value-range bucketing: deterministic (no
    *     sampling) and order-preserving, so per-bucket prefix +
    *     bucket offset = exact global prefix;
    *   - exclusive running offsets over the ≤`buckets` totals via a
    *     TRIANGULAR SELF-JOIN (off(b) = Σ totals below b): ≤buckets²
    *     = 1024 joined rows, fully partitioned, broadcast-sized. The
    *     obvious global-window form would be the repo's only
    *     unpartitioned WindowExec — harmless at ≤32 rows but
    *     indistinguishable in plans and logs from a corpus-sized one
    *     (Spark's "No Partition Defined" warning, the r7 tail noise),
    *     and an optimizer-folded constant partition key lands right
    *     back on an empty spec. No window means PlanAuditSpec bans
    *     empty partition specs across the WHOLE gated surface with
    *     zero exemptions.
    */
  private def withGlobalPrefix(docs: DataFrame, buckets: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val bounds = toks.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    val bucketed = toks.crossJoin(broadcast(bounds))
      .withColumn("_b", least(lit(buckets - 1),
        floor((col("doc_id") - col("lo")) * buckets /
          (col("hi") - col("lo") + 1)).cast("int")))
      .drop("lo", "hi")
    val totals = bucketed.groupBy(col("_b")).agg(sum(col("n_tokens")).as("_bsum"))
    val offsets = totals
      .join(totals.select(col("_b").as("_b2"), col("_bsum").as("_bsum2")),
        col("_b2") < col("_b"), "left")
      .groupBy(col("_b"))
      .agg(coalesce(sum(col("_bsum2")), lit(0L)).as("_off"))
    val wLocal = Window.partitionBy(col("_b")).orderBy(col("doc_id"))
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("_prev",
        col("_off") + coalesce(sum(col("n_tokens")).over(
          wLocal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("_prev"))
  }

  def packShardsOf(docs: DataFrame, tokensPerShard: Long, buckets: Int): DataFrame =
    withGlobalPrefix(docs, buckets)
      .withColumn("shard_id",
        floor(col("_prev").cast("double") / lit(tokensPerShard.toDouble)).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("shard_id")

  def packShardsSql(tokensPerShard: Long = 2000L): String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), cum AS (
       |  SELECT doc_id, n_tokens,
       |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
       |  FROM tok
       |)
       |SELECT CAST(floor(CAST(prev AS DOUBLE) / $tokensPerShard.0) AS BIGINT) AS shard_id,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin

  /** GPT-style fixed-length sequence packing (r14) — the batch-shape
    * step AFTER [[lengthBuckets]]' padding-vs-packing tradeoff is
    * decided for packing: documents are concatenated in doc_id order
    * and cut into back-to-back `seqLen`-token training sequences, a
    * document spilling across a cut continuing in the next sequence
    * (the standard causal-LM pretraining layout — zero padding, every
    * slot a real token). The gated output is the per-sequence manifest
    * a batch auditor reads:
    *   - `n_docs` documents contributing tokens, `n_started` beginning
    *     here (`n_docs − n_started` = carry-ins from earlier cuts),
    *   - `n_splits` documents cut at this sequence's right edge — the
    *     cross-document-attention contamination count a masking
    *     strategy must handle,
    *   - `n_tokens` (== seqLen everywhere but the final partial
    *     sequence — the conservation check).
    *
    * Plan shape: the [[withGlobalPrefix]] distributed prefix sum gives
    * each doc its exact global token offset with no global sort or
    * unpartitioned window; each doc then EXPLODES into the sequences
    * its span [prev, prev+n) overlaps (⌈n/seqLen⌉+1 rows — bounded by
    * the doc's own length) and one seq_id-keyed aggregate builds the
    * manifest. Sequence ids are exact integer division (`div`, not
    * float floor): token offsets pass 2^53 long before a 100 TB corpus
    * runs out, where a double floor would misplace cuts. The oracle
    * re-derives the same manifest from a naive global-window cumsum —
    * an independent plan for the same semantics.
    */
  def packSequences(t: Tables, seqLen: Long = 512L, buckets: Int = 32): DataFrame =
    packSequencesOf(t.documents, seqLen, buckets)

  def packSequencesOf(docs: DataFrame, seqLen: Long, buckets: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen)
    val spans = withGlobalPrefix(docs, buckets)
      .filter(col("n_tokens") > 0)
      .withColumn("_end", col("_prev") + col("n_tokens"))
      .withColumn("_s0", expr(s"_prev div ${seqLen}"))
      .withColumn("_s1", expr(s"(_prev + n_tokens - 1) div ${seqLen}"))
    spans
      .withColumn("seq_id", explode(sequence(col("_s0"), col("_s1"))))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("seq_id") === col("_s0"), 1L).otherwise(0L)).as("n_started"),
        sum(when(col("seq_id") < col("_s1"), 1L).otherwise(0L)).as("n_splits"),
        sum(least(col("_end"), (col("seq_id") + 1) * L) -
          greatest(col("_prev"), col("seq_id") * L)).as("n_tokens"))
      .orderBy("seq_id")
  }

  def packSequencesSql(seqLen: Long = 512L): String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), cum AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
       |  FROM tok WHERE n_tokens > 0
       |), spans AS (
       |  SELECT prev, prev + n_tokens AS fin,
       |    prev // $seqLen AS s0, (prev + n_tokens - 1) // $seqLen AS s1
       |  FROM cum
       |), x AS (
       |  SELECT prev, fin, s0, s1, unnest(range(s0, s1 + 1)) AS seq_id FROM spans
       |)
       |SELECT CAST(seq_id AS BIGINT) AS seq_id, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN seq_id = s0 THEN 1 ELSE 0 END) AS BIGINT) AS n_started,
       |  CAST(sum(CASE WHEN seq_id < s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_splits,
       |  CAST(sum(least(fin, (seq_id + 1) * $seqLen) - greatest(prev, seq_id * $seqLen)) AS BIGINT) AS n_tokens
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  /** Reproducible global shuffle into training shards — the write-order
    * step between curation and tokenization. Training wants the corpus
    * in a random but REPRODUCIBLE order (restarts, audits, and data
    * ablations must see byte-identical shards); the textbook
    * `ORDER BY random()` is neither reproducible nor scalable (a global
    * sort barrier over 100 TB). This is the hash-shuffle form instead:
    *
    *   - shard  = md5(seed:doc_id) first 8 hex chars, mod `nShards` —
    *     pure map-side math, no coordination;
    *   - within-shard order = the full 32-char hash (lowercase
    *     fixed-width hex, so STRING order == numeric order in any
    *     engine), tie-broken by doc_id;
    *   - the only exchange is the shard partitioning itself — exactly
    *     the shuffle the shard WRITE already requires, so the "global
    *     sort" costs nothing beyond the write's own movement. No
    *     unpartitioned window or global sort exists in the plan.
    *
    * The gated output is the per-shard manifest with an ORDER-SENSITIVE
    * checksum: Σ (pos mod p)·(h32 mod p) mod p over the shard (p =
    * 1e9+7, h32 = an independent 32-bit slice of the hash). Any
    * permutation of the within-shard order moves the checksum, so the
    * gate pins the exact byte order a writer would emit, not just
    * shard membership. Both factors are mod-reduced BEFORE the product
    * (r14, VERDICT r13 #4): the earlier pos·h32 form wrapped BIGINT
    * silently once a shard passed ~2^31 docs; (pos mod p)·(h32 mod p)
    * < p² ≈ 8.6e17 < 2^63 is exact for ANY pos, and by modular
    * arithmetic the term values are identical, so existing
    * fingerprints are unchanged. Terms < 2^30 keep the BIGINT sum
    * exact below ~2^33 docs/shard; the SQL twin mirrors the same
    * reduced form so both engines stay in BIGINT range (DuckDB would
    * otherwise HUGEINT-promote and diverge exactly when Spark
    * wrapped). [[orderFpTerm]] is the shared per-row term, unit-
    * exercised at pos > 2^31 in LayoutSpec.
    */
  def globalShuffle(t: Tables, seed: Long = 42L, nShards: Int = 8): DataFrame =
    globalShuffleOf(t.documents, seed, nShards)

  /** Order-fingerprint modulus and per-row term. Factors mod-reduce
    * before the product so the term never leaves BIGINT range at any
    * shard size (see the overflow note on [[globalShuffle]]); both
    * inputs are non-negative, so `pmod`/`%` agree across engines.
    */
  val OrderFpP = 1000000007L
  def orderFpTerm(pos: Column, h32: Column): Column =
    pmod(pmod(pos, lit(OrderFpP)) * pmod(h32, lit(OrderFpP)), lit(OrderFpP))

  def globalShuffleOf(docs: DataFrame, seed: Long, nShards: Int): DataFrame = {
    val h = md5(concat(lit(s"shuf$seed:"), col("doc_id").cast("string")))
    val keyed = docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
      h.as("h"),
      (conv(substring(h, 1, 8), 16, 10).cast("long") % nShards).as("shard_id"),
      conv(substring(h, 9, 8), 16, 10).cast("long").as("h32"))
    val w = Window.partitionBy(col("shard_id")).orderBy(col("h"), col("doc_id"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(orderFpTerm(col("pos"), col("h32"))).as("order_fp"))
      .orderBy("shard_id")
  }

  def globalShuffleSql(seed: Long = 42L, nShards: Int = 8): String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5('shuf$seed:' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, n_tokens, h,
       |    ('0x' || substr(h, 1, 8))::BIGINT % $nShards AS shard_id,
       |    ('0x' || substr(h, 9, 8))::BIGINT AS h32
       |  FROM k
       |), p AS (
       |  SELECT shard_id, n_tokens, h32,
       |    CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS BIGINT) AS pos
       |  FROM s
       |)
       |SELECT shard_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(((pos % 1000000007) * (h32 % 1000000007)) % 1000000007) AS BIGINT) AS order_fp
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sequence-length bucketing — the batch-shape planner that decides
    * the padding budget before a training run. Documents are binned to
    * the smallest power-of-two context that holds them (floor 16, cap
    * `cap`); per bucket the manifest reports the docs, the real tokens,
    * the PADDING a fixed-shape batch of that length would waste, and
    * the tokens TRUNCATED off docs that overflow the cap — the two
    * numbers that trade against each other when picking bucket
    * boundaries. Pure map-side CASE math + one tiny aggregate; the
    * bucket boundary chain is integer CASE, not log2 (exact and
    * engine-portable where float log at exact powers of two is not).
    */
  def lengthBuckets(t: Tables, cap: Int = 512): DataFrame =
    lengthBucketsOf(t.documents, cap)

  def lengthBucketsOf(docs: DataFrame, cap: Int): DataFrame = {
    val n = size(split(trim(col("text")), "\\s+")).cast("long")
    val boundaries = Iterator.iterate(16)(_ * 2).takeWhile(_ <= cap).toSeq
    val bucket = boundaries.init.foldRight(lit(boundaries.last.toLong)) {
      (b, rest) => when(n <= b, lit(b.toLong)).otherwise(rest)
    }
    docs
      .select(n.as("n_tokens"), bucket.as("bucket_len"))
      .withColumn("kept", least(col("n_tokens"), col("bucket_len")))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("bucket_len") - col("kept")).as("pad_tokens"),
        sum(col("n_tokens") - col("kept")).as("trunc_tokens"))
      .withColumn("pad_frac",
        round(col("pad_tokens").cast("double") /
          (col("n_docs") * col("bucket_len")).cast("double"), 6))
      .orderBy("bucket_len")
  }

  def lengthBucketsSql(cap: Int = 512): String = {
    val boundaries = Iterator.iterate(16)(_ * 2).takeWhile(_ <= cap).toSeq
    val cases = boundaries.init.map(b => s"WHEN n_tokens <= $b THEN $b").mkString(" ")
    s"""WITH tok AS (
       |  SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), b AS (
       |  SELECT n_tokens,
       |    CAST(CASE $cases ELSE ${boundaries.last} END AS BIGINT) AS bucket_len,
       |    CAST(least(n_tokens, CASE $cases ELSE ${boundaries.last} END) AS BIGINT) AS kept
       |  FROM tok
       |)
       |SELECT bucket_len, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(bucket_len - kept) AS BIGINT) AS pad_tokens,
       |  CAST(sum(n_tokens - kept) AS BIGINT) AS trunc_tokens,
       |  round(CAST(sum(bucket_len - kept) AS DOUBLE) / (count(*) * bucket_len), 6) AS pad_frac
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def qZorderSql(bits: Int = 10): String =
    s"""WITH d AS (
       |  SELECT event_id,
       |    user_id % 1024 AS ux,
       |    CAST(floor(value) AS BIGINT) % 1024 AS vy
       |  FROM events
       |), b AS (
       |  SELECT event_id, i,
       |    (CAST(floor(ux / pow(2.0, i)) AS BIGINT) % 2) * CAST(pow(2.0, i * 2) AS BIGINT)
       |    + (CAST(floor(vy / pow(2.0, i)) AS BIGINT) % 2) * CAST(pow(2.0, i * 2 + 1) AS BIGINT) AS part
       |  FROM d, unnest(range(0, $bits)) r(i)
       |)
       |SELECT event_id, CAST(sum(part) AS BIGINT) AS zval
       |FROM b GROUP BY event_id
       |ORDER BY event_id""".stripMargin
}
