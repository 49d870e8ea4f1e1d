package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Byte-pair-encoding merge-table training — the tokenizer-building
  * step of an LLM data pipeline (Sennrich et al. 2016), distributed:
  * the classic algorithm is a corpus-sized sequential loop; here each
  * merge round is ONE map-side-combined aggregate over the VOCABULARY
  * (word, freq) table — Heaps-law-sublinear in the corpus — and the
  * corpus itself is touched exactly once (the word count). The
  * reference's pipelines stop at word counting (v2/core/transformers/
  * text.py); this consumes that exact output one step further.
  */
object Bpe {

  /** Train `merges` BPE merges over the corpus vocabulary; returns the
    * merge table (rank, lhs, rhs, pair_freq) — rank-ordered, the
    * artifact a tokenizer loads.
    *
    * Mechanics: every word becomes a space-delimited symbol string
    * (" t h e "); a round counts adjacent symbol pairs weighted by
    * word frequency, picks the argmax (ties: lexicographic on the
    * pair — deterministic cross-engine), and rewrites the pair into
    * one symbol via LITERAL (non-regex) replace, left-to-right
    * non-overlapping — " a a a " merges to " aa a ", the documented
    * in-word overlap semantics both engines share.
    *
    * Scale shape: the per-round aggregate input is one row per
    * (symbol-pair occurrence) of the VOCAB — ~chars-per-word × distinct
    * words, independent of corpus row count; the argmax row (ONE row)
    * comes to the driver (the pplBuckets precedent: collecting O(1)
    * rows is not a driver-side loop over data) and is folded back as a
    * literal, so each round's plan stays independent and total cost is
    * linear in `merges`. The evolving symbol table is cached and the
    * previous round's cache released each step.
    */
  def bpeTrain(t: Tables, merges: Int = 8): DataFrame = {
    val spark = t.spark
    val words = WordPipeline.tokens(t)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var syms = words.select(col("word"), col("freq"),
      concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
      .cache()
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    // deferred-by-one unpersist (r14): the old per-round
    // cache+count()+unpersist spent one whole job per round just
    // materializing the rewrite. Instead the NEXT round's argmax job
    // materializes the new cache while its parent is still cached
    // (no recompute window), and the parent retires one round late —
    // halving the driver loop's job count at the cost of one extra
    // vocab-sized cache generation held briefly.
    var retired: DataFrame = null
    for (i <- 1 to merges if !exhausted) {
      val best = syms
        .select(col("freq"), split(trim(col("sym")), " ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(
          expr("transform(sequence(0, size(s) - 2), j -> struct(s[j] AS a, s[j + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      // the collect above materialized syms' cache — the previous
      // generation is now safe to drop
      if (retired != null) { retired.unpersist(blocking = false); retired = null }
      if (best.isEmpty) exhausted = true // vocab fully merged: emit the
      // rows learned so far — the oracle's empty b_i rounds do the same
      else {
        val (a, b, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((i.toLong, a, b, f))
        retired = syms
        syms = syms.withColumn("sym",
          replace(col("sym"),
            concat(lit(" "), lit(a), lit(" "), lit(b), lit(" ")),
            concat(lit(" "), lit(a + b), lit(" "))))
          .cache()
        syms = cutLineage(syms, i, merges)
      }
    }
    if (retired != null) retired.unpersist(blocking = false)
    syms.unpersist(blocking = false)
    import spark.implicits._
    out.result().toDF("rank", "lhs", "rhs", "pair_freq").orderBy("rank")
  }

  /** DuckDB twin: the same `merges` rounds unrolled as CTEs (the
    * pageRank oracle pattern) — pair counts from the previous round's
    * symbol table, 1-row argmax, literal replace fold-back. The w/b
    * CTEs are MATERIALIZED: each is referenced twice (by the next
    * round's pair count AND rewrite), so default inlining would expand
    * the plan 2^merges-fold — at 16 merges that's 65536 scans of the
    * documents file ("Too many open files"), not a slow query.
    */
  def bpeTrainSql(merges: Int = 8): String = {
    val base =
      """WITH toks AS (
        |  SELECT lower(trim(w)) AS word
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
        |  WHERE lower(trim(w)) <> ''
        |), words AS (SELECT word, count(*) AS freq FROM toks GROUP BY word),
        |w0 AS MATERIALIZED (
        |  SELECT word, freq, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS sym
        |  FROM words
        |)""".stripMargin
    val rounds = (1 to merges).map { i =>
      s"""p$i AS (
         |  SELECT s[j] AS a, s[j + 1] AS b, sum(freq) AS f
         |  FROM (SELECT freq, regexp_split_to_array(trim(sym), ' ') AS s FROM w${i - 1}),
         |    unnest(range(1, len(s))) r(j)
         |  WHERE len(s) >= 2
         |  GROUP BY 1, 2
         |), b$i AS MATERIALIZED (
         |  SELECT a, b, f FROM p$i ORDER BY f DESC, a, b LIMIT 1
         |), w$i AS MATERIALIZED (
         |  SELECT word, freq,
         |    replace(sym, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS sym
         |  FROM w${i - 1} CROSS JOIN b$i
         |)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to merges)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, a AS lhs, b AS rhs, CAST(f AS BIGINT) AS pair_freq FROM b$i")
      .mkString("\nUNION ALL\n")
    s"$base,\n$rounds\n$sel\nORDER BY rank"
  }

  /** A fixed merge table for the cross-engine encode gate: the learned
    * table from [[bpeTrain]] is data-dependent (can't be inlined into
    * a static oracle), so the GATE encodes with known literals and the
    * spec wires the trained table through the same fold.
    */
  val defaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"))

  /** Lineage cut every 5 merge rounds (the pageRankOf cadence): each
    * round nests the previous round's plan, so past ~20 rounds plan
    * analysis — and even rendering the AQE explain string — grows
    * without bound (a 24-merge run OOMed on the PLAN TEXT, not the
    * data). Reliable checkpoint when a dir is configured; local
    * otherwise. Skipped on the final round — the caller's action
    * materializes it anyway.
    */
  private def cutLineage(syms: DataFrame, round: Int, last: Int): DataFrame =
    if (round % 5 == 0 && round < last) {
      val prev = syms
      val cut =
        if (syms.sparkSession.sparkContext.getCheckpointDir.isDefined) syms.checkpoint()
        else syms.localCheckpoint()
      prev.unpersist(blocking = false)
      cut
    } else syms

  /** [[bpeTrain]] with EXACT per-round merge batching: selects a
    * prefix of compatible merges from one pair-count pass and applies
    * them together while producing the IDENTICAL merge table. The
    * guarantee is also the limit: because acceptance must stop at the
    * first conflicting candidate, natural text (where adjacent top
    * pairs nearly always share a symbol) batches ~1 merge per round —
    * measured 60 driver rounds for 64 merges on the test corpus. This
    * form exists as the provably-safe point and the oracle anchor;
    * the production fast path at ~32k merges is [[bpeTrainFast]],
    * whose greedy independent-set batching genuinely cuts rounds to
    * ~merges/maxBatch at the price of documented within-batch
    * reordering.
    *
    * Identical-by-construction, not by heuristic. From one sorted
    * (freq desc, then lexicographic — the sequential tie-break) top-C
    * candidate collect (O(C) rows to the driver, the pplBuckets
    * bound), accept candidates in order while:
    *   1. symbol-DISJOINT from every already-accepted pair — disjoint
    *      merges cannot create/destroy each other's adjacencies, so
    *      applying them together equals applying them in rank order;
    *   2. the acceptance stops at the first CONFLICT (a candidate
    *      sharing a symbol with an accepted pair): after the accepted
    *      merges run, that pair's count may have changed and any NEW
    *      pair (·,ab)/(ab,·) is bounded by some old conflicting
    *      pair's count — so the sequential argmax could differ from
    *      this round's list from that frequency on;
    *   3. accepted pairs are then truncated to frequencies STRICTLY
    *      above max(first-conflict freq, truncation floor fC): a new
    *      or reduced pair can tie at that frequency and win the
    *      sequential lexicographic tie-break, so equal-frequency
    *      tails are left for the next round (fC = the C-th candidate's
    *      freq — unseen pairs below the collected list are ≤ fC, and
    *      new pairs they bound likewise).
    *   Fallback: if the filter empties the batch, the head alone is
    *   accepted — it is the exact global argmax under the full
    *   ORDER BY, so progress is guaranteed and still sequential-equal.
    *
    * A planted-corpus spec pins batched ≡ sequential merge-for-merge,
    * including an adversarial corpus engineered to force conflicts
    * and equal-frequency ties every round.
    */
  def bpeTrainBatched(t: Tables, merges: Int = 64, maxBatch: Int = 16): DataFrame =
    bpeTrainBatchedWithRounds(t, merges, maxBatch)._1

  def bpeTrainBatchedWithRounds(t: Tables, merges: Int = 64, maxBatch: Int = 16)
      : (DataFrame, Int) =
    trainLoop(t, merges, maxBatch) { (cands, truncFloor) =>
      val used = scala.collection.mutable.Set.empty[String]
      val acc = Seq.newBuilder[(String, String, Long)]
      var conflictF = -1L
      var stopped = false
      for (c @ (a, b, f) <- cands if !stopped) {
        if (used(a) || used(b)) { conflictF = f; stopped = true }
        else {
          acc += c; used += a; used += b
          // the COMPOSED symbol conflicts too: merging (a,b) mints
          // "ab" tokens, so a later candidate touching the literal
          // string a+b (possible when an earlier round already
          // created that symbol) has its count CHANGED by this merge
          // — e.g. accepted (a,b) raises (c, ab) wherever "c a b"
          // occurred, beyond its pre-batch count. Literal-symbol
          // disjointness alone misses that; adding a+b to the used
          // set restores the invariant that every count-affected
          // pair conflicts.
          used += (a + b)
        }
      }
      val ceiling = math.max(conflictF, truncFloor)
      // Mid-batch, a non-accepted pair q can reach
      // old(q) + created(q): old(q) ≤ ceiling (q conflicts or sits
      // below the scan), and created(q) ≤ ceiling (each created
      // adjacency consumes one old boundary-pair adjacency, itself
      // conflicting). created(q) > 0 requires q to MENTION an
      // accepted pair's composed symbol, and for old(q) to also be
      // positive that symbol must pre-exist — in which case q (or a
      // kin pair mentioning it) is visible in a complete candidate
      // list. So: 2×ceiling only when some candidate mentions an
      // accepted composed symbol or the list is truncated (kin could
      // hide below it); plain ceiling otherwise. ceiling = -1 (no
      // conflicts, complete list) means nothing can change at all.
      val accepted = acc.result()
      val composed = accepted.map { case (a, b, _) => a + b }.toSet
      val composedVisible = truncFloor >= 0 ||
        cands.exists { case (a, b, _) => composed(a) || composed(b) }
      val bound =
        if (ceiling < 0) -1L
        else if (composedVisible) 2 * ceiling
        else ceiling
      accepted.filter(_._3 > bound).take(maxBatch)
    }

  /** Shared driver loop of the two batched trainers: pair-count
    * collect (top-C, the pplBuckets bound), strategy-chosen batch,
    * fold-applied literal replaces, cache handoff + 5-round lineage
    * cut. `select` maps (sorted candidates, truncation floor) to the
    * batch; an empty selection falls back to the head — the exact
    * global argmax under the full ORDER BY — so progress is always
    * sequential-safe.
    */
  private def trainLoop(t: Tables, merges: Int, maxBatch: Int)(
      select: (Array[(String, String, Long)], Long) => Seq[(String, String, Long)])
      : (DataFrame, Int) = {
    val spark = t.spark
    val words = WordPipeline.tokens(t)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var syms = words.select(col("word"), col("freq"),
      concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
      .cache()
    val out = Seq.newBuilder[(Long, String, String, Long)]
    var done = 0
    var rounds = 0
    val candC = math.max(64, maxBatch * 8)
    // deferred-by-one unpersist — see bpeTrain: the next round's
    // candidate collect materializes the new cache, so the per-round
    // count() job is gone and the parent retires one round late
    var retired: DataFrame = null
    while (done < merges) {
      val cands = syms
        .select(col("freq"), split(trim(col("sym")), " ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(
          expr("transform(sequence(0, size(s) - 2), j -> struct(s[j] AS a, s[j + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("a"), col("b"))
        .limit(candC)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (retired != null) { retired.unpersist(blocking = false); retired = null }
      rounds += 1
      if (cands.isEmpty) { done = merges } // vocabulary fully merged
      else {
        val truncFloor = if (cands.length == candC) cands.last._3 else -1L
        val picked = select(cands, truncFloor)
        val safe = (if (picked.isEmpty) cands.take(1).toSeq else picked)
          .take(merges - done)
        retired = syms
        syms = safe.foldLeft(syms) { case (df, (a, b, _)) =>
          df.withColumn("sym",
            replace(col("sym"),
              concat(lit(" "), lit(a), lit(" "), lit(b), lit(" ")),
              concat(lit(" "), lit(a + b), lit(" "))))
        }.cache()
        syms = cutLineage(syms, rounds, Int.MaxValue)
        safe.foreach { case (a, b, f) => done += 1; out += ((done.toLong, a, b, f)) }
      }
    }
    if (retired != null) retired.unpersist(blocking = false)
    syms.unpersist(blocking = false)
    import spark.implicits._
    (out.result().toDF("rank", "lhs", "rhs", "pair_freq").orderBy("rank"), rounds)
  }

  /** The PRODUCTION fast trainer: greedy maximal-independent-set
    * batching. Where [[bpeTrainBatched]] guarantees a
    * sequential-identical table — and therefore stops at the first
    * conflicting candidate, which on natural text means batches of
    * ~1 (measured: 60 driver rounds for 64 merges on the test corpus;
    * adjacent top pairs almost always share a symbol) — this form
    * scans PAST conflicts, accepting every candidate that is
    * symbol-disjoint from the batch so far, up to `maxBatch` per
    * round. That is the standard batched-BPE approximation: within a
    * batch, ranks and pair_freqs are the PRE-batch counts, so the
    * table can locally reorder relative to the sequential one when
    * batched merges interact through shared contexts. The trade is
    * spec-bounded two ways: on a planted independent-pair corpus the
    * table is sequential-identical, and on the real corpus the
    * trained table's encoding quality (tokens_per_word via
    * [[bpeEncodeOf]]) must stay within a few percent of the
    * sequential table's. Driver rounds ≈ merges/maxBatch — the
    * sublinear growth that makes ~32k merges feasible (the exact
    * form's one-conflict-per-round pace cannot be).
    */
  def bpeTrainFast(t: Tables, merges: Int = 64, maxBatch: Int = 16): DataFrame =
    bpeTrainFastWithRounds(t, merges, maxBatch)._1

  def bpeTrainFastWithRounds(t: Tables, merges: Int = 64, maxBatch: Int = 16)
      : (DataFrame, Int) =
    trainLoop(t, merges, maxBatch) { (cands, truncFloor) =>
      // greedy independent set: scan past conflicts; the truncation
      // floor still applies — a pair below the collected list could
      // outrank an accepted tail candidate, and unlike the within-batch
      // reorder that would be a SILENT wrong order, not a documented
      // approximation
      val used = scala.collection.mutable.Set.empty[String]
      val acc = Seq.newBuilder[(String, String, Long)]
      var n = 0
      for (c @ (a, b, f) <- cands
           if n < maxBatch && f > truncFloor && !used(a) && !used(b)) {
        acc += c; used += a; used += b; n += 1
      }
      acc.result()
    }

  /** HASH-GATED verdict for the greedy-batched trainer (r13: the fast
    * merge table can locally reorder relative to the sequential one —
    * a documented approximation, so the raw table stays a library
    * artifact, sequential-identity + round-sublinearity pinned in
    * IncrementalSpec). What the approximation PROMISES is encode
    * quality: a tokenizer trained by [[bpeTrainFast]] must compress
    * the corpus within `tol` of one trained by the sequential-exact
    * [[bpeTrain]] at the same merge count. The gate trains both,
    * encodes the corpus under both tables ([[bpeEncodeOf]] — the
    * map-only fold, no shuffle beyond the (doc, word) count), and
    * gates corpus-level tokens-per-word: fast ≤ seq × (1 + tol).
    * `>=` too — batching can only LOSE compression vs the greedy-
    * optimal sequential order, so a fast ratio materially below seq
    * would mean the comparison itself is broken; the floor gets the
    * same tolerance.
    */
  def bpeTrainFastGate(t: Tables, merges: Int = 16, maxBatch: Int = 8,
      tol: Double = 0.05): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    def mergeSeq(table: DataFrame): Seq[(String, String)] =
      table.orderBy("rank").select("lhs", "rhs").as[(String, String)].collect().toSeq
    // The sequential side comes from bpeTrainLocal — BIT-IDENTICAL to
    // bpeTrain at any merge count (spec-pinned, same unrolled-CTE
    // oracle) at a fraction of the cost (one distributed vocab count +
    // driver merge loop vs `merges` driver rounds); the gate's job is
    // the fast-vs-sequential COMPARISON, not re-proving the sequential
    // trainer the bpe_train/bpe_train_local rows already gate.
    val seqMerges = mergeSeq(bpeTrainLocal(t, merges))
    val fastMerges = mergeSeq(bpeTrainFast(t, merges, maxBatch))
    // Both encodes in ONE corpus pass: per distinct word, the symbol
    // fold under each table side by side — the scan, tokenize, and
    // (word, count) shuffle are shared instead of paid twice.
    val toks = t.documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val wc = toks.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val sym0 = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    def folded(ms: Seq[(String, String)]) =
      size(split(trim(ms.foldLeft(sym0) { case (s, (a, b)) =>
        replace(s, lit(s" $a $b "), lit(s" ${a + b} "))
      }), " ")).cast("long")
    val r = wc
      .select(col("c"), folded(seqMerges).as("ns"), folded(fastMerges).as("nf"))
      .agg(sum(col("c") * col("ns")).as("ts"),
        sum(col("c") * col("nf")).as("tf"), sum(col("c")).as("nw")).head()
    val seqTpw = r.getLong(0).toDouble / r.getLong(2).toDouble
    val fastTpw = r.getLong(1).toDouble / r.getLong(2).toDouble
    val ok = fastTpw <= seqTpw * (1 + tol) && fastTpw >= seqTpw * (1 - tol)
    spark.createDataset(Seq((merges.toLong, ok)))
      .toDF("n_merges", "quality_within_tol")
  }

  def bpeTrainFastGateSql(merges: Int = 16): String =
    s"SELECT CAST($merges AS BIGINT) AS n_merges, true AS quality_within_tol"

  /** SEQUENTIAL-EXACT training at production merge counts (~32k): the
    * architecture every real tokenizer trainer uses, split along the
    * right distributed/local boundary. The corpus-sized work — the
    * (word, freq) count — runs distributed ONCE; the merge loop then
    * runs on the VOCABULARY in driver memory with the classic
    * incremental pair-count algorithm (a lazy-invalidation priority
    * queue + a pair→words index; each merge rewrites only the words
    * containing the pair). The vocabulary is Heaps-law-bounded — tens
    * of millions of entries at 100 TB, not corpus-sized — and the
    * collect is guarded by `maxVocab` with a loud error naming the
    * distributed forms (the maxExactRows pattern), because this is
    * the one deliberate driver-side bulk in the repo and it must
    * never be mistaken for a default-safe path.
    *
    * Produces the BIT-IDENTICAL table to [[bpeTrain]] at any merge
    * count (spec-pinned; gated against the same unrolled-CTE oracle):
    * same (freq desc, lexicographic) argmax, and the same in-word
    * rewrite semantics as the engines' literal replace — a match
    * consumes its trailing delimiter, so after merging tokens
    * (i, i+1) the pair starting at i+2 is NOT eligible this pass
    * (" a b a b " → " ab a b ", second occurrence left for a later
    * round of the SAME pair, which therefore stays in the queue).
    *
    * Why this beats more Spark rounds: even the greedy-batched
    * distributed form pays one driver round-trip per ~maxBatch
    * merges; at 32k merges that is ~2k plan+aggregate cycles of
    * multi-second constant each. Here the per-merge cost is
    * microseconds of pointer work on exactly the data a merge
    * touches.
    */
  def bpeTrainLocal(t: Tables, merges: Int = 1024,
      maxVocab: Long = 5000000L): DataFrame = {
    val spark = t.spark
    val words = WordPipeline.tokens(t)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .persist()
    val nVocab = words.count()
    require(nVocab <= maxVocab,
      s"vocabulary has $nVocab entries > maxVocab=$maxVocab: the in-memory merge " +
        "loop would not fit the driver. Raise maxVocab if the driver is sized for " +
        "it, or train fewer merges distributed via bpeTrainFast/bpeTrainBatched.")
    val vocab = words.collect().map(r => (r.getString(0), r.getLong(1)))
    words.unpersist(blocking = false)

    // split per CODE POINT, not UTF-16 unit: the distributed form's
    // regexp "(.)" and the oracle's both treat a supplementary-plane
    // character (emoji, U+1D11E) as ONE symbol; w.map(_.toString)
    // would split it into two surrogate halves and diverge
    val syms = vocab.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    }
    val freq = vocab.map(_._2)
    type Pair = (String, String)
    val counts = scala.collection.mutable.HashMap.empty[Pair, Long]
    val where  = scala.collection.mutable.HashMap
      .empty[Pair, scala.collection.mutable.Set[Int]]
    def addPair(p: Pair, f: Long, wid: Int): Unit = {
      counts.updateWith(p) { c => Some(c.getOrElse(0L) + f) }
      where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += wid
      ()
    }
    def pairsOf(s: Array[String]): Iterator[Pair] =
      if (s.length < 2) Iterator.empty
      else (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    for (wid <- syms.indices; p <- pairsOf(syms(wid))) addPair(p, freq(wid), wid)

    // lazy-invalidation PQ: entries carry the count they were pushed
    // with; a popped entry is valid only if it still matches `counts`.
    // The lexicographic tie-break must compare UTF-8 BYTES (Spark's
    // UTF8String / DuckDB's collation order = code-point order), not
    // Java UTF-16 units — the two disagree between supplementary-plane
    // strings and [U+E000, U+FFFF], which would flip tied argmaxes.
    def utf8Cmp(x: String, y: String): Int = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val ord: Ordering[(Long, String, String)] = new Ordering[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        if (x._1 != y._1) java.lang.Long.compare(y._1, x._1) // freq DESC
        else {
          val c = utf8Cmp(x._2, y._2)
          if (c != 0) c else utf8Cmp(x._3, y._3)
        }
      }
    }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](ord.reverse)
    counts.foreach { case ((a, b), f) => pq.enqueue((f, a, b)) }

    /** One pass of the engines' literal-replace semantics over a
      * symbol array; None if the pair never matches.
      */
    def rewrite(s: Array[String], a: String, b: String): Option[Array[String]] = {
      val out = Array.newBuilder[String]
      var i = 0
      var hit = false
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
          hit = true
          out += (a + b)
          // the match consumed its trailing delimiter: the next token
          // is emitted verbatim and cannot START a match this pass
          if (i + 2 < s.length) out += s(i + 2)
          i += 3
        } else { out += s(i); i += 1 }
      }
      if (hit) Some(out.result()) else None
    }

    val out = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 0
    while (rank < merges && pq.nonEmpty) {
      val (f, a, b) = pq.dequeue()
      if (f > 0 && counts.get((a, b)).contains(f)) {
        rank += 1
        out += ((rank.toLong, a, b, f))
        val touched = scala.collection.mutable.Set.empty[Pair]
        for (wid <- where.getOrElse((a, b), Set.empty[Int]).toArray) {
          rewrite(syms(wid), a, b).foreach { ns =>
            for (p <- pairsOf(syms(wid))) {
              counts.updateWith(p) { c => Some(c.getOrElse(0L) - freq(wid)) }
              touched += p
            }
            syms(wid) = ns
            for (p <- pairsOf(ns)) { addPair(p, freq(wid), wid); touched += p }
          }
        }
        // re-enqueue every touched pair at its new count (stale
        // entries are skipped by the validity check on dequeue). The
        // merged pair itself re-enters iff the skip quirk left live
        // occurrences — the same re-pick the distributed form does.
        for (p <- touched) {
          val c = counts.getOrElse(p, 0L)
          if (c > 0) pq.enqueue((c, p._1, p._2))
        }
      }
    }
    import spark.implicits._
    out.result().toDF("rank", "lhs", "rhs", "pair_freq").orderBy("rank")
  }

  /** Apply a BPE merge table — tokenize the corpus under a trained
    * tokenizer and report per-doc token counts (the sizing pass that
    * prices a corpus in tokens before a training run). The classic
    * encoder loops over every token of every document; here merges
    * apply in rank order as literal replaces (identical semantics to
    * [[bpeTrain]]'s rewrite step) on the per-(doc, word) symbol
    * string — one evaluation per DISTINCT word of a doc, not per
    * token occurrence, and no word-keyed re-shuffle (recomputing the
    * cheap codegen'd fold beats joining a vocab table back). Only
    * (doc, word, count) rows shuffle; no UDF anywhere.
    */
  def bpeEncodeOf(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val dw = toks.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
    val sym0 = concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 "))
    val folded = merges.foldLeft(sym0) { case (s, (a, b)) =>
      replace(s, lit(s" $a $b "), lit(s" ${a + b} "))
    }
    val enc = dw.select(col("doc_id"), col("c"),
      size(split(trim(folded), " ")).cast("long").as("n_sym"))
    enc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_words"),
        sum(col("c") * col("n_sym")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6).as("tokens_per_word"))
      .orderBy("doc_id")
  }

  def bpeEncode(t: Tables): DataFrame = bpeEncodeOf(t.documents, defaultMerges)

  def bpeEncodeSql(merges: Seq[(String, String)] = defaultMerges): String = {
    val folded = merges.foldLeft("' ' || regexp_replace(word, '(.)', '\\1 ', 'g')") {
      case (s, (a, b)) => s"replace($s, ' $a $b ', ' ${a + b} ')"
    }
    s"""WITH toks AS (
       |  SELECT doc_id, lower(trim(w)) AS word
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS w FROM documents)
       |  WHERE lower(trim(w)) <> ''
       |), dw AS (SELECT doc_id, word, count(*) AS c FROM toks GROUP BY 1, 2),
       |enc AS (
       |  SELECT doc_id, c,
       |    len(regexp_split_to_array(trim($folded), ' ')) AS n_sym
       |  FROM dw
       |)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
       |  CAST(sum(c * n_sym) AS BIGINT) AS n_bpe_tokens,
       |  round(CAST(sum(c * n_sym) AS DOUBLE) / sum(c), 6) AS tokens_per_word
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
