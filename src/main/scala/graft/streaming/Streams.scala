package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event operators: the same
  * logical transformations run incrementally with watermark-bounded
  * state. At scale the stream shuffles on the same keys as the batch
  * plans, so a batch backfill and the live stream produce identical
  * results (spec-verified against graft.operators.Events).
  */
object Streams {

  /** File-source stream over an sf directory's events table. File
    * stream sources need a user-supplied schema, and the generator has
    * shipped events.ts under more than one parquet encoding — so the
    * raw schema comes from the batch footer of the same table (one
    * metadata read at stream setup, no data scan) and the ts decode
    * goes through the one shared seam ([[graft.sources.Tables.normalizeTs]]),
    * keeping batch and streaming reads identical by construction.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.sources.Tables.normalizeTs(
      spark.readStream
        .schema(rawSchema)
        // file stream sources need a directory; glob-select the table file
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Watermarked tumbling-hour aggregation — the incremental twin of
    * Events.hourly. Watermark bounds state: closed windows are evicted.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates("event_id", "ts")

  final case class Ev(event_id: Long, user_id: Long, tsMicros: Long)
  final case class SessionAcc(events: Long, firstEvent: Long, lastEvent: Long, lastTsMicros: Long, emitted: Long)
  final case class Session(user_id: Long, session_id: Long, n_events: Long, first_event: Long, last_event: Long)

  /** Gap-based sessionization with explicit state —
    * flatMapGroupsWithState as the custom-state extension point
    * (KeyValueGroupedDataset). Each user's state is one open session;
    * an event past the gap closes and emits it. State here is one
    * record per user (bounded); a production deployment would add an
    * event-time timeout to also flush users that go silent forever —
    * or use [[sessionWindowAgg]], where the watermark does it.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionAcc]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var acc = state.getOption.getOrElse(SessionAcc(0, 0, 0, Long.MinValue, 0))
          val out = Seq.newBuilder[Session]
          sorted.foreach { e =>
            if (acc.events > 0 && e.tsMicros - acc.lastTsMicros > gapMicros) {
              out += Session(user, acc.emitted + 1, acc.events, acc.firstEvent, acc.lastEvent)
              acc = SessionAcc(0, 0, 0, Long.MinValue, acc.emitted + 1)
            }
            acc =
              if (acc.events == 0) SessionAcc(1, e.event_id, e.event_id, e.tsMicros, acc.emitted)
              else acc.copy(events = acc.events + 1,
                firstEvent = math.min(acc.firstEvent, e.event_id),
                lastEvent = math.max(acc.lastEvent, e.event_id),
                lastTsMicros = e.tsMicros)
          }
          state.update(acc)
          out.result().iterator
      }
  }

  /** Built-in session-window aggregation (Spark 3.2+): the declarative
    * twin of [[sessionize]] — works identically on batch and streaming
    * DataFrames; in streaming, pair with a watermark so closed sessions
    * evict state.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("first_event"), col("last_event"))

  /** Stream-stream join: each purchase joined to the same user's
    * clicks in the preceding `windowMinutes`. Both sides carry
    * watermarks and the join has a time-range bound, so state for
    * either side evicts once the watermark passes — the only
    * stream-stream join shape that is viable unbounded.
    */
  def purchaseClickJoin(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("click_id"), col("p_ts"), col("c_ts"))
  }

  /** documents.parquet schema for the file-source stream. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Streaming corpus ingest — the continuous form of the curation
    * pipeline's front half: normalize → fingerprint → streaming exact
    * dedup → quality gate, incrementally as crawl batches land. The
    * dedup state is one 16-byte digest per distinct document;
    * unbounded here (fingerprints have no event time) — a production
    * deployment adds an ingest-timestamp watermark +
    * `dropDuplicatesWithinWatermark` to bound it to the re-crawl
    * horizon. Works identically on a batch DataFrame (the spec twin).
    */
  def corpusIngest(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    docs.select(col("doc_id"),
      md5(graft.operators.TextAnalysis.normalizedText(col("text"))).as("fp"),
      graft.operators.TextAnalysis.qualityCol(col("text")).as("quality"))
      .dropDuplicates("fp")
      .filter(col("quality") >= minQuality)

  /** Stream-static near-duplicate gate — continuous MinHash-LSH dedup
    * of incoming documents against an already-indexed corpus. The
    * incoming side computes its band keys with the per-row inline form
    * ([[graft.operators.Dedup.bandKeysInline]] — no shuffle, no
    * aggregation state), so the stream-static band join stays
    * STATELESS: the corpus index is a probe per micro-batch, exactly
    * like a dimension join. Emits one row per colliding band
    * (doc_id, corpus_doc, band) — append-mode safe; dedup of repeat
    * collisions is a stateless downstream `distinct` for a batch
    * consumer, or `dropDuplicatesWithinWatermark` if bounded streaming
    * dedup is needed. At scale the index is bucketed/broadcast by
    * band_key; ~(k/rowsPerBand) small rows per corpus doc.
    * Works identically on a batch DataFrame (the spec's twin).
    */
  def nearDupGate(newDocs: DataFrame, corpus: DataFrame,
      k: Int = 16, n: Int = 3, rowsPerBand: Int = 2): DataFrame = {
    val idx = graft.operators.Dedup.bandKeysInline(corpus, k, n, rowsPerBand)
      .withColumnRenamed("doc_id", "corpus_doc")
    graft.operators.Dedup.bandKeysInline(newDocs, k, n, rowsPerBand)
      .join(idx, Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("corpus_doc"))
      .select(col("doc_id"), col("corpus_doc"), col("band"))
  }

  /** [[corpusIngest]] with BOUNDED dedup state — the production form
    * its doc-comment promises: fingerprints carry the crawl's ingest
    * timestamp, and `dropDuplicatesWithinWatermark` holds each
    * fingerprint only until the watermark passes its event time +
    * horizon. Re-crawls inside the horizon are dropped; state size
    * plateaus at ~(distinct docs per horizon) instead of growing with
    * the life of the query; a re-crawl AFTER the horizon is re-admitted
    * (the deliberate trade — at 100 TB/day an unbounded exact-dedup
    * state is the thing that kills the job, and the re-admitted doc
    * dies in the downstream batch dedup anyway).
    */
  def corpusIngestBounded(docs: DataFrame, horizon: String = "10 minutes",
      minQuality: Double = 0.5): DataFrame =
    docs.select(col("ts"), col("doc_id"),
      md5(graft.operators.TextAnalysis.normalizedText(col("text"))).as("fp"),
      graft.operators.TextAnalysis.qualityCol(col("text")).as("quality"))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .filter(col("quality") >= minQuality)

  /** Seed a [[nearDupIngest]] band index from an existing corpus: one
    * (corpus_doc, band, band_key) row per band per document. Written
    * into the `batch_id=-1` partition so the seed and the per-batch
    * absorptions share one partition-discovered table layout. Seeding
    * INITIALIZES the index: any previously absorbed `batch_id=N`
    * partitions are cleared first — re-seeding against a new corpus
    * must not leave stale bands rejecting against the old one.
    */
  def buildBandIndex(corpus: DataFrame, indexDir: String,
      k: Int = 16, n: Int = 3, rowsPerBand: Int = 2): Unit = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(corpus.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
    graft.operators.Dedup.bandKeysInline(corpus, k, n, rowsPerBand)
      .withColumnRenamed("doc_id", "corpus_doc")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")
    // same provenance stamp as the batch index: a banding mismatch
    // between seed and ingest makes every probe miss — duplicates
    // admitted SILENTLY, which is worse than any exception
    graft.operators.ArtifactMeta.write(corpus.sparkSession, indexDir,
      Map("k" -> k, "n" -> n, "rowsPerBand" -> rowsPerBand))
  }

  /** Continuous near-dup ingest — [[nearDupGate]] with an index that
    * ABSORBS accepted documents, so a near-duplicate of a doc accepted
    * in batch N is rejected in batch N+1 (a static index only ever
    * rejects against the day-zero corpus). Each micro-batch, inside
    * foreachBatch (the idiomatic seam for transactional side effects a
    * pure stream-static join cannot express):
    *   1. probe: the batch's inline band keys join the on-disk index;
    *      any collision rejects the document;
    *   2. admit: survivors append to `acceptedDir`;
    *   3. absorb: the survivors' band keys append to `indexDir`.
    * Within-batch collisions are admitted (the micro-batch is the
    * atomic unit — upstream exact dedup such as [[corpusIngest]]
    * handles intra-batch repeats) but their bands are indexed, so later
    * kin are rejected. At scale only (doc_id, band, band_key) digests
    * shuffle — never text — and the index is a parquet table bucketable
    * by band_key; the probe is the same dimension-join shape as
    * [[nearDupGate]].
    *
    * Restart-safe by construction, not by append-luck: both writes land
    * in a `batch_id=N` partition with mode("overwrite"), so a replayed
    * batch REWRITES its own output instead of appending duplicates; and
    * the probe excludes the current batch's own partition, so a replay
    * after a crash mid-absorb re-derives the identical accept set from
    * the identical pre-batch index (a batch's partially-written bands
    * must never reject their own documents). All existence checks go
    * through the Hadoop FileSystem API — `java.io.File` only ever works
    * on a local filesystem, and the continuous-ingest deployment this
    * operator exists for runs on HDFS/S3.
    *
    * OWNERSHIP CONTRACT: `indexDir`/`acceptedDir` belong to ONE
    * checkpoint lineage. Batch ids are only meaningful relative to the
    * checkpoint, so starting a NEW query (fresh checkpoint) against
    * populated dirs is undefined — its batch 0 would overwrite the old
    * batch-0 partition and probe past the old batch-0 bands. This is
    * the same contract as Spark's own file sink, whose `_spark_metadata`
    * log is equally checkpoint-bound. To start over, re-seed fresh dirs
    * with [[buildBandIndex]] (its `batch_id=-1` partition is the one
    * slice no micro-batch ever touches).
    */
  def nearDupIngest(newDocs: DataFrame, indexDir: String, acceptedDir: String,
      k: Int = 16, n: Int = 3, rowsPerBand: Int = 2)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // fail at wiring time, not per micro-batch: probing a seed built
    // under different banding admits every near-dup silently
    graft.operators.ArtifactMeta.validate(newDocs.sparkSession, indexDir,
      "streaming band index", Map("k" -> k, "n" -> n, "rowsPerBand" -> rowsPerBand))
    newDocs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val keys = graft.operators.Dedup
          .bandKeysInline(batch.toDF(), k, n, rowsPerBand).persist()
        try {
          val idxPath = new org.apache.hadoop.fs.Path(indexDir)
          val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val seeded = fs.exists(idxPath) &&
            fs.globStatus(new org.apache.hadoop.fs.Path(idxPath, "batch_id=*")).nonEmpty
          val rejected =
            if (!seeded) keys.limit(0).select("doc_id")
            else keys.join(
              spark.read.parquet(indexDir).filter(col("batch_id") =!= batchId),
              Seq("band", "band_key"))
              .select("doc_id").distinct()
          val accepted = batch.join(rejected, Seq("doc_id"), "left_anti")
          accepted.write.mode("overwrite").parquet(s"$acceptedDir/batch_id=$batchId")
          keys.join(rejected, Seq("doc_id"), "left_anti")
            .withColumnRenamed("doc_id", "corpus_doc")
            .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
        } finally { keys.unpersist(); () }
    }
  }

  /** Streaming daily-active-users: watermarked daily tumbling window
    * with `approx_count_distinct(user_id)` — HLL sketch state, so the
    * per-day memory is FIXED regardless of how many distinct users a
    * day brings (an exact streaming distinct would hold every id until
    * the watermark passes — the state that kills the job at 100 TB/
    * day). Register-max merges are associative and commutative, so the
    * streaming estimate is bit-identical to the batch twin over the
    * same data (spec-pinned), and closed days emit exactly once.
    */
  def dauStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "25 hours")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id")).as("approx_dau"))
      .select(col("w.start").cast("date").as("day"), col("approx_dau"))

  /** Seed the versioned snapshot store [[upsertSink]] maintains:
    * writes the base table as version 0.
    */
  def seedSnapshot(base: DataFrame, snapshotDir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = path.getFileSystem(base.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) { fs.delete(path, true); () }
    base.write.mode("overwrite").parquet(s"$snapshotDir/v=0")
  }

  /** One upsert-merge step: read the latest committed snapshot version
    * ≤ `batchId`, apply the change batch latest-wins
    * ([[graft.operators.Incremental.mergeUpsertOf]] — the same merge
    * the batch operator gates), write version `batchId + 1` with
    * mode=overwrite. Replay-safe the same way [[nearDupIngest]] is:
    * a replayed batch re-reads its ORIGINAL input version (its own
    * partially-written output version is excluded by the ≤ batchId
    * bound) and overwrites its own output — identical state, no
    * appends. Exposed separately from the stream wiring so the replay
    * contract is directly spec-testable.
    */
  def upsertMergeStep(batch: DataFrame, snapshotDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.globStatus(new org.apache.hadoop.fs.Path(path, "v=*"))
      .map(_.getPath.getName.drop(2).toLong).filter(_ <= batchId)
    require(versions.nonEmpty, s"no committed snapshot version <= $batchId under $snapshotDir — seed it")
    val current = spark.read.parquet(s"$snapshotDir/v=${versions.max}")
    graft.operators.Incremental.mergeUpsertOf(current, batch)
      .write.mode("overwrite").parquet(s"$snapshotDir/v=${batchId + 1}")
  }

  /** Streaming CDC upsert sink — the live half of the batch
    * `merge_upsert` operator: each micro-batch of change rows
    * (doc_id, seq, op, payload…) merges latest-wins into a versioned
    * parquet snapshot inside foreachBatch. Version `n+1` is a pure
    * function of version ≤ n and batch n, so crash/replay converges
    * (see [[upsertMergeStep]]). Old versions are the time-travel /
    * audit trail; a production deployment compacts them on a
    * retention schedule (the same trade every lakehouse table format
    * makes).
    */
  def upsertSink(changes: DataFrame, snapshotDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        upsertMergeStep(batch.toDF(), snapshotDir, batchId)
    }

  /** One SCD2 generation: read the latest committed dimension version
    * ≤ batchId, apply the micro-batch as a full snapshot via
    * [[graft.operators.Incremental.scd2Of]], write version batchId+1.
    * The snapshot date is a pure function of the batch id (epoch date
    * + batchId days), so version n+1 is a pure function of version ≤ n
    * and batch n — crash/replay converges exactly like
    * [[upsertMergeStep]].
    */
  def scd2MergeStep(batch: DataFrame, dimDir: String, batchId: Long,
      epoch: String = "1996-06-01"): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(dimDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.globStatus(new org.apache.hadoop.fs.Path(path, "v=*"))
      .map(_.getPath.getName.drop(2).toLong).filter(_ <= batchId)
    require(versions.nonEmpty, s"no committed dimension version <= $batchId under $dimDir — seed it")
    val current = spark.read.parquet(s"$dimDir/v=${versions.max}")
    val asOf = java.time.LocalDate.parse(epoch).plusDays(batchId).toString
    graft.operators.Incremental.scd2Of(current, batch, asOf)
      .write.mode("overwrite").parquet(s"$dimDir/v=${batchId + 1}")
  }

  /** Streaming SCD2 sink — the live half of the batch `merge_scd2`
    * operator: each micro-batch is a full dimension snapshot (key,
    * attr) merged Type-2 into a versioned parquet dimension inside
    * foreachBatch: changed/absent current versions close at the
    * batch's snapshot date, new ones open, history accumulates. Same
    * versioned-artifact discipline as [[upsertSink]]: old versions are
    * the audit trail, replay converges.
    */
  def scd2Sink(snapshots: DataFrame, dimDir: String, epoch: String = "1996-06-01")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    snapshots.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        scd2MergeStep(batch.toDF(), dimDir, batchId, epoch)
    }

  /** Stream-static enrichment join: the live event stream joined to a
    * broadcast dimension snapshot (user → market segment), then a
    * watermarked windowed count per segment. Stream-static joins are
    * STATELESS — the static side is just a broadcast probe per
    * micro-batch — so this is the cheapest join shape in streaming and
    * the standard way to attach dimensions at 100 TB/day ingest rates.
    * Works identically on a batch DataFrame (the spec's twin).
    */
  def segmentHourly(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"))),
        "user_id")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("hour"), col("c_mktsegment"), col("n_events"))

  /** Sliding-window event-type counts (2 h window, 1 h slide): each
    * event lands in two windows; watermark evicts closed slides. The
    * trending-top-k feed — rank downstream of the incremental counts,
    * never inside the stateful agg (per-window top-k is a stateless
    * post-pass over emitted rows).
    */
  def slidingCounts(events: DataFrame, win: String = "2 hours", slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "4 hours")
      .groupBy(window(col("ts"), win, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))

  /** Sustained-load (soak) pipeline: the rate source emits
    * `rowsPerSecond` synthetic events over `keys` users, aggregated in
    * 1-second tumbling windows with a 2-second watermark. The exact
    * shape of [[hourlyAgg]] compressed to seconds granularity so a
    * short wall-clock run crosses MANY window closures — what a day of
    * production traffic does to the hourly plan. The invariant under
    * soak is that state stays bounded: every closed window is evicted
    * once the watermark passes it, so `numRowsTotal` plateaus at
    * ~keys × (watermark + window + in-flight) seconds regardless of
    * how long the query runs.
    */
  def rateSoakAgg(spark: SparkSession, rowsPerSecond: Int = 1000, keys: Int = 100): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("timestamp").as("ts"), (col("value") % keys).as("user_id"),
        (col("value") % 97).cast("double").as("value"))
      .withWatermark("ts", "2 seconds")
      .groupBy(window(col("ts"), "1 second").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("sec"), col("user_id"), col("n_events"), col("sum_value"))

  final case class ValEv(event_id: Long, event_type: String, tsMicros: Long, value: Double)
  final case class EwmaState(n: Long, ewma: Double, ewvar: Double)
  final case class Anomaly(event_id: Long, event_type: String, value: Double, zscore: Double)

  /** One sequential EWMA sweep: West's exponentially-weighted
    * mean/variance recurrence, emitting events whose value sits more
    * than `k` EW-sigmas off the running mean once `warmup` events have
    * seeded the state. Shared verbatim by the streaming gate and its
    * batch twin so "batch backfill ≡ live stream" is true by
    * construction — the only thing the streaming runtime adds is state
    * carry-over between micro-batches, which is exactly what the spec
    * pins.
    */
  private def ewmaSweep(typ: String, evs: Iterator[ValEv], prior: Option[EwmaState],
      alpha: Double, k: Double, warmup: Long): (Seq[Anomaly], EwmaState) = {
    val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    var st = prior.getOrElse(EwmaState(0, 0.0, 0.0))
    val out = Seq.newBuilder[Anomaly]
    sorted.foreach { e =>
      val sd = math.sqrt(st.ewvar)
      if (st.n >= warmup && sd > 0 && math.abs(e.value - st.ewma) > k * sd)
        out += Anomaly(e.event_id, typ, e.value,
          math.rint((e.value - st.ewma) / sd * 1e4) / 1e4)
      val delta = e.value - st.ewma
      val incr = alpha * delta
      st = EwmaState(st.n + 1, st.ewma + incr, (1 - alpha) * (st.ewvar + delta * incr))
    }
    (out.result(), st)
  }

  /** Streaming anomaly gate: per-event_type EWMA z-score detector via
    * flatMapGroupsWithState — the ONLINE complement of the batch
    * 3-sigma volume detector (graft.operators.Events.anomalies scans
    * the dense hourly grid; this flags single events against drifting
    * level/spread the moment they arrive). State is ONE fixed-size
    * record per key, independent of stream length — the 100 TB/day
    * shape; keying by event_type matches the batch twin, a production
    * deployment keys by (device, metric) for millions of parallel
    * recurrences. Works identically on a batch DataFrame
    * ([[anomalyGateBatch]]) because flatMapGroupsWithState degrades to
    * a single stateless sweep there.
    */
  def anomalyGate(spark: SparkSession, events: DataFrame, alpha: Double = 0.05,
      k: Double = 3.0, warmup: Long = 20): Dataset[Anomaly] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[ValEv]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, Anomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, evs: Iterator[ValEv], state: GroupState[EwmaState]) =>
          val (out, st) = ewmaSweep(typ, evs, state.getOption, alpha, k, warmup)
          state.update(st)
          out.iterator
      }
  }

  final case class HourEv(event_type: String, h: Long, event_id: Long)
  final case class DenseState(openHour: Long, openCount: Long, ewma: EwmaState)
  final case class HourAnomaly(event_type: String, hour: java.sql.Timestamp,
    n_events: Long, zscore: Double)

  private val HourMicros = 3600L * 1000000L

  /** One sequential dense-hourly sweep for one event_type: consume
    * hour-truncated event stamps in ascending order, counting the open
    * hour; when a LATER hour arrives, the open hour closes, every
    * skipped hour in between closes at count 0 (the dense grid — a
    * silent outage IS a zero-count hour, invisible to any sparse
    * aggregate), and each closed (hour, count) passes through the EWMA
    * z-score recurrence ([[ewmaSweep]]'s West update on hourly counts
    * instead of event values). Shared verbatim by the streaming gate
    * and its batch twin. Late events for already-closed hours are
    * dropped — the same replay-order contract as [[sessionize]].
    */
  /** The hour-closing half of the dense sweeps: consume hour-truncated
    * stamps in ascending order against an (openHour, openCount) state,
    * invoking `onClose` for the open hour and every skipped
    * (zero-count) hour whenever a later hour arrives. Late stamps for
    * already-closed hours are dropped (the [[sessionize]] replay-order
    * contract). Returns the new open state.
    */
  private def closeHours(stamps: Iterator[Long], open: (Long, Long),
      onClose: (Long, Long) => Unit): (Long, Long) = {
    var (openHour, openCount) = open
    stamps.foreach { h =>
      if (openHour == Long.MinValue) { openHour = h; openCount = 1L }
      else if (h == openHour) openCount += 1L
      else if (h > openHour) {
        onClose(openHour, openCount)
        var z = openHour + HourMicros
        while (z < h) { onClose(z, 0L); z += HourMicros }
        openHour = h; openCount = 1L
      }
    }
    (openHour, openCount)
  }

  private def denseSweep(typ: String, stamps: Iterator[Long], prior: Option[DenseState],
      alpha: Double, k: Double, warmup: Long): (Seq[HourAnomaly], DenseState) = {
    var st = prior.getOrElse(DenseState(Long.MinValue, 0L, EwmaState(0, 0.0, 0.0)))
    val out = Seq.newBuilder[HourAnomaly]
    def close(h: Long, n: Long): Unit = {
      val e = st.ewma
      val sd = math.sqrt(e.ewvar)
      if (e.n >= warmup && sd > 0 && math.abs(n - e.ewma) > k * sd)
        out += HourAnomaly(typ, new java.sql.Timestamp(h / 1000L), n,
          math.rint((n - e.ewma) / sd * 1e4) / 1e4)
      val delta = n - e.ewma
      val incr = alpha * delta
      st = st.copy(ewma = EwmaState(e.n + 1, e.ewma + incr, (1 - alpha) * (e.ewvar + delta * incr)))
    }
    val (oh, oc) = closeHours(stamps, (st.openHour, st.openCount), close)
    (out.result(), st.copy(openHour = oh, openCount = oc))
  }

  final case class GapState(openHour: Long, openCount: Long)
  final case class DenseHour(event_type: String, hour: java.sql.Timestamp, n_events: Long)

  /** Streaming gap-fill — the incremental twin of `Events.gapfillOf`'s
    * dense hourly grid: per event_type, every hour between a type's
    * first and latest event is emitted exactly once with its count —
    * INCLUDING silent zero-count hours — the moment a later event
    * closes it. State is one (openHour, openCount) pair per key,
    * independent of stream length. Tail semantics: the open hour emits
    * only when the next event arrives (an unbounded stream cannot know
    * an hour is over without either an event past it or a clock —
    * a production variant adds an event-time timeout for the latter).
    * Works identically on a batch DataFrame ([[gapfillGateBatch]]).
    */
  def gapfillGate(spark: SparkSession, events: DataFrame): Dataset[DenseHour] = {
    import spark.implicits._
    denseInput(events)(spark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[GapState, DenseHour](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, evs: Iterator[HourEv], state: GroupState[GapState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.h, e.event_id)).iterator.map(_.h)
          val st = state.getOption.getOrElse(GapState(Long.MinValue, 0L))
          val out = Seq.newBuilder[DenseHour]
          val (oh, oc) = closeHours(sorted, (st.openHour, st.openCount),
            (h, n) => out += DenseHour(typ, new java.sql.Timestamp(h / 1000L), n))
          state.update(GapState(oh, oc))
          out.result().iterator
      }
  }

  /** Batch twin of [[gapfillGate]]: one sweep over the history. */
  def gapfillGateBatch(spark: SparkSession, events: DataFrame): Dataset[DenseHour] = {
    import spark.implicits._
    denseInput(events)(spark)
      .groupByKey(_.event_type)
      .flatMapGroups { (typ: String, evs: Iterator[HourEv]) =>
        val sorted = evs.toSeq.sortBy(e => (e.h, e.event_id)).iterator.map(_.h)
        val out = Seq.newBuilder[DenseHour]
        closeHours(sorted, (Long.MinValue, 0L),
          (h, n) => out += DenseHour(typ, new java.sql.Timestamp(h / 1000L), n))
        out.result().iterator
      }
  }

  /** Streaming dense-grid anomaly gate — the incremental complement of
    * the batch `Events.anomaliesOf`: that query z-scores the
    * gap-filled hourly series against GLOBAL per-type stats (two
    * passes — impossible unbounded); this one keys by event_type and
    * holds ONE fixed-size record per key (open hour + count + EWMA
    * mean/var), closing hours incrementally — including the zero-count
    * gap hours the dense grid exists for — the moment a later event
    * arrives. State is independent of stream length; the trailing open
    * hour closes only on the next event (streaming-tail semantics: an
    * outage is flagged when traffic RESUMES, which is also the first
    * moment an unbounded stream can distinguish it from the stream
    * ending). Works identically on a batch DataFrame
    * ([[anomalyDenseBatch]]).
    */
  def anomalyDenseGate(spark: SparkSession, events: DataFrame, alpha: Double = 0.1,
      k: Double = 3.0, warmup: Long = 5): Dataset[HourAnomaly] = {
    import spark.implicits._
    denseInput(events)(spark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DenseState, HourAnomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (typ: String, evs: Iterator[HourEv], state: GroupState[DenseState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.h, e.event_id)).iterator.map(_.h)
          val (out, st) = denseSweep(typ, sorted, state.getOption, alpha, k, warmup)
          state.update(st)
          out.iterator
      }
  }

  /** Batch twin of [[anomalyDenseGate]]: one sweep over the history. */
  def anomalyDenseBatch(spark: SparkSession, events: DataFrame, alpha: Double = 0.1,
      k: Double = 3.0, warmup: Long = 5): Dataset[HourAnomaly] = {
    import spark.implicits._
    denseInput(events)(spark)
      .groupByKey(_.event_type)
      .flatMapGroups { (typ: String, evs: Iterator[HourEv]) =>
        val sorted = evs.toSeq.sortBy(e => (e.h, e.event_id)).iterator.map(_.h)
        denseSweep(typ, sorted, None, alpha, k, warmup)._1.iterator
      }
  }

  private def denseInput(events: DataFrame)(spark: SparkSession): Dataset[HourEv] = {
    import spark.implicits._
    events.select(col("event_type"),
      unix_micros(date_trunc("hour", col("ts"))).as("h"), col("event_id")).as[HourEv]
  }

  /** Batch twin of [[anomalyGate]]: the same sweep over the whole
    * history in one pass (no GroupState API on a plain
    * KeyValueGroupedDataset, so the recurrence is invoked directly).
    */
  def anomalyGateBatch(spark: SparkSession, events: DataFrame, alpha: Double = 0.05,
      k: Double = 3.0, warmup: Long = 20): Dataset[Anomaly] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"), col("value"))
      .as[ValEv]
      .groupByKey(_.event_type)
      .flatMapGroups { (typ: String, evs: Iterator[ValEv]) =>
        ewmaSweep(typ, evs, None, alpha, k, warmup)._1.iterator
      }
  }

  /** Hourly top-k users by activity with the custom
    * [[graft.functions.TopKPairsAggregate]] running INSIDE streaming
    * state — two CHAINED stateful aggregations (Spark 3.4+ multiple
    * stateful operators): per-(hour, type, user) counts first, then the
    * bounded-heap top-k re-windowed via `window_time`. The heap buffer
    * serializes into the state store like any partial aggregate, so the
    * stream holds ≤ k pairs per (hour, type) at level 2 — the
    * hand-rolled alternative (flatMapGroupsWithState with a sorted map)
    * is exactly what the aggregate abstraction already does. Append
    * mode: each hour emits once the 2 h watermark closes it. The same
    * plan runs in batch (watermark is a no-op) — the parity twin.
    */
  def topkNative(events: DataFrame, k: Int = 5): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w1"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("w1")), "1 hour").as("w2"), col("event_type"))
      .agg(graft.functions.TopKPairsAggregate
        .topkPairs(col("n").cast("double"), col("user_id"), k).as("top"))
      .select(col("w2.start").as("hour"), col("event_type"),
        posexplode(col("top")).as(Seq("i", "p")))
      .select(col("hour"), col("event_type"), (col("i") + 1).cast("long").as("rank"),
        col("p.id").as("user_id"), col("p.score").cast("long").as("n"))

  final case class SeqEv(user_id: Long, tsMicros: Long, event_id: Long, event_type: String)
  final case class LastEv(tsMicros: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, src: String, dst: String)

  /** One sequential transition sweep for one user: consume events in
    * (ts, event_id) order against a last-event state, emitting one
    * (src → dst) pair per step. Events at or before the state's
    * position are dropped — the replay-order contract every stateful
    * gate here shares ([[sessionize]], [[closeHours]]). Shared
    * verbatim by the streaming gate and its batch twin.
    */
  private def transitionSweep(user: Long, evs: Iterator[SeqEv],
      prior: Option[LastEv]): (Seq[Transition], Option[LastEv]) = {
    val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    var last = prior
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      if (last.forall(l => l.tsMicros < e.tsMicros ||
          (l.tsMicros == e.tsMicros && l.event_id < e.event_id))) {
        last.foreach(l => out += Transition(user, l.event_type, e.event_type))
        last = Some(LastEv(e.tsMicros, e.event_id, e.event_type))
      }
    }
    (out.result(), last)
  }

  /** Incremental Markov transitions — the streaming form of
    * [[graft.operators.Features.markovTransitionsOf]]: per-user state
    * is exactly ONE last-event record however long the stream runs,
    * each micro-batch emits only its NEW (src → dst) steps (append
    * mode), and the |types|² matrix is a stateless downstream count —
    * so the behavioral model updates continuously without ever
    * re-reading the event log. Batch ≡ stream by shared sweep.
    */
  def markovGate(spark: SparkSession, events: DataFrame): Dataset[Transition] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("event_type"))
      .as[SeqEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[SeqEv], state: GroupState[LastEv]) =>
          val (out, st) = transitionSweep(user, evs, state.getOption)
          st.foreach(state.update)
          out.iterator
      }
  }

  /** Batch twin of [[markovGate]] — the identical sweep without state
    * carry-over (one group pass = the whole history).
    */
  def markovGateBatch(spark: SparkSession, events: DataFrame): Dataset[Transition] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id"), col("event_type"))
      .as[SeqEv]
      .groupByKey(_.user_id)
      .flatMapGroups { (user: Long, evs: Iterator[SeqEv]) =>
        transitionSweep(user, evs, None)._1.iterator
      }
  }

  /** Streaming published-rule gate — the Gopher quality rules
    * ([[graft.operators.QualityRules]]) applied to crawl batches as
    * they land. Entirely STATELESS (pure column expressions, no
    * aggregation, no watermark): each micro-batch filters
    * independently, so the gate composes in front of any stateful
    * stage ([[corpusIngestBounded]], [[nearDupIngest]]) without
    * adding state of its own. Works identically on a batch DataFrame
    * (the spec's parity twin).
    */
  def ruleGate(docs: DataFrame, minWords: Int = 50): DataFrame =
    docs
      .withColumn("gopher_pass",
        graft.operators.QualityRules.gopherPassCol(col("text"), minWords))
      .filter(col("gopher_pass") === 1)
      .select(col("doc_id"), col("source"), col("n_chars"))

  /** Running weighted sample over an unbounded stream — the streaming
    * form of [[graft.operators.Analytics2.weightedSampleOf]]: the
    * deterministic sequential-Poisson key (u(id)/weight) is scored by
    * the SAME column expression as the batch op, and the k smallest
    * keys are held by the bounded-heap [[graft.functions
    * .TopKPairsAggregate]] running as streaming state (score = −key,
    * so the heap's top-k-desc IS k-smallest). State is exactly one
    * ≤k-pair heap — a corpus-wide continuous sample at O(k) memory,
    * which is the point: the batch op re-scans everything per refresh,
    * this never re-reads a landed batch. Complete output mode (the
    * sample is a living snapshot, not a delta). Stream ≡ batch
    * selection by construction; the spec pins it.
    */
  def runningSample(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .select(col("doc_id"),
        (-graft.operators.Analytics2.sampleKey(col("doc_id"), col("n_chars"))).as("negkey"))
      .groupBy()
      .agg(graft.functions.TopKPairsAggregate.topkPairs(col("negkey"), col("doc_id"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "p")))
      .select((col("i") + 1).cast("long").as("rank"), col("p.id").as("doc_id"),
        round(-col("p.score") * 1e6, 6).as("key_ppm"))

  final case class BinDoc(source: String, bin: Int)
  final case class PsiState(counts: Seq[Long])
  final case class PsiRow(source: String, n_docs: Long, psi: Double)

  /** One PSI evaluation from raw per-bin counts against fixed baseline
    * rates — add-one smoothing, ln-ratio sum, 6-decimal round — shared
    * verbatim by the streaming gate and its batch twin so "backfill ≡
    * live" is true by construction.
    */
  private def psiSweep(source: String, counts: Array[Long],
      rates: Array[Double]): PsiRow = {
    val nDocs = counts.sum
    val sTot = (nDocs + counts.length).toDouble
    var psi = 0.0
    var b = 0
    while (b < counts.length) {
      val p = (counts(b) + 1) / sTot
      psi += (p - rates(b)) * math.log(p / rates(b))
      b += 1
    }
    PsiRow(source, nDocs, math.rint(psi * 1e6) / 1e6)
  }

  /** Streaming drift monitor — the online form of
    * [[graft.operators.Analytics3.psiDriftOf]]: Population Stability
    * Index of each source's incoming document-length distribution
    * against a FIXED reference corpus. The baseline is
    * [[graft.operators.Analytics3.psiBaselineRates]] — ≤|bins| doubles,
    * an enum-sized model parameter inlined at plan construction (the
    * hyperplane policy), so scoring needs zero joins. Documents bin at
    * the scan with the SAME CASE chain as the batch op; state is one
    * |bins|-long count vector per source — fixed size however much
    * traffic lands, the 100 TB/day shape — and each micro-batch
    * re-emits that source's updated PSI (update mode: the monitor is a
    * living snapshot per feed). Works identically on a batch DataFrame
    * ([[psiGateBatch]]).
    */
  def psiGate(spark: SparkSession, docs: DataFrame, baselineRates: Array[Double],
      edges: Seq[Int] = graft.operators.Analytics3.psiDefaultEdges): Dataset[PsiRow] = {
    import spark.implicits._
    val nBins = edges.size + 1
    require(baselineRates.length == nBins,
      s"baselineRates has ${baselineRates.length} bins, edges imply $nBins")
    docs
      .select(col("source"),
        graft.operators.Analytics3.psiBinCol(edges).cast("int").as("bin"))
      .as[BinDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[PsiState, PsiRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, ds: Iterator[BinDoc], state: GroupState[PsiState]) =>
          val counts = state.getOption.map(_.counts.toArray)
            .getOrElse(Array.fill(nBins)(0L))
          ds.foreach(d => counts(d.bin) += 1)
          state.update(PsiState(counts.toSeq))
          Iterator.single(psiSweep(source, counts, baselineRates))
      }
  }

  /** Batch twin of [[psiGate]]: one sweep per source over the full
    * history — same binning, same smoothing, same rounding.
    */
  def psiGateBatch(spark: SparkSession, docs: DataFrame, baselineRates: Array[Double],
      edges: Seq[Int] = graft.operators.Analytics3.psiDefaultEdges): Dataset[PsiRow] = {
    import spark.implicits._
    val nBins = edges.size + 1
    // Same shape guard as [[psiGate]]: a short baseline would throw
    // ArrayIndexOutOfBounds inside the mapGroups task, a long one
    // would silently ignore trailing rates and report a wrong PSI —
    // fail at plan time with the actual vs implied bin counts instead.
    require(baselineRates.length == nBins,
      s"baselineRates has ${baselineRates.length} bins, edges imply $nBins")
    docs
      .select(col("source"),
        graft.operators.Analytics3.psiBinCol(edges).cast("int").as("bin"))
      .as[BinDoc]
      .groupByKey(_.source)
      .mapGroups { (source, ds) =>
        val counts = Array.fill(nBins)(0L)
        ds.foreach(d => counts(d.bin) += 1)
        psiSweep(source, counts, baselineRates)
      }
  }

  final case class DigitRow(digit: Int)
  final case class DigitCount(digit: Int, cnt: Long)
  final case class BenfordState(counts: Seq[Long])
  final case class BenfordRow(n: Long, chi2: Double)

  /** One Benford evaluation from per-digit counts: χ² against the
    * log10(1+1/d) expectation, 4-decimal round — shared verbatim by
    * the streaming gate and its batch twin.
    */
  private def benfordSweep(counts: Array[Long]): BenfordRow = {
    val n = counts.sum.toDouble
    var chi2 = 0.0
    var d = 1
    while (d <= 9) {
      val p = math.log10(1.0 + 1.0 / d)
      val e = n * p
      if (e > 0) { val diff = counts(d - 1) - e; chi2 += diff * diff / e }
      d += 1
    }
    BenfordRow(counts.sum, math.rint(chi2 * 1e4) / 1e4)
  }

  /** Streaming Benford monitor — the online form of
    * [[graft.operators.Analytics3.benfordOf]]'s conformance screen: a
    * running χ² of the first-digit distribution of incoming amounts
    * against Benford's law, re-emitted per micro-batch (update mode —
    * the monitor is a living snapshot). The digit is extracted with
    * the SAME exact integer-cents path as the batch op (no
    * floor(log10) float boundary); state is ONE 9-long count vector
    * for the whole stream — fixed size at any volume, the
    * fraud-screen shape a payments pipeline runs against live traffic.
    * Works identically on a batch DataFrame ([[benfordGateBatch]]).
    */
  def benfordGate(spark: SparkSession, amounts: DataFrame,
      amountCol: String = "o_totalprice"): Dataset[BenfordRow] = {
    import spark.implicits._
    // Per-partition STATELESS combine before the single stateful key:
    // each partition of the micro-batch collapses to ≤9 (digit, cnt)
    // rows, so the one-key shuffle carries ≤9×partitions rows and the
    // single stateful task folds counts, never iterating raw traffic —
    // without this the global key serializes every payment through one
    // core even though state is fixed-size. (A groupBy(digit) agg here
    // would be a second STATEFUL operator — cumulative, not per-batch —
    // so the combine must be the stateless mapPartitions form.)
    digits(amounts, amountCol)
      .mapPartitions { it =>
        val c = Array.fill(9)(0L)
        it.foreach(r => c(r.digit - 1) += 1)
        (1 to 9).iterator.filter(d => c(d - 1) > 0).map(d => DigitCount(d, c(d - 1)))
      }
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[BenfordState, BenfordRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Int, ds: Iterator[DigitCount], state: GroupState[BenfordState]) =>
          val counts = state.getOption.map(_.counts.toArray).getOrElse(Array.fill(9)(0L))
          ds.foreach(r => counts(r.digit - 1) += r.cnt)
          state.update(BenfordState(counts.toSeq))
          Iterator.single(benfordSweep(counts))
      }
  }

  /** Batch twin of [[benfordGate]]: the digit counts collapse in a
    * distributed ≤9-group aggregate (collecting 9 rows, never the
    * stream), then the same sweep.
    */
  def benfordGateBatch(spark: SparkSession, amounts: DataFrame,
      amountCol: String = "o_totalprice"): Dataset[BenfordRow] = {
    import spark.implicits._
    val counts = Array.fill(9)(0L)
    digits(amounts, amountCol).groupBy("digit").agg(count(lit(1)).as("n"))
      .collect().foreach(r => counts(r.getInt(0) - 1) = r.getLong(1))
    spark.createDataset(Seq(benfordSweep(counts)))
  }

  private def digits(amounts: DataFrame, amountCol: String) = {
    import amounts.sparkSession.implicits._
    // abs BEFORE the string split: a refund's "-" in position 1 would
    // throw on the ANSI cast and kill the streaming query (same fix as
    // the batch op). Benford runs on magnitudes.
    amounts
      .select(substring(abs(round(col(amountCol) * 100).cast("long")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit").between(1, 9))
      .as[DigitRow]
  }

  /** Drain a streaming query into an in-memory table (test/smoke
    * convenience): processes everything currently available, then stops.
    */
  def runToMemory(df: DataFrame, name: String, mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }

  final case class KeyCount(key: String, cnt: Long)
  final case class EwmaGateState(ewma: Double, n: Long)
  final case class EwmaRow(event_type: String, n_events: Long, ewma: Double,
      is_spike: Option[Boolean])

  /** Streaming EWMA spike monitor — the UNBOUNDED-horizon form of
    * [[graft.operators.Analytics3.ewmaOf]] (whose inverse-decay window
    * closed form is bounded to a few hundred points by construction —
    * its scaladoc points here): the recurrence e ← αx + (1−α)e runs
    * natively one micro-batch at a time, per event type, with TWO
    * doubles of state per key at any traffic volume. The observation
    * grain is the micro-batch count (the batch op's is daily — grains
    * are deployment policy; the recurrence and the spike rule are
    * shared semantics, spec-pinned against a driver-side fold). Rows
    * pre-collapse per partition to ≤|types| (key, cnt) pairs before
    * the stateful shuffle (the [[benfordGate]] combine), so the
    * stateful task folds counts, never raw traffic. Each batch
    * re-emits the key's row (update mode): count, smoothed level,
    * and the spike flag against the PRIOR batch's level (None on the
    * first observation — no baseline yet).
    */
  def ewmaGate(spark: SparkSession, events: DataFrame, alpha: Double = 0.3,
      spikeRatio: Double = 1.3): Dataset[EwmaRow] = {
    import spark.implicits._
    events.select(col("event_type").as("key")).as[Tuple1[String]]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, Long]
        it.foreach(k => m.update(k._1, m.getOrElse(k._1, 0L) + 1))
        m.iterator.map { case (k, c) => KeyCount(k, c) }
      }
      .groupByKey(_.key)
      .flatMapGroupsWithState[EwmaGateState, EwmaRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, ds: Iterator[KeyCount], state: GroupState[EwmaGateState]) =>
          val x = ds.map(_.cnt).sum.toDouble
          state.getOption match {
            case None =>
              state.update(EwmaGateState(x, 1L))
              Iterator.single(EwmaRow(key, x.toLong, math.rint(x * 1e6) / 1e6, None))
            case Some(EwmaGateState(prev, n)) =>
              val e = alpha * x + (1.0 - alpha) * prev
              state.update(EwmaGateState(e, n + 1))
              Iterator.single(EwmaRow(key, x.toLong, math.rint(e * 1e6) / 1e6,
                Some(x > prev * spikeRatio)))
          }
      }
  }

  final case class HoltGateState(s1: Double, s2: Double, forecast: Double, n: Long)
  final case class HoltRow(event_type: String, n_events: Long, level: Double,
      trend: Double, forecast: Double, forecast_err: Option[Double])

  /** Streaming Brown double-smoothing monitor — the unbounded-horizon
    * form of [[graft.operators.Analytics4.holtBrownOf]], exactly as
    * [[ewmaGate]] is to the batch ewma: both recurrences (S1 ← αx +
    * qS1, S2 ← αS1 + qS2, seeded at x₀) run natively one micro-batch
    * at a time with FOUR doubles of state per key at any volume. Emits
    * the trend-tracking level, the per-batch trend estimate, the
    * one-step forecast, and the signed error of the PRIOR batch's
    * forecast against this batch's observation (None on the first two
    * batches — Brown's trend needs two points before the forecast
    * means anything). Same per-partition pre-collapse as [[ewmaGate]]:
    * only ≤|types| (key, cnt) rows reach the stateful task.
    */
  def holtGate(spark: SparkSession, events: DataFrame,
      alpha: Double = 0.3): Dataset[HoltRow] = {
    import spark.implicits._
    val q = 1.0 - alpha
    events.select(col("event_type").as("key")).as[Tuple1[String]]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, Long]
        it.foreach(k => m.update(k._1, m.getOrElse(k._1, 0L) + 1))
        m.iterator.map { case (k, c) => KeyCount(k, c) }
      }
      .groupByKey(_.key)
      .flatMapGroupsWithState[HoltGateState, HoltRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, ds: Iterator[KeyCount], state: GroupState[HoltGateState]) =>
          val x = ds.map(_.cnt).sum.toDouble
          def r6(v: Double) = math.rint(v * 1e6) / 1e6
          state.getOption match {
            case None =>
              // seed batch: S1 = S2 = x ⇒ level = x, trend = 0,
              // forecast(next) = x; no prior forecast to score
              state.update(HoltGateState(x, x, x, 1L))
              Iterator.single(HoltRow(key, x.toLong, r6(x), 0.0, r6(x), None))
            case Some(st) =>
              val s1 = alpha * x + q * st.s1
              val s2 = alpha * s1 + q * st.s2
              val level = 2.0 * s1 - s2
              val trend = alpha / q * (s1 - s2)
              val fc = level + trend
              state.update(HoltGateState(s1, s2, fc, st.n + 1))
              // the seed forecast is the flat x0 — scoreable but only
              // meaningful once the trend term exists (n ≥ 2)
              val err = if (st.n >= 2) Some(r6(x - st.forecast)) else None
              Iterator.single(HoltRow(key, x.toLong, r6(level), r6(trend), r6(fc), err))
          }
      }
  }

  final case class CusumState(mean: Double, sPos: Double, sNeg: Double, n: Long)
  final case class CusumRow(event_type: String, n_events: Long, s_pos: Double,
      s_neg: Double, alarm: Boolean)

  /** Streaming CUSUM change detector (Page 1954) — the sequential
    * test that catches small SUSTAINED level shifts EWMA's per-point
    * spike rule misses: per event type, against a reference level μ
    * learned as the running mean of the first `warmup` batches,
    *   S⁺ ← max(0, S⁺ + (x − μ − slack)),
    *   S⁻ ← max(0, S⁻ + (μ − x − slack)),
    * alarm when either exceeds `h`. The max(0,·) recursion has no
    * windowed closed form (unlike EWMA's), so the streaming stateful
    * fold IS the natural home of this operator — state is four
    * numbers per key at any volume; the same per-partition combine as
    * [[ewmaGate]] keeps raw traffic off the stateful task. Slack and
    * threshold are in μ units (fractions), the standard
    * parameterization when the level varies per key.
    */
  def cusumGate(spark: SparkSession, events: DataFrame, warmup: Int = 3,
      slackFrac: Double = 0.05, hFrac: Double = 0.5): Dataset[CusumRow] = {
    import spark.implicits._
    events.select(col("event_type").as("key")).as[Tuple1[String]]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, Long]
        it.foreach(k => m.update(k._1, m.getOrElse(k._1, 0L) + 1))
        m.iterator.map { case (k, c) => KeyCount(k, c) }
      }
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, ds: Iterator[KeyCount], state: GroupState[CusumState]) =>
          val x = ds.map(_.cnt).sum.toDouble
          val st = state.getOption.getOrElse(CusumState(0.0, 0.0, 0.0, 0L))
          if (st.n < warmup) {
            // reference level: running mean over the warmup prefix;
            // no alarms while the baseline is still forming
            val mean = (st.mean * st.n + x) / (st.n + 1)
            state.update(CusumState(mean, 0.0, 0.0, st.n + 1))
            Iterator.single(CusumRow(key, x.toLong, 0.0, 0.0, alarm = false))
          } else {
            val slack = slackFrac * st.mean
            val h = hFrac * st.mean
            val sPos = math.max(0.0, st.sPos + (x - st.mean - slack))
            val sNeg = math.max(0.0, st.sNeg + (st.mean - x - slack))
            state.update(CusumState(st.mean, sPos, sNeg, st.n + 1))
            Iterator.single(CusumRow(key, x.toLong,
              math.rint(sPos * 1e6) / 1e6, math.rint(sNeg * 1e6) / 1e6,
              alarm = sPos > h || sNeg > h))
          }
      }
  }

  final case class IaEv(user_id: Long, tsSec: Long, event_id: Long)
  final case class IaState(nGaps: Long, sumG: Long, sumGG: Long, lastSec: Long)
  final case class IaRow(user_id: Long, n_gaps: Long, mean_gap_s: Double,
      sd_gap_s: Option[Double], cv: Option[Double], burstiness: Option[Double])

  /** Streaming inter-arrival burstiness — the UNBOUNDED-horizon form
    * of [[graft.operators.Behavior.interArrivalOf]]: per user, the
    * gap moments (n, Σg, Σg²) and the last-seen second are FOUR longs
    * of state at any volume, folded one micro-batch at a time; gaps
    * spanning a batch boundary are stitched through the stored
    * last-seen second, so the emitted statistics are exactly the
    * batch op's over everything seen so far (the spec pins the
    * equality). Each batch re-emits the user's row (update mode) with
    * the SAME formula chain as the batch twin — mean/σ/cv/Goh–Barabási
    * B from exact integer moments (BigInt for the σ numerator, the
    * decimal lane's overflow headroom), NULL (None) for the
    * degenerate one-gap / all-simultaneous cases. Headroom: Σg²
    * overflows a long past ~10⁹ seconds² × 10⁹ gaps — at that volume
    * per user you have a different problem.
    */
  def interArrivalGate(spark: SparkSession, events: DataFrame): Dataset[IaRow] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("tsSec"), col("event_id"))
      .as[IaEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[IaState, IaRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[IaEv], state: GroupState[IaState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.tsSec, e.event_id))
          var st = state.getOption.getOrElse(IaState(0L, 0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            if (st.lastSec != Long.MinValue) {
              val g = e.tsSec - st.lastSec
              st = IaState(st.nGaps + 1, st.sumG + g, st.sumGG + g * g, e.tsSec)
            } else st = st.copy(lastSec = e.tsSec)
          }
          state.update(st)
          if (st.nGaps == 0) Iterator.empty
          else {
            val n = st.nGaps
            val mean = st.sumG.toDouble / n.toDouble
            if (n < 2) Iterator.single(IaRow(user, n, mean, None, None, None))
            else {
              val varNum = (BigInt(n) * BigInt(st.sumGG)
                - BigInt(st.sumG) * BigInt(st.sumG)).toDouble
              val sigma = math.sqrt(varNum / (n.toDouble * (n - 1).toDouble))
              val cv = if (st.sumG > 0) Some(sigma / mean) else None
              val b = if (st.sumG > 0 || varNum > 0)
                Some((sigma - mean) / (sigma + mean)) else None
              Iterator.single(IaRow(user, n, mean, Some(sigma), cv, b))
            }
          }
      }
  }

  final case class FinEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class OpenSession(seq: Long, events: Long, firstTs: Long, lastTs: Long)
  final case class FinalSession(user_id: Long, session_seq: Long, n_events: Long,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Timeout-finalized sessionization — the production emit-once form
    * of [[sessionize]]: a session row is emitted EXACTLY when it can
    * never grow again. Intra-batch closures (a later event arrives
    * past the gap) emit immediately; the open tail emits when the
    * EVENT-TIME watermark passes last_event + gap — the
    * `GroupStateTimeout.EventTimeTimeout` path, which [[sessionize]]
    * (emit-on-next-event) cannot express: without it a user's final
    * session dangles forever. Append mode: every emitted row is
    * immutable. State per user is ONE open-session accumulator (4
    * longs); the timeout timestamp is clamped to watermark+1ms when a
    * straggler's gap deadline already passed (Spark requires timeouts
    * strictly beyond the watermark).
    */
  def sessionFinalize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30, lateness: String = "1 minute"): Dataset[FinalSession] = {
    import spark.implicits._
    val gapMillis = gapMinutes * 60L * 1000L
    def toTs(millis: Long) = new java.sql.Timestamp(millis)
    events
      // watermark AFTER the projection: the event-time column must
      // survive into the Dataset feeding flatMapGroupsWithState, or
      // Spark rejects the EventTimeTimeout at analysis
      .select(col("user_id"), col("ts"), col("event_id"))
      .withWatermark("ts", lateness)
      .as[FinEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, FinalSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[FinEv], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            // keep a seq CURSOR instead of state.remove() (ADVICE r11):
            // removal would restart a returning user at seq 0 and emit a
            // second FinalSession with a duplicate (user_id, session_seq)
            // key into an append sink documented as emit-once/immutable.
            // The empty-session sentinel (events=0) sets NO new timeout,
            // so it never re-fires; cost is one 4-long record per user
            // ever seen — the same bounded-state class as the
            // interArrival gate's NoTimeout cursor.
            state.update(OpenSession(s.seq + 1, 0L, 0L, Long.MinValue))
            if (s.events > 0)
              Iterator.single(FinalSession(user, s.seq, s.events, toTs(s.firstTs), toTs(s.lastTs)))
            else Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = Seq.newBuilder[FinalSession]
            var acc = state.getOption.getOrElse(OpenSession(0L, 0L, 0L, Long.MinValue))
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (acc.events > 0 && t - acc.lastTs > gapMillis) {
                out += FinalSession(user, acc.seq, acc.events, toTs(acc.firstTs), toTs(acc.lastTs))
                acc = OpenSession(acc.seq + 1, 0L, 0L, Long.MinValue)
              }
              acc =
                if (acc.events == 0) OpenSession(acc.seq, 1L, t, t)
                else acc.copy(events = acc.events + 1, lastTs = t)
            }
            state.update(acc)
            // fire when the watermark proves no in-gap event can still arrive
            state.setTimeoutTimestamp(
              math.max(acc.lastTs + gapMillis, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }
}
