package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory.
  *
  * The reference engine hand-manages parallelism (CPU affinity, RAM
  * estimates, queue sizes — /root/reference v2/main.py:205-266,
  * v2/core/affinity.py). In Spark all of that collapses into session
  * conf: AQE re-plans at runtime, shuffle partitioning replaces queue
  * fan-out, and the scheduler replaces the hand-rolled process pools.
  */
object GraftSession {

  /** Defaults chosen for local[32] testing but scale-safe: AQE handles
    * partition coalescing and skew at any cluster size; shuffle
    * partitions are overridden per-deployment (32 locally; on a real
    * cluster set ~2-3x total cores or rely on AQE coalescing).
    */
  def builder(master: String = "local[32]", appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // dimension/size tables up to 64 MB broadcast instead of SMJ;
      // genuinely big sides (shingle/fact tables at scale) still exceed
      // this and fall back to shuffle joins.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is INT64 TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName = appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The conf deltas for a real multi-executor deployment (100 TB /
    * ~1000 executors) — applied on top of [[builder]]. Kept as data so
    * the scale posture is reviewable and testable, not tribal
    * knowledge. Values are starting points per public Spark tuning
    * guidance; the constant is unused in local mode by design.
    */
  val clusterConf: Map[String, String] = Map(
    // shuffle sizing: AQE coalesces down from a high initial count so
    // wide stages never start under-partitioned at 100 TB
    "spark.sql.shuffle.partitions" -> "4000",
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "4000",
    // ~128 MB scan splits keep task count ∝ data size
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    // executors sized for shuffle-heavy text/dedup work
    "spark.executor.cores" -> "4",
    "spark.executor.memory" -> "16g",
    "spark.executor.memoryOverhead" -> "4g",
    "spark.memory.fraction" -> "0.6",
    // elastic fleet with shuffle data preserved across executor loss
    "spark.dynamicAllocation.enabled" -> "true",
    "spark.dynamicAllocation.maxExecutors" -> "1000",
    "spark.shuffle.service.enabled" -> "true",
    // durable shuffle + zstd everywhere (I/O-bound at this scale)
    "spark.io.compression.codec" -> "zstd",
    "spark.shuffle.compress" -> "true",
    "spark.speculation" -> "true")
}
