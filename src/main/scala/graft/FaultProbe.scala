package graft

import org.apache.spark.sql.streaming.Trigger

/** Executor-LOSS fault injection under local-cluster (r14, VERDICT
  * r13 #3) — the one distributed property the r13 multi-JVM sweep
  * (docs/verify_cluster_r13.md) did not exercise: a worker JVM dying
  * MID-JOB. Two probes, each SIGKILLing one live
  * CoarseGrainedExecutorBackend process while work is in flight and
  * asserting the job completes with a result BIT-IDENTICAL to the
  * unfaulted baseline, on Spark's DEFAULT recovery machinery (no
  * tuned retry conf — the claim is that the gated plans survive loss
  * as written):
  *
  *   1. `dedup_minhash_lsh` — the shuffle-heavy banded-dedup carrier
  *      the 100 TB claim rides on. The kill lands after the first
  *      stages have produced shuffle output, so recovery exercises
  *      FetchFailed → parent-stage resubmission (the lost map outputs
  *      are recomputed on the survivor), not just task rescheduling.
  *   2. `Streams.sessionize` (flatMapGroupsWithState) over a
  *      multi-batch file stream — the stateful-streaming gate. The
  *      kill lands after ≥2 micro-batches have committed, so the
  *      replacement executor must reload HDFSBackedStateStore state
  *      from the checkpoint and replay the in-flight batch
  *      exactly-once. Batch boundaries are driver-planned (offsets in
  *      the checkpoint log), so the faulted run folds the identical
  *      event sequence and must emit the identical session set.
  *
  * The kill targets only THIS app's executors (command line filtered
  * by applicationId), so a concurrent sbt/Spark JVM on the machine is
  * never touched. Run (the committed evidence run —
  * docs/fault_probe_r14.md):
  * {{{
  * SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   SPARK_GRAFT_MASTER=local-cluster[2,16,8192] \
  *   SPARK_GRAFT_EXECUTOR_CP=$PWD/target/scala-2.13/classes \
  *   sbt "runMain graft.FaultProbe /root/testdata/sf0.01"
  * }}}
  */
object FaultProbe {
  private def executorHandles(appId: String): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala.filter { h =>
      val cmd = h.info.commandLine
      cmd.isPresent && cmd.get.contains("CoarseGrainedExecutorBackend") &&
        cmd.get.contains(appId)
    }.toSeq
  }

  /** Order-insensitive fingerprint so the comparison can't pass on a
    * lucky prefix or fail on task-order nondeterminism the operators
    * already sort away.
    */
  private def fingerprint(rows: Array[org.apache.spark.sql.Row]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.map(_.toString).sorted.foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,8192]")
    require(master.startsWith("local-cluster"),
      s"FaultProbe needs separate executor JVMs to kill; got master=$master")
    val builder = GraftSession.builder(master = master, appName = "graft-fault-probe")
      .config("spark.sql.shuffle.partitions", cpus)
    val spark = sys.env.get("SPARK_GRAFT_EXECUTOR_CP")
      .fold(builder)(cp => builder.config("spark.executor.extraClassPath", cp))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val appId = spark.sparkContext.applicationId

    // ---- probe 1: shuffle-heavy batch query, executor killed mid-flight
    val fn = SparkEntry.queries("dedup_minhash_lsh")
    val baseline = fingerprint(fn(spark, sfDir).collect())
    val before = executorHandles(appId)
    require(before.size >= 2, s"expected >= 2 executor JVMs, saw ${before.size}")

    @volatile var killedBatch = -1L
    val tracker = spark.sparkContext.statusTracker
    val killer = new Thread(() => {
      // fire once the re-run is executing tasks, after a short grace so
      // early stages have produced shuffle output worth losing
      var waitedMs = 0
      while (tracker.getActiveStageIds.isEmpty && waitedMs < 30000) {
        Thread.sleep(20); waitedMs += 20
      }
      Thread.sleep(250)
      executorHandles(appId).sortBy(_.pid).headOption.foreach { h =>
        killedBatch = h.pid; h.destroyForcibly(): Unit
      }
    })
    killer.start()
    val faulted = fingerprint(fn(spark, sfDir).collect())
    killer.join()
    require(killedBatch > 0,
      "kill thread never fired — the query finished before any stage went active")
    require(faulted == baseline,
      s"executor-loss batch run diverged: $faulted vs $baseline")

    // ---- probe 2: stateful streaming gate across an executor loss ----
    // events split into 16 files so AvailableNow at 2 files/trigger
    // takes ~8 micro-batches — enough committed state BEFORE the kill
    // that recovery must reload the state store, and enough batches
    // AFTER it that the replacement executor carries real work.
    val inDir = "target/faultprobe_events"
    spark.read.parquet(s"$sfDir/events.parquet").repartition(16)
      .write.mode("overwrite").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-fault-ckpt").toString
    def runSessions(name: String, onProgress: () => Unit): String = {
      val src = graft.sources.Tables.normalizeTs(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "2").parquet(inDir))
      val q = graft.streaming.Streams.sessionize(spark, src)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .option("checkpointLocation", s"$ckptRoot/$name")
        .trigger(Trigger.AvailableNow()).start()
      val watcher = new Thread(() => onProgress())
      watcher.start()
      q.awaitTermination()
      watcher.join()
      fingerprint(spark.table(name).collect())
    }
    val streamBase = runSessions("fp_base", () => ())
    @volatile var killedStream = -1L
    val streamFault = runSessions("fp_fault", () => {
      val q = spark.streams.active.find(_.name == "fp_fault")
      var waitedMs = 0
      while (q.exists(_.isActive) &&
          q.forall(_.recentProgress.length < 2) && waitedMs < 60000) {
        Thread.sleep(50); waitedMs += 50
      }
      if (q.exists(_.isActive))
        executorHandles(appId).sortBy(_.pid).headOption.foreach { h =>
          killedStream = h.pid; h.destroyForcibly(): Unit
        }
    })
    require(killedStream > 0,
      "stream kill never fired — the stream drained before two batches committed")
    require(streamFault == streamBase,
      s"executor-loss stream run diverged: $streamFault vs $streamBase")

    val nRows = spark.table("fp_fault").count()
    val execsNow = spark.sparkContext.getExecutorMemoryStatus.keySet.size
    println(s"[fault-probe] master=$master app=$appId " +
      s"killed_batch_pid=$killedBatch batch_hash_equal=true " +
      s"killed_stream_pid=$killedStream stream_sessions=$nRows stream_hash_equal=true " +
      s"executors_now=$execsNow")
    spark.stop()
  }
}
