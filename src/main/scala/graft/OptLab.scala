package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): runs declared
  * queries through the same noop-sink timing as the bench, but with a
  * stage listener attached so the wall-clock decomposes into stages —
  * which exchange, scan or sort actually carries the time. Evidence
  * tool only; the graded artifact stays `graft.Bench`.
  *
  * Usage: runMain graft.OptLab <sfDir> <cpus> <name[,name...]>
  */
object OptLab {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: OptLab <sfDir> <cpus> <names>")
    val Array(sfDir, cpus, namesArg) = args
    val names = namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val b = GraftSession.builder(master = s"local[$cpus]", appName = "graft-optlab")
      .config("spark.sql.shuffle.partitions", cpus)
    // A/B experiment overrides: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").map(_.trim).filter(_.contains("=")))
      .getOrElse(Array.empty)
      .foldLeft(b) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v)
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    case class St(name: String, ms: Long, runMs: Long, cpuMs: Long, gcMs: Long,
      tasks: Int, shufReadMb: Double, shufWriteMb: Double, inMb: Double)
    val stages = mutable.ArrayBuffer.empty[St]
    var collecting = false
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = e.stageInfo
          val m = si.taskMetrics
          val wall = for {
            c <- si.completionTime; s <- si.submissionTime
          } yield c - s
          stages += St(si.name.takeWhile(_ != '\n').take(90), wall.getOrElse(-1L),
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // operator-level evidence: capture the WRITE QueryExecution of the
    // last run and dump each physical node with its SQL metrics
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = { lastQe = qe }
      override def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = {}
    })
    def dumpOps(): Unit = {
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val qe = lastQe
      if (qe == null) { println("[optlab] no qe captured"); return }
      val out = new StringBuilder
      def walk(p: SparkPlan, depth: Int): Unit = {
        val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }
          .filter(s => s.contains("numOutputRows") || s.contains("Time") ||
            s.contains("dataSize") || s.contains("spill"))
          .take(4).mkString(" ")
        out.append(f"[optlab-op] ${"  " * depth}${p.nodeName}%-38s $m%n")
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
          case q: QueryStageExec => walk(q.plan, depth + 1)
          case _ => p.children.foreach(walk(_, depth + 1))
        }
      }
      walk(qe.executedPlan, 0)
      println(out.toString)
    }

    def steal(): Long = scala.io.Source.fromFile("/proc/stat").getLines()
      .next().trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(0L)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val st0 = steal()
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val w1 = once()
      stages.clear(); collecting = true
      val w2 = once()
      collecting = false
      // listener bus is async; give it a beat before reading
      Thread.sleep(300)
      println(f"%n[optlab] $n cold=$cold%.2f warm1=$w1%.2f warm2=$w2%.2f steal=${(steal() - st0) / 100.0}%.1fs  (stage breakdown of warm2)")
      val total = stages.map(_.ms).sum
      println(f"[optlab] stages=${stages.size} stage-wall-sum=${total / 1000.0}%.2f s (overlap possible)")
      stages.sortBy(-_.ms).take(14).foreach { s =>
        println(f"[optlab]   ${s.ms}%6d ms  run=${s.runMs}%7d cpu=${s.cpuMs}%7d gc=${s.gcMs}%5d t=${s.tasks}%4d  sr=${s.shufReadMb}%8.1f sw=${s.shufWriteMb}%8.1f in=${s.inMb}%8.1f  ${s.name}")
      }
      if (sys.env.contains("SPARK_GRAFT_OPS")) dumpOps()
    }
    spark.stop()
  }
}
