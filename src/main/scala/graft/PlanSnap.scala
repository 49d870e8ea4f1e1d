package graft

import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: dumps `.explain("formatted")` for
  * named declared queries to `<outDir>/<name>_<suffix>.txt`, one file
  * per query, so before/after plan shapes are committed artifacts
  * (plans/r14/...) rather than claims.
  *
  * Usage: runMain graft.PlanSnap <sfDir> <outDir> <suffix> <name,[name...]|all>
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanSnap <sfDir> <outDir> <suffix> <names|all>")
    val Array(sfDir, outDir, suffix, namesArg) = args
    val names =
      if (namesArg == "all") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.builder(master = "local[4]", appName = "graft-plansnap")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
