package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed full-depth bench snapshot must cover the CURRENT
  * query surface (VERDICT r12 #6: the r12 snapshot was taken one
  * commit before `src_csv_roundtrip` landed and silently read 271/272
  * — a snapshot that lags the surface can hide a regressed or
  * never-benched query). This pins the newest committed snapshot's
  * "queries" key set to `SparkEntry.queries` exactly; adding a query
  * without re-running the full-depth bench fails here.
  */
class SnapshotFreshSpec extends AnyFunSuite {
  test("newest committed bench snapshot covers the exact current query surface") {
    val docs = new java.io.File("docs")
    val snaps = Option(docs.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.matches("bench_full_r\\d+_snapshot\\.json"))
      .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
    assert(snaps.nonEmpty, "no committed bench_full_r*_snapshot.json under docs/")
    val newest = snaps.last
    val txt = new String(java.nio.file.Files.readAllBytes(newest.toPath), "UTF-8")
    // the artifact is single-line JSON written by Bench.emit; the
    // "queries" object is flat {"name":sec,...} — extract its keys
    // without a JSON dependency
    val obj = txt.split("\"queries\":\\{", 2).last.split("\\}", 2).head
    val got = "\"([a-z0-9_]+)\":".r.findAllMatchIn(obj).map(_.group(1)).toSet
    val want = SparkEntry.queries.keySet
    val missing = want -- got
    val stale = got -- want
    assert(missing.isEmpty && stale.isEmpty,
      s"${newest.getName} lags the surface — missing=$missing stale=$stale; " +
        "re-run the full-depth bench (SPARK_GRAFT_TIME_BUDGET_S=3600) and commit the snapshot")
  }
}
