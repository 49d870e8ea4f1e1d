package graft

import org.scalatest.funsuite.AnyFunSuite

/** docs/API.md must be regenerated whenever the surface moves — an
  * index that lags the surface is worse than none (VERDICT r12 #8:
  * "CI-fresh"). Fix a failure with: sbt "runMain graft.ApiDoc".
  */
class ApiDocSpec extends AnyFunSuite {
  test("committed docs/API.md matches a regeneration from SparkEntry + SURVEY") {
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("docs/API.md")), "UTF-8")
    val fresh = ApiDoc.render()
    assert(committed == fresh,
      "docs/API.md is stale — regenerate with: sbt \"runMain graft.ApiDoc\"")
  }

  test("every SparkEntry query key appears in the index with a resolved entry point") {
    val doc = ApiDoc.render()
    val missing = SparkEntry.queries.keySet.filterNot(k => doc.contains(s"| `$k` |"))
    assert(missing.isEmpty, s"queries missing from API.md: $missing")
  }
}
