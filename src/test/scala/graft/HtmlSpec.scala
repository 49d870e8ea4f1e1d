package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Html

/** Pin the [[Html.extractText]] contract on handcrafted pages — the
  * hash gate proves engine parity on the planted corpus; these prove
  * the pipeline does the RIGHT thing on the failure classes.
  */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .collect()(0).getString(0)
  }

  test("script/style CONTENT is removed, not just the tags") {
    val got = extract("<p>keep</p><script>var drop=1;</script><style>p{x:1}</style><p>also</p>")
    assert(got == "keep also")
  }

  test("chrome containers vanish including their links; content links keep their text") {
    val got = extract(
      "<nav><a href=\"/x\">dropme</a></nav><div>real <a href=\"/y\">anchor text</a> words</div><footer>legal</footer>")
    assert(got == "real anchor text words")
  }

  test("entity decode order: &amp; last, so double-encoded entities decode one level only") {
    assert(extract("<p>&amp;lt;tag&amp;gt; &amp; &lt;b&gt; &quot;q&quot; &#39;a&#39;&nbsp;end</p>")
      == "&lt;tag&gt; & <b> \"q\" 'a' end")
  }

  test("multiline payloads and mixed-case tags are handled (dotall + case-insensitive)") {
    val got = extract("<SCRIPT>\nline1\nline2\n</SCRIPT><P>body</P>\n<NAV>\nx\n</NAV>")
    assert(got == "body")
  }

  test("escape/extract round-trips document text containing markup characters") {
    import spark.implicits._
    val text = "a < b && c > d <script>not code</script>"
    val got = Seq(text).toDF("t")
      .select(Html.extractText(concat(lit("<p>"), Html.escapeHtml(col("t")), lit("</p>"))).as("x"))
      .collect()(0).getString(0)
    assert(got == "a < b && c > d <script>not code</script>")
  }

  test("link density counts anchors per KB of raw html") {
    import spark.implicits._
    val html = "<a href=1>x</a><a href=2>y</a>" + ("z" * 994) // 1024 chars total
    val got = Seq(html).toDF("h").select(Html.linkDensity(col("h"))).collect()(0).getDouble(0)
    assert(got == 2.0, s"got $got")
  }
}
