package graft.operators

import graft.SparkTestBase

class HtmlStripSpec extends SparkTestBase {
  import spark.implicits._

  test("scripts, styles, comments, tags, entities, whitespace — one pass each") {
    val html = """<html><HEAD><script type="a">if (x<y) { alert("<b>hi</b>"); }</script>
      |<style>p { color: red; }</style></head><body>
      |<!-- secret
      |multiline --><h1 class="t">Title</h1>
      |<p>A &amp; B &lt;tag&gt; &amp;lt;literal&amp;gt; &quot;q&quot; &#39;s&#39; &nbsp;end</p>
      |</body></html>""".stripMargin
    val out = TextAnalysis.stripHtml(Seq((1L, html)).toDF("id", "h"), "h", "id").head
    assert(out.getString(1) ===
      "Title A & B <tag> &lt;literal&gt; \"q\" 's' end",
      "script/style CONTENT drops whole; double-encoded entities decode ONE level")
    assert(out.getLong(2) === html.length.toLong)
    assert(out.getLong(3) === out.getString(1).length.toLong)
  }

  test("case-insensitive block tags; plain text passes through; null drops") {
    val df = Seq(
      (1L, "<SCRIPT>x</SCRIPT><STYLE>y</STYLE>keep"),
      (2L, "no markup at all"),
      (3L, null.asInstanceOf[String])).toDF("id", "h")
    val out = TextAnalysis.stripHtml(df, "h", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "keep", 2L -> "no markup at all"))
  }

  test("unclosed script swallows to end; stray > and < without tags survive") {
    val out = TextAnalysis.stripHtml(
        Seq((1L, "before<script>never closed"), (2L, "a > b and a < b")).toDF("id", "h"),
        "h", "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the lazy .*? finds no closing tag: the <script...> TAG still strips
    // via the generic tag pass, its trailing content remains — the
    // lenient-not-lossy tradeoff
    assert(out(1L) === "before never closed")
    assert(out(2L) === "a > b and a < b", "comparison operators are not markup")
  }
}
