package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pure pieces of the baseline-jar adjudicator: record parsing, the
  * unknown-name retry parse, the drift/code rule, and the Spark-jars
  * resolution. The child-JVM path itself is exercised operationally
  * (Bench recheck + graft.tools.Adjudicate, artifacts under
  * artifacts/r14/) — a spec spawning JVMs would be a flake factory.
  */
class BaselineJarSpec extends AnyFunSuite {

  test("ownCodeLocation resolves to an existing classes dir or jar") {
    val loc = BaselineJar.ownCodeLocation
    assert(loc.nonEmpty, "code source must resolve under sbt and from a jar")
    assert(new java.io.File(loc.get).exists, s"missing: ${loc.get}")
  }

  test("parseMinima extracts spread minima from a Bench full record") {
    val rec = """{"metric":"total","value":9.9,"queries":{"a":2.0,"b":3.0},
      "spread":{"a":{"min":1.5,"med":2.0,"max":2.5},"b":{"min":3,"med":3.5,"max":4}},
      "runs":3,"recheck":{},"sf":"x"}"""
    val m = BaselineJar.parseMinima(rec)
    assert(m === Map("a" -> 1.5, "b" -> 3.0))
  }

  test("parseMinima drops failed (-1) entries and survives garbage") {
    val rec = """{"spread":{"a":{"min":-1.0,"med":-1.0,"max":-1.0},"b":{"min":0.25}}}"""
    assert(BaselineJar.parseMinima(rec) === Map("b" -> 0.25))
    assert(BaselineJar.parseMinima("not json") === Map.empty)
    assert(BaselineJar.parseMinima("") === Map.empty)
  }

  test("parseUnknownNames recovers the old registry's rejection list") {
    val log =
      """Exception in thread "main" java.lang.IllegalArgumentException:
        |requirement failed: SPARK_GRAFT_ONLY names not in SparkEntry.queries: q901_new, q902_newer
        |	at scala.Predef$.require(Predef.scala:337)""".stripMargin
    assert(BaselineJar.parseUnknownNames(log) === Set("q901_new", "q902_newer"))
    assert(BaselineJar.parseUnknownNames("clean run, no errors") === Set.empty)
  }

  test("the drift/code rule: head within 10% + 0.05s of the old binary is drift") {
    assert(BaselineJar.adjudicate(2.0, 2.0) === "drift")
    assert(BaselineJar.adjudicate(2.24, 2.0) === "drift")   // 2.0*1.1+0.05 = 2.25
    assert(BaselineJar.adjudicate(2.26, 2.0) === "code")
    // sub-second: the absolute epsilon keeps millisecond noise out
    assert(BaselineJar.adjudicate(0.14, 0.1) === "drift")
    assert(BaselineJar.adjudicate(0.2, 0.1) === "code")
    // no usable measurement on either side never yields a verdict
    assert(BaselineJar.adjudicate(-1.0, 2.0) === "unadjudicated")
    assert(BaselineJar.adjudicate(2.0, -1.0) === "unadjudicated")
    assert(BaselineJar.adjudicate(2.0, 0.0) === "unadjudicated")
  }

  test("sparkJarsDir resolves to a full Spark distribution, not a staging dir") {
    val dir = java.nio.file.Paths.get(BaselineJar.sparkJarsDir)
    assert(java.nio.file.Files.isDirectory(dir))
    // the child JVM needs the WHOLE runtime from this one wildcard entry:
    // spark-sql alone is not enough (sbt's bg-jobs staging dirs hold one
    // jar each — the bug this heuristic exists to dodge)
    val names = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names.exists(_.startsWith("spark-sql")), s"$dir lacks spark-sql")
    assert(names.exists(_.startsWith("scala-library")), s"$dir lacks scala-library")
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
