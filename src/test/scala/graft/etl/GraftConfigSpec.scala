package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  test("defaults match the reference's variables.yaml thresholds") {
    val c = GraftConfig()
    assert(c.maxNullPct === 10.0)
    assert(c.minRecords === 1000L)
    assert(!c.strictLookup)
  }

  test("properties file overrides") {
    val f = java.nio.file.Files.createTempFile("graft", ".properties")
    java.nio.file.Files.writeString(f,
      """graft.warehouse.dir=/data/wh
        |graft.quality.maxNullPct=5.5
        |graft.quality.minRecords=42
        |graft.etl.strictLookup=true
        |""".stripMargin)
    val c = GraftConfig.load(f.toString)
    assert(c === GraftConfig("/data/wh", 5.5, 42L, strictLookup = true))
  }

  test("partial files keep defaults for missing keys") {
    val f = java.nio.file.Files.createTempFile("graft", ".properties")
    java.nio.file.Files.writeString(f, "graft.quality.minRecords=7\n")
    val c = GraftConfig.load(f.toString)
    assert(c.minRecords === 7L)
    assert(c.maxNullPct === 10.0)
  }
}
