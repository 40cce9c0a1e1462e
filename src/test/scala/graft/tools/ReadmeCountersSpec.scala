package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** README's counter block is GENERATED (tools/update_readme.py) — this
  * spec makes hand-drift fail the build: the query counts printed there
  * must equal the live SparkEntry registry. (Test/bench counters come from
  * artifacts of their own runs and are checked by the script's --check
  * mode; the query counts are the ones that silently drifted in rounds 5
  * and 6.)
  */
class ReadmeCountersSpec extends AnyFunSuite {

  test("README counter block matches the SparkEntry registry") {
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      "UTF-8")
    val pat = """(\d+) registered queries, (\d+) with DuckDB oracles""".r
    val m = pat.findFirstMatchIn(readme)
    assert(m.nonEmpty,
      "README.md lacks the generated counter line — run tools/update_readme.py")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} registered queries but SparkEntry has " +
        s"${SparkEntry.queries.size} — run tools/update_readme.py")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(2)} oracled queries but SparkEntry has " +
        s"${SparkEntry.oracleSql.size} — run tools/update_readme.py")
  }
}
