package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** README's counter block is GENERATED (tools/update_readme.py) — this
  * spec makes hand-drift fail the build: the query counts printed there
  * must equal the live SparkEntry registry, and the bench HEADLINE
  * (seconds / steal) must equal the committed BENCH_LOCAL.json artifact.
  * (The counts check landed in round 7 and held; the seconds field is the
  * one that then drifted — the driver re-ran the bench after the last
  * README regen. Pinning the headline against the artifact closes the
  * class: any README/artifact mismatch fails the build, whichever side
  * moved.)
  */
class ReadmeCountersSpec extends AnyFunSuite {

  private def readme: String = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    "UTF-8")

  test("README counter block matches the SparkEntry registry") {
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

  test("README bench headline equals BENCH_LOCAL.json (seconds, steal, count)") {
    val path = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assume(java.nio.file.Files.exists(path), "no BENCH_LOCAL.json artifact yet")
    val json = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    def jNum(key: String): Option[String] =
      (s""""$key"\\s*:\\s*([0-9.]+|null)""").r.findFirstMatchIn(json).map(_.group(1))
    val value = jNum("value")
    assert(value.nonEmpty && value.get != "null", "BENCH_LOCAL.json lacks value")
    val steal = jNum("steal_pct").getOrElse("null")
    val nQueries = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(json)
      .map(_.group(1).count(_ == ':')).getOrElse(0)

    val pat = """bench headline: (\d+) queries in ([0-9.]+) s at \S+, local\[32\], steal (\S+) %""".r
    val m = pat.findFirstMatchIn(readme)
    assert(m.nonEmpty,
      "README.md lacks the generated bench-headline line — run tools/update_readme.py")
    assert(m.get.group(1).toInt == nQueries,
      s"README headline counts ${m.get.group(1)} queries but the artifact has " +
        s"$nQueries — run tools/update_readme.py")
    assert(math.abs(m.get.group(2).toDouble - value.get.toDouble) <= 0.06,
      s"README headline says ${m.get.group(2)} s but BENCH_LOCAL.json says " +
        s"${value.get} s — run tools/update_readme.py")
    (m.get.group(3), steal) match {
      case ("n/a", "null") => // both absent — fine
      case (r, a) if r != "n/a" && a != "null" =>
        assert(math.abs(r.toDouble - a.toDouble) < 0.005,
          s"README headline steal $r != artifact $a — run tools/update_readme.py")
      case (r, a) =>
        fail(s"README headline steal '$r' vs artifact '$a' — run tools/update_readme.py")
    }
  }
}
