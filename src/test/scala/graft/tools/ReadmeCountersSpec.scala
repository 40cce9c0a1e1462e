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

  /** The test-count line drifted in round 12 (README said 323/46, the
    * suite was 329/47) because this spec gated query counts only. Gate it
    * against a SOURCE-derived count — every suite in this repo registers
    * cases statically via `test(`/`property(` (verified: the static count
    * equals the last test-report XML total exactly), so counting source
    * registrations is stable within a run and independent of report-file
    * write order during the very `sbt test` that executes this spec.
    */
  test("README test-count line matches the src/test registrations") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/test")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val reg = raw"^\s*(test|property)\(".r
    val suite = raw"extends (AnyFunSuite|AnyFlatSpec|Properties)".r
    var nTests = 0; var nSuites = 0
    files.foreach { f =>
      val src = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      nTests += src.linesIterator.count(l => reg.findFirstIn(l).nonEmpty)
      if (suite.findFirstIn(src).nonEmpty) nSuites += 1
    }
    val pat = raw"(\d+) ScalaTest cases across (\d+) suites".r
    val m = pat.findFirstMatchIn(readme)
    assert(m.nonEmpty,
      "README.md lacks the generated test-count line — run tools/update_readme.py")
    assert(m.get.group(1).toInt == nTests && m.get.group(2).toInt == nSuites,
      s"README says ${m.get.group(1)} cases / ${m.get.group(2)} suites but " +
        s"src/test registers $nTests across $nSuites — re-run `sbt test` " +
        "then tools/update_readme.py")
  }

  /** The headline must match the working-tree artifact OR the committed
    * one (`git show HEAD:BENCH_LOCAL.json`). Two legitimate states exist:
    * pre-commit after a fresh regen (README tracks the working tree, HEAD
    * is stale) and post-commit after the DRIVER re-benches (the working
    * tree drifts, README tracks HEAD — the round-8 red). Hand-edit drift
    * matches neither side and still fails. */
  test("README bench headline equals BENCH_LOCAL.json (working tree or HEAD)") {
    val path = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assume(java.nio.file.Files.exists(path), "no BENCH_LOCAL.json artifact yet")
    val workingTree = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val committed: Option[String] =
      try {
        val p = new ProcessBuilder("git", "show", "HEAD:BENCH_LOCAL.json").start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
      } catch { case _: Exception => None }

    val pat = """bench headline: (\d+) queries in ([0-9.]+) s at \S+, local\[32\], steal (\S+) %""".r
    val m = pat.findFirstMatchIn(readme)
    assert(m.nonEmpty,
      "README.md lacks the generated bench-headline line — run tools/update_readme.py")

    def mismatch(json: String): Option[String] = {
      def jNum(key: String): Option[String] =
        (s""""$key"\\s*:\\s*([0-9.]+|null)""").r.findFirstMatchIn(json).map(_.group(1))
      val value = jNum("value")
      if (value.isEmpty || value.get == "null") return Some("artifact lacks value")
      val steal = jNum("steal_pct").getOrElse("null")
      val nQueries = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(json)
        .map(_.group(1).count(_ == ':')).getOrElse(0)
      if (m.get.group(1).toInt != nQueries)
        return Some(s"README counts ${m.get.group(1)} queries, artifact has $nQueries")
      if (math.abs(m.get.group(2).toDouble - value.get.toDouble) > 0.06)
        return Some(s"README says ${m.get.group(2)} s, artifact says ${value.get} s")
      (m.get.group(3), steal) match {
        case ("n/a", "null") => None
        case (r, a) if r != "n/a" && a != "null" =>
          if (math.abs(r.toDouble - a.toDouble) < 0.005) None
          else Some(s"README steal $r != artifact $a")
        case (r, a) => Some(s"README steal '$r' vs artifact '$a'")
      }
    }

    val wtErr = mismatch(workingTree)
    if (wtErr.nonEmpty) {
      val headErr = committed.map(mismatch)
      assert(headErr.contains(None),
        s"README headline matches neither the working-tree artifact " +
          s"(${wtErr.get}) nor HEAD's " +
          s"(${headErr.flatten.getOrElse("no committed artifact readable")}) — " +
          "run tools/update_readme.py and commit README with the artifact")
    }
  }

  /** The DuckDB-comparison ratios are generated from BENCHCMP.json (the
    * round-8 verdict's "make the 0.62×/0.55×/3.0× claims a committed
    * artifact" item); pin them with the same working-tree-or-HEAD rule as
    * the headline.
    */
  test("README benchcmp ratios equal BENCHCMP.json (working tree or HEAD)") {
    val path = java.nio.file.Paths.get("BENCHCMP.json")
    assume(java.nio.file.Files.exists(path), "no BENCHCMP.json artifact yet")
    val workingTree = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val committed: Option[String] =
      try {
        val p = new ProcessBuilder("git", "show", "HEAD:BENCHCMP.json").start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
      } catch { case _: Exception => None }

    val pat =
      ("""([0-9.]+)× total\*\* over (\d+) oracled\s+queries; ([0-9.]+)× excluding the\s+\d+ certificate queries; ([0-9.]+)× excluding certificates""").r
    val m = pat.findFirstMatchIn(readme)
    assert(m.nonEmpty,
      "README.md lacks the generated benchcmp line — run tools/update_readme.py")

    def mismatch(json: String): Option[String] = {
      // "ratio" appears in every per-query row too — scope the totals
      // lookups to the "totals" object
      val totals = """"totals"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse("")
      def jNum(key: String, in: String): Option[Double] =
        (s""""$key"\\s*:\\s*([0-9.]+)""").r.findFirstMatchIn(in)
          .map(_.group(1).toDouble)
      val checks = Seq(
        ("ratio", totals, m.get.group(1).toDouble),
        ("n_compared", json, m.get.group(2).toDouble),
        ("ratio_ex_certificates", totals, m.get.group(3).toDouble),
        ("ratio_ex_cert_and_cc", totals, m.get.group(4).toDouble))
      checks.collectFirst {
        case (key, in, readmeVal) if jNum(key, in).isEmpty =>
          s"artifact lacks $key"
        case (key, in, readmeVal) if math.abs(jNum(key, in).get - readmeVal) > 0.006 =>
          s"README $key $readmeVal != artifact ${jNum(key, in).get}"
      }
    }

    val wtErr = mismatch(workingTree)
    if (wtErr.nonEmpty) {
      val headErr = committed.map(mismatch)
      assert(headErr.contains(None),
        s"README benchcmp ratios match neither the working-tree artifact " +
          s"(${wtErr.get}) nor HEAD's " +
          s"(${headErr.flatten.getOrElse("no committed artifact readable")}) — " +
          "run tools/benchcmp.py then tools/update_readme.py")
    }
  }
}
