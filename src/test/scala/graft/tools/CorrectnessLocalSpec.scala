package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** `CORRECTNESS_LOCAL.json` is the ENGINE-side correctness artifact
  * (tools/check.py's third argument, driver-file schema): round 14
  * shipped with an empty driver `CORRECTNESS_r14.json`, so the repo
  * carries its own signal. This spec pins that artifact to the LIVE
  * registry the way `ReadmeCountersSpec` pins the bench file: its query
  * set must be exactly `SparkEntry.oracleSql`'s, and every recorded row
  * must be green — a stale, partial, or red artifact fails the build
  * instead of shipping as a false signal.
  */
class CorrectnessLocalSpec extends AnyFunSuite {

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def load(text: String): Map[String, JObject] =
    JsonMethods.parse(text) match {
      case o: JObject =>
        o.obj.collect { case (name, rec: JObject) => name -> rec }.toMap
      case other => fail(s"CORRECTNESS_LOCAL.json is not a JSON object: $other")
    }

  /** Working-tree artifact, falling back to HEAD's — the same two
    * legitimate states as the README pins (pre-commit fresh regen vs a
    * later working-tree overwrite); hand drift matches neither.
    */
  private def artifact: Option[String] = {
    val p = java.nio.file.Paths.get("CORRECTNESS_LOCAL.json")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    else
      try {
        val g = new ProcessBuilder("git", "show", "HEAD:CORRECTNESS_LOCAL.json").start()
        val out = new String(g.getInputStream.readAllBytes(), "UTF-8")
        if (g.waitFor() == 0 && out.nonEmpty) Some(out) else None
      } catch { case _: Exception => None }
  }

  test("CORRECTNESS_LOCAL.json covers exactly the live oracle registry, all green") {
    val text = artifact.getOrElse(fail(
      "no CORRECTNESS_LOCAL.json — run graft.Verify at sf0.01 then " +
        "`python3 tools/check.py <out> /root/testdata/sf0.01 CORRECTNESS_LOCAL.json`"))
    val report = load(text)
    val live = SparkEntry.oracleSql.keySet
    val missing = live -- report.keySet
    val stale = report.keySet -- live
    assert(missing.isEmpty && stale.isEmpty,
      s"artifact/registry drift — missing: ${missing.toSeq.sorted.mkString(", ")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(", ")} — regenerate via check.py")
    val red = report.collect {
      case (name, rec)
          if !List("rows_match", "schema_match", "hash_match").forall(k =>
            rec.obj.contains(k -> JBool(true))) => name
    }
    assert(red.isEmpty,
      s"artifact records non-green queries: ${red.toSeq.sorted.mkString(", ")} — " +
        "a red CORRECTNESS_LOCAL.json must not ship; fix or regenerate")
  }
}
