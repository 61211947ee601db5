package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical completeness gate: SURVEY.md §8 is the single source of truth
  * for the operator inventory, so every query registered in
  * [[SparkEntry.allQueries]] must be named somewhere in the §8 coverage map
  * (and, symmetrically, §8 must not cite registry names that no longer
  * exist). Keeps the doc from drifting behind late-round additions —
  * VERDICT r6 item 7.
  */
class SurveyCoverageSpec extends AnyFunSuite {

  private def section8: String = {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8")
    val start = survey.indexOf("## 8.")
    assert(start >= 0, "SURVEY.md must contain a '## 8.' coverage section")
    survey.substring(start)
  }

  test("every registered query name appears in SURVEY.md §8") {
    // exact-token match, not substring: `sec.contains("q_kmv")` would be
    // satisfied by an unrelated `q_kmv_err` citation and let the doc
    // silently drop the real row
    val tokens = "[a-z0-9_]+".r.findAllIn(section8).toSet
    val missing = SparkEntry.allQueries.map(_.name)
      .filterNot(tokens)
    assert(missing.isEmpty,
      s"queries registered in SparkEntry but absent from SURVEY §8: " +
        missing.mkString(", "))
  }

  test("every q_* name cited in SURVEY.md §8 exists in the registry") {
    val registered = SparkEntry.allQueries.map(_.name).toSet ++
      // non-registry bench entries legitimately cited in §8
      Set("stream_indicators", "stream_indicators_bulk", "stream_docs",
        "stream_sessions", "stream_skyline", "stream_cross_dedup",
        "pipeline_curate", "pipeline_compact")
    val cited = "`(q_[a-z0-9_]+)`".r
      .findAllMatchIn(section8).map(_.group(1)).toSet
    val stale = cited.diff(registered)
    assert(stale.isEmpty,
      s"SURVEY §8 cites query names not in the registry: " +
        stale.mkString(", "))
  }
}
