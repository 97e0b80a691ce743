package graft

/** SURVEY.md §2 and the registered query set must stay synchronized in
  * BOTH directions (the r1 credibility failure and r3 VERDICT item 9):
  * every registered query key appears in SURVEY, and every `qNNN_...`
  * key SURVEY names is actually registered.
  */
class SurveySyncSpec extends SparkSpec {
  private lazy val survey =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")

  test("every registered query is documented in SURVEY.md") {
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty, s"SURVEY.md lacks: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every query key SURVEY.md names is registered") {
    val mentioned = "`(q\\d{2,3}_[a-z0-9_]+)`".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    val ghosts = mentioned -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"SURVEY.md names unregistered keys: ${ghosts.toSeq.sorted.mkString(", ")}")
  }

  test("every query has a full oracle") {
    // r5: the last rows-only sketches (q87/q138/q142) gained planted-twin
    // oracles, so every registered query now carries a full DuckDB check
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"queries without an oracle: ${rowsOnly.toSeq.sorted.mkString(", ")}")
  }
}
