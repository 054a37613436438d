package graft

/** Static sanity of the plan-audit gate's configuration: every
  * documented same-source-scan allowance must name a DECLARED query —
  * a rename or roster change would otherwise leave a dangling entry
  * that silently exempts nothing (and, worse, suggests the gate still
  * covers a query it no longer sees).
  */
class PlanAuditSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every DocumentedReuse allowance names a declared query") {
    val declared = SparkEntry.queries.keySet
    val dangling = PlanAudit.DocumentedReuse.keys.map(_._1).filterNot(declared)
    assert(dangling.isEmpty,
      s"allowances for undeclared queries (renamed? removed?): ${dangling.mkString(", ")}")
  }

  test("allowances stay at or above the gate threshold — below it they are dead entries") {
    val dead = PlanAudit.DocumentedReuse.collect {
      case ((q, src), (max, _)) if max < PlanAudit.GateMaxSameSourceScans => s"$q/$src($max)"
    }
    assert(dead.isEmpty,
      s"allowances below the gate threshold never fire: ${dead.mkString(", ")}")
  }
}
