package graft.queries

/** Adjudicated divisors [[DivisorSweepSpec]] cannot prove nonzero
  * mechanically: (query, substring of the resolved divisor's SQL,
  * why zero is impossible on ANY corpus the generator or the fuzz
  * redraws can produce). Every entry must stay exercised — an unused
  * entry fails the spec (anti-rot, same contract as
  * PlanSweepAllowlist).
  */
object DivisorSweepAllowlist {
  val entries: Seq[(String, String, String)] = Seq(
  )
}
