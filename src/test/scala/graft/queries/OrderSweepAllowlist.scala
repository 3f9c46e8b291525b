package graft.queries

/** Adjudicated order-sensitive sites [[OrderSweepSpec]] cannot prove
  * tie-free mechanically: (query, substring of the site's order-axis
  * SQL — or the literal "unordered-limit", why ties are impossible or
  * harmless on ANY corpus the generator or the fuzz redraws can
  * produce). Every entry must stay exercised — an unused entry fails
  * the spec (anti-rot, same contract as PlanSweepAllowlist).
  */
object OrderSweepAllowlist {
  val entries: Seq[(String, String, String)] = Seq(
  )
}
