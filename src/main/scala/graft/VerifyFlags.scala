package graft

/** Mode switch between the production query shape and the verify shape
  * for queries whose raw output is not cross-engine hashable (today:
  * q35's sketch aggregates). The correctness dump ([[Verify]]) turns
  * exact companions ON so the oracle can hash-check the accuracy
  * contracts; the bench ([[Bench]]) leaves them OFF so it times the
  * production plan, not the verification harness. Tests that assert
  * sketch bounds call the `*Verified` variants directly and do not
  * depend on this flag.
  */
object VerifyFlags {
  @volatile var exactCompanions: Boolean = false
}
