package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench JSON-key contract: the driver parses the bench line from a
  * 2,000-char output tail, so the per-query key map must (a) stay in
  * short-prefix form and (b) never silently revert to full names when
  * two query names share an id prefix — the historical failure mode
  * that overflowed the tail every round before r5. */
class BenchKeysSpec extends AnyFunSuite {

  test("collision-free names keep their bare prefixes") {
    assert(Bench.shortKeys(Seq("q01_agg", "d03_minhash", "st01_tumbling"))
      == Seq("q01", "d03", "st01"))
  }

  test("a synthetic prefix collision gets deterministic ~N suffixes, " +
    "not a full-name fallback") {
    val keys = Bench.shortKeys(
      Seq("d03_minhash", "d03_minhash_v2", "d03_minhash_v3", "q01_agg"))
    assert(keys == Seq("d03", "d03~2", "d03~3", "q01"))
    // all keys unique and all strictly shorter than the worst full name
    assert(keys.distinct.size == keys.size)
    assert(keys.forall(_.length <= "d03_minhash_v3".length))
  }

  test("the real inventory produces unique short keys") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val keys = Bench.shortKeys(names)
    assert(keys.distinct.size == names.size)
    // today's inventory is collision-free, so no key carries a suffix;
    // if this ever fails, the ~N path is exercised — also fine, the
    // assertion above is the contract
    assert(keys.forall(!_.contains('~')) || keys.distinct.size == names.size)
  }
}
