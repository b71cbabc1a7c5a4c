package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled joins: key salting.
  *
  * When one join key carries a disproportionate share of rows (a viral
  * document, a null-ish default id), the task holding that key becomes
  * the straggler. AQE's skew-join splitting handles sort-merge cases at
  * runtime; salting is the plan-level form that also works for
  * aggregations and pre-AQE engines:
  *
  *  - fact side: append a uniform salt `0..n-1` to the key,
  *  - dim side: explode each row into all `n` salted copies,
  *  - join on (key, salt) — the hot key now spreads over n tasks.
  *
  * The dim side grows n×, so salt only what broadcast can't already
  * absorb and AQE doesn't split. Result is row-identical to the plain
  * join (verified in ScaleDesignSpec).
  */
object Skew {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, salt: Int): DataFrame = {
    require(salt > 0)
    val salted = fact
      .withColumn("__salt", pmod(
        // any roughly-uniform per-row value works; the join result is
        // independent of which salt bucket a row lands in
        hash(factKey, monotonically_increasing_id()), lit(salt)))
    val fanned = dim
      .withColumn("__salt", explode(
        sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    salted.join(fanned,
      factKey === dimKey && salted("__salt") === fanned("__salt"))
      .drop("__salt")
  }
}
