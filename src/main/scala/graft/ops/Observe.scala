package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-pass pipeline accounting via `Dataset.observe`.
  *
  * A 100 TB corpus run cannot afford `df.count()` checkpoints — every
  * one is a full re-execution of the stage under it. `observe` attaches
  * aggregate metrics to the EXISTING action: the executors fold the
  * metric expressions into the same task that computes the stage, the
  * driver merges per-task partials, and the numbers materialize when the
  * action finishes. Cost: a few accumulator adds per row, no extra scan,
  * no extra shuffle.
  *
  * The reference has no observability surface at all (its only signal
  * is the job-status sink, `/root/reference/R/DataFrameOperationR.R:
  * 439-459`, S12); this is the engine-native replacement a production
  * pipeline needs: per-stage row/null/accept accounting that rides the
  * run it describes.
  */
object Observe {

  /** Attach row-count + per-gate accounting to a stage. Returns the
    * instrumented frame (plans identically — `observe` is a no-op
    * barrier for optimization purposes) and the [[Observation]] whose
    * `.get` blocks until the NEXT action on the frame completes.
    *
    * `gates` are boolean columns (e.g. t14's rule verdicts); each
    * contributes a `<name>_pass` count so rejected-row attribution
    * comes out of the same pass that filtered. */
  def counted(df: DataFrame, name: String,
      gates: (String, Column)*): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("rows") +:
      gates.map { case (n, c) =>
        sum(when(c, 1L).otherwise(0L)).as(s"${n}_pass")
      }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
