package graft.util

/** Per-row work budget for extraction kernels (SURVEY B3; the reference
  * isolates runaway files with an 1800 s worker timeout, pipeline.py:396).
  *
  * Wall clocks are nondeterministic and executor-dependent, so the budget is
  * counted in deterministic work units (~characters scanned): kernels tick
  * the thread-installed budget at coarse checkpoints (one tick per pass or
  * per line, never per char), and exceeding it raises [[StepBudget.Exceeded]]
  * — which the extractor contains as a `timeout:` failure row at ROW
  * granularity, instead of letting one adversarial page pin a task. With no
  * budget installed, ticks are a null-check no-op, so kernels stay reusable
  * outside the extraction job.
  */
object StepBudget {

  /** Stackless (no stack trace, not suppressible) — raised on the hot path. */
  final class Exceeded
      extends RuntimeException("kernel step budget exceeded", null, false, false)

  private final class Budget(var remaining: Long)

  private val current = new ThreadLocal[Budget]

  /** Install a fresh budget for the duration of `f` (re-entrant: restores
    * the previous budget on exit, so a nested install doesn't leak).
    */
  def withBudget[T](steps: Long)(f: => T): T = {
    val prev = current.get()
    current.set(new Budget(steps))
    try f
    finally current.set(prev)
  }

  /** Consume `n` work units from the installed budget, if any. */
  def tick(n: Long): Unit = {
    val b = current.get()
    if (b != null) {
      b.remaining -= n
      if (b.remaining < 0) throw new Exceeded
    }
  }
}
