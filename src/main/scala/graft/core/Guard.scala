package graft.core

/** Thrown by the accident guards on exactness baselines (the Θ(n²)-capable
  * paths: exact all-pairs cosine, 16-bit SimHash, uncapped n-gram Jaccard /
  * containment, exact BM25 probe) when the input exceeds the candidate-pair
  * budget. A DISTINCT type, not a bare require: a scale sweep must be able
  * to machine-distinguish "refused oversized input by design — the guard
  * worked" from a real failure, so Bench/Verify map this (anywhere in the
  * cause chain) to a structured `refused` status instead of an error row. */
final class GuardRefusedException(msg: String)
    extends IllegalArgumentException(msg)

object Guard {

  /** `require`-shaped admission check that refuses with the typed
    * exception. Use for SCALE guards only — structural parameter
    * validation stays a plain require (those are caller bugs, not
    * by-design refusals). */
  def admit(ok: Boolean, msg: => String): Unit =
    if (!ok) throw new GuardRefusedException(msg)

  /** The guard refusal in `e`'s cause chain, if any — harness-side
    * classifier (Spark can wrap driver-side exceptions). */
  def refusal(e: Throwable): Option[String] = {
    var t = e
    var hops = 0
    while (t != null && hops < 16) {
      t match {
        case g: GuardRefusedException =>
          return Some(Option(g.getMessage).getOrElse("guard refused"))
        case _ =>
      }
      t = if (t.getCause eq t) null else t.getCause
      hops += 1
    }
    None
  }
}
