package graft.operators

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Overlap two INDEPENDENT driver-side job chains (the optimization
  * guide's §2.6 shape: Spark's scheduler happily runs several jobs at
  * once inside one application — actions are only sequential because
  * driver code calls them sequentially; a second in-flight chain
  * back-fills executor slots the first one's small stages leave idle).
  *
  * Used where two bounded training/maintenance chains consume the same
  * persisted input: Spark's block-level cache locks make a racing first
  * fill safe (one thread computes a block, the other waits on it), so
  * no pre-materialization is needed. Failures propagate: an exception
  * on either side rethrows to the caller.
  */
object Par {
  /** Run `a` on a helper thread while `b` runs on the caller's thread;
    * return both. */
  def par2[A, B](a: => A)(b: => B): (A, B) = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fa = Future(a)
    val vb = b
    (Await.result(fa, Duration.Inf), vb)
  }

  /** Run every thunk concurrently (first on the caller's thread, rest
    * on the pool) and wait for all — for N independent maintenance jobs
    * (e.g. per-table mask folds). */
  def all[A](thunks: Seq[() => A]): Seq[A] = {
    implicit val ec: ExecutionContext = ExecutionContext.global
    if (thunks.isEmpty) Nil
    else {
      val rest = thunks.tail.map(t => Future(t()))
      val head = thunks.head()
      head +: rest.map(Await.result(_, Duration.Inf))
    }
  }
}
