package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(LIVE session, key) memo for one-time index builds the harness
  * queries amortize across bench reps (q100's corpus index, q332's
  * prefix index). r14 review replaced the previous
  * `ConcurrentHashMap[s"${System.identityHashCode(s)}|$sf", T]`
  * pattern, which had two real flaws: entries of STOPPED sessions
  * were never evicted (the map is static, so checkpointed frames of
  * dead SparkContexts leaked for the JVM's lifetime — the opposite of
  * the "freed with the session" claim), and identityHashCode can
  * collide across a dead and a live session, handing the new session
  * frames bound to a stopped context. A WeakHashMap keyed by the
  * SparkSession INSTANCE fixes both: identity semantics can't
  * collide, and when the session becomes unreachable its entry — and
  * the memoized frames with it — are collectable.
  *
  * The outer map is lock-synchronized (WeakHashMap is not
  * thread-safe); per-session compute goes through a ConcurrentHashMap
  * so concurrent first-builders of the same key serialize exactly as
  * before. */
final class SessionMemo[T] {
  private val bySession = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, T]]()

  def getOrCompute(s: SparkSession, key: String)(build: => T): T = {
    val perSession = bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, T]()
        bySession.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
