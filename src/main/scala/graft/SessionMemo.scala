package graft

/** Session-landed frame memo — THE retention contract for every
  * checkpointed front-end frame the engine lands once per (session, dir,
  * durability regime): shingle groups and verified pairs
  * (llm.Similarity), k-means state, cluster labels, co-purchase counts
  * (relational.Relational), trained BPE merges (text.CorpusStats).
  *
  * Contract:
  *  - entries are CACHES of deterministic builds — dropping one costs a
  *    rebuild on next use, never correctness;
  *  - retention is bounded: a memo that reaches [[SessionMemos.MaxEntries]]
  *    keys is cleared wholesale before admitting the next entry (the
  *    harness hosts hold 1–2 keys per memo; the bound exists for
  *    long-lived multi-session hosts, where unbounded (session, dir)
  *    key growth — and the SparkSession strongly referenced from each
  *    key — was a leak);
  *  - a long-lived host should additionally call
  *    [[SessionMemos.clearAll]] when it stops a session, releasing the
  *    landed blocks' references immediately instead of at the cap.
  */
final class SessionMemo[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
  SessionMemos.register(this)

  def getOrCompute(k: K)(build: K => V): V = {
    if (m.size >= SessionMemos.MaxEntries && !m.containsKey(k)) m.clear()
    m.computeIfAbsent(k, key => build(key))
  }

  /** Point-in-time key set (weakly consistent, like the underlying map's
    * iterator) — for registries that enumerate what they vouch for
    * (Dist's sizedBroadcast approvals). */
  private[graft] def snapshotKeys: Set[K] = {
    val b = Set.newBuilder[K]
    m.keySet().forEach(k => b += k)
    b.result()
  }

  private[graft] def clear(): Unit = m.clear()
}

object SessionMemos {
  /** Max keys per memo before a wholesale clear — far above any
    * single-host working set (one key per (session, dir, regime)). */
  val MaxEntries = 64

  private val all =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_, _]]()

  private[graft] def register(memo: SessionMemo[_, _]): Unit = all.add(memo)

  /** Release every session-landed frame reference (see class contract).
    * Safe at any time: memos rebuild on demand. */
  def clearAll(): Unit = all.forEach(_.clear())
}
