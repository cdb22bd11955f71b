package graft.core

/** Registry of cross-query memo EVICTORS — the compile-time-decoupled
  * contract between memo owners and [[graft.Bench.runScoped]]'s block
  * sweep (round-15 advice): the sweep unpersists every RDD in
  * `getPersistentRDDs`, which makes any memoized
  * localCheckpoint-truncated frame unrecoverable for its next consumer
  * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) unless the memo itself empties
  * in the same breath. Before this registry the sweep named
  * `Dedup.evictSharedClusters` directly — correct for the one memo
  * that existed, but a NEW memoized checkpointed frame anywhere in the
  * engine would silently break under bench scoping with nothing
  * coupling it to the sweep. Now the rule is structural: any memo of
  * materialized frames registers its evictor at creation (idempotent —
  * keyed by name, re-registration overwrites), and the sweep drains
  * ALL of them without knowing who they are.
  *
  * Plan-only memos (e.g. Tables' DataFrame-plan memo) need not
  * register: their frames re-materialize from lineage after any
  * sweep. Only truncated-lineage (checkpointed/cached) frames are at
  * risk.
  */
object MemoRegistry {

  private val evictors =
    new java.util.concurrent.ConcurrentHashMap[String, () => Unit]()

  /** Register (or replace) the evictor for a named memo. Call once at
    * memo-object initialization; the thunk must be safe to invoke any
    * number of times, including when the memo is already empty.
    */
  def register(name: String)(evict: () => Unit): Unit =
    evictors.put(name, evict)

  /** Drain every registered memo — called by Bench.runScoped's finally
    * immediately before its persistent-RDD sweep, so no memo can hold
    * a frame whose blocks the sweep is about to drop.
    */
  def evictAll(): Unit =
    evictors.values.forEach(e => e())

  /** Registered memo names (spec surface). */
  def names(): Set[String] = {
    val it = evictors.keys()
    var s = Set.empty[String]
    while (it.hasMoreElements) s += it.nextElement()
    s
  }
}
