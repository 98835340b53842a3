package graft

import org.scalatest.funsuite.AnyFunSuite

/** The landed-frame memo retention contract: compute-once per key,
  * bounded key growth (wholesale clear at the cap), and the explicit
  * clearAll hook for long-lived hosts. */
class SessionMemoSpec extends AnyFunSuite {

  test("computes once per key; rebuilds after clearAll") {
    val memo = new SessionMemo[String, Int]
    var builds = 0
    def get(k: String) = memo.getOrCompute(k) { _ => builds += 1; builds }
    assert(get("a") == 1 && get("a") == 1 && builds == 1)
    assert(get("b") == 2 && builds == 2)
    SessionMemos.clearAll()
    assert(get("a") == 3 && builds == 3, "clearAll must force a rebuild")
  }

  test("key growth is bounded: the cap clears, old keys rebuild, size stays <= cap") {
    val memo = new SessionMemo[Int, Int]
    var builds = 0
    def get(k: Int) = memo.getOrCompute(k) { _ => builds += 1; k }
    (0 until SessionMemos.MaxEntries).foreach(get)
    assert(builds == SessionMemos.MaxEntries)
    get(0) // still cached
    assert(builds == SessionMemos.MaxEntries)
    get(SessionMemos.MaxEntries) // admits the (cap+1)-th key via a clear
    assert(builds == SessionMemos.MaxEntries + 1)
    get(0) // was evicted by the wholesale clear -> rebuilds
    assert(builds == SessionMemos.MaxEntries + 2)
  }
}
