package graft.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Replicates the FIXTURES.md B3 cases against
  * /root/reference/modules/caption_manager.py semantics. */
class CaptionStoreSpec extends AnyFunSuite {

  test("parse drops blank and whitespace-only lines, keeps order") {
    assert(CaptionStore.parse(Seq("cap A", "", "cap B", "  ", "cap C")) ==
      Seq("cap A", "cap B", "cap C"))
  }

  test("mruUpdate moves an existing caption to the front") {
    assert(CaptionStore.mruUpdate(Seq("cap A", "cap B", "cap C"), "cap B") ==
      Seq("cap B", "cap A", "cap C"))
  }

  test("mruUpdate inserts a new caption at the front") {
    assert(CaptionStore.mruUpdate(Seq("a", "b"), "new") == Seq("new", "a", "b"))
  }

  test("mruUpdate ignores blank captions") {
    assert(CaptionStore.mruUpdate(Seq("a"), "   ") == Seq("a"))
  }

  test("mruUpdate is idempotent for the front caption") {
    val once = CaptionStore.mruUpdate(Seq("a", "b"), "b")
    assert(CaptionStore.mruUpdate(once, "b") == once)
  }

  test("load/save/recordUse round-trip on disk") {
    val dir = Files.createTempDirectory("caps").toString
    val path = s"$dir/Unified_Caps.txt"
    assert(CaptionStore.load(path).isEmpty)
    CaptionStore.save(path, Seq("cap A", "cap B", "cap C"))
    assert(CaptionStore.load(path) == Seq("cap A", "cap B", "cap C"))
    assert(CaptionStore.recordUse(path, "cap B") == Seq("cap B", "cap A", "cap C"))
    assert(CaptionStore.load(path) == Seq("cap B", "cap A", "cap C"))
  }
}
