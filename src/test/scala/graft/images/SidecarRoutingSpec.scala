package graft.images

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SidecarRoutingSpec extends SparkSpec {

  private def files() = {
    import spark.implicits._
    Seq(
      "/d/a_tile_0_0.png", "/d/a_tile_0_0.txt",  // kept pair (size 100)
      "/d/b_tile_1_0.png", "/d/b_tile_1_0.txt",  // skipped pair (size 10)
      "/d/c_tile_2_0.png",                        // kept, no sidecar
      "/d/orphan.txt"                             // sidecar with no primary
    ).map(p => (p, if (p.contains("/b_")) 10L else 100L)).toDF("path", "size")
  }

  test("predicate routes primaries; sidecars follow their stem") {
    val (kept, skipped) = SidecarRouting.routeWithSidecars(files(), col("size") >= 50)
    val k = kept.select("path").collect().map(_.getString(0)).sorted.toSeq
    val s = skipped.select("path").collect().map(_.getString(0)).sorted.toSeq
    assert(s == Seq("/d/b_tile_1_0.png", "/d/b_tile_1_0.txt"))
    assert(k.contains("/d/a_tile_0_0.png") && k.contains("/d/a_tile_0_0.txt"))
    assert(k.contains("/d/c_tile_2_0.png"))
  }

  test("orphan sidecars are kept, null predicate counts as skip") {
    val (kept, skipped) = SidecarRouting.routeWithSidecars(
      files(), when(col("size") >= 50, lit(true)))  // 10-byte rows → null
    assert(kept.select("path").collect().map(_.getString(0)).contains("/d/orphan.txt"))
    val s = skipped.select("path").collect().map(_.getString(0)).sorted.toSeq
    assert(s == Seq("/d/b_tile_1_0.png", "/d/b_tile_1_0.txt"))
  }

  test("kept + skipped partition the input") {
    val (kept, skipped) = SidecarRouting.routeWithSidecars(files(), col("size") >= 50)
    assert(kept.count() + skipped.count() == files().count())
  }

  test("two primaries sharing a stem yield ONE sidecar verdict (any-keep wins)") {
    import spark.implicits._
    val mixed = Seq(
      ("/d/foo.png", 100L), // kept
      ("/d/foo.jpg", 10L),  // skipped — same stem, conflicting verdict
      ("/d/foo.txt", 1L)
    ).toDF("path", "size")
    val (kept, skipped) = SidecarRouting.routeWithSidecars(mixed, col("size") >= 50)
    val keptPaths = kept.select("path").collect().map(_.getString(0)).toSeq
    val skippedPaths = skipped.select("path").collect().map(_.getString(0)).toSeq
    // the sidecar appears exactly once, in kept (it follows if ANY primary stays)
    assert(keptPaths.count(_ == "/d/foo.txt") == 1)
    assert(!skippedPaths.contains("/d/foo.txt"))
    assert(kept.count() + skipped.count() == 3)
  }
}
