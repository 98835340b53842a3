package graft.llm

import java.nio.file.{Files, Path}
import java.util.Comparator
import graft.{Dist, SparkSpec}

/** Exercises graft.Dist.durableCkpt's RELIABLE branch — the cluster-scale
  * durability mode the label-propagation loop (q55/q67) switches to when a
  * checkpoint dir is configured. localCheckpoint blocks die with their
  * executor; the reliable path re-reads from the (cluster) FS, so the
  * iterative loop survives executor loss. Asserts (a) results are
  * bit-identical to the default local path, and (b) checkpoint files were
  * actually written (proving the branch was taken, not silently skipped).
  */
class DurableCheckpointSpec extends SparkSpec {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  test("cluster loop on the reliable-checkpoint path: same answers, files written") {
    // default (no checkpoint dir): localCheckpoint path
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "spec assumes the shared session has no checkpoint dir")
    val localQ55 = Similarity.nearDupClusters(spark, sfDir).collect().toSeq
    val localQ67 = Similarity.clusterRepresentatives(spark, sfDir).collect().toSeq
    assert(localQ55.nonEmpty && localQ67.nonEmpty)

    val dir = Files.createTempDirectory("graft-reliable-ckpt")
    try {
      spark.sparkContext.setCheckpointDir(dir.toString)
      val relQ55 = Similarity.nearDupClusters(spark, sfDir).collect().toSeq
      val relQ67 = Similarity.clusterRepresentatives(spark, sfDir).collect().toSeq
      assert(relQ55 == localQ55, "q55 must be identical on the reliable path")
      assert(relQ67 == localQ67, "q67 must be identical on the reliable path")
      // the reliable branch writes rdd-* checkpoint data under the dir
      val files = Files.walk(dir).filter(Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir — reliable branch not taken")
    } finally {
      org.apache.spark.GraftTestHooks.clearCheckpointDir(spark.sparkContext)
      deleteRecursively(dir)
    }
  }

  test("durableCkpt without a checkpoint dir stays on the local path") {
    import spark.implicits._
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val df = Dist.durableCkpt(Seq(1, 2, 3).toDF("x"))
    assert(df.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
  }
}
