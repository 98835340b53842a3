package graft.images

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable-predicate routing with caption-sidecar drag-along — the
  * Spark-native form of the reference's ML tile filter
  * (`/root/reference/modules/skip_tiles.py:8-49`): keep a tile iff a
  * predicate passes (there: any MTCNN face ≥ 0.95 confidence), and move the
  * tile's `.txt` caption sidecar with it (`skip_tiles.py:41-47`).
  *
  * The predicate is a caller-supplied Column — an expression over decoded
  * content, an inference UDF initialized per-partition, anything — so the
  * orphaned MTCNN module becomes a pluggable interface instead of a wired
  * model (SURVEY.md §7.2 step 7; the ref module is not reachable from
  * either UI, `start_app.py:2`).
  *
  * Shape: one scan; verdicts computed on primary rows only; sidecars get
  * their verdict via a stem equi-join (the filesystem "join" of
  * `modules/tiling.py:64-75` made explicit). At scale both sides shuffle on
  * the stem — a plain equi-join AQE can re-plan; nothing is mutated
  * (replaces `shutil.move`).
  */
object SidecarRouting {

  private def stemOf(path: Column): Column =
    regexp_extract(path, "([^/]+)\\.[^.]+$", 1)

  private def isSidecar(path: Column): Column =
    lower(path).endsWith(".txt")

  /** Split `files` (any DataFrame with a `path` column) into
    * (kept, skipped) by evaluating `keep` on non-sidecar rows; each `.txt`
    * sidecar follows its stem's verdict. Sidecars with no primary (orphans)
    * are kept — the reference only moves a sidecar when its tile moves. */
  def routeWithSidecars(files: DataFrame, keep: Column): (DataFrame, DataFrame) = {
    val primaries = files.filter(!isSidecar(col("path")))
      .withColumn("__keep", coalesce(keep, lit(false)))
    // One verdict row per stem: if two primaries share a stem with
    // different extensions (foo.png, foo.jpg), a plain join would
    // duplicate the foo.txt sidecar into BOTH outputs; aggregate with
    // max(keep) — the sidecar follows if ANY primary stays (the reference
    // moves a sidecar when its tile moves).
    val verdicts = primaries
      .groupBy(stemOf(col("path")).as("__stem"))
      .agg(max(col("__keep")).as("__primary_keep"))
    val sidecars = files.filter(isSidecar(col("path")))
      .withColumn("__stem", stemOf(col("path")))
      .join(verdicts, Seq("__stem"), "left")
      .withColumn("__keep", coalesce(col("__primary_keep"), lit(true)))
      .drop("__stem", "__primary_keep")
    val all = primaries.unionByName(sidecars)
    (all.filter(col("__keep")).drop("__keep"),
      all.filter(!col("__keep")).drop("__keep"))
  }
}
