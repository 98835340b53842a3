package org.apache.spark

/** Test-only access to `SparkContext.checkpointDir` (private[spark]): the
  * reliable-checkpoint byte-witness spec (DistSpec) must set a checkpoint
  * dir for its assertions and then RESTORE the previous state, or every
  * later suite in the shared-session JVM would silently switch from
  * zero-IO local checkpoints to FS writes. `setCheckpointDir` can only
  * set, never clear — hence this accessor.
  */
object CheckpointDirTestAccess {
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
  def set(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
