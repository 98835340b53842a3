package graft

import org.apache.spark.sql.SparkSession

/** C1 cooperative cancellation — the reference's global stop flag
  * (`/root/reference/modules/utils.py:4-9`, polled per item at
  * `modules/filter_crop.py:37,83` and `batch_processor.py:207-212`)
  * re-expressed on Spark's native job-group machinery.
  *
  * Every action launched inside [[runCancellable]] is tagged with the
  * group id (the TAG is thread-local; cancellation is by group NAME,
  * cluster-wide — give concurrent pipelines distinct ids via
  * [[uniqueGroup]]); [[cancel]] is the reference's `stop_process()`
  * — it aborts every running and pending job in the group cluster-wide.
  * With `interruptOnCancel = true` the cancel lands mid-task via thread
  * interrupt, which is STRONGER than the reference's poll-between-items
  * loop: a long single-item decode is interruptible too.
  *
  * At 100 TB this is the only viable shape — a driver-side "check a flag
  * between rows" loop doesn't exist in a distributed plan; the unit of
  * cooperative cancellation is the task, and Spark already checks the
  * interrupt/kill flag at shuffle/scan boundaries.
  */
object Jobs {

  /** Run `body` (typically one or more write actions) under a cancellable
    * job group. Returns body's result; if [[cancel]] fires first, the
    * action throws SparkException (job cancelled) out of `body`.
    *
    * NOTE: cancellation is by group NAME, cluster-wide — concurrent
    * pipelines that should be independently cancellable must use DISTINCT
    * group ids (see [[uniqueGroup]]). The enclosing thread's job group,
    * if any, is restored on exit rather than cleared. */
  def runCancellable[T](spark: SparkSession, group: String, desc: String = "")(body: => T): T = {
    val sc = spark.sparkContext
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobGroup(group, if (desc.isEmpty) group else desc, interruptOnCancel = true)
    try body
    finally {
      if (prevGroup == null) sc.clearJobGroup()
      else sc.setJobGroup(prevGroup, prevDesc, interruptOnCancel = true)
    }
  }

  /** A collision-free group id for one pipeline run. */
  def uniqueGroup(prefix: String): String =
    s"$prefix-${java.util.UUID.randomUUID()}"

  /** Signal the group to stop (reference `stop_process`). Safe to call
    * when nothing is running — a no-op, like setting the Event twice. */
  def cancel(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)
}
