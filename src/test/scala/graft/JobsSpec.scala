package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** C1 cooperative cancellation: a running action under runCancellable must
  * abort promptly when cancel() fires from another thread (the reference's
  * stop_process → per-item poll loop, utils.py:4-9 / filter_crop.py:37). */
class JobsSpec extends SparkSpec {

  implicit private val ec: ExecutionContext = ExecutionContext.global

  test("cancel aborts a running grouped action; session stays usable") {
    import spark.implicits._
    // ~100s of work if never cancelled (500 × 200ms / 4 local threads)
    val slow = udf { (i: Long) => Thread.sleep(200); i }
    val fut = Future {
      Jobs.runCancellable(spark, "graft-cancel-spec", "tiling job") {
        spark.range(0, 500, 1, 4)
          .select(slow(col("id")).as("v"))
          .agg(sum("v")).collect()
      }
    }
    // wait (driver-side — closures are serialized copies, so no shared
    // latch) until the grouped job is actually registered and running
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (tracker.getJobIdsForGroup("graft-cancel-spec").isEmpty
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(tracker.getJobIdsForGroup("graft-cancel-spec").nonEmpty, "job never started")
    Thread.sleep(500) // let tasks enter their sleep
    val t0 = System.nanoTime()
    Jobs.cancel(spark, "graft-cancel-spec")
    val err = intercept[Exception] { Await.result(fut, Duration("60s")) }
    val cancelledIn = (System.nanoTime() - t0) / 1e9
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(err).exists {
      case s: SparkException => true
      case e => e.getMessage != null && e.getMessage.toLowerCase.contains("cancel")
    }, s"unexpected failure: $err")
    assert(cancelledIn < 30.0, s"cancellation took ${cancelledIn}s")
    // the session survives a cancelled group (reference: UI stays up)
    assert(spark.range(10).count() == 10)
  }

  test("cancel of an idle group is a no-op") {
    Jobs.cancel(spark, "graft-never-ran")
    assert(spark.range(5).count() == 5)
  }
}
