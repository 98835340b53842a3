package graft.io

import graft.SparkSpec

/** q234's composition invariants beyond the oracle gate: the rollback and
  * re-publish must certify bit-identity THROUGH the mechanism (anti-joins
  * + pre/post-state unions), and the fixture delta must be non-trivial —
  * an empty delta would make the gate pass vacuously. */
class VersioningSpec extends SparkSpec {

  test("q234: rollback restores v0 and re-publish restores v1, per source") {
    val rows = Versioning.snapshotRollback(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("fp_back") == r.getAs[Long]("fp_v0"),
        s"${r.getAs[String]("source")}: rollback lost bit-identity")
      assert(r.getAs[Long]("n_back") == r.getAs[Long]("n_v0"))
      assert(r.getAs[Long]("fp_fwd") == r.getAs[Long]("fp_v1"),
        s"${r.getAs[String]("source")}: re-publish lost bit-identity")
      assert(r.getAs[Long]("n_fwd") == r.getAs[Long]("n_v1"))
    }
    // the delta actually edits something (v1 differs from v0 somewhere) —
    // otherwise the round trip proves nothing
    assert(rows.exists(r => r.getAs[Long]("fp_v1") != r.getAs[Long]("fp_v0")),
      "fixture delta left every source untouched — vacuous gate")
  }
}
