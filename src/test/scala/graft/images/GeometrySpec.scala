package graft.images

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Tile-grid math vs hand-computed cases replicating the reference
  * (`/root/reference/modules/tiling.py:28-49`, `filter_crop.py:6-13`). */
class GeometrySpec extends SparkSpec {

  private def boxesFor(w: Int, h: Int, tile: Int, overlap: Double,
                       padding: Int, autoAdjust: Boolean): Seq[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Seq((w, h)).toDF("w", "h")
      .select(explode(Geometry.gridBoxes(col("w"), col("h"), tile, overlap, padding, autoAdjust)).as("b"))
      .select(Seq("i", "j", "left", "upper", "right", "lower")
        .map(f => col("b." + f).cast("long")): _*)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
  }

  test("step truncates like Python int()") {
    assert(Geometry.step(64, 0.5) == 32)
    assert(Geometry.step(64, 0.25) == 48)
    assert(Geometry.step(64, 0.9) == 7)   // 64 - int(57.6) = 64 - 57
    assert(Geometry.step(100, 0.33) == 67) // 100 - int(33.0) = 67
  }

  test("64x64 tile=64 overlap=0: single exact tile") {
    assert(boxesFor(64, 64, 64, 0.0, 0, autoAdjust = false) ==
      Seq((0L, 0L, 0L, 0L, 64L, 64L)))
  }

  test("160x96 tile=64 overlap=0.5: perfect 5x3 grid (ragged-free by Auto Adjust)") {
    val bs = boxesFor(160, 96, 64, 0.5, 0, autoAdjust = true)
    // h_tiles = 160//32 = 5, v_tiles = 96//32 = 3
    assert(bs.size == 15)
    // every box is exactly tile x tile and inside the image
    assert(bs.forall { case (_, _, l, u, r, lo) =>
      r - l == 64 && lo - u == 64 && l >= 0 && u >= 0 && r <= 160 && lo <= 96 })
    // ragged cells i=4 (left0=128, right0=min(192,160)=160 short) slide back:
    assert(bs.filter(_._1 == 4).forall { case (_, _, l, _, r, _) => l == 96 && r == 160 })
  }

  test("150x100 tile=64 overlap=0.5 no adjust: ragged edge boxes clamp") {
    val bs = boxesFor(150, 100, 64, 0.5, 0, autoAdjust = false)
    // h_tiles = 150//32 = 4, v_tiles = 100//32 = 3
    assert(bs.size == 12)
    val ragged = bs.filter { case (_, _, l, _, r, _) => r - l < 64 }
    // i=3: left=96, right=min(160,150)=150 → width 54
    assert(ragged.nonEmpty && ragged.forall { case (i, _, l, _, r, _) => i == 3 && l == 96 && r == 150 })
  }

  test("padding shrinks the scanned extent") {
    // (150-10)//32 = 4 h-tiles stays; (100-10)//32 = 2 v-tiles drops one row
    val bs = boxesFor(150, 100, 64, 0.5, 10, autoAdjust = false)
    assert(bs.size == 8)
    assert(bs.map(_._2).max == 1L)
  }

  test("image smaller than tile: zero boxes at overlap 0") {
    // 40 < 64: h_tiles = 40//64 = 0 → empty grid
    assert(boxesFor(40, 70, 64, 0.0, 0, autoAdjust = false).isEmpty)
  }

  test("recommended crop matches filter_crop.py:6-13") {
    import spark.implicits._
    val s = Geometry.step(64, 0.25) // 48
    val df = Seq((130, 130), (40, 70), (160, 96)).toDF("w", "h")
      .select(col("w"), col("h"),
        Geometry.recommendedCrop(col("w"), col("h"), 64, s).as("rw"),
        Geometry.recommendedCrop(col("h"), col("w"), 64, s).as("rh"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // 130: ((130-64)//48)*48+64 = 112; 40<64 → identity;
    // (160,96): rw = ((96)//48)*48+64 = 160, rh = ((32)//48)*48+64 = 64
    assert(rows == Seq((130, 130, 112L, 112L), (40, 70, 40L, 70L), (160, 96, 160L, 64L)))
  }

  test("property: every box lies within image bounds (with Auto Adjust, w,h >= tile)") {
    val cases = for {
      w <- Seq(64, 100, 150, 333); h <- Seq(64, 97, 256)
      overlap <- Seq(0.0, 0.5, 0.9)
    } yield (w, h, overlap)
    cases.foreach { case (w, h, ov) =>
      val bs = boxesFor(w, h, 64, ov, 0, autoAdjust = true)
      assert(bs.forall { case (_, _, l, u, r, lo) =>
        l >= 0 && u >= 0 && r <= w && lo <= h && r - l == 64 && lo - u == 64 },
        s"out-of-bounds box for ($w,$h,$ov)")
    }
  }
}
