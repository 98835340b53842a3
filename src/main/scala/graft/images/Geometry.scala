package graft.images

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-grid geometry (reference G1-G5, F2, M2-M3) as pure relational
  * expressions, independent of pixel data.
  *
  * Exact reference semantics (`/root/reference/modules/tiling.py:20-49`,
  * `modules/filter_crop.py:6-13,48,57`):
  *   step             = tile - int(overlap * tile)        // int() truncates
  *   horizontal_tiles = max(0, (W - padding) // step)     // padding shrinks
  *   vertical_tiles   = max(0, (H - padding) // step)     //   the extent
  *   box(i,j)         = (i*step, j*step,
  *                       min(i*step + tile, W), min(j*step + tile, H))
  *   Auto Adjust      : short edge tiles slide back inside the image
  *   incompatible     iff W < tile or H < tile
  *                     or (W-tile) % step != 0 or (H-tile) % step != 0
  *   recommended crop : ((W-tile)//step)*step + tile, clamped to W
  *                      (identity when the image is smaller than the tile)
  *
  * The queries run the math over dimensions synthesized deterministically
  * from `part` (so the DuckDB oracle sees identical inputs). The pixel
  * pipeline in graft.images.Tiling reuses gridBoxes for real images.
  */
object Geometry {

  /** step = tile - int(overlap*tile); Python int() truncation. */
  def step(tile: Int, overlap: Double): Int = tile - (overlap * tile).toInt

  /** Grid of tile boxes for one image as ARRAY<STRUCT<i,j,left,upper,right,lower>>.
    * Pure column arithmetic — stays inside WholeStageCodegen, no UDF. */
  def gridBoxes(w: Column, h: Column, tile: Int, overlap: Double,
                padding: Int, autoAdjust: Boolean): Column =
    gridBoxesDyn(w, h, lit(tile.toLong), lit(step(tile, overlap).toLong),
      lit(padding), autoAdjust)

  /** Column-parameter grid: tile/step may vary per row (the reference's
    * per-image `num_tiles` override, `modules/tiling.py:25-26`). */
  def gridBoxesDyn(w: Column, h: Column, tile: Column, s: Column,
                   padding: Column, autoAdjust: Boolean): Column = {
    val hTiles = greatest(lit(0L), floor((w - padding) / s).cast("long"))
    val vTiles = greatest(lit(0L), floor((h - padding) / s).cast("long"))
    // sequence(0, n-1) is invalid for n=0 (it would count down); guard.
    def range0(n: Column) =
      when(n > 0, sequence(lit(0L), n - 1)).otherwise(array().cast("array<long>"))
    def box(i: Column, j: Column) = {
      val left0 = i * s
      val upper0 = j * s
      val right0 = least(left0 + tile, w)
      val lower0 = least(upper0 + tile, h)
      val left = if (autoAdjust) when(right0 - left0 < tile, greatest(w - tile, lit(0))).otherwise(left0) else left0
      val right = if (autoAdjust) when(right0 - left0 < tile, left + tile).otherwise(right0) else right0
      val upper = if (autoAdjust) when(lower0 - upper0 < tile, greatest(h - tile, lit(0))).otherwise(upper0) else upper0
      val lower = if (autoAdjust) when(lower0 - upper0 < tile, upper + tile).otherwise(lower0) else lower0
      struct(i.as("i"), j.as("j"), left.as("left"), upper.as("upper"),
        right.as("right"), lower.as("lower"))
    }
    flatten(transform(range0(vTiles), j => transform(range0(hTiles), i => box(i, j))))
  }

  /** Recommended crop (reference M3): identity when smaller than tile. */
  def recommendedCrop(dim: Column, other: Column, tile: Int, s: Int): Column =
    when(dim < tile || other < tile, dim)
      .otherwise(least(floor((dim - tile) / lit(s)).cast("long") * s + tile, dim))

  /** Deterministic per-part synthetic dimensions shared with the oracle. */
  private def dims(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      (lit(64) + (col("p_partkey") * 7) % 193).as("w"),
      (lit(64) + (col("p_partkey") * 13) % 157).as("h"))

  private val dimsSql =
    """SELECT p_partkey, 64 + (p_partkey * 7) % 193 AS w,
      |       64 + (p_partkey * 13) % 157 AS h FROM part""".stripMargin

  /** Grid shape per image: tile=64, overlap=0.5 (step 32), padding=0. */
  def tileGrid(spark: SparkSession, dir: String): DataFrame = {
    val s = step(64, 0.5)
    dims(spark, dir)
      .withColumn("h_tiles", greatest(lit(0L), expr(s"(w - 0) div $s")))
      .withColumn("v_tiles", greatest(lit(0L), expr(s"(h - 0) div $s")))
      .withColumn("n_tiles", col("h_tiles") * col("v_tiles"))
      .orderBy(col("p_partkey"))
  }

  val tileGridSql: String =
    s"""WITH d AS ($dimsSql)
       |SELECT p_partkey, w, h,
       |  GREATEST(0, (w - 0) // 32) AS h_tiles,
       |  GREATEST(0, (h - 0) // 32) AS v_tiles,
       |  GREATEST(0, (w - 0) // 32) * GREATEST(0, (h - 0) // 32) AS n_tiles
       |FROM d ORDER BY p_partkey""".stripMargin

  /** Exploded tile boxes with Auto Adjust, for a bounded id range. */
  def tileBoxes(spark: SparkSession, dir: String): DataFrame = {
    val d = dims(spark, dir).filter(col("p_partkey") < 64)
    d.select(col("p_partkey"), col("w"), col("h"),
        explode(gridBoxes(col("w"), col("h"), 64, 0.5, 0, autoAdjust = true)).as("b"))
      .select(col("p_partkey"),
        col("b.i").as("i"), col("b.j").as("j"),
        col("b.left").as("box_left"), col("b.upper").as("box_upper"),
        col("b.right").as("box_right"), col("b.lower").as("box_lower"))
      .orderBy(col("p_partkey"), col("j"), col("i"))
  }

  val tileBoxesSql: String =
    s"""WITH d AS (SELECT * FROM ($dimsSql) WHERE p_partkey < 64),
       |g AS (
       |  SELECT p_partkey, w, h, gj.j AS j, gi.i AS i,
       |    i * 32 AS left0, j * 32 AS upper0,
       |    LEAST(i * 32 + 64, w) AS right0, LEAST(j * 32 + 64, h) AS lower0
       |  FROM d,
       |    UNNEST(generate_series(0, GREATEST(0, (h - 0) // 32) - 1)) AS gj(j),
       |    UNNEST(generate_series(0, GREATEST(0, (w - 0) // 32) - 1)) AS gi(i)
       |)
       |SELECT p_partkey, i, j,
       |  CASE WHEN right0 - left0 < 64 THEN GREATEST(w - 64, 0) ELSE left0 END AS box_left,
       |  CASE WHEN lower0 - upper0 < 64 THEN GREATEST(h - 64, 0) ELSE upper0 END AS box_upper,
       |  CASE WHEN right0 - left0 < 64 THEN GREATEST(w - 64, 0) + 64 ELSE right0 END AS box_right,
       |  CASE WHEN lower0 - upper0 < 64 THEN GREATEST(h - 64, 0) + 64 ELSE lower0 END AS box_lower
       |FROM g ORDER BY p_partkey, j, i""".stripMargin

  /** Compatibility filter (reference F2): tile=64, overlap=0.25 (step 48).
    * Routes rows to compatible/incompatible — here surfaced as counts per
    * class plus the recommended crop for the incompatible ones. */
  def compatFilter(spark: SparkSession, dir: String): DataFrame = {
    val t = 64; val s = step(t, 0.25)
    dims(spark, dir)
      .withColumn("incompatible",
        col("w") < t || col("h") < t ||
        (col("w") - t) % s =!= 0 || (col("h") - t) % s =!= 0)
      .withColumn("rec_w", recommendedCrop(col("w"), col("h"), t, s))
      .withColumn("rec_h", recommendedCrop(col("h"), col("w"), t, s))
      .withColumn("crop_left", expr("(w - rec_w) div 2"))
      .withColumn("crop_top", expr("(h - rec_h) div 2"))
      .orderBy(col("p_partkey"))
  }

  val compatFilterSql: String =
    s"""WITH d AS ($dimsSql)
       |SELECT p_partkey, w, h,
       |  (w < 64 OR h < 64 OR (w - 64) % 48 <> 0 OR (h - 64) % 48 <> 0) AS incompatible,
       |  CASE WHEN w < 64 OR h < 64 THEN w
       |       ELSE LEAST(((w - 64) // 48) * 48 + 64, w) END AS rec_w,
       |  CASE WHEN h < 64 OR w < 64 THEN h
       |       ELSE LEAST(((h - 64) // 48) * 48 + 64, h) END AS rec_h,
       |  (w - (CASE WHEN w < 64 OR h < 64 THEN w
       |             ELSE LEAST(((w - 64) // 48) * 48 + 64, w) END)) // 2 AS crop_left,
       |  (h - (CASE WHEN h < 64 OR w < 64 THEN h
       |             ELSE LEAST(((h - 64) // 48) * 48 + 64, h) END)) // 2 AS crop_top
       |FROM d ORDER BY p_partkey""".stripMargin

  /** num_tiles override (reference G5): tile = min(W,H) // int(sqrt(n)). */
  def numTilesOverride(spark: SparkSession, dir: String): DataFrame = {
    val n = 4 // requested approx tile count; int(sqrt(4)) = 2
    dims(spark, dir)
      .withColumn("tile_size", expr(s"least(w, h) div ${math.sqrt(n).toInt}"))
      .withColumn("step", col("tile_size") - (col("tile_size") * 0.5).cast("long"))
      .withColumn("h_tiles", greatest(lit(0L), floor(col("w") / col("step")).cast("long")))
      .withColumn("v_tiles", greatest(lit(0L), floor(col("h") / col("step")).cast("long")))
      .orderBy(col("p_partkey"))
  }

  val numTilesOverrideSql: String =
    s"""WITH d AS ($dimsSql),
       |t AS (SELECT p_partkey, w, h, LEAST(w, h) // 2 AS tile_size FROM d),
       |s AS (SELECT *, tile_size - CAST(FLOOR(tile_size * 0.5) AS BIGINT) AS step FROM t)
       |SELECT p_partkey, w, h, tile_size, step,
       |  GREATEST(0, CAST(FLOOR(CAST(w AS DOUBLE) / step) AS BIGINT)) AS h_tiles,
       |  GREATEST(0, CAST(FLOOR(CAST(h AS DOUBLE) / step) AS BIGINT)) AS v_tiles
       |FROM s ORDER BY p_partkey""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q30_tile_grid", tileGrid, Some(tileGridSql)),
    QueryDef("q31_tile_boxes", tileBoxes, Some(tileBoxesSql)),
    QueryDef("q32_compat_filter", compatFilter, Some(compatFilterSql)),
    QueryDef("q33_num_tiles_override", numTilesOverride, Some(numTilesOverrideSql))
  )
}
