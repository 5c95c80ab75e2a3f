package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the key's bit interleave is oracle-gated
  * (`zorder_key`); this pins what the oracle can't see — that
  * [[Layout.clusteredWrite]] actually produces files whose per-file
  * min/max bounding boxes are SMALL IN BOTH dimensions (the property a
  * stats-pruning reader skips on), where a row-major layout is small in
  * one dimension and full-width in the other. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("zorderKey2: locality, masking, and hand-checked interleaves") {
    import spark.implicits._
    val r = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L),
      (65536L + 5L, 3L)).toDF("a", "b")
      .select(Layout.zorderKey2($"a", $"b", bits = 16)).collect().map(_.getLong(0))
    // interleave: a→even bits, b→odd bits
    assert(r.take(4) === Array(0L, 1L, 2L, 3L))
    // 5=101, 3=011 → z = b1 a1 .. = 0b011011 = 27 (a bits at 0,2,4; b at 1,3,5)
    assert(r(4) === 27L)
    // the 17th bit of a is masked off the 16-bit grid
    assert(r(5) === r(4))
  }

  test("clusteredWrite: every file's bounding box is tight in BOTH dims; row-major is not") {
    import spark.implicits._
    val side = 64 // 4096 rows on a 64×64 grid
    val grid = spark.range(side.toLong * side)
      .select((col("id") / side).cast("long").as("x"),
        (col("id") % side).cast("long").as("y"))
      // row-major input order (sorted by x): the naive layout's files
      // are x-stripes — perfect x bounds, FULL-WIDTH y bounds
      .orderBy("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // the naive contrast: same file count, input (row-major) order
    // preserved — x-striped files, so y bounds are FULL-WIDTH
    grid.repartitionByRange(16, col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$tmp/rowmajor")
    Layout.clusteredWrite(grid, "x", "y", s"$tmp/zorder", nFiles = 16, bits = 6)

    def spans(path: String) = Layout.fileSpans(spark, path, "x", "y")
      .select(col("max_a") - col("min_a"), col("max_b") - col("min_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val z = spans(s"$tmp/zorder")
    assert(z.length === 16, "requested file count")
    // 16 files over a 64×64 z-curve = 16×16 quadrants: both spans ≤ 16
    // for every file (+boundary slack from range sampling)
    assert(z.forall { case (dx, dy) => dx <= 24 && dy <= 24 },
      s"z-order boxes must be tight in both dims: ${z.toSeq}")
    // the row-major layout prunes x but NOT y — its y spans are the
    // whole grid, which is exactly what z-ordering fixes
    val rm = spans(s"$tmp/rowmajor")
    assert(rm.exists { case (_, dy) => dy >= side - 1 },
      s"row-major files must be full-width in y: ${rm.toSeq}")
    // a box filter's matching rows therefore live in few files
    val hits = spark.read.parquet(s"$tmp/zorder")
      .where(col("x").between(8, 15) && col("y").between(8, 15))
      .select(input_file_name()).distinct().count()
    assert(hits <= 4, s"8×8 box must touch ≤4 of 16 z-ordered files, got $hits")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
