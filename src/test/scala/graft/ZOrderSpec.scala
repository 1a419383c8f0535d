package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{exprs, ZOrderOps}
import graft.sources.Sinks

/** Z-order layout laws: the Morton key's bit semantics, bijectivity on
  * a full grid, and the point of the whole exercise — a box predicate
  * on the SECOND dimension touches a fraction of a z-ordered layout's
  * files where a one-column sort layout touches all of them. */
class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("interleave2 matches an independent bit-by-bit computation") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L),
      (12345L, 54321L), (65535L, 65535L))
    cases.foreach { case (x, y) =>
      val expect = (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      }.sum
      assert(ZOrderOps.interleave2(x, y, 16) == expect, s"($x, $y)")
    }
    // clamping: negatives pin to 0, overflow pins to the mask
    assert(ZOrderOps.interleave2(-5L, 2L, 4) == ZOrderOps.interleave2(0L, 2L, 4))
    assert(ZOrderOps.interleave2(999L, 2L, 4) == ZOrderOps.interleave2(15L, 2L, 4))
  }

  test("z keys are a bijection on a full 2^bits x 2^bits grid") {
    val n = 32 // 5 bits
    val z = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"),
        floor(col("id") / n).cast("long").as("y"))
      .select(exprs.z_order2(col("x"), col("y"), 5).as("z"))
    val stats = z.agg(countDistinct(col("z")), min(col("z")), max(col("z"))).head()
    assert(stats.getLong(0) == n.toLong * n) // all distinct
    assert(stats.getLong(1) == 0L && stats.getLong(2) == n.toLong * n - 1) // dense
  }

  test("y-box predicate touches few z-ordered files but ALL x-sorted files") {
    val n = 64
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).cast("long").as("x"),
        (col("id") / n).cast("long").as("y"))
    val tmp = graft.sources.Scratch.dir(
      s"zorder_law_${java.util.UUID.randomUUID.toString.take(8)}")
    Sinks.writeZOrdered(grid, s"$tmp/z", "x", "y", bits = 6, nShards = 16)
    Sinks.writeRangeShards(grid, s"$tmp/x", "x", nShards = 16)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y") >= 8 && col("y") <= 15) // y-only box, no x constraint
        .select(input_file_name()).distinct().count()

    val xFiles = filesTouched(s"$tmp/x")
    val zFiles = filesTouched(s"$tmp/z")
    // x-sorted: every shard spans all y values — nothing skips
    assert(xFiles == 16L, s"x-sorted layout touched $xFiles of 16 files")
    // z-ordered: consecutive key ranges are 2-D tiles — the box lives in
    // a strip of them (~sqrt scaling); half the files is a loose bound
    assert(zFiles <= 8L, s"z-ordered layout touched $zFiles of 16 files")

    // and the layout hop loses nothing: content round-trips exactly
    val back = spark.read.parquet(s"$tmp/z").select("x", "y")
      .as[(Long, Long)].collect().sorted
    assert(back.toSeq == grid.as[(Long, Long)].collect().sorted.toSeq)
  }
}
