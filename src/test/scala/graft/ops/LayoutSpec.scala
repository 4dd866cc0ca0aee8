package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (q71): interleave correctness, SQL-mirror parity,
  * and the actual pruning-power claim (tighter bounding boxes than a
  * hash layout).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave. */
  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("hand-computed interleave: z(3,5,3) = 39") {
    // x=011 -> bits 0,2 ; y=101 -> bits 1,5 : 1+4+2+32 = 39
    assert(zRef(3, 5, 3) == 39L)
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got == 39L)
  }

  test("Column form, generated SQL form, and driver replay agree") {
    val rnd = new scala.util.Random(3)
    val pts = (1 to 200).map(_ =>
      (rnd.nextInt(2048).toLong, rnd.nextInt(2048).toLong))
    val df = pts.toDF("x", "y")
    val both = df.select(col("x"), col("y"),
      Layout.zValue(col("x"), col("y"), 11).as("zc"))
      .withColumn("zs", expr(Layout.zValueSql("x", "y", 11)))
      .collect()
    both.foreach { r =>
      val want = zRef(r.getLong(0), r.getLong(1), 11)
      assert(r.getLong(2) == want && r.getLong(3) == want)
    }
  }

  test("z order preserves locality: adjacent z values are near in space") {
    // monotone in each coordinate along an axis: z(x,y) < z(x+1,y) when
    // upper bits are equal is NOT generally true, but the z curve's
    // defining property is containment: all points of a 2^k x 2^k
    // aligned tile form one contiguous z range
    val bits = 6
    val tile = for (x <- 8L until 16L; y <- 24L until 32L) yield zRef(x, y, bits)
    assert(tile.max - tile.min == tile.size - 1, "aligned tile not contiguous")
  }

  test("bucket stats bound every row and cover the whole table") {
    val stats = Layout.zorderBucketStats(spark, "/root/testdata/sf0.001")
      .collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum ==
      Tables(spark, "/root/testdata/sf0.001", "lineitem").count())
    stats.foreach { r =>
      assert(r.getAs[Long]("min_part") <= r.getAs[Long]("max_part"))
      assert(r.getAs[Long]("min_supp") <= r.getAs[Long]("max_supp"))
    }
  }

  test("z layout's partition bounding boxes beat a hash layout's") {
    // uniform grid: 64x64 points, 16 partitions. A perfect z layout
    // gives each partition a 16x16 tile (area 256); hash scatter gives
    // every partition nearly the full 64x64 box (area ~4096).
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def areaSum(df: org.apache.spark.sql.DataFrame): Long =
      Layout.partitionExtents(df, "x", "y").collect().map { r =>
        (r.getAs[Long]("max_x") - r.getAs[Long]("min_x") + 1) *
          (r.getAs[Long]("max_y") - r.getAs[Long]("min_y") + 1)
      }.sum
    val zArea = areaSum(Layout.zorderLayout(grid, "x", "y", 6, 16))
    val hashArea = areaSum(grid.repartition(16))
    // 16 tiles x 256 = 4096 ideal; hash ~ 16 x 4096 = 65536. A z-range
    // partition can straddle tile boundaries (box up to ~2 tiles), so
    // require 4x separation — far above noise, far below the ideal 16x.
    assert(zArea * 4 <= hashArea,
      s"z layout boxes not tighter: z=$zArea hash=$hashArea")
  }

  test("range layout: balanced, contiguous, equal to a driver-side NTILE") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val B = 8
    val rows = Layout.rangeLayoutStats(spark, dir, B).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to B).toSeq)
    // perfectly balanced: sizes differ by at most one, big buckets first
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1 &&
      sizes.sameElements(sizes.sorted.reverse), sizes.mkString(","))
    // contiguous: bucket i's max never exceeds bucket i+1's min
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3, s"$a / $b")
      case _ =>
    }
    // driver-side NTILE replay over the full (price, key) order
    val all = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getDouble(1), r.getLong(0))).sorted
    val n = all.length
    val q = n / B; val rr = n % B
    val expect = (1 to B).map { i =>
      val start = (i - 1) * q + math.min(i - 1, rr)
      val sz = if (i <= rr) q + 1 else q
      val slice = all.slice(start, start + sz)
      (i.toLong, sz.toLong, slice.map(_._1).min, slice.map(_._1).max)
    }
    assert(rows.toSeq == expect, s"${rows.toSeq} != $expect")
  }
}
