package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Morton-key correctness + the actual pruning win of the Z-order layout:
  * the same corpus written random-partitioned vs Z-ordered, and the
  * fraction of rows living in row groups whose bbox stats overlap a
  * window query compared between the two (the rows a stats-pruning scan
  * must actually read). */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("Column interleave matches the reference bit-twiddle, key is monotone per cell") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 3L))
    val got = pairs.toDF("qx", "qy")
      .select(ZOrder.interleave(col("qx"), col("qy")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == pairs.map { case (x, y) => ZOrder.interleaveRef(x, y) })
    // the interleave is a bijection into 32 bits: distinct cells → distinct keys
    assert(got.distinct.size == pairs.size)
  }

  test("property: interleave is a bijection and preserves quadrant prefixes") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val cell = Gen.choose(0L, 65535L)
    // pure-Scala property over the reference bit-twiddle (no Spark job
    // per sample): bijection + quadrant-prefix locality
    val prop = Prop.forAll(Gen.zip(cell, cell)) { case (qx, qy) =>
      val z = ZOrder.interleaveRef(qx, qy)
      (0 until 16).map(b => ((z >> (2 * b)) & 1L) << b).sum == qx &&
        (0 until 16).map(b => ((z >> (2 * b + 1)) & 1L) << b).sum == qy &&
        // same top-half quadrant ⇒ same top key bits (the locality that
        // makes range-partitioning by z cluster space)
        (z >> 30) == (((qy >> 15) << 1) | (qx >> 15))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
    // ONE Spark job pins the Column implementation to the reference over
    // a random sample of cells
    val cells = Gen.listOfN(256, Gen.zip(cell, cell)).sample.get
    val got = cells.toDF("qx", "qy")
      .select(col("qx"), col("qy"), ZOrder.interleave(col("qx"), col("qy")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleaveRef(r.getLong(0), r.getLong(1)))
    }
  }

  test("quantize clamps out-of-range coordinates to the grid edges") {
    import spark.implicits._
    val got = Seq(-200.0, -180.0, 0.0, 179.9999, 180.0, 200.0).toDF("x")
      .select(ZOrder.quantize(col("x"), -180.0, 180.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(got.head == 0L && got(1) == 0L)
    assert(got(3) == 65535L && got(4) == 65535L && got(5) == 65535L)
    assert(got(2) == 32768L)
  }

  /** Rows in row groups whose bbox column stats overlap the window — what
    * a min/max-pruning scan must read. */
  private def rowsTouched(dir: String, w: (Double, Double, Double, Double)): (Long, Long) = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    var touched = 0L; var total = 0L
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getFooter.getBlocks.asScala.foreach { block =>
          val cols = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def min(p: String) = cols(p).genericGetMin.asInstanceOf[Double]
          def max(p: String) = cols(p).genericGetMax.asInstanceOf[Double]
          val overlaps = min("bbox.xmin") <= w._3 && max("bbox.xmax") >= w._1 &&
            min("bbox.ymin") <= w._4 && max("bbox.ymax") >= w._2
          total += block.getRowCount
          if (overlaps) touched += block.getRowCount
        }
      } finally reader.close()
    }
    (touched, total)
  }

  test("Z-ordered layout prunes most row groups for a window query; random layout cannot") {
    import spark.implicits._
    val n = 4000
    val df = spark.range(n).select(
      col("id"),
      struct(
        (col("id") % 360 - 180).cast("double").as("xmin"),
        (col("id") % 170 - 85).cast("double").as("ymin"),
        ((col("id") % 360 - 180) + 1).cast("double").as("xmax"),
        ((col("id") % 170 - 85) + 0.5).cast("double").as("ymax")).as("bbox"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    // random layout: hash-partitioned, every file covers all of space
    df.repartition(8, col("id")).write.parquet(s"$tmp/random")
    // Z-ordered layout: range-partitioned + sorted on the Morton key
    val zkey = ZOrder.mortonKeyOfBboxCenter(col("bbox"))
    df.withColumn("_z", zkey).repartitionByRange(8, col("_z"))
      .sortWithinPartitions(col("_z")).drop("_z")
      .write.parquet(s"$tmp/zorder")
    val window = (20.0, 20.0, 40.0, 40.0)
    val (randTouched, randTotal) = rowsTouched(s"$tmp/random", window)
    val (zTouched, zTotal) = rowsTouched(s"$tmp/zorder", window)
    assert(randTotal == n && zTotal == n)
    // same data answers the same query either way…
    val a = spark.read.parquet(s"$tmp/random").filter(
      col("bbox.xmin") <= 40 && col("bbox.xmax") >= 20 &&
        col("bbox.ymin") <= 40 && col("bbox.ymax") >= 20).count()
    val b = spark.read.parquet(s"$tmp/zorder").filter(
      col("bbox.xmin") <= 40 && col("bbox.xmax") >= 20 &&
        col("bbox.ymin") <= 40 && col("bbox.ymax") >= 20).count()
    assert(a == b && a > 0)
    // …but the random layout's stats overlap the window everywhere, while
    // the Z-order layout confines it to a fraction of the rows
    assert(randTouched == randTotal, "hash layout should have no pruning power")
    assert(zTouched <= zTotal / 2,
      s"z-order should prune at least half the rows, touched $zTouched of $zTotal")
  }
}
