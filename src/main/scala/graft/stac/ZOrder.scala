package graft.stac

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) spatial layout key.
  *
  * The scan-locality half of the STAC-GeoParquet pruning story: the spec's
  * struct bbox gives every row group min/max stats (stac09 proves the
  * pushdown), but stats only PRUNE when spatially-near rows are stored
  * together. Sorting the table by the bit-interleaved key of the
  * quantized bbox center clusters space into contiguous key ranges, so a
  * bbox window query touches few row groups instead of grazing all of
  * them — the standard lakehouse Z-ORDER/cluster-by trick, here with a
  * deterministic, cross-engine-exact integer key (16-bit grid per axis,
  * 32-bit interleave; plain double arithmetic + bit ops in both Spark and
  * DuckDB, so the oracle can pin the key values).
  *
  * At 100 TB this is a one-time (or compaction-time) `repartitionByRange`
  * over the key — the same amortized-layout contract as q20's bucketing.
  */
object ZOrder {

  val Bits = 16

  /** Quantize a coordinate to a 16-bit grid cell over [lo, hi]. */
  def quantize(c: Column, lo: Double, hi: Double): Column =
    least(lit((1L << Bits) - 1), greatest(lit(0L),
      floor((c - lo) / (hi - lo) * (1L << Bits).toDouble).cast("long")))

  /** Morton key: bit-interleave of the quantized (lon, lat) pair. Pure
    * integer shifts/masks — stays inside whole-stage codegen. */
  def mortonKey(lon: Column, lat: Column): Column = {
    val qx = quantize(lon, -180.0, 180.0)
    val qy = quantize(lat, -90.0, 90.0)
    interleave(qx, qy)
  }

  /** Morton key of a struct-bbox column's CENTER — the one definition
    * shared by the layout writer, the gate query's value-checked output,
    * and the tests: all three must compute the identical key or the
    * value check stops certifying the written layout. */
  def mortonKeyOfBboxCenter(bbox: Column): Column =
    mortonKey(
      (bbox.getField("xmin") + bbox.getField("xmax")) / 2.0,
      (bbox.getField("ymin") + bbox.getField("ymax")) / 2.0)

  /** Interleave two pre-quantized 16-bit cell columns. */
  def interleave(qx: Column, qy: Column): Column =
    (0 until Bits).map { b =>
      shiftleft(shiftright(qx, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(qy, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  /** Reference interleave on plain longs (tests pin the Column version
    * against it). */
  def interleaveRef(qx: Long, qy: Long): Long =
    (0 until Bits).map { b =>
      (((qx >> b) & 1L) << (2 * b)) | (((qy >> b) & 1L) << (2 * b + 1))
    }.sum

  /** GENERIC N-column Z-key for table clustering (the OPTIMIZE ZORDER BY
    * path): each column is linearly quantized over its observed [lo, hi]
    * to `bits` levels, then the cells bit-interleave round-robin. Pure
    * Catalyst shifts/masks — the whole key stays in whole-stage codegen;
    * no UDF in the rewrite's hot path. `bits * cols.size` must fit a
    * long. Linear quantization (vs rank/quantile) keeps the key
    * deterministic and cross-engine-recomputable; heavily skewed columns
    * trade some balance for that determinism — the range partitioner
    * downstream re-balances row COUNTS regardless. */
  def zKeyLinear(cols: Seq[Column], los: Seq[Double], his: Seq[Double],
                 bits: Int): Column = {
    require(cols.nonEmpty && cols.size == los.size && cols.size == his.size)
    require(bits * cols.size <= 62, s"$bits bits × ${cols.size} cols overflows a long")
    val n = cols.size
    val qs = cols.indices.map { i =>
      val span = math.max(his(i) - los(i), java.lang.Double.MIN_NORMAL)
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((cols(i).cast("double") - los(i)) / span * (1L << bits).toDouble)
          .cast("long")))
    }
    (0 until bits).flatMap { b =>
      qs.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), n * b + i)
      }
    }.reduce(_ + _)
  }

  // ---- DuckDB mirrors (identical arithmetic, so keys hash-match) ----

  def quantizeSql(e: String, lo: Double, hi: Double): String =
    s"LEAST(${(1L << Bits) - 1}, GREATEST(0, " +
      s"CAST(floor((($e) - ($lo)) / (($hi) - ($lo)) * ${(1L << Bits).toDouble}) AS BIGINT)))"

  def interleaveSql(qx: String, qy: String): String =
    (0 until Bits).map { b =>
      s"((((${qx}) >> $b) & 1) << ${2 * b}) + ((((${qy}) >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " + ", ")")
}
