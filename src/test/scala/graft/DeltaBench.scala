package graft

import graft.stac.PortableDelta
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Steady-state timing probe for the Delta DML surface (test scope,
  * QuickRun's sibling): the stac25–stac38 gates validate these verbs
  * untimed, so regressions in DELETE/UPDATE/MERGE/OPTIMIZE/checkpoint/
  * CDF cost were invisible to the bench. Each verb runs `reps` times
  * against a FRESH table built from sf orders (DML mutates state; a
  * shared table would measure verb N against verb N-1's debris);
  * steady = min across reps, printed per verb plus one JSON line.
  * Run: sbt "Test/runMain graft.DeltaBench /root/testdata/sf0.1 [reps]".
  */
object DeltaBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-delta-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", value = false)
      .config("spark.sql.legacy.parquet.nanosAsLong", value = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warm
      val orders = Tables.t(spark, dir, "orders")
        .select(col("o_orderkey").as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"))
        .persist()
      val nRows = orders.count()
      println(s"[deltabench] $dir orders=$nRows reps=$reps")

      def fresh(tag: String, cdf: Boolean = false): String = {
        val out = java.nio.file.Files
          .createTempDirectory(s"dbench-$tag").toString + "/tbl"
        PortableDelta.write(orders.repartition(32), out,
          properties =
            if (cdf) Map(PortableDelta.CdfProp -> "true") else Map.empty)
        out
      }

      // table construction is SETUP (untimed, like QuerySpec.prepare) —
      // the verb's own cost is what the trend row tracks
      def timeVerb(name: String)(setup: () => String)(body: String => Unit)
          : Double = {
        val times = (1 to reps).map { _ =>
          val t = setup()
          val t0 = System.nanoTime()
          body(t)
          (System.nanoTime() - t0) / 1e9
        }
        val steady = times.min
        println(f"[deltabench] $name%-22s steady $steady%.2f s " +
          f"(${times.map(t => f"$t%.2f").mkString("/")})")
        steady
      }

      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

      results("delete") = timeVerb("delete")(() => fresh("del")) { t =>
        val st = PortableDelta.delete(spark, t, col("status") === "F")
        require(st.deletedRows > 0)
      }
      results("update") = timeVerb("update")(() => fresh("upd")) { t =>
        val st = PortableDelta.update(spark, t, col("okey") % 10L === 0L,
          Map("price" -> (col("price") * 2)))
        require(st.updatedRows > 0)
      }
      results("merge") = timeVerb("merge")(() => fresh("mrg")) { t =>
        // 10% of keys update, 5% insert as new keys past the max
        val src = orders.filter(col("okey") % 10L === 0L)
          .withColumn("price", col("price") * 2)
          .unionByName(orders.filter(col("okey") % 20L === 1L)
            .withColumn("okey", col("okey") + 1000000000L))
        val st = PortableDelta.merge(spark, t, src, Seq("okey"))
        require(st.updatedRows > 0 && st.insertedRows > 0)
      }
      results("optimize") = timeVerb("optimize") { () =>
        val t = fresh("opt")
        PortableDelta.delete(spark, t, col("okey") % 7L === 0L) // DVs to purge
        t
      } { t =>
        val st = PortableDelta.optimizeCompact(spark, t)
        require(st.removedFiles > 0 && st.purgedDvRows > 0)
      }
      results("checkpoint_v2") = timeVerb("checkpoint_v2") { () =>
        val t = fresh("ck")
        PortableDelta.write(orders.limit(1000), t, mode = "append")
        t
      } { t =>
        PortableDelta.checkpointV2(spark, t, addsPerSidecar = 16)
      }
      results("cdf_read") = timeVerb("cdf_read") { () =>
        val t = fresh("cdf", cdf = true)
        PortableDelta.delete(spark, t, col("status") === "F")
        PortableDelta.update(spark, t, col("okey") % 10L === 0L,
          Map("price" -> (col("price") * 2)))
        t
      } { t =>
        val n = PortableDelta.readChanges(spark, t, 0L, 2L).count()
        require(n > nRows)
      }

      val json = results.map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
        .mkString(",")
      println(s"""{"metric":"delta_dml_steady","sf_dir":"$dir",""" +
        s""""rows":$nRows,"verbs":{$json}}""")
    } finally spark.stop()
  }
}
