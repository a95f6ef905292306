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
    // optional probe filter (comma-separated names) — the 100× scale
    // rehearsals re-measure a few probes without paying for the suite
    val only: Set[String] = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def enabled(name: String): Boolean = only.isEmpty || only.contains(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-delta-bench")
      .withExtensions(new graft.GraftExtensions) // the documented deployment
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
        if (!enabled(name)) return -1.0
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
      // CONVERT TO DELTA (round 17): adopt a hive-partitioned parquet
      // layout in place — the probe's cost is listing + distributed
      // footer reads + one JSON append, NEVER data bytes; the decade
      // rows prove it tracks file count, not table size
      results("convert_inplace") = timeVerb("convert_inplace") { () =>
        val out = java.nio.file.Files
          .createTempDirectory("dbench-cvt").toString + "/tbl"
        orders.repartition(8).write.partitionBy("status").parquet(out)
        out
      } { t =>
        PortableDelta.convertToDelta(spark, t, Some(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("status",
              org.apache.spark.sql.types.StringType)))))
        require(PortableDelta.snapshot(spark, t).files.nonEmpty)
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
      // round-14 declarative surfaces: the log-backed file relation
      // (build + stats-pruned filtered count over a checkpoint-seeded
      // table) and the metadata-only aggregate rule (no data scan —
      // asserted per rep)
      results("fmt_read_filtered") = timeVerb("fmt_read_filtered") { () =>
        val t = fresh("fmtr")
        PortableDelta.checkpoint(spark, t)
        t
      } { t =>
        val n = spark.read.format("portable-delta").load(t)
          .filter(col("okey") % 10L === 0L).count()
        require(n > 0)
      }
      results("fmt_meta_agg") = timeVerb("fmt_meta_agg") { () =>
        val t = fresh("fmta")
        PortableDelta.checkpoint(spark, t)
        t
      } { t =>
        graft.stac.OptimizeDeltaMetadataOnlyAgg.arm(spark)
        val q = spark.read.format("portable-delta").load(t)
          .agg(count(lit(1)).as("cnt"),
            min(col("okey")).as("mn"), max(col("okey")).as("mx"))
        require(q.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.isEmpty, "metadata-only aggregate must plan without a data scan")
        require(q.head().getLong(0) == nRows)
      }
      // round-15 declarative surfaces: the DV-aware format read (one
      // DELETE's bitmaps probed in the file iterators — the cost a SQL
      // reader pays after row-level DML) and SQL INSERT INTO (the
      // protocol write through InsertIntoDataSourceCommand)
      results("fmt_dv_read") = timeVerb("fmt_dv_read") { () =>
        val t = fresh("fmtdv")
        val res = PortableDelta.delete(spark, t, col("okey") % 5L === 0L)
        require(res.deletedRows > 0 && res.removedFiles == 0, s"$res")
        t
      } { t =>
        val n = spark.read.format("portable-delta").load(t)
          .filter(col("okey") % 2L === 1L).count()
        require(n > 0 && n < nRows)
      }
      // round-16 DV split: the 100-TB shape — ONE surgically-DV'd file
      // in a 512-file table. fmt_read_512f is the clean-columnar
      // reference; fmt_dv_read_split must sit at (not multiples above)
      // it, because SplitDvScan keeps the 511 DV-free files on the
      // vectorized batch path and routes only the DV file row-wise.
      val maxKey = orders.agg(max(col("okey"))).first().getLong(0)
      def wide512(tag: String): String = {
        val t = java.nio.file.Files
          .createTempDirectory(s"dbench-$tag").toString + "/tbl"
        PortableDelta.write(orders.repartitionByRange(512, col("okey")), t)
        t
      }
      results("fmt_read_512f") = timeVerb("fmt_read_512f")(
        () => wide512("fmt512")) { t =>
        val n = spark.read.format("portable-delta").load(t)
          .filter(col("okey") % 2L === 1L).count()
        require(n > 0 && n < nRows)
      }
      results("fmt_dv_read_split") = timeVerb("fmt_dv_read_split") { () =>
        val t = wide512("fmtdvs")
        val res = PortableDelta.delete(spark, t, col("okey") === maxKey)
        require(res.deletedRows == 1 && res.removedFiles == 0, s"$res")
        t
      } { t =>
        val df = spark.read.format("portable-delta").load(t)
          .filter(col("okey") % 2L === 1L)
        val scans = df.queryExecution.sparkPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        require(scans.size == 2 && scans.exists(_.supportsColumnar),
          s"the DV split must fire: ${scans.size} scan(s)")
        val n = df.count()
        require(n > 0 && n < nRows)
      }
      results("sql_insert") = timeVerb("sql_insert") { () =>
        val t = fresh("sqlins")
        spark.sql("DROP TABLE IF EXISTS graft_dbench_ins")
        spark.sql(s"CREATE TABLE graft_dbench_ins USING `portable-delta` " +
          s"OPTIONS (path '$t')")
        t
      } { t =>
        spark.sql("INSERT INTO graft_dbench_ins " +
          "SELECT okey + 100000000, status, price FROM graft_dbench_ins " +
          "WHERE okey % 1000 = 0")
        require(PortableDelta.currentVersion(spark, t) >= 1L)
      }
      spark.sql("DROP TABLE IF EXISTS graft_dbench_ins")
      results("cluster_incremental") = timeVerb("cluster_incremental") { () =>
        // established clustered layout + one day's appends (10% of rows,
        // provider-less) — the maintenance pass re-clusters ONLY those
        val t = fresh("clu")
        PortableDelta.optimizeZOrder(spark, t, Seq("okey", "price"),
          numFiles = 32)
        PortableDelta.write(orders.filter(col("okey") % 10L === 3L)
          .repartition(4), t, mode = "append")
        t
      } { t =>
        val st = PortableDelta.optimizeClusterIncremental(spark, t)
        require(st.removedFiles > 0 && st.removedFiles <= 4,
          s"maintenance must touch only the new files, got $st")
      }

      results("reorg_purge") = timeVerb("reorg_purge") { () =>
        // hash layout → the residue delete lands DVs on EVERY file:
        // the purge's worst case, a full-table rewrite
        val t = fresh("rp")
        PortableDelta.delete(spark, t, col("okey") % 7L === 0L)
        t
      } { t =>
        val st = PortableDelta.reorgPurge(spark, t)
        require(st.removedFiles == 32 && st.purgedDvRows > 0, s"$st")
      }
      results("reorg_purge_narrow") = timeVerb("reorg_purge_narrow") { () =>
        // range layout + a ~1/32 key-slice delete → DVs land on ~1
        // file: purge cost must track VICTIM bytes, not the table
        val t = java.nio.file.Files
          .createTempDirectory("dbench-rpn").toString + "/tbl"
        PortableDelta.write(orders.repartitionByRange(32, col("okey")), t)
        PortableDelta.delete(spark, t, col("okey") <= maxKey / 32L)
        t
      } { t =>
        val st = PortableDelta.reorgPurge(spark, t)
        require(st.removedFiles >= 1 && st.removedFiles <= 3,
          s"narrow purge must touch only the DV slice, got $st")
      }
      results("drop_feature") = timeVerb("drop_feature") { () =>
        // a listed, trace-less writer feature: the drop is one
        // small-state commit — O(1) however many files the table has
        val t = java.nio.file.Files
          .createTempDirectory("dbench-dfx").toString + "/tbl"
        PortableDelta.write(orders.repartition(32), t,
          properties = Map("delta.feature.domainMetadata" -> "supported"))
        t
      } { t =>
        PortableDelta.dropFeatureSupport(spark, t, "domainMetadata")
      }

      // full vacuum lists the whole tree (cost ∝ files on disk even
      // when nothing reclaims); LITE reads tombstones from the log —
      // same 512-file reclaim, different discovery cost class
      def vacuumSetup(tag: String): String = {
        val t = java.nio.file.Files
          .createTempDirectory(s"dbench-$tag").toString + "/tbl"
        PortableDelta.write(orders.repartition(512), t)
        PortableDelta.write(orders.limit(1000).coalesce(1), t,
          mode = "overwrite") // 512 tombstones
        PortableDelta.checkpoint(spark, t)
        PortableDelta.cleanupLog(spark.sessionState.newHadoopConf(), t)
        t
      }
      results("vacuum_full_512f") = timeVerb("vacuum_full_512f")(
        () => vacuumSetup("vacf")) { t =>
        require(PortableDelta.vacuum(spark, t, graceMillis = 0L) == 512)
      }
      results("vacuum_lite_512f") = timeVerb("vacuum_lite_512f")(
        () => vacuumSetup("vacl")) { t =>
        require(PortableDelta.vacuumLite(spark, t, graceMillis = 0L) == 512)
      }

      results("source_drain") = timeVerb("source_drain") { () =>
        // the append-stream source catching up on a 16-commit backlog
        // (setup untimed): per-trigger windowed scans + watermark IO
        val t = fresh("src")
        (0 until 16).foreach(k => PortableDelta.write(
          orders.filter(col("okey") % 100L === k.toLong).coalesce(1),
          t, mode = "append"))
        t
      } { t =>
        val ck = java.nio.file.Files.createTempDirectory("dbench-srcck").toString
        val src = new graft.streaming.DeltaTableSource(spark, t, ck,
          maxVersionsPerTrigger = 4, startingVersion = Some(0L))
        var rows = 0L
        val triggers = src.runAvailableNow((df, _) => rows += df.count())
        require(triggers >= 4 && rows > nRows,
          s"drain must window the backlog: $triggers triggers, $rows rows")
      }

      results("pd_source_availablenow") = timeVerb("pd_source_availablenow") { () =>
        // the st22-style DECLARATIVE source under Trigger.AvailableNow:
        // a rate-limited drain of snapshot + an 8-commit backlog through
        // Spark's own checkpoint machinery (engine overhead included —
        // this is what a real consumer pays per catch-up run)
        val t = fresh("pdsrc")
        (0 until 8).foreach(k => PortableDelta.write(
          orders.filter(col("okey") % 100L === k.toLong).coalesce(1),
          t, mode = "append"))
        t
      } { t =>
        val ck = java.nio.file.Files.createTempDirectory("dbench-pdck").toString
        val expected = PortableDelta.readTable(spark, t).count()
        val rows = new java.util.concurrent.atomic.AtomicLong(0L)
        val q = spark.readStream.format("portable-delta")
          .option("maxFilesPerTrigger", "8").load(t)
          .writeStream
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: Long) => { rows.addAndGet(df.count()); () })
          .option("checkpointLocation", ck)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        require(rows.get() == expected,
          s"AvailableNow drain must deliver the table exactly: " +
            s"${rows.get()} of $expected rows")
      }

      results("snapshot_slice_drain") = timeVerb("snapshot_slice_drain") { () =>
        // the rate-limited INITIAL-SNAPSHOT join (round 12): a consumer
        // with no offset draining a checkpoint-seeded table slice-wise —
        // the pinned ordering builds ONCE (persisted range sort), each
        // trigger runs two executor passes and collects only its slice
        val t = java.nio.file.Files
          .createTempDirectory("dbench-slice").toString + "/tbl"
        PortableDelta.write(orders.repartition(48), t)
        PortableDelta.checkpoint(spark, t)
        PortableDelta.cleanupLog(spark, t)
        t
      } { t =>
        val ck = java.nio.file.Files.createTempDirectory("dbench-slck").toString
        val src = new graft.streaming.DeltaTableSource(spark, t, ck,
          maxFilesPerTrigger = Some(6))
        var rows = 0L
        val triggers = src.runAvailableNow((df, _) => rows += df.count())
        require(triggers >= 8 && rows == nRows,
          s"slice drain must deliver the snapshot exactly once: " +
            s"$triggers triggers, $rows of $nRows rows")
      }

      results("cdf_source_drain") = timeVerb("cdf_source_drain") { () =>
        // the CDF-stream sibling: a CDF-enabled table with a 12-commit
        // backlog of appends + row-changing commits; the drain replays
        // each window's change feed (setup untimed)
        val t = java.nio.file.Files
          .createTempDirectory("dbench-cdfsrc").toString + "/tbl"
        PortableDelta.write(orders.limit(1000).coalesce(1), t,
          properties = Map(PortableDelta.CdfProp -> "true"))
        (0 until 9).foreach(k => PortableDelta.write(
          orders.filter(col("okey") % 100L === k.toLong).coalesce(1),
          t, mode = "append"))
        PortableDelta.delete(spark, t, col("okey") % 100L === 3L)
        PortableDelta.update(spark, t, col("okey") % 100L === 5L,
          Map("price" -> (col("price") * 2)))
        t
      } { t =>
        val ck = java.nio.file.Files.createTempDirectory("dbench-cdfck").toString
        val src = new graft.streaming.DeltaCdfSource(spark, t, ck,
          maxVersionsPerTrigger = 3)
        var rows = 0L
        val triggers = src.runAvailableNow((df, _) => rows += df.count())
        require(triggers >= 4 && rows > 0,
          s"cdf drain must window the backlog: $triggers triggers, $rows rows")
      }

      // ---- wide-log replay probe: snapshot construction vs log shape —
      // the metadata cost the query trend rows can't see. One synthetic
      // 2000-commit log (fake adds with stats — replay never opens data
      // files), checkpoint cadence every 500; replay is read-only so
      // the same log serves every rep.
      val wideN = 2000; val ckEvery = 500
      val conf = spark.sessionState.newHadoopConf()
      val anyWidelog = Seq("widelog_replay_full", "widelog_snapshot_ckpt",
        "widelog_travel", "widelog_replay_compacted").exists(enabled)
      lazy val wide = syntheticWideLog(spark, wideN, ckEvery)
      def timeRead(name: String)(body: => Unit): Double = {
        if (!enabled(name)) return -1.0
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        val steady = times.min
        println(f"[deltabench] $name%-22s steady $steady%.2f s " +
          f"(${times.map(t => f"$t%.2f").mkString("/")})")
        steady
      }
      if (anyWidelog) {
      results("widelog_replay_full") = timeRead("widelog_replay_full") {
        // driver JSON replay of ALL 2000 commits (the no-checkpoint path)
        require(PortableDelta.snapshot(conf, wide).version == wideN)
      }
      results("widelog_snapshot_ckpt") = timeRead("widelog_snapshot_ckpt") {
        // checkpoint-seeded current state (the maintained-table path)
        require(PortableDelta.snapshot(spark, wide).version == wideN)
      }
      results("widelog_travel") = timeRead("widelog_travel") {
        // time travel: nearest checkpoint at 1500 + a 250-commit tail
        require(PortableDelta.snapshotAt(spark, wide, wideN - 250L)
          .version == wideN - 250L)
      }
      // minor log compaction: 4 spans of 500 replace 2000 per-commit
      // parses in the full-JSON replay path
      (1 to wideN by ckEvery).foreach { s =>
        PortableDelta.compactLog(conf, wide, s.toLong,
          math.min(wideN, s + ckEvery - 1).toLong)
      }
      results("widelog_replay_compacted") = timeRead("widelog_replay_compacted") {
        require(PortableDelta.snapshot(conf, wide).version == wideN)
      }
      }

      val json = results.filter(_._2 >= 0)
        .map { case (k, v) => s""""$k":${f"$v%.2f"}""" }
        .mkString(",")
      println(s"""{"metric":"delta_dml_steady","sf_dir":"$dir",""" +
        s""""rows":$nRows,"verbs":{$json}}""")
      // merge the probe map into the committed bench artifact so the
      // Delta verb trend is machine-adjudicable beside the query trend
      // (BASELINE.md's DML tables were hand-transcribed before). A
      // filtered probe run (third arg) merges into the existing map
      // instead of replacing it.
      try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val f = new java.io.File("BENCH_LOCAL.json")
        val root =
          (if (f.isFile) mapper.readTree(f) else mapper.createObjectNode())
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val entry = Option(root.get("delta_dml"))
          .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
          .getOrElse(root.putObject("delta_dml"))
        entry.put("sf_dir", dir); entry.put("rows", nRows)
        val verbs = Option(entry.get("verbs"))
          .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
          .getOrElse(entry.putObject("verbs"))
        results.filter(_._2 >= 0).foreach { case (k, v) =>
          verbs.put(k, BigDecimal(f"$v%.2f").doubleValue); ()
        }
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(mapper.writeValueAsString(root)) finally w.close()
        println(s"[deltabench] merged verb map into ${f.getPath}")
      } catch { case e: Throwable =>
        System.err.println(s"[deltabench] BENCH_LOCAL.json merge failed: ${e.getMessage}")
      }
    } finally spark.stop()
  }

  /** A synthetic `nCommits`-commit log: v0 declares the table, every
    * later commit adds two stats-carrying (nonexistent) files and
    * removes one — net live set grows one file per commit, the
    * steady-append-plus-churn shape. `checkpoint()` runs at the
    * cadence, so the probe covers checkpoint-seeded AND full-JSON
    * replay. Replay never opens data files, so fake paths are exactly
    * as expensive as real ones — this isolates the METADATA cost. */
  private def syntheticWideLog(spark: SparkSession, nCommits: Int,
                               ckEvery: Int): String = {
    val root = java.nio.file.Files.createTempDirectory("dbench-wide")
      .toString + "/tbl"
    val logDir = new java.io.File(s"$root/_delta_log")
    logDir.mkdirs()
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json
      .replace("\"", "\\\"")
    def writeCommit(v: Long, lines: Seq[String]): Unit = {
      val f = new java.io.File(logDir, f"$v%020d.json")
      val w = new java.io.FileWriter(f)
      try w.write(lines.mkString("", "\n", "\n")) finally w.close()
    }
    writeCommit(0L, Seq(
      s"""{"commitInfo":{"timestamp":1,"operation":"CREATE"}}""",
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"wide-1","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"$schemaJson",""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    (1 to nCommits).foreach { v =>
      def add(tag: String) =
        s"""{"add":{"path":"part-$v-$tag.parquet","partitionValues":{},""" +
          s""""size":1000,"modificationTime":$v,"dataChange":true,""" +
          s""""stats":"{\\"numRecords\\":100,\\"minValues\\":{\\"id\\":${v * 200}},""" +
          s"""\\"maxValues\\":{\\"id\\":${v * 200 + 199}},\\"nullCount\\":{\\"id\\":0}}"}}"""
      val rm =
        s"""{"remove":{"path":"part-${v - 1}-a.parquet","deletionTimestamp":$v,""" +
          s""""dataChange":true}}"""
      writeCommit(v.toLong, Seq(
        s"""{"commitInfo":{"timestamp":${v + 1},"operation":"WRITE"}}""",
        add("a"), add("b")) ++ (if (v > 1) Seq(rm) else Nil))
      if (v % ckEvery == 0) PortableDelta.checkpoint(spark, root)
    }
    root
  }
}
