package graft.stac

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UPDATE (DV-style: matched rows die by position, new row versions
  * append — untouched files never rewritten) and RESTORE (roll the
  * current state back to an earlier version as a NEW commit — pure log
  * surgery, no data-file copies) over the portable Delta log. */
class UpdateRestoreSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("pupd").toString + "/tbl"

  private def rows(ids: Seq[Long], tag: String) = {
    val s = spark; import s.implicits._
    ids.map(i => (i, tag, i * 10L)).toDF("id", "tag", "v")
  }

  private def partsOnDisk(path: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) out += st.getPath.getName
    }
    out.toSet
  }

  test("update: SET reads the OLD row, untouched files never rewritten") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "base").repartition(3), path)
    val before = partsOnDisk(path)
    // v = v + id reads BOTH pre-update columns; tag rewrites to a literal
    val st = PortableDelta.update(spark, path, col("id") >= 6L,
      Map("v" -> (col("v") + col("id")), "tag" -> lit("upd")))
    assert(st.updatedRows == 4, s"unexpected $st")
    assert(before.subsetOf(partsOnDisk(path)),
      "update must never rewrite existing files — the DV contract")
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got.size == 10)
    (0L until 6L).foreach(i => assert(got(i) == ("base", i * 10L)))
    (6L until 10L).foreach(i => assert(got(i) == ("upd", i * 10L + i)))
    // protocol upgraded by the first DV; pre-update version still reads
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.minReaderVersion == 3 && snap.minWriterVersion == 7)
    val pre = PortableDelta.readTable(spark, path, st.version - 1)
      .filter(col("tag") === "upd").count()
    assert(pre == 0L, "versionAsOf must predate the update")
  }

  test("update matches the LIVE view only; no match commits nothing") {
    val path = tmp()
    PortableDelta.write(rows(0L until 6L, "base").coalesce(1), path)
    PortableDelta.delete(spark, path, col("id") === 2L)
    val v1 = PortableDelta.snapshot(spark, path).version
    // predicate covers the dead row 2: only 1 and 3 update
    val st = PortableDelta.update(spark, path, col("id").between(1L, 3L),
      Map("tag" -> lit("u")))
    assert(st.updatedRows == 2, s"dead rows must not update: $st")
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "base", 1L -> "u", 3L -> "u", 4L -> "base", 5L -> "base"))
    // nothing matches: version must not advance
    val st2 = PortableDelta.update(spark, path, col("id") === 99L,
      Map("tag" -> lit("x")))
    assert(st2.updatedRows == 0 &&
      st2.version == PortableDelta.snapshot(spark, path).version)
    assert(PortableDelta.snapshot(spark, path).version == v1 + 1)
  }

  test("update of a partition column migrates rows across hive dirs") {
    val path = tmp()
    val s = spark; import s.implicits._
    val df = (0L until 8L).map(i => (i, if (i < 4) "a" else "b", i)).toDF("id", "p", "v")
    PortableDelta.write(df, path, partitionBy = Seq("p"))
    val st = PortableDelta.update(spark, path, col("id") === 1L,
      Map("p" -> lit("b")))
    assert(st.updatedRows == 1)
    val snap = PortableDelta.snapshot(spark, path)
    assert(snap.partitionColumns == Seq("p"))
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "b" && got.size == 8)
    // the migrated row's new file lives under the b partition dir
    val newAdds = snap.files.filter(_.partitionValues.get("p").contains("b"))
    assert(newAdds.size >= 2, "row 1 must land in a NEW file under p=b")
  }

  test("restore rolls data, DVs, and schema back; log stays append-only") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "base").repartition(2), path)   // v0
    PortableDelta.write(rows(10L until 14L, "extra"), path, mode = "append") // v1
    PortableDelta.delete(spark, path, col("id") < 3L)                       // v2
    PortableDelta.update(spark, path, col("id") === 5L, Map("tag" -> lit("u"))) // v3
    val diskBefore = partsOnDisk(path)
    val rs = PortableDelta.restore(spark, path, 0L)                         // v4
    assert(rs.version == 4L && rs.restoredVersion == 0L)
    assert(rs.addedFiles > 0 && rs.removedFiles > 0)
    assert(partsOnDisk(path) == diskBefore,
      "restore is log surgery — it must not write or delete data files")
    // current state == v0 exactly (rows 0..9 all tag=base, no DVs)
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (0L until 10L).map(i => (i, "base")).toSet)
    assert(PortableDelta.snapshot(spark, path).files.forall(_.dv.isEmpty),
      "the delete's deletion vectors must roll back with the data")
    // the botched versions remain auditable and readable (append-only log)
    assert(PortableDelta.readTable(spark, path, 3L).count() == 11L)
    val hist = PortableDelta.history(spark.sessionState.newHadoopConf(), path)
    assert(hist.exists(_._2.startsWith("RESTORE")), s"history: $hist")
    // restoring the now-current state is a no-op
    val rs2 = PortableDelta.restore(spark, path, 4L)
    assert(rs2.addedFiles == 0 && rs2.removedFiles == 0 && rs2.version == 4L)
    // and restore is itself restorable: roll FORWARD to v3's state
    val rs3 = PortableDelta.restore(spark, path, 3L)
    assert(rs3.version == 5L)
    assert(PortableDelta.readTable(spark, path).count() == 11L)
    assert(PortableDelta.readTable(spark, path)
      .filter(col("tag") === "u").count() == 1L)
  }

  test("txn-tagged UPDATE and DELETE are idempotent per (appId, version)") {
    val path = tmp()
    PortableDelta.write(rows(0L until 8L, "base").coalesce(1), path)
    val u1 = PortableDelta.update(spark, path, col("id") < 4L,
      Map("tag" -> lit("u")), txn = Some(("app", 0L)))
    assert(u1.updatedRows == 4)
    // replayed batchId: skipped before any scan — version and rows frozen
    val u2 = PortableDelta.update(spark, path, col("id") < 4L,
      Map("tag" -> lit("uu")), txn = Some(("app", 0L)))
    assert(u2.updatedRows == 0 && u2.version == u1.version)
    assert(PortableDelta.readTable(spark, path)
      .filter(col("tag") === "uu").count() == 0L)
    // the next batchId applies, and its watermark advances
    val d1 = PortableDelta.delete(spark, path, col("id") === 7L,
      txn = Some(("app", 1L)))
    assert(d1.deletedRows == 1)
    val d2 = PortableDelta.delete(spark, path, col("id") === 6L,
      txn = Some(("app", 1L)))
    assert(d2.deletedRows == 0 && d2.version == d1.version,
      "replayed delete batch must be a no-op")
    assert(PortableDelta.snapshot(spark, path).txns("app") == 1L)
    assert(PortableDelta.readTable(spark, path).count() == 7L)
  }

  test("concurrent UPDATE and DELETE race: both rebase and land, state exact") {
    val path = tmp()
    PortableDelta.write(rows(0L until 20L, "base").repartition(2), path)
    // disjoint predicates mutate the SAME files concurrently — the loser
    // of each commit race must rebase (re-match, re-bitmap, re-stage)
    // against the winner's DVs, never double-kill or resurrect a row
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val upd = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long =
          PortableDelta.update(spark, path, col("id") % 2 === 0L,
            Map("tag" -> lit("even"))).updatedRows
      })
      val del = pool.submit(new java.util.concurrent.Callable[Long] {
        override def call(): Long =
          PortableDelta.delete(spark, path, col("id") % 5 === 1L).deletedRows
      })
      val updated = upd.get(120, java.util.concurrent.TimeUnit.SECONDS)
      val deleted = del.get(120, java.util.concurrent.TimeUnit.SECONDS)
      // ids 1, 6, 11, 16 die; evens update. 6 and 16 are both even AND
      // %5==1 — depending on commit order one op may see them already
      // mutated, so counters can differ, but the FINAL STATE may not:
      // a row is present iff it survived the delete, and surviving
      // evens carry the update (update-after-delete leaves them dead;
      // delete-after-update kills the updated versions)
      // delete always finds its 4 ids (update preserves ids); update
      // finds 10 evens if it committed first, 8 if it rebased over the
      // delete (6 and 16 already dead)
      assert(Set(8L, 10L).contains(updated), s"updated=$updated")
      assert(deleted == 4L, s"deleted=$deleted")
    } finally pool.shutdown()
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0L until 20L).filterNot(i => i % 5 == 1L)
      .map(i => i -> (if (i % 2 == 0) "even" else "base")).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  test("concurrent MERGE vs MERGE on overlapping keys: serialized, no lost update") {
    val path = tmp()
    PortableDelta.write(rows(0L until 10L, "base").coalesce(1), path)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = Seq("m1", "m2").map { tag =>
        pool.submit(new java.util.concurrent.Callable[PortableDelta.MergeStats] {
          override def call(): PortableDelta.MergeStats =
            PortableDelta.merge(spark, path,
              rows(Seq(3L, 4L), tag).union(rows(Seq(100L + tag.last - '0'), tag)),
              Seq("id"))
        })
      }
      val stats = tasks.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      // both merges land at distinct versions; each updated 3,4 and
      // inserted its own key
      assert(stats.map(_.version).toSet.size == 2)
      assert(stats.forall(s => s.updatedRows == 2 && s.insertedRows == 1),
        s"stats: $stats")
    } finally pool.shutdown()
    val got = PortableDelta.readTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 12) // 10 base + 2 inserts
    // 3 and 4 carry the LAST committed merge's tag (serialized history,
    // no lost update: both versions exist in the log)
    val lastTag = got(3L)
    assert((lastTag == "m1" || lastTag == "m2") && got(4L) == lastTag)
    assert(got(101L) == "m1" && got(102L) == "m2")
    val hist = PortableDelta.history(spark.sessionState.newHadoopConf(), path)
    assert(hist.count(_._2 == "MERGE") == 2, s"history: $hist")
  }

  test("restore fails BY NAME when a needed data file no longer exists") {
    val path = tmp()
    PortableDelta.write(rows(0L until 5L, "base").coalesce(1), path)  // v0
    PortableDelta.write(rows(0L until 5L, "ow").coalesce(1), path,
      mode = "overwrite")                                             // v1
    // simulate a reclaimed v0 file: drop the tombstoned part from disk
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val v0file = PortableDelta.snapshotAt(spark, path, 0L).files.head.path
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), v0file), false))
    val e = intercept[IllegalArgumentException] {
      PortableDelta.restore(spark, path, 0L)
    }
    assert(e.getMessage.contains("no longer exist"), e.getMessage)
    // the failed restore committed nothing
    assert(PortableDelta.snapshot(spark, path).version == 1L)
  }

  test("RESTORE and shallow CLONE resolve TIMESTAMP AS OF via the ICT rule") {
    val path = tmp()
    // born with ICT: every commit carries a strictly monotonic stamp,
    // so an instant between commits resolves exactly
    PortableDelta.write(rows(0L until 4L, "a").coalesce(1), path,
      properties = Map(PortableDelta.IctProp -> "true"))               // v0
    PortableDelta.write(rows(Seq(10L), "b").coalesce(1), path,
      mode = "append")                                                 // v1
    PortableDelta.delete(spark, path, col("id") === 0L)                // v2
    val conf = spark.sessionState.newHadoopConf()
    val tsOf = PortableDelta.history(conf, path).map(h => h._1 -> h._3).toMap
    // clone pinned just before v2 sees v1's state
    val dst = tmp()
    PortableDelta.cloneShallowAtTimestamp(spark, path, dst, tsOf(2L) - 1)
    assert(PortableDelta.readTable(spark, dst).count() == 5L)
    // restore to v1's instant rolls the delete back
    val st = PortableDelta.restoreAtTimestamp(spark, path, tsOf(1L))
    assert(st.version == 3L)
    assert(PortableDelta.readTable(spark, path).count() == 5L)
    // an instant before the first commit refuses with the range named
    val e = intercept[IllegalArgumentException] {
      PortableDelta.restoreAtTimestamp(spark, path, tsOf(0L) - 100)
    }
    assert(e.getMessage.contains("before the earliest"))
  }
}
