package graft.streaming

import graft.stac.SparkSpec
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

/** Exactly-once under injected failure — the chaos leg st07/st11 lacked
  * (their gates pin the HAPPY path against batch oracles). Three
  * failure modes, each asserting the delivery contract the sink
  * actually provides:
  *   1. task-level failure + retry inside the stream (first attempt of
  *      a task throws, Spark re-attempts): the checkpointed file sink
  *      must land EXACTLY the source rows — no loss, no duplicates;
  *   2. query-level crash mid-stream (a poison batch exhausts retries)
  *      then RESTART from the checkpoint: committed batches must not
  *      replay into the manifest, the failed batch must, final table
  *      exact;
  *   3. foreachBatch + append-parquet (the st11/st12 shape, NOT a
  *      transactional sink): a crash AFTER the batch's write but before
  *      its commit leaves duplicate raw rows on restart BY DESIGN — the
  *      spec proves the documented effectively-once contract: the
  *      deterministic re-write collapses in the final distinct, and the
  *      raw duplication is OBSERVED (so the distinct is load-bearing,
  *      not decorative).
  * Injection state is a JVM-static armed/counter pair (executors share
  * the test JVM in local mode — the GeoParquetWriterSpec chaos style). */
object ChaosInjector {
  @volatile var armed = false
  val fired = new AtomicInteger(0)
  def reset(): Unit = { armed = false; fired.set(0) }
}

class StreamChaosSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** 100 ids split across 4 source files (streamed one file per batch). */
  private def makeSource(): String = {
    val src = java.nio.file.Files.createTempDirectory("chaos_src").toString
    (0 until 4).foreach { f =>
      spark.range(f * 25L, (f + 1) * 25L).toDF("id")
        .coalesce(1).write.parquet(s"$src/f$f")
      Thread.sleep(5) // distinct mod times → deterministic file order
    }
    src
  }

  private def stream(src: String) =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")

  private def outIds(path: String): Seq[Long] =
    spark.read.parquet(path).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("task retry: first-attempt failures converge to the exact source rows") {
    ChaosInjector.reset()
    val src = makeSource()
    val work = java.nio.file.Files.createTempDirectory("chaos1").toString
    // poison: ids ≡ 3 (mod 17) fail on task attempt 0 only
    val poisoned = stream(src).map { row =>
      val id = row.getLong(0)
      if (ChaosInjector.armed && id % 17 == 3 && TaskContext.get().attemptNumber() == 0) {
        ChaosInjector.fired.incrementAndGet()
        throw new RuntimeException(s"injected first-attempt failure at id=$id")
      }
      id
    }(Encoders.scalaLong).toDF("id")
    ChaosInjector.armed = true
    try {
      val q = poisoned.writeStream.format("parquet")
        .option("path", s"$work/out").option("checkpointLocation", s"$work/ck")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish")
    } finally ChaosInjector.armed = false
    assert(ChaosInjector.fired.get() > 0, "the injection must actually fire")
    assert(outIds(s"$work/out") == (0L until 100L), "retries must lose and duplicate nothing")
  }

  test("crash mid-stream, restart from checkpoint: committed batches do not replay") {
    ChaosInjector.reset()
    val src = makeSource()
    val work = java.nio.file.Files.createTempDirectory("chaos2").toString
    // poison: id 57 (file 2) fails EVERY attempt while armed → query dies
    def piped = stream(src).map { row =>
      val id = row.getLong(0)
      if (ChaosInjector.armed && id == 57L) {
        ChaosInjector.fired.incrementAndGet()
        throw new RuntimeException("injected poison batch")
      }
      id
    }(Encoders.scalaLong).toDF("id")
    def run() = {
      val q = piped.writeStream.format("parquet")
        .option("path", s"$work/out").option("checkpointLocation", s"$work/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    ChaosInjector.armed = true
    val boom = intercept[StreamingQueryException](run())
    ChaosInjector.armed = false
    assert(boom.getMessage.contains("injected poison") ||
      Option(boom.getCause).exists(_.getMessage.contains("injected poison")))
    assert(ChaosInjector.fired.get() >= 1)
    // recovery: same checkpoint, poison disarmed — the failed batch (and
    // only the uncommitted work) reruns
    assert(run(), "recovery run did not finish")
    assert(outIds(s"$work/out") == (0L until 100L),
      "restart must neither lose the failed batch nor replay committed ones")
  }

  test("foreachBatch append sink: crash after write, restart — distinct collapses the documented duplication") {
    ChaosInjector.reset()
    val src = makeSource()
    val work = java.nio.file.Files.createTempDirectory("chaos3").toString
    val outDir = s"$work/out"
    def run() = {
      val q = stream(src).writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the st11/st12 composition: deterministic per-batch derivation
          // appended as plain parquet (non-transactional)
          val derived = batch.select(col("id"), (col("id") * 2).as("doubled"))
          if (!derived.isEmpty) derived.write.mode("append").parquet(outDir)
          // crash AFTER the write, BEFORE the checkpoint commit
          if (ChaosInjector.armed &&
              batch.filter(col("id") === 57L).limit(1).count() == 1) {
            ChaosInjector.fired.incrementAndGet()
            throw new RuntimeException("injected post-write crash")
          }
          ()
        }
        .option("checkpointLocation", s"$work/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    ChaosInjector.armed = true
    intercept[StreamingQueryException](run())
    ChaosInjector.armed = false
    assert(ChaosInjector.fired.get() >= 1)
    assert(run(), "recovery run did not finish")
    val raw = spark.read.parquet(outDir)
    // the crashed batch's rows are on disk TWICE (written, uncommitted,
    // rewritten on replay) — the duplication the contract expects…
    assert(raw.count() > 100, "the crashed batch must have double-written (else nothing was tested)")
    // …and the deterministic derivation + distinct yields effectively-once
    val collapsed = raw.distinct().orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(collapsed == (0L until 100L).map(i => (i, i * 2)),
      "distinct over the deterministic derivation must equal the one-shot answer")
  }

  test("delta sink: crash AFTER the batch write, restart — the txn gate makes replay a no-op") {
    // the st13 shape under the SAME crash window as the test above: the
    // batch's Delta commit lands, the crash hits before Spark's
    // checkpoint commit, and the restart re-delivers the batchId. The
    // per-batch txn action must turn that replay into a no-op — the
    // PLAIN read (no distinct) equals the source exactly.
    import graft.stac.PortableDelta
    ChaosInjector.reset()
    val src = makeSource()
    val work = java.nio.file.Files.createTempDirectory("chaos4").toString
    val tbl = s"$work/tbl"
    def run() = {
      val q = stream(src).writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          PortableDelta.write(batch, tbl, mode = "append",
            txn = Some(("chaos4", batchId)))
          // crash AFTER the Delta commit, BEFORE the checkpoint commit
          if (ChaosInjector.armed &&
              batch.filter(col("id") === 57L).limit(1).count() == 1) {
            ChaosInjector.fired.incrementAndGet()
            throw new RuntimeException("injected post-commit crash")
          }
          ()
        }
        .option("checkpointLocation", s"$work/ck")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    ChaosInjector.armed = true
    intercept[StreamingQueryException](run())
    ChaosInjector.armed = false
    assert(ChaosInjector.fired.get() >= 1)
    assert(run(), "recovery run did not finish")
    // no distinct, no dedup: the log itself is exactly-once
    val got = PortableDelta.readTable(spark, tbl)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 100L),
      "plain Delta read after crash+replay must equal the source exactly")
    // the watermark reached the last batch and every batch has one txn
    val snap = PortableDelta.snapshot(spark.sessionState.newHadoopConf(), tbl)
    assert(snap.txns("chaos4") == 3L, s"txn watermark: ${snap.txns}")
  }
}
