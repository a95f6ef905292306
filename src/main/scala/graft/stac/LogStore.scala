package graft.stac

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The PUT-IF-ABSENT seam of the commit protocol — the one operation
  * whose cross-process atomicity the Delta storage contract delegates
  * to the store (delta-spark's LogStore analog).
  *
  * [[PortableDelta.commit]] stages the commit JSON to a hidden temp
  * name and then publishes it as `_delta_log/<version>.json` through
  * THIS interface. The default ([[RenameLogStore]]) is the
  * exists-check + rename pair under a JVM-wide lock: exact
  * put-if-absent for same-JVM writers, and cross-process atomic on
  * filesystems whose rename refuses an existing destination (HDFS,
  * ABFS, GCS — the classic Delta storage contract). Object stores
  * without atomic rename (S3 without a coordination service) need an
  * external arbiter; that is exactly what this seam admits:
  *
  *   conf.set("spark.graft.delta.logStore.impl",
  *            "com.example.DynamoCoordinatedLogStore")
  *
  * names a zero-arg implementation class resolved per Hadoop
  * Configuration (so different tables/sessions may use different
  * stores). An implementation must return `true` only when `dest` was
  * createdatomically by THIS call and `false` when `dest` already
  * exists — returning false is the concurrent-commit signal every verb
  * rebases on. Never clobber an existing destination. */
trait GraftLogStore {

  /** Publish `tmp` as `dest` iff `dest` does not exist. True = this
    * call created `dest`; false = `dest` already existed (the caller
    * deletes `tmp` and rebases). Must never overwrite `dest`. */
  def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

/** The default store: exists-check + rename under a JVM-wide lock.
  * POSIX rename() silently overwrites an existing destination, so the
  * pair is locked for same-JVM writers (concurrent streams, the
  * two-writer spec); cross-process atomicity is the underlying
  * filesystem's Delta storage contract (HDFS rename fails on an
  * existing destination). */
final class RenameLogStore extends GraftLogStore {
  override def putIfAbsent(fs: FileSystem, tmp: Path, dest: Path): Boolean =
    RenameLogStore.lock.synchronized {
      if (fs.exists(dest)) false
      else fs.rename(tmp, dest)
    }
}

object RenameLogStore {
  private[stac] val lock = new Object
}

object GraftLogStore {

  /** Hadoop conf key naming the implementation class (zero-arg ctor).
    * Absent → [[RenameLogStore]]. */
  val ImplKey = "spark.graft.delta.logStore.impl"

  private val default = new RenameLogStore
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, GraftLogStore]()

  /** The store for this configuration — the default unless [[ImplKey]]
    * names a class. A misconfigured class fails LOUDLY at first commit
    * (falling back silently would forfeit the coordination the user
    * asked for — exactly the lost-update the seam exists to prevent). */
  def resolve(conf: Configuration): GraftLogStore =
    conf.get(ImplKey) match {
      case null | "" => default
      case cls => cache.computeIfAbsent(cls, c =>
        try Class.forName(c).getDeclaredConstructor()
          .newInstance().asInstanceOf[GraftLogStore]
        catch { case e: Exception => throw new IllegalArgumentException(
          s"$ImplKey names $c, which could not be instantiated as a " +
            s"GraftLogStore: ${e.getMessage}", e)
        })
    }
}
