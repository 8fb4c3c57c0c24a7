package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The COMMIT-ARBITRATION primitive every graft Delta write funnels
  * through. A Delta commit is one file (`_delta_log/NNN.json`) whose
  * creation must be atomic create-if-absent: of two writers racing
  * the same version, exactly one may win, the loser must observe the
  * loss, and a torn/partial commit file must be impossible.
  *
  * `fs.create(path, overwrite = false)` delivers that on HDFS and on
  * local filesystems (O_EXCL semantics) — but NOT on S3-class object
  * stores, where create-if-absent is not atomic and two PUTs can both
  * "succeed" with one silently replacing the other, orphaning the
  * loser's data files while its commit claims them. Real delta-spark
  * ships a pluggable LogStore for exactly this reason; graft mirrors
  * the shape: the store is resolved from
  * `spark.graft.delta.logStore` (a class name; default
  * [[HadoopAtomicLogStore]]), and an implementation for an object
  * store would route the arbitration through an external coordinator
  * (a conditional-put service, a lock table) while still writing the
  * file content itself.
  *
  * CONTRACT: `writeIfAbsent` returns true iff this writer atomically
  * created the file with the full content; false iff the path already
  * existed (a concurrent writer won — the caller surfaces the
  * conflict). Any other failure propagates. A store that CANNOT
  * honor the atomicity contract must say so via
  * `atomicPutIfAbsent = false` — graft then refuses to commit at all
  * rather than risk silent history corruption; a loud refusal beats a
  * lost commit every time.
  */
trait GraftLogStore {
  /** Whether this store's `writeIfAbsent` is truly atomic
    * create-if-absent. A `false` here makes every commit refuse
    * loudly — the honest answer for a bare S3-style store with no
    * coordinator.
    */
  def atomicPutIfAbsent: Boolean

  /** Atomically create `path` holding exactly `content` iff absent.
    * True = this writer won; false = the path already existed.
    */
  def writeIfAbsent(fs: FileSystem, path: Path, content: Array[Byte]): Boolean
}

/** The default store: Hadoop `create(path, overwrite = false)`, atomic
  * on HDFS and local filesystems.
  */
object HadoopAtomicLogStore extends GraftLogStore {
  override def atomicPutIfAbsent: Boolean = true

  override def writeIfAbsent(fs: FileSystem, path: Path,
                             content: Array[Byte]): Boolean = {
    val out =
      try fs.create(path, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case e: java.io.IOException if fs.exists(path) => return false
        // a create failure with the path still absent is a real IO
        // problem, not a lost race — propagate it
      }
    try out.write(content) finally out.close()
    true
  }
}

object GraftLogStore {
  @volatile private var cached: (String, GraftLogStore) = ("", HadoopAtomicLogStore)

  /** The session's configured store (`spark.graft.delta.logStore`
    * class name, default [[HadoopAtomicLogStore]]); instances are
    * resolved reflectively (object MODULE$ or no-arg class) and
    * cached per class name.
    */
  def resolve(spark: SparkSession): GraftLogStore = {
    val name = spark.conf.get("spark.graft.delta.logStore",
      HadoopAtomicLogStore.getClass.getName)
    val (cn, inst) = cached
    if (cn == name) inst
    else {
      val resolved =
        if (name == HadoopAtomicLogStore.getClass.getName ||
            name == HadoopAtomicLogStore.getClass.getName.stripSuffix("$"))
          HadoopAtomicLogStore
        else instantiate(name)
      cached = (name, resolved)
      resolved
    }
  }

  /** A scala `object FQCN` (with or without the trailing `$`) or a
    * no-arg class implementing [[GraftLogStore]].
    */
  private def instantiate(name: String): GraftLogStore = {
    def load(n: String): Option[Class[_]] =
      try Some(Class.forName(n, true, Thread.currentThread().getContextClassLoader))
      catch { case _: ClassNotFoundException => None }
    val asObject = load(if (name.endsWith("$")) name else name + "$").flatMap { c =>
      try c.getField("MODULE$").get(null) match {
        case s: GraftLogStore => Some(s)
        case _ => None // a companion object that isn't itself a store
      }
      catch { case _: NoSuchFieldException => None }
    }
    asObject
      .orElse(load(name.stripSuffix("$")).map(
        _.getDeclaredConstructor().newInstance().asInstanceOf[GraftLogStore]))
      .getOrElse(throw new IllegalArgumentException(
        s"spark.graft.delta.logStore '$name' is not a loadable GraftLogStore"))
  }

  /** Write one commit file through the session's store; on a lost
    * race throw the caller's conflict message (the retryOnConflict /
    * rebase machinery keys on IllegalStateException). Refuses — before
    * writing anything — when the store declares it cannot arbitrate.
    */
  def commitOrThrow(spark: SparkSession, fs: FileSystem, path: Path,
                    content: Array[Byte], retryHint: String,
                    ictConf: Map[String, String] = Map.empty,
                    crcReplaced: Seq[Long] = Nil): Unit = {
    val store = resolve(spark)
    requireAtomic(store)
    val stamped = LakeWriter.ictStampContent(spark, fs, path, ictConf,
      LakeWriter.injectOperationMetrics(content))
    if (!store.writeIfAbsent(fs, path, stamped))
      throw new IllegalStateException(
        s"Delta commit $path already exists — a concurrent writer won; $retryHint")
    // version checksum rides every commit (best-effort: the commit
    // above is durable; a failed .crc writes nothing). crcReplaced:
    // the previous sizes of adds that REPLACE a live path without a
    // paired remove (last-writer-wins re-adds — the backfill/restore
    // shapes), which the incremental fold must subtract.
    LakeWriter.writeVersionChecksum(fs, path, stamped, crcReplaced)
    // `delta.checkpointInterval` cadence rides EVERY commit through
    // this funnel (mutations, DV ops, merges, protocol changes), not
    // just appends — a mutation-heavy table must bound its replay
    // suffix too. Best-effort by contract: the commit above is
    // durable, so a failed checkpoint must not fail the op
    // retroactively (the next commit on the cadence retries).
    LakeWriter.maybeCheckpointAtProperty(spark, path, ictConf)
  }

  def requireAtomic(store: GraftLogStore): Unit =
    require(store.atomicPutIfAbsent,
      s"log store ${store.getClass.getName} declares atomicPutIfAbsent=false — it " +
        "cannot arbitrate concurrent commits (two writers could both 'win' one " +
        "version, silently corrupting history). Configure a store with a real " +
        "coordinator via spark.graft.delta.logStore, or use an HDFS/local path. " +
        "Refusing to commit")
}
