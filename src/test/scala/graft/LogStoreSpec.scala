package graft

import graft.sources.{DeltaReader, GraftLogStore, HadoopAtomicLogStore, LakeWriter}
import org.apache.hadoop.fs.{FileSystem, Path}

/** A store that admits it cannot do atomic create-if-absent (a bare
  * S3-style PUT): every commit must refuse BEFORE writing anything.
  */
class NonAtomicTestStore extends GraftLogStore {
  override def atomicPutIfAbsent: Boolean = false
  override def writeIfAbsent(fs: FileSystem, path: Path,
                             content: Array[Byte]): Boolean =
    throw new IllegalStateException("must never be called — refused upstream")
}

/** A counting pass-through store proving the commit path actually
  * routes through the configured implementation.
  */
class CountingTestStore extends GraftLogStore {
  override def atomicPutIfAbsent: Boolean = true
  override def writeIfAbsent(fs: FileSystem, path: Path,
                             content: Array[Byte]): Boolean = {
    CountingTestStore.calls.incrementAndGet()
    HadoopAtomicLogStore.writeIfAbsent(fs, path, content)
  }
}
object CountingTestStore {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ls_$tag").resolve("t")
      .toAbsolutePath.toString

  private def withStore[T](name: String)(f: => T): T = {
    spark.conf.set("spark.graft.delta.logStore", name)
    try f finally spark.conf.unset("spark.graft.delta.logStore")
  }

  test("commits route through the configured store") {
    val d = freshDir("count")
    withStore(classOf[CountingTestStore].getName) {
      val before = CountingTestStore.calls.get()
      LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
      LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "s"), d)
      assert(CountingTestStore.calls.get() == before + 2)
    }
    assert(DeltaReader.read(spark, d).count() == 2)
  }

  test("a non-atomic store refuses every commit loudly, writing nothing") {
    val d = freshDir("nonatomic")
    withStore(classOf[NonAtomicTestStore].getName) {
      // the refusal may surface wrapped (writeDelta stages before the
      // commit path runs under Spark's command execution) — assert on
      // the message through the cause chain
      val e = intercept[Exception] {
        LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("atomicPutIfAbsent=false"), msgs)
      assert(msgs.contains("cannot arbitrate"), msgs)
    }
    // nothing committed: the directory is not a table
    val e2 = intercept[IllegalArgumentException] {
      DeltaReader.snapshot(spark, d, None)
    }
    assert(e2.getMessage.contains("not a Delta table"))
  }

  test("the default store arbitrates: second create of one version loses") {
    val d = freshDir("arb")
    LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
    val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    val v1 = new Path(new Path(d, "_delta_log"), f"${1L}%020d.json")
    assert(HadoopAtomicLogStore.writeIfAbsent(fs, v1, "{}".getBytes("UTF-8")))
    assert(!HadoopAtomicLogStore.writeIfAbsent(fs, v1, "{}".getBytes("UTF-8")))
    // the winner's content survives untouched
    val in = fs.open(v1)
    val content = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(content == "{}")
  }

  test("OCC append rebase runs through the store interface") {
    val d = freshDir("rebase")
    withStore(classOf[CountingTestStore].getName) {
      LakeWriter.writeDelta(Seq((1L, "a")).toDF("id", "s"), d)
      // simulate a winner at version 1 written behind our back, then a
      // stale append targeting version 1 rebases to 2 without re-running
      val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
      val snap0 = DeltaReader.snapshot(spark, d, None)
      assert(snap0.version == 0)
      LakeWriter.appendDelta(Seq((2L, "b")).toDF("id", "s"), d) // version 1
      LakeWriter.appendDelta(Seq((3L, "c")).toDF("id", "s"), d) // version 2
      assert(DeltaReader.read(spark, d).count() == 3)
      assert(fs.exists(new Path(new Path(d, "_delta_log"), f"${2L}%020d.json")))
    }
  }
}
