package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The nio checkpoint manager carries streaming exactly-once commit
  * semantics (atomic rename-into-place, no partial file ever visible,
  * no-overwrite conflict detection) — pinned directly here; end-to-end
  * use is covered by every stream_* query (the deployment session
  * installs the manager via checkpointFileManagerClass).
  */
class LocalNioCheckpointFileManagerSpec extends AnyFunSuite {

  private def mk(): (LocalNioCheckpointFileManager, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckmgr").toFile
    (new LocalNioCheckpointFileManager(
      new Path(dir.getAbsolutePath), new Configuration()), dir)
  }

  test("createAtomic commits on close, leaves nothing on cancel") {
    val (m, dir) = mk()
    val p = new Path(dir.getAbsolutePath, "offsets/0")
    val out = m.createAtomic(p, overwriteIfPossible = false)
    out.write("v1\n{\"batch\":0}".getBytes("UTF-8"))
    assert(!m.exists(p), "file visible before close — commit is not atomic")
    out.close()
    assert(m.exists(p))
    val in = m.open(p)
    val buf = new Array[Byte](64)
    val n = in.read(buf, 0, buf.length)
    in.close()
    assert(new String(buf, 0, n, "UTF-8").startsWith("v1"))

    val c = m.createAtomic(new Path(dir.getAbsolutePath, "offsets/1"), false)
    c.write("junk".getBytes("UTF-8"))
    c.cancel()
    assert(!m.exists(new Path(dir.getAbsolutePath, "offsets/1")))
    // no temp litter either — the offsets dir holds exactly the committed file
    assert(new java.io.File(dir, "offsets").list().toSeq == Seq("0"))
  }

  test("no-overwrite close fails when the destination already exists") {
    val (m, dir) = mk()
    val p = new Path(dir.getAbsolutePath, "commits/0")
    val a = m.createAtomic(p, overwriteIfPossible = false)
    a.write("first".getBytes("UTF-8")); a.close()
    val b = m.createAtomic(p, overwriteIfPossible = false)
    b.write("second".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { b.close() }
    val in = m.open(p)
    val buf = new Array[Byte](16)
    val n = in.read(buf, 0, buf.length)
    in.close()
    assert(new String(buf, 0, n, "UTF-8") == "first") // loser never clobbers
    val c = m.createAtomic(p, overwriteIfPossible = true)
    c.write("third".getBytes("UTF-8")); c.close() // overwrite path succeeds
  }

  test("list returns children with usable names; positioned read works") {
    val (m, dir) = mk()
    for (i <- 0 until 3) {
      val o = m.createAtomic(new Path(dir.getAbsolutePath, s"state/$i.delta"), false)
      o.write(Array.fill[Byte](16)(i.toByte)); o.close()
    }
    val names = m.list(new Path(dir.getAbsolutePath, "state"))
      .map(_.getPath.getName).sorted.toSeq
    assert(names == Seq("0.delta", "1.delta", "2.delta"))
    val filtered = m.list(new Path(dir.getAbsolutePath, "state"),
      p => p.getName.startsWith("1"))
    assert(filtered.map(_.getPath.getName).toSeq == Seq("1.delta"))
    val in = m.open(new Path(dir.getAbsolutePath, "state/2.delta"))
    val buf = new Array[Byte](4)
    in.readFully(12L, buf) // positioned read past a seek point
    assert(buf.toSeq == Seq[Byte](2, 2, 2, 2))
    in.seek(8L); assert(in.getPos == 8L)
    in.close()
    intercept[java.io.FileNotFoundException] {
      m.list(new Path(dir.getAbsolutePath, "absent"))
    }
  }

  test("non-file schemes are rejected loudly") {
    intercept[IllegalArgumentException] {
      new LocalNioCheckpointFileManager(
        new Path("hdfs://nn/ck"), new Configuration())
    }
  }
}
