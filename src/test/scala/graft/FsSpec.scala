package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** `Fs.deleteRecursively` must tolerate a concurrent deleter of the
  * SAME tree: the reliable-checkpoint shutdown hook races Spark's own
  * ShutdownHookManager temp cleanup, and round 12's driver bench tail
  * ended with a NoSuchFileException stack from exactly that window
  * (a `.crc` vanished between the walk snapshot and its delete).
  */
class FsSpec extends AnyFunSuite {

  private def mkTree(files: Int): Path = {
    val root = Files.createTempDirectory("graft-fsspec")
    (0 until files).foreach { i =>
      val sub = root.resolve(s"d${i % 7}")
      Files.createDirectories(sub)
      Files.write(sub.resolve(s"f$i.crc"), Array[Byte](1, 2, 3))
    }
    root
  }

  test("deleteRecursively is a no-op on a missing path") {
    Fs.deleteRecursively(
      java.nio.file.Paths.get("/tmp/graft-fsspec-never-existed"))
  }

  test("deleteRecursively removes a populated tree") {
    val root = mkTree(40)
    Fs.deleteRecursively(root)
    assert(!Files.exists(root))
  }

  test("deleteRecursivelyVerified deletes a quiet tree and verifies") {
    val root = mkTree(25)
    Fs.deleteRecursivelyVerified(root)
    assert(!Files.exists(root))
    // and is a no-op (not an error) on an already-absent path
    Fs.deleteRecursivelyVerified(root)
  }

  test("deleteRecursivelyVerified throws when the tree survives") {
    // The DDL contract (DROP TABLE / DROP NAMESPACE / manifest
    // cleanup): reporting success while the directory survives makes
    // a later CREATE throw TableAlreadyExists spuriously. Force
    // survival with a re-creator thread that keeps repopulating the
    // tree faster than the two delete passes drain it. The race is
    // probabilistic per round, so retry a few rounds and require the
    // verified variant to have failed loud at least once.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    var threw = false
    var round = 0
    while (!threw && round < 8) {
      round += 1
      stop.set(false)
      val root = mkTree(10)
      val sub = root.resolve("keep")
      Files.createDirectories(sub)
      val racer = new Thread(() => {
        var i = 0
        while (!stop.get()) {
          try {
            Files.createDirectories(sub)
            Files.write(sub.resolve(s"r$i"), Array[Byte](1))
          } catch { case _: java.io.IOException => () }
          i += 1
        }
      })
      racer.start()
      try {
        Fs.deleteRecursivelyVerified(root)
      } catch {
        case _: java.io.IOException => threw = true
      } finally {
        stop.set(true)
        racer.join()
        Fs.deleteRecursively(root)
      }
    }
    assert(threw,
      "deleteRecursivelyVerified never failed loud across 8 rounds " +
        "of a surviving tree")
  }

  test("two concurrent deleters of one tree never throw") {
    // Probabilistic by nature, so repeat: each round builds a tree and
    // races two threads over it. Before the fix this threw
    // NoSuchFileException within a round or two.
    (1 to 20).foreach { _ =>
      val root = mkTree(120)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 2).map { _ =>
        new Thread(() =>
          try Fs.deleteRecursively(root)
          catch { case t: Throwable => errs.add(t) })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent delete threw: ${errs.peek()}")
      assert(!Files.exists(root))
    }
  }
}
