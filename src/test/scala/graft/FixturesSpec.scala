package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Fixtures

/** The fixture-cache publication contract: atomic, race-tolerant,
  * version-stamped. */
class FixturesSpec extends AnyFunSuite {

  test("publish moves the temp dir into place") {
    val base = Files.createTempDirectory("fixspec")
    val tmp = base.resolve("t")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("f"), "x")
    val target = base.resolve("out")
    Fixtures.publish(tmp, target)
    assert(Files.exists(target.resolve("f")) && !Files.exists(tmp))
  }

  test("losing the publication race keeps the winner and drops the loser") {
    val base = Files.createTempDirectory("fixspec")
    val target = base.resolve("out")
    Files.createDirectories(target)
    Files.writeString(target.resolve("winner"), "w")
    val tmp = base.resolve("t")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("loser"), "l")
    Fixtures.publish(tmp, target) // must not throw
    assert(Files.exists(target.resolve("winner")))
    assert(!Files.exists(tmp)) // loser cleaned up
  }

  test("stampedDir varies with builder logic version") {
    val d = "/root/testdata/sf0.001"
    val v1 = Fixtures.stampedDir(d, "documents", "spec", 1)
    val v2 = Fixtures.stampedDir(d, "documents", "spec", 2)
    assert(v1 != v2)
    Fixtures.deleteRecursively(v1)
    Fixtures.deleteRecursively(v2)
  }
}
