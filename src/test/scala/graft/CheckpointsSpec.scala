package graft

import org.scalatest.funsuite.AnyFunSuite

/** The config-driven lineage-truncation seam: unset → localCheckpoint
  * (no directory touched); `spark.graft.checkpoint.dir` set → durable
  * checkpoint files under that dir. Rows identical either way. */
class CheckpointsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("truncate dispatches on spark.graft.checkpoint.dir") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

    // Default: local checkpoint, nothing written anywhere.
    assert(spark.conf.get(Checkpoints.DirConf, "") == "")
    val local = Checkpoints.truncate(df)
    assert(local.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

    // Conf set: blocks land under the durable dir.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    try {
      spark.conf.set(Checkpoints.DirConf, "file:" + dir.toString)
      val durable = Checkpoints.truncate(df)
      assert(durable.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
      val wrote = java.nio.file.Files.walk(dir).iterator()
      var files = 0
      while (wrote.hasNext) {
        if (java.nio.file.Files.isRegularFile(wrote.next())) files += 1
      }
      assert(files > 0, "durable checkpoint wrote no files")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      queries.Fixtures.deleteRecursively(dir)
    }
  }
}
