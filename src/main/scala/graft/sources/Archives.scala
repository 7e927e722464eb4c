package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S6 — archive member scans without extraction: read zip/tar files
  * with Spark's binaryFile source and flatMap members out, mirroring
  * `unzip -l` / `unzippa -m` (sources/jstor.py:156-374) and the tarball
  * iteration (conversions.py:81-129).
  *
  * Scale shape: one task per archive file (binaryFile splits at file
  * granularity); member extraction is per-partition streaming over the
  * archive bytes, no temp files. Member lists and member contents are
  * plain DataFrames from there on.
  */
object Archives {

  case class Member(path: String, member: String, size: Long, content: Array[Byte])

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](64 * 1024)
    Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
      .foreach(n => buf.write(chunk, 0, n))
    buf.toByteArray
  }

  /** All members of every zip under `path` (glob ok). */
  def zipMembers(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { e =>
            val content = readAll(zin)
            Member(p, e.getName, content.length.toLong, content)
          }.toSeq
      }
      .toDF()
  }

  /** Member list only (`unzip -l` analog): no content materialized. */
  def zipMemberList(spark: SparkSession, path: String): DataFrame =
    zipMembers(spark, path).select("path", "member", "size")

  /** All members of every (optionally gzipped) tar under `path` —
    * S6's iterate-without-extraction (conversions.py:81-129). Uses the
    * commons-compress tar reader that ships with Spark. */
  def tarMembers(spark: SparkSession, path: String, gzipped: Boolean = true): DataFrame = {
    import spark.implicits._
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val raw = new ByteArrayInputStream(bytes)
        val tin = new TarArchiveInputStream(
          if (gzipped) new GZIPInputStream(raw) else raw)
        Iterator.continually(tin.getNextEntry).takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { e =>
            val content = readAll(tin)
            Member(p, e.getName, content.length.toLong, content)
          }.toSeq
      }
      .toDF()
  }

  /** Lines of text members of gzip files under `path` (`.ldj.gz`-style
    * artifacts), with file provenance (F13). */
  def gzipLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(l => (p, l)).toSeq
      }
      .toDF("path", "line")
  }
}
