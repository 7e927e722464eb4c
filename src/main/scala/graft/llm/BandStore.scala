package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted MinHash band-table artifact of the incremental dedup
  * path ([[Dedup.minhashBandTable]] rows: one (doc, band, bucket) per
  * document per band), with its parameter contract ENFORCED instead of
  * documented: the artifact is only correct to join against when the
  * reader uses the exact (shingleN, bands, rowsPerBand, portable) it
  * was built with — a mismatched hash family makes the (band, bucket)
  * candidate join match nothing and increment-vs-corpus pairs silently
  * vanish, which in the nightly job this path exists for is an
  * undetectable wrong answer.
  *
  * So every write drops a `_params.json` sidecar next to the parquet
  * data, and [[read]] refuses to hand back a frame unless the caller's
  * parameters match the sidecar (loud `IllegalStateException`, in the
  * reference's own runtime-assertion culture — ref workflows/ai.py:150).
  * [[append]] (the nightly increment append) checks the same contract
  * before adding rows. All filesystem access goes through the Hadoop
  * FileSystem API so the artifact can live on HDFS/object storage.
  *
  * For the shuffle-free (band, bucket) join layout at cluster scale,
  * feed [[read]]'s result through [[graft.pipeline.Bucketing]] — this
  * store owns the artifact's correctness contract, Bucketing its
  * physical layout. */
object BandStore {

  /** The hash-family fingerprint of a band-table artifact. */
  case class Params(shingleN: Int, bands: Int, rowsPerBand: Int,
                    portable: Boolean) {
    def render: String =
      s"""{"shingleN":$shingleN,"bands":$bands,""" +
        s""""rowsPerBand":$rowsPerBand,"portable":$portable}"""
  }

  private val Sidecar = ArtifactStore.Sidecar
  private val DataDir = "data"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    ArtifactStore.fs(spark, dir)

  /** Build the band table for `docs` and persist it (overwrite) with
    * its parameter sidecar. */
  def build(docs: DataFrame, id: String, text: String, dir: String,
            params: Params): Unit = {
    val bt = Dedup.minhashBandTable(docs, id, text, params.shingleN,
      params.bands, params.rowsPerBand, params.portable)
    write(bt, dir, params)
  }

  /** Persist an already-computed band table (overwrite) with its
    * sidecar. The caller asserts `bands` was produced with `params`. */
  def write(bands: DataFrame, dir: String, params: Params): Unit = {
    val spark = bands.sparkSession
    bands.write.mode("overwrite").parquet(s"$dir/$DataDir")
    writeSidecar(fs(spark, dir), new Path(dir, Sidecar), params)
  }

  /** Append the increment's band rows after a nightly pairing run —
    * the "corpus is never re-signed" half of the incremental contract.
    * Refuses on parameter mismatch (appending rows from a different
    * hash family would poison every later run).
    *
    * Crash-atomic via [[IndexStore]]'s segment discipline: the
    * increment is fully written as its own parquet directory under a
    * temp name inside `data/` (invisible to [[read]]), `_SUCCESS`-
    * verified, then promoted with ONE rename to a committed `inc_*`
    * segment. A killed append leaves only an un-promoted temp — never
    * partially-committed part files that the previous base `_SUCCESS`
    * would vouch for (the torn state a bare `mode("append")` into the
    * live directory could produce). Readers see the old segment set or
    * old+new, never a mix. */
  def append(increment: DataFrame, id: String, text: String, dir: String,
             params: Params): Unit = {
    val spark = increment.sparkSession
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "append")
    ArtifactStore.appendSegment(f, new Path(dir, DataDir),
      Dedup.minhashBandTable(increment, id, text, params.shingleN,
        params.bands, params.rowsPerBand, params.portable),
      "BandStore")
  }

  /** The artifact, verified against the caller's parameters — the only
    * sanctioned way to obtain a `corpusBands` frame for
    * [[Dedup.minhashLshPairsIncremental]]. The frame is the union of
    * the flat base table and every committed `inc_*` append segment;
    * un-promoted `_tmp_inc_*` builds are invisible. */
  def read(spark: SparkSession, dir: String, params: Params): DataFrame = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "read")
    // Torn-component refusal: a band table truncated out-of-band
    // would silently drop candidate pairs for the missing docs. The
    // base's _SUCCESS genuinely vouches for the base now that appends
    // land as their own committed segments instead of loose part files.
    ArtifactStore.requireCommitted(f, dir, DataDir, Nil, "BandStore")
    ArtifactStore.readSegmented(spark, f, new Path(dir, DataDir))
  }

  /** Complete a [[delete]] swap interrupted by a crash — the shared
    * [[ArtifactStore.recoverSwap]] discipline: a unique-named temp is
    * only ever promoted when its `_SUCCESS` marker proves the rewrite
    * committed, restoring `_old_data` otherwise, and a reader never
    * deletes a temp (a concurrent maintenance run may be mid-write in
    * one). Idempotent; called by every entry point. */
  private def recoverSwap(f: FileSystem, dir: String): Unit =
    ArtifactStore.recoverSwap(f, dir, DataDir, Nil, "BandStore")

  /** Write the sidecar if absent, verify it otherwise — the contract
    * entry point for append-style band stores that grow under a fixed
    * hash family (e.g. [[graft.streaming.StreamingDedup]]'s per-batch
    * band dirs, where the data layout is the store's own but the
    * parameter contract is this one). */
  def ensureParams(spark: SparkSession, dir: String,
                   params: Params): Unit =
    readParams(spark, dir) match {
      case None =>
        val f = fs(spark, dir)
        f.mkdirs(new Path(dir))
        writeSidecar(f, new Path(dir, Sidecar), params)
      case Some(stored) if stored != params =>
        throw new IllegalStateException(
          s"BandStore.ensureParams: store at $dir was built with " +
            s"${stored.render}, caller uses ${params.render} — a mixed " +
            "hash family silently drops pairs")
      case _ => ()
    }

  /** The stored parameters, or None when no artifact exists. */
  def readParams(spark: SparkSession, dir: String): Option[Params] =
    ArtifactStore.readSidecarText(fs(spark, dir), dir).map { text =>
      def intOf(k: String): Int =
        ArtifactStore.intField(text, k, "BandStore", dir)
      Params(intOf("shingleN"), intOf("bands"), intOf("rowsPerBand"),
        ArtifactStore.boolField(text, "portable", "BandStore", dir))
    }

  /** Remove `ids` (first column) from the artifact — the takedown path.
    * Rewrites the data dir via a write-rename-rename-delete swap whose
    * every crash point [[recoverSwap]] can complete (the rewrite is
    * fully written before the live dir moves aside — never a window
    * where the artifact is lost); the params sidecar is untouched
    * (deletion never changes the hash family). Not concurrency-safe
    * against a running reader — run it in the same maintenance window
    * as [[CorpusStore.compact]]. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val params = readParams(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"BandStore: no artifact at $dir (missing $Sidecar)"))
    val key = ids.columns.head
    val kept = read(spark, dir, params)
      .join(broadcast(ids.select(col(key).as("doc")).distinct()),
        Seq("doc"), "left_anti")
    val f = fs(spark, dir)
    ArtifactStore.cleanStaleTmps(f, dir, DataDir)
    val tmp = ArtifactStore.newTmpPath(dir, DataDir)
    kept.write.mode("overwrite").parquet(tmp.toString)
    ArtifactStore.commitSwap(f, dir, DataDir, tmp, Nil, "BandStore",
      "delete")
  }

  private def writeSidecar(f: FileSystem, p: Path, params: Params): Unit =
    ArtifactStore.writeSidecar(f, p, params.render)

  private def requireParams(spark: SparkSession, dir: String,
                            expected: Params, op: String): Unit =
    readParams(spark, dir) match {
      case None =>
        throw new IllegalStateException(
          s"BandStore.$op: no $Sidecar sidecar at $dir — refusing to " +
            "use an artifact whose hash family is unknown (a mismatch " +
            "makes the candidate join silently empty)")
      case Some(stored) if stored != expected =>
        throw new IllegalStateException(
          s"BandStore.$op: parameter mismatch at $dir — artifact built " +
            s"with ${stored.render}, caller expects ${expected.render}; " +
            "joining across hash families yields zero candidates and " +
            "silently drops every pair")
      case _ => ()
    }
}
