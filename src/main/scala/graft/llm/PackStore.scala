package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted training-batch placements artifact — the output of
  * [[Corpus.packSequences]]/[[Corpus.packSequencesAppend]] (doc_id,
  * shard, seq_idx, tok_offset, …) as a store with the full artifact
  * contract ([[BandStore]]'s sidecar discipline + [[IndexStore]]'s
  * segment discipline) AND an explicit takedown answer for data that is
  * by design immutable:
  *
  * **Sealed sequences never move — takedown is a TOMBSTONE the loader
  * consults.** A packed sequence is a training artifact other docs'
  * placements refer into (their (seq_idx, tok_offset) positions are
  * only meaningful inside the sealed layout), so removing one doc must
  * not re-pack its neighbors. Instead, [[tombstone]] lands the doc-id
  * list as a committed segment of `tombstones/`, and [[serve]] — THE
  * loader view — anti-joins placements against the tombstone union:
  * the dead doc's token span simply pads its sequence, every surviving
  * placement byte-identical to before the takedown. [[compact]] later
  * folds the physical files (drops tombstoned rows, merges segments,
  * clears the tombstone table) in a maintenance window; serving
  * correctness never waits for it. This is the pipelined analog of the
  * reference's drop discipline (ref: workflows/ai.py:232-237 `-D` drop
  * mode; immutable-artifact retention, docs/ai-etc/README.md:66-71).
  *
  * Crash-safety: placements and tombstones both use the shared
  * segmented-table discipline ([[ArtifactStore.appendSegment]] — whole
  * directory written invisibly, `_SUCCESS`-verified, promoted by ONE
  * rename), full rewrites go through the whole-unit crash-safe swap,
  * and the parameter sidecar refuses a drifted (numShards,
  * budgetTokens) pairing loudly ([[Corpus.packSequencesAppend]]'s own
  * watermark guard, enforced again at the artifact boundary).
  */
object PackStore {

  /** The pack-scheme fingerprint of a placements artifact. */
  case class Params(numShards: Int, budgetTokens: Int) {
    require(numShards > 0 && budgetTokens > 0,
      s"PackStore.Params: positive shards/budget required " +
        s"($numShards, $budgetTokens)")
    def render: String =
      s"""{"numShards":$numShards,"budgetTokens":$budgetTokens}"""
  }

  private val Sidecar = ArtifactStore.Sidecar
  private val PlacementsDir = "placements"
  private val TombstonesDir = "tombstones"
  private val RequiredCols = Seq("doc_id", "shard", "seq_idx", "tok_offset")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    ArtifactStore.fs(spark, dir)

  private def requireShape(placements: DataFrame, op: String): Unit =
    require(RequiredCols.forall(placements.columns.contains),
      s"PackStore.$op: placements need columns " +
        s"${RequiredCols.mkString(", ")}; got " +
        placements.columns.mkString(", "))

  /** Persist a full pack run (overwrite) with its sidecar. Any prior
    * tombstones are dropped — a fresh build contains no dead docs. */
  def write(placements: DataFrame, dir: String, params: Params): Unit = {
    requireShape(placements, "write")
    val spark = placements.sparkSession
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    ArtifactStore.cleanStaleTmps(f, dir, PlacementsDir)
    val tmp = ArtifactStore.newTmpPath(dir, PlacementsDir)
    placements.write.mode("overwrite").parquet(tmp.toString)
    ArtifactStore.commitSwap(f, dir, PlacementsDir, tmp, Nil,
      "PackStore", "write")
    f.delete(new Path(dir, TombstonesDir), true)
    ArtifactStore.writeSidecar(f, new Path(dir, Sidecar), params.render)
  }

  /** Append a nightly increment's placements (produced by
    * [[Corpus.packSequencesAppend]] against this artifact's own
    * watermark) as a committed segment — O(increment), the standing
    * placements never rewritten. Refuses on pack-scheme drift. */
  def append(placements: DataFrame, dir: String, params: Params): Unit = {
    requireShape(placements, "append")
    val spark = placements.sparkSession
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "append")
    ArtifactStore.appendSegment(f, new Path(dir, PlacementsDir),
      placements, "PackStore")
  }

  /** Land a takedown list (first column = doc ids) as a committed
    * tombstone segment. O(list): nothing is rewritten, the loader
    * ([[serve]]) stops emitting the doc's placements at the next read.
    * Idempotent — tombstoning an already-dead or absent id is a
    * no-op in every downstream view. */
  def tombstone(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    val key = ids.columns.head
    ArtifactStore.appendSegment(f, new Path(dir, TombstonesDir),
      ids.select(col(key).cast("long").as("doc_id")).distinct(),
      "PackStore")
  }

  /** The RAW committed placements union (maintenance view — includes
    * tombstoned docs). Loaders use [[serve]]. */
  def readPlacements(spark: SparkSession, dir: String,
                     params: Params): DataFrame = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    requireParams(spark, dir, params, "read")
    ArtifactStore.requireCommitted(f, dir, PlacementsDir, Nil, "PackStore")
    ArtifactStore.readSegmented(spark, f, new Path(dir, PlacementsDir))
  }

  /** The committed tombstone union (doc_id). Empty before the first
    * takedown. */
  def readTombstones(spark: SparkSession, dir: String): DataFrame =
    ArtifactStore.readSegmented(spark, fs(spark, dir),
      new Path(dir, TombstonesDir),
      schema = Some(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType)))),
      allowMissing = true)

  /** THE loader view: placements minus tombstoned docs. Tombstones are
    * takedown lists — tiny by nature — so the anti-join broadcasts;
    * surviving placements are byte-identical to before any takedown
    * (sealed sequences never re-pack; a dead doc's span is padding). */
  def serve(spark: SparkSession, dir: String, params: Params): DataFrame =
    readPlacements(spark, dir, params)
      .join(broadcast(readTombstones(spark, dir)), Seq("doc_id"),
        "left_anti")

  /** Maintenance-window fold: rewrite the placements union minus the
    * tombstoned docs as one fresh base (whole-unit crash-safe swap),
    * then clear the tombstone table. Surviving rows are preserved
    * VERBATIM — compaction changes which files hold a placement, never
    * the placement. A crash between the swap and the tombstone clear
    * is harmless: re-applying tombstones to already-filtered
    * placements is a no-op (the anti-join is idempotent). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val params = readParams(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"PackStore: no artifact at $dir (missing $Sidecar)"))
    val kept = serve(spark, dir, params)
    val f = fs(spark, dir)
    ArtifactStore.cleanStaleTmps(f, dir, PlacementsDir)
    val tmp = ArtifactStore.newTmpPath(dir, PlacementsDir)
    kept.write.mode("overwrite").parquet(tmp.toString)
    ArtifactStore.commitSwap(f, dir, PlacementsDir, tmp, Nil,
      "PackStore", "compact")
    f.delete(new Path(dir, TombstonesDir), true)
  }

  /** The stored parameters, or None when no artifact exists. */
  def readParams(spark: SparkSession, dir: String): Option[Params] =
    ArtifactStore.readSidecarText(fs(spark, dir), dir).map { text =>
      Params(
        ArtifactStore.intField(text, "numShards", "PackStore", dir),
        ArtifactStore.intField(text, "budgetTokens", "PackStore", dir))
    }

  private def recoverSwap(f: FileSystem, dir: String): Unit =
    ArtifactStore.recoverSwap(f, dir, PlacementsDir, Nil, "PackStore")

  private def requireParams(spark: SparkSession, dir: String,
                            expected: Params, op: String): Unit =
    readParams(spark, dir) match {
      case None =>
        throw new IllegalStateException(
          s"PackStore.$op: no $Sidecar sidecar at $dir — refusing to " +
            "touch a placements artifact whose pack scheme is unknown " +
            "(a drifted budget overlaps sealed sequences)")
      case Some(stored) if stored != expected =>
        throw new IllegalStateException(
          s"PackStore.$op: parameter mismatch at $dir — artifact packed " +
            s"with ${stored.render}, caller expects ${expected.render}")
      case _ => ()
    }
}
