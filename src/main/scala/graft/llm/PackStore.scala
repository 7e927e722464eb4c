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
  private val BuildStamp = "_build.json"
  private val RequiredCols = Seq("doc_id", "shard", "seq_idx", "tok_offset")

  private def fs(spark: SparkSession, dir: String): FileSystem =
    ArtifactStore.fs(spark, dir)

  private def requireShape(placements: DataFrame, op: String): Unit =
    require(RequiredCols.forall(placements.columns.contains),
      s"PackStore.$op: placements need columns " +
        s"${RequiredCols.mkString(", ")}; got " +
        placements.columns.mkString(", "))

  /** Persist a full pack run (overwrite) with its sidecar. Any prior
    * tombstones are dropped — a fresh build contains no dead docs (the
    * caller builds from the already-takedown-filtered corpus).
    *
    * Crash window closed by the BUILD STAMP: each base carries a unique
    * build token (`placements/_build.json`, written into the temp so
    * the swap promotes data and token atomically), and every tombstone
    * segment is stamped with the token of the base it was filed
    * against ([[tombstone]]). [[readTombstones]] only applies segments
    * matching the CURRENT base's token, so a crash here between the
    * swap and the tombstones-dir delete leaves stale segments that are
    * already inert — the delete below is garbage collection, not
    * correctness. */
  def write(placements: DataFrame, dir: String, params: Params): Unit = {
    requireShape(placements, "write")
    val spark = placements.sparkSession
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    ArtifactStore.cleanStaleTmps(f, dir, PlacementsDir)
    val tmp = ArtifactStore.newTmpPath(dir, PlacementsDir)
    placements.write.mode("overwrite").parquet(tmp.toString)
    stampBuild(f, tmp)
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
    * no-op in every downstream view.
    *
    * A takedown must never SUCCEED as a silent no-op, so this mutator
    * carries the full artifact guard like every other: it refuses when
    * no committed artifact lives at `dir` (mistyped path), and refuses
    * ids whose cast to long yields null (a wrong-typed id column would
    * otherwise file an empty tombstone while the real doc keeps
    * serving). The takedown list is tiny by nature, so the null check
    * is one bounded action. */
  def tombstone(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val f = fs(spark, dir)
    recoverSwap(f, dir)
    if (readParams(spark, dir).isEmpty)
      throw new IllegalStateException(
        s"PackStore.tombstone: no $Sidecar sidecar at $dir — refusing " +
          "to file a takedown against a nonexistent placements artifact " +
          "(a mistyped dir would make the takedown a silent no-op while " +
          "the real artifact keeps serving the doc)")
    ArtifactStore.requireCommitted(f, dir, PlacementsDir, Nil, "PackStore")
    val token = readBuildToken(f, dir).getOrElse(
      throw new IllegalStateException(
        s"PackStore.tombstone: placements at $dir carry no build stamp " +
          s"($PlacementsDir/$BuildStamp) — artifact written by an older " +
          "layout; re-run write() or compact() before filing takedowns"))
    val key = ids.columns.head
    // try_cast, not cast: under ANSI mode a malformed id would throw an
    // opaque CAST_INVALID_INPUT mid-job; the explicit null count below
    // refuses the WHOLE list with the takedown-specific message either
    // way (and catches genuinely-null ids, which ANSI cast lets pass).
    val cast = ids.select(col(key).try_cast("long").as("doc_id")).distinct()
    val nulls = cast.filter(col("doc_id").isNull).count()
    require(nulls == 0,
      s"PackStore.tombstone: $nulls id(s) in column '$key' cast to " +
        "null — a non-numeric takedown id would silently not match any " +
        "placement; refusing the whole list so the takedown cannot " +
        "half-apply")
    ArtifactStore.appendSegment(f, new Path(dir, TombstonesDir),
      cast.withColumn("build", lit(token)), "PackStore")
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

  /** The committed tombstone union (doc_id) APPLICABLE to the current
    * base: segments stamped with a different build token were filed
    * against a base that has since been fully rebuilt/compacted — a
    * fresh build contains no dead docs, so they are inert (the
    * write-crash-window fix; see [[write]]). Empty before the first
    * takedown. Loud, not silent, on a stamp-less base with tombstones
    * present: dropping a takedown because the layout predates the
    * stamp would over-serve. */
  def readTombstones(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("build",
        org.apache.spark.sql.types.StringType)))
    val all = ArtifactStore.readSegmented(spark, f,
      new Path(dir, TombstonesDir), schema = Some(schema),
      allowMissing = true)
    readBuildToken(f, dir) match {
      case Some(token) =>
        all.filter(col("build") === token).select("doc_id")
      case None =>
        if (!all.isEmpty)
          throw new IllegalStateException(
            s"PackStore: tombstone segments exist at $dir but the " +
              s"placements carry no build stamp " +
              s"($PlacementsDir/$BuildStamp) — cannot tell which base " +
              "the takedowns were filed against; re-run write() or " +
              "compact() (refusing to guess in either direction)")
        all.select("doc_id")
    }
  }

  /** THE loader view: placements minus tombstoned docs. Tombstones are
    * takedown lists — tiny by nature — so the anti-join broadcasts;
    * surviving placements are byte-identical to before any takedown
    * (sealed sequences never re-pack; a dead doc's span is padding). */
  def serve(spark: SparkSession, dir: String, params: Params): DataFrame =
    readPlacements(spark, dir, params)
      .join(broadcast(readTombstones(spark, dir)), Seq("doc_id"),
        "left_anti")

  /** Maintenance-window fold: rewrite the placements union minus the
    * tombstoned docs as one fresh base (whole-unit crash-safe swap,
    * fresh build stamp), then clear the tombstone table. Surviving
    * rows are preserved VERBATIM — compaction changes which files hold
    * a placement, never the placement. A crash between the swap and
    * the tombstone clear is harmless: the fresh base carries a new
    * build token, so the stale segments no longer apply (and
    * re-applying them would be a no-op anyway — the docs are gone).
    *
    * WHEN to compact — the trigger policy: [[serve]] anti-joins the
    * broadcast tombstone union on every read, so serve cost grows with
    * the tombstone COUNT (one broadcast hash probe per placement row
    * regardless, plus the build+broadcast of the union itself — see
    * ScaleCheck's packstore sweep for the measured curve). Compact in
    * the next maintenance window once [[tombstonedFraction]] exceeds
    * ~1% of placements (reclaims dead I/O) or the segment count
    * exceeds ~64 (bounds the union's small-file read fan-out) —
    * [[needsCompact]] encodes exactly that. The reference rebuilds its
    * immutable artifacts on the same periodic-maintenance discipline
    * (ref: docs/ai-etc/README.md:66-71). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val params = readParams(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"PackStore: no artifact at $dir (missing $Sidecar)"))
    val kept = serve(spark, dir, params)
    val f = fs(spark, dir)
    ArtifactStore.cleanStaleTmps(f, dir, PlacementsDir)
    val tmp = ArtifactStore.newTmpPath(dir, PlacementsDir)
    kept.write.mode("overwrite").parquet(tmp.toString)
    stampBuild(f, tmp)
    ArtifactStore.commitSwap(f, dir, PlacementsDir, tmp, Nil,
      "PackStore", "compact")
    f.delete(new Path(dir, TombstonesDir), true)
  }

  /** Fraction of committed placement rows currently tombstoned — the
    * compact-trigger metric (policy: see [[compact]]). Two bounded
    * count actions; a maintenance scheduler calls this between
    * windows, never on the serve path. */
  def tombstonedFraction(spark: SparkSession, dir: String,
                         params: Params): Double = {
    val total = readPlacements(spark, dir, params).count()
    if (total == 0) return 0.0
    val dead = readPlacements(spark, dir, params)
      .join(broadcast(readTombstones(spark, dir)), Seq("doc_id"),
        "left_semi").count()
    dead.toDouble / total
  }

  /** The documented compact trigger: tombstoned fraction above
    * `maxFraction` (default 1%) or more than `maxSegments` committed
    * tombstone segments (default 64). */
  def needsCompact(spark: SparkSession, dir: String, params: Params,
                   maxFraction: Double = 0.01,
                   maxSegments: Int = 64): Boolean = {
    val f = fs(spark, dir)
    val root = new Path(dir, TombstonesDir)
    val segs =
      if (!f.exists(root)) 0
      else f.listStatus(root).count(s =>
        s.getPath.getName.startsWith(ArtifactStore.SegIncPrefix) &&
          f.exists(new Path(s.getPath, "_SUCCESS")))
    segs > maxSegments ||
      (segs > 0 && tombstonedFraction(spark, dir, params) > maxFraction)
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

  /** Stamp a freshly-built placements temp with a unique build token —
    * promoted atomically with the data by the swap rename. The `_`
    * prefix keeps parquet readers from treating it as a part file. */
  private def stampBuild(f: FileSystem, tmp: Path): Unit = {
    val token = f"${System.currentTimeMillis}%013d" + "_" +
      java.util.UUID.randomUUID().toString.take(8)
    ArtifactStore.writeSidecar(f, new Path(tmp, BuildStamp),
      s"""{"build":${ArtifactStore.jsonString(token)}}""")
  }

  /** The live base's build token, or None for a stamp-less (pre-stamp
    * layout or missing) base. */
  private def readBuildToken(f: FileSystem, dir: String): Option[String] = {
    val p = new Path(new Path(dir, PlacementsDir), BuildStamp)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      ArtifactStore.stringOrNullField(new String(bytes, "UTF-8"), "build",
        "PackStore", dir)
    } finally in.close()
  }

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
