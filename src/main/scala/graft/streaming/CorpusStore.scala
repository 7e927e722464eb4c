package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The streaming-dedup corpus store: one `run=<ns>_batch=<id>` parquet
  * subdir of (id, text) per committed micro-batch (written by
  * [[StreamingDedup]]), plus the maintenance operations a long-running
  * deployment needs — compaction (merge the per-batch dirs into one
  * consolidated generation) and deletion (remove a given id set, the
  * routine takedown path of a training-data pipeline).
  *
  * All filesystem access goes through `org.apache.hadoop.fs.FileSystem`
  * resolved from the session's Hadoop conf, so the store works wherever
  * a 100 TB corpus store can actually live (HDFS, object storage) —
  * batches are written via Spark/Hadoop, so listing them with
  * `java.io.File` would silently see an empty store on any non-local
  * default filesystem and drop every cross-batch pair.
  *
  * Layout and crash-safety:
  *  - batch members: `run=<hex-ns>_batch=<n>` (ns = the writing
  *    checkpoint's identity; see [[StreamingDedup]] for the replay
  *    semantics).
  *  - compacted generations: `run=compact_batch=<k>` — the reserved
  *    `compact` namespace can never collide with a checkpoint namespace
  *    (those are md5 hex). A generation is COMMITTED only once its
  *    manifest `_merged-<k>.json` (the list of member dirs it absorbed)
  *    exists; the manifest is created with an atomic create-no-overwrite,
  *    so at every crash point readers see exactly one copy of every
  *    document: data renamed but no manifest → the generation is
  *    invisible and its sources still count; manifest present → sources
  *    are excluded even if their dirs have not been deleted yet (deletes
  *    are best-effort cleanup, retried by the next compact()).
  *  - compacted rows carry `__run`/`__batch` provenance columns, so
  *    [[StreamingDedup]]'s replay exclusion (drop this run's batches ≥
  *    current batchId) keeps working on documents that have been
  *    compacted mid-stream.
  */
object CorpusStore {

  val CompactNs = "compact"
  private val Part = "run=([0-9a-z]+)_batch=([0-9]+)".r
  private val Manifest = "_merged-([0-9]+)\\.json".r
  private val RunCol = "__run"
  private val BatchCol = "__batch"

  /** One committed store member: its dir name, absolute path, and the
    * (ns, batch) parsed from the name. */
  case class Member(name: String, path: String, ns: String, batch: Long) {
    def isCompacted: Boolean = ns == CompactNs
  }

  def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Manifest entry recording a retention-expired run namespace (not a
    * dir name — the prefix keeps it disjoint from member names). */
  private val ExpiredPrefix = "expired="

  /** One consistent reading of the store's commit metadata: directory
    * entries, the committed generation ids (manifest present), the
    * union of every committed manifest's absorbed-member names, and the
    * union of every manifest's retention-expired run namespaces. The
    * single interpretation of the commit protocol — listMembers and
    * compact() must never disagree about which members exist. */
  private case class StoreState(
      entries: Seq[org.apache.hadoop.fs.FileStatus],
      committedGens: Set[Long], absorbed: Set[String],
      expired: Set[String])

  private def readState(fs: FileSystem, root: Path): StoreState = {
    if (!fs.exists(root))
      return StoreState(Seq.empty, Set.empty, Set.empty, Set.empty)
    val entries = fs.listStatus(root).toSeq
    val committedGens: Set[Long] = entries.collect {
      case st if !st.isDirectory => st.getPath.getName
    }.collect { case Manifest(k) => k.toLong }.toSet
    val manifestEntries: Set[String] = committedGens.flatMap(k =>
      readManifest(fs, new Path(root, s"_merged-$k.json")))
    StoreState(entries, committedGens,
      manifestEntries.filterNot(_.startsWith(ExpiredPrefix)),
      manifestEntries.collect {
        case e if e.startsWith(ExpiredPrefix) =>
          e.substring(ExpiredPrefix.length)
      })
  }

  /** All COMMITTED members of the store: members (raw batch dirs AND
    * earlier compacted generations alike) not absorbed by a committed
    * later compaction, plus compacted generations whose own manifest
    * exists. The absorbed check applies to compacted generations too —
    * a generation that a LATER committed compaction merged stays
    * excluded even if its dir outlives the (best-effort) delete, or
    * readers would see every document in it twice. Empty if the store
    * dir does not exist yet. */
  def listMembers(spark: SparkSession, dir: String): Seq[Member] = {
    val fs = fileSystem(spark, dir)
    val st = readState(fs, new Path(dir))
    st.entries
      .filter(_.isDirectory)
      .flatMap { e =>
        e.getPath.getName match {
          case n @ Part(ns, b) =>
            val m = Member(n, e.getPath.toString, ns, b.toLong)
            val committed = !st.absorbed.contains(n) &&
              (!m.isCompacted || st.committedGens.contains(m.batch))
            if (committed) Some(m) else None
          case _ => None
        }
      }
      .sortBy(m => (m.ns, m.batch))
  }

  /** Every original (ns, batch) identity that ever contributed to the
    * committed store, whether its raw dir still exists or a compaction
    * absorbed it: raw member names plus the union of all manifest
    * entries. Manifests are never deleted, so identities survive
    * arbitrary re-compaction; compacted generations' own names are
    * bookkeeping, not identities, and are excluded. Retention-expired
    * runs REMAIN identities (their manifests still name them) — which
    * is exactly right for the doc↔band coverage guard, because expiry
    * runs symmetrically on both store halves. One listStatus + the
    * manifest reads; no data scan. */
  def batchIdentities(spark: SparkSession, dir: String): Set[(String, Long)] = {
    val fs = fileSystem(spark, dir)
    val root = new Path(dir)
    if (!fs.exists(root)) return Set.empty
    val entries = fs.listStatus(root).toSeq
    val raw = entries.filter(_.isDirectory).map(_.getPath.getName)
    val manifested = entries.collect {
      case st if !st.isDirectory => st.getPath.getName
    }.collect { case Manifest(k) =>
      readManifest(fs, new Path(root, s"_merged-$k.json"))
    }.flatten
    (raw ++ manifested).collect {
      case Part(ns, b) if ns != CompactNs => (ns, b.toLong)
    }.toSet
  }

  /** The surviving documents of ONE original batch, wherever they live
    * now: the raw dir if it still exists, else the compacted rows
    * carrying its provenance (empty if the batch's rows were deleted
    * or expired — the identity can outlive its documents). The
    * backfill read of [[graft.streaming.StreamingDedup]]'s coverage
    * guard. */
  def readRun(spark: SparkSession, dir: String, schema: StructType,
              ns: String, batch: Long): DataFrame = {
    val members = listMembers(spark, dir)
    members.find(m => m.ns == ns && m.batch == batch) match {
      case Some(m) => spark.read.schema(schema).parquet(m.path)
      case None =>
        val comp = members.filter(_.isCompacted)
        if (comp.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        else spark.read.parquet(comp.map(_.path): _*)
          .filter(col(RunCol) === ns && col(BatchCol) === batch)
          .select(schema.fieldNames.map(col).toSeq: _*)
    }
  }

  /** The store's documents under the given schema, excluding the
    * writing run's own batches at-or-after `excludeFromBatch` (the
    * at-least-once replay guard) — enforced via dir names for raw batch
    * members and via the row-level provenance columns for compacted
    * generations. Pass `excludeNs = None` for a plain maintenance read
    * of everything committed. */
  def readDocs(spark: SparkSession, dir: String, schema: StructType,
               excludeNs: Option[String] = None,
               excludeFromBatch: Long = 0L): DataFrame = {
    val members = listMembers(spark, dir)
    val keepRaw = members.filterNot(_.isCompacted).filter { m =>
      excludeNs.forall(ns => m.ns != ns || m.batch < excludeFromBatch)
    }
    val compacted = members.filter(_.isCompacted)
    val cols = schema.fieldNames.map(col).toSeq
    val rawDf =
      if (keepRaw.isEmpty) None
      else Some(spark.read.schema(schema).parquet(keepRaw.map(_.path): _*))
    val compDf =
      if (compacted.isEmpty) None
      else {
        val d = spark.read.parquet(compacted.map(_.path): _*)
        val filtered = excludeNs match {
          case Some(ns) =>
            d.filter(!(col(RunCol) === ns && col(BatchCol) >= excludeFromBatch))
          case None => d
        }
        Some(filtered.select(cols: _*))
      }
    (rawDf, compDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }
  }

  /** Merge every committed member into one new compacted generation,
    * optionally dropping `removeIds` (deletion = compaction with an
    * anti-join — the only way to remove rows from immutable parquet
    * batches while keeping exactly-one-copy semantics). Returns the new
    * generation id, or None when the store is empty (nothing to do; a
    * pure delete on an empty store is also a no-op).
    *
    * Safe to run between stream runs (the nightly maintenance window);
    * concurrent compactions of the same store are not supported (two
    * compactors could both absorb the same source dirs). Mid-stream
    * compaction is safe for READERS (provenance columns preserve replay
    * exclusion) but a batch committed after the listing here and before
    * the manifest write would be invisible to this compaction — it
    * simply stays a raw member, absorbed next time. If compaction
    * absorbs a batch whose stream later REPLAYS it (crash before the
    * checkpoint commit), the replay re-creates the raw dir under its
    * original name — which the manifest keeps excluded, so readers
    * still see exactly one copy (the compacted rows; identical content,
    * since replayed offsets reproduce the batch) and the next compact()
    * deletes the orphan dir.
    */
  def compact(spark: SparkSession, dir: String, idCol: String,
              removeIds: Option[DataFrame] = None,
              removeRuns: Seq[String] = Seq.empty): Option[Long] = {
    val root = new Path(dir)
    val fs = fileSystem(spark, dir)
    if (!fs.exists(root)) return None
    // Clean up debris from a previous crashed compaction: tmp dirs and
    // renamed-but-uncommitted generations are invisible to readers, so
    // deleting them is always safe; absorbed sources whose best-effort
    // delete failed (or which a stream replay re-created under the
    // same name — the manifest keeps them excluded either way) are
    // retried here.
    val st0 = readState(fs, root)
    st0.entries.filter(_.isDirectory).foreach { e =>
      e.getPath.getName match {
        case n if n.startsWith("_tmp_compact_") => fs.delete(e.getPath, true)
        case Part(CompactNs, b) if !st0.committedGens.contains(b.toLong) =>
          fs.delete(e.getPath, true)
        case _ => ()
      }
    }
    st0.absorbed.foreach(n => fs.delete(new Path(root, n), true))

    val members = listMembers(spark, dir)
    if (members.isEmpty) return None
    val gen = (st0.committedGens + -1L).max + 1

    // Raw members gain provenance columns from their dir names —
    // derived from the file path in ONE multi-path read, not one scan
    // branch per dir: a year of nightly batches is ~365 dirs, and a
    // 365-way union makes plan analysis itself the bottleneck.
    val (compactedM, rawM) = members.partition(_.isCompacted)
    val rawDf =
      if (rawM.isEmpty) None
      else Some(spark.read.parquet(rawM.map(_.path): _*)
        .withColumn(RunCol,
          regexp_extract(input_file_name(), "run=([0-9a-z]+)_batch=", 1))
        .withColumn(BatchCol,
          regexp_extract(input_file_name(), "_batch=([0-9]+)/", 1)
            .cast("long")))
    val compDf =
      if (compactedM.isEmpty) None
      else Some(spark.read.parquet(compactedM.map(_.path): _*))
    val all = (rawDf.toSeq ++ compDf.toSeq).reduce(_ unionByName _)
    val dropped = removeIds match {
      case Some(ids) =>
        val key = ids.columns.head
        all.join(broadcast(ids.select(col(key).as(idCol)).distinct()),
          Seq(idCol), "left_anti")
      case None => all
    }
    // Retention: drop whole harvest runs by provenance namespace —
    // the column survives compaction, so an expired run's documents
    // disappear even from generations that absorbed it long ago.
    // A namespace matching NOTHING is a loud error, not a silent
    // no-op: the likeliest cause is passing a raw checkpoint path
    // where the store namespace (e.g. StreamingDedup.runNamespace)
    // was meant, and "retention reported success but the revoked run
    // still pairs" is exactly the failure the BandStore sidecar
    // discipline exists to prevent. One distinct over the provenance
    // column — maintenance-window cost. BUT a namespace a previous
    // compaction already expired (recorded in its manifest) is
    // 'already gone', not 'never present': a retried maintenance job
    // — or one resumed after a crash just past the manifest commit —
    // must be an idempotent success, so only namespaces that neither
    // match documents NOR appear in the expiry record fail.
    val kept =
      if (removeRuns.isEmpty) dropped
      else {
        val present = all.select(col(RunCol)).distinct()
          .collect().map(_.getString(0)).toSet
        val unknown = removeRuns.filterNot(present)
          .filterNot(st0.expired)
        require(unknown.isEmpty,
          s"compact: run namespace(s) ${unknown.mkString(", ")} match no " +
            s"documents in $dir and were never expired (present: " +
            s"${present.mkString(", ")}) — expected a store run " +
            "namespace, not a checkpoint path")
        dropped.filter(!col(RunCol).isin(removeRuns: _*))
      }

    val tmp = new Path(root, s"_tmp_compact_$gen")
    kept.write.mode("overwrite").parquet(tmp.toString)
    val dest = new Path(root, s"run=${CompactNs}_batch=$gen")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"compact: rename $tmp -> $dest failed")
    // COMMIT POINT: atomic create-no-overwrite of the manifest. Before
    // this line the new generation is invisible; after it the absorbed
    // members are excluded.
    // The manifest also records this compaction's expired namespaces
    // (prefixed so they can never collide with member dir names) —
    // the durable fact that makes a RETRIED expiry of the same runs
    // succeed idempotently above.
    writeManifest(fs, new Path(root, s"_merged-$gen.json"),
      members.map(_.name) ++
        removeRuns.distinct.map(ExpiredPrefix + _))
    members.foreach(m => fs.delete(new Path(m.path), true))
    Some(gen)
  }

  /** Remove `ids` (first column of `ids`, matched against `idCol` in
    * the store schema) from the corpus store. Implemented as a full
    * compaction with an anti-join, so afterwards the store is a single
    * committed generation holding exactly the surviving documents —
    * a subsequent pairing run behaves as a fresh run over the
    * remaining docs. */
  def delete(spark: SparkSession, dir: String, idCol: String,
             ids: DataFrame): Option[Long] =
    compact(spark, dir, idCol, Some(ids))

  /** Retention: remove every document that arrived under one of the
    * given run namespaces (a superseded harvest, a revoked source) —
    * the run-granular sibling of the id-granular [[delete]]. Like
    * delete, a full compaction: afterwards the store is one committed
    * generation holding exactly the surviving documents, and a
    * subsequent pairing run behaves as a fresh run over them. */
  def expireRuns(spark: SparkSession, dir: String, idCol: String,
                 runs: Seq[String]): Option[Long] =
    compact(spark, dir, idCol, removeRuns = runs)

  private def readManifest(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      // Entries are dir names (hex/digits/'=', '_') — no JSON escaping
      // can occur, so a quoted-string scan is a full parser here.
      "\"([^\"]+)\"".r.findAllMatchIn(new String(bytes, "UTF-8"))
        .map(_.group(1)).toSeq
    } finally in.close()
  }

  private def writeManifest(fs: FileSystem, p: Path,
                            names: Seq[String]): Unit = {
    val json = names.sorted.map(n => s""""$n"""").mkString("[", ",", "]")
    val out = fs.create(p, /* overwrite = */ false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }
}
