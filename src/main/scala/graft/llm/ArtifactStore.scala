package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The shared machinery of the persisted-artifact stores ([[BandStore]]
  * band tables, [[IndexStore]] IVF-PQ models, [[LmStore]] LM count
  * tables, [[TokenizerStore]] BPE merge tables): parameter-sidecar
  * write/parse and the crash-safe swap that promotes a fully-written
  * replacement directory over the live one. Extracted so the contract
  * is implemented ONCE — the four stores differ only in what their
  * parameters and tables mean, not in how an artifact survives a crash.
  *
  * Swap protocol (write–rename–rename–delete, per swap unit `unit/`):
  *  1. the writer builds the COMPLETE replacement under a unique
  *     per-run temp name `_tmp_<unit>_<token>` — unique so a reader can
  *     never confuse a half-written build with a promotable one, and a
  *     crashed run's leftovers never collide with the next run's build;
  *  2. [[verifyComplete]] checks every component's `_SUCCESS` marker
  *     BEFORE the live dir moves aside — an incomplete temp is a build
  *     failure, never a promotion candidate;
  *  3. rename(unit, _old_unit); rename(tmp, unit); delete(_old_unit).
  *
  * Recovery ([[recoverSwap]], run by every entry point): if `unit/`
  * exists the artifact is live — stale `_old_` is dropped but temps are
  * LEFT ALONE (a concurrent writer may be mid-build in one; only the
  * writer path cleans temps, via [[cleanStaleTmps]] under the stores'
  * single-writer contract). If `unit/` is missing, a crash interrupted
  * a swap: promote the unique COMPLETE temp if one exists (the writer
  * verified it before moving the live dir aside), else restore
  * `_old_unit`. Every rename checks its return value — HDFS-like
  * filesystems signal failure by returning false — and tolerates
  * losing a promotion race to the writer itself (the destination
  * existing afterwards means someone promoted a good copy).
  */
private[graft] object ArtifactStore {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  // ---- sidecar ------------------------------------------------------

  val Sidecar = "_params.json"

  def writeSidecar(f: FileSystem, p: Path, json: String): Unit = {
    // Overwrite is fine: the sidecar commits a whole-artifact overwrite
    // and is idempotent per params.
    val out = f.create(p, /* overwrite = */ true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** `json` with a `layout` directory-scheme stamp appended — the one
    * place the sidecar's layout field is spliced, so every store that
    * evolves its layout bumps the same contract. Fails loudly on input
    * the splice cannot handle (trailing whitespace, or an already-spliced
    * layout key) rather than silently emitting a malformed or
    * double-keyed sidecar a later read would misparse. */
  def withLayout(json: String, layout: Int): String = {
    require(json.endsWith("}"),
      s"withLayout: params render must end in '}' (no trailing " +
        s"whitespace/newline) — got: ${json.takeRight(20)}")
    require(!json.contains("\"layout\""),
      s"withLayout: params render already contains a layout key — " +
        s"double splice would emit duplicate JSON keys: $json")
    json.stripSuffix("}") + s""","layout":$layout}"""
  }

  /** The sidecar's text, or None when no artifact exists. */
  def readSidecarText(f: FileSystem, dir: String): Option[String] = {
    val p = new Path(dir, Sidecar)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      Some(new String(bytes, "UTF-8"))
    } finally in.close()
  }

  /** `"..."` with `\` and `"` (and control chars) escaped — a column
    * name containing a quote must round-trip through the sidecar, not
    * corrupt it. */
  def jsonString(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append('"').toString
  }

  private def unescapeJson(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case e   => b.append(e); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def fail(store: String, dir: String, key: String,
                   text: String): Nothing =
    throw new IllegalStateException(
      s"$store: malformed $Sidecar at $dir (missing $key): $text")

  def intField(text: String, key: String, store: String,
               dir: String): Int =
    s""""$key"\\s*:\\s*(-?[0-9]+)""".r.findFirstMatchIn(text)
      .getOrElse(fail(store, dir, key, text)).group(1).toInt

  def longField(text: String, key: String, store: String,
                dir: String): Long =
    s""""$key"\\s*:\\s*(-?[0-9]+)""".r.findFirstMatchIn(text)
      .getOrElse(fail(store, dir, key, text)).group(1).toLong

  def boolField(text: String, key: String, store: String,
                dir: String): Boolean =
    s""""$key"\\s*:\\s*(true|false)""".r.findFirstMatchIn(text)
      .getOrElse(fail(store, dir, key, text)).group(1).toBoolean

  /** A string-or-null field, unescaped (the inverse of
    * [[jsonString]]). */
  def stringOrNullField(text: String, key: String, store: String,
                        dir: String): Option[String] = {
    val m = (s""""$key"\\s*:\\s*(?:"((?:[^"\\\\]|\\\\.)*)"|null)""").r
      .findFirstMatchIn(text)
      .getOrElse(fail(store, dir, key, text))
    Option(m.group(1)).map(unescapeJson)
  }

  // ---- segmented table ------------------------------------------------
  // A table directory holding an optional flat BASE (the parquet files a
  // full build wrote, vouched for by the root `_SUCCESS`) plus zero or
  // more committed `inc_*` append segments — each an entire parquet
  // directory written to an invisible `_tmp_inc_*` name, `_SUCCESS`-
  // verified, then promoted with ONE rename. The append discipline of
  // [[graft.llm.IndexStore]]'s codes/, shared here so BandStore and
  // PackStore cannot drift: a killed append leaves only an un-promoted
  // temp, never loose part files a stale base `_SUCCESS` would vouch for.

  val SegIncPrefix = "inc_"
  val SegIncTmpPrefix = "_tmp_inc_"

  /** Crash-atomic segment append (writer path — also sweeps crash
    * debris from earlier aborted appends, safe under the stores'
    * single-writer maintenance contract). */
  def appendSegment(f: FileSystem, root: Path,
                    df: org.apache.spark.sql.DataFrame,
                    store: String): Unit = {
    f.mkdirs(root)
    f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(SegIncTmpPrefix))
      .foreach(t => f.delete(t, true))
    val token = f"${System.currentTimeMillis}%013d" + "_" +
      java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, SegIncTmpPrefix + token)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!verifyComplete(f, tmp, Nil))
      throw new java.io.IOException(
        s"$store.append: increment segment at $tmp is incomplete " +
          "(missing _SUCCESS) — refusing to promote it")
    val dest = new Path(root, SegIncPrefix + token)
    if (!f.rename(tmp, dest))
      throw new java.io.IOException(
        s"$store.append: cannot promote segment $tmp")
  }

  /** The committed read set of a segmented table: the flat base part
    * files (when the root `_SUCCESS` vouches for them) plus every
    * committed `inc_*` segment. Un-promoted temps are invisible. A
    * missing root reads as empty when `allowMissing` (a tombstone table
    * before the first takedown), otherwise the caller's own
    * requireCommitted should already have refused. */
  def readSegmented(spark: SparkSession, f: FileSystem, root: Path,
                    schema: Option[org.apache.spark.sql.types.StructType] = None,
                    allowMissing: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    if (!f.exists(root)) {
      require(allowMissing, s"readSegmented: no table at $root")
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema.getOrElse(throw new IllegalArgumentException(
          "readSegmented: a missing-allowed table needs an explicit schema")))
    }
    val children = f.listStatus(root).toSeq.map(_.getPath)
    val incs = children
      .filter(p => p.getName.startsWith(SegIncPrefix) &&
        f.exists(new Path(p, "_SUCCESS")))
      .sortBy(_.getName)
    val hasBase = f.exists(new Path(root, "_SUCCESS"))
    if (incs.isEmpty && hasBase) spark.read.parquet(root.toString)
    else if (incs.isEmpty) {
      require(allowMissing,
        s"readSegmented: no committed base or segments at $root")
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema.getOrElse(throw new IllegalArgumentException(
          "readSegmented: an empty-allowed table needs an explicit schema")))
    } else {
      // Base part files listed explicitly: reading the root dir with
      // non-partition subdirectories present is ambiguous to Spark's
      // file index.
      val base =
        if (!hasBase) Seq.empty
        else children.filter(p => {
          val n = p.getName
          !n.startsWith("_") && !n.startsWith(".") &&
            !n.startsWith(SegIncPrefix)
        })
      spark.read.parquet((base ++ incs).map(_.toString): _*)
    }
  }

  // ---- crash-safe swap ----------------------------------------------

  private def tmpPrefix(unit: String) = s"_tmp_${unit}_"
  private def oldPath(dir: String, unit: String) =
    new Path(dir, s"_old_$unit")

  /** A unique per-run temp directory for the replacement build — never
    * a name a reader could mistake for another run's. The name leads
    * with zero-padded epoch millis so temps carry their BUILD ORDER:
    * if the single-writer contract is ever violated and recovery finds
    * several complete temps, [[recoverSwap]] promotes the one with the
    * greatest parsed millis prefix ([[tmpMillis]]; names without one
    * rank oldest), not an arbitrary UUID winner — the random suffix
    * only tiebreaks two builds started in the same millisecond. */
  def newTmpPath(dir: String, unit: String): Path =
    new Path(dir, tmpPrefix(unit) +
      f"${System.currentTimeMillis}%013d" + "_" +
      java.util.UUID.randomUUID().toString.take(8))

  /** The build-order key of a temp name: its 13-digit epoch-millis
    * prefix, or Long.MinValue when the name predates the millis scheme
    * (treated as oldest — see [[recoverSwap]]). */
  private def tmpMillis(unit: String, p: Path): Long = {
    val suffix = p.getName.stripPrefix(tmpPrefix(unit))
    val digits = suffix.takeWhile(_.isDigit)
    if (digits.length == 13) digits.toLong else Long.MinValue
  }

  private def listTmps(f: FileSystem, dir: String,
                       unit: String): Seq[Path] = {
    val root = new Path(dir)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(tmpPrefix(unit)))
  }

  /** Every component parquet dir carries Spark's `_SUCCESS` marker only
    * when its write job committed — the completeness test that keeps a
    * half-written build out of promotion. `components` is the relative
    * component dirs inside the unit (Nil = the unit IS one parquet
    * dir). */
  def verifyComplete(f: FileSystem, tmp: Path,
                     components: Seq[String]): Boolean = {
    val marks =
      if (components.isEmpty) Seq(new Path(tmp, "_SUCCESS"))
      else components.map(c => new Path(new Path(tmp, c), "_SUCCESS"))
    marks.forall(f.exists)
  }

  /** Read-side torn-component guard, shared by all four stores: every
    * promoted unit carries its components' `_SUCCESS` markers
    * ([[commitSwap]] verifies them before the rename), so a live unit
    * missing one was truncated or edited out-of-band. Torn tables can
    * pass a store's structural checks (a truncated merge tail keeps
    * contiguous ranks; a truncated codebook keeps all subspaces), so
    * this refusal must come before them. */
  def requireCommitted(f: FileSystem, dir: String, unit: String,
                       components: Seq[String], store: String): Unit =
    require(verifyComplete(f, new Path(dir, unit), components),
      s"$store.read: $unit at $dir is missing a component _SUCCESS " +
        "marker — no promoted build lacks one, so the artifact was " +
        "torn or edited out-of-band; refusing to serve " +
        "possibly-truncated tables")

  /** Writer-path-only cleanup of leftover temps from crashed runs.
    * Safe under the stores' single-writer contract (maintenance jobs
    * run one at a time); NEVER called from the read path, where a temp
    * may be a live writer's in-flight build. */
  def cleanStaleTmps(f: FileSystem, dir: String, unit: String): Unit =
    listTmps(f, dir, unit).foreach(t => f.delete(t, true))

  /** Promote a fully-written `tmp` over the live `unit/`: verify
    * completeness, rename the live dir aside, rename tmp in, drop the
    * old copy. Throws before touching the live dir if tmp is
    * incomplete — the live artifact is never at risk from a failed
    * build. */
  def commitSwap(f: FileSystem, dir: String, unit: String, tmp: Path,
                 components: Seq[String], store: String,
                 op: String): Unit = {
    if (!verifyComplete(f, tmp, components))
      throw new java.io.IOException(
        s"$store.$op: replacement at $tmp is incomplete (missing " +
          s"_SUCCESS markers) — refusing to swap it over the live " +
          s"artifact at $dir")
    val data = new Path(dir, unit)
    val old = oldPath(dir, unit)
    f.delete(old, true)
    if (f.exists(data) && !f.rename(data, old))
      throw new java.io.IOException(
        s"$store.$op: cannot move live $unit aside at $dir")
    if (!f.rename(tmp, data))
      throw new java.io.IOException(s"$store.$op: swap failed at $dir")
    f.delete(old, true)
    // Writer-path post-commit hygiene: any temp still listed is crash
    // debris from an EARLIER run (this run's tmp was just renamed away,
    // and the single-writer contract means no other build is in
    // flight). Clearing it here keeps a stale-but-complete leftover
    // from ever being promoted by a later recovery.
    cleanStaleTmps(f, dir, unit)
  }

  /** Complete a [[commitSwap]] interrupted by a crash. Idempotent;
    * called by every entry point. If the live dir exists only stale
    * `_old_` is dropped — temps are left for the writer path (a reader
    * deleting a temp could destroy a concurrent merge's half-written
    * build mid-write). If the live dir is missing, the unique COMPLETE
    * temp (verified by the writer before the live dir moved aside) is
    * promoted, else `_old_` is restored. */
  def recoverSwap(f: FileSystem, dir: String, unit: String,
                  components: Seq[String], store: String): Unit = {
    val data = new Path(dir, unit)
    val old = oldPath(dir, unit)
    if (f.exists(data)) {
      f.delete(old, true)
    } else {
      val complete = listTmps(f, dir, unit)
        .filter(verifyComplete(f, _, components))
      if (complete.nonEmpty) {
        // Single-writer contract ⇒ at most one complete temp; if that
        // is violated, promote the NEWEST build by its zero-padded
        // epoch-millis prefix ([[newTmpPath]]). Parsed, not lexical:
        // a leftover temp from BEFORE the millis-prefix scheme (bare
        // UUID, often letter-leading) would lexically sort AFTER every
        // digit-leading name — parsing treats an unparsable prefix as
        // oldest, so a stale pre-scheme build can never outrank a
        // current one.
        val t = complete.maxBy(p => (tmpMillis(unit, p), p.getName))
        if (!f.rename(t, data) && !f.exists(data))
          throw new java.io.IOException(
            s"$store.recoverSwap: cannot promote $t at $dir")
        f.delete(old, true)
      } else if (f.exists(old)) {
        if (!f.rename(old, data) && !f.exists(data))
          throw new java.io.IOException(
            s"$store.recoverSwap: cannot restore $old at $dir")
      }
    }
  }
}
