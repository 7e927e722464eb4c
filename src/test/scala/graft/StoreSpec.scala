package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{BandStore, Dedup, IndexStore, Similarity}
import graft.streaming.CorpusStore

/** The two persisted dedup artifacts: the band-table store (parameter
  * contract ENFORCED via the _params.json sidecar) and the streaming
  * corpus store (Hadoop-FS listing, crash-safe compaction, takedown
  * deletion). Every filesystem interaction runs through an explicit
  * `file:` scheme Hadoop path, so the code paths exercised are the ones
  * a HDFS/object-store deployment hits — java.io.File never resolves a
  * `file:` URI string, which is exactly the regression this pins. */
class StoreSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private lazy val docs =
    Tables.documents(spark, Sf).filter(col("doc_id") < 120)
      .select("doc_id", "text").cache()

  private def tmpDir(prefix: String): String =
    // Explicit scheme: exercises the Hadoop-FS path resolution.
    "file:" + java.nio.file.Files.createTempDirectory(prefix).toString

  private def cleanup(dir: String): Unit =
    graft.queries.Fixtures.deleteRecursively(
      java.nio.file.Paths.get(dir.stripPrefix("file:")))

  private val P = BandStore.Params(shingleN = 1, bands = 8,
    rowsPerBand = 4, portable = false)

  // ---- BandStore ----------------------------------------------------

  test("BandStore round-trip: build + read equals the on-the-fly band table") {
    val dir = tmpDir("graft-bs")
    try {
      BandStore.build(docs, "doc_id", "text", dir, P)
      val stored = BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet
      val fresh = Dedup.minhashBandTable(docs, "doc_id", "text",
          P.shingleN, P.bands, P.rowsPerBand, P.portable)
        .as[(Long, Int, String)].collect().toSet
      assert(stored == fresh && stored.nonEmpty)
    } finally cleanup(dir)
  }

  test("BandStore refuses a parameter mismatch and a missing sidecar, loudly") {
    val dir = tmpDir("graft-bs")
    try {
      BandStore.build(docs, "doc_id", "text", dir, P)
      // Any single differing parameter must raise — this is the
      // silently-empty-join failure turned into an error.
      for (bad <- Seq(P.copy(bands = 16), P.copy(rowsPerBand = 8),
                      P.copy(shingleN = 2), P.copy(portable = true))) {
        val e = intercept[IllegalStateException] {
          BandStore.read(spark, dir, bad)
        }
        assert(e.getMessage.contains("mismatch"), e.getMessage)
      }
      // append under a mismatched family must also refuse
      intercept[IllegalStateException] {
        BandStore.append(docs.limit(1), "doc_id", "text", dir,
          P.copy(bands = 16))
      }
      // no sidecar at all: refuse rather than guess
      val fs = CorpusStore.fileSystem(spark, dir)
      fs.delete(new Path(dir, "_params.json"), false)
      val e2 = intercept[IllegalStateException] {
        BandStore.read(spark, dir, P)
      }
      assert(e2.getMessage.contains("sidecar"), e2.getMessage)
    } finally cleanup(dir)
  }

  test("BandStore nightly cycle: append increments, pairs match the full run; delete = fresh run on survivors") {
    val dir = tmpDir("graft-bs")
    try {
      val c0 = docs.filter(col("doc_id") < 60)
      val inc1 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 90)
      val inc2 = docs.filter(col("doc_id") >= 90)
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect().toSet

      BandStore.build(c0, "doc_id", "text", dir, P)
      val night1 = pairsOf(Dedup.minhashLshPairsIncremental(c0, inc1,
        "doc_id", "text", threshold = 0.8, bands = P.bands,
        rowsPerBand = P.rowsPerBand,
        corpusBands = Some(BandStore.read(spark, dir, P))))
      BandStore.append(inc1, "doc_id", "text", dir, P)
      val c1 = c0.unionByName(inc1)
      val night2 = pairsOf(Dedup.minhashLshPairsIncremental(c1, inc2,
        "doc_id", "text", threshold = 0.8, bands = P.bands,
        rowsPerBand = P.rowsPerBand,
        corpusBands = Some(BandStore.read(spark, dir, P))))
      val full = pairsOf(Dedup.minhashLshPairs(docs, "doc_id", "text",
        threshold = 0.8, bands = P.bands, rowsPerBand = P.rowsPerBand))
      assert(night1.union(night2) ==
        full.filter { case (a, b, _) => a >= 60 || b >= 60 })
      assert(night1.nonEmpty && night2.nonEmpty, "vacuous nightly fixture")

      // Takedown: remove inc1's ids from the artifact; pairing a fresh
      // increment against the store must equal a fresh build over the
      // survivors (corpus never re-signed, so this is the only way the
      // pair set stays consistent after a removal).
      BandStore.append(inc2, "doc_id", "text", dir, P)
      BandStore.delete(spark, dir, inc1.select(col("doc_id").as("doc")))
      val survivors = c0.unionByName(inc2)
      val fresh = Dedup.minhashBandTable(survivors, "doc_id", "text",
          P.shingleN, P.bands, P.rowsPerBand, P.portable)
        .as[(Long, Int, String)].collect().toSet
      val afterDelete = BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet
      assert(afterDelete == fresh)
    } finally cleanup(dir)
  }

  test("BandStore append is crash-atomic: a killed append is invisible to read and swept by the next append") {
    val dir = tmpDir("graft-bs")
    try {
      val c0 = docs.filter(col("doc_id") < 60)
      val inc1 = docs.filter(col("doc_id") >= 60 && col("doc_id") < 90)
      val inc2 = docs.filter(col("doc_id") >= 90)
      BandStore.build(c0, "doc_id", "text", dir, P)
      val baseRows = BandStore.read(spark, dir, P).count()
      val fs = CorpusStore.fileSystem(spark, dir)

      // Crash window 1: append died mid-write — a half-written temp
      // (parquet file, no _SUCCESS) inside data/. The torn increment
      // must NOT surface through read (pre-fix, mode("append") wrote
      // straight into data/ and the base's _SUCCESS vouched for it).
      val torn = new Path(dir, "data/_tmp_inc_0000000000001_dead")
      Dedup.minhashBandTable(inc1, "doc_id", "text", P.shingleN,
          P.bands, P.rowsPerBand, P.portable)
        .write.parquet(torn.toString)
      fs.delete(new Path(torn, "_SUCCESS"), false)
      assert(BandStore.read(spark, dir, P).count() == baseRows,
        "a crashed append's partial files leaked into the read")

      // Crash window 2: fully written temp, crash before the promote
      // rename — still invisible (the rename IS the commit).
      val full = new Path(dir, "data/_tmp_inc_0000000000002_dead")
      Dedup.minhashBandTable(inc1, "doc_id", "text", P.shingleN,
          P.bands, P.rowsPerBand, P.portable)
        .write.parquet(full.toString)
      assert(BandStore.read(spark, dir, P).count() == baseRows)

      // The next real append sweeps both leftovers and lands its own
      // committed segment; the union equals base + inc2, with neither
      // dead temp resurrected.
      BandStore.append(inc2, "doc_id", "text", dir, P)
      val expect = Dedup.minhashBandTable(c0.unionByName(inc2),
          "doc_id", "text", P.shingleN, P.bands, P.rowsPerBand,
          P.portable)
        .as[(Long, Int, String)].collect().toSet
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == expect)
      val leftovers = fs.listStatus(new Path(dir, "data"))
        .map(_.getPath.getName).filter(_.startsWith("_tmp_inc_"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
    } finally cleanup(dir)
  }

  test("BandStore reads a legacy flat artifact with loose appended part files (pre-segment layout)") {
    val dir = tmpDir("graft-bs")
    try {
      val c0 = docs.filter(col("doc_id") < 60)
      val inc = docs.filter(col("doc_id") >= 60)
      BandStore.build(c0, "doc_id", "text", dir, P)
      // What the pre-segment append wrote: loose part files straight
      // into the live data/ dir (mode("append")). Artifacts of that
      // era must stay readable unchanged.
      Dedup.minhashBandTable(inc, "doc_id", "text", P.shingleN,
          P.bands, P.rowsPerBand, P.portable)
        .write.mode("append").parquet(s"$dir/data")
      val expect = Dedup.minhashBandTable(docs, "doc_id", "text",
          P.shingleN, P.bands, P.rowsPerBand, P.portable)
        .as[(Long, Int, String)].collect().toSet
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == expect)
    } finally cleanup(dir)
  }

  test("incremental dedup rejects overlapping corpus/increment ids") {
    val corpus = docs.filter(col("doc_id") < 90)
    val increment = docs.filter(col("doc_id") >= 80) // 80..89 overlap
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshPairsIncremental(corpus, increment, "doc_id", "text",
        threshold = 0.8, bands = 8, rowsPerBand = 4).count()
    }
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  // ---- PackStore ------------------------------------------------------

  private def packedDocs = {
    import graft.llm.Corpus
    Corpus.packSequences(
        docs.withColumn("n", length(col("text"))), "doc_id", col("n"),
        numShards = 4, budgetTokens = 256, seed = "pt")
      .select("doc_id", "shard", "seq_idx", "tok_offset")
  }
  private val PackP = graft.llm.PackStore.Params(numShards = 4,
    budgetTokens = 256)

  test("PackStore takedown: tombstone drops the doc from serve; surviving placements stay byte-identical (sealed sequences never re-pack)") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      val placed = packedDocs
      PackStore.write(placed, dir, PackP)
      val before = PackStore.serve(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet
      val dead = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
      PackStore.tombstone(spark, dir, dead)
      val after = PackStore.serve(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet
      val deadIds = dead.as[Long].collect().toSet
      assert(deadIds.nonEmpty && after.forall(p => !deadIds.contains(p._1)))
      // THE immutability pin: every surviving placement is EXACTLY its
      // pre-takedown self — the dead doc's span becomes padding, no
      // neighbor moves.
      assert(after == before.filterNot(p => deadIds.contains(p._1)))
      // Idempotent: tombstoning again (or absent ids) changes nothing.
      PackStore.tombstone(spark, dir, dead.limit(3))
      PackStore.tombstone(spark, dir, Seq(999999L).toDF("doc_id"))
      assert(PackStore.serve(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet == after)
      // Compact folds physically: same serve view, tombstones cleared,
      // raw placements now equal the serve view.
      PackStore.compact(spark, dir)
      assert(PackStore.serve(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet == after)
      assert(PackStore.readTombstones(spark, dir).count() == 0)
      assert(PackStore.readPlacements(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet == after)
    } finally cleanup(dir)
  }

  test("PackStore append lands increments as committed segments; params drift and torn segments refuse/stay invisible") {
    import graft.llm.{Corpus, PackStore}
    val dir = tmpDir("graft-ps")
    try {
      val base = docs.filter(col("doc_id") < 60)
      val inc = docs.filter(col("doc_id") >= 60)
      val basePlaced = Corpus.packSequences(
          base.withColumn("n", length(col("text"))), "doc_id", col("n"),
          4, 256, "pt")
        .select("doc_id", "shard", "seq_idx", "tok_offset", "n")
      PackStore.write(basePlaced.drop("n"), dir, PackP)
      // The nightly append: pack the increment from the standing
      // watermark, land it as a segment.
      val wm = Corpus.packWatermark(basePlaced, col("n"), 256)
      val incPlaced = Corpus.packSequencesAppend(
          inc.withColumn("n", length(col("text"))), "doc_id", col("n"),
          4, 256, "pt", wm)
        .select("doc_id", "shard", "seq_idx", "tok_offset")
      PackStore.append(incPlaced, dir, PackP)
      assert(PackStore.serve(spark, dir, PackP).count() == docs.count())
      // Drift refusal: a different pack scheme must not append.
      val e = intercept[IllegalStateException] {
        PackStore.append(incPlaced, dir, PackP.copy(budgetTokens = 512))
      }
      assert(e.getMessage.contains("mismatch"), e.getMessage)
      // Crash window: a half-written placements segment (no _SUCCESS)
      // is invisible to serve.
      val fs = CorpusStore.fileSystem(spark, dir)
      val torn = new Path(dir, "placements/_tmp_inc_0000000000001_dead")
      incPlaced.write.parquet(torn.toString)
      fs.delete(new Path(torn, "_SUCCESS"), false)
      assert(PackStore.serve(spark, dir, PackP).count() == docs.count())
      // A torn TOMBSTONE segment is likewise invisible: the docs it
      // would have killed still serve (takedown commits atomically or
      // not at all — a half-applied takedown list would be silent
      // under-deletion on retry bookkeeping).
      val tt = new Path(dir, "tombstones/_tmp_inc_0000000000002_dead")
      docs.limit(5).select("doc_id").write.parquet(tt.toString)
      fs.delete(new Path(tt, "_SUCCESS"), false)
      assert(PackStore.serve(spark, dir, PackP).count() == docs.count())
    } finally cleanup(dir)
  }

  test("PackStore write swap is recoverable at every crash point") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      PackStore.write(packedDocs, dir, PackP)
      val before = PackStore.serve(spark, dir, PackP)
        .as[(Long, Int, Int, Int)].collect().toSet
      val fs = CorpusStore.fileSystem(spark, dir)

      // Crash window 1: replacement fully written to a temp, live dir
      // already moved aside, promote rename not yet done — recovery
      // (run by every entry point) must promote the complete temp.
      val tmp1 = new Path(dir, "_tmp_placements_0000000000009_x1")
      PackStore.readPlacements(spark, dir, PackP).limit(10)
        .write.parquet(tmp1.toString)
      assert(fs.rename(new Path(dir, "placements"),
        new Path(dir, "_old_placements")))
      assert(PackStore.serve(spark, dir, PackP).count() == 10)

      // Crash window 2: only an INCOMPLETE temp (no _SUCCESS) and the
      // old dir present — recovery must restore the old artifact, never
      // promote the torn build.
      val dir2 = tmpDir("graft-ps2")
      try {
        PackStore.write(packedDocs, dir2, PackP)
        val fs2 = CorpusStore.fileSystem(spark, dir2)
        val tmp2 = new Path(dir2, "_tmp_placements_0000000000009_x2")
        PackStore.readPlacements(spark, dir2, PackP).limit(3)
          .write.parquet(tmp2.toString)
        fs2.delete(new Path(tmp2, "_SUCCESS"), false)
        assert(fs2.rename(new Path(dir2, "placements"),
          new Path(dir2, "_old_placements")))
        assert(PackStore.serve(spark, dir2, PackP)
          .as[(Long, Int, Int, Int)].collect().toSet == before)
      } finally cleanup(dir2)
    } finally cleanup(dir)
  }

  test("PackStore tombstone carries the full artifact guard: missing artifact and non-numeric ids refuse loudly") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      // No artifact at all: a mistyped dir must NOT succeed as a silent
      // no-op takedown.
      val e1 = intercept[IllegalStateException] {
        PackStore.tombstone(spark, s"$dir/nowhere", Seq(1L).toDF("doc_id"))
      }
      assert(e1.getMessage.contains("sidecar"), e1.getMessage)
      PackStore.write(packedDocs, dir, PackP)
      // Ids whose cast to long yields null (wrong-typed id column) must
      // refuse the whole list, not file an empty tombstone.
      val e2 = intercept[IllegalArgumentException] {
        PackStore.tombstone(spark, dir,
          Seq("12", "doc-13", "14").toDF("doc_id"))
      }
      assert(e2.getMessage.contains("null"), e2.getMessage)
      // Nothing half-applied: the refused list left no tombstones.
      assert(PackStore.readTombstones(spark, dir).count() == 0)
      // Numeric strings are fine — the cast discipline, not a type pin.
      PackStore.tombstone(spark, dir, Seq("12", "13").toDF("doc_id"))
      assert(PackStore.readTombstones(spark, dir)
        .as[Long].collect().toSet == Set(12L, 13L))
    } finally cleanup(dir)
  }

  test("PackStore: stale tombstones from a write() crash window are inert (build-stamp discipline)") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      PackStore.write(packedDocs, dir, PackP)
      PackStore.tombstone(spark, dir,
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"))
      assert(PackStore.serve(spark, dir, PackP).count() < docs.count())
      // Simulate the crash: a full rebuild promoted its base but died
      // before the tombstones-dir delete. Reproduce exactly that state
      // by saving the committed tombstone segments, rewriting the base,
      // and restoring the stale segments.
      val local = java.nio.file.Paths.get(dir.stripPrefix("file:"))
      val saved = java.nio.file.Files.createTempDirectory("graft-ts")
      copyTree(local.resolve("tombstones"), saved.resolve("tombstones"))
      PackStore.write(packedDocs, dir, PackP)
      copyTree(saved.resolve("tombstones"), local.resolve("tombstones"))
      graft.queries.Fixtures.deleteRecursively(saved)
      // The stale segments were filed against the PREVIOUS base's build
      // token — the fresh build (which by contract contains no dead
      // docs) must serve in full, not silently drop the docs the old
      // takedown named.
      assert(PackStore.readTombstones(spark, dir).count() == 0)
      assert(PackStore.serve(spark, dir, PackP).count() == docs.count())
      // And a NEW takedown against the fresh base applies normally.
      PackStore.tombstone(spark, dir, Seq(3L).toDF("doc_id"))
      assert(PackStore.serve(spark, dir, PackP)
        .filter(col("doc_id") === 3).count() == 0)
    } finally cleanup(dir)
  }

  test("PackStore needsCompact trips on tombstoned fraction and on segment count, not before") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      PackStore.write(packedDocs, dir, PackP) // 120 placements
      assert(!PackStore.needsCompact(spark, dir, PackP))
      // One doc of 120 ≈ 0.83% < the 1% default — no trigger.
      PackStore.tombstone(spark, dir, Seq(5L).toDF("doc_id"))
      assert(PackStore.tombstonedFraction(spark, dir, PackP) < 0.01)
      assert(!PackStore.needsCompact(spark, dir, PackP))
      // Two docs ≈ 1.7% > 1% — the fraction trigger.
      PackStore.tombstone(spark, dir, Seq(6L).toDF("doc_id"))
      assert(PackStore.needsCompact(spark, dir, PackP))
      // The segment-count trigger stands alone: fraction far below the
      // bar but many committed segments (bounds the union's small-file
      // read fan-out).
      assert(PackStore.needsCompact(spark, dir, PackP,
        maxFraction = 0.5, maxSegments = 1))
      // Compact clears both.
      PackStore.compact(spark, dir)
      assert(!PackStore.needsCompact(spark, dir, PackP,
        maxFraction = 0.001, maxSegments = 0))
    } finally cleanup(dir)
  }

  test("PackStore: takedown racing an append surfaces atomically at every commit point") {
    import graft.llm.PackStore
    val dir = tmpDir("graft-ps")
    try {
      val base = packedDocs.filter(col("doc_id") < 60)
      val inc = packedDocs.filter(col("doc_id") >= 60)
      PackStore.write(base, dir, PackP)
      val fs = CorpusStore.fileSystem(spark, dir)

      // Commit point A: the append's segment is fully written but NOT
      // yet promoted (the in-flight window) when the takedown lands.
      // The takedown must apply to the committed base NOW; the torn
      // segment stays invisible.
      val tornSeg = new Path(dir, "placements/_tmp_inc_0000000000005_rc")
      inc.write.parquet(tornSeg.toString)
      PackStore.tombstone(spark, dir, Seq(7L, 63L).toDF("doc_id"))
      val midFlight = PackStore.serve(spark, dir, PackP)
        .select("doc_id").as[Long].collect().toSet
      assert(!midFlight.contains(7L) && !midFlight.contains(63L))
      assert(midFlight.forall(_ < 60), "torn append segment leaked into serve")

      // Commit point B: the append promotes AFTER the takedown — the
      // tombstone filed mid-flight must keep suppressing 63 in the now
      // fully-appended view (no torn state, no lost takedown).
      assert(fs.rename(tornSeg,
        new Path(dir, "placements/inc_0000000000005_rc")))
      val afterAppend = PackStore.serve(spark, dir, PackP)
        .select("doc_id").as[Long].collect().toSet
      assert(afterAppend.contains(61L), "promoted append segment must serve")
      assert(!afterAppend.contains(7L) && !afterAppend.contains(63L),
        "takedown lost across the append commit")

      // Commit point C: the mirror race — an in-flight (torn) TOMBSTONE
      // when an append commits. The half-written takedown is invisible
      // (atomically absent), every appended row serves.
      val tornTomb = new Path(dir, "tombstones/_tmp_inc_0000000000006_rc")
      Seq(61L).toDF("doc_id").withColumn("build", lit("wrong"))
        .write.parquet(tornTomb.toString)
      fs.delete(new Path(tornTomb, "_SUCCESS"), false)
      assert(PackStore.serve(spark, dir, PackP)
        .filter(col("doc_id") === 61).count() > 0)
    } finally cleanup(dir)
  }

  test("BandStore: takedown delete racing an append surfaces atomically — committed segments fold in, in-flight temps die loudly") {
    val dir = tmpDir("graft-bs")
    try {
      BandStore.build(docs.filter(col("doc_id") < 60), "doc_id", "text",
        dir, P)
      // A COMMITTED append before the delete folds into the rewrite.
      BandStore.append(docs.filter(col("doc_id").between(60, 89)),
        "doc_id", "text", dir, P)
      // An IN-FLIGHT append (fully written, not yet promoted) when the
      // delete lands.
      val fs = CorpusStore.fileSystem(spark, dir)
      val inFlight = new Path(dir, "data/_tmp_inc_0000000000007_rc")
      Dedup.minhashBandTable(docs.filter(col("doc_id") >= 90), "doc_id",
          "text", P.shingleN, P.bands, P.rowsPerBand, P.portable)
        .write.parquet(inFlight.toString)
      BandStore.delete(spark, dir,
        docs.filter(col("doc_id") % 10 === 0).select("doc_id"))
      val after = BandStore.read(spark, dir, P)
        .select("doc").as[Long].collect().toSet
      // No torn state: every committed doc minus the takedown, nothing
      // from the un-promoted temp.
      assert(after == (0L until 90L).toSet.filter(_ % 10 != 0))
      // The racing appender's temp was SWEPT by the delete's swap (the
      // whole data dir was replaced), so its promote rename can only
      // fail loudly — never silently re-introduce rows the takedown
      // should have covered; the appender retries against the
      // post-delete artifact.
      assert(!fs.exists(inFlight),
        "in-flight temp survived the delete swap — a later promote " +
          "would resurrect pre-takedown rows")
      assert(BandStore.read(spark, dir, P)
        .select("doc").as[Long].collect().toSet == after)
    } finally cleanup(dir)
  }

  private def copyTree(from: java.nio.file.Path,
                       to: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path => JPath}
    Files.walk(from).forEach { (p: JPath) =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else {
        Files.createDirectories(dest.getParent)
        Files.copy(p, dest)
      }
    }
  }

  // ---- CorpusStore --------------------------------------------------

  /** Seed a store with raw batch dirs the way StreamingDedup writes
    * them (two distinct run namespaces). */
  private def seedStore(dir: String): Unit = {
    docs.filter(col("doc_id") < 40)
      .write.parquet(s"$dir/run=aaaa11_batch=0")
    docs.filter(col("doc_id") >= 40 && col("doc_id") < 80)
      .write.parquet(s"$dir/run=aaaa11_batch=1")
    docs.filter(col("doc_id") >= 80)
      .write.parquet(s"$dir/run=bbbb22_batch=0")
  }

  test("CorpusStore: compaction preserves the document set and the pair set") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      val before = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      val gen = CorpusStore.compact(spark, dir, "doc_id")
      assert(gen.contains(0L))
      val members = CorpusStore.listMembers(spark, dir)
      assert(members.map(_.name) == Seq("run=compact_batch=0"),
        members.toString)
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      assert(after == before && after.size == docs.count())

      // An incremental pairing against the compacted store is identical
      // to one against the raw store (same docs → same pairs).
      val newDocs = docs.limit(0) // schema carrier
      val corpus = CorpusStore.readDocs(spark, dir, newDocs.schema)
      val full = Dedup.minhashLshPairs(docs, "doc_id", "text",
          threshold = 0.8, bands = 8, rowsPerBand = 4)
        .as[(Long, Long, Double)].collect().toSet
      val viaStore = Dedup.minhashLshPairs(corpus, "doc_id", "text",
          threshold = 0.8, bands = 8, rowsPerBand = 4)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaStore == full && full.nonEmpty)

      // Second compaction of a single-generation store is a no-op-shaped
      // re-merge: still one committed generation, same documents.
      CorpusStore.compact(spark, dir, "doc_id")
      assert(CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet == before)
    } finally cleanup(dir)
  }

  test("CorpusStore: an uncommitted compacted dir (no manifest) is invisible; sources still count once") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      val before = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      // Simulate a crash after the data rename but BEFORE the manifest
      // write: a fully-written generation dir with no _merged-0.json.
      CorpusStore.readDocs(spark, dir, docs.schema)
        .withColumn("__run", lit("aaaa11")).withColumn("__batch", lit(0L))
        .write.parquet(s"$dir/run=compact_batch=0")
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      assert(after == before, "uncommitted generation leaked into reads")
      // Recovery: the next compact() discards the orphan and commits a
      // fresh generation with exactly-one-copy semantics.
      CorpusStore.compact(spark, dir, "doc_id")
      val recovered = CorpusStore.readDocs(spark, dir, docs.schema)
      assert(recovered.as[(Long, String)].collect().toSet == before)
      assert(recovered.count() == before.size, "duplicate docs after recovery")
    } finally cleanup(dir)
  }

  test("CorpusStore: delete-then-pair equals a fresh run on the remaining docs") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      val dropIds = docs.filter(col("doc_id") % 3 === 0).select("doc_id")
      CorpusStore.delete(spark, dir, "doc_id", dropIds)
      val remaining = CorpusStore.readDocs(spark, dir, docs.schema)
      val expectedDocs = docs.join(dropIds, Seq("doc_id"), "left_anti")
      assert(remaining.as[(Long, String)].collect().toSet ==
        expectedDocs.as[(Long, String)].collect().toSet)
      val pairsAfter = Dedup.minhashLshPairs(remaining, "doc_id", "text",
          threshold = 0.8, bands = 8, rowsPerBand = 4)
        .as[(Long, Long, Double)].collect().toSet
      val pairsFresh = Dedup.minhashLshPairs(expectedDocs, "doc_id", "text",
          threshold = 0.8, bands = 8, rowsPerBand = 4)
        .as[(Long, Long, Double)].collect().toSet
      assert(pairsAfter == pairsFresh && pairsAfter.nonEmpty)
    } finally cleanup(dir)
  }

  test("CorpusStore: expiring a run before any compaction works from path provenance") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      // No prior compact: the expired run's rows are identified from
      // their dir names (run=aaaa11_batch=*), the other branch of the
      // provenance logic from the absorbed-generation case below.
      // A namespace matching nothing must fail loudly — the likeliest
      // cause is a checkpoint path passed where runNamespace(checkpoint)
      // was meant, and silently expiring nothing leaves revoked data
      // live while the retention job reports success.
      val e = intercept[IllegalArgumentException] {
        CorpusStore.expireRuns(spark, dir, "doc_id", Seq("/tmp/ckpt9"))
      }
      assert(e.getMessage.contains("match no"))
      CorpusStore.expireRuns(spark, dir, "doc_id", Seq("aaaa11"))
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      val want = docs.filter(col("doc_id") >= 80)
        .as[(Long, String)].collect().toSet
      assert(after == want)
    } finally cleanup(dir)
  }

  test("CorpusStore: expiring a run namespace removes its docs even after compaction absorbed it") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      // gen 0 absorbs both runs — provenance columns must carry the
      // namespace through, or retention after compaction is impossible.
      CorpusStore.compact(spark, dir, "doc_id")
      val gen = CorpusStore.expireRuns(spark, dir, "doc_id", Seq("bbbb22"))
      assert(gen.contains(1L))
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      val want = docs.filter(col("doc_id") < 80)
        .as[(Long, String)].collect().toSet
      assert(after == want, "expired run's documents must be gone")
      assert(CorpusStore.listMembers(spark, dir).map(_.name) ==
        Seq("run=compact_batch=1"))
    } finally cleanup(dir)
  }

  test("CorpusStore: retrying an already-done expiry is an idempotent success; unknown ns still loud") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      CorpusStore.expireRuns(spark, dir, "doc_id", Seq("aaaa11"))
      // The retry path: a maintenance job re-run after success (or
      // resumed after a crash just past the manifest commit) must
      // no-op-succeed, not throw 'match no documents' — the namespace
      // is recorded as expired in the manifest, distinguishing
      // 'already gone' from 'never present'.
      val gen = CorpusStore.expireRuns(spark, dir, "doc_id", Seq("aaaa11"))
      assert(gen.isDefined, "expiry retry must succeed")
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      assert(after == docs.filter(col("doc_id") >= 80)
        .as[(Long, String)].collect().toSet)
      // Mixed retry: one already-expired + one live namespace drops
      // the live one and succeeds.
      CorpusStore.expireRuns(spark, dir, "doc_id", Seq("aaaa11", "bbbb22"))
      assert(CorpusStore.readDocs(spark, dir, docs.schema).count() == 0)
      // A namespace that was NEVER present anywhere stays a loud error
      // even on a store with an expiry history.
      val e = intercept[IllegalArgumentException] {
        CorpusStore.expireRuns(spark, dir, "doc_id", Seq("deadf00d99"))
      }
      assert(e.getMessage.contains("match no"), e.getMessage)
    } finally cleanup(dir)
  }

  test("CorpusStore: an absorbed generation outliving its delete is still excluded") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      val before = CorpusStore.readDocs(spark, dir, docs.schema)
        .as[(Long, String)].collect().toSet
      CorpusStore.compact(spark, dir, "doc_id") // gen 0
      val extra = Tables.documents(spark, TestSpark.Sf)
        .filter(col("doc_id") >= 120 && col("doc_id") < 125)
        .select("doc_id", "text")
      extra.write.parquet(s"$dir/run=cccc33_batch=0")
      val extraSet = extra.as[(Long, String)].collect().toSet
      CorpusStore.compact(spark, dir, "doc_id") // gen 1 absorbs gen 0
      // Simulate gen 0's best-effort delete failing: re-create its dir
      // (committed manifest _merged-0.json still present). Readers must
      // NOT count its documents twice.
      CorpusStore.readDocs(spark, dir, docs.schema)
        .withColumn("__run", lit(CorpusStore.CompactNs))
        .withColumn("__batch", lit(0L))
        .write.parquet(s"$dir/run=compact_batch=0")
      assert(CorpusStore.listMembers(spark, dir).map(_.name) ==
        Seq("run=compact_batch=1"))
      val after = CorpusStore.readDocs(spark, dir, docs.schema)
      assert(after.count() == before.size + extraSet.size,
        "absorbed generation double-counted")
      assert(after.as[(Long, String)].collect().toSet == before.union(extraSet))
    } finally cleanup(dir)
  }

  test("BandStore: delete swap is recoverable at every crash point") {
    val dir = tmpDir("graft-bs")
    try {
      BandStore.build(docs, "doc_id", "text", dir, P)
      val full = BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet
      val kept = full.filterNot(_._1 % 5 == 0)
      val f = CorpusStore.fileSystem(spark, dir)
      // Crash state A: rewrite fully written to a uniquely-named temp,
      // live dir already moved aside — data/ missing. read() must
      // promote the rewrite (its _SUCCESS marker proves it complete),
      // not throw path-not-found.
      BandStore.read(spark, dir, P).filter(col("doc") % 5 =!= 0)
        .write.parquet(s"$dir/_tmp_data_runa")
      assert(f.rename(new Path(dir, "data"), new Path(dir, "_old_data")))
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == kept)
      assert(!f.exists(new Path(dir, "_old_data")))
      // Crash state B: data/ intact, leftover temp from an aborted
      // rewrite — read() returns the live data and LEAVES the temp (a
      // reader cannot tell crash debris from a concurrent writer's
      // in-flight build; only the writer path cleans temps).
      BandStore.read(spark, dir, P).limit(1)
        .write.parquet(s"$dir/_tmp_data_runb")
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == kept)
      assert(f.exists(new Path(dir, "_tmp_data_runb")))
      // ... and the next maintenance run (writer path) clears it.
      BandStore.delete(spark, dir,
        Seq(-1L).toDF("doc_id")) // no-op delete, but a writer-path op
      assert(!f.exists(new Path(dir, "_tmp_data_runb")))
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == kept)
      // Crash state C: data/ missing, temp exists but is INCOMPLETE
      // (no _SUCCESS — the writer crashed mid-write, before ever
      // touching the live dir... which can only coexist with a missing
      // data/ if the crash interleaved with an older swap). Recovery
      // must restore _old_data, never promote the unverified temp.
      f.mkdirs(new Path(dir, "_tmp_data_runc"))
      assert(f.rename(new Path(dir, "data"), new Path(dir, "_old_data")))
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == kept)
      assert(f.exists(new Path(dir, "data")))
    } finally cleanup(dir)
  }

  test("LmStore: a read never deletes a concurrent merge's in-flight temp; sidecar escapes hostile column names") {
    val dir = tmpDir("graft-lm")
    val lmP = graft.llm.LmStore.Params(None, hashed = true)
    try {
      graft.llm.LmStore.build(docs, "doc_id", "text", dir, lmP)
      val f = CorpusStore.fileSystem(spark, dir)
      // A half-written merge build: only one of the three component
      // tables exists so far. The pre-fix recoverSwap deleted ANY
      // _tmp_model on every read — destroying the concurrent writer's
      // build mid-write; now the temp must survive reads untouched.
      val half = new Path(dir, "_tmp_model_inflight")
      f.mkdirs(new Path(half, "bigrams"))
      val scored = graft.llm.LmStore.score(spark, dir, lmP,
        docs, "doc_id", "text")
      assert(scored.limit(1).count() == 1)
      assert(f.exists(new Path(half, "bigrams")),
        "read() deleted a concurrent writer's in-flight temp")
      f.delete(half, true)
    } finally cleanup(dir)
  }

  test("LmStore sidecar: langCol with quotes and backslashes round-trips") {
    val dir = tmpDir("graft-lm")
    try {
      val hostile = """la"ng\col"""
      val p = graft.llm.LmStore.Params(Some(hostile), hashed = false)
      val renamed = docs.withColumn("""la"ng\col""", lit("en"))
      graft.llm.LmStore.build(renamed, "doc_id", "text", dir, p)
      assert(graft.llm.LmStore.readParams(spark, dir).contains(p),
        "sidecar did not round-trip a quote/backslash column name")
    } finally cleanup(dir)
  }

  test("CorpusStore: replay exclusion survives compaction via provenance columns") {
    val dir = tmpDir("graft-cs")
    try {
      seedStore(dir)
      CorpusStore.compact(spark, dir, "doc_id")
      // A replay of run aaaa11's batch 1 must NOT see batch 1's docs
      // (40..79) on the corpus side even though they now live only
      // inside the compacted generation.
      val seen = CorpusStore.readDocs(spark, dir, docs.schema,
          excludeNs = Some("aaaa11"), excludeFromBatch = 1L)
        .as[(Long, String)].collect().map(_._1).toSet
      assert(seen == docs.as[(Long, String)].collect().map(_._1)
        .filter(id => id < 40 || id >= 80).toSet)
    } finally cleanup(dir)
  }

  // ---- IndexStore ---------------------------------------------------

  // e13's integer-quantized view: every distance downstream is exact
  // integer arithmetic, so store/in-memory comparisons are bit-safe.
  private lazy val emb = Tables.embeddings(spark, Sf)
    .select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000 + 0.5)).as("qv")).cache()
  private val IP = IndexStore.Params(dim = 64, clusters = 4, m = 8, k = 8)

  test("IndexStore round-trip: search from the store equals the in-memory composition") {
    val dir = tmpDir("graft-ix")
    try {
      IndexStore.build(emb, "vec_id", "qv", dir, IP, iters = 1)
      val queries = emb.filter(col("vec_id") < 5)
      val fromStore = IndexStore.searchTopKRerank(spark, dir, IP, emb,
          queries, "vec_id", "qv", k = 3, nprobe = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "qv",
        IP.clusters, iters = 1)
      val assign = Similarity.assignToCentroids(emb, "vec_id", "qv", cents)
      val withC = emb.join(assign, Seq("vec_id"))
      val cb = Similarity.ivfpqTrain(withC, "vec_id", "qv", "cluster",
        cents, IP.m, IP.k, iters = 1, dim = IP.dim)
      val codes = Similarity.ivfpqEncode(withC, "vec_id", "qv", "cluster",
        cents, cb, IP.m, IP.dim)
      val direct = Similarity.ivfpqTopKRerank(codes, cents, cb, emb,
          queries, "vec_id", "qv", k = 3, nprobe = 2, overscan = 4,
          m = IP.m, dim = IP.dim)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(fromStore == direct && fromStore.nonEmpty)
    } finally cleanup(dir)
  }

  test("IndexStore refuses parameter mismatch, missing sidecar, and structural drift") {
    val dir = tmpDir("graft-ix")
    try {
      IndexStore.build(emb, "vec_id", "qv", dir, IP, iters = 1)
      for (bad <- Seq(IP.copy(clusters = 8), IP.copy(m = 4),
                      IP.copy(k = 16), IP.copy(dim = 32))) {
        val e = intercept[IllegalStateException] {
          IndexStore.read(spark, dir, bad)
        }
        assert(e.getMessage.contains("mismatch"), e.getMessage)
      }
      // Structural drift guard: a codebook whose subspace count no
      // longer matches the sidecar (swapped out-of-band) must refuse,
      // not return silently wrong neighbors.
      import scala.jdk.CollectionConverters._
      val good = IndexStore.read(spark, dir, IP).codebook
        .filter(col("subspace") < 4)
      val local = spark.createDataFrame(
        good.collect().toSeq.asJava, good.schema)
      local.write.mode("overwrite").parquet(s"$dir/codebook")
      val drift = intercept[IllegalArgumentException] {
        IndexStore.read(spark, dir, IP)
      }
      assert(drift.getMessage.contains("structurally"), drift.getMessage)
      // No sidecar at all: refuse rather than guess.
      val fs = CorpusStore.fileSystem(spark, dir)
      fs.delete(new Path(dir, "_params.json"), false)
      val e2 = intercept[IllegalStateException] {
        IndexStore.read(spark, dir, IP)
      }
      assert(e2.getMessage.contains("sidecar"), e2.getMessage)
    } finally cleanup(dir)
  }

  test("IndexStore nightly cycle: append encodes with the STORED model; delete is a real takedown") {
    val dir = tmpDir("graft-ix")
    try {
      val c0 = emb.filter(col("vec_id") < 300)
      val inc = emb.filter(col("vec_id") >= 300)
      IndexStore.build(c0, "vec_id", "qv", dir, IP, iters = 1)
      val codes0 = IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet

      IndexStore.append(inc, "vec_id", "qv", dir, IP)
      val ix = IndexStore.read(spark, dir, IP)
      // The appended rows must be inc encoded with the STORED model
      // (never a retrain — that would silently shift every code).
      val incCodes = Similarity.ivfpqEncode(
          inc.join(Similarity.assignToCentroids(inc, "vec_id", "qv",
            ix.centroids), Seq("vec_id")),
          "vec_id", "qv", "cluster", ix.centroids, ix.codebook,
          IP.m, IP.dim)
        .withColumnRenamed("vec_id", "id")
        .as[(Long, String, Seq[Int])].collect().toSet
      val after = ix.codes.as[(Long, String, Seq[Int])].collect().toSet
      assert(after == codes0.union(incCodes) && incCodes.nonEmpty)

      IndexStore.delete(spark, dir, inc.select(col("vec_id")))
      val afterDel = IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet
      assert(afterDel == codes0)
      // A deleted vector can never again surface as a neighbor, even
      // though the raw-vector corpus table still contains it.
      val res = IndexStore.searchTopKRerank(spark, dir, IP, emb,
        emb.filter(col("vec_id") < 5), "vec_id", "qv", k = 3, nprobe = 2)
      assert(res.filter(col("neighbor_id") >= 300).isEmpty)
    } finally cleanup(dir)
  }

  test("IndexStore: takedown delete racing an append surfaces atomically — committed segments fold in, in-flight temps die loudly") {
    val dir = tmpDir("graft-ix")
    try {
      val base = emb.filter(col("vec_id") < 300)
      val committed = emb.filter(col("vec_id").between(300, 349))
      val late = emb.filter(col("vec_id") >= 350)
      IndexStore.build(base, "vec_id", "qv", dir, IP, iters = 1)
      // A COMMITTED append before the delete folds into the rewrite.
      IndexStore.append(committed, "vec_id", "qv", dir, IP)
      // An IN-FLIGHT append segment (fully written with the STORED
      // model, exactly what append stages — but not yet promoted) when
      // the takedown lands.
      val ix = IndexStore.read(spark, dir, IP)
      val seg = Similarity.ivfpqEncode(
          late.join(Similarity.assignToCentroids(late, "vec_id", "qv",
            ix.centroids), Seq("vec_id")),
          "vec_id", "qv", "cluster", ix.centroids, ix.codebook,
          IP.m, IP.dim)
        .withColumnRenamed("vec_id", "id")
      val fs = CorpusStore.fileSystem(spark, dir)
      val inFlight = new Path(dir, "codes/_tmp_seg_9999999999999_rc")
      seg.write.parquet(inFlight.toString)

      IndexStore.delete(spark, dir,
        emb.filter(col("vec_id") % 10 === 0).select("vec_id"))
      val after = IndexStore.read(spark, dir, IP).codes
        .select("id").as[Long].collect().toSet
      // No torn state: every committed vector minus the takedown,
      // nothing from the un-promoted temp.
      val expected = emb.filter(col("vec_id") < 350)
        .select("vec_id").as[Long].collect().toSet.filter(_ % 10 != 0)
      assert(after == expected)
      // The racing appender's temp was SWEPT by the delete's codes/
      // swap (the whole unit was replaced), so its promote rename can
      // only fail loudly — never silently resurrect vectors the
      // takedown should have covered; the appender retries against the
      // post-delete artifact.
      assert(!fs.exists(inFlight),
        "in-flight segment temp survived the delete swap — a later " +
          "promote would resurrect pre-takedown vectors")
      assert(IndexStore.read(spark, dir, IP).codes
        .select("id").as[Long].collect().toSet == expected)
    } finally cleanup(dir)
  }

  test("IndexStore layout-1 artifact (flat codes/, no layout field) reads, serves, and migrates on append") {
    val v2 = tmpDir("graft-ix")
    val v1 = tmpDir("graft-ix1")
    try {
      val c0 = emb.filter(col("vec_id") < 300)
      val inc = emb.filter(col("vec_id") >= 300 && col("vec_id") < 360)
      IndexStore.build(c0, "vec_id", "qv", v2, IP, iters = 1)
      val ix = IndexStore.read(spark, v2, IP)
      // Hand-build the PREVIOUS layout: same model tables, codes as one
      // flat parquet dir, sidecar without a layout field — byte-shaped
      // like every artifact written before codes/ was segmented.
      ix.centroids.write.parquet(s"$v1/centroids")
      ix.codebook.write.parquet(s"$v1/codebook")
      ix.codes.write.parquet(s"$v1/codes")
      val f = CorpusStore.fileSystem(spark, v1)
      graft.llm.ArtifactStore.writeSidecar(f,
        new Path(v1, "_params.json"), IP.render)

      // A code deploy must not brick the artifact: read + serve work
      // on the old layout as-is, and equal the current-layout store.
      def codesSet(d: String) = IndexStore.read(spark, d, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet
      assert(codesSet(v1) == codesSet(v2) && codesSet(v1).nonEmpty)
      val q = emb.filter(col("vec_id") < 5)
      val fromV1 = IndexStore.searchTopKRerank(spark, v1, IP, emb, q,
        "vec_id", "qv", k = 3, nprobe = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
      val fromV2 = IndexStore.searchTopKRerank(spark, v2, IP, emb, q,
        "vec_id", "qv", k = 3, nprobe = 2)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(fromV1 == fromV2 && fromV1.nonEmpty)

      // First append migrates in place (flat dir becomes seg_base) and
      // lands its increment as a sibling segment; contents = union.
      IndexStore.append(inc, "vec_id", "qv", v1, IP)
      assert(f.exists(new Path(v1, "codes/seg_base/_SUCCESS")),
        "layout-1 codes were not migrated to the base segment")
      assert(!f.exists(new Path(v1, "codes/_SUCCESS")),
        "flat layout-1 files still share the dir with segments")
      IndexStore.append(inc, "vec_id", "qv", v2, IP)
      assert(codesSet(v1) == codesSet(v2))

      // Takedown on the migrated store still works end-to-end.
      IndexStore.delete(spark, v1, inc.select(col("vec_id")))
      IndexStore.delete(spark, v2, inc.select(col("vec_id")))
      assert(codesSet(v1) == codesSet(v2))
    } finally { cleanup(v2); cleanup(v1) }
  }

  test("IndexStore compact folds appended segments into one base; contents and search unchanged") {
    val dir = tmpDir("graft-ix")
    try {
      val c0 = emb.filter(col("vec_id") < 300)
      val inc = emb.filter(col("vec_id") >= 300 && col("vec_id") < 360)
      IndexStore.build(c0, "vec_id", "qv", dir, IP, iters = 1)
      IndexStore.append(inc, "vec_id", "qv", dir, IP)
      val before = IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet
      val f = CorpusStore.fileSystem(spark, dir)
      assert(f.listStatus(new Path(dir, "codes"))
        .count(_.getPath.getName.startsWith("seg_")) == 2)
      IndexStore.compact(spark, dir)
      val segs = f.listStatus(new Path(dir, "codes")).toSeq
        .map(_.getPath.getName).filter(_.startsWith("seg_"))
      assert(segs == Seq("seg_base"), segs.toString)
      val after = IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet
      assert(after == before && after.nonEmpty)
    } finally cleanup(dir)
  }

  test("IndexStore: an unpromoted append segment is invisible; the next append clears it") {
    val dir = tmpDir("graft-ix")
    try {
      val c0 = emb.filter(col("vec_id") < 300)
      IndexStore.build(c0, "vec_id", "qv", dir, IP, iters = 1)
      val before = IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet
      // Crash sim: an append died mid-write — its temp has no _SUCCESS
      // and must never surface in a read (torn inverted lists).
      val f = CorpusStore.fileSystem(spark, dir)
      f.mkdirs(new Path(dir, "codes/_tmp_seg_0000000000001_dead"))
      assert(IndexStore.read(spark, dir, IP).codes
        .as[(Long, String, Seq[Int])].collect().toSet == before)
      // The next append (writer path) clears the debris and commits.
      val inc = emb.filter(col("vec_id") >= 300 && col("vec_id") < 320)
      IndexStore.append(inc, "vec_id", "qv", dir, IP)
      assert(!f.exists(new Path(dir, "codes/_tmp_seg_0000000000001_dead")))
      assert(IndexStore.read(spark, dir, IP).codes.count() ==
        before.size + inc.count())
    } finally cleanup(dir)
  }

  test("IndexStore refuses an interrupted rebuild loudly; a completed rebuild clears the marker") {
    val dir = tmpDir("graft-ix")
    try {
      IndexStore.build(emb.filter(col("vec_id") < 300), "vec_id", "qv",
        dir, IP, iters = 1)
      val f = CorpusStore.fileSystem(spark, dir)
      assert(!f.exists(new Path(dir, "_rebuild_in_progress")),
        "a completed build left the rebuild marker behind")
      // Crash sim: write() died after replacing the model tables but
      // before the codes swap — with unchanged params the components
      // pass every structural check, so only the marker stands between
      // the reader and silently wrong neighbors.
      graft.llm.ArtifactStore.writeSidecar(f,
        new Path(dir, "_rebuild_in_progress"), "{}")
      val e = intercept[IllegalStateException] {
        IndexStore.read(spark, dir, IP)
      }
      assert(e.getMessage.contains("interrupted"), e.getMessage)
      // The prescribed recovery — re-run build() — restores service.
      IndexStore.build(emb.filter(col("vec_id") < 300), "vec_id", "qv",
        dir, IP, iters = 1)
      assert(IndexStore.read(spark, dir, IP).codes.count() > 0)
    } finally cleanup(dir)
  }

  test("BandStore recovery promotes the newest complete temp by millis prefix, not lexical name") {
    val dir = tmpDir("graft-bs")
    try {
      BandStore.build(docs, "doc_id", "text", dir, P)
      val f = CorpusStore.fileSystem(spark, dir)
      val newer = BandStore.read(spark, dir, P)
        .filter(col("doc") % 5 =!= 0)
      val newerSet = newer.as[(Long, Int, String)].collect().toSet
      // A stale-but-complete temp from BEFORE the millis-prefix naming
      // scheme: bare letter-leading token, lexically AFTER any digit-
      // leading name. Recovery must rank it OLDEST, not newest.
      BandStore.read(spark, dir, P).filter(col("doc") % 5 === 0)
        .write.parquet(s"$dir/_tmp_data_fadedbeefcafe")
      newer.write.parquet(s"$dir/_tmp_data_0000000000042_aa")
      assert(f.rename(new Path(dir, "data"), new Path(dir, "_old_data")))
      assert(BandStore.read(spark, dir, P)
        .as[(Long, Int, String)].collect().toSet == newerSet,
        "recovery promoted a pre-scheme stale temp over the newest build")
    } finally cleanup(dir)
  }

  // ---- LmStore ------------------------------------------------------

  private lazy val lmDocs =
    Tables.documents(spark, Sf).filter(col("doc_id") < 200)
      .select("doc_id", "lang", "source", "text").cache()
  private val LP = llm.LmStore.Params(langCol = Some("lang"),
    hashed = true)
  private def lmRef = lmDocs.filter(col("source") === "src0")

  private def scoreMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (String, Long, Long)] =
    df.select("doc_id", "lang", "n_bigrams", "lp_sum_e6")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("LmStore round-trip: score from the store equals the ephemeral train+score") {
    val dir = tmpDir("graft-lm")
    try {
      llm.LmStore.build(lmRef, "doc_id", "text", dir, LP)
      val fromStore = scoreMap(llm.LmStore.score(spark, dir, LP,
        lmDocs, "doc_id", "text"))
      val ephemeral = scoreMap(llm.Corpus.lmScore(lmDocs, "doc_id",
        "text", col("source") === "src0", langCol = Some("lang"),
        hashed = true))
      assert(fromStore == ephemeral && fromStore.nonEmpty)
    } finally cleanup(dir)
  }

  test("LmStore refuses parameter mismatch, missing sidecar, and cross-run drift") {
    val dir = tmpDir("graft-lm")
    try {
      llm.LmStore.build(lmRef, "doc_id", "text", dir, LP)
      // Key family and language partitioning are part of the contract.
      for (bad <- Seq(LP.copy(hashed = false), LP.copy(langCol = None)))
        assertThrows[IllegalStateException] {
          llm.LmStore.score(spark, dir, bad, lmDocs, "doc_id", "text")
        }
      // Missing sidecar: refuse, never guess.
      val f = new Path(dir).getFileSystem(
        spark.sessionState.newHadoopConf())
      f.delete(new Path(dir, "_params.json"), false)
      assertThrows[IllegalStateException] {
        llm.LmStore.score(spark, dir, LP, lmDocs, "doc_id", "text")
      }
      // Component tables from DIFFERENT training runs: the bigram and
      // context totals cannot agree; read() refuses the franken-model.
      val m1 = llm.Corpus.lmTrain(lmRef, "doc_id", "text",
        Some("lang"), hashed = true)
      val m2 = llm.Corpus.lmTrain(lmRef.limit(3), "doc_id", "text",
        Some("lang"), hashed = true)
      llm.LmStore.write(llm.Corpus.LmModel(m1.bigrams, m2.contexts,
        m1.tokens), dir, LP)
      assertThrows[IllegalArgumentException] {
        llm.LmStore.read(spark, dir, LP)
      }
    } finally cleanup(dir)
  }

  test("LmStore nightly cycle: append equals retraining on the union; subtract is its exact inverse") {
    val dir = tmpDir("graft-lm")
    try {
      // (src0 ids are the multiples of 20 — parity splits leave one
      // side empty; halve on the id range instead)
      val refA = lmRef.filter(col("doc_id") < 100)
      val refB = lmRef.filter(col("doc_id") >= 100)
      assert(refA.count() > 0 && refB.count() > 0)
      llm.LmStore.build(refA, "doc_id", "text", dir, LP)
      val scoresA = scoreMap(llm.LmStore.score(spark, dir, LP,
        lmDocs, "doc_id", "text"))

      llm.LmStore.append(refB, "doc_id", "text", dir, LP)
      val afterAppend = scoreMap(llm.LmStore.score(spark, dir, LP,
        lmDocs, "doc_id", "text"))
      val full = scoreMap(llm.Corpus.lmScore(lmDocs, "doc_id", "text",
        col("source") === "src0", langCol = Some("lang"),
        hashed = true))
      assert(afterAppend == full)
      assert(afterAppend != scoresA) // the increment actually moved scores

      // Takedown: subtracting B restores the A-only model exactly —
      // counts are additive, so no trace of B's documents survives.
      llm.LmStore.subtract(refB, "doc_id", "text", dir, LP)
      val afterSubtract = scoreMap(llm.LmStore.score(spark, dir, LP,
        lmDocs, "doc_id", "text"))
      assert(afterSubtract == scoresA)
    } finally cleanup(dir)
  }

  test("LmStore: takedown subtract racing an append surfaces atomically at every commit point") {
    val dir = tmpDir("graft-lm")
    try {
      val refA = lmRef.filter(col("doc_id") < 100)
      val refB = lmRef.filter(col("doc_id") >= 100)
      val dead = refA.filter(col("doc_id") % 40 === 0)
      assert(refB.count() > 0 && dead.count() > 0)
      llm.LmStore.build(refA, "doc_id", "text", dir, LP)
      val f = CorpusStore.fileSystem(spark, dir)

      // Commit point A: an appender's replacement model (A ∪ B) is
      // FULLY WRITTEN — complete temp, every component _SUCCESS — but
      // not yet promoted when the takedown subtract lands. The
      // subtract applies to the committed base only; the torn-window
      // model stays invisible.
      def writeTemp(tmp: String, ref: org.apache.spark.sql.DataFrame)
          : Unit = {
        val m = llm.Corpus.lmTrain(ref, "doc_id", "text", Some("lang"),
          hashed = true)
        m.bigrams.withColumnRenamed("__lang", "lang")
          .write.parquet(s"$tmp/bigrams")
        m.contexts.withColumnRenamed("__lang", "lang")
          .write.parquet(s"$tmp/contexts")
        m.tokens.withColumnRenamed("__lang", "lang")
          .write.parquet(s"$tmp/tokens")
      }
      val inFlight = s"$dir/_tmp_model_0000000000050_ab"
      writeTemp(inFlight, refA.unionByName(refB))
      llm.LmStore.subtract(dead, "doc_id", "text", dir, LP)
      val afterTakedown = scoreMap(llm.LmStore.score(spark, dir, LP,
        lmDocs, "doc_id", "text"))
      val survivorsOnly = scoreMap(llm.Corpus.lmScore(lmDocs, "doc_id",
        "text", col("source") === "src0" && col("doc_id") < 100 &&
          col("doc_id") % 40 =!= 0,
        langCol = Some("lang"), hashed = true))
      assert(afterTakedown == survivorsOnly,
        "takedown must land on the committed base; the in-flight " +
          "append stayed invisible")
      // The appender's temp was SWEPT by the subtract (writer-path
      // temp hygiene — maintenance ops are single-writer, so any temp
      // a writer finds is crash debris): a later promote can only
      // fail LOUDLY — never silently resurrect the pre-takedown
      // counts its temp still carries.
      assert(!f.exists(new Path(inFlight)),
        "in-flight append temp survived the subtract swap")
      assertThrows[java.io.IOException] {
        graft.llm.ArtifactStore.commitSwap(f, dir, "model",
          new Path(inFlight), Seq("bigrams", "contexts", "tokens"),
          "LmStore", "append")
      }

      // Commit point B: an append COMMITTED before the subtract reads
      // the model folds in — the takedown then applies to A ∪ B.
      // (Rebuilt from scratch: point A's subtract already removed
      // `dead` from the live model.)
      llm.LmStore.build(refA, "doc_id", "text", dir, LP)
      llm.LmStore.append(refB, "doc_id", "text", dir, LP)
      llm.LmStore.subtract(dead, "doc_id", "text", dir, LP)
      // `dead` drew only from A (doc_id < 100): appended docs whose
      // ids also divide 40 were never taken down and must stay.
      val unionMinusDead = scoreMap(llm.Corpus.lmScore(lmDocs, "doc_id",
        "text", col("source") === "src0" &&
          !(col("doc_id") < 100 && col("doc_id") % 40 === 0),
        langCol = Some("lang"), hashed = true))
      assert(scoreMap(llm.LmStore.score(spark, dir, LP, lmDocs,
        "doc_id", "text")) == unionMinusDead,
        "a committed append must fold into the takedown's rewrite")

      // Commit point C: the mirror race — a TORN maintenance temp
      // (one component's _SUCCESS missing) while a serve runs. The
      // serve reads the committed model; the torn temp is neither
      // promoted nor deleted by the read path (its writer may still
      // be alive).
      val torn = s"$dir/_tmp_model_0000000000060_cd"
      writeTemp(torn, refA)
      f.delete(new Path(s"$torn/tokens/_SUCCESS"), false)
      assert(scoreMap(llm.LmStore.score(spark, dir, LP, lmDocs,
        "doc_id", "text")) == unionMinusDead)
      assert(f.exists(new Path(torn)),
        "a READ deleted a maintenance writer's in-flight temp")
    } finally cleanup(dir)
  }

  // ---- TokenizerStore -------------------------------------------------

  private val TP = graft.llm.TokenizerStore.Params(merges = 40,
    minCount = 1L)

  private def tokenCountSet(dir: String): Set[(Long, Long)] =
    graft.llm.TokenizerStore.tokenCounts(spark, dir, TP, docs,
        "doc_id", "text")
      .select("doc_id", "n_bpe_tokens")
      .as[(Long, Long)].collect().toSet

  test("TokenizerStore layout-1 artifact (root sidecar) reads, serves, and migrates on retrain") {
    val v2 = tmpDir("graft-tk")
    val v1 = tmpDir("graft-tk1")
    try {
      graft.llm.TokenizerStore.build(docs, "doc_id", "text", v2, TP)
      // Hand-build the PREVIOUS layout: same model/ tables, sidecar at
      // the store ROOT without a layout field — byte-shaped like every
      // artifact written before the sidecar moved inside the swap unit.
      val (m, w) = graft.llm.TextAnalysis.bpeTrainFull(docs, "doc_id",
        "text", TP.merges, TP.minCount)
      m.write.parquet(s"$v1/model/merges")
      w.write.parquet(s"$v1/model/segments")
      val f = CorpusStore.fileSystem(spark, v1)
      graft.llm.ArtifactStore.writeSidecar(f,
        new Path(v1, "_params.json"), TP.render)

      // A code deploy must not brick the artifact: params resolve from
      // the legacy root sidecar and serving equals the current layout.
      assert(graft.llm.TokenizerStore.readParams(spark, v1).contains(TP))
      val counts1 = tokenCountSet(v1)
      assert(counts1 == tokenCountSet(v2) && counts1.nonEmpty)

      // A retrain migrates: the promoted model/ carries its own
      // sidecar and the stale root copy is gone, so the new model can
      // never be paired with the old parameters.
      graft.llm.TokenizerStore.build(docs, "doc_id", "text", v1, TP)
      assert(f.exists(new Path(v1, "model/_params.json")))
      assert(!f.exists(new Path(v1, "_params.json")),
        "stale layout-1 root sidecar survived the retrain")
      assert(tokenCountSet(v1) == counts1)
    } finally { cleanup(v2); cleanup(v1) }
  }

  test("TokenizerStore first write is swap-disciplined: a torn build is never promoted") {
    val dir = tmpDir("graft-tk")
    try {
      graft.llm.TokenizerStore.build(docs, "doc_id", "text", dir, TP)
      val f = CorpusStore.fileSystem(spark, dir)
      // The first write went through the temp+verify+rename path: the
      // sidecar lives inside model/, no root copy, no temp debris.
      assert(f.exists(new Path(dir, "model/_params.json")))
      assert(!f.exists(new Path(dir, "_params.json")))
      assert(!f.listStatus(new Path(dir)).exists(
        _.getPath.getName.startsWith("_tmp_model_")))

      // Crash sim: a build died after writing its sidecar and merges
      // but before segments committed (_SUCCESS missing), with no live
      // model. Recovery must NOT promote the torn temp — a truncated
      // tail passes the contiguity check, so promotion would serve
      // silently wrong token counts; refusal must be loud instead.
      val (m, _) = graft.llm.TextAnalysis.bpeTrainFull(docs, "doc_id",
        "text", TP.merges, TP.minCount)
      val tmp = s"$dir/_tmp_model_0000000000099_bb"
      graft.llm.ArtifactStore.writeSidecar(f,
        new Path(tmp, "_params.json"), TP.render)
      m.write.parquet(s"$tmp/merges")
      f.mkdirs(new Path(tmp, "segments")) // torn: no _SUCCESS
      f.delete(new Path(dir, "model"), true)
      val e = intercept[IllegalStateException] { tokenCountSet(dir) }
      assert(e.getMessage.contains("sidecar"), e.getMessage)
      assert(f.exists(new Path(tmp)), "recovery deleted the torn temp")
    } finally cleanup(dir)
  }

  test("TokenizerStore: retrain racing a serve surfaces atomically at every commit point") {
    val dir = tmpDir("graft-tk")
    try {
      graft.llm.TokenizerStore.build(docs, "doc_id", "text", dir, TP)
      val counts40 = tokenCountSet(dir)
      val f = CorpusStore.fileSystem(spark, dir)

      // The racing retrain: a DIFFERENT vocabulary (10 merges), fully
      // written to a unique temp — sidecar inside the unit, both
      // component _SUCCESS markers — the instant before its promote.
      val TP10 = graft.llm.TokenizerStore.Params(merges = 10,
        minCount = 1L)
      val (m10, w10) = graft.llm.TextAnalysis.bpeTrainFull(docs,
        "doc_id", "text", TP10.merges, TP10.minCount)
      def writeRetrainTemp(tmp: String): Unit = {
        graft.llm.ArtifactStore.writeSidecar(f,
          new Path(tmp, "_params.json"),
          graft.llm.ArtifactStore.withLayout(TP10.render, 2))
        m10.write.parquet(s"$tmp/merges")
        w10.write.parquet(s"$tmp/segments")
      }
      val inFlight = s"$dir/_tmp_model_0000000000070_ef"
      writeRetrainTemp(inFlight)

      // Commit point A: retrain written but NOT promoted — a serve
      // still reads the OLD vocabulary wholesale (the temp is
      // invisible; the read path neither promotes nor deletes it).
      assert(tokenCountSet(dir) == counts40,
        "an unpromoted retrain leaked into a serve")
      assert(f.exists(new Path(inFlight)),
        "a READ deleted a retrainer's in-flight temp")

      // Commit point B: the retrainer crashed MID-SWAP — live model
      // renamed aside, temp complete, promote rename never ran. The
      // next serve's recovery rolls FORWARD to the complete retrain;
      // params and tables move as ONE unit, so serving with the old
      // parameters refuses loudly (never a silent franken-serve) and
      // the new vocabulary serves exactly its own token counts.
      assert(f.rename(new Path(dir, "model"), new Path(dir, "_old_model")))
      val e = intercept[IllegalStateException] { tokenCountSet(dir) }
      assert(e.getMessage.contains("mismatch"), e.getMessage)
      val served10 = graft.llm.TokenizerStore.tokenCounts(spark, dir,
          TP10, docs, "doc_id", "text")
        .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toSet
      val ephemeral10 = graft.llm.TextAnalysis.bpeTokenCountsWith(docs,
          "doc_id", "text", w10)
        .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toSet
      assert(served10 == ephemeral10 && served10 != counts40,
        "rolled-forward retrain must serve its own vocabulary wholesale")
      assert(!f.exists(new Path(dir, "_old_model")),
        "roll-forward left the displaced model behind")

      // Commit point C: the same crash with a TORN retrain temp (one
      // component _SUCCESS missing) — recovery rolls BACK to the
      // displaced model; the torn build is never promoted.
      val torn = s"$dir/_tmp_model_0000000000080_gh"
      graft.llm.ArtifactStore.writeSidecar(f,
        new Path(torn, "_params.json"),
        graft.llm.ArtifactStore.withLayout(TP.render, 2))
      m10.write.parquet(s"$torn/merges")
      f.mkdirs(new Path(torn, "segments")) // torn: no _SUCCESS
      assert(f.rename(new Path(dir, "model"), new Path(dir, "_old_model")))
      assert(graft.llm.TokenizerStore.tokenCounts(spark, dir, TP10,
          docs, "doc_id", "text")
        .select("doc_id", "n_bpe_tokens").as[(Long, Long)]
        .collect().toSet == served10,
        "recovery must restore the displaced model, not promote a torn build")
    } finally cleanup(dir)
  }

  test("stores refuse live components whose _SUCCESS marker is gone (torn out-of-band)") {
    val tk = tmpDir("graft-tk")
    val ixd = tmpDir("graft-ix")
    try {
      // No promoted model lacks its markers (commitSwap verifies them
      // before the rename), so a missing one means the live tables
      // were torn or edited out-of-band — a truncated merge tail still
      // passes the contiguity check, so the guard must fire first.
      graft.llm.TokenizerStore.build(docs, "doc_id", "text", tk, TP)
      val f = CorpusStore.fileSystem(spark, tk)
      f.delete(new Path(tk, "model/segments/_SUCCESS"), false)
      val e = intercept[IllegalArgumentException] { tokenCountSet(tk) }
      assert(e.getMessage.contains("_SUCCESS"), e.getMessage)

      IndexStore.build(emb.filter(col("vec_id") < 300), "vec_id", "qv",
        ixd, IP, iters = 1)
      val fi = CorpusStore.fileSystem(spark, ixd)
      fi.delete(new Path(ixd, "codebook/_SUCCESS"), false)
      val e2 = intercept[IllegalArgumentException] {
        IndexStore.read(spark, ixd, IP)
      }
      assert(e2.getMessage.contains("_SUCCESS"), e2.getMessage)
    } finally { cleanup(tk); cleanup(ixd) }
  }
}
