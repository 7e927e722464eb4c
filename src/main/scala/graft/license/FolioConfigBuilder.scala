package graft.license

/** FOLIO filter-config builder — the engine half of the reference's
  * *production* license-config path (`AILicensingViaFolio`,
  * workflows/ai.py:345-371, consumes `FolioFilterConfigFreeze`,
  * sources/folio.py:56-77, which runs `span-freeze` against the FOLIO
  * Okapi API).
  *
  * The FOLIO discovery rows carry the same metadata-usage fields as the
  * AMSL API they replaced; the dispatch the production path needs is
  * the *reduced* shape the reference documents at
  * sources/amsl.py:722-871 ("We only need ISIL and holdings file"):
  *
  *   - rows labeled `GOLD_OA_LISTE` are outdated and skipped
  *     (amsl.py:836-838)
  *   - only the `UBL-ai` shard participates (amsl.py:839-840)
  *   - `evaluateHoldingsFileForLibrary == "no"` rows are skipped
  *     (amsl.py:841-842)
  *   - rows missing ISIL or document URI are skipped (amsl.py:843-844)
  *   - per ISIL: `AND(source ∈ sids, holdings(files = prefix + uri))`
  *     (amsl.py:855-869)
  *
  * plus the FOLIO-only *expand* step (`span-freeze -expand
  * '{"finc-DHSN": ["DE-Bn3", ...]}'`, folio.py:63-70): a pseudo-ISIL
  * group fans its rows out to every member ISIL before grouping, so
  * consortium selections tag each member library.
  *
  * Output trees share [[FilterExpr]] with [[AmslConfigBuilder]] and the
  * same [[Licensing.tag]] compile path — config compilation is
  * driver-side and tiny; the compiled predicates broadcast into the
  * codegen'd data-plane plan.
  */
case class FolioRow(
    isil: String,
    sourceId: String,
    dokumentURI: String,
    dokumentLabel: Option[String] = None,
    shardLabel: Option[String] = Some(FolioConfigBuilder.AiShard),
    evaluateHoldingsFileForLibrary: Option[String] = None)

object FolioConfigBuilder {
  import FilterExpr._

  /** Only this shard participates in AI licensing (amsl.py:839). */
  val AiShard = "UBL-ai"

  /** Outdated document label, always skipped (amsl.py:836-838). */
  val SkippedLabels: Set[String] = Set("GOLD_OA_LISTE")

  /** Build per-ISIL filter trees from FOLIO metadata-usage rows.
    *
    * @param prefix download prefix prepended to every document URI
    *               (amsl.py:846-848 `uri-download-prefix`)
    * @param expand pseudo-ISIL → member ISILs (folio.py:63); a group
    *               row is replayed for every member, then the group
    *               key itself is dropped
    */
  def build(rows: Seq[FolioRow], prefix: String = "",
            expand: Map[String, Seq[String]] = Map.empty): Map[String, FilterExpr] = {
    val expanded = rows.flatMap { row =>
      expand.get(row.isil) match {
        case Some(members) => members.map(m => row.copy(isil = m))
        case None          => Seq(row)
      }
    }

    // Output lists are sorted, so no insertion-order machinery: the
    // reference's defaultdict(set) fold (amsl.py:845-853) reduces to a
    // filter + groupBy here.
    expanded
      .filterNot { row =>
        row.dokumentLabel.exists(SkippedLabels.contains) ||
        !row.shardLabel.contains(AiShard) ||
        row.evaluateHoldingsFileForLibrary.contains("no") ||
        row.isil.trim.isEmpty || row.dokumentURI.trim.isEmpty
      }
      .groupBy(_.isil)
      .map { case (isil, rows) =>
        isil -> And(Seq(
          SourceIn(rows.map(_.sourceId).distinct.sorted),
          Holdings(rows.map(prefix + _.dokumentURI).distinct.sorted)))
      }
  }
}
