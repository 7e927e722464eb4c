package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Scalars

/** Crossref works-message JSON → intermediate schema.
  *
  * This is the engine half of the reference's biggest feed
  * (ref: sources/crossref.py:217-242 — `span-import -i crossref` over a
  * zstd snapshot; ~80% of all records flow through it). The reference
  * shells out to an external converter; here the whole mapping is a
  * typed `from_json` + one `select` of codegen'd Column expressions —
  * schema-pruned, whole-stage-codegen'd, and shuffle-free, so at 100 TB
  * it is a pure map over the scan with no driver involvement.
  *
  * Field semantics follow the public Crossref works-message layout and
  * the conventions the reference's downstream tasks rely on
  * (ref: sources/crossref.py:433-451 jq `.doi`; 578-653 prefix →
  * canonical-name mapping; conversions.py:494 DOI lowercasing;
  * conversions.py:155-156 base64 record ids):
  *
  *  - record id   `ai-49-<urlsafe-base64(doi), unpadded>` (source 49)
  *  - title       first `title` element, joined with the first
  *                `subtitle` element by " : " when present
  *  - issn/eissn  from `issn-type` entries, split print vs electronic
  *  - date        `issued.date-parts` padded to YYYY-MM-DD (missing
  *                month/day default to 01, the year-only convention)
  *  - authors     "Family, Given" for persons (concat_ws skips a null
  *                given), the literal `name` for org contributors
  *  - genre       work `type` via [[GenreMap]], default "document"
  *  - abstract    JATS markup stripped
  *  - validity    records without a DOI, without a non-empty title, or
  *                with an implausible year (outside
  *                [1500, year(asOf)+2]) are dropped — the
  *                converter-rejection analog. Publishers routinely
  *                post-date next-year issues, hence the +2 headroom;
  *                the bound is derived from a caller-supplied `asOf`
  *                rather than a constant so the filter never silently
  *                starts dropping legitimate records as wall-clock
  *                time passes a hardcoded year.
  */
object Crossref {

  val SourceId = "49"
  val Format = "ElectronicArticle"
  val MinYear = 1500

  /** Upper plausibility bound for the issued year, relative to the
    * pipeline's reference date. */
  def maxYear(asOf: java.time.LocalDate): Int = asOf.getYear + 2

  /** The message fields the mapping reads (a works-message subset).
    * Parsing with an explicit schema keeps the JSON scan pruned: Jackson
    * only materializes these paths, not the full message. */
  val MessageSchema: StructType = StructType(Seq(
    StructField("DOI", StringType),
    StructField("member", StringType),
    StructField("type", StringType),
    StructField("title", ArrayType(StringType)),
    StructField("subtitle", ArrayType(StringType)),
    StructField("container-title", ArrayType(StringType)),
    StructField("publisher", StringType),
    StructField("volume", StringType),
    StructField("issue", StringType),
    StructField("page", StringType),
    StructField("issn-type", ArrayType(StructType(Seq(
      StructField("value", StringType),
      StructField("type", StringType))))),
    StructField("issued", StructType(Seq(
      StructField("date-parts", ArrayType(ArrayType(IntegerType)))))),
    StructField("indexed", StructType(Seq(
      StructField("date-time", StringType)))),
    StructField("author", ArrayType(StructType(Seq(
      StructField("given", StringType),
      StructField("family", StringType),
      StructField("name", StringType),
      StructField("sequence", StringType))))),
    StructField("license", ArrayType(StructType(Seq(
      StructField("URL", StringType),
      StructField("content-version", StringType),
      StructField("delay-in-days", IntegerType))))),
    StructField("subject", ArrayType(StringType)),
    StructField("language", StringType),
    StructField("URL", StringType),
    StructField("abstract", StringType)))

  /** Crossref work type → intermediate-schema genre. Unlisted types
    * (dataset, component, ...) fall through to "document". */
  val GenreMap: Map[String, String] = Map(
    "journal-article" -> "article",
    "book-chapter" -> "bookitem",
    "proceedings-article" -> "proceeding",
    "book" -> "book",
    "monograph" -> "book",
    "reference-book" -> "book",
    "report" -> "report",
    "dissertation" -> "thesis")

  /** ISO639-1 → the 3-letter codes the intermediate schema uses;
    * unknown/null → "eng" (the reference's default). */
  val Lang3: Map[String, String] = Map(
    "en" -> "eng", "de" -> "deu", "fr" -> "fra", "es" -> "spa",
    "zh" -> "zho", "it" -> "ita", "pt" -> "por", "nl" -> "nld")

  /** Parse a raw message-JSON string column into a typed `msg` struct. */
  def parse(raw: DataFrame, jsonCol: String): DataFrame =
    raw.withColumn("msg", from_json(col(jsonCol), MessageSchema))

  /** CrossrefUniqItems/Snapshot (ref: sources/crossref.py:136-214):
    * newest message per DOI by indexed timestamp — the step that turns
    * an append-only harvest into the current-state feed. Hash shuffle
    * on DOI + in-partition sort; never a global sort.
    *
    * Keying and ordering details that matter for a correct snapshot:
    *  - the key is the NORMALIZED DOI ([[Scalars.normalizeDoi]]) — the
    *    same form [[toIntermediate]] dedups on; raw-form keying would
    *    let case/URL variants of one work both survive and emit two
    *    rows with the same record_id, one stale;
    *  - ordering parses the timestamp (try_to_timestamp — lexicographic
    *    string order misranks mixed-precision ISO stamps), falls back
    *    to the raw string, and ends with the raw message column
    *    (`rawCol`, the string the caller parsed from) so
    *    equal-timestamp re-deliveries resolve deterministically
    *    (latestPerKey's documented unique-tiebreaker contract). The raw
    *    string fully determines the parsed struct and is an EXISTING
    *    attribute — tie-breaking on `msg` itself would make the window
    *    analyzer project a second materialized copy of the whole struct
    *    as a sort key, ~doubling shuffle width on the 6 TB-shaped path.
    * Messages without a DOI are filtered BEFORE the window: they are
    * dropped by [[toIntermediate]]'s validity filter regardless, and
    * letting them through would collapse every null-DOI message into
    * one null-keyed partition — at the 6 TB production shape that is a
    * single straggler task ranking rows that get discarded anyway. */
  def snapshotLatest(parsed: DataFrame,
                     rawCol: String = "msg_json"): DataFrame = {
    val dt = col("msg")("indexed")("date-time")
    graft.operators.Ops.latestPerKey(
      Seq(Scalars.normalizeDoi(col("msg")("DOI"))),
      Seq(try_to_timestamp(dt), dt, col(rawCol)))(
      parsed.filter(col("msg")("DOI").isNotNull))
  }

  private def urlSafeBase64(c: Column): Column =
    translate(Scalars.base64Id(c), "+/", "-_")

  /** The span-import analog: one validity filter + one projection.
    * Every output is a plain string/column (arrays joined) so the frame
    * is sink- and oracle-friendly as-is. `asOf` anchors the year
    * plausibility bound (see [[maxYear]]); callers pass their pipeline
    * reference date explicitly so reruns are reproducible. */
  def toIntermediate(parsed: DataFrame,
                     asOf: java.time.LocalDate): DataFrame = {
    val m = col("msg")
    val doi = Scalars.normalizeDoi(m("DOI"))
    val title0 = try_element_at(m("title"), lit(1))
    // Live Crossref frequently ships "subtitle": [""] — an empty
    // subtitle must not leave a dangling " : " separator.
    val subtitle0 = nullif(try_element_at(m("subtitle"), lit(1)), lit(""))
    val firstParts = try_element_at(m("issued")("date-parts"), lit(1))
    val year = try_element_at(firstParts, lit(1))
    val month = coalesce(try_element_at(firstParts, lit(2)), lit(1))
    val day = coalesce(try_element_at(firstParts, lit(3)), lit(1))

    def issnsOf(kind: String): Column =
      array_join(array_sort(transform(
        filter(m("issn-type"), e => e("type") === kind), e => e("value"))), ",")

    val pageParts = split(m("page"), "-")
    val authors = transform(m("author"), a =>
      coalesce(nullif(concat_ws(", ", a("family"), a("given")), lit("")),
        a("name")))

    parsed
      .filter(doi.isNotNull &&
        length(trim(coalesce(title0, lit("")))) > 0 &&
        year.between(MinYear, maxYear(asOf)))
      .select(
        concat(lit(s"ai-$SourceId-"), urlSafeBase64(doi)).as("record_id"),
        lit(SourceId).as("source_id"),
        lit(Format).as("format"),
        Scalars.mapLookup(m("type"), GenreMap, lit("document")).as("genre"),
        m("type").as("doc_type"),
        doi.as("doi"),
        Scalars.doiPrefix(doi).as("prefix"),
        concat_ws(" : ", title0, subtitle0).as("title"),
        try_element_at(m("container-title"), lit(1)).as("jtitle"),
        issnsOf("print").as("issns"),
        issnsOf("electronic").as("eissns"),
        m("volume").as("volume"),
        m("issue").as("issue"),
        try_element_at(pageParts, lit(1)).as("spage"),
        try_element_at(pageParts, lit(2)).as("epage"),
        m("page").as("pages"),
        format_string("%04d-%02d-%02d", year, month, day).as("date"),
        array_join(authors, "; ").as("authors"),
        m("publisher").as("publisher"),
        coalesce(m("URL"), concat(lit("https://doi.org/"), doi)).as("url"),
        Scalars.mapLookup(m("language"), Lang3, lit("eng")).as("lang"),
        array_join(m("subject"), ",").as("subjects"),
        regexp_replace(m("abstract"), "</?jats:[^>]+>", "").as("abstract"))
  }

  /** Attach `mega_collection` from a (prefix, name) members table —
    * `"<canonical name> (CrossRef)"`, UNDEFINED when the registrant is
    * not in the members dump (ref: sources/crossref.py:620-640; the
    * reference falls back to a per-prefix API call, which is ingest).
    * The members side is a dimension of ~30k rows at production scale —
    * always broadcast. */
  def withCollections(is: DataFrame, members: DataFrame): DataFrame =
    is.join(broadcast(members), Seq("prefix"), "left")
      .withColumn("mega_collection",
        concat(coalesce(col("name"), lit("UNDEFINED")), lit(" (CrossRef)")))
      .drop("name")

  /** CrossrefPrefixMapping ∘ Diff (ref: sources/crossref.py:577-680):
    * for each DOI prefix actually present in the data, compare the
    * members dump's canonical name against the currently configured
    * collection, and keep only the drifted rows. Distinct-prefix set is
    * one partial-aggregated shuffle over the data; both dimension joins
    * broadcast. */
  def prefixMappingDiff(is: DataFrame, members: DataFrame,
                        current: DataFrame): DataFrame =
    is.select("prefix").distinct()
      .join(broadcast(members), Seq("prefix"), "left")
      .select(col("prefix"),
        coalesce(col("name"), lit("UNDEFINED")).as("canonical_name"))
      .join(broadcast(current), Seq("prefix"))
      .filter(concat(col("canonical_name"), lit(" (CrossRef)")) =!=
        col("current_collection"))
}
