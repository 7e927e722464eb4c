package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** BASE (Bielefeld Academic Search Engine, source 126) on-the-fly
  * fixes — one of the six production AI feeds (workflows/ai.py:134-141,
  * AIExport requires BaseFix) — re-expressing `BaseFix.run`
  * (sources/base.py:141-215) as one codegen'd projection over the
  * NDJSON dump lines:
  *
  *   - whole-line `DE-15-FID` → `FID-MEDIEN-DE-15` ISIL rename
  *     (base.py:178, a byte-level replace before parsing — applied
  *     here the same way, on the raw line)
  *   - `recordtype` forced to `"default"` (base.py:181, refs #23424)
  *   - `id` strips `=` (base64 padding decodes fine without it,
  *     base.py:182)
  *   - title / title_full / title_short / title_sort truncated to
  *     4000 chars (SOLR facet-field length limit, base.py:184-190)
  *   - `author` is string-or-list in the feed: a string truncates
  *     directly; a list truncates each element, passing empty/null
  *     elements through untouched (base.py:191-202)
  *   - `author_sort` truncates; `author_facet` truncates per element
  *     (base.py:203-209)
  *   - `publishDate` keeps only the first 4-digit year if one occurs,
  *     else stays as-is (base.py:155,210-213)
  *
  * The reference rewrites the JSON doc in place; the engine emits the
  * fixed fields as typed columns (the downstream SOLR-export mapping
  * consumes columns, not JSON text). `author_is_list` records which
  * dispatch branch fired so the string-vs-list behavior itself is
  * oracle-checkable.
  *
  * Scale shape: pure per-row projection — no shuffle, no UDF; JSON
  * field access and truncation all stay inside whole-stage codegen.
  */
object Base {

  /** SOLR facet-field value limit (base.py:155). */
  val MaxLength = 4000

  private val Year = "[1-9][0-9][0-9][0-9]"

  private def jstr(line: Column, path: String): Column =
    get_json_object(line, path)

  private def truncate(c: Column): Column = substring(c, 1, MaxLength)

  private def truncateAll(c: Column): Column = transform(c, truncate(_))

  /** Apply the BaseFix transformations to a frame of raw NDJSON dump
    * lines (column `lineCol`). One row in, one fixed row out. */
  def fix(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    // The reference renames the ISIL at the byte level before parsing;
    // same here — the token cannot occur inside another value in this
    // feed's shape (it is an ISIL list member).
    val l = replace(col(lineCol), lit("DE-15-FID"), lit("FID-MEDIEN-DE-15"))
    // get_json_object returns scalars unquoted but arrays as JSON text.
    // Dispatch on PARSE SUCCESS, not on a leading '[': a string author
    // like "[Verfasser unbekannt]" (bracketed anonymous-author
    // conventions are real in this feed) starts with '[' but is not
    // JSON — from_json yields null for it, so it correctly takes the
    // string branch instead of being silently nulled.
    val authorRaw = jstr(l, "$.author")
    val authorParsed = from_json(authorRaw, ArrayType(StringType))
    val authorIsList = when(authorRaw.isNotNull, authorParsed.isNotNull)
    val pd = jstr(l, "$.publishDate")
    lines.select(
      replace(jstr(l, "$.id"), lit("="), lit("")).as("id"),
      lit("default").as("recordtype"),
      truncate(jstr(l, "$.title")).as("title"),
      truncate(jstr(l, "$.title_full")).as("title_full"),
      truncate(jstr(l, "$.title_short")).as("title_short"),
      truncate(jstr(l, "$.title_sort")).as("title_sort"),
      when(authorRaw.isNull, lit(null).cast(ArrayType(StringType)))
        .when(authorIsList, truncateAll(authorParsed))
        .otherwise(array(truncate(authorRaw))).as("author"),
      authorIsList.as("author_is_list"),
      truncate(jstr(l, "$.author_sort")).as("author_sort"),
      truncateAll(from_json(jstr(l, "$.author_facet"), ArrayType(StringType)))
        .as("author_facet"),
      when(pd.rlike(Year), regexp_extract(pd, Year, 0)).otherwise(pd)
        .as("publish_date"),
      from_json(jstr(l, "$.institution"), ArrayType(StringType))
        .as("institution"))
  }
}
