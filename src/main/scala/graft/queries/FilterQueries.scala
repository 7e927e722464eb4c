package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.export.SolrExport
import graft.functions.Scalars
import graft.operators.Ops

/** Projections/filters P1–P11, scalar functions F1–F13, and the
  * scan/sink-shaped ops S4/S11/S13 from SURVEY.md §2. All scalar work is
  * built-in Column functions (no UDFs) so predicates and projections
  * push down to the parquet scan. */
object FilterQueries {

  def all: Seq[Q] = Seq(

    // P1 — project + explode (ref: sources/crossref.py:286-293, jq `[]?`).
    Q("p1_project_explode",
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY token""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
    },

    // P2 — multi-field CSV projection (ref: sources/crossref.py:508-536).
    Q("p2_csv_projection",
      """SELECT concat_ws(',', o_orderkey, o_orderstatus,
        |                 strftime(o_orderdate, '%Y-%m-%d')) AS line
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
                date_format(col("o_orderdate"), "yyyy-MM-dd")).as("line"))
    },

    // P3 — local-data extract: narrow projection for dedup
    // (ref: workflows/ai.py:250-280, span-local-data).
    Q("p3_local_extract",
      "SELECT doc_id, source, lang, n_chars FROM documents WHERE n_chars > 200") { (s, d) =>
      Tables.documents(s, d)
        .filter(col("n_chars") > 200)
        .select("doc_id", "source", "lang", "n_chars")
    },

    // P4 — regex row filter (ref: sources/crossref.py:440, grep -o).
    Q("p4_regex_filter",
      """SELECT p_partkey, p_type FROM part
        |WHERE regexp_matches(p_type, '(ANODIZED|PLATED) [A-Z]+$')""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").rlike("(ANODIZED|PLATED) [A-Z]+$"))
        .select("p_partkey", "p_type")
    },

    // P5 — whitelist semi-join (ref: sources/doaj.py:190-217).
    Q("p5_whitelist_semi",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin) { (s, d) =>
      Ops.whitelist(Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"), "c_custkey")
        .select("o_orderkey", "o_custkey")
    },

    // P6 — blacklist anti-join (ref: sources/doaj.py:128-137).
    Q("p6_blacklist_anti",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin) { (s, d) =>
      Ops.blacklist(Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"), "c_custkey")
        .select("o_orderkey", "o_custkey")
    },

    // P9 — record redaction (ref: workflows/ai.py:168-190, span-redact).
    Q("p9_redact",
      "SELECT doc_id, lang, source, n_chars FROM documents") { (s, d) =>
      Ops.redact(Tables.documents(s, d), "text")
    },

    // P10 — field sanitization (ref: sources/base.py:153-215).
    Q("p10_sanitize",
      """SELECT doc_id, substring(text, 1, 40) AS text_trunc,
        |       regexp_extract(text, '[a-z]{6,}', 0) AS long_token,
        |       translate(source, 'src', '') AS src_num
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        Scalars.truncateField(col("text"), 40).as("text_trunc"),
        regexp_extract(col("text"), "[a-z]{6,}", 0).as("long_token"),
        translate(col("source"), "src", "").as("src_num"))
    },

    // P11 — drop-if-unlabeled (ref: workflows/ai.py:232-237, span-tag -D).
    Q("p11_drop_unlabeled",
      """SELECT doc_id FROM documents
        |WHERE len(list_intersect(string_split(trim(text), ' '),
        |                         ['join', 'merge', 'sort'])) > 0""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(size(array_intersect(Scalars.tokens(col("text")),
                array(lit("join"), lit("merge"), lit("sort")))) > 0)
        .select("doc_id")
    },

    // S4 — Solr-dump scan: json-ish read + array containment filter
    // (ref: sources/olc.py:82-98).
    Q("s4_solr_dump_scan",
      """SELECT doc_id, lang FROM documents
        |WHERE list_contains(string_split(trim(text), ' '), 'join')""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(array_contains(Scalars.tokens(col("text")), "join"))
        .select("doc_id", "lang")
    },

    // S11 — Solr export with embedded fullrecord
    // (ref: sources/crossref.py:750-782, span-export -with-fullrecord).
    Q("s11_solr_export",
      """SELECT doc_id,
        |       to_json(struct_pack(doc_id := doc_id, lang := lang,
        |                           n_chars := n_chars)) AS fullrecord
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("fullrecord"))
    },

    // S11b — the full solr5vu3 export mapping under the oracle: IS
    // records synthesized from documents, conformed to the canonical
    // schema, projected through SolrExport.solr5vu3 (facets, container
    // fields, availability) — a regression in the export columns now
    // fails the driver gate, not only unit specs.
    Q("s11b_solr5vu3",
      """SELECT 'ai-28-' || doc_id AS id,
        |  'ElectronicArticle' AS format,
        |  'Study ' || doc_id AS title,
        |  CAST(doc_id % 40 + 1 AS VARCHAR) AS container_volume,
        |  CAST(doc_id % 12 + 1 AS VARCHAR) AS container_issue,
        |  (doc_id % 90 + 1) || '-' || (doc_id % 90 + 5) AS container_pages,
        |  '10.28/d' || doc_id AS doi,
        |  CAST(1990 + doc_id % 30 AS VARCHAR) AS publishDate,
        |  'Electronic Resources' AS access_facet,
        |  CASE WHEN doc_id % 3 = 0 THEN 'Online,Free' ELSE 'Online' END
        |    AS facet_avail,
        |  'Subj' || (doc_id % 7) AS topic,
        |  'F' || doc_id || ', G' || doc_id AS author_facet,
        |  lang AS language
        |FROM documents""".stripMargin) { (s, d) =>
      val id = col("doc_id")
      def str(c: org.apache.spark.sql.Column) = c.cast("string")
      val is = graft.core.Schema.conform(Tables.documents(s, d).select(
        concat(lit("ai-28-"), str(id)).as("finc.id"),
        lit("28").as("finc.source_id"),
        lit("ElectronicArticle").as("finc.format"),
        concat(lit("Study "), str(id)).as("rft.atitle"),
        str(id % 40 + 1).as("rft.volume"),
        str(id % 12 + 1).as("rft.issue"),
        concat(str(id % 90 + 1), lit("-"), str(id % 90 + 5)).as("rft.pages"),
        concat(lit("10.28/d"), str(id)).as("doi"),
        concat(str(lit(1990) + id % 30), lit("-01-01")).as("rft.date"),
        (id % 3 === 0).as("x.oa"),
        array(concat(lit("Subj"), str(id % 7))).as("subjects"),
        array(col("lang")).as("languages"),
        // Author struct field order must match Schema.Author (struct
        // casts are positional): rft.au, rft.aufirst, rft.aulast, rft.aucorp.
        array(struct(
          lit(null).cast("string").as("rft.au"),
          concat(lit("G"), str(id)).as("rft.aufirst"),
          concat(lit("F"), str(id)).as("rft.aulast"),
          lit(null).cast("string").as("rft.aucorp"))).as("authors"),
        array(lit("DE-15")).as("x.labels")))
      SolrExport.solr5vu3(is).select(
        col("id"), col("format"), col("title"),
        col("container_volume"), col("container_issue"),
        col("container_pages"), col("doi"),
        col("publishDate"), col("access_facet"),
        array_join(col("facet_avail"), ",").as("facet_avail"),
        array_join(col("topic"), ",").as("topic"),
        array_join(col("author_facet"), "; ").as("author_facet"),
        array_join(col("language"), ",").as("language"))
    },

    // S13 — report sink (ref: workflows/adhoc.py:106-148).
    Q("s13_report",
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS docs,
        |       avg(n_chars) AS avg_chars
        |FROM documents GROUP BY lang, source""".stripMargin) { (s, d) =>
      // avg over an integer column is a single exact-sum division —
      // engine-portable without rounding (unlike double-sum averages).
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("docs"), avg("n_chars").as("avg_chars"))
    },

    // F1 — base64 id with stripped padding (ref: conversions.py:155-156).
    Q("f1_base64_id",
      """SELECT c_custkey,
        |       regexp_replace(to_base64(encode(c_name)), '=+$', '') AS b64
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), Scalars.base64Id(col("c_name")).as("b64"))
    },

    // F3 — de_listify (ref: conversions.py:338-360).
    Q("f3_delistify",
      """SELECT p_partkey,
        |       coalesce(string_split(p_type, ' ')[1], 'unknown') AS head_type
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        Scalars.deListify(split(col("p_type"), " "), lit("unknown")).as("head_type"))
    },

    // F4 — id synthesis ai-<sid>-<id> (ref: conversions.py:316).
    Q("f4_id_synthesis",
      """SELECT doc_id,
        |       concat('ai-', regexp_extract(source, '[0-9]+'), '-', md5(text)) AS ai_id
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        Scalars.synthesizeId(
          regexp_extract(col("source"), "[0-9]+", 0), md5(col("text"))).as("ai_id"))
    },

    // F5 — date formatting (ref: conversions.py:331-335).
    Q("f5_date_format",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       year(o_orderdate) AS order_year,
        |       strftime(o_orderdate, '%Y') || '-01-01T00:00:00Z' AS rfc3339
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        Scalars.isoDate(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        Scalars.yearToRfc3339(year(col("o_orderdate"))).as("rfc3339"))
    },

    // F6 — DOI normalization (ref: conversions.py:494; crossref.py:620).
    Q("f6_doi_normalize",
      """SELECT doc_id, norm_doi, split_part(norm_doi, '/', 1) AS prefix FROM (
        |  SELECT doc_id,
        |    regexp_replace(lower('https://DOI.org/10.' || (doc_id % 100) || '/'
        |                         || substring(md5(text), 1, 8)),
        |                   '^https?://(dx\.)?doi\.org/', '') AS norm_doi
        |  FROM documents)""".stripMargin) { (s, d) =>
      val rawDoi = concat(lit("https://DOI.org/10."), (col("doc_id") % 100),
                          lit("/"), substring(md5(col("text")), 1, 8))
      Tables.documents(s, d)
        .select(col("doc_id"), Scalars.normalizeDoi(rawDoi).as("norm_doi"))
        .withColumn("prefix", Scalars.doiPrefix(col("norm_doi")))
    },

    // F7 — ISSN shape validation (ref: sources/amsl.py:569-586).
    Q("f7_issn_validate",
      """SELECT c_custkey, issn FROM (
        |  SELECT c_custkey,
        |         substring(md5(c_name), 1, 4) || '-' || substring(md5(c_name), 5, 4) AS issn
        |  FROM customer)
        |WHERE regexp_matches(issn, '^[0-9]{4}-[0-9]{3}[0-9xX]$')""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          concat(substring(md5(col("c_name")), 1, 4), lit("-"),
                 substring(md5(col("c_name")), 5, 4)).as("issn"))
        .filter(Scalars.isIssn(col("issn")))
    },

    // F11 — JSON field flatten (ref: sources/doaj.py:305-313).
    Q("f11_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(Scalars.jsonField(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
    },

    // F13 — filename provenance (ref: sources/wiso.py:76-88). The value
    // is environment-dependent, so the check is rows-only: one distinct
    // source file per table at test scale.
    Q.rowsOnly("f13_provenance") { (s, d) =>
      Tables.documents(s, d)
        .select(input_file_name().as("file"))
        .distinct()
        .select(count(lit(1)).as("n_files"))
    })
}
