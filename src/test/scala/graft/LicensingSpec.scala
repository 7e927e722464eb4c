package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.license._

/** License tagging: filter-tree compiler truth table, JSON config
  * parsing (amsl.py:1286-1343 shape), KBART holdings semantics
  * (coverage range, open range, embargo wall), and the 8-case AMSL
  * dispatch (amsl.py:924-935). */
class LicensingSpec extends AnyFunSuite {
  import FilterExpr._
  import TestSpark.spark
  import spark.implicits._

  def recs = Seq(
    // id, source, collections, issns, subjects, date
    ("r1", "55", Seq("JSTOR Music Archive"), Seq("1111-1111"), Seq.empty[String], "1996-05-01"),
    ("r2", "55", Seq("Other"), Seq("1111-1111"), Seq.empty[String], "1996-05-01"),
    ("r3", "28", Seq("DOAJ"), Seq("2222-2222"), Seq.empty[String], "2001-01-01"),
    ("r4", "49", Seq.empty[String], Seq("3333-3333"), Seq("Film studies"), "1994-01-01"),
    ("r5", "55", Seq("JSTOR Music Archive"), Seq("1111-1111"), Seq.empty[String], "1999-12-31"),
    ("r6", "49", Seq.empty[String], Seq("2222-2222"), Seq.empty[String], "2001-03-01"))
    .toDF("id", "source_id", "collections", "issns", "subjects", "rdate")
    .withColumn("rdate", col("rdate").cast("timestamp"))

  val rc = RecordCols(col("id"), col("source_id"), col("collections"),
    col("issns"), col("subjects"), col("rdate"))

  // kbart: 1111-1111 covered 1995..1997; 2222-2222 open from 2000.
  def kbart = Seq(
    ("1111-1111", "1995-01-01", "1997-12-31", 0),
    ("2222-2222", "2000-01-01", null, 0))
    .toDF("issn", "date_first", "date_last", "embargo_days")

  def tagLabels(configs: Map[String, FilterExpr]): Map[String, Seq[String]] =
    Licensing.tag(recs, rc, configs, Map("k" -> kbart), "2002-01-01")
      .select("id", "x_labels").as[(String, Seq[String])].collect().toMap

  test("source+collection predicate") {
    val got = tagLabels(Map("DE-15" ->
      And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("JSTOR Music Archive"))))))
    assert(got("r1") == Seq("DE-15"))
    assert(got("r2") == Seq.empty)
    assert(got("r3") == Seq.empty)
  }

  test("or / not / subject / issn / any predicates") {
    val got = tagLabels(Map(
      "A" -> Or(Seq(SubjectIn(Seq("Film studies")), IssnIn(Seq("2222-2222")))),
      "B" -> Not(SourceIn(Seq("55"))),
      "C" -> Any))
    assert(got("r4").contains("A") && got("r3").contains("A") && !got("r1").contains("A"))
    assert(got("r3").contains("B") && !got("r1").contains("B"))
    assert(recs.count() == got.values.count(_.contains("C")))
  }

  test("holdings coverage window: in-range matches, out-of-range and closed-range-expired do not") {
    val got = tagLabels(Map("H" -> Holdings(Seq("k"))))
    assert(got("r1") == Seq("H"))   // 1996 in [1995,1997]
    assert(got("r5") == Seq.empty)  // 1999 after closed range
    assert(got("r3") == Seq("H"))   // open range from 2000, 2001 ok
    assert(got("r4") == Seq.empty)  // issn not held
  }

  test("embargo moving wall excludes recent records") {
    val kb = Seq(("2222-2222", "2000-01-01", null, 365))
      .toDF("issn", "date_first", "date_last", "embargo_days")
    val got = Licensing.tag(recs, rc, Map("H" -> Holdings(Seq("k"))),
        Map("k" -> kb), "2001-06-01")
      .select("id", "x_labels").as[(String, Seq[String])].collect().toMap
    // r3 dated 2001-01-01 > 2001-06-01 minus 365d = 2000-06-01 → embargoed.
    assert(got("r3") == Seq.empty)
  }

  test("dropUnlabeled keeps only labeled records (span-tag -D)") {
    val got = Licensing.tag(recs, rc,
        Map("DE-15" -> SourceIn(Seq("55"))), Map.empty, "2002-01-01",
        dropUnlabeled = true)
      .select("id").as[String].collect().toSet
    assert(got == Set("r1", "r2", "r5"))
  }

  test("JSON config parses the reference shape") {
    val json =
      """{"DE-15": {"or": [
        |  {"and": [{"source": ["55"]}, {"collection": ["JSTOR Music Archive"]},
        |           {"holdings": {"urls": ["file:///kbart_de15.tsv"]}}]},
        |  {"and": [{"source": ["28"]}, {"collection": ["DOAJ"]}]}]},
        | "DE-14": {"any": {}}}""".stripMargin
    val cfg = FilterExpr.parseConfig(json)
    assert(cfg("DE-14") == Any)
    cfg("DE-15") match {
      case Or(Seq(And(a), And(b))) =>
        assert(a.contains(SourceIn(Seq("55"))))
        assert(a.contains(Holdings(Seq("file:///kbart_de15.tsv"))))
        assert(b == Seq(SourceIn(Seq("28")), CollectionIn(Seq("DOAJ"))))
      case other => fail(s"unexpected tree: $other")
    }
    assert(FilterExpr.holdingsRefs(cfg("DE-15")) == Set("file:///kbart_de15.tsv"))
  }

  test("JSON config end-to-end: parse then tag") {
    val json =
      """{"ISIL-J": {"or": [
        |  {"and": [{"source": ["55"]}, {"holdings": {"urls": ["k"]}}]},
        |  {"and": [{"source": ["28"]}, {"collection": ["DOAJ"]}]}]}}""".stripMargin
    val cfg = FilterExpr.parseConfig(json)
    val got = Licensing.tag(recs, rc, cfg, Map("k" -> kbart), "2002-01-01")
      .select("id", "x_labels").as[(String, Seq[String])].collect().toMap
    assert(got("r1") == Seq("ISIL-J")) // 55 + holdings match
    assert(got("r3") == Seq("ISIL-J")) // 28 + DOAJ collection
    assert(got("r5") == Seq.empty)     // 55 but holdings range expired
  }

  test("AMSL 8-case dispatch builds the expected trees") {
    def row(lthf: Option[String] = None, ltcf: Option[String] = None,
            eltcf: Option[String] = None, pi: Option[String] = None,
            ev: Option[String] = None, sid: String = "55", coll: String = "C1") =
      AmslRow("DE-15", sid, coll, None, lthf, ltcf, eltcf, pi, ev)

    // Case 1: bare → source+collection.
    assert(AmslConfigBuilder.build(Seq(row()))("DE-15")
      == And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("C1")))))
    // Case 2: productISIL present but ignored.
    assert(AmslConfigBuilder.build(Seq(row(pi = Some("X"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("C1")))))
    // Cases 3/4: holdings link with evaluate=yes → +holdings; =no → dropped.
    assert(AmslConfigBuilder.build(Seq(row(lthf = Some("L"), ev = Some("yes"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("C1")), Holdings(Seq("L")))))
    assert(!AmslConfigBuilder.build(Seq(row(lthf = Some("L"), ev = Some("no"))))
      .contains("DE-15"))
    // Cases 5/6: content files → source+holdings, collections ignored.
    assert(AmslConfigBuilder.build(Seq(row(ltcf = Some("CF"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), Holdings(Seq("CF")))))
    assert(AmslConfigBuilder.build(Seq(row(eltcf = Some("EF"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), Holdings(Seq("EF")))))
    // Cases 7/8: link + (external) content file, evaluate=yes.
    assert(AmslConfigBuilder.build(
      Seq(row(lthf = Some("L"), eltcf = Some("EF"), ev = Some("yes"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), Holdings(Seq("EF")), Holdings(Seq("L")))))
    assert(AmslConfigBuilder.build(
      Seq(row(lthf = Some("L"), ltcf = Some("CF"), ev = Some("yes"))))("DE-15")
      == And(Seq(SourceIn(Seq("55")), Holdings(Seq("CF")), Holdings(Seq("L")))))
    // Broad source (49): collection list dropped in link bucket.
    assert(AmslConfigBuilder.build(
      Seq(row(lthf = Some("L"), ev = Some("yes"), sid = "49")))("DE-15")
      == And(Seq(SourceIn(Seq("49")), Holdings(Seq("L")))))
    // Bare broad source: contributes nothing.
    assert(!AmslConfigBuilder.build(Seq(row(sid = "49"))).contains("DE-15"))
    // Unhandled: all three links set → error.
    intercept[AmslConfigBuilder.UnhandledAmslRow](
      AmslConfigBuilder.build(Seq(row(lthf = Some("L"), ltcf = Some("C"),
        eltcf = Some("E"), ev = Some("yes")))))
    // Same (isil,sid) collections merge into one sorted list.
    assert(AmslConfigBuilder.build(Seq(row(coll = "C2"), row(coll = "C1")))("DE-15")
      == And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("C1", "C2")))))
  }

  test("config patching: holdings append (DE-14 fixup) and term replace") {
    // amsl.py:1345-1355 — append an external holdings file to every
    // holdings term of one ISIL; idempotent; other ISILs untouched.
    val cfg = Map(
      "DE-14" -> Or(Seq(
        And(Seq(SourceIn(Seq("49")), Holdings(Seq("h1")))),
        And(Seq(SourceIn(Seq("55")), Holdings(Seq("h1", "SLUB-EZB")))))),
      "DE-15" -> And(Seq(SourceIn(Seq("49")), Holdings(Seq("h1")))))
    val patched = FilterExpr.appendHoldings(cfg, "DE-14", "SLUB-EZB")
    assert(patched("DE-14") == Or(Seq(
      And(Seq(SourceIn(Seq("49")), Holdings(Seq("h1", "SLUB-EZB")))),
      And(Seq(SourceIn(Seq("55")), Holdings(Seq("h1", "SLUB-EZB")))))))
    assert(patched("DE-15") == cfg("DE-15"))
    assert(FilterExpr.appendHoldings(patched, "DE-14", "SLUB-EZB") == patched)
    assert(FilterExpr.appendHoldings(cfg, "DE-XX", "SLUB-EZB") == cfg)

    // amsl.py:1364-1391 — exact-subtree replacement across all ISILs.
    val from = And(Seq(SourceIn(Seq("49")), Holdings(Seq("h1"))))
    val to = And(Seq(SourceIn(Seq("49")), IssnIn(Seq("1234-5678"))))
    val swapped = FilterExpr.replaceTerm(cfg, from, to)
    assert(swapped("DE-15") == to)
    assert(swapped("DE-14") == Or(Seq(to,
      And(Seq(SourceIn(Seq("55")), Holdings(Seq("h1", "SLUB-EZB")))))))
  }

  test("null date_first is an open start (KBART blank lower bound)") {
    val recs = Seq((1L, "49", "c1", "3333-3333", "2005-01-01"))
      .toDF("id", "sid", "coll", "issn", "d")
      .select($"id", $"sid", array($"coll").as("colls"),
        array($"issn").as("issns"), array().cast("array<string>").as("subjects"),
        $"d".cast("date").as("rdate"))
    val cols = RecordCols(col("id"), col("sid"), col("colls"), col("issns"),
      col("subjects"), col("rdate"))
    val h = Seq(("3333-3333", null.asInstanceOf[String], "2010-12-31", 0))
      .toDF("issn", "date_first", "date_last", "embargo_days")
      .select($"issn", $"date_first".cast("date"), $"date_last".cast("date"),
        $"embargo_days")
      .toDF("issn", "date_first", "date_last", "embargo_days")
    val tagged = Licensing.tag(recs, cols,
      Map("ISIL-O" -> Holdings(Seq("h"))), Map("h" -> h), "2012-01-01")
    assert(tagged.select("x_labels").as[Seq[String]].head() == Seq("ISIL-O"))
  }

  test("empty predicate lists fail fast like empty clauses") {
    val cols = RecordCols(col("id"), col("sid"), col("colls"), col("issns"),
      col("subjects"), col("rdate"))
    for (bad <- Seq(SourceIn(Nil), CollectionIn(Nil), IssnIn(Nil),
                    SubjectIn(Nil), And(Nil), Or(Nil), Holdings(Nil)))
      intercept[IllegalArgumentException](
        Licensing.compile(bad, cols, _ => lit(true)))
  }

  test("AMSL: productISIL on a content-file row is unhandled, like the reference") {
    intercept[AmslConfigBuilder.UnhandledAmslRow](
      AmslConfigBuilder.build(Seq(AmslRow("DE-15", "55", "C1",
        linkToContentFile = Some("u"), productISIL = Some("DE-X")))))
    intercept[AmslConfigBuilder.UnhandledAmslRow](
      AmslConfigBuilder.build(Seq(AmslRow("DE-15", "55", "C1",
        externalLinkToContentFile = Some("u"), productISIL = Some("DE-X")))))
  }

  test("config JSON round-trip: toJson is the inverse of parseConfig") {
    val cfg = Map(
      "DE-15" -> Or(Seq(
        And(Seq(SourceIn(Seq("55")), CollectionIn(Seq("C1", "C2")),
          Holdings(Seq("u1", "u2")))),
        Not(IssnIn(Seq("1111-1111"))),
        SubjectIn(Seq("Film studies")))),
      "DE-14" -> Any,
      "DE-Gla1" -> And(Seq(SourceIn(Seq("28")), Holdings(Seq("k")))))
    assert(FilterExpr.parseConfig(FilterExpr.toJson(cfg)) == cfg)
    // Builder outputs freeze and thaw unchanged (the
    // *FilterConfigFreeze contract).
    val folio = FolioConfigBuilder.build(Seq(
      FolioRow("DE-15", "55", "KBART_DE15"),
      FolioRow("DE-15", "49", "KBART_FREEJOURNALS")), prefix = "p/")
    assert(FilterExpr.parseConfig(FilterExpr.toJson(folio)) == folio)
    val amsl = AmslConfigBuilder.build(Seq(
      AmslRow("DE-15", "55", "C1"),
      AmslRow("DE-14", "55", "C1", linkToHoldingsFile = Some("L"),
        evaluateHoldingsFileForLibrary = Some("yes"))))
    assert(FilterExpr.parseConfig(FilterExpr.toJson(amsl)) == amsl)
  }

  test("FOLIO reduced dispatch: skip rules, grouping, prefix, expand") {
    val rows = Seq(
      FolioRow("DE-15", "55", "KBART_DE15"),
      FolioRow("DE-15", "49", "KBART_FREEJOURNALS"),
      FolioRow("DE-15", "55", "KBART_DE15"), // duplicate row folds
      // skipped: outdated label / wrong shard / evaluate=no / blanks
      FolioRow("DE-15", "55", "GOLD", dokumentLabel = Some("GOLD_OA_LISTE")),
      FolioRow("DE-15", "55", "X", shardLabel = Some("UBL-main")),
      FolioRow("DE-15", "55", "X", shardLabel = None),
      FolioRow("DE-15", "55", "X", evaluateHoldingsFileForLibrary = Some("no")),
      FolioRow("", "55", "X"),
      FolioRow("DE-15", "55", " "),
      // consortium group expands to two members
      FolioRow("finc-DHSN", "28", "KBART_DEGla1"))
    val cfg = FolioConfigBuilder.build(rows, prefix = "p/",
      expand = Map("finc-DHSN" -> Seq("DE-Gla1", "DE-Rs1")))
    assert(cfg("DE-15") == And(Seq(SourceIn(Seq("49", "55")),
      Holdings(Seq("p/KBART_DE15", "p/KBART_FREEJOURNALS")))))
    assert(cfg("DE-Gla1") == And(Seq(SourceIn(Seq("28")),
      Holdings(Seq("p/KBART_DEGla1")))))
    assert(cfg("DE-Rs1") == cfg("DE-Gla1"))
    assert(!cfg.contains("finc-DHSN"))
    assert(cfg.keySet == Set("DE-15", "DE-Gla1", "DE-Rs1"))
    // explicit evaluate=yes passes like absent
    assert(FolioConfigBuilder.build(Seq(FolioRow("DE-14", "55", "U",
      evaluateHoldingsFileForLibrary = Some("yes")))).contains("DE-14"))
  }

  test("FOLIO/AMSL parity: equivalent configs tag the same records") {
    // The AMSL broad-source holdings-bucket path emits one
    // AND(source, holdings(link)) per link; the FOLIO reduced shape
    // folds the same rows into AND(source, holdings([links])) — the
    // Holdings list compiles to an OR of flags, so both trees must
    // accept exactly the same records.
    val kb2 = Seq(("2222-2222", "2000-01-01", null.asInstanceOf[String], 0))
      .toDF("issn", "date_first", "date_last", "embargo_days")
    val holdings = Map("k" -> kbart, "k2" -> kb2)
    val amsl = AmslConfigBuilder.build(Seq(
      AmslRow("DE-15", "49", "C1", linkToHoldingsFile = Some("k"),
        evaluateHoldingsFileForLibrary = Some("yes")),
      AmslRow("DE-15", "49", "C2", linkToHoldingsFile = Some("k2"),
        evaluateHoldingsFileForLibrary = Some("yes"))))
    val folio = FolioConfigBuilder.build(Seq(
      FolioRow("DE-15", "49", "k"),
      FolioRow("DE-15", "49", "k2")))
    // Trees differ in shape but not semantics — wrap AMSL's two ANDs.
    def labels(cfg: Map[String, FilterExpr]) =
      Licensing.tag(recs, rc, cfg, holdings, "2002-01-01")
        .select("id", "x_labels").as[(String, Seq[String])].collect().toMap
    assert(labels(amsl) == labels(folio))
    assert(labels(folio)("r6") == Seq("DE-15")) // sid 49, issn held by both
    assert(labels(folio)("r4") == Seq.empty)    // sid 49, issn not held
  }

  test("KBART embargo_info parses method + days; dirt yields null") {
    import spark.implicits._
    val out = Seq("R1Y", "p6m", "R90D", "", null, "XYZ", "R12M")
      .toDF("e")
      .select(Kbart.embargoMethod(col("e")).as("m"),
        Kbart.embargoDays(col("e")).as("d"))
      .as[(Option[String], Option[Int])].collect().toSeq
    assert(out == Seq(
      Some("R") -> Some(365), Some("P") -> Some(180), Some("R") -> Some(90),
      Some("R") -> Some(0), Some("R") -> Some(0), None -> None,
      Some("R") -> Some(360)))
  }

  test("KBART: unparseable embargo fails closed; oversized digits are unparseable") {
    import spark.implicits._
    // parse: >4-digit unit counts don't regex-match (ANSI overflow guard)
    val parsed = Seq("R99999999999D", "R9999Y").toDF("e")
      .select(Kbart.embargoDays(col("e")).as("d"))
      .as[Option[Int]].collect().toSeq
    assert(parsed == Seq(None, Some(9999 * 365)))
    // wall: (method, days) both null — the unparseable signature —
    // entitles NOTHING, instead of silently dropping the paywall
    val ok = Seq(("1990-01-01")).toDF("rd")
      .select(Kbart.clearsWall(col("rd").cast("date"),
        lit("2000-01-01").cast("date"),
        lit(null).cast("string"), lit(null).cast("int")).as("ok"))
      .as[Boolean].collect()
    assert(ok.toSeq == Seq(false))
  }

  test("KBART wall: R excludes the newest window, P includes only it") {
    import spark.implicits._
    val asOf = lit("2000-01-01").cast("date")
    val rows = Seq("1999-10-01", "1998-01-01").toDF("rd")
      .select(col("rd").cast("date").as("rd"))
    def wall(m: String) = rows.select(
      Kbart.clearsWall(col("rd"), asOf, lit(m), lit(180)).as("ok"))
      .as[Boolean].collect().toSeq
    assert(wall("R") == Seq(false, true)) // recent blocked, old clears
    assert(wall("P") == Seq(true, false)) // recent clears, old blocked
  }
}
