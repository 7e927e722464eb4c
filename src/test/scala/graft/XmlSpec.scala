package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Xml

/** S2 engine half: the streaming record splitter (port of
  * utils.py:448-507 xmlstream). */
class XmlSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("splits a collection into records, content preserved") {
    val xml = """<?xml version="1.0"?>
      |<collection>
      |  <record><id>1</id></record>
      |  <record><id>2</id><x/></record>
      |  <other>ignored</other>
      |  <record><id>3</id></record>
      |</collection>""".stripMargin
    val recs = Xml.splitByTag(xml, "record").toSeq
    assert(recs == Seq("<record><id>1</id></record>",
      "<record><id>2</id><x/></record>", "<record><id>3</id></record>"))
  }

  test("namespace prefixes match on local name") {
    val xml = """<marc:collection xmlns:marc="http://loc.gov">
      |<marc:record tag="a"><marc:leader>L</marc:leader></marc:record>
      |</marc:collection>""".stripMargin
    val recs = Xml.splitByTag(xml, "record").toSeq
    assert(recs.size == 1 && recs.head.startsWith("<marc:record")
      && recs.head.endsWith("</marc:record>"))
  }

  test("CDATA containing fake closing tags does not end the record") {
    val xml = "<doc><record><raw><![CDATA[</record> not real]]></raw></record></doc>"
    val recs = Xml.splitByTag(xml, "record").toSeq
    assert(recs == Seq(
      "<record><raw><![CDATA[</record> not real]]></raw></record>"))
  }

  test("nested same-name elements emit the outermost; comments skipped") {
    val xml = "<d><!-- <record>x</record> --><record>a<record>b</record>c</record></d>"
    assert(Xml.splitByTag(xml, "record").toSeq ==
      Seq("<record>a<record>b</record>c</record>"))
  }

  test("self-closing records and '>' inside attribute values") {
    val xml = """<d><record attr="x>y"/><record a="1">z</record></d>"""
    assert(Xml.splitByTag(xml, "record").toSeq ==
      Seq("""<record attr="x>y"/>""", """<record a="1">z</record>"""))
  }

  test("truncated inputs never crash: trailing '<' inside and outside records") {
    assert(Xml.splitByTag("<d><record><id>1</id></record><", "record").toSeq ==
      Seq("<record><id>1</id></record>"))
    assert(Xml.splitByTag("<d><record>partial<", "record").toSeq == Seq.empty)
    assert(Xml.splitByTag("<", "record").toSeq == Seq.empty)
    assert(Xml.splitByTag("", "record").toSeq == Seq.empty)
  }

  test("recordsFromFiles streams records with provenance") {
    val dir = java.nio.file.Files.createTempDirectory("xmlsrc")
    java.nio.file.Files.writeString(dir.resolve("a.xml"),
      "<c><record><id>1</id></record><record><id>2</id></record></c>")
    java.nio.file.Files.writeString(dir.resolve("b.xml"),
      "<c><record><id>3</id></record></c>")
    val df = Xml.recordsFromFiles(spark, dir.toString + "/*.xml", "record")
    assert(df.count() == 3)
    assert(df.filter($"path".endsWith("b.xml")).count() == 1)
  }
}
