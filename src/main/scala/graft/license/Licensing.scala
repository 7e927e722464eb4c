package graft.license

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** License tagging — the reference's `span-tag` semantics (SURVEY §2.2
  * P8/P11, §2.3 J3/J4) re-expressed as a driver-side compiler from a
  * per-ISIL boolean filter tree to Catalyst `Column` predicates plus
  * broadcast range joins for holdings entitlements.
  *
  * Filter-tree shape (ref: sources/amsl.py:1286-1343):
  * `{"DE-15": {"or": [{"and": [{"source": ["55"]}, {"collection": [...]},
  * {"holdings": {"urls": [...]}}]}]}}`
  *
  * Scale: predicates over source/collection/issn are literal-set
  * membership (broadcast to every executor inside the codegen'd plan —
  * the reference's "lists of collections" speedup, amsl.py:906-922, is
  * the natural form here). Holdings files are small DataFrames,
  * broadcast-joined once per referenced file, each producing one boolean
  * flag column; the record side streams through unreplicated.
  */
sealed trait FilterExpr
object FilterExpr {
  case class And(children: Seq[FilterExpr]) extends FilterExpr
  case class Or(children: Seq[FilterExpr]) extends FilterExpr
  case class Not(child: FilterExpr) extends FilterExpr
  /** finc.source_id ∈ ids */
  case class SourceIn(ids: Seq[String]) extends FilterExpr
  /** finc.mega_collection ∩ names ≠ ∅ */
  case class CollectionIn(names: Seq[String]) extends FilterExpr
  /** rft.issn ∩ issns ≠ ∅ */
  case class IssnIn(issns: Seq[String]) extends FilterExpr
  /** subjects ∩ names ≠ ∅ */
  case class SubjectIn(names: Seq[String]) extends FilterExpr
  /** entitled by a named KBART holdings table (ISSN + coverage window) */
  case class Holdings(names: Seq[String]) extends FilterExpr
  /** matches everything (span's `{"any": {}}`) */
  case object Any extends FilterExpr

  /** Parse the reference JSON config shape into trees, one per ISIL. */
  def parseConfig(json: String): Map[String, FilterExpr] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def node(v: JValue): FilterExpr = v match {
      case JObject(fields) =>
        val exprs = fields.map {
          case ("and", JArray(xs))        => And(xs.map(node))
          case ("or", JArray(xs))         => Or(xs.map(node))
          case ("not", x)                 => Not(node(x))
          case ("source", JArray(xs))     => SourceIn(xs.map(str))
          case ("collection", JArray(xs)) => CollectionIn(xs.map(str))
          case ("issn", JArray(xs))       => IssnIn(xs.map(str))
          case ("subject", JArray(xs))    => SubjectIn(xs.map(str))
          case ("any", _)                 => Any
          case ("holdings", JObject(h)) =>
            Holdings(h.collect { case (k, JArray(xs)) if k == "urls" || k == "files" =>
              xs.map(str)
            }.flatten)
          case (k, _) => throw new IllegalArgumentException(s"unknown filter key: $k")
        }
        if (exprs.size == 1) exprs.head else And(exprs)
      case other => throw new IllegalArgumentException(s"expected object, got $other")
    }
    def str(v: JValue): String = v match {
      case JString(s) => s
      case other      => other.values.toString
    }
    JsonMethods.parse(json) match {
      case JObject(fields) => fields.map { case (isil, tree) => isil -> node(tree) }.toMap
      case other => throw new IllegalArgumentException(s"expected object, got $other")
    }
  }

  /** Serialize trees back to the reference JSON wire shape — the
    * inverse of [[parseConfig]] (span-freeze ships configs as exactly
    * this JSON; emitting it lets compiled AMSL/FOLIO configs be frozen
    * to an artifact and re-loaded elsewhere, the reference's
    * `*FilterConfigFreeze` contract). Round-trip law:
    * `parseConfig(toJson(cfg)) == cfg` (spec-pinned). */
  def toJson(configs: Map[String, FilterExpr]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def node(e: FilterExpr): JObject = e match {
      case And(cs)          => JObject("and" -> JArray(cs.map(node).toList))
      case Or(cs)           => JObject("or" -> JArray(cs.map(node).toList))
      case Not(c)           => JObject("not" -> node(c))
      case SourceIn(xs)     => JObject("source" -> strs(xs))
      case CollectionIn(xs) => JObject("collection" -> strs(xs))
      case IssnIn(xs)       => JObject("issn" -> strs(xs))
      case SubjectIn(xs)    => JObject("subject" -> strs(xs))
      case Holdings(xs)     => JObject("holdings" -> JObject("urls" -> strs(xs)))
      case Any              => JObject("any" -> JObject())
    }
    def strs(xs: Seq[String]): JArray = JArray(xs.map(JString(_): JValue).toList)
    JsonMethods.compact(JsonMethods.render(
      JObject(configs.toList.sortBy(_._1).map { case (isil, tree) =>
        isil -> (node(tree): JValue)
      })))
  }

  /** All holdings names referenced anywhere in a tree. */
  def holdingsRefs(e: FilterExpr): Set[String] = e match {
    case And(cs)      => cs.flatMap(holdingsRefs).toSet
    case Or(cs)       => cs.flatMap(holdingsRefs).toSet
    case Not(c)       => holdingsRefs(c)
    case Holdings(ns) => ns.toSet
    case _            => Set.empty
  }

  /** Config patching — the reference maintains site-specific fixups on
    * the compiled config (the DE-14 external-holdings append,
    * amsl.py:1345-1355, and AMSLFilterConfigPatched's term rewrite,
    * amsl.py:1364-1391). Both are tree rewrites here:
    *
    * [[appendHoldings]] adds `extra` to every Holdings term of one
    * ISIL's tree unless already present; [[replaceTerm]] swaps an exact
    * subtree for another across all ISILs. */
  def appendHoldings(configs: Map[String, FilterExpr], isil: String,
                     extra: String): Map[String, FilterExpr] = {
    def walk(e: FilterExpr): FilterExpr = e match {
      case And(cs)      => And(cs.map(walk))
      case Or(cs)       => Or(cs.map(walk))
      case Not(c)       => Not(walk(c))
      case Holdings(ns) => Holdings(if (ns.contains(extra)) ns else ns :+ extra)
      case leaf         => leaf
    }
    configs.get(isil) match {
      case Some(tree) => configs.updated(isil, walk(tree))
      case None       => configs
    }
  }

  def replaceTerm(configs: Map[String, FilterExpr], from: FilterExpr,
                  to: FilterExpr): Map[String, FilterExpr] = {
    def walk(e: FilterExpr): FilterExpr =
      if (e == from) to
      else e match {
        case And(cs) => And(cs.map(walk))
        case Or(cs)  => Or(cs.map(walk))
        case Not(c)  => Not(walk(c))
        case leaf    => leaf
      }
    configs.map { case (isil, tree) => isil -> walk(tree) }
  }
}

/** Column bindings: which record columns the predicates read. */
case class RecordCols(
    id: Column,
    sourceId: Column,
    collections: Column, // array<string>
    issns: Column,       // array<string>
    subjects: Column,    // array<string>
    date: Column)        // date/timestamp for holdings coverage

object Licensing {
  import FilterExpr._

  /** Compile a filter tree to a boolean Column. `holdingsFlag` maps a
    * holdings name to the pre-joined per-record boolean flag column. */
  def compile(e: FilterExpr, r: RecordCols,
              holdingsFlag: String => Column): Column = e match {
    case Any               => lit(true)
    // Empty clauses come from malformed external configs; fail with
    // the offending node rather than an opaque empty.reduceLeft or a
    // silent always-false predicate.
    case And(Nil) | Or(Nil) | Holdings(Nil) | SourceIn(Nil) |
         CollectionIn(Nil) | IssnIn(Nil) | SubjectIn(Nil) =>
      throw new IllegalArgumentException(s"empty filter clause: $e")
    case And(cs)           => cs.map(compile(_, r, holdingsFlag)).reduceLeft(_ && _)
    case Or(cs)            => cs.map(compile(_, r, holdingsFlag)).reduceLeft(_ || _)
    case Not(c)            => !compile(c, r, holdingsFlag)
    case SourceIn(ids)     => r.sourceId.isin(ids: _*)
    case CollectionIn(ns)  => arrays_overlap(r.collections, array(ns.map(lit): _*))
    case IssnIn(ns)        => arrays_overlap(r.issns, array(ns.map(lit): _*))
    case SubjectIn(ns)     => arrays_overlap(r.subjects, array(ns.map(lit): _*))
    case Holdings(ns)      => ns.map(holdingsFlag).reduceLeft(_ || _)
  }

  /** Attach `x.labels`: for each ISIL whose compiled tree accepts the
    * record, add the ISIL. `dropUnlabeled=true` is span-tag's `-D`
    * (P11). Returns the input plus an array<string> `labelCol`. */
  def tag(records: DataFrame, r: RecordCols,
          configs: Map[String, FilterExpr],
          holdings: Map[String, DataFrame],
          asOf: String,
          labelCol: String = "x_labels",
          dropUnlabeled: Boolean = false): DataFrame = {
    val refs = configs.values.flatMap(FilterExpr.holdingsRefs).toSeq.distinct.sorted
    // ONE pass over the records for every referenced holdings file: the
    // (small) holdings tables union with a name tag, the record issns
    // explode once, one broadcast join + coverage filter yields the set
    // of entitling file names per record. The per-file fold this
    // replaces re-exploded the record frame and chained one left join
    // per file.
    val (withFlags, holdingsFlag: (String => Column)) =
      if (refs.isEmpty) (records, (_: String) => lit(false))
      else {
        val hAll = refs.map { name =>
          val hd = holdings.getOrElse(name,
            throw new IllegalArgumentException(s"missing holdings table: $name"))
          hd.select(
            col("issn").as("__issn"),
            col("date_first").cast("date").as("__from"),
            col("date_last").cast("date").as("__to"),
            // Nulls pass through: (method, days) both null is the
            // parse-failure signature Kbart.clearsWall fails closed on.
            col("embargo_days").cast("int").as("__embargo"),
            (if (hd.columns.contains("embargo_method")) col("embargo_method")
             else lit("R")).as("__emethod"),
            lit(name).as("__hname"))
        }.reduce(_.unionByName(_))
        val rec = records.select(r.id.as("__rid"), explode(r.issns).as("__issn"),
                                 r.date.cast("date").as("__rdate"))
        val matched = rec.join(broadcast(hAll), Seq("__issn"))
          .filter((col("__from").isNull || col("__rdate") >= col("__from")) &&
                  (col("__to").isNull || col("__rdate") <= col("__to")) &&
                  Kbart.clearsWall(col("__rdate"), lit(asOf).cast("date"),
                    col("__emethod"), col("__embargo")))
          .groupBy("__rid")
          .agg(collect_set(col("__hname")).as("__hset"))
        // SHUFFLE_HASH, not sort-merge, for the join-back: both sides
        // shuffle on the record id either way, but SMJ then SORTS the
        // full record table per partition while a hash build of the
        // matched side is linear (same discipline as pageRankLoop's
        // rank update; the build is partition-local and scales with
        // the partition count). Measured: heavy l2 min 17.9 -> 15.5 s,
        // light l1/l2 -12..-24%.
        (records.join(matched.withColumnRenamed("__rid", "__jid")
                        .hint("SHUFFLE_HASH"),
                      r.id === col("__jid"), "left").drop("__jid"),
         (n: String) => coalesce(array_contains(col("__hset"), n), lit(false)))
      }
    val labels = configs.toSeq.sortBy(_._1).map { case (isil, tree) =>
      when(compile(tree, r, holdingsFlag), lit(isil))
    }
    val tagged = withFlags
      .withColumn(labelCol, array_compact(array(labels: _*)))
      .drop("__hset")
    if (dropUnlabeled) tagged.filter(size(col(labelCol)) > 0) else tagged
  }

  /** Ids of records entitled by one holdings table — KBART coverage
    * semantics (J3): record ISSN appears in the file and the record date
    * lies in [date_first, date_last] (null date_last = open range) and
    * clears the embargo wall ([[Kbart.clearsWall]] — `R` moving wall:
    * date ≤ asOf − days; `P` availability window: date ≥ asOf − days).
    * Holdings frame columns: issn, date_first, date_last, embargo_days
    * [, embargo_method — absent = R]. Feeds carrying raw KBART
    * embargo_info strings derive both via [[Kbart.parseEmbargo]].
    * Ref: sources/jstor.py:546-580 (KBART fields), workflows/ai.py:228-244
    * (span-tag invocation). */
  def holdingsEntitledIds(records: DataFrame, r: RecordCols,
                          holdings: DataFrame, asOf: Column): DataFrame = {
    val rec = records.select(r.id.as("__rid"), explode(r.issns).as("__issn"),
                             r.date.cast("date").as("__rdate"))
    val h = broadcast(holdings.select(
      col("issn").as("__issn"),
      col("date_first").cast("date").as("__from"),
      col("date_last").cast("date").as("__to"),
      // Nulls pass through: (method, days) both null is the
      // parse-failure signature Kbart.clearsWall fails closed on.
      col("embargo_days").cast("int").as("__embargo"),
      (if (holdings.columns.contains("embargo_method")) col("embargo_method")
       else lit("R")).as("__emethod")))
    rec.join(h, Seq("__issn"))
      // Null date_first/date_last = open-ended coverage on that side
      // (KBART leaves either bound blank); a bare >= against null would
      // silently entitle nothing.
      .filter((col("__from").isNull || col("__rdate") >= col("__from")) &&
              (col("__to").isNull || col("__rdate") <= col("__to")) &&
              Kbart.clearsWall(col("__rdate"), asOf.cast("date"),
                col("__emethod"), col("__embargo")))
      .select(col("__rid"))
      .distinct()
  }
}
