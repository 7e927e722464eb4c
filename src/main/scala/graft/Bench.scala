package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: times every registered query at the given SF dir and
  * prints one JSON line. Each query is fully materialized — the result
  * is reduced through a row-hash aggregate so Catalyst cannot prune the
  * output columns or short-circuit to a metadata count — and failures
  * are reported as failed (time -1), never as fast successes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated name filter for iterating on one query.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.registry
      .filter(q => only.forall(_.contains(q.name)))

    // Warm up before timing: first uses of expression families carry
    // multi-second one-time JVM costs (e.g. `lower` triggers collation/
    // ICU init ~7 s; first window/join/codegen paths similar) that would
    // otherwise be charged to an arbitrary query. Running every selected
    // query once at the smallest SF warms exactly the code paths being
    // timed, so the timed pass measures steady-state throughput — the
    // regime that matters on a long-running 100 TB job.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory) {
      selected.foreach { q =>
        try q.fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup ${q.name} failed: ${e.getMessage}")
        }
      }
    } else {
      // No small-SF dir: still absorb the generic one-time JVM costs
      // (codegen pipeline, shuffle machinery, collation/ICU init via
      // lower()) so the first timed query isn't charged for them.
      System.err.println(s"[bench] warm dir $warmDir missing — generic warmup only")
      try spark.range(1000)
        .select(org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.concat_ws("-",
            org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.md5(
              org.apache.spark.sql.functions.col("id").cast("string")))).as("k"))
        .groupBy("k").count().collect()
      catch { case e: Throwable =>
        System.err.println(s"[bench] generic warmup failed: ${e.getMessage}")
      }
    }
    // Touch the timed tables so the page cache is hot like it would be
    // mid-pipeline, and pre-build the timed SF's archive fixtures
    // (driver-side prep, not engine work — must not land in a timing).
    try {
      Tables.all(spark, sfDir).values.foreach(_.limit(1).collect())
      queries.SourceQueries.ensureFixtures(spark, sfDir)
      queries.PipelineQueries.ensureSnapshotFixture(spark, sfDir)
      queries.CrossrefQueries.ensureMessageFixture(spark, sfDir)
      queries.GraphQueries.ensureCitationFixture(spark, sfDir)
      queries.FeedQueries.ensureUnpaywallFixture(spark, sfDir)
      queries.FeedQueries.ensureBaseFixture(spark, sfDir)
      queries.FeedQueries.ensureDataciteFixture(spark, sfDir)
      queries.PipelineQueries.ensureAiUpdateExport(spark, sfDir)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] table warmup failed: ${e.getMessage}")
    }

    // Each query is timed once per FULL pass and the per-query MIN over
    // two separated passes reported. Back-to-back min-of-2 (the old
    // scheme) still charged both samples under whatever GC pressure /
    // shuffle-dir churn the predecessor left — the same query read
    // 4.21 s in-run vs 2.59 s isolated in round 6. Separating the
    // samples by a whole pass decorrelates the contention, so the min
    // approximates the isolated steady-state number the 100 TB sizing
    // needs; two full runs should now agree per query without manual
    // re-measurement.
    def timeOne(q: queries.Q): Double = {
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      // Force full evaluation of every column of every row. The
      // row hashes fold through bit_xor, which cannot overflow
      // under ANSI mode (sum of longs would).
      df.select(xxhash64(df.columns.map(c => col(s"`$c`").cast("string")): _*)
          .as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    val passes: Seq[Map[String, Double]] = (1 to 2).map { pass =>
      // Permute the execution order per pass (deterministic seed): with
      // a FIXED order, a query sitting directly after a heavyweight
      // neighbor inherits its GC/shuffle-churn wake in BOTH passes, and
      // the min cannot decorrelate a deterministic neighbor effect
      // (round 7: g9 always ran right after g8_pagerank in both passes
      // and read 5× its isolated cost). Distinct per-pass permutations
      // give every query two different predecessors, so the min over
      // passes approximates the isolated steady-state number.
      val order = new scala.util.Random(1000003L * pass).shuffle(selected)
      order.map { q =>
        System.err.println(s"[bench] pass $pass ${q.name}")
        try q.name -> timeOne(q)
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            q.name -> -1.0
        }
      }.toMap
    }
    val results: Seq[(String, Double, Boolean)] =
      selected.map { q =>
        val ts = passes.map(_(q.name)).filter(_ >= 0)
        if (ts.isEmpty) (q.name, -1.0, false) else (q.name, ts.min, true)
      }

    val qs = results
      .map { case (k, v, _) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v))
      }
      .mkString("{", ",", "}")
    val failed = results.count(!_._3)
    val total = results.filter(_._3).map(_._2).sum
    val sfJson = sfDir.replace("\\", "\\\\").replace("\"", "\\\"")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","timing":"min2","queries":$qs,"failed":$failed,"sf":"$sfJson"}""")
    spark.stop()
  }
}
