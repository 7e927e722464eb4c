package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k for a *small* query set —
  *    the query side is broadcast, so the big side streams through one
  *    scan (no shuffle of the corpus).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — corpus and queries
  *    hash to sign-pattern buckets; only bucket-cohabitants are scored.
  *    This is the 100 TB path: bucket join instead of query×corpus.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
                        lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
                            lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
                            lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (queries broadcast;
    * excludes self-matches when ids collide). Ties broken by neighbor id
    * so results are deterministic. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv")))
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("sim"), 4).as("sim"))
  }

  /** Sign-pattern LSH bucket id: `planes` pseudo-random hyperplanes with
    * ±1 components derived deterministically from xxhash64(plane, dim) —
    * no stored model, identical on every executor. */
  def lshBucket(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dotSign = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x.cast("double") *
            when(xxhash64(lit(p), i).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(dotSign > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k via LSH buckets: candidates are corpus vectors in
    * the same bucket as the query; scored exactly, ranked per query.
    * Fewer planes → bigger buckets → better recall, more compute. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              id: String, vec: String, k: Int,
              planes: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).as("cv"),
                          lshBucket(col(vec), planes, dim).as("bucket"))
    val q = broadcast(queries.select(col(id).as("query_id"), col(vec).as("qv"),
                          lshBucket(col(vec), planes, dim).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("sim"), 4).as("sim"))
  }
}
