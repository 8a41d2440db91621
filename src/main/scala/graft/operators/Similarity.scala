package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — one scan, no shuffle beyond the final
  * TakeOrdered. Scale paths: hyperplane LSH bucketing (search only colliding
  * buckets) and IVF (search only the closest centroid cells); both turn the
  * O(N) scan per query into O(N / buckets) with the bucket assignment
  * precomputed as a per-row expression.
  */
object Similarity {

  /** Sequential-order dot product of two float arrays, accumulated in double
    * (fp-deterministic: index order, not reduction-tree order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k by cosine against one query vector (broadcast scalar).
    * `TakeOrderedAndProject` keeps only k rows per partition then on the
    * driver — no full sort. */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    emb.select(col(idCol), round(cosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id: bit i = sign(v · plane_i). Planes are
    * small and go into the expression as literals (broadcast-free). */
  def hyperplaneBucket(vecCol: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vecCol, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via LSH: search only rows in the query's bucket (plus optional
    * neighbor probes by flipping one bit). */
  def lshTopK(emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], planes: Seq[Seq[Float]], k: Int,
      multiProbe: Boolean = true): DataFrame = {
    val qBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x.toDouble * y.toDouble }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: planes.indices.map(i => qBucket ^ (1L << i))
      else Seq(qBucket)
    emb.withColumn("bucket", hyperplaneBucket(col(vecCol), planes))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF cell assignment: id of the nearest centroid (argmin squared L2).
    * Centroids are literals; per-row expression, no shuffle. */
  def ivfCell(vecCol: Column, centroids: Seq[Seq[Float]]): Column = {
    def sq(c: Seq[Float]): Column =
      aggregate(zip_with(vecCol, typedLit(c), (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    val dists = array(centroids.map(sq): _*)
    array_position(dists, array_min(dists)).cast("int") - 1
  }

  /** IVF search: probe the `nprobe` cells closest to the query. */
  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], centroids: Seq[Seq[Float]], k: Int,
      nprobe: Int = 2): DataFrame = {
    def qd(c: Seq[Float]): Double =
      c.zip(query).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
    val probeCells = centroids.indices.sortBy(i => qd(centroids(i))).take(nprobe)
    emb.withColumn("cell", ivfCell(col(vecCol), centroids))
      .filter(col("cell").isin(probeCells: _*))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(query)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near-duplicate detection by embedding cosine within LSH
    * buckets (embedding-space analog of Dedup.minhashNearDups). */
  def cosineNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Float]], threshold: Double): DataFrame = {
    // norms precomputed once per vector (the pairwise stage would otherwise
    // fold each 64-element array three times per candidate pair)
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
    val a = bucketed.select(col("id").as("id_a"), col("v").as("v_a"),
      col("nrm").as("n_a"), col("bucket"))
    val b = bucketed.select(col("id").as("id_b"), col("v").as("v_b"),
      col("nrm").as("n_b"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim").distinct()
  }
}
