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

  /** Scalar int8 quantization of an embedding: per-vector symmetric scale
    * (max |x| / 127), q_i = round(x_i * 127 / max|x|) — the standard
    * memory-4x ANN compression. Pure per-row expressions (one scale + one
    * transform); zero vectors quantize to zeros with scale 0. Returns
    * struct(scale double, q array<int>). */
  def quantizeInt8(vec: Column): Column = {
    val v = transform(vec, _.cast("double"))
    val mx = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    struct(
      (mx / 127.0).as("scale"),
      when(mx === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => round(x * 127.0 / mx).cast("int")))
        .as("q"))
  }

  /** Inverse of [[quantizeInt8]]: x_i ≈ q_i * scale. */
  def dequantizeInt8(quant: Column): Column =
    transform(quant.getField("q"), q => q.cast("double") * quant.getField("scale"))

  /** Sequential-order dot product, accumulated in double — the native
    * codegen [[graft.functions.DotProduct]] expression (bit-identical to
    * the interpreted `aggregate(zip_with(...))` form it replaced, ~an order
    * of magnitude faster per pair). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

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

  /** Upper bound on model elements (plane/centroid/codebook/component
    * floats) embedded as expression literals. Past this, a "trained model"
    * belongs in a broadcast join, not in the plan — a directed error beats
    * a megabyte-scale generated codegen unit that stalls janino or blows
    * the 64 KB method limit. */
  val MaxModelLiteralElems: Long = 1L << 20

  private def guardModel(what: String, rows: Int, dim: Int): Unit =
    require(rows.toLong * dim <= MaxModelLiteralElems,
      s"$what: $rows x $dim = ${rows.toLong * dim} literal elements exceed " +
        s"MaxModelLiteralElems=$MaxModelLiteralElems — train a smaller " +
        "model or restructure as a broadcast join")

  /** Random-hyperplane LSH bucket id: bit i = sign(v · plane_i). Planes are
    * small and go into the expression as literals (broadcast-free). */
  def hyperplaneBucket(vecCol: Column, planes: Seq[Seq[Float]]): Column = {
    guardModel("hyperplaneBucket planes", planes.size,
      planes.headOption.map(_.size).getOrElse(0))
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vecCol, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

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
    guardModel("ivfCell centroids", centroids.size,
      centroids.headOption.map(_.size).getOrElse(0))
    // native codegen expression; same fp values as the zip_with fold it
    // replaced, so the argmin tie-break (exact-double compare) is unchanged
    def sq(c: Seq[Float]): Column =
      graft.functions.SquaredDistance(vecCol, typedLit(c))
    val dists = array(centroids.map(sq): _*)
    array_position(dists, array_min(dists)).cast("int") - 1
  }

  /** Distributed Lloyd iterations to BUILD the IVF centroids (the reference
    * of [[ivfCell]]/[[ivfTopK]] assumes centroids exist; real corpora need
    * them trained). Scale shape per iteration: assignment is a per-row
    * expression over centroid literals (no join, no shuffle), the update is
    * ONE hash aggregation on (cell, dimension) — k*dim result rows, driver
    * collect is tiny. Deterministic: seeds are the first k vectors by
    * `idCol`; empty cells keep their previous centroid. */
  def kmeansCentroids(emb: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int = 5): Seq[Seq[Float]] = {
    // seed collect is k x dim DRIVER-SIDE BY DESIGN: it plans as
    // TakeOrderedAndProject (k rows cross the wire, never the corpus), and
    // the centroids must live on the driver anyway to become expression
    // literals for the assignment pass — guarded like every literal model
    var centroids: Seq[Seq[Float]] = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toSeq).toSeq
    guardModel("kmeansCentroids", k,
      centroids.headOption.map(_.size).getOrElse(0))
    for (_ <- 0 until iters) {
      val means = emb.withColumn("cell", ivfCell(col(vecCol), centroids))
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("v")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        byCell.get(c) match {
          case Some(rows) => rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq
          case None => old
        }
      }
    }
    centroids
  }

  /** Mean squared distance of each vector to its assigned centroid — the
    * k-means objective, for convergence checks. */
  def distortion(emb: DataFrame, vecCol: String, centroids: Seq[Seq[Float]]): Double = {
    def sq(c: Seq[Float]): Column =
      graft.functions.SquaredDistance(col(vecCol), typedLit(c))
    emb.select(array_min(array(centroids.map(sq): _*)).as("d2"))
      .agg(avg(col("d2"))).head().getDouble(0)
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

  /** Plane count for a near-dup corpus: enough hyperplanes that the EXPECTED
    * bucket size stays near `targetBucketSize` — i.e. bucket count grows
    * WITH the corpus (2^p >= corpusSize / targetBucketSize). A fixed plane
    * count makes the within-bucket pairing quadratic in corpus size; this
    * keeps it linear. Pure integer math so any engine computing the same
    * formula (e.g. a SQL oracle via LENGTH(bin(k-1))) lands on the same
    * count. */
  def planeCountFor(corpusSize: Long, targetBucketSize: Int = 64,
      maxPlanes: Int = 30): Int = {
    val k = (corpusSize + targetBucketSize - 1) / targetBucketSize
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(k - 1, 0L))
    math.max(1, math.min(maxPlanes, bits))
  }

  /** All-pairs near-duplicate detection by embedding cosine within LSH
    * buckets (embedding-space analog of Dedup.minhashNearDupsRelational).
    *
    * Scale shape: bucket membership is capped BEFORE any pairing with a
    * partitioned row_number (a sort-based window — streams and spills, never
    * holding a bucket's vectors in one task). The first `maxBucketSize`
    * members (by id) pair all-pairs through a bucket-keyed SELF-JOIN — a
    * sort-merge join whose per-key group buffers spill to disk, so even a
    * heavily skewed bucket (clustered embeddings concentrate: the r9 64x
    * stress OOMed the previous collect_list+flatten shape, which
    * materialized cap^2 pairs with full vectors inside ONE task) streams
    * its pairs out incrementally. Every member beyond the cap pairs
    * ROW-WISE with the bucket's rank-1 member, so output stays bounded by
    * buckets * (cap^2 + overflow) — never quadratic in the corpus — while
    * no member escapes the verify stage unpaired. Size `planes` with
    * [[planeCountFor]] so bucket count tracks corpus size.
    *
    * Precondition: `idCol` values are DISTINCT (document ids). Rows sharing
    * an id never pair with each other (the id_a < id_b join filter), so a
    * duplicate-id corpus under-reports pairs rather than erroring. */
  def cosineNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Float]], threshold: Double,
      maxBucketSize: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms precomputed once per vector (the pairwise stage would otherwise
    // fold each 64-element array three times per candidate pair)
    val bucketed = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
      .withColumn("nrm", norm(col("v")))
    // rank-only window: carrying the bucket's first MEMBER (vector included)
    // as a running first_value would double every row's width through the
    // window — instead overflow rows join back to the rank-1 member, a join
    // that only ever touches overflow rows + one row per bucket
    val bw = Window.partitionBy(col("bucket")).orderBy(col("id"))
    // persisted: four consumers (both self-join sides, firsts, overflow)
    // would otherwise each re-run the sort + window and re-shuffle every
    // row's full vector — the sibling minhashNearDupsRelational persists
    // its ranked frame for the same reason
    val ranked = bucketed.withColumn("rn", row_number().over(bw)).transform(ScaleToolkit.cached)
    val inCap = ranked.filter(col("rn") <= maxBucketSize)
    val inCapPairs = inCap
      .select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("nrm_a"))
      .join(inCap.select(col("bucket"), col("id").as("id_b"),
        col("v").as("v_b"), col("nrm").as("nrm_b")), Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cos_sim"))
    val firsts = ranked.filter(col("rn") === 1)
      .select(col("bucket"), col("id").as("id_a"),
        col("v").as("v_a"), col("nrm").as("nrm_a"))
    val overflowPairs = ranked.filter(col("rn") > maxBucketSize)
      .select(col("bucket"), col("id").as("id_b"),
        col("v").as("v_b"), col("nrm").as("nrm_b"))
      .join(firsts, Seq("bucket"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cos_sim"))
    inCapPairs.union(overflowPairs)
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** Product-quantization code assignment (Jégou et al. 2011; the
    * compression half of FAISS-style IVF-PQ): each vector splits into `m`
    * contiguous subvectors, each subspace has its own `k`-centroid codebook
    * (train with [[kmeansCentroids]] over sliced vectors), and the vector
    * compresses to `m` small codes — 64 floats become 2 bytes at m=2, k<=256.
    * Assignment is pure per-row expressions over codebook literals
    * ([[ivfCell]] on a slice per subspace): no join, no shuffle, scan-speed
    * at any corpus size. Returns (id, code_0..code_{m-1}). */
  def pqCodes(emb: DataFrame, vecCol: String, idCol: String,
      codebooks: Seq[Seq[Seq[Float]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    guardModel("pqCodes codebooks", codebooks.map(_.size).sum,
      codebooks.head.head.size)
    val offsets = codebooks.map(_.head.length).scanLeft(0)(_ + _)
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      require(cb.forall(_.length == cb.head.length),
        s"codebook $j has ragged centroid lengths")
      ivfCell(slice(col(vecCol), offsets(j) + 1, cb.head.length), cb)
        .as(s"code_$j")
    }
    emb.select(col(idCol) +: codes: _*)
  }

  /** IVF-PQ residual coding (Jégou et al. 2011 §III.A, the actual FAISS
    * IVFPQ layout): each vector is assigned to its nearest coarse centroid,
    * and PQ codes quantize the RESIDUAL (v - centroid) instead of v itself.
    * Residual magnitudes are much smaller than vector magnitudes, so the
    * same code budget buys finer resolution — better recall than plain PQ
    * at equal bytes. Returns (id, cell, code_0..code_m-1).
    *
    * Scale shape: everything is per-row expression work over literal
    * models (cell argmin, zip_with residual, per-subspace argmin) — no
    * join, no shuffle; codes land in one projection. */
  def pqCodesResidual(emb: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebook")
    val offsets = codebooks.map(_.head.length).scanLeft(0)(_ + _)
    require(centroids.forall(_.length >= offsets.last),
      s"centroids narrower than the ${offsets.last} dims codebooks span")
    val withCell = emb.withColumn("cell", ivfCell(col(vecCol), centroids))
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      require(cb.forall(_.length == cb.head.length),
        s"codebook $j has ragged centroid lengths")
      // residual in DOUBLE: float subtraction would round each element
      // before the distance accumulates in double, diverging from the
      // all-double arithmetic any SQL replay computes
      val sub = slice(col(vecCol).cast("array<double>"), offsets(j) + 1,
        cb.head.length)
      val centSub: Seq[Seq[Double]] = centroids.map(
        _.slice(offsets(j), offsets(j) + cb.head.length).map(_.toDouble))
      val resid = zip_with(sub,
        element_at(typedLit(centSub), col("cell") + 1), (x, y) => x - y)
      val dists = array(cb.map(c =>
        graft.functions.SquaredDistance(resid, typedLit(c))): _*)
      (array_position(dists, array_min(dists)).cast("int") - 1).as(s"code_$j")
    }
    withCell.select(col(idCol) +: col("cell").cast("int").as("cell") +: codes: _*)
  }

  /** ADC search over residual PQ codes: for every (cell, code) pair the
    * squared distance || (query - centroid_cell)[sub_j] - codebook_j[code] ||^2
    * is precomputed driver-side (cells x m x k doubles — tiny), and a row's
    * approximate distance is m nested-literal lookups keyed by its cell and
    * codes. `nprobe` restricts the scan to the cells nearest the query
    * (FAISS-style coarse pruning); rows outside probed cells are filtered
    * BEFORE any distance work. */
  def pqAdcResidualTopK(emb: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]],
      query: Seq[Float], k: Int, nprobe: Int = 2): DataFrame = {
    val offsets = codebooks.map(_.head.length).scanLeft(0)(_ + _)
    require(offsets.last <= query.length,
      s"codebooks span ${offsets.last} dims; query has ${query.length}")
    require(nprobe >= 1 && nprobe <= centroids.size, s"nprobe $nprobe")
    guardModel("pqAdcResidualTopK tables", centroids.size,
      codebooks.map(_.size).sum)
    def qd(c: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < query.length) {
        val d = c(i).toDouble - query(i).toDouble; acc += d * d; i += 1
      }
      acc
    }
    val probeCells = centroids.indices.sortBy(i => (qd(centroids(i)), i)).take(nprobe)
    // tables(j)(cell)(code), sequential-index double accumulation (the fp
    // order the oracle's per-element sum reproduces); unprobed cells carry
    // empty rows (never dereferenced — the filter runs first)
    val tables = codebooks.zipWithIndex.map { case (cb, j) =>
      centroids.indices.map { cell =>
        if (!probeCells.contains(cell)) Seq.empty[Double]
        else {
          val res = (offsets(j) until offsets(j) + cb.head.length).map(i =>
            query(i).toDouble - centroids(cell)(i).toDouble)
          cb.map { c =>
            var acc = 0.0; var i = 0
            while (i < c.length) {
              val d = res(i) - c(i).toDouble; acc += d * d; i += 1
            }
            acc
          }
        }
      }
    }
    val codes = pqCodesResidual(emb, vecCol, idCol, centroids, codebooks)
      .filter(col("cell").isin(probeCells: _*))
    val adc = tables.zipWithIndex.map { case (t, j) =>
      element_at(element_at(typedLit(t.map(_.toSeq)), col("cell") + 1),
        col(s"code_$j") + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes — the search
    * half of FAISS-style IVF-PQ (Jégou et al. 2011 §III.B): the query stays
    * uncompressed; each subspace's distances to its codebook centroids are
    * precomputed driver-side into an m × k table (tiny), and a row's
    * approximate squared distance is m table lookups + adds over its codes.
    * Per-row expressions over literal tables + `TakeOrderedAndProject`:
    * no join, no shuffle, no vector column read past the code assignment —
    * at 100 TB the scan touches only the m small code columns. */
  def pqAdcTopK(emb: DataFrame, vecCol: String, idCol: String,
      codebooks: Seq[Seq[Seq[Float]]], query: Seq[Float], k: Int): DataFrame = {
    val offsets = codebooks.map(_.head.length).scanLeft(0)(_ + _)
    require(offsets.last <= query.length,
      s"codebooks span ${offsets.last} dims; query has ${query.length}")
    // driver-side distance tables, sequential-index double accumulation
    // (the fp order the oracle's per-element sum reproduces)
    val tables = codebooks.zipWithIndex.map { case (cb, j) =>
      val qs = query.slice(offsets(j), offsets(j) + cb.head.length)
      cb.map { c =>
        var acc = 0.0
        var i = 0
        while (i < c.length) {
          val d = c(i).toDouble - qs(i).toDouble; acc += d * d; i += 1
        }
        acc
      }
    }
    val codes = pqCodes(emb, vecCol, idCol, codebooks)
    val adc = tables.zipWithIndex.map { case (dt, j) =>
      element_at(array(dt.map(lit): _*), col(s"code_$j") + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * a row survives iff it has no near-duplicate (cosine >= `threshold`)
    * with a smaller id in its LSH bucket. The drop policy is "keep the
    * earliest member of each near-dup relation", evaluated pairwise — a
    * deterministic NOT EXISTS, not a transitive closure, so it is
    * order-independent and expressible identically in plain SQL.
    *
    * Scale shape: all pairing work is [[cosineNearDupPairs]] (bucketed,
    * pre-capped, never quadratic in the corpus); the survivor step is one
    * distinct on the dropped ids + a left_anti join — both shuffle on the
    * id key only, vectors never ride the anti-join. Returns the surviving
    * rows of `emb` unchanged. */
  def semDedupSurvivors(emb: DataFrame, vecCol: String, idCol: String,
      planes: Seq[Seq[Float]], threshold: Double,
      maxBucketSize: Int = 10000): DataFrame = {
    // pairs are emitted with id_a < id_b, so id_b is always the later
    // member — the one the keep-earliest policy drops
    val dropped = cosineNearDupPairs(emb, vecCol, idCol, planes, threshold,
        maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    emb.join(dropped, Seq(idCol), "left_anti")
  }

  /** PCA model: per-dimension mean, eigenvalues (variance per component,
    * descending), and row-major principal components (k rows of dim). */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Fit PCA over an embedding column — the standard dimensionality
    * reduction before IVF/PQ indexing (and the core of OPQ-style
    * rotations). Two corpus passes, both shuffle-free until a tiny agg:
    *  1. mean: one per-dimension average (dim result rows);
    *  2. covariance: each PARTITION accumulates its local centered
    *     outer-product sum into one dim x dim buffer (`mapPartitions`, the
    *     classic treeAggregate shape — per-row work is dim^2 flops, the
    *     shuffle is one dim^2-length array PER PARTITION, not per row);
    *     partial sums add element-wise in one final aggregation.
    * The eigendecomposition runs on the DRIVER over the dim x dim matrix
    * (cyclic Jacobi — embeddings are 64-1024 wide, so this is microseconds;
    * the corpus never materializes). Components are sign-normalized
    * (largest-|coordinate| positive) for determinism. */
  def pcaFit(emb: DataFrame, vecCol: String, k: Int): PcaModel = {
    val spark = emb.sparkSession
    val firstRows = emb.select(col(vecCol)).head(1)
    require(firstRows.nonEmpty,
      s"pcaFit: input has no rows (vector column '$vecCol')")
    val dim = firstRows(0).getSeq[Float](0).size
    require(k >= 1 && k <= dim, s"k $k outside [1, $dim]")
    val meanRow = emb
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val mean = Array.tabulate(dim)(meanRow)
    val meanBc = spark.sparkContext.broadcast(mean)
    import org.apache.spark.sql.Encoders
    // one flattened (dim*dim + 1) accumulator per partition — the centered
    // upper-triangle outer-product sum plus the row count — element-wise
    // summed by reduce (few rows, dim^2 wide)
    val summed = emb.select(col(vecCol).as("v"))
      .mapPartitions { it =>
        val m = meanBc.value
        val d = m.length
        val acc = new Array[Double](d * d + 1)
        var any = false
        it.foreach { row =>
          val v = row.getSeq[Float](0)
          any = true
          acc(d * d) += 1
          var i = 0
          while (i < d) {
            val xi = v(i) - m(i)
            var j = i
            while (j < d) {
              acc(i * d + j) += xi * (v(j) - m(j))
              j += 1
            }
            i += 1
          }
        }
        if (any) Iterator.single(acc) else Iterator.empty
      }(Encoders.javaSerialization[Array[Double]])
      .reduce { (a, b) =>
        val out = new Array[Double](a.length)
        var i = 0
        while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
        out
      }
    val n = summed(dim * dim)
    require(n > 1, s"pcaFit needs at least 2 vectors, saw ${n.toLong}")
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val v = if (i <= j) summed(i * dim + j) else summed(j * dim + i)
      v / (n - 1)
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    val components = order.map { c =>
      val vec = Array.tabulate(dim)(r => eigVecs(r)(c))
      // deterministic sign: the largest-|coordinate| entry is positive
      val pivot = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(pivot) < 0) vec.map(-_) else vec
    }.toArray
    PcaModel(mean, order.map(eigVals).toArray, components)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, column eigenvectors). Driver-side, O(dim^3) per sweep;
    * dims here are embedding widths (<= a few thousand). */
  private[operators] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol * 1e-3) {
            off = math.max(off, math.abs(a(p)(q)))
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Project embeddings onto a fitted [[PcaModel]]: per-row dot products
    * against component literals (no shuffle, vectors read once). With
    * `whiten = true` each coordinate scales by 1/sqrt(eigenvalue) —
    * unit-variance output, the preconditioner PQ codebooks like. Returns
    * `df` plus `pca` (array<double>, length k). */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
      whiten: Boolean = false): DataFrame = {
    guardModel("pcaProject components", model.components.length,
      model.components.headOption.map(_.length).getOrElse(0))
    val coords = model.components.zipWithIndex.map { case (comp, c) =>
      val centeredDot = graft.functions.DotProduct(col(vecCol), typedLit(comp.toSeq)) -
        lit(comp.zip(model.mean).map { case (w, m) => w * m }.sum)
      if (whiten) centeredDot / math.sqrt(math.max(model.eigenvalues(c), 1e-12))
      else centeredDot
    }
    df.withColumn("pca", array(coords: _*))
  }
}
