package graft.ops

import graft.Tables
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane LSH for cosine space.
  * Planes are generated driver-side from a fixed seed (Box-Muller over
  * splitmix64 streams) and enter the plan as array literals — every
  * executor sees identical planes with no closure capture or broadcast
  * variable, and the whole bucketing pipeline stays inside codegen'd
  * expressions (the dot products use the native [[graft.functions.DotProductF32]]). */
object Lsh {
  /** planes(table)(bit) = unit-free gaussian direction vector. */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Float]]] = {
    import graft.functions.Mix64.{mix, Golden}
    Array.tabulate(tables, bits, dim) { (t, b, d) =>
      val u1Bits = mix(seed + Golden * (1L + t * 1000003L + b * 7919L + d * 13L))
      val u2Bits = mix(u1Bits ^ Golden)
      val u1 = math.max((u1Bits >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
      val u2 = (u2Bits >>> 11).toDouble / (1L << 53).toDouble
      (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
    }
  }

  private def bucketCol(vec: Column, tablePlanes: Array[Array[Float]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, i) =>
      when(dot_f32(vec, typedlit(plane.toSeq)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Explode each row into one row per hash table with its bucket id:
    * adds (table_idx, bucket). */
  def bucketize(df: DataFrame, vecCol: String, planes: Array[Array[Array[Float]]]): DataFrame = {
    val tb = array(planes.zipWithIndex.map { case (tp, t) =>
      struct(lit(t).as("table_idx"), bucketCol(col(vecCol), tp).as("bucket"))
    }.toIndexedSeq: _*)
    df.withColumn("tb", explode(tb))
      .withColumn("table_idx", col("tb.table_idx"))
      .withColumn("bucket", col("tb.bucket"))
      .drop("tb")
  }

  /** DuckDB rendering of the same bucketing, for generated oracle SQL: the
    * planes are deterministic (seeded), so they inline as array literals.
    * Floats print via `.toDouble` — Float→Double is exact, and
    * Double.toString round-trips, so DuckDB parses the exact float32
    * value the engine's dot product consumes. */
  def bucketizeSql(srcRelation: String, planes: Array[Array[Array[Float]]]): String =
    planes.zipWithIndex.map { case (tp, t) =>
      val bucket = tp.zipWithIndex.map { case (plane, i) =>
        val arr = plane.map(_.toDouble.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), $arr) > 0.0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $t AS table_idx, $bucket AS bucket FROM $srcRelation"
    }.mkString("\n  UNION ALL ")
}

/** Approximate-nearest-neighbor search over an embedding column.
  * Beyond-reference surface (SURVEY.md §7.2 M5).
  *
  * Scale design (100 TB):
  *  - The query set is broadcast; the corpus is never collected or
  *    replicated. Brute force is corpus × broadcast(queries) — one scan.
  *  - Top-k is two-phase: per-partition top-k first (map-side, bounded
  *    memory), then a final top-k over k × partitions rows per query —
  *    the classic distributed top-k that avoids funneling the whole
  *    corpus's scores through one window partition.
  *  - IVF: coarse centroids are broadcast; each vector is assigned to its
  *    nearest centroid once (linear scan over broadcast centroids), and a
  *    query probes only `nprobe` clusters — the 100 TB path where brute
  *    force is off the table.
  */
object Similarity {

  /** Plant deterministic near-duplicate vectors (scaled + tiny offset →
    * cosine ≈ 1 vs the original) so near-dup ops have guaranteed positives
    * on the synthetic corpus (verified: natural max pairwise cosine ≈ 0.51). */
  def withPlantedNearDupVectors(emb: DataFrame): DataFrame =
    // single-pass fan-out (r20): original + perturbed twin from one
    // evaluation of each row (the unionAll form scanned the source twice).
    // Tag-explode keeps column pruning intact (see Dedup.withPlantedNearDups).
    emb.select(col("vec_id"), col("embedding"), col("label"),
      explode(typedlit(Seq(0L, 1L))).as("__v"))
      .select(
        (col("vec_id") + col("__v") * 1000000L).as("vec_id"),
        when(col("__v") === 0L, col("embedding"))
          .otherwise(expr("transform(embedding, x -> cast(x * 1.02 + 0.001 as float))"))
          .as("embedding"),
        col("label"))

  /** Distributed per-query top-k as a partial+final AGGREGATE: each map
    * task keeps a bounded k-element buffer per query (TopK Aggregator), so
    * the shuffle carries k rows per partition per query — never the full
    * score set. (A window over qid would exchange every scored row before
    * ranking could drop any.) Ties broken by neighbor id. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.Aggregators.TopK(k),
      org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.Scored])
    scored
      // cosine_f32 is null on dimension mismatch; Scored.score is a
      // primitive Double, so a null would throw in the encoder (a window
      // would have silently ranked it last) — drop it explicitly.
      .filter(col("cosine").isNotNull)
      .groupBy("qid")
      .agg(topk(col("cosine"), col("vec_id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("vec_id"), col("s.score").as("cosine"))
      .orderBy("qid", "rank")
  }

  def queries(emb: DataFrame, every: Long = 50L): DataFrame =
    emb.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Exact brute-force top-k: corpus scan × broadcast queries. */
  def bruteForceTopK(emb: DataFrame, k: Int = 10, every: Long = 50L): DataFrame = {
    val scored = emb
      .crossJoin(broadcast(queries(emb, every)))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosine_f32(col("qvec"), col("embedding")))
    topK(scored, k)
  }

  /** The exact double-accumulation loop of [[graft.functions.CosineSimF32]]
    * (and of DuckDB's list_cosine_similarity), replicated for driver-side
    * seeding so every engine computes bit-identical cosines. */
  private def cosF32(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Deterministic farthest-point (maximin) seeding — the kmeans++-style
    * init that replaced the r12 stride-37 heuristic (which left clusters
    * unbalanced: measured recall@10 0.62 at nprobe 3). Greedy rule: seed 1
    * is the sample's first point under a decorrelated integer key; each
    * next seed is the sample point whose NEAREST chosen seed is farthest
    * (argmin of max-cosine, ties by vec_id) — Gonzalez's 2-approximation
    * for k-center, fully deterministic and SQL-expressible, so the oracle
    * unrolls the same chain ([[maximinSeedCtes]]).
    *
    * Scale shape: the candidate pool is a global top-`sampleLimit` by the
    * integer key (TakeOrderedAndProject — one scan, bounded collect), the
    * FAISS train-on-sample discipline; the greedy loop is O(sample × k)
    * driver-side cosines over ≤ sampleLimit rows. The key arithmetic
    * ((id % 2^20) · 2654435761 mod 2^32) stays < 2^52 — exact in BIGINT
    * on every engine, no overflow UB. */
  private[ops] def maximinSeedIds(emb: DataFrame, k: Int, sampleLimit: Int): Seq[Long] =
    maximinSeeds(emb, k, sampleLimit).map(_._1)

  /** [[maximinSeedIds]] returning the seed VECTORS too — the greedy loop
    * already holds the whole sample on the driver, so callers that need
    * the centroid matrix (the r19 map-side assignment kernels) get it
    * without a second scan-and-collect job. */
  private[ops] def maximinSeeds(emb: DataFrame, k: Int,
      sampleLimit: Int): Seq[(Long, Array[Float])] = {
    val key = (col("vec_id") % 1048576L) * 2654435761L % 4294967296L
    val sample = emb.select(col("vec_id"), col("embedding"))
      .orderBy(key, col("vec_id"))
      .limit(sampleLimit)
      .collect() // bounded by sampleLimit, never by corpus size
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(sample.nonEmpty, "maximin seeding needs a non-empty corpus")
    val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
    val chosen = scala.collection.mutable.Set(sample.head._1)
    // incremental max-cos per candidate ≡ the oracle's MAX over all chosen
    // seeds (max of doubles is associative), O(sample × k) total
    val maxCos = scala.collection.mutable.Map.empty[Long, Double]
    sample.foreach(p => if (!chosen(p._1)) maxCos(p._1) = cosF32(p._2, sample.head._2))
    while (seeds.size < k && chosen.size < sample.length) {
      val next = sample.iterator.filterNot(p => chosen(p._1))
        .minBy(p => (maxCos(p._1), p._1))
      seeds += next
      chosen += next._1
      maxCos.remove(next._1)
      sample.foreach { p =>
        if (!chosen(p._1)) {
          val c = cosF32(p._2, next._2)
          if (c > maxCos(p._1)) maxCos(p._1) = c
        }
      }
    }
    seeds.toSeq
  }

  /** IVF top-k with SPILLED assignment: each corpus vector is indexed
    * under its `spill` nearest centroids (ScaNN's spilling / FAISS's
    * replica assignment — public techniques), queries probe `nprobe`
    * clusters. On weakly-clustered data — this corpus is near-isotropic
    * (within-label mean cosine 0.0016 vs 0.0003 across) — no seeding can
    * make 3/16 single-assigned cells catch a query's true neighbors;
    * spilling raises the per-probe catchment to ≈ 1−(1−nprobe/k)^spill of
    * the corpus while leaving nprobe (and so the QUERY-side cost model)
    * unchanged. The honest cost is index size × spill, and reads scale
    * with it — stated, not hidden.
    *
    * Centroids are maximin-seeded ([[maximinSeedIds]]) — measured
    * equivalent to stride seeding under spill on this corpus (r13 lab:
    * see BANDS note), kept for its determinism and its k-center cover
    * bound on genuinely clustered data. */
  def ivfTopK(emb: DataFrame, k: Int = 10, every: Long = 50L, nprobe: Int = 3,
      nCentroids: Int = 16, seedSample: Int = 512, spill: Int = 3): DataFrame = {
    // centroid vectors come straight from the maximin SAMPLE already on
    // the driver (bounded by nCentroids — the boundedness that made the
    // old broadcast(centroids) legal), so assignment and probing run
    // MAP-SIDE through the native NearestCentroidsF32 kernel (r19): the
    // ×|centroids| crossJoin expansion and the per-vector TopK
    // re-aggregation SHUFFLE disappear, with NO extra collect job;
    // scoring (cosine_f32), top-spill order (cos desc, id asc — the
    // bounded TopK's), and the probe window's order are replicated
    // bit-for-bit inside the kernel.
    val cs = maximinSeeds(emb, nCentroids, seedSample)
    val ids = cs.map(_._1)
    val vecs = cs.map(_._2.toSeq)
    val assignments = emb
      .select(col("vec_id"), col("embedding"),
        explode(graft.functions.GraftFunctions.nearest_centroids_f32(
          col("embedding"), ids, vecs, spill)).as("cluster"))
    val probes = queries(emb, every)
      .select(col("qid"), col("qvec"),
        explode(graft.functions.GraftFunctions.nearest_centroids_f32(
          col("qvec"), ids, vecs, nprobe, nanGreatest = true)).as("cluster"))
    val scored = assignments
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      // spill ⇒ a (qid, vec_id) pair can arrive via several shared
      // clusters; dedup BEFORE the bounded top-k so duplicates cannot
      // occupy two result slots (scores are identical across copies)
      .dropDuplicates("qid", "vec_id")
      .withColumn("cosine", cosine_f32(col("qvec"), col("embedding")))
    topK(scored, k)
  }

  /** LSH-bucketed top-k: candidates share a hyperplane bucket with the
    * query in at least one table (approximate — may miss true neighbors).
    *
    * Shuffle discipline (mirrors [[Dedup.embeddingNearDupPairs]]): the
    * bucket hashes are computed from the embedding map-side, then the
    * embedding is projected away BEFORE the ×tables explode reaches any
    * exchange — the bucket join and candidate dedup shuffle 3-long rows,
    * never the vector payload. Embeddings join back once, after the
    * candidate set has been deduplicated to its minimum size. */
  def lshTopK(emb: DataFrame, k: Int = 10, every: Long = 50L,
      tables: Int = 8, bits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = Lsh.hyperplanes(tables, bits, dim, seed)
    val corpusBuckets = Lsh.bucketize(emb, "embedding", planes)
      .select(col("vec_id"), col("table_idx"), col("bucket"))
    val qs = queries(emb, every)
    val qBuckets = Lsh.bucketize(
      qs.withColumnRenamed("qvec", "qvec_arr"), "qvec_arr", planes)
      .select(col("qid"), col("table_idx"), col("bucket"))
    val candidates = corpusBuckets
      .join(broadcast(qBuckets), Seq("table_idx", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id")
      .dropDuplicates("qid", "vec_id")
    val scored = candidates
      .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
      .join(broadcast(qs), Seq("qid"))
      .withColumn("cosine", cosine_f32(col("qvec"), col("embedding")))
    topK(scored, k)
  }

  /** Top-k over symmetric per-vector int8 quantization. At 100 TB the ANN
    * scan is IO-bound, so int8 storage is the scale lever: 4× less to
    * read/shuffle/cache than float32, with per-component error bounded by
    * half a quantization step (maxabs/254). Everything stays exact across
    * engines by construction: quantized components are integers, every
    * dot/norm partial sum stays < 2^53, so double accumulation is exact
    * integer arithmetic — order-independent and oracle-reproducible
    * (unlike float32 sums, whose rounding depends on order).
    *
    * q_i = floor(x_i · 127/max|x| + 0.5) ∈ [-127, 127] (fits tinyint);
    * cosine(q_a, q_b) = dot/(‖q_a‖·‖q_b‖) computed from the int vectors. */
  def quantizedTopK(emb: DataFrame, k: Int = 10, every: Long = 50L): DataFrame = {
    val q = quantize(emb)
    val qs = q.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("qvec").as("probe_vec"),
        col("qnorm").as("probe_norm"))
    val scored = q.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot_i8(col("qvec"), col("probe_vec")))
      .withColumn("cosine", col("dot") / (sqrt(col("qnorm")) * sqrt(col("probe_norm"))))
    topK(scored, k)
  }

  /** The composed 100 TB configuration: IVF's sub-linear candidate set ×
    * int8 quantization's 4× IO reduction. Centroid IDS come from the same
    * maximin seeding as [[ivfTopK]] (a bounded driver-side step over float
    * cosines — bit-reproducible like sim_topk_brute's oracle); everything
    * the INDEX does — assignment, probing, scoring — runs on the int8
    * vectors, so every cosine there is exact integer arithmetic (the
    * [[quantizedTopK]] property) and the full pipeline stays
    * oracle-reproducible. Assignment is the same map-side top-spill
    * kernel as [[ivfTopK]] (r19 — no assignment shuffle at all; the
    * int8 vectors reach the probe join 4× narrower than float32). */
  def ivfQuantizedTopK(emb: DataFrame, k: Int = 10, every: Long = 50L,
      nprobe: Int = 3, nCentroids: Int = 16, seedSample: Int = 512,
      spill: Int = 3): DataFrame = {
    val q = quantize(emb)
    // seed qvecs derive DRIVER-SIDE from the maximin sample's float
    // vectors (already collected — no second scan-and-quantize job),
    // replicating quantize()'s arithmetic operation for operation:
    // maxabs over |double(x)|, x·(127/greatest(maxabs,1e-300)) + 0.5
    // floored to tinyint, and the qnorm>0 row filter. Assignment and
    // probing then run MAP-SIDE through the NearestCentroids kernel
    // (r19): no ×|centroids| crossJoin, no per-vector TopK
    // re-aggregation shuffle, no probe window. Scoring is unchanged to
    // the bit: dot over exact-integer int8 components (the kernel's
    // double accumulation equals dot_i8's long accumulation on values
    // < 2^53) divided by the same sqrt product, and the kernel
    // recomputes cent_norm as Σx² — identical to the seed's qnorm.
    val cs = maximinSeeds(emb, nCentroids, seedSample).flatMap {
      case (id, v) =>
        val maxabs = v.map(x => math.abs(x.toDouble)).max
        val f = 127.0 / math.max(maxabs, 1e-300)
        val qv = v.map(x => math.floor(x.toDouble * f + 0.5).toLong.toByte)
        val qn = qv.map(b => b.toLong * b.toLong).sum
        if (qn > 0) Some((id, qv.map(_.toDouble).toSeq)) else None
    }
    val ids = cs.map(_._1)
    val vecs = cs.map(_._2)
    val assignments = q
      .select(col("vec_id"), col("qvec"), col("qnorm"),
        explode(graft.functions.GraftFunctions.nearest_centroids(
          col("qvec"), col("qnorm"), ids, vecs, spill)).as("cluster"))
    val probes = q.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("qvec").as("probe_vec"),
        col("qnorm").as("probe_norm"))
      .select(col("qid"), col("probe_vec"), col("probe_norm"),
        explode(graft.functions.GraftFunctions.nearest_centroids(
          col("probe_vec"), col("probe_norm"), ids, vecs, nprobe,
          nanGreatest = true)).as("cluster"))
    val scored = assignments
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      // spill dedup before the bounded top-k (see ivfTopK)
      .dropDuplicates("qid", "vec_id")
      .withColumn("cosine", dot_i8(col("qvec"), col("probe_vec")) /
        (sqrt(col("qnorm")) * sqrt(col("probe_norm"))))
    topK(scored, k)
  }

  /** IVF with k-means-TRAINED coarse centroids — real ANN indexes train
    * their quantizer (FAISS IVF runs Lloyd's); the stride-37 centroids of
    * [[ivfTopK]] are a placement heuristic. This runs `iters` rounds of
    * distributed Lloyd's over the int8-quantized corpus:
    *
    *  - assignment: one corpus scan × broadcast(centroids), partial+final
    *    `max_by` aggregate (shuffle = |corpus| int8 rows, same discipline
    *    as [[ivfQuantizedTopK]]);
    *  - update: posexplode to (cluster, dim) and partial-aggregated
    *    SUM/COUNT — the shuffle after map-side combine is
    *    k × dim × partitions rows, independent of corpus size; the k × dim
    *    means are collected to the driver (bounded by k, not data — the
    *    standard Spark Lloyd's step) and re-broadcast as literals, which
    *    also truncates the per-iteration lineage.
    *
    * Exactness: every updated mean is RE-QUANTIZED to scaled integers —
    * component = floor(sum·scale/count + 0.5), where the dimension sums
    * are exact integers, the division is a single correctly-rounded op,
    * and the result is an integer ≤ 127·scale. Centroids therefore stay
    * integer-valued through every iteration, so every dot/norm in
    * assignment, probing, and scoring is exact integer arithmetic in
    * doubles (< 2^53) — order-free and bit-identical to the DuckDB
    * oracle, like the rest of the quantized family. (Cosine is
    * scale-invariant, so the ×scale factor never affects ranking.)
    * Empty clusters keep their previous centroid. */
  private def centroidsDf(spark: SparkSession,
      cs: Array[(Long, Array[Double])]): DataFrame =
    spark.createDataFrame(cs.toSeq.map { case (id, v) =>
      (id, v.toSeq, v.map(x => x * x).sum) // exact-integer self-dot
    }).toDF("cent_id", "cent_vec", "cent_norm")

  /** Nearest-centroid assignment of the quantized corpus `q` — MAP-SIDE
    * (r19): the bounded centroid matrix rides the plan as a literal inside
    * the native [[graft.functions.NearestCentroids]] kernel, which
    * replicates `max_by(cent_id, struct(cent_cos, negate(cent_id)))` over
    * `dot_i8f64 / (sqrt·sqrt)` scoring bit-for-bit. Replaces the
    * `crossJoin(broadcast(centroids)) → groupBy(vec_id)` form: the
    * ×|centroids| row expansion and the per-vector re-aggregation
    * SHUFFLE disappear — assignment fuses into the scan. The Lloyd and
    * SemDeDup form — each point in EXACTLY one cluster. */
  private def assignQ(q: DataFrame,
      cs: Array[(Long, Array[Double])]): DataFrame = q
    .select(col("vec_id"),
      graft.functions.GraftFunctions.nearest_centroids(col("qvec"),
        col("qnorm"), cs.map(_._1).toSeq, cs.map(_._2.toSeq).toSeq, 1)
        .as("cluster"),
      col("qvec"), col("qnorm"))

  /** Top-`spill` SERVING assignment (r13, the ivfTopK recall lever):
    * each vector indexed under its `spill` nearest trained centroids —
    * the same map-side kernel with spill > 1 (top-`spill` ids by
    * (cos desc, id asc), the bounded-TopK-aggregate order it replaces),
    * one exploded row per (vector, spill slot). Used by the serving
    * paths only; Lloyd's update and SemDeDup keep [[assignQ]]. */
  private def assignQTop(q: DataFrame, cs: Array[(Long, Array[Double])],
      spill: Int): DataFrame = {
    if (spill <= 1) return assignQ(q, cs)
    q.select(col("vec_id"), col("qvec"), col("qnorm"),
      explode(graft.functions.GraftFunctions.nearest_centroids(col("qvec"),
        col("qnorm"), cs.map(_._1).toSeq, cs.map(_._2.toSeq).toSeq, spill))
        .as("cluster"))
      .select("vec_id", "cluster", "qvec", "qnorm")
  }

  /** `iters` rounds of distributed Lloyd's over the quantized corpus —
    * see [[kmeansIvfTopK]] for the exactness argument. */
  private def trainCentroids(q: DataFrame, nCentroids: Int, iters: Int,
      scale: Int): Array[(Long, Array[Double])] = {
    // deterministic init: the first nCentroids stride-37 seeds, pre-scaled
    // so every centroid generation lives on the same integer grid
    var cents: Array[(Long, Array[Double])] = q
      .filter(col("vec_id") % 37 === 0).orderBy("vec_id").limit(nCentroids)
      .select("vec_id", "qvec").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Byte](1).map(b => b.toDouble * scale).toArray))
    for (_ <- 1 to iters) {
      // ONE exchange per round (r19): the (cluster, pos) partial+final
      // mean aggregate is collected directly — k × dim rows, bounded by
      // the centroid count, never by the corpus — and regrouped on the
      // driver; the old second groupBy(cluster) shuffle existed only to
      // assemble the per-cluster arrays the driver builds here anyway.
      // (sum(v) * scale) / count + 0.5 — shape mirrored EXACTLY in the
      // oracle SQL so the one inexact division rounds identically
      val rows = assignQ(q, cents)
        .select(col("cluster"), posexplode(col("qvec")))
        .groupBy("cluster", "pos")
        .agg(floor(sum(col("col").cast("double")) * lit(scale.toDouble) /
          count(lit(1)) + lit(0.5)).as("m"))
        .collect() // bounded: nCentroids × dim rows
      val means = rows.groupBy(_.getLong(0)).map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble).toArray
      }
      cents = cents.map { case (id, old) => id -> means.getOrElse(id, old) }
    }
    cents
  }

  /** Probe ranking: each query's `nprobe` nearest clusters — the same
    * map-side kernel (r19; replaces the crossJoin + row_number window;
    * nanGreatest replicates the window's `cent_cos DESC` NaN-first
    * order). Duplicate qids are deduped first: a query set derived from
    * the SPILLED index carries one row per (vector, spill slot), and
    * ranking over duplicated rows would burn probe slots on repeated
    * clusters. */
  private def probeClusters(queries: DataFrame,
      cs: Array[(Long, Array[Double])], nprobe: Int): DataFrame = {
    val ids = cs.map(_._1).toSeq
    val vecs = cs.map(_._2.toSeq).toSeq
    val top = // spill == 1 returns a bare id — wrap for the uniform explode
      if (nprobe == 1) array(graft.functions.GraftFunctions
        .nearest_centroids(col("probe_vec"), col("probe_norm"), ids, vecs, 1))
      else graft.functions.GraftFunctions.nearest_centroids(
        col("probe_vec"), col("probe_norm"), ids, vecs, nprobe,
        nanGreatest = true)
    queries
      .dropDuplicates("qid")
      .select(col("qid"), col("probe_vec"), col("probe_norm"),
        explode(top).as("cluster"))
  }

  private def scoreAndTop(assignments: DataFrame, probes: DataFrame,
      k: Int): DataFrame = {
    val scored = assignments
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("qid"))
      // under spilled assignment a (qid, vec_id) pair can arrive via
      // several shared clusters; dedup BEFORE the bounded top-k so
      // duplicates cannot occupy two result slots (a no-op pair-wise for
      // single-assign callers)
      .dropDuplicates("qid", "vec_id")
      .withColumn("cosine", dot_i8(col("qvec"), col("probe_vec")) /
        (sqrt(col("qnorm")) * sqrt(col("probe_norm"))))
    topK(scored, k)
  }

  def kmeansIvfTopK(emb: DataFrame, k: Int = 10, every: Long = 50L,
      nprobe: Int = 3, nCentroids: Int = 16, iters: Int = 2,
      scale: Int = 64, spill: Int = 3): DataFrame = {
    val q = quantize(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainCentroids(q, nCentroids, iters, scale)
    val queries = q.filter(col("vec_id") % every === 0)
      .select(col("vec_id").as("qid"), col("qvec").as("probe_vec"),
        col("qnorm").as("probe_norm"))
    scoreAndTop(assignQTop(q, cents, spill),
      probeClusters(queries, cents, nprobe), k)
  }

  /** Persist a trained IVF index: centroids + the assigned int8 corpus
    * PARTITIONED BY CLUSTER. Build once, query many — the 100 TB serving
    * shape: at query time only the probed clusters' partitions are read
    * from disk (partition pruning on the cluster directory column), i.e.
    * ~nprobe/nCentroids of the index bytes, instead of re-deriving
    * quantization + assignment per query batch. */
  def buildKmeansIvfIndex(emb: DataFrame, path: String, nCentroids: Int = 16,
      iters: Int = 2, scale: Int = 64, spill: Int = 3): Unit = {
    val spark = emb.sparkSession
    val q = quantize(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainCentroids(q, nCentroids, iters, scale)
    // r13: the index stores the SPILLED assignment (each vector under its
    // `spill` nearest centroids) — index bytes × spill, probe reads ×
    // spill·nprobe/nCentroids of it, recall@10 0.81-class instead of
    // 0.62 at unchanged nprobe; the honest 100 TB trade, stated
    assignQTop(q, cents, spill).write.partitionBy("cluster")
      .mode("overwrite").parquet(s"$path/assign")
    centroidsDf(spark, cents).write.mode("overwrite")
      .parquet(s"$path/centroids")
    // trained-base size in assign ROWS (the same unit appends add, so the
    // staleness fraction stays row-to-row) — counted from the WRITTEN
    // assignment, not the analytic vectors × spill upper bound: training
    // can converge to fewer than `spill` distinct centroids on tiny or
    // degenerate corpora, and an overcounted base would under-fire
    // kmeansIvfIndexStale. A count on the just-written parquet reads
    // row-group metadata only. Written through the Hadoop FS layer like
    // the index parquet, so an HDFS/S3 index path carries its marker WITH
    // the index instead of stranding it on one driver's local disk.
    writeTrained(spark, path, spark.read.parquet(s"$path/assign").count())
    q.unpersist()
  }

  private def trainedMarker(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path, "TRAINED")
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def writeTrained(spark: SparkSession, path: String, n: Long): Unit = {
    val (p, fs) = trainedMarker(spark, path)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readTrained(spark: SparkSession, path: String): Long = {
    val (p, fs) = trainedMarker(spark, path)
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").trim.toLong
    finally in.close()
  }

  private def loadCentroids(spark: SparkSession,
      path: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$path/centroids").select("cent_id", "cent_vec")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** Append new vectors into an EXISTING index without retraining or
    * rewriting: quantize, assign against the persisted (frozen) centroids,
    * and append partition-wise — only the appended rows' cluster
    * directories gain files; the trained base and the centroids are
    * untouched. Queries see appended vectors immediately (the serving
    * path reads whole cluster partitions).
    *
    * The price of frozen centroids is drift: appended data the training
    * never saw can land in poorly-fitting clusters, decaying recall.
    * [[kmeansIvfIndexStale]] makes that measurable instead of silent —
    * the analog of the MV fingerprint contract, adapted to an index whose
    * "fingerprint" is how far the corpus has outgrown the training. */
  def appendToKmeansIvfIndex(emb: DataFrame, path: String,
      spill: Int = 3): Unit =
    assignQTop(quantize(emb), loadCentroids(emb.sparkSession, path), spill)
      .write.partitionBy("cluster").mode("append").parquet(s"$path/assign")

  /** True when appended rows exceed `maxAppendFraction` of the trained
    * base — the re-train trigger. Reads the TRAINED marker plus parquet
    * footer row counts (a metadata-only count, no data scan). */
  def kmeansIvfIndexStale(spark: SparkSession, path: String,
      maxAppendFraction: Double = 0.2): Boolean = {
    val trained = readTrained(spark, path)
    val total = spark.read.parquet(s"$path/assign").count()
    total - trained > maxAppendFraction * trained
  }

  /** The index lifecycle in ONE entrypoint: (re)train when the index is
    * missing or [[kmeansIvfIndexStale]], no-op otherwise. `corpus` is the
    * FULL current corpus (trained base + everything appended since) — a
    * rebuild re-reads the data, not the index, so drifted appends get
    * centroids that actually fit them and recall recovers to its trained
    * level. Returns true iff a (re)build ran, so callers (and the spec)
    * observe the decision. The staleness check is metadata-only; the
    * periodic-maintenance loop calls this after every append batch and
    * pays the training scans only when the threshold trips — the same
    * ensure-then-serve cadence as [[graft.plans.MaterializedViews]]. */
  def ensureFresh(corpus: DataFrame, path: String,
      maxAppendFraction: Double = 0.2, nCentroids: Int = 16,
      iters: Int = 2, scale: Int = 64): Boolean = {
    val spark = corpus.sparkSession
    val (p, fs) = trainedMarker(spark, path)
    val rebuild = !fs.exists(p) ||
      kmeansIvfIndexStale(spark, path, maxAppendFraction)
    if (rebuild) buildKmeansIvfIndex(corpus, path, nCentroids, iters, scale)
    rebuild
  }

  /** Recall@k of an approximate top-k against the brute-force truth on
    * the SAME (qid, vec_id) universe: |approx ∩ exact| / |exact|,
    * averaged over queries. The oracle rows pin each pipeline's EXACT
    * output; this pins the QUALITY axis — how much of the true top-k the
    * bucketed search keeps — so nprobe/nCentroids tuning has a measured
    * trade-off, not just a latency curve. */
  /** Oracle-gated twin of [[recallAtK]]: per-query hit counts and integer
    * per-mille recall, as a DataFrame — the quality dashboard row for an
    * ANN deployment (which queries the bucketing fails, not just the
    * average). Exact integer arithmetic so any engine reproduces the
    * numbers bit-for-bit; the join touches only the two ≤ |queries|·k
    * top-k frames, never the corpus. */
  def recallPerQuery(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid"), col("vec_id")).withColumn("hit", lit(1L)),
        Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(coalesce(sum("hit"), lit(0L)).as("hits"), count(lit(1)).as("n_exact"))
      .select(col("qid"), col("hits"),
        expr("hits * 1000 DIV n_exact").as("recall_per_mille"))
      .orderBy("qid")

  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"),
        "left_semi")
      .count().toDouble
    val total = exact.count()
    require(total > 0, "empty exact top-k")
    hit / total
  }

  /** Serve top-k from a persisted index. `queries`: (qid, probe_vec
    * array<tinyint>, probe_norm). Reads ONLY the probed clusters'
    * partitions (the probed-cluster set is bounded by nCentroids, so the
    * driver-side IN-list is O(k), not O(queries)). */
  def queryKmeansIvfIndex(spark: SparkSession, path: String,
      queries: DataFrame, k: Int = 10, nprobe: Int = 3): DataFrame = {
    val probes = probeClusters(queries, loadCentroids(spark, path), nprobe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probed = probes.select("cluster").distinct()
      .collect().map(_.getLong(0)) // bounded by nCentroids
    val raw = spark.read.parquet(s"$path/assign")
    // filter in the partition column's INFERRED type (directory values
    // read back int when they fit) and only then normalize to long — a
    // cast under the filter would defeat partition pruning
    val vals: Seq[Any] = raw.schema("cluster").dataType match {
      case org.apache.spark.sql.types.IntegerType => probed.map(_.toInt).toSeq
      case _ => probed.toSeq
    }
    val assign = raw.filter(col("cluster").isin(vals: _*))
      .withColumn("cluster", col("cluster").cast("long"))
    scoreAndTop(assign, probes, k)
  }

  /** DuckDB rendering of [[kmeansIvfTopK]]: the quantizer, seeded init,
    * each Lloyd round (assignment + scaled-integer mean re-quantization),
    * probing, and scoring unrolled as a CTE chain with the same constants
    * and the same expression shapes, so every intermediate is the same
    * exact integer (or the same correctly-rounded division). */
  /** The quantizer + seeded init + Lloyd rounds + final assignment as a
    * reusable CTE chain ending at `af(vec_id, cluster, qvec, qnorm)` —
    * shared by the kmeans-IVF oracle and the SemDeDup oracle so the two
    * entries answer to literally the same trained quantizer. */
  private def lloydCtes(nCentroids: Int, iters: Int, scale: Int,
      dim: Int, src: String = "embeddings", servingSpill: Int = 1): String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, cluster, qvec, qnorm FROM (
         |    SELECT e.vec_id, c.cent_id AS cluster, e.qvec, e.qnorm,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |             ORDER BY list_dot_product(e.qvec, c.cent_vec) /
         |                      (SQRT(e.qnorm) * SQRT(list_dot_product(c.cent_vec, c.cent_vec))) DESC,
         |                      c.cent_id) AS r
         |    FROM n e CROSS JOIN $cents c) t WHERE r = 1
         |)""".stripMargin
    def updateCte(assign: String, prev: String, mName: String,
        cName: String): String =
      s"""$mName AS (
         |  SELECT cluster, i AS pos,
         |         FLOOR(SUM(qvec[i + 1]) * $scale.0 / COUNT(*) + 0.5) AS m
         |  FROM $assign CROSS JOIN range($dim) t(i)
         |  GROUP BY cluster, i
         |), $cName AS (
         |  SELECT p.cent_id,
         |         COALESCE(m.vec, p.cent_vec) AS cent_vec
         |  FROM $prev p LEFT JOIN (
         |    SELECT cluster, list(m ORDER BY pos) AS vec
         |    FROM $mName GROUP BY cluster) m ON m.cluster = p.cent_id
         |)""".stripMargin
    val rounds = (1 to iters).map { i =>
      assignCte(s"a$i", s"c${i - 1}") + ",\n" +
        updateCte(s"a$i", s"c${i - 1}", s"m$i", s"c$i")
    }.mkString(",\n")
    val cf = s"c$iters"
    // serving-only SPILLED assignment (r ≤ spill — the ivfTopK recall
    // lever, r13): emitted as a SEPARATE `afs` CTE so SemDeDup's
    // cluster-bounded pair semantics (each point in EXACTLY one cluster,
    // `af`) are untouched
    val serving =
      if (servingSpill <= 1) ""
      else ",\n" +
        s"""afs AS (
           |  SELECT vec_id, cluster, qvec, qnorm FROM (
           |    SELECT e.vec_id, c.cent_id AS cluster, e.qvec, e.qnorm,
           |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |             ORDER BY list_dot_product(e.qvec, c.cent_vec) /
           |                      (SQRT(e.qnorm) * SQRT(list_dot_product(c.cent_vec, c.cent_vec))) DESC,
           |                      c.cent_id) AS r
           |    FROM n e CROSS JOIN $cf c) t WHERE r <= $servingSpill
           |)""".stripMargin
    s"""q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x ->
       |           CAST(FLOOR(CAST(x AS DOUBLE) *
       |                (127.0 / GREATEST(list_max(list_transform(embedding, y -> ABS(CAST(y AS DOUBLE)))), 1e-300))
       |                + 0.5) AS DOUBLE)) AS qvec
       |  FROM $src
       |), n AS (
       |  SELECT vec_id, qvec, list_dot_product(qvec, qvec) AS qnorm FROM q
       |  WHERE list_dot_product(qvec, qvec) > 0
       |), c0 AS (
       |  SELECT vec_id AS cent_id, list_transform(qvec, x -> x * $scale.0) AS cent_vec
       |  FROM n WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT $nCentroids
       |),
       |$rounds,
       |${assignCte("af", cf)}$serving""".stripMargin
  }

  def kmeansIvfSql(k: Int = 10, every: Long = 50L, nprobe: Int = 3,
      nCentroids: Int = 16, iters: Int = 2, scale: Int = 64,
      dim: Int = 64, spill: Int = 3): String = {
    val cf = s"c$iters"
    val assignRel = if (spill > 1) "afs" else "af"
    s"""WITH ${lloydCtes(nCentroids, iters, scale, dim, servingSpill = spill)},
       |probes AS (
       |  SELECT qid, probe_vec, probe_norm, cluster FROM (
       |    SELECT p.vec_id AS qid, p.qvec AS probe_vec, p.qnorm AS probe_norm,
       |           c.cent_id AS cluster,
       |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |             ORDER BY list_dot_product(p.qvec, c.cent_vec) /
       |                      (SQRT(p.qnorm) * SQRT(list_dot_product(c.cent_vec, c.cent_vec))) DESC,
       |                      c.cent_id) AS r
       |    FROM n p CROSS JOIN $cf c WHERE p.vec_id % $every = 0) t WHERE r <= $nprobe
       |),
       |cand AS (
       |  -- spill ⇒ a pair can share several clusters; dedup before top-k
       |  SELECT DISTINCT p.qid, p.probe_vec, p.probe_norm, a.vec_id, a.qvec, a.qnorm
       |  FROM $assignRel a JOIN probes p USING (cluster)
       |  WHERE a.vec_id <> p.qid
       |)
       |SELECT qid, rank, vec_id, cosine FROM (
       |  SELECT c.qid, c.vec_id,
       |         list_dot_product(c.qvec, c.probe_vec) / (SQRT(c.qnorm) * SQRT(c.probe_norm)) AS cosine,
       |         ROW_NUMBER() OVER (PARTITION BY c.qid
       |           ORDER BY list_dot_product(c.qvec, c.probe_vec) / (SQRT(c.qnorm) * SQRT(c.probe_norm)) DESC, c.vec_id) AS rank
       |  FROM cand c) t
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication" — the public recipe):
    * k-means-cluster the embedding space, then deduplicate PAIRWISE ONLY
    * WITHIN each cluster — the cluster bound is what makes semantic
    * near-dup removal tractable at web scale (the paper runs ~11k
    * clusters over 100M+ points; pair cost is Σ(cluster size)², never
    * n²). Reuses this file's trained quantizer verbatim: the SAME
    * deterministic Lloyd's over int8-quantized vectors as
    * [[kmeansIvfTopK]], so the SemDeDup oracle and the IVF oracle answer
    * to literally the same clustering.
    *
    * Duplicate rule: vectors u < v (vec_id order) in the same cluster
    * with cosine(u, v) ≥ tauNum/tauDen are duplicates; v is DROPPED and
    * records its smallest witness as `dup_of` — the same one-sided
    * canonical-first-survivor rule as the span-dedup family (the paper
    * keeps one point per ε-ball; which one is a free choice, and the
    * total order makes ours engine-stable). Threshold exactness: the
    * comparison is integer CROSS-MULTIPLICATION — cos ≥ t/T ⟺ dot ≥ 0 ∧
    * (T·dot)² ≥ t²·‖a‖²·‖b‖² — over exact-integer-valued doubles
    * (dot ≤ 127²·64 ⇒ (10·dot)² ≤ 1.1e14 < 2^53), so there is NO
    * float-precision knife edge at the threshold, unlike a sqrt-based
    * cosine compare.
    *
    * Scale shape: one corpus scan to quantize (checkpointed — the Lloyd
    * rounds and both self-join sides replay the compact int8 rows, never
    * the parquet scan), the bounded Lloyd's rounds (shuffle ∝
    * k·dim·partitions), ONE hash exchange on cluster for the self-join,
    * and a pair-linear group-min. k is NOT fixed: it scales as
    * n/targetClusterSize (floored at nCentroids), so per-cluster pair
    * work stays ~targetClusterSize²/2 and total pair volume stays LINEAR
    * in n — the paper's own discipline (~11k clusters for 100M points ≈
    * 9k/cluster). At the sf0.01 oracle gate the floor keeps k at the
    * oracle SQL's constant 16.
    * Output: (vec_id, cluster, dup_of nullable, kept), ORDER BY vec_id. */
  /** semDedup's k-floor and cluster-size target — named ONCE so the
    * entry, the static oracle default, the parametric oracle generator,
    * and the gate pin all read the same constants (r17 review: the
    * k = max(floor, n/target) formula must not exist as two literal
    * copies). */
  private[graft] val SemDedupNCentroids = 16
  private[graft] val SemDedupTargetClusterSize = 128

  def semDedup(emb: DataFrame, tauNum: Int = 9, tauDen: Int = 10,
      nCentroids: Int = SemDedupNCentroids, iters: Int = 2, scale: Int = 64,
      targetClusterSize: Int = SemDedupTargetClusterSize,
      oracleK: Option[Int] = None): DataFrame = {
    require(tauNum >= 0 && tauDen > 0, "threshold must be non-negative")
    val q = quantize(emb).localCheckpoint()
    val k = math.max(nCentroids, (q.count() / targetClusterSize).toInt)
    // an oracle-gated caller pins the k its SQL hard-codes: if the fixture
    // grows past nCentroids·targetClusterSize the gate must fail HERE with
    // a named assertion, not as an opaque hash mismatch downstream
    oracleK.foreach(ok => require(k == ok,
      s"semDedup computed k=$k but the paired oracle SQL hard-codes k=$ok " +
        "(fixture grew past nCentroids*targetClusterSize — regenerate the oracle)"))
    val cents = trainCentroids(q, k, iters, scale)
    // consumed three times (two self-join sides + the output frame):
    // localCheckpoint, not persist — the probeMinhashIndex rationale
    val assign = assignQ(q, cents)
      .select("vec_id", "cluster", "qvec", "qnorm").localCheckpoint()
    val left = assign.select(col("cluster"), col("vec_id").as("id_a"),
      col("qvec").as("va"), col("qnorm").as("na"))
    val right = assign.select(col("cluster"), col("vec_id").as("id_b"),
      col("qvec").as("vb"), col("qnorm").as("nb"))
    val dropped = left.join(right, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dot", dot_i8(col("va"), col("vb")))
      .filter(col("dot") >= 0D &&
        (col("dot") * tauDen) * (col("dot") * tauDen) >=
          col("na") * col("nb") * (tauNum.toLong * tauNum))
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
    assign.select("vec_id", "cluster")
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** DuckDB rendering of [[semDedup]]: the shared [[lloydCtes]] chain,
    * then the within-cluster pair filter under the same integer
    * cross-multiplied threshold. */
  def semDedupSql(tauNum: Int = 9, tauDen: Int = 10,
      nCentroids: Int = SemDedupNCentroids,
      iters: Int = 2, scale: Int = 64, dim: Int = 64): String =
    s"""WITH emb2 AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id,
       |         list_transform(embedding,
       |           x -> CAST(x * CAST(1.02 AS DOUBLE) + CAST(0.001 AS DOUBLE) AS REAL)) AS embedding
       |  FROM embeddings
       |),
       |${lloydCtes(nCentroids, iters, scale, dim, src = "emb2")},
       |dropped AS (
       |  SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM (
       |    SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |    FROM af x JOIN af y
       |      ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |    WHERE list_dot_product(x.qvec, y.qvec) >= 0
       |      AND (list_dot_product(x.qvec, y.qvec) * $tauDen)
       |          * (list_dot_product(x.qvec, y.qvec) * $tauDen)
       |          >= x.qnorm * y.qnorm * ${tauNum.toLong * tauNum}
       |  ) GROUP BY id_b)
       |SELECT a.vec_id, a.cluster, d.dup_of, d.dup_of IS NULL AS kept
       |FROM af a LEFT JOIN dropped d USING (vec_id)
       |ORDER BY a.vec_id""".stripMargin

  /** Shared int8 symmetric quantization: (vec_id, qvec: array<tinyint>,
    * qnorm: exact self-dot). greatest(·, 1e-300) only guards the all-zero
    * vector (float32 magnitudes are ≥ 1e-45, far above the floor); dot_i8
    * is the native codegen'd loop (higher-order-function lambdas would
    * interpret per element in the pair-scoring hot path). */
  private def quantize(emb: DataFrame): DataFrame =
    emb
      .withColumn("maxabs",
        expr("array_max(transform(embedding, y -> abs(cast(y as double))))"))
      .withColumn("qvec", expr(
        """transform(embedding, x ->
          |  cast(floor(cast(x as double) * (127.0D / greatest(maxabs, 1e-300D)) + 0.5D)
          |       as tinyint))""".stripMargin))
      .withColumn("qnorm", dot_i8(col("qvec"), col("qvec")))
      .filter(col("qnorm") > 0)
      .select("vec_id", "qvec", "qnorm")

  /** The dedup_semantic planting — every vector gains a perturbed twin
    * under +1_000_000 (the dedup_incr_embedding perturbation verbatim);
    * ONE definition shared by the entry and the scale-parametric oracle
    * generator so the k they compute cannot drift. */
  private def plantedEmb(s: SparkSession, d: String): DataFrame =
    // single-pass fan-out (r20), same move as [[withPlantedNearDupVectors]]
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        explode(typedlit(Seq(0L, 1L))).as("__v"))
      .select(
        (col("vec_id") + col("__v") * 1000000L).as("vec_id"),
        when(col("__v") === 0L, col("embedding"))
          .otherwise(expr("transform(embedding, x -> cast(x * 1.02 + 0.001 as float))"))
          .as("embedding"))

  /** The dedup_semantic oracle regenerated for an ARBITRARY fixture
    * (r16 verdict #2): k is computed from the quantized planted-union
    * count exactly as [[semDedup]] computes it (max(16, n/128) — the
    * same quantize() filter, so even an all-zero vector is excluded on
    * both sides), then the SAME Lloyd CTE chain is unrolled at that k.
    * At the gate SF this reproduces the static k=16 oracle character
    * for character; at sf0.1 it unrolls k=78, so the full-suite bonus
    * audit can value-match instead of reading the gate-pinned k. */
  def semDedupOracleFor(s: SparkSession, d: String): String = {
    val k = math.max(SemDedupNCentroids,
      (quantize(plantedEmb(s, d)).count() / SemDedupTargetClusterSize).toInt)
    semDedupSql(nCentroids = k)
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sim_topk_brute" -> ((s, d) => bruteForceTopK(Tables.load(s, d, "embeddings"))),
    "sim_topk_ivf" -> ((s, d) => ivfTopK(Tables.load(s, d, "embeddings"))),
    "sim_topk_lsh" -> ((s, d) => lshTopK(Tables.load(s, d, "embeddings"))),
    "sim_topk_quantized" -> ((s, d) => quantizedTopK(Tables.load(s, d, "embeddings"))),
    "sim_topk_ivf_quantized" -> ((s, d) => ivfQuantizedTopK(Tables.load(s, d, "embeddings"))),
    "sim_topk_ivf_kmeans" -> ((s, d) => kmeansIvfTopK(Tables.load(s, d, "embeddings"))),
    // the corpus plus its planted perturbed twins (the dedup_incr_embedding
    // planting verbatim): every twin must co-cluster with and be dropped
    // against its original, so the entry exercises real removals
    "dedup_semantic" -> ((s, d) =>
      // the DUMPED oracle at the gate SF hard-codes k=16: pin it there so
      // a regenerated-bigger sf0.01 fixture fails loudly at the source
      // (r12 advice), while bench/scale runs at other SFs keep the
      // entry's own n/targetClusterSize scaling (sf0.1 computes k=78 —
      // and [[semDedupOracleFor]] regenerates the oracle at that k, so a
      // non-gate-SF audit value-matches instead of reading a pinned k)
      semDedup(plantedEmb(s, d),
        oracleK = if (d.stripSuffix("/").endsWith("sf0.01"))
          Some(SemDedupNCentroids) else None)),
    // the measured quality axis, under the gate: IVF's per-query recall
    // against the brute-force truth
    "sim_recall_ivf" -> ((s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      recallPerQuery(ivfTopK(emb), bruteForceTopK(emb))
    }),
  )

  /** DuckDB oracles for the exact brute-force variant and for IVF (whose
    * centroid choice, assignment, and probing are all deterministic, so
    * the whole index is SQL-expressible; list_cosine_similarity matches
    * cosine_f32's double accumulation, ties broken identically by id). */
  val oracle: Seq[(String, String)] = Seq(
    // generated CTE chain unrolling the trained-quantizer pipeline with
    // the same constants as the entry's defaults
    "sim_topk_ivf_kmeans" -> kmeansIvfSql(),
    "dedup_semantic" -> semDedupSql(),
    // mirrors quantizedTopK exactly: same floor(x·127/max|x| + 0.5)
    // quantizer, same double accumulation (exact — all intermediates are
    // integers < 2^53), same (cosine DESC, vec_id) tie order
    "sim_topk_quantized" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x ->
        |           CAST(FLOOR(CAST(x AS DOUBLE) *
        |                (127.0 / GREATEST(list_max(list_transform(embedding, y -> ABS(CAST(y AS DOUBLE)))), 1e-300))
        |                + 0.5) AS DOUBLE)) AS qvec
        |  FROM embeddings
        |), n AS (
        |  SELECT vec_id, qvec, list_dot_product(qvec, qvec) AS qnorm FROM q
        |  WHERE list_dot_product(qvec, qvec) > 0
        |)
        |SELECT qid, rank, vec_id, cosine FROM (
        |  SELECT p.vec_id AS qid, c.vec_id,
        |         list_dot_product(c.qvec, p.qvec) / (SQRT(c.qnorm) * SQRT(p.qnorm)) AS cosine,
        |         ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |           ORDER BY list_dot_product(c.qvec, p.qvec) / (SQRT(c.qnorm) * SQRT(p.qnorm)) DESC, c.vec_id) AS rank
        |  FROM n c JOIN n p ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id) t
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    // same quantizer + exact-integer arithmetic as sim_topk_quantized,
    // composed with the deterministic IVF index (centroids, assignment,
    // probing all on the int8 vectors); sqrt/÷ are IEEE correctly-rounded
    // on exact-integer inputs, so engine and oracle agree bit-for-bit
    "sim_topk_ivf_quantized" ->
      s"""WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x ->
        |           CAST(FLOOR(CAST(x AS DOUBLE) *
        |                (127.0 / GREATEST(list_max(list_transform(embedding, y -> ABS(CAST(y AS DOUBLE)))), 1e-300))
        |                + 0.5) AS DOUBLE)) AS qvec
        |  FROM embeddings
        |), n AS MATERIALIZED (
        |  SELECT vec_id, qvec, list_dot_product(qvec, qvec) AS qnorm FROM q
        |  WHERE list_dot_product(qvec, qvec) > 0
        |), ${maximinSeedCtes(16, 512)},
        |centroids AS MATERIALIZED (
        |  SELECT n.vec_id AS cent_id, n.qvec AS cent_vec, n.qnorm AS cent_norm
        |  FROM n JOIN seedsu16 s ON s.vec_id = n.vec_id
        |), assign AS (
        |  SELECT vec_id, cluster, qvec, qnorm FROM (
        |    SELECT e.vec_id, c.cent_id AS cluster, e.qvec, e.qnorm,
        |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_dot_product(e.qvec, c.cent_vec) / (SQRT(e.qnorm) * SQRT(c.cent_norm)) DESC, c.cent_id) AS r
        |    FROM n e CROSS JOIN centroids c) t WHERE r <= 3
        |), probes AS (
        |  SELECT qid, probe_vec, probe_norm, cluster FROM (
        |    SELECT p.vec_id AS qid, p.qvec AS probe_vec, p.qnorm AS probe_norm, c.cent_id AS cluster,
        |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |             ORDER BY list_dot_product(p.qvec, c.cent_vec) / (SQRT(p.qnorm) * SQRT(c.cent_norm)) DESC, c.cent_id) AS r
        |    FROM n p CROSS JOIN centroids c WHERE p.vec_id % 50 = 0) t WHERE r <= 3
        |), cand AS (
        |  SELECT DISTINCT p.qid, p.probe_vec, p.probe_norm, a.vec_id, a.qvec, a.qnorm
        |  FROM assign a JOIN probes p USING (cluster)
        |  WHERE a.vec_id <> p.qid
        |)
        |SELECT qid, rank, vec_id, cosine FROM (
        |  SELECT c.qid, c.vec_id,
        |         list_dot_product(c.qvec, c.probe_vec) / (SQRT(c.qnorm) * SQRT(c.probe_norm)) AS cosine,
        |         ROW_NUMBER() OVER (PARTITION BY c.qid
        |           ORDER BY list_dot_product(c.qvec, c.probe_vec) / (SQRT(c.qnorm) * SQRT(c.probe_norm)) DESC, c.vec_id) AS rank
        |  FROM cand c) t
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "sim_topk_brute" -> bruteSql,
    "sim_topk_ivf" -> ivfSql,
    // recall@10 per query from the SAME two pipelines' oracle CTEs: a
    // drift in either leg mismatches here too, and the QUALITY number
    // itself (not just each pipeline's rows) sits under the gate
    "sim_recall_ivf" ->
      s"""WITH brute AS ($bruteSql),
         |ivf AS ($ivfSql)
         |SELECT b.qid,
         |       CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |       CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000
         |         // COUNT(*) AS recall_per_mille
         |FROM brute b LEFT JOIN ivf i ON i.qid = b.qid AND i.vec_id = b.vec_id
         |GROUP BY b.qid ORDER BY b.qid""".stripMargin,
  ) ++ lshOracle

  private lazy val bruteSql: String =
    """SELECT qid, rank, vec_id, cosine FROM (
      |  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
      |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cosine,
      |         ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |                            ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      |  WHERE q.vec_id % 50 = 0 ) t
      |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  /** The DuckDB mirror of [[maximinSeedIds]]: the same bounded sample by
    * the same integer key, then k−1 unrolled greedy steps — each picks the
    * candidate with the smallest MAX cosine to the seeds chosen so far
    * (ties by vec_id), exactly the engine's incremental-max loop. Exposes
    * `seedsu$k` as the final seed set. */
  /** The DuckDB mirror of [[maximinSeedIds]]: the same bounded sample by
    * the same integer key, then k−1 unrolled greedy steps — each picks the
    * candidate with the smallest MAX cosine to the seeds chosen so far
    * (ties by vec_id), exactly the engine's incremental-max loop.
    * MATERIALIZED is load-bearing: each step references the previous seed
    * set twice and the sample once, so inlined CTEs would expand the chain
    * exponentially (observed as a file-handle explosion on the base scan).
    * Exposes `seedsu$k` as the final seed set. */
  private[ops] def maximinSeedCtes(k: Int, limit: Int): String = {
    val key = "((vec_id % 1048576) * 2654435761) % 4294967296"
    val b = new StringBuilder
    b ++= s"""samp AS MATERIALIZED (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             |  ORDER BY $key, vec_id LIMIT $limit),
             |seedsu1 AS MATERIALIZED (SELECT vec_id, v FROM samp ORDER BY $key, vec_id LIMIT 1)""".stripMargin
    for (i <- 2 to k) {
      b ++= s""",
               |seed$i AS (
               |  SELECT vec_id, v FROM (
               |    SELECT p.vec_id AS vec_id, first(p.v) AS v,
               |           MAX(list_cosine_similarity(p.v, s.v)) AS mc
               |    FROM samp p, seedsu${i - 1} s
               |    WHERE p.vec_id NOT IN (SELECT vec_id FROM seedsu${i - 1})
               |    GROUP BY p.vec_id) t
               |  ORDER BY mc, vec_id LIMIT 1),
               |seedsu$i AS MATERIALIZED (SELECT * FROM seedsu${i - 1} UNION ALL SELECT * FROM seed$i)""".stripMargin
    }
    b.toString
  }

  private lazy val ivfSql: String =
    s"""WITH ${maximinSeedCtes(16, 512)},
        |centroids AS MATERIALIZED (
        |  SELECT vec_id AS cent_id, v AS cent_vec FROM seedsu16
        |),
        |assign AS (
        |  SELECT vec_id, cluster FROM (
        |    SELECT e.vec_id, c.cent_id AS cluster,
        |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
        |             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cent_vec) DESC, c.cent_id) AS r
        |    FROM embeddings e CROSS JOIN centroids c) t WHERE r <= 3
        |),
        |probes AS (
        |  SELECT qid, cluster FROM (
        |    SELECT q.vec_id AS qid, c.cent_id AS cluster,
        |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cent_vec) DESC, c.cent_id) AS r
        |    FROM embeddings q CROSS JOIN centroids c WHERE q.vec_id % 50 = 0) t WHERE r <= 3
        |),
        |cand AS (
        |  -- spill ⇒ a pair can share several clusters; dedup before top-k
        |  SELECT DISTINCT p.qid, a.vec_id
        |  FROM assign a JOIN probes p USING (cluster)
        |  WHERE a.vec_id <> p.qid
        |)
        |SELECT qid, rank, vec_id, cosine FROM (
        |  SELECT c.qid, c.vec_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cosine,
        |         ROW_NUMBER() OVER (PARTITION BY c.qid
        |           ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM cand c
        |  JOIN embeddings q ON q.vec_id = c.qid
        |  JOIN embeddings e ON e.vec_id = c.vec_id) t
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // The hyperplanes are seeded-deterministic, so even LSH is
  // SQL-expressible: the generated oracle inlines the planes as array
  // literals and rebuilds the bucket join + top-k. (Sign decisions are
  // robust: dot magnitudes are O(1) while double sum-order noise is
  // ~1e-16, so the engine and DuckDB agree on every bucket bit.)
  private lazy val lshOracle: Seq[(String, String)] = Seq(
    "sim_topk_lsh" -> {
      val buckets = Lsh.bucketizeSql("embeddings",
        Lsh.hyperplanes(tables = 8, bits = 8, dim = 64, seed = 42L))
      s"""WITH buckets AS (
         |  $buckets
         |),
         |qb AS (SELECT vec_id AS qid, table_idx, bucket FROM buckets WHERE vec_id % 50 = 0),
         |cand AS (SELECT DISTINCT q.qid, c.vec_id
         |         FROM buckets c JOIN qb q ON c.table_idx = q.table_idx AND c.bucket = q.bucket
         |         WHERE c.vec_id <> q.qid),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
         |SELECT qid, rank, vec_id, cosine FROM (
         |  SELECT qid, cand.vec_id,
         |         list_cosine_similarity(vq.vec, vc.vec) AS cosine,
         |         ROW_NUMBER() OVER (PARTITION BY qid
         |           ORDER BY list_cosine_similarity(vq.vec, vc.vec) DESC, cand.vec_id) AS rank
         |  FROM cand
         |  JOIN v vq ON vq.vec_id = cand.qid
         |  JOIN v vc ON vc.vec_id = cand.vec_id) t
         |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
    },
  )
}
