package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force ANN, and an
  * IVF-style partitioned search. Embeddings are `array<float>` columns;
  * all math is done in double via higher-order functions (`zip_with` +
  * `aggregate`) — codegen'd, no UDFs, deterministic element order (a
  * sequential fold, matching DuckDB's `list_dot_product`).
  *
  * Scale shape:
  *   - brute-force top-k: a broadcast of the (small) query set against a
  *     map-only scan of N candidates + per-query top-k heap — the exact
  *     baseline every ANN index is judged against. O(N·Q·d), no shuffle on
  *     the N side except the final per-query k-row aggregation.
  *   - IVF: candidates are pre-assigned to their nearest centroid (one
  *     broadcast join at build time); a query probes only its centroid's
  *     partition → the scan shrinks by ~|centroids|×. The centroid
  *     assignment column doubles as a physical partition key at 100 TB
  *     (write the index bucketed/partitioned by `centroid_id`, and the
  *     probe prunes partitions at scan time).
  */
object Vectors {

  /** Sequential-fold dot product of two float-array columns, in double.
    * Backed by the native codegen expression
    * [[graft.functions.FloatArrayDot]] — a tight primitive loop with no
    * per-row array allocation; bit-identical to the equivalent
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)` fold (see [[dotHof]]).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.floatDot(a, b)

  /** The composable higher-order-function formulation of [[dot]] — kept as
    * the reference semantics the native expression must match.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** null-guarded division: ANSI mode (Spark 4 default) throws
    * DIVIDE_BY_ZERO on x/0 — a zero-norm vector (failed inference, padding)
    * must yield null, not abort the job.
    */
  def safeDiv(num: Column, denom: Column): Column =
    when(denom =!= 0.0, num / denom)

  /** Cosine similarity; null if either norm is zero. */
  def cosine(a: Column, b: Column): Column =
    safeDiv(dot(a, b), norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row, the k nearest candidate
    * rows. Ranking uses the *rounded* similarity plus the candidate id as
    * tiebreak so results are reproducible across engines and partitionings.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     queryId: String = "query_id", candId: String = "vec_id",
                     queryVec: String = "q_emb", candVec: String = "embedding")
  : DataFrame = {
    // Precompute norms on each side BEFORE the cross join: O(N+Q) sqrt-folds
    // instead of O(N·Q). The per-pair work drops to one dot product.
    // dot/(sqrt(na)·sqrt(nb)) is bit-identical to cosine() since the same
    // doubles multiply in the same order.
    val cand = candidates.withColumn("_cn", norm(col(candVec)))
    val qs = queries.withColumn("_qn", norm(col(queryVec)))
    val scored = cand.crossJoin(broadcast(qs))
      .withColumn("cos",
        round(safeDiv(dot(col(queryVec), col(candVec)),
          col("_qn") * col("_cn")), 6))
    val w = Window.partitionBy(queryId)
      .orderBy(col("cos").desc, col(candId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(candId), col("cos"))
  }

  /** Assign every vector to its nearest centroid (IVF build step).
    * `centroids` must be small (it is broadcast). Output: input columns +
    * `centroid_id`. Distance = negative cosine (max similarity).
    */
  def assignToCentroids(vectors: DataFrame, idCol: String,
                        centroids: DataFrame,
                        vecCol: String = "embedding",
                        centroidId: String = "centroid_id",
                        centroidVec: String = "c_emb"): DataFrame =
    centroidProbes(vectors, idCol, centroids, nprobe = 1,
      vecCol, centroidId, centroidVec)

  /** Exact nearest-neighbor per vector over all pairs (brute force), with
    * an aggregation plan shape built for scale.
    *
    * The naive formulation — `row_number() OVER (PARTITION BY id ORDER BY
    * cos DESC)` then `rn = 1` — shuffles and sorts every scored pair, and
    * (worse) the sort rows still carry both embedding arrays. Instead,
    * (rounded cos, candidate id) is packed into ONE comparable long:
    *
    *   key = round(cos·1e6) << 40  +  (2^40 - 1 - nn_id)
    *
    * so `max(key)` IS "highest cosine, ties → lowest id". A plain
    * `max(long)` aggregate has a fixed-width buffer, so Spark plans a
    * HashAggregate with map-side partial aggregation: each task reduces its
    * pairs to one candidate per vec_id before the exchange — the shuffle
    * carries O(N) longs instead of O(N²) array-laden rows, and nothing is
    * ever sorted. (A struct-valued `max`/`max_by` would fall back to
    * SortAggregate: struct buffers aren't hash-aggregable.)
    *
    * Bounds: |round(cos·1e6)| ≤ 1e6 so the shifted key fits a long with
    * room for ids < 2^40 (~10^12 vectors). Pairs with a zero-norm side
    * have null cos, which `max(key)` ignores; a vector whose EVERY pair is
    * null-cos (it or the whole corpus is zero-norm) falls back to the
    * lowest other id with a null score — the same row the ranked-window
    * formulation (nulls last, id tiebreak) and the SQL oracle emit.
    *
    * Decoded `nn_cos` = key_hi / 1e6 — the correctly-rounded double of a
    * 6-decimal value, identical to `round(cos, 6)` in both Spark and DuckDB.
    */
  def nearestNeighborExact(vectors: DataFrame, idCol: String,
                           vecCol: String = "embedding"): DataFrame = {
    val idBits = 40
    val idMask = (1L << idBits) - 1
    // fan the streamed side out: a single-row-group input gives the O(N²)
    // pair loop one partition — one core does all the work regardless of
    // cluster size (an unspecified repartition() doesn't fix it either:
    // AQE coalesces tiny shuffles right back, blind to downstream N² work)
    val a = graft.etl.Readers.fanOut(vectors.select(col(idCol), col(vecCol)))
      .withColumn("_na", norm(col(vecCol)))
    val b = vectors.select(col(idCol).as("_nn_id"), col(vecCol).as("_nn_emb"))
      .withColumn("_nb", norm(col("_nn_emb")))
    // The dot product is bound to its own attribute (and the key built in a
    // SEPARATE select): referenced from inside CASE WHEN branches, codegen's
    // subexpression elimination does not apply, so an inline expression
    // would be re-evaluated per branch — 3 dots per pair instead of 1.
    // CollapseProject keeps the split because the alias is referenced more
    // than once and the expression is non-cheap.
    val scaled = when(col("_den") =!= 0.0, col("_dot") / col("_den")) * 1e6
    // round-half-away-from-zero at 1e-6 as a long, via floor: Spark's
    // round() builds a BigDecimal per call — millions of allocations in the
    // pair loop — while DuckDB's round() is the binary std::round. This is
    // both the cheap path and the one that matches the oracle's semantics.
    val cosKey = when(col("_scaled") >= 0, floor(col("_scaled") + 0.5))
      .otherwise(-floor(-col("_scaled") + 0.5))
    val key = shiftleft(cosKey, idBits) + (lit(idMask) - col("_nn_id"))
    a.crossJoin(b)
      .filter(col("_nn_id") =!= col(idCol))
      .select(col(idCol), col("_nn_id"),
        dot(col(vecCol), col("_nn_emb")).as("_dot"),
        (col("_na") * col("_nb")).as("_den"))
      .select(col(idCol), col("_nn_id"), scaled.as("_scaled"))
      .select(col(idCol), col("_nn_id"), key.as("_key"))
      .groupBy(idCol)
      .agg(max("_key").as("_k"), min("_nn_id").as("_fallback_nn"))
      .select(col(idCol),
        coalesce(lit(idMask) - (col("_k").bitwiseAND(idMask)),
          col("_fallback_nn")).as("nn_id"),
        (shiftright(col("_k"), idBits).cast("double") / 1e6).as("nn_cos"))
  }

  /** Shared ANN probe tail: exact cosine over candidate rows, ranked per
    * query (rounded score, id tiebreak), top k kept. Column contract:
    * (query_id, q_emb, _qn) from the query side, (vec_id, embedding, _n)
    * from the candidate side. Adds `cos` and `rank`. Used by the IVF and
    * LSH probe queries so the ranking semantics cannot drift apart.
    */
  def rankCandidates(hits: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    hits
      .withColumn("cos",
        round(safeDiv(dot(col("q_emb"), col("embedding")),
          col("_qn") * col("_n")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 hyperplane components for random-hyperplane LSH:
    * sign(j, d) from md5("j|d") — reproducible in any engine that has md5,
    * which is what makes the LSH signature oracle-checkable.
    */
  def hyperplaneSigns(plane: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$plane|$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0f else -1.0f
    }

  /** Random-hyperplane LSH signature (SimHash for cosine): bit j is the
    * sign of the projection onto hyperplane j. Vectors with small angle
    * agree on each bit with probability 1 − θ/π, so near neighbors land in
    * the same bucket; the signature is the ANN partition key (equi-join /
    * physical partition column — the same role centroid_id plays for IVF,
    * without the centroid build step).
    *
    * The hyperplane components are ±1 literals baked into the plan
    * (64-element arrays per plane) — the dot is the same native
    * [[graft.functions.FloatArrayDot]] loop, one per plane, all map-side.
    */
  def lshSignature(vecCol: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { j =>
      when(dot(vecCol, typedlit(hyperplaneSigns(j, dim))) > 0.0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding near-duplicate PAIRS at scale: LSH-signature equi-self-join
    * (only same-bucket pairs ever materialize), then exact cosine on just
    * those collisions — the embedding twin of the text MinHash→LSH→verify
    * pipeline, and the production alternative to [[nearestNeighborExact]]'s
    * O(N²) baseline when the task is "find duplicate pairs", not "rank
    * neighbors". Output: (vec_a, vec_b, cos), vec_a < vec_b, norms
    * precomputed once per vector (never per pair).
    *
    * The candidate volume is Σ_buckets (bucket choose 2): the plane count
    * dials bucket size (more planes → smaller buckets → fewer candidates,
    * lower recall). A degenerate hot bucket (a spam cluster of
    * near-identical vectors) is a skew key for AQE's skew-join splitting;
    * a production run would cap bucket sizes before the join, like the
    * fuzzy-matching token blocker.
    */
  def lshNeardupPairs(vectors: DataFrame, idCol: String,
                      numPlanes: Int, dim: Int,
                      vecCol: String = "embedding"): DataFrame = {
    val sigs = vectors
      .withColumn("sig", lshSignature(col(vecCol), numPlanes, dim))
      .withColumn("_n", norm(col(vecCol)))
    sigs.as("a").join(sigs.as("b").hint("shuffle_hash"),
        col("a.sig") === col("b.sig") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("vec_a"), col(s"b.$idCol").as("vec_b"),
        round(safeDiv(dot(col(s"a.$vecCol"), col(s"b.$vecCol")),
          col("a._n") * col("b._n")), 6).as("cos"))
  }

  /** Product-quantization assignment: split each `dim`-dimensional vector
    * into `m` contiguous subvectors and code each against a `k`-entry
    * sub-codebook — the standard ANN memory-compression step (an IVF-PQ
    * index stores the m small codes, ~m·log2(k) bits, instead of dim
    * floats: 64 floats → 4 codes here). Output: (id, sub, code, err2) — one
    * row per subspace with the chosen code and its squared L2 residual,
    * the quantity PQ training minimizes and a pipeline monitors.
    *
    * Codebook: the subvectors of the first `k` seed rows (`id < k`), the
    * same deterministic seeding the IVF centroids use — training a real
    * codebook is k-means over exactly this assignment step iterated.
    *
    * Plan shape: vectors posexplode into m subvector rows (map-only,
    * narrow); the codebook (m·k rows — tiny BY DEFINITION, that is the
    * whole point of PQ) broadcasts; argmin per (id, sub) packs
    * (rounded err2, code) into one long and takes `min(long)` — a
    * HashAggregate with MAP-SIDE partial aggregation, so each task ships
    * one row per local (vec, sub), never the k candidate rows (the same
    * packed-argmax shape as [[nearestNeighborExact]]; a ranked window
    * would sort the k-replicated corpus instead). At 100 TB: same shape,
    * codebook still tiny, scan still one pass.
    *
    * err2 = x·x − 2·x·c + c·c (rounded to 6 via the floor half-up that
    * decodes to the same double as `round(…, 6)`; ties broken by code
    * id) — each term the same sequential-fold dot both engines compute
    * identically, so assignment is oracle-checkable. Squared residuals
    * are ≥ 0 up to FP noise and bounded by the embedding scale, so the
    * ×1e6 key plus a codebook id < 1000 fits a long with ~2^33 headroom.
    */
  /** Scalar quantization (int8) — PQ's cheap sibling: per-DIMENSION
    * [min, max] from one aggregate pass, broadcast into a map-only
    * code = round((v−lo)/(hi−lo)·255) assignment; reconstruction and the
    * per-vector squared error come from the same expressions. 4× memory
    * reduction with zero training, and the dimension-stats table is the
    * only shuffled state (|dim| rows) — at 100 TB the data is touched
    * once, map-only.
    */
  def scalarQuantize(vectors: DataFrame, idCol: String,
                     vecCol: String = "embedding"): DataFrame = {
    val comp = vectors.select(col(idCol),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .select(col(idCol), col("i"), col("v").cast("double").as("v"))
    val stats = comp.groupBy("i")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val scale = col("hi") - col("lo")
    val code = when(scale > 0.0,
      round((col("v") - col("lo")) / scale * 255.0, 0)).otherwise(lit(0.0))
    val recon = col("lo") + code / 255.0 * scale
    comp.join(broadcast(stats), Seq("i"))
      .select(col(idCol), col("i"), code.cast("int").as("code"),
        (col("v") - recon).as("r"))
      .groupBy(idCol)
      .agg(sum(col("code").cast("long")).as("code_sum"),
        round(sum(col("r") * col("r")), 10).as("sse"))
  }

  def pqAssign(vectors: DataFrame, idCol: String, m: Int, k: Int, dim: Int,
               vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(k <= 1000, s"codebook size $k exceeds the packed-key id space")
    val subDim = dim / m
    def subs(c: Column): Column =
      array((0 until m).map(s => slice(c, s * subDim + 1, subDim)): _*)
    val parts = vectors
      .select(col(idCol), posexplode(subs(col(vecCol))).as(Seq("sub", "sv")))
    val cents = vectors.filter(col(idCol) < k)
      .select(col(idCol).as("code"),
        posexplode(subs(col(vecCol))).as(Seq("sub", "cv")))
    // the three dots are bound to one projected attribute before the key
    // is built (codegen does not CSE across the floor/cast chain)
    val err2 = col("_d2")
    val pack = floor(err2 * 1e6 + 0.5).cast("long") * 1000L + col("code")
    parts.join(broadcast(cents), Seq("sub"))
      .select(col(idCol), col("sub"), col("code"),
        (dot(col("sv"), col("sv"))
          - lit(2.0) * dot(col("sv"), col("cv"))
          + dot(col("cv"), col("cv"))).as("_d2"))
      .select(col(idCol), col("sub"), pack.as("_pack"))
      .groupBy(col(idCol), col("sub").cast("long").as("sub"))
      .agg(min("_pack").as("_p"))
      .select(col(idCol), col("sub"),
        (col("_p") % 1000L).as("code"),
        // integer-div first (shift the code digits off), THEN the /1e6
        // decode — a fused double division would leak code/1e9 into err2
        (((col("_p") - col("_p") % 1000L) / 1000L).cast("double") / 1e6)
          .as("err2"))
  }

  /** The `nprobe` nearest centroids per vector (IVF probe list; nprobe=1 is
    * the build-time assignment). Output: input columns + `centroid_id`,
    * ≤ nprobe rows per vector.
    */
  def centroidProbes(vectors: DataFrame, idCol: String,
                     centroids: DataFrame, nprobe: Int,
                     vecCol: String = "embedding",
                     centroidId: String = "centroid_id",
                     centroidVec: String = "c_emb"): DataFrame = {
    val keep = vectors.columns.toIndexedSeq.map(col)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_sim").desc, col(centroidId))
    vectors.withColumn("_vn", norm(col(vecCol)))
      .crossJoin(broadcast(centroids.withColumn("_cn", norm(col(centroidVec)))))
      .withColumn("_sim",
        round(safeDiv(dot(col(vecCol), col(centroidVec)),
          col("_vn") * col("_cn")), 6))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nprobe)
      .select(keep :+ col(centroidId): _*)
  }

  /** Nearest centroid per vector for DOUBLE-array centroids (the Lloyd
    * path — [[dot]]'s native expression is float-only, so this uses the
    * reference [[dotHof]] fold, which matches DuckDB's `list_dot_product`
    * term order exactly). Cosines are rounded to 6 decimals BEFORE the
    * argmax with centroid-id tiebreak, so the assignment is deterministic
    * and engine-reproducible even when two centroids score within ULPs.
    * Output: input columns + `centroid_id` + `_cos` (the rounded score).
    */
  def nearestCentroid(vectors: DataFrame, idCol: String,
                      centroids: DataFrame,
                      vecCol: String = "embedding",
                      centroidId: String = "centroid_id",
                      centroidVec: String = "c_emb"): DataFrame = {
    val keep = vectors.columns.toIndexedSeq.map(col)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_cos").desc, col(centroidId))
    vectors.withColumn("_vn", sqrt(dotHof(col(vecCol), col(vecCol))))
      .crossJoin(broadcast(centroids
        .withColumn("_cn", sqrt(dotHof(col(centroidVec), col(centroidVec))))))
      .withColumn("_cos",
        round(safeDiv(dotHof(col(vecCol), col(centroidVec)),
          col("_vn") * col("_cn")), 6))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(keep ++ Seq(col(centroidId), col("_cos")): _*)
  }

  /** Fixed-iteration Lloyd k-means refinement from caller-supplied initial
    * centroids (`init`: centroid_id, c_emb as array<double>). Each round:
    * rounded-cosine assignment ([[nearestCentroid]]), then the new
    * centroid is the per-dimension mean of its members, rounded to 9
    * decimals — the rounding pins the engine-order-dependent double sum
    * far above ULP noise, so the DuckDB oracle reproduces every centroid
    * (and therefore every subsequent assignment) bit-for-bit. A centroid
    * that loses all members keeps its previous position.
    *
    * Scale shape: assignment is a broadcast of K centroids (map-only per
    * member); the mean is one hash-aggregate keyed by (centroid, dim) —
    * K·dim groups, bounded buffers — then a K-row rebuild whose
    * `collect_list` holds at most `dim` elements. Iterations are a fixed
    * plan-time constant (no convergence probe → construction stays
    * job-free); production k-means at 100 TB runs the same loop with a
    * sampled init and more rounds.
    */
  def kmeansLloyd(vectors: DataFrame, idCol: String, init: DataFrame,
                  iterations: Int,
                  vecCol: String = "embedding",
                  centroidId: String = "centroid_id",
                  centroidVec: String = "c_emb",
                  maxCentroids: Int = Int.MaxValue): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    // per-round centroid cardinality never grows (a left join of cents
    // against a groupBy on its own key), but that invariant is invisible
    // to a plan walk; callers that know k pass maxCentroids so each
    // round's frame carries a structural no-op limit — the assignment
    // cross join's broadcast side then PROVES bounded (PlanLint)
    def capped(df: DataFrame): DataFrame =
      if (maxCentroids == Int.MaxValue) df else df.limit(maxCentroids)
    var cents = capped(init)
    for (_ <- 1 to iterations) {
      val assigned = nearestCentroid(
        vectors.select(col(idCol), col(vecCol)), idCol, cents,
        vecCol, centroidId, centroidVec)
      val means = assigned
        .select(col(centroidId),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("_pos", "_v")))
        .groupBy(col(centroidId), col("_pos"))
        .agg(round(avg(col("_v")), 9).as("_m"))
        .groupBy(col(centroidId))
        .agg(transform(
          array_sort(collect_list(struct(col("_pos"), col("_m")))),
          x => x.getField("_m")).as("_new"))
      // pinned (r17): each round consumes the previous round's centroids
      // TWICE (the assignment broadcast and the update join), so without
      // lineage truncation round r re-evaluates round r-1 twice — the
      // corpus-sized assignment pass re-executes ~2^iterations times
      // (measured: 13 embeddings scans in kmeans_refine's executed plan
      // at 2 rounds; 3 after — one per assignment, as the algorithm
      // states). The pinned frame is K rows of dim doubles — centroid
      // metadata, not data. The structural `capped` limit is applied
      // ABOVE the checkpoint so the broadcast side stays PROVABLY bounded
      // to PlanLint (a checkpoint scan hides the bound underneath it).
      cents = capped(
        cents.select(col(centroidId), col(centroidVec).as("_prev"))
          .join(means, Seq(centroidId), "left")
          .select(col(centroidId),
            coalesce(col("_new"), col("_prev")).as(centroidVec))
          .localCheckpoint(false))
    }
    cents
  }
}
