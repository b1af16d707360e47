package graft.queries

import graft.etl.Readers
import graft.ops.{Search, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval queries over `documents`: inverted-index build and
  * BM25 ranking. The BM25 query bag mixes a rare term ("dup" — high idf,
  * the discriminative one) with two common terms so the score actually
  * orders documents rather than degenerate-counting.
  */
object SearchQueries {

  /** token → (df, tf, sorted postings). */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    Search.invertedIndex(
        Readers.table(spark, dir, "documents"), "doc_id", "text")
      .orderBy("token")

  val invertedIndexSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |),
      |g AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS tf,
      |    list(DISTINCT doc_id) AS p0
      |  FROM tok GROUP BY token
      |)
      |SELECT token, CAST(len(p0) AS BIGINT) AS df, tf,
      |  array_to_string(list_sort(p0), ',') AS postings
      |FROM g ORDER BY token""".stripMargin

  val Bm25Terms = Seq("dup", "spark", "join")
  val Bm25K     = 20

  /** BM25 top-20 for the fixed query bag. */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    Search.bm25TopK(Readers.table(spark, dir, "documents"),
        "doc_id", "text", Bm25Terms, Bm25K)
      .orderBy("rank")

  val bm25SearchSql: String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    avg(CAST(len(w) AS DOUBLE)) AS avgdl
       |  FROM d
       |),
       |tok AS (
       |  SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
       |    unnest(w) AS token
       |  FROM d
       |),
       |tf AS (
       |  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
       |  FROM tok WHERE token IN ($termList) GROUP BY doc_id, token
       |),
       |df AS (
       |  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token
       |),
       |scored AS (
       |  SELECT doc_id,
       |    round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
       |              * tf * (${Search.K1} + 1.0)
       |              / (tf + ${Search.K1}
       |                 * (1.0 - ${Search.B} + ${Search.B} * dl / avgdl))), 6)
       |      AS score
       |  FROM tf JOIN df USING (token) CROSS JOIN stats
       |  GROUP BY doc_id
       |),
       |top AS (
       |  SELECT doc_id, score FROM scored
       |  ORDER BY score DESC, doc_id LIMIT $Bm25K
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
       |    AS rank,
       |  doc_id, score
       |FROM top ORDER BY rank""".stripMargin
  }

  val RrfC    = 60  // the standard reciprocal-rank-fusion constant
  val HybridK = 15

  /** Hybrid retrieval: BM25 keyword top-20 and vector-cosine top-20
    * (query = embedding 0, brute-force over the corpus), fused by
    * reciprocal rank fusion — `rrf(d) = Σ_lists 1/(60 + rank_list(d))` —
    * the score-free fusion that needs no calibration between a text
    * score and a cosine. This is the retrieval shape RAG / curation
    * pipelines actually run: both retrievers are independent map-reduce
    * passes (BM25 never sees vectors, ANN never sees tokens), the fuse
    * is a FULL OUTER join on doc id over two k-row lists — constant-size
    * regardless of corpus scale, where the retrievers do the data-sized
    * work. At 100 TB the brute-force leg swaps for the IVF one
    * (`ann_ivf`) with the fusion unchanged.
    */
  def hybridSearchRrf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Readers.table(spark, dir, "embeddings")
    val bm = Search.bm25TopK(Readers.table(spark, dir, "documents"),
        "doc_id", "text", Bm25Terms, Bm25K)
      .select(col("doc_id"), col("rank").as("bm_rank"))
    // limit(1) is a no-op (vec_id unique) that makes the 1-row bound
    // structural for the brute-force cross join's lint proof
    val q = emb.filter(col("vec_id") === 0L).limit(1)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val vec = Vectors.bruteForceTopK(q, emb.select("vec_id", "embedding"),
        Bm25K)
      .select(col("vec_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfC) + col("bm_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("vec_rank")), lit(0.0)), 6))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id")))
          .cast("long"))
      .filter(col("rank") <= HybridK)
      .select("rank", "doc_id", "rrf", "bm_rank", "vec_rank")
      .orderBy("rank")
  }

  val hybridSearchRrfSql: String = {
    val cos =
      """list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))""".stripMargin
    s"""WITH bm AS ($bm25SearchSql),
       |vec AS (
       |  SELECT doc_id, vec_rank FROM (
       |    SELECT c.vec_id AS doc_id,
       |      CAST(row_number() OVER (
       |        ORDER BY round($cos, 6) DESC, c.vec_id) AS BIGINT) AS vec_rank
       |    FROM embeddings q, embeddings c WHERE q.vec_id = 0)
       |  WHERE vec_rank <= $Bm25K
       |),
       |fused AS (
       |  SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
       |    round(COALESCE(1.0::DOUBLE / ($RrfC + bm.rank), 0.0::DOUBLE)
       |        + COALESCE(1.0::DOUBLE / ($RrfC + vec.vec_rank), 0.0::DOUBLE),
       |      6) AS rrf,
       |    bm.rank AS bm_rank, vec.vec_rank AS vec_rank
       |  FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
       |)
       |SELECT * FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
       |      AS rank,
       |    doc_id, rrf, bm_rank, vec_rank
       |  FROM fused)
       |WHERE rank <= $HybridK ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "inverted_index" -> invertedIndex,
    "bm25_search" -> bm25Search,
    "hybrid_search_rrf" -> hybridSearchRrf)

  val oracle: Map[String, String] = Map(
    "inverted_index" -> invertedIndexSql,
    "bm25_search" -> bm25SearchSql,
    "hybrid_search_rrf" -> hybridSearchRrfSql)
}
