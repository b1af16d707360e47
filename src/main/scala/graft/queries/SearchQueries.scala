package graft.queries

import graft.etl.Readers
import graft.ops.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "inverted_index" -> invertedIndex,
    "bm25_search" -> bm25Search)

  val oracle: Map[String, String] = Map(
    "inverted_index" -> invertedIndexSql,
    "bm25_search" -> bm25SearchSql)
}
