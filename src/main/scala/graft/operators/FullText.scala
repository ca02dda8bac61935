package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval: inverted posting-list DataFrames + Okapi BM25
  * scoring + top-k search + More-Like-This.
  *
  * Reference semantics re-expressed (SURVEY.md §2.9 full-text tail):
  *   - BM25 math: index/fulltext/BM25Scorer.java:71-78 (idf) and :100-108
  *     (termScore), with DEFAULT_K1=1.2 / DEFAULT_B=0.75 (:44,:50).
  *     idf(N, df)    = ln((N - df + 0.5)/(df + 0.5) + 1)   (Lucene variant,
  *                     non-negative even for df > N/2)
  *     termScore     = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  *   - Query execution: index/fulltext/FullTextQueryExecutor.java:178
  *     (search → score → sort by score desc, deterministic tie-break).
  *     OR semantics: a document scores on every query term it contains.
  *   - More-Like-This: index/fulltext/MoreLikeThisQueryBuilder.java:43
  *     (top source-doc terms by TF-IDF become the query).
  *
  * Spark-first design: the "index" is not an LSM tree — it's the posting
  * DataFrame (doc_id, term, tf), which at 100 TB is a partitioned/bucketed
  * table keyed by term. Scoring a query is then: prune postings to the
  * query's terms (partition pruning on the term key), join tiny broadcast
  * stats, one partial+final aggregation per doc, top-k via rank. No
  * per-document loop, no driver-side state.
  *
  * Determinism: every BM25 score is rounded to 6 digits BEFORE ranking on
  * both engines (per-doc score is a sum over matched query terms whose
  * accumulation order is engine-defined), and ties break on doc_id.
  */
object FullText {

  val K1 = 1.2 // BM25Scorer.java:44
  val B  = 0.75 // BM25Scorer.java:50

  /** Tokens = lowercase whitespace split (the library-wide analyzer). */
  private def toks(c: Column): Column = split(lower(c), " ")

  /** Inverted postings: one row per (doc_id, term) with term frequency. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Per-document token length. */
  def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(toks(col("text"))).as("dl"))

  /** BM25 score of every document against `terms` (OR semantics), rounded
    * to 6 digits. Output: (doc_id, score). */
  def bm25Scores(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val p = postings(docs)
    val dls = docLengths(docs)
    val stats = dls.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val qp = p.filter(col("term").isin(terms: _*))
    val dfs = qp.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = qp
      .join(broadcast(dfs), Seq("term"))
      .join(dls, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sumdl").cast("double") / col("n"))
      .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("tsc",
        col("idf") * (col("tf") * (K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
    scored.groupBy("doc_id").agg(round(sum(col("tsc")), 6).as("score"))
  }

  /** Top-k BM25 search: rank on the ROUNDED score (engine-portable), ties
    * by doc_id. Output: (doc_id, score, rank). TakeOrdered-shaped via
    * [[TopK.ranked]] — the corpus is never sorted in one partition. */
  def search(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    TopK.ranked(bm25Scores(docs, terms), k, "rank", col("score").desc, col("doc_id"))

  /** More-Like-This: the source document's top `maxQueryTerms` terms by
    * tf*idf (ties by term) become the query; the source doc is excluded
    * from the results (MoreLikeThisQueryBuilder.java:43). Term selection
    * runs distributed; only the tiny selected-term list is collected —
    * the same boundary the reference crosses when it builds the query. */
  def moreLikeThis(docs: DataFrame, srcDocId: Long, maxQueryTerms: Int, k: Int): DataFrame = {
    val p = postings(docs)
    val n = docs.count()
    val dfs = p.groupBy("term").agg(count(lit(1)).as("df"))
    val topTerms = p.filter(col("doc_id") === srcDocId)
      .join(dfs, Seq("term"))
      .withColumn("tfidf", col("tf") * log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .orderBy(col("tfidf").desc, col("term"))
      .limit(maxQueryTerms)
      .select("term").collect().map(_.getString(0)).toSeq
    search(docs.filter(col("doc_id") =!= srcDocId), topTerms, k)
  }

  /** DuckDB mirror of the BM25 CTEs over `documents` for a literal term
    * list (SQL array constructor), scoring corpus = docs where `corpusWhere`. */
  private def bm25Cte(terms: Seq[String], corpusWhere: String): String = {
    val termList = terms.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH corpus AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |                FROM documents WHERE $corpusWhere),
       |p AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
       |      FROM corpus, UNNEST(toks) AS t(term) GROUP BY 1, 2),
       |dls AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM corpus),
       |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dls),
       |qp AS (SELECT * FROM p WHERE list_contains($termList, term)),
       |dfs AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY 1),
       |scored AS (
       |  SELECT qp.doc_id,
       |    ln((n - df + 0.5)/(df + 0.5) + 1.0)
       |      * (tf * (${K1} + 1.0))
       |      / (tf + ${K1} * (1.0 - ${B} + ${B} * dl / (sumdl::DOUBLE / n))) AS tsc
       |  FROM qp JOIN dfs USING (term) JOIN dls USING (doc_id) CROSS JOIN stats),
       |bm25 AS (SELECT doc_id, round(sum(tsc), 6) AS score FROM scored GROUP BY doc_id)""".stripMargin
  }

  private val SearchTerms = Seq("vector", "join", "stream")

  val all: Seq[Q] = Seq(

    // ---- BM25 top-k search (FullTextQueryExecutor.search analog) ----
    Q("q_fulltext_bm25",
      s"""${bm25Cte(SearchTerms, "TRUE")}
         |SELECT doc_id, score, rank FROM (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |  FROM bm25)
         |WHERE rank <= 20 ORDER BY rank""".stripMargin) { (s, d) =>
      search(Tables.documents(s, d), SearchTerms, 20).orderBy("rank")
    },

    // ---- full corpus BM25 scores (the scoring job itself, no top-k) ----
    Q("q_fulltext_scores",
      s"""${bm25Cte(Seq("customer", "query"), "TRUE")}
         |SELECT doc_id, score FROM bm25 WHERE doc_id < 100
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      bm25Scores(Tables.documents(s, d), Seq("customer", "query"))
        .filter(col("doc_id") < 100)
        .orderBy("doc_id")
    },

    // ---- More-Like-This (MoreLikeThisQueryBuilder analog): the oracle
    //      re-derives the same top-5 source terms, then scores them over
    //      the corpus minus the source doc. ----
    Q("q_fulltext_mlt", {
      val pick =
        """WITH src AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
          |ap AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
          |       FROM src, UNNEST(toks) AS t(term) GROUP BY 1, 2),
          |adf AS (SELECT term, count(*)::BIGINT AS df FROM ap GROUP BY 1),
          |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
          |top_terms AS (
          |  SELECT term FROM ap JOIN adf USING (term) CROSS JOIN nn
          |  WHERE doc_id = 7
          |  ORDER BY tf * ln((n - df + 0.5)/(df + 0.5) + 1.0) DESC, term
          |  LIMIT 5)""".stripMargin
      s"""$pick,
         |corpus AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |           FROM documents WHERE doc_id <> 7),
         |p AS (SELECT doc_id, t.term, count(*)::BIGINT AS tf
         |      FROM corpus, UNNEST(toks) AS t(term) GROUP BY 1, 2),
         |dls AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM corpus),
         |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sumdl FROM dls),
         |qp AS (SELECT p.* FROM p WHERE term IN (SELECT term FROM top_terms)),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM qp GROUP BY 1),
         |scored AS (
         |  SELECT qp.doc_id,
         |    ln((n - df + 0.5)/(df + 0.5) + 1.0)
         |      * (tf * (${K1} + 1.0))
         |      / (tf + ${K1} * (1.0 - ${B} + ${B} * dl / (sumdl::DOUBLE / n))) AS tsc
         |  FROM qp JOIN dfs USING (term) JOIN dls USING (doc_id) CROSS JOIN stats),
         |bm25 AS (SELECT doc_id, round(sum(tsc), 6) AS score FROM scored GROUP BY doc_id)
         |SELECT doc_id, score, rank FROM (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm25)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    }) { (s, d) =>
      moreLikeThis(Tables.documents(s, d), srcDocId = 7, maxQueryTerms = 5, k = 10)
        .orderBy("rank")
    }
  )
}
