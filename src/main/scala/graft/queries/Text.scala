package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextStats}
import graft.tables.Tables

/** Text-pipeline queries over the documents table: exact and
  * approximate dedup, fingerprinting, quality scoring, language id,
  * token counting, and multimodal (binary column) plumbing.
  */
object TextQueries {
  private type Q = (SparkSession, String) => DataFrame
  private[queries] val Stopwords = Seq("a", "the", "data", "value", "row")

  // Fixed marker-word language profiles (see TextStats.withLangScores).
  private[queries] val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("key", "merge", "batch"),
    "en" -> Seq("a", "the", "table"),
    "es" -> Seq("data", "query", "row"),
    "fr" -> Seq("join", "line", "order"),
    "zh" -> Seq("scan", "hash", "part"),
  )


  /** Shared oracle prefix for q64/q146: simhash pairs at hamming<=3
    * (the exact bit-vote replay) -> symmetric edges -> recursive
    * reachability -> min-reachable-id components. */
  private[queries] val simhashCompCtes: String =
    """WITH RECURSIVE bits AS (
      |  SELECT doc_id, i,
      |    sum(CASE WHEN i <= 32
      |             THEN CASE WHEN substr(md5(t.tok), i, 1) IN ('8','9','a','b','c','d','e','f')
      |                       THEN 1 ELSE -1 END
      |             ELSE CASE WHEN substr(md5(t.tok), i - 32, 1) IN ('4','5','6','7','c','d','e','f')
      |                       THEN 1 ELSE -1 END
      |        END) AS vote
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  CROSS JOIN range(1, 65) r(i)
      |  GROUP BY doc_id, i),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN vote > 0 AND i <= 32 THEN power(2, 32 - i) ELSE 0 END) AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN vote > 0 AND i > 32 THEN power(2, 64 - i) ELSE 0 END) AS BIGINT) AS lo
      |  FROM bits GROUP BY doc_id),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM p
      |  UNION SELECT id_b, id_a FROM p),
      |reach AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (
      |  SELECT src AS id, least(src, min(dst)) AS component
      |  FROM reach GROUP BY src)""".stripMargin

  /** Shared oracle prefix for q86/q165: the fully-unrolled BM25
    * (base term frequencies -> corpus stats -> per-doc score). */
  private[queries] val bm25Ctes: String =
    """WITH base AS (
      |  SELECT doc_id, lang, source,
      |    (CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS dl,
      |    len(list_filter(string_split(text,' '), t -> t = 'join')) AS tf0,
      |    len(list_filter(string_split(text,' '), t -> t = 'vector')) AS tf1,
      |    len(list_filter(string_split(text,' '), t -> t = 'scan')) AS tf2
      |  FROM documents),
      |st AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS nd, CAST(sum(dl) AS DOUBLE) AS sdl,
      |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
      |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
      |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      |  FROM base),
      |sc AS (
      |  SELECT doc_id, lang, source, dl, tf0 + tf1 + tf2 AS n_hits,
      |      ln(1.0 + (nd - df0 + 0.5) / (df0 + 0.5)) * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
      |    + ln(1.0 + (nd - df1 + 0.5) / (df1 + 0.5)) * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
      |    + ln(1.0 + (nd - df2 + 0.5) / (df2 + 0.5)) * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0)) / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (sdl / nd)))
      |    AS score
      |  FROM base, st)""".stripMargin


  // Composition of the per-family objects (r16 split — entries are
  // byte-identical to the pre-split single map; the family files own
  // the query bodies, this object owns the helpers they share).
  val queries: Map[String, Q] =
    TextDedupQueries.queries ++ TextMediaQueries.queries ++
      TextRetrievalQueries.queries ++ TextCurationQueries.queries

  val oracles: Map[String, String] =
    TextDedupQueries.oracles ++ TextMediaQueries.oracles ++
      TextRetrievalQueries.oracles ++ TextCurationQueries.oracles
}
