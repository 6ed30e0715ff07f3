"""Lexical retrieval over the document corpus (north-star extension):
inverted-index construction + BM25 ranking — the search primitive a
training-data pipeline uses for targeted corpus slicing, contamination
forensics, and RAG-style retrieval evaluation sets.

Design (100 TB shape): the inverted index IS a DataFrame of postings
(term, doc_id, tf) — one explode + one groupBy, shuffled on the
(doc_id, term) then term keys; corpus statistics (N, avgdl) are a
one-row aggregate and per-term document frequencies a tiny per-term
aggregate, both broadcast back; the bounded query-term set broadcasts
against the posting list so scoring touches only postings of queried
terms (cost ∝ Σ df(q), never |corpus|). Top-k is TakeOrderedAndProject.
The same posting relation persists as a real index (write once, probe
per query) — here it is rebuilt per plan because fixtures are tiny.

BM25 with the standard Robertson/Sparck-Jones smoothing:
  idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
  score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
k1 = 1.2, b = 0.75. All inputs are integers (tf, df, N, dl) so both
engines evaluate the identical double expression tree; the final score
is rounded to 6 decimals like every FP output in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table

K1 = 1.2
B = 0.75
QUERY_TERMS = ("join", "filter", "stream")
TOPK = 10

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
postings AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM postings GROUP BY term
),
q AS (SELECT unnest(['join', 'filter', 'stream']) AS term),
scored AS (
  SELECT p.doc_id,
         ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * p.tf * ({K1} + 1)
           / (p.tf + {K1} * (1 - {B} + {B} * d.dl
                             / (CAST(s.total_len AS DOUBLE) / s.n_docs)))
           AS term_score
  FROM postings p
  JOIN q ON q.term = p.term
  JOIN df f ON f.term = p.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(term_score), 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT {TOPK}
"""


@query("text_bm25_topk", oracle=_BM25_ORACLE)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    postings = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in QUERY_TERMS], "term string"
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    term_score = (
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / avgdl))
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qterms), "term")), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(TOPK)
    )
