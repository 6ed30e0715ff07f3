"""Text-analysis operators for training-data pipelines (north-star
extension): quality scoring, language ID, token statistics, document
fingerprinting. All pure `pyspark.sql.functions` (JVM-side, codegen'd) —
no Python UDFs in any hot path — so they scale to 100 TB as embarrassingly
parallel per-row transforms (no shuffle except final aggregations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from minimised_impala_spark.queries.registry import query
from minimised_impala_spark.tables import load_table

# token-level stopword sets per language for the n-gram/stopword lang-id
# heuristic (deterministic, closed sets)
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "de": ["der", "und", "die", "das", "ein"],
    "es": ["el", "la", "de", "los", "una"],
    "fr": ["le", "la", "et", "les", "une"],
}

_PUNCT_RE = "[.,!?;:]"
# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


# --------------------------------------------------------------------------
@query(
    "text_quality",
    oracle=f"""
SELECT doc_id,
       length(text)                                   AS n_chars_calc,
       len(string_split(text, ' '))                   AS n_tokens,
       round(length(replace(text, ' ', '')) * 1.0
             / len(string_split(text, ' ')), 6)       AS avg_token_len,
       len(regexp_extract_all(text, '{_PUNCT_RE}'))   AS n_punct,
       round(len(list_intersect(string_split(text, ' '),
                 ['the','and','of','to','a','in'])) * 1.0
             / len(list_distinct(string_split(text, ' '))), 6)
                                                      AS stopword_ratio,
       (length(text) >= 100 AND
        len(string_split(text, ' ')) >= 20)           AS passes_length_gate
FROM documents
ORDER BY doc_id
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: length/punctuation/stopword gates — the standard
    pre-training corpus filters."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    stop = F.array([F.lit(w) for w in _LANG_STOPWORDS["en"]])
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        n_toks.cast("bigint").alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) * 1.0 / n_toks, 6
        ).alias("avg_token_len"),
        F.regexp_count("text", F.lit(_PUNCT_RE)).cast("bigint").alias("n_punct"),
        F.round(
            F.size(F.array_intersect(toks, stop)) * 1.0
            / F.size(F.array_distinct(toks)),
            6,
        ).alias("stopword_ratio"),
        ((F.length("text") >= 100) & (n_toks >= 20)).alias("passes_length_gate"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
def _langid_score_sql(lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in _LANG_STOPWORDS[lang])
    return f"len(list_intersect(string_split(text, ' '), [{lits}]))"


@query(
    "text_langid",
    oracle=f"""
SELECT lang_pred, count(*) AS n_docs FROM (
  SELECT doc_id,
         CASE
           WHEN {_langid_score_sql('en')} >= {_langid_score_sql('de')}
            AND {_langid_score_sql('en')} >= {_langid_score_sql('es')}
            AND {_langid_score_sql('en')} >= {_langid_score_sql('fr')}
            AND {_langid_score_sql('en')} > 0 THEN 'en'
           WHEN {_langid_score_sql('de')} >= {_langid_score_sql('es')}
            AND {_langid_score_sql('de')} >= {_langid_score_sql('fr')}
            AND {_langid_score_sql('de')} > 0 THEN 'de'
           WHEN {_langid_score_sql('es')} >= {_langid_score_sql('fr')}
            AND {_langid_score_sql('es')} > 0 THEN 'es'
           WHEN {_langid_score_sql('fr')} > 0 THEN 'fr'
           ELSE 'unknown'
         END AS lang_pred
  FROM documents
) t GROUP BY lang_pred
ORDER BY lang_pred
""",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (n-gram heuristic). Deterministic
    tie-break: priority order en > de > es > fr."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def score(lang: str) -> Column:
        return F.size(
            F.array_intersect(toks, F.array([F.lit(w) for w in _LANG_STOPWORDS[lang]]))
        )

    en, de, es, fr = (score(lang) for lang in ("en", "de", "es", "fr"))
    pred = (
        F.when((en >= de) & (en >= es) & (en >= fr) & (en > 0), "en")
        .when((de >= es) & (de >= fr) & (de > 0), "de")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return (
        docs.select(pred.alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_pred")
    )


# --------------------------------------------------------------------------
@query(
    "text_tokens",
    oracle=f"""
SELECT doc_id,
       len(string_split(text, ' '))                    AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}'))      AS bpe_tokens,
       len(list_distinct(string_split(text, ' ')))     AS distinct_tokens,
       round(len(list_distinct(string_split(text, ' '))) * 1.0
             / len(string_split(text, ' ')), 6)        AS type_token_ratio
FROM documents
ORDER BY doc_id
""",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace and BPE-ish regex pre-tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("ws_tokens"),
        F.regexp_count("text", F.lit(_BPE_RE)).cast("bigint").alias("bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) * 1.0 / F.size(toks), 6).alias(
            "type_token_ratio"
        ),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         AS content_fp,
       substr(md5(text), 1, 16) AS exact_fp_prefix
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive bag-of-words fingerprint
    (md5 of the sorted distinct token list) + exact content hash prefix."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.md5(F.array_join(F.sort_array(F.array_distinct(toks)), " ")).alias(
            "content_fp"
        ),
        F.substring(F.md5("text"), 1, 16).alias("exact_fp_prefix"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# End-to-end corpus curation: the composed training-data pipeline —
# quality gate → exact dedup (canonical = min doc_id per content hash) →
# token-bucket statistics. Each stage is one of the operators above; the
# composition stays a single Catalyst plan (gate pushes into the scan,
# dedup is one shuffle on the content hash, stats a map-side-combined agg).
_PIPELINE_ORACLE = """
WITH gated AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= 100 AND len(string_split(text, ' ')) >= 20
),
canon AS (
  SELECT min(doc_id) AS doc_id, min(text) AS text
  FROM gated GROUP BY md5(text)
),
stats AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars
  FROM canon
)
SELECT (n_tokens // 50) * 50 AS token_bucket,
       count(*)              AS n_docs,
       sum(n_tokens)         AS total_tokens,
       round(sum(n_chars) * 1.0 / count(*), 6) AS avg_chars
FROM stats
GROUP BY token_bucket
ORDER BY token_bucket
"""


@query("pipeline_corpus_curation", oracle=_PIPELINE_ORACLE)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    gated = docs.filter((F.length("text") >= 100) & (toks >= 20))
    canon = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"), F.min("text").alias("text")
    )
    stats = canon.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    bucket = (F.col("n_tokens") - F.col("n_tokens") % 50).alias("token_bucket")
    return (
        stats.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 6).alias("avg_chars"),
        )
        .orderBy("token_bucket")
    )


# --------------------------------------------------------------------------
# Deterministic (reproducible) sampling — pipelines must be able to re-run
# a corpus subsample bit-identically across engines and months; rand()
# cannot. Sample membership = md5(doc_id) bucket < rate, so the same doc
# is always in/out regardless of partitioning, engine, or cluster size.
_SAMPLE_ORACLE = """
WITH sampled AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 100 AS bucket
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM sampled
WHERE bucket < 20
"""


@query("text_sample_deterministic", oracle=_SAMPLE_ORACLE)
def text_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < 20)
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )
