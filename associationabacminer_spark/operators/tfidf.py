"""Corpus-level TF-IDF and per-document top terms — the standard
"what is this document about" feature for training-data curation
(near-dup triage, topic balancing, quality filters).

Reference analog: the reference's k=v frequency maps
(/root/reference/src/model/EnvParamGenerators.py:96-118) weight values by
raw corpus frequency; TF-IDF is the same counting pattern with the
inverse-document-frequency reweighting done corpus-wide.

Plan shape: two hash aggregations (doc-term counts, then document
frequency) + one equi-join on token + one window per doc for top-k.
Everything is built-in expressions; ordering is on ROUND(tfidf, 6) with a
token tiebreak so results are reproducible across engines and runs
(raw-double ordering is not portable: two (tf, df) combinations can land
within 1 ulp)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, token, tf): lowercase alnum tokens with per-doc counts."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy("doc", "token").agg(F.count("*").alias("tf"))


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf * ln(N / df); deterministic
    (rounded-score, then token) ordering.

    N stays a driver-side ``df.count()`` deliberately: a round-6 attempt
    to ride it along as a broadcast scalar planned as
    BroadcastNestedLoopJoin either way (Catalyst constant-folds a
    literal join key and degrades the equi-join), which the scale plan
    tests forbid — one tiny count job beats an NLJ in the plan."""
    n_docs = df.count()
    terms = doc_terms(df, text_col, id_col)
    docfreq = terms.groupBy("token").agg(F.count("*").alias("df"))
    scored = terms.join(docfreq, "token").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col), "token", "tfidf", "rank"
        )
    )
