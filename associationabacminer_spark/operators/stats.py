"""Statistics / feature-selection operators (SURVEY.md §2.12 E-family).

The reference runs these offline with sklearn/skfeature over collected
matrices (/root/reference/src/experiment/FeatureSelector.py,
SeparatedVarianceSelector.py); here they are distributed DataFrame
programs (crosstab, variance, correlation) that never collect raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_crosstab(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Co-occurrence counts (E5 functional-dependency mining input,
    /root/reference/src/experiment/SeparatedVarianceSelector.py:134-252).
    A plain groupBy — scales where ``df.stat.crosstab``'s wide pivot
    would not (output rows = observed pairs, not |A| x |B|)."""
    return df.groupBy(col_a, col_b).agg(F.count("*").alias("cnt"))


def functional_dependency_strength(
    df: DataFrame, det: str, dep: str
) -> DataFrame:
    """For each determinant value: does it imply a single dependent value?
    strength = max per-group count / group total (1.0 = functional)."""
    pair = df.groupBy(det, dep).agg(F.count("*").alias("cnt"))
    agg = pair.groupBy(det).agg(
        F.max("cnt").alias("mx"), F.sum("cnt").alias("total")
    )
    return agg.select(
        det,
        F.round(F.col("mx") / F.col("total"), 6).alias("strength"),
        F.col("total").alias("n_rows"),
    )


def low_variance_columns(
    df: DataFrame, cols: list[str], threshold: float = 0.0
) -> list[str]:
    """Categorical 'variance threshold' (E1): columns whose dominant value
    covers >= (1 - threshold) of rows — the reference's constant-column
    elimination generalized (/root/reference/src/TableCreator.py:124-128).
    One aggregation pass over all columns."""
    n = df.count()
    if n == 0:
        return list(cols)
    out = []
    for c in cols:
        top = (
            df.groupBy(c).agg(F.count("*").alias("cnt")).agg(F.max("cnt")).collect()[0][0]
        )
        if top / n >= 1.0 - threshold:
            out.append(c)
    return out


def pearson_correlation(df: DataFrame, cols: list[str]) -> list[list[float]]:
    """Pearson correlation matrix via Spark ML (E4,
    FeatureSelector.py:261-319) — distributed, collects only the k x k
    matrix."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    vec = VectorAssembler(inputCols=cols, outputCol="__features__").transform(
        df.select(*cols).na.drop()
    )
    m = Correlation.corr(vec, "__features__").collect()[0][0]
    return m.toArray().tolist()


def column_entropy(df: DataFrame, col: str) -> float:
    """Shannon entropy of a categorical column (E6 info-gain building
    block) — one groupBy + one tiny agg."""
    counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
    total = df.count()
    row = counts.select(
        F.sum(
            -(F.col("cnt") / total) * F.log2(F.col("cnt") / total)
        ).alias("h")
    ).collect()[0]
    return float(row["h"] or 0.0)


def deterministic_mask(df: DataFrame, cols: list[str], salt: str = "") -> DataFrame:
    """S8 anonymizer: deterministic masking rewrite — uuid/IP mapping in
    the reference (/root/reference/src/event_anonymizer.py:54-108) becomes
    a keyed sha2 rewrite (same input -> same pseudonym, no lookup table)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.sha2(F.concat_ws("\x1f", F.lit(salt), F.col(c).cast("string")), 256)
        )
    return out
