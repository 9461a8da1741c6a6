"""Iceberg table source with a gated parquet fallback.

The north-rule input is "an Iceberg table of multi-turn transcripts";
this sandbox ships no iceberg-spark-runtime jar, so the reader probes
for the DataSource at call time and falls back to plain parquet with the
identical schema and downstream plan.  On a real cluster, installing
``org.apache.iceberg:iceberg-spark-runtime-<spark-ver>`` and setting the
catalog confs below makes ``read_transcripts`` use Iceberg unchanged —
nothing downstream knows the difference (both present a columnar scan
with pushdown/pruning to Catalyst).

Catalog configuration expected on a real deployment::

    spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.lake.type = hadoop          # or hive / rest
    spark.sql.catalog.lake.warehouse = <warehouse URI>

Iceberg features this engine leans on at 100 TB, and their fallback
semantics here:

- **partition pruning / hidden partitioning**: Iceberg prunes via
  manifest min/max stats; the parquet fallback relies on row-group
  stats + directory layout (same Catalyst contract, weaker granularity)
- **snapshot reads (time travel)**: ``snapshot_id``/``as_of`` options
  pass through to Iceberg; the fallback raises — there is no snapshot
  log to honor, and silently reading HEAD would be wrong
- **incremental reads**: consume appended snapshots between two ids;
  fallback: Structured Streaming file source over the same directory
  (streaming/stream_agg.py) gives append-only incremental semantics

Jar-acquisition attempt (round 3, 2026-08-16): fetching
``org.apache.iceberg:iceberg-spark-runtime`` from Maven Central was
attempted from this sandbox and failed at DNS resolution
(``Could not resolve host: repo1.maven.org`` — no outbound network),
so a live catalog/snapshot/time-travel exercise remains impossible
here.  The probe + fallback below stay the honest behavior; on any
host with the jar, ``iceberg_available`` flips true and the
Iceberg-only paths (snapshot_id/as_of) activate without code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg DataSource class is on the session's JVM
    classpath (the honest runtime probe; no config guessing)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of: str | None = None,
) -> DataFrame:
    """Read the transcript table from an Iceberg catalog table name
    (``lake.db.transcripts``) or, when Iceberg is absent, a parquet
    directory path with the same schema.

    ``snapshot_id`` / ``as_of`` select an Iceberg snapshot (time
    travel); they raise on the parquet fallback instead of silently
    reading the current files."""
    if iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of is not None:
            reader = reader.option("as-of-timestamp", as_of)
        return reader.load(source)
    if snapshot_id is not None or as_of is not None:
        raise NotImplementedError(
            "snapshot/time-travel reads need the Iceberg runtime jar; "
            "the parquet fallback has no snapshot log to honor"
        )
    df = spark.read.parquet(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"transcript table missing columns: {missing}")
    return df
