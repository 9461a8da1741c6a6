"""Incremental corpus ingestion: dedup a NEW batch of documents against a
persisted fingerprint store of everything already accepted — without
rescanning (or even retaining) the historical corpus text.

At 100 TB the dominant curation cost is not the first dedup pass, it is
re-running dedup on every ingest: a web-crawl pipeline lands a new batch
daily against a corpus thousands of times larger.  Re-deduping the union
is O(corpus) per batch; this module makes it O(batch + matching keys):

- the STORE keeps three slim key tables, none of which contain text:
    ``exact``  (digest string)            — md5 per accepted distinct doc
    ``sigs``   (doc_id long, sig array)   — OPH MinHash signature per doc
    ``bands``  (band_hash long, doc_id)   — LSH band keys per doc
- an ingest batch is deduped WITHIN itself (exact + MinHash-LSH with an
  exact-Jaccard re-check, both sides' text in hand), then AGAINST the
  store: an anti-join of batch digests on ``exact`` (uniform 8-byte-ish
  key, no skew), and an equi-join of batch band hashes on ``bands`` for
  near-dup candidates.  Candidate pairs are verified by SIGNATURE-SLOT
  AGREEMENT (P[slot agrees] = Jaccard, the MinHash estimator itself) —
  the store holds signatures, not shingles, so historical text is never
  touched.  Estimator stderr is sqrt(J(1-J)/num_perm) (~0.09 at J=0.5,
  num_perm=32); callers needing exact re-check precision against history
  must retain historical text and re-run the batch through
  :func:`~associationabacminer_spark.operators.dedup.minhash_lsh_dedup`
  on the union — the trade this module exists to avoid.
- after an ingest the store absorbs a delta (:func:`ingest_delta` +
  :func:`dedup_store_append`): exact digests of EVERY batch doc (seen
  set), signatures/bands of the SURVIVORS (accepted set).  Re-ingesting
  the same batch then yields ZERO survivors — every doc's digest is in
  the seen set — the idempotence invariant the tests and s50 pin.

Reference analog: the reference rebuilds its unique-logs universe from
scratch per run (/root/reference/src/model/EnvLogUniverseGenerator.py:84-104)
— viable single-node, not at 10^12 turns; the store is the incremental
re-expression.

Scale notes: every store interaction is an equi-join on a bounded key —
batch-side band hashes against ``bands`` (write the store parquet
sorted/bucketed by ``band_hash``, see sources/layout.py, and the probe
becomes a pruned range read), batch digests against ``exact``.  Hot
band buckets in the store (shared boilerplate accepted before
paragraph-scrub policies tightened) are capped at candidate-expansion
time exactly like lsh_candidate_pairs' ``max_bucket_size``: a window
count per band_hash on the matched subset only.  Nothing in the ingest
path scans store rows that share no key with the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from associationabacminer_spark.operators.dedup import (
    band_hash_table,
    exact_dedup,
    exact_jaccard_recheck,
    lsh_candidate_pairs,
    minhash_signatures_oph,
)

DEFAULT_NUM_PERM = 32
DEFAULT_BANDS = 8
DEFAULT_NGRAM = 3


def dedup_store_build(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> dict[str, DataFrame]:
    """Build the three store tables from an accepted corpus (or from an
    ingest's survivors, as the append delta).  ``exact`` is distinct —
    a store records membership, not multiplicity.  Docs with null/empty
    text get an exact digest but no signature (no shingles, no
    meaningful Jaccard — mirrors minhash_signatures_oph's narrow
    base-column filter)."""
    exact = df.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    sigs = minhash_signatures_oph(
        df, text_col, id_col, num_buckets=num_perm, n=n
    )
    return {
        "exact": exact,
        "sigs": sigs,
        "bands": band_hash_table(sigs, bands=bands, rows_per_band=num_perm // bands),
    }


def ingest_delta(
    batch: DataFrame,
    survivors: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
) -> dict[str, DataFrame]:
    """The store delta after an ingest: ``exact`` digests come from the
    WHOLE batch (every content seen — a doc rejected once must be
    rejected again, and this is what makes re-ingesting a batch yield
    zero survivors deterministically; survivor-only digests would let a
    near-dup-dropped doc resurface whenever the signature ESTIMATE
    undershoots the exact re-check that dropped it), while ``sigs`` and
    ``bands`` come from the SURVIVORS only (near-dup anchors are the
    accepted corpus — rejected docs shouldn't pull future docs into
    transitive drops the retained data can't explain)."""
    d = dedup_store_build(
        survivors, text_col, id_col, num_perm=num_perm, bands=bands, n=n
    )
    d["exact"] = batch.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    return d


def dedup_store_append(
    store: dict[str, DataFrame], delta: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Union a delta (:func:`ingest_delta`) into the store.  Caller
    persists — each table is append-only parquet in practice; ``exact``
    may acquire duplicate digests across appends (seen-set semantics,
    the anti-join is membership so duplicates only cost bytes; compact
    with ``distinct()`` on rewrite)."""
    return {k: store[k].unionByName(delta[k]) for k in ("exact", "sigs", "bands")}


def incremental_ingest(
    batch: DataFrame,
    store: dict[str, DataFrame],
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    n: int = DEFAULT_NGRAM,
    threshold: float = 0.5,
    max_bucket_size: int | None = 4096,
    checkpoint: bool = True,
) -> DataFrame:
    """Survivors of ``batch`` after (1) exact dedup within the batch,
    (2) exact anti-join against the store, (3) MinHash-LSH near-dup
    within the remaining batch (exact-Jaccard re-check, min id kept),
    (4) near-dup drop against the store by signature-slot agreement.

    Steps run cheapest-first so each stage shrinks the next stage's
    input; the store is only ever probed by key; the OPH signature map
    runs ONCE — the within-batch banding (3) and the store probe (4)
    consume the same signature table.  ``checkpoint=True``
    (localCheckpoint) truncates lineage after the exact stages and after
    the signature map: the survivor table is referenced by four
    downstream branches, and without truncation Catalyst re-derives the
    whole upstream pipeline per branch (the same re-use pattern as the
    components and set-cover loops).  Returns the surviving batch rows
    with their original columns."""
    rows_per_band = num_perm // bands

    # (1) + (2): exact, within then versus history.  The anti-join key is
    # the same md5 the store records — uniform, unskewed.
    survivors = exact_dedup(batch, text_col, id_col)
    survivors = survivors.join(
        store["exact"],
        F.md5(F.col(text_col)) == store["exact"]["digest"],
        "left_anti",
    )
    if checkpoint:
        survivors = survivors.localCheckpoint()

    # ONE signature pass feeds both near-dup stages (slim: num_perm longs
    # per doc).
    sigs = minhash_signatures_oph(
        survivors, text_col, id_col, num_buckets=num_perm, n=n
    )
    if checkpoint:
        sigs = sigs.localCheckpoint()

    # (3): near-dup within the batch — both texts in hand, so the full
    # exact-re-check pipeline applies; drop the larger id of each
    # verified pair (id_a < id_b by construction, min id survives).
    cands_within = lsh_candidate_pairs(
        sigs, bands=bands, rows_per_band=rows_per_band,
        max_bucket_size=max_bucket_size,
    )
    pairs = exact_jaccard_recheck(
        survivors, cands_within, text_col, id_col, n=n, threshold=threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = survivors.join(losers, id_col, "left_anti")

    # (4): near-dup versus history.  Batch band keys equi-join the
    # store's band table (8-byte key); candidate (new, old) pairs are
    # scored by signature-slot agreement (P[slot agrees] = Jaccard).
    # The window count caps hot store buckets on the MATCHED subset only
    # — an un-probed bucket costs nothing regardless of size.  Within-
    # batch losers keep their sig rows here; dropping a new doc because
    # it matches history is correct whether or not it also lost within
    # the batch, and the extra candidate rows are bounded by the losers.
    batch_bands = band_hash_table(sigs, bands=bands, rows_per_band=rows_per_band)
    matched = batch_bands.join(
        store["bands"].withColumnRenamed("doc_id", "old_id"), "band_hash"
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_hash")
        matched = matched.withColumn("n", F.count("*").over(w)).filter(
            F.col("n") <= max_bucket_size
        )
    cands = matched.select("doc_id", "old_id").distinct()
    agree = F.size(
        F.filter(
            F.zip_with("sig", "old_sig", lambda x, y: x == y), lambda b: b
        )
    ) / F.lit(float(num_perm))
    near_hist = (
        cands.join(sigs, "doc_id")
        .join(
            store["sigs"].select(
                F.col("doc_id").alias("old_id"), F.col("sig").alias("old_sig")
            ),
            "old_id",
        )
        .withColumn("jaccard_est", agree)
        .filter(F.col("jaccard_est") >= threshold)
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return survivors.join(near_hist, id_col, "left_anti")
