"""Spark-tier tests for the two-stage sketch harness: exact-oracle
reconciliation (the reference's validate_possible_privs pattern,
/root/reference/src/EnvAbacRuleMiner.py:79-88, generalized per
SURVEY.md §5), partition-invariance, row fidelity, and resume."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from associationabacminer_spark.operators.agg import (
    SketchSpec,
    build_sketches,
    salted_group_id,
    sketch_aggregate,
    tree_merge,
)
from associationabacminer_spark.plans.lineage import run_with_lineage
from associationabacminer_spark.sketch import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    TDigest,
)


def specs_all():
    return [
        SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog),
        SketchSpec(
            "cms_tool",
            lambda: CountMinSketch(width=4096, depth=5),
            "tool",
            kernel_cls=CountMinSketch,
        ),
        SketchSpec(
            "kll_len",
            lambda: KLL(k=200),
            "text_len",
            kernel_cls=KLL,
        ),
        SketchSpec(
            "td_latency",
            lambda: TDigest(delta=200),
            "latency_s",
            kernel_cls=TDigest,
        ),
        SketchSpec(
            "bloom_conv",
            lambda: BloomFilter.from_capacity(20_000, 0.01),
            "conv_id",
            kernel_cls=BloomFilter,
        ),
    ]


@pytest.fixture(scope="module")
def prepared(transcripts):
    """Transcripts + derived columns (JVM-side exprs, SURVEY.md §2.9 W2)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    df = (
        transcripts.withColumn("text_len", F.length("text").cast("double"))
        .withColumn(
            "latency_s",
            (
                F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
            ),
        )
    ).cache()
    df.count()
    return df


class TestSketchAggregate:
    def test_hll_vs_exact_countdistinct(self, prepared):
        sketches = sketch_aggregate(prepared, specs_all(), num_groups=64)
        est = sketches["hll_conv"].estimate()
        exact = prepared.select(F.countDistinct("conv_id")).collect()[0][0]
        bound = 3 * sketches["hll_conv"].relative_error
        assert abs(est - exact) <= bound * exact

        # CMS vs exact groupBy counts on heavy hitters
        cms = sketches["cms_tool"]
        top = (
            prepared.filter(F.col("tool").isNotNull())
            .groupBy("tool")
            .count()
            .orderBy(F.desc("count"))
            .limit(5)
            .collect()
        )
        keys = np.array([r["tool"] for r in top], dtype=object)
        true = np.array([r["count"] for r in top])
        est_counts = cms.query(keys)
        assert (est_counts >= true).all()
        assert (est_counts - true <= cms.eps * cms.total).all()

        # KLL vs exact quantiles of text_len. text_len has heavy ties
        # (atoms at small lengths) so the true rank of a value is an
        # interval [count(<v), count(<=v)]/n — the estimate passes if q
        # lands within the interval widened by the rank-error bound.
        kll = sketches["kll_len"]
        n = prepared.count()
        tol = 2 * kll.rank_error + 0.005
        for q in (0.1, 0.5, 0.9):
            v = kll.quantile(q)
            lo = prepared.filter(F.col("text_len") < v).count() / n
            hi = prepared.filter(F.col("text_len") <= v).count() / n
            assert lo - tol <= q <= hi + tol, (q, v, lo, hi)

        # t-digest latency quantiles vs exact (continuous — ties rare)
        td = sketches["td_latency"]
        lat = prepared.filter(F.col("latency_s").isNotNull())
        nlat = lat.count()
        for q in (0.5, 0.99):
            v = td.quantile(q)
            lo = lat.filter(F.col("latency_s") < v).count() / nlat
            hi = lat.filter(F.col("latency_s") <= v).count() / nlat
            assert lo - 0.02 <= q <= hi + 0.02, (q, v, lo, hi)

        # Bloom: no false negatives on a sample, low FP on absent keys
        bloom = sketches["bloom_conv"]
        sample = np.array(
            [r["conv_id"] for r in prepared.select("conv_id").distinct().limit(500).collect()],
            dtype=object,
        )
        assert bloom.contains(sample).all()
        absent = np.array([f"absent-{i}" for i in range(20_000)], dtype=object)
        assert bloom.contains(absent).mean() <= 0.05

    def test_partition_invariance(self, prepared):
        """Merge-law at the Spark level: 16 vs 64 groups, same HLL/CMS/
        Bloom estimate (register-level identical)."""
        specs = [
            SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog),
            SketchSpec(
                "cms_tool",
                lambda: CountMinSketch(width=2048, depth=5),
                "tool",
                kernel_cls=CountMinSketch,
            ),
        ]
        a = sketch_aggregate(prepared, specs, num_groups=16)
        b = sketch_aggregate(prepared, specs, num_groups=64)
        assert a["hll_conv"].estimate() == b["hll_conv"].estimate()
        assert (a["cms_tool"].table == b["cms_tool"].table).all()

    def test_salted_grouping_balances_hot_conversation(self, prepared, spark):
        expr = salted_group_id(64, "conv_id", "turn_idx", salts=8)
        dist = (
            prepared.withColumn("g", expr)
            .groupBy("g")
            .count()
            .select(F.max("count").alias("mx"), F.sum("count").alias("total"))
            .collect()[0]
        )
        # the hottest conversation has ~20k of ~80k rows; unsalted it
        # would melt one group. With 64 salted groups the max group must
        # hold well under that.
        hot = (
            prepared.groupBy("conv_id").count().select(F.max("count")).collect()[0][0]
        )
        assert dist["mx"] < hot

    def test_lineage_schema_and_wall_time(self, prepared):
        lineage = build_sketches(prepared, specs_all(), num_groups=16)
        rows = lineage.collect()
        assert {r["sketch_name"] for r in rows} == {
            "hll_conv",
            "cms_tool",
            "kll_len",
            "td_latency",
            "bloom_conv",
        }
        assert all(r["wall_time_s"] >= 0 for r in rows)
        # row_count totals match the source (per-sketch, modulo dropna)
        total = sum(r["row_count"] for r in rows if r["sketch_name"] == "hll_conv")
        assert total == prepared.count()


class TestRowFidelity:
    def test_per_turn_text_equality_under_stable_ordering(self, spark, transcripts):
        """input_hint invariant: per-turn text equality under stable
        (conv_id, turn_idx) ordering, row-for-row vs the source."""
        from associationabacminer_spark.sources.transcripts import (
            generate_transcripts,
        )

        regen = generate_transcripts(spark, n_convs=8000, seed=42, num_partitions=4)
        a = transcripts.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
        b = regen.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text")
        mismatches = (
            a.withColumnRenamed("text", "ta")
            .join(
                b.withColumnRenamed("text", "tb"),
                ["conv_id", "turn_idx"],
                "full_outer",
            )
            .filter(
                F.col("ta").isNull()
                | F.col("tb").isNull()
                | (F.col("ta") != F.col("tb"))
            )
            .count()
        )
        assert mismatches == 0


class TestResume:
    def test_kill_and_resume_identical_estimates(self, prepared, spark):
        tmp = tempfile.mkdtemp(prefix="ledger-")
        try:
            specs = specs_all()
            full = run_with_lineage(
                prepared, specs, tmp + "/full", num_groups=32, run_id="r1"
            )

            # simulate executor loss: build a partial ledger holding only
            # half the groups, then resume
            partial_path = tmp + "/partial"
            lineage = build_sketches(prepared, specs, num_groups=32, method="group")
            kept = lineage.filter(F.col("group_id") < 16).withColumn(
                "run_id", F.lit("r1")
            )
            kept.write.mode("overwrite").parquet(partial_path + "/build")

            resumed = run_with_lineage(
                prepared, specs, partial_path, num_groups=32, run_id="r2"
            )
            assert resumed["hll_conv"].estimate() == full["hll_conv"].estimate()
            assert (
                resumed["cms_tool"].table == full["cms_tool"].table
            ).all()
            assert (
                resumed["bloom_conv"].words == full["bloom_conv"].words
            ).all()
            # order-sensitive kernels: estimates equal within bound
            assert resumed["kll_len"].n == full["kll_len"].n
            assert (
                abs(resumed["kll_len"].quantile(0.5) - full["kll_len"].quantile(0.5))
                <= 2.0
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_completed_ledger_short_circuits(self, prepared, spark):
        tmp = tempfile.mkdtemp(prefix="ledger-")
        try:
            specs = [
                SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog)
            ]
            first = run_with_lineage(prepared, specs, tmp, num_groups=16, run_id="a")
            # resume over an empty input: everything must come from the ledger
            empty = prepared.limit(0)
            second = run_with_lineage(empty, specs, tmp, num_groups=16, run_id="b")
            assert second["hll_conv"].estimate() == first["hll_conv"].estimate()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestSqlSketch:
    def test_hll_sql_matches_prehashed_kernel(self, spark):
        from associationabacminer_spark.operators.sql_sketch import hll_from_sql
        from associationabacminer_spark.sketch import HyperLogLog

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sql_hll = hll_from_sql(ev, "user_id", p=14)
        hashes = np.array(
            [r["h"] for r in ev.select(F.xxhash64("user_id").alias("h")).collect()],
            dtype=np.int64,
        )
        kern = HyperLogLog(p=14).update_batch(hashes, prehashed=True)
        assert (sql_hll._registers() == kern._registers()).all()
        exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
        assert abs(sql_hll.estimate() - exact) <= max(
            1.0, 3 * sql_hll.relative_error * exact
        )

    def test_cms_sql_matches_streaming_kernel(self, spark):
        from associationabacminer_spark.operators.sql_sketch import cms_from_sql
        from associationabacminer_spark.sketch import CountMinSketch

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sql_cms = cms_from_sql(ev, "event_type", width=2048, depth=5)
        hashes = np.array(
            [r["h"] for r in ev.select(F.xxhash64("event_type").alias("h")).collect()],
            dtype=np.int64,
        )
        kern = CountMinSketch(width=2048, depth=5).update_batch(hashes, prehashed=True)
        assert sql_cms.total == kern.total
        assert (sql_cms.table == kern.table).all()

    def test_bloom_sql_matches_pair_kernel(self, spark):
        from associationabacminer_spark.operators.sql_sketch import bloom_from_sql
        from associationabacminer_spark.sketch import BloomFilter
        from associationabacminer_spark.sketch.xxhash import xxh64_pair_keys

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sql_bloom = bloom_from_sql(ev, "user_id", 200_000, 7)
        keys = [int(r["user_id"]) for r in ev.select("user_id").distinct().collect()]
        h1, h2 = xxh64_pair_keys(keys)
        kern = BloomFilter(200_000, 7).update_pairs(h1, h2)
        assert (sql_bloom.words == kern.words).all()
        assert sql_bloom.contains_pairs(h1, h2).all()  # no false negatives
        ah1, ah2 = xxh64_pair_keys(list(range(10_000_000, 10_050_000)))
        assert sql_bloom.contains_pairs(ah1, ah2).mean() <= 0.02


class TestSqlQuantileSketches:
    def test_kll_sql_rank_error_within_bound(self, spark):
        """kll_from_sql consumes the exact value multiset (histogram ->
        binary-weighted insertion), so the published rank bound applies."""
        from associationabacminer_spark.operators.sql_sketch import kll_from_sql

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        lens = docs.select(F.length("text").cast("double").alias("L"))
        kll = kll_from_sql(lens, "L", k=200)
        exact = np.sort(
            np.array([r["L"] for r in lens.collect()], dtype=np.float64)
        )
        assert kll.n == len(exact)
        for q in (0.1, 0.5, 0.9, 0.99):
            est = kll.quantile(q)
            true_rank = np.searchsorted(exact, est, side="right") / len(exact)
            assert abs(true_rank - q) <= kll.rank_error + 1e-9, (q, est, true_rank)

    def test_kll_sql_merges_with_arrow_built_kll(self, spark):
        """SQL-built and stream-built KLLs are the same kind of kernel:
        merging them must keep the bound on the union."""
        from associationabacminer_spark.operators.sql_sketch import kll_from_sql
        from associationabacminer_spark.sketch import KLL

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        lens = np.array(
            [r[0] for r in docs.select(F.length("text").cast("double")).collect()],
            dtype=np.float64,
        )
        half = len(lens) // 2
        a = kll_from_sql(
            spark.createDataFrame([(float(x),) for x in lens[:half]], "L double"),
            "L",
        )
        b = KLL(k=200).update_batch(lens[half:])
        m = KLL.merge(a, b)
        exact = np.sort(lens)
        assert m.n == len(exact)
        for q in (0.25, 0.5, 0.75):
            est = m.quantile(q)
            true_rank = np.searchsorted(exact, est, side="right") / len(exact)
            assert abs(true_rank - q) <= m.rank_error + 1e-9

    def test_tdigest_sql_rank_error_within_bound(self, spark):
        """Log-binned t-digest build: rank error within the delta bound
        plus one bin's mass (documented tolerance)."""
        from associationabacminer_spark.operators.sql_sketch import tdigest_from_sql

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        vals = ev.select(F.col("value").cast("double").alias("v")).filter(
            F.col("v").isNotNull()
        )
        td = tdigest_from_sql(vals, "v", delta=200)
        exact = np.sort(np.array([r["v"] for r in vals.collect()], dtype=np.float64))
        assert int(td.n) == len(exact)
        for q in (0.1, 0.5, 0.9):
            est = td.quantile(q)
            true_rank = np.searchsorted(exact, est, side="right") / len(exact)
            # delta=200 mid-quantile bound ~ 4/delta = 0.02 (+ bin mass)
            assert abs(true_rank - q) <= 0.03, (q, est, true_rank)


class TestLineageMetrics:
    def test_observe_metrics_from_build_and_resume(self, spark, tmp_path):
        from associationabacminer_spark.operators.agg import SketchSpec
        from associationabacminer_spark.plans.lineage import run_with_lineage
        from associationabacminer_spark.sketch import HyperLogLog

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        specs = [
            SketchSpec(
                "hll_user", HyperLogLog, "user_id", kernel_cls=HyperLogLog, prehash=True
            )
        ]
        n = ev.count()
        m: dict = {}
        run_with_lineage(ev, specs, str(tmp_path / "ledger"), num_groups=4,
                         metrics_out=m)
        assert m["rows_processed"] == n
        assert m["lineage_rows"] == 4  # groups x 1 sketch
        assert m["wall_time_s"] > 0
        # idempotent re-run: ledger complete -> no build -> no new metrics
        m2: dict = {}
        run_with_lineage(ev, specs, str(tmp_path / "ledger"), num_groups=4,
                         metrics_out=m2)
        assert m2 == {}


class TestWindowedResume:
    def test_resume_rebuilds_only_missing_windows(self, spark, tmp_path):
        from associationabacminer_spark.operators.agg import SketchSpec
        from associationabacminer_spark.operators.windowed_sketch import (
            run_windowed_with_lineage,
        )
        from associationabacminer_spark.sketch import HyperLogLog

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        specs = [
            SketchSpec(
                "hll_user", HyperLogLog, "user_id", kernel_cls=HyperLogLog, prehash=True
            )
        ]
        ledger = str(tmp_path / "wledger")
        cutoff = ev.agg(F.max("ts")).collect()[0][0]
        early = ev.filter(F.col("ts") < F.lit(cutoff) - F.expr("INTERVAL 3 DAYS"))
        # crash simulation: partial run covered only the early windows
        m1: dict = {}
        run_windowed_with_lineage(early, specs, ledger, "ts", "1 day", metrics_out=m1)
        assert m1["rows_processed"] == early.count()
        # resume with the full input: only the tail windows rebuild
        m2: dict = {}
        merged = run_windowed_with_lineage(ev, specs, ledger, "ts", "1 day",
                                           metrics_out=m2).collect()
        assert 0 < m2["rows_processed"] < ev.count()
        # estimates match a fresh, uninterrupted build window-for-window
        fresh = {
            (r["window_start"], r["sketch_name"]): HyperLogLog.deserialize(
                bytes(r["sketch"])
            ).estimate()
            for r in run_windowed_with_lineage(
                ev, specs, str(tmp_path / "wledger2"), "ts", "1 day"
            ).collect()
        }
        got = {
            (r["window_start"], r["sketch_name"]): HyperLogLog.deserialize(
                bytes(r["sketch"])
            ).estimate()
            for r in merged
        }
        assert got == fresh
        # idempotent third run: nothing to rebuild
        m3: dict = {}
        run_windowed_with_lineage(ev, specs, ledger, "ts", "1 day", metrics_out=m3)
        assert m3["rows_processed"] == 0


class TestBottomKSql:
    def test_sql_reduction_register_identical(self, spark):
        """bottomk_from_sql must equal a kernel fed the same xxhash64
        pre-hashed keys — byte-identical serialized state."""
        import numpy as np
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.sql_sketch import bottomk_from_sql
        from associationabacminer_spark.sketch import BottomK

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sql_sketch = bottomk_from_sql(ev, "user_id", k=64)
        h = np.array(
            [r["h"] for r in ev.select(F.xxhash64("user_id").alias("h")).collect()],
            dtype=np.int64,
        )
        kernel = BottomK(k=64).update_hashes(h.astype(np.uint64), payloads=h)
        assert sql_sketch.serialize() == kernel.serialize()
        exact = ev.select("user_id").distinct().count()
        est = sql_sketch.estimate_distinct()
        assert abs(est - exact) / exact < 5 * sql_sketch.relative_error()


class TestHllByGroup:
    def test_matches_kernel_and_bound_per_group(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.sql_sketch import (
            hll_estimate_by_group,
        )
        from associationabacminer_spark.sketch import HyperLogLog

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        got = {
            r["event_type"]: r["approx_distinct"]
            for r in hll_estimate_by_group(ev, ["event_type"], "user_id").collect()
        }
        for et, est in got.items():
            # kernel parity on the same rows
            h = np.array(
                [
                    r["h"]
                    for r in ev.filter(F.col("event_type") == et)
                    .select(F.xxhash64("user_id").alias("h"))
                    .collect()
                ],
                dtype=np.int64,
            )
            k = HyperLogLog(14).update_hashes(h.astype(np.uint64))
            assert abs(est - k.estimate()) <= 1e-9 * max(1.0, k.estimate()), et
            exact = (
                ev.filter(F.col("event_type") == et)
                .select("user_id")
                .distinct()
                .count()
            )
            assert abs(est - exact) / max(exact, 1) < 5 * k.relative_error


class TestQuantilesByGroup:
    def test_exact_on_integer_values(self, spark):
        """With every distinct integer in its own log bin (values far
        below 1/rel_width) the binned quantile IS the exact discrete
        rank-ceil(q*n) quantile — the property the oracled q72 pins."""
        import math

        import numpy as np

        from associationabacminer_spark.operators.sql_sketch import (
            quantiles_by_group,
        )

        rng = np.random.default_rng(7)
        rows = [
            (int(g), int(v))
            for g in range(3)
            for v in rng.integers(1, 200, size=500)
        ]
        df = spark.createDataFrame(rows, "g int, v int")
        got = {
            r["g"]: (r["p50"], r["p90"], r["p99"])
            for r in quantiles_by_group(df, ["g"], "v").collect()
        }
        for g in range(3):
            vs = sorted(v for gg, v in rows if gg == g)
            n = len(vs)
            for q, have in zip((0.5, 0.9, 0.99), got[g]):
                assert have == vs[math.ceil(q * n) - 1], (g, q)

    def test_continuous_within_bin_width_and_no_python(self, spark):
        """Continuous values: the result sits within one bin's value
        width of the exact discrete quantile (rank is exact, the value
        snaps to the in-bin mean); the plan is pure Catalyst."""
        import math

        import numpy as np

        from associationabacminer_spark.operators.sql_sketch import (
            quantiles_by_group,
        )

        rng = np.random.default_rng(11)
        vals = rng.lognormal(mean=3.0, sigma=1.2, size=4000)
        df = spark.createDataFrame(
            [(int(i % 2), float(v)) for i, v in enumerate(vals)],
            "g int, v double",
        )
        w = 1e-3
        out = quantiles_by_group(df, ["g"], "v", (0.5, 0.95), rel_width=w)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # no BatchEvalPython/ArrowEvalPython
        got = {r["g"]: (r["p50"], r["p95"]) for r in out.collect()}
        for g in (0, 1):
            vs = sorted(v for i, v in enumerate(vals) if i % 2 == g)
            n = len(vs)
            for q, have in zip((0.5, 0.95), got[g]):
                exact = vs[math.ceil(q * n) - 1]
                assert abs(have - exact) <= 2.0 * w * (1.0 + exact), (g, q)


class TestPercentileByGroup:
    def test_exact_percent_rank_on_integers(self, spark):
        """On integral scores (distinct value == distinct bin) the binned
        percentile IS SQL percent_rank — the property the oracled q9k
        pins.  Compared against Spark's own window percent_rank, ties
        and single-row groups included."""
        import numpy as np
        from pyspark.sql import Window

        from associationabacminer_spark.operators.sql_sketch import (
            percentile_by_group,
        )

        rng = np.random.default_rng(13)
        rows = [
            (i, int(g), int(v))
            for i, (g, v) in enumerate(
                zip(rng.integers(0, 3, size=600), rng.integers(1, 40, size=600))
            )
        ]
        rows.append((600, 9, 7))  # single-row group -> percent_rank 0.0
        df = spark.createDataFrame(rows, "id int, g int, v int")
        got = {
            r["id"]: r["pctl"]
            for r in percentile_by_group(df, ["g"], "v").collect()
        }
        want = {
            r["id"]: r["pr"]
            for r in df.withColumn(
                "pr", F.percent_rank().over(Window.partitionBy("g").orderBy("v"))
            ).collect()
        }
        assert got == want

    def test_no_fact_side_shuffle_and_null_exclusion(self, spark):
        """The fact side reaches the join without an Exchange (bin
        recomputed map-side, bin table broadcast); NULL scores drop out."""
        df = spark.createDataFrame(
            [(1, "a", 5), (2, "a", 9), (3, "a", None), (4, "b", 2)],
            "id int, g string, v int",
        )
        from associationabacminer_spark.operators.sql_sketch import (
            percentile_by_group,
        )

        out = percentile_by_group(df, ["g"], "v")
        rows = {r["id"]: r["pctl"] for r in out.collect()}
        assert rows == {1: 0.0, 2: 1.0, 4: 0.0}  # id=3 (NULL) excluded
        # round 6 (ADVICE): the bin table is no longer FORCE-broadcast
        # (it can exceed broadcast limits at high group cardinality), so
        # assert on the AQE FINAL plan after execution: the planner still
        # broadcasts the tiny side here, keeping the fact side
        # exchange-free, and no Python stage appears anywhere
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Python" not in plan


class TestBottomKHarness:
    def test_bottomk_through_applyinpandas_harness(self, spark, transcripts):
        """BottomK slots into the generic SketchSpec harness: the
        distributed build (prehashed conv keys, tree merge) must be
        byte-identical to one kernel absorbing every key."""
        import numpy as np
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.agg import (
            SketchSpec,
            sketch_aggregate,
        )
        from associationabacminer_spark.sketch import BottomK

        got = sketch_aggregate(
            transcripts.select("conv_id"),
            [SketchSpec(
                "btk", lambda: BottomK(k=64), "conv_id",
                kernel_cls=BottomK, prehash=True,
            )],
            method="map",
        )["btk"]
        h = np.array(
            [
                r["h"]
                for r in transcripts.select(
                    F.xxhash64("conv_id").alias("h")
                ).distinct().collect()
            ],
            dtype=np.int64,
        )
        one = BottomK(k=64).update_batch(h, prehashed=True)
        assert got.serialize() == one.serialize()


class TestGroupedSketchStates:
    def test_per_group_states_estimate_and_partition_invariance(self, spark):
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.agg import SketchSpec
        from associationabacminer_spark.operators.windowed_sketch import (
            grouped_sketch_states,
        )
        from associationabacminer_spark.sketch import HyperLogLog

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        specs = [SketchSpec("hll_user", HyperLogLog, "user_id",
                            kernel_cls=HyperLogLog, prehash=True)]
        states = grouped_sketch_states(ev, "event_type", specs, salts=4)
        rows = {r["group"]: r for r in states.collect()}
        exacts = {
            r["event_type"]: r["x"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("x"))
            .collect()
        }
        assert set(rows) == set(exacts)
        for g, r in rows.items():
            k = HyperLogLog.deserialize(bytes(r["sketch"]))
            assert abs(k.estimate() - exacts[g]) <= 5 * k.relative_error * exacts[g]
        # different salting/partitioning -> identical registers (max-merge)
        again = grouped_sketch_states(ev.repartition(7), "event_type", specs,
                                      salts=2)
        for r in again.collect():
            a = HyperLogLog.deserialize(bytes(r["sketch"]))
            b = HyperLogLog.deserialize(bytes(rows[r["group"]]["sketch"]))
            assert (a._registers() == b._registers()).all()


class TestRangeSortedLayout:
    def test_output_files_have_disjoint_ranges(self, spark, tmp_path):
        """The written files' parquet min/max statistics must form
        non-overlapping ts ranges — the property pruning relies on."""
        from associationabacminer_spark.sources.layout import (
            file_ranges,
            write_range_sorted,
        )

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        dst = str(tmp_path / "sorted-events")
        write_range_sorted(ev, dst, ["ts"], n_files=8)
        back = spark.read.parquet(dst)
        assert back.count() == ev.count()
        ranges = sorted(file_ranges(dst, "ts"))
        assert len(ranges) >= 4
        for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b, (hi_a, lo_b)

    def test_unsorted_write_overlaps(self, spark, tmp_path):
        """Control: a hash-repartitioned write has overlapping ranges —
        the test above isn't vacuously true."""
        from associationabacminer_spark.sources.layout import file_ranges

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        dst = str(tmp_path / "hashed-events")
        ev.repartition(8).write.mode("overwrite").parquet(dst)
        ranges = sorted(file_ranges(dst, "ts"))
        overlaps = sum(
             1 for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:])
             if hi_a > lo_b
        )
        assert overlaps > 0

    def test_bottomk_and_cms_through_grouped_states(self, spark):
        """Kernel generality: grouped_sketch_states works for ANY kernel
        implementing the lifecycle — bottom-k distinct samples and CMS
        counts per group, states deserializable and within bounds."""
        import numpy as np
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.agg import SketchSpec
        from associationabacminer_spark.operators.windowed_sketch import (
            grouped_sketch_states,
        )
        from associationabacminer_spark.sketch import BottomK, CountMinSketch
        from associationabacminer_spark.sketch.xxhash import xxh64_keys

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        specs = [
            SketchSpec("btk_user", lambda: BottomK(k=32), "user_id",
                       kernel_cls=BottomK, prehash=True),
            SketchSpec("cms_type", lambda: CountMinSketch(width=1024, depth=4),
                       "event_type", kernel_cls=CountMinSketch, prehash=True),
        ]
        states = grouped_sketch_states(ev, "event_type", specs, salts=4)
        rows = states.collect()
        by = {(r["group"], r["sketch_name"]): r for r in rows}
        for et in ("view", "click"):
            exact = (
                ev.filter(F.col("event_type") == et)
                .select("user_id").distinct().count()
            )
            b = BottomK.deserialize(bytes(by[(et, "btk_user")]["sketch"]))
            est = b.estimate_distinct()
            assert abs(est - exact) / max(exact, 1) < 5 * b.relative_error()
            c = CountMinSketch.deserialize(bytes(by[(et, "cms_type")]["sketch"]))
            n = ev.filter(F.col("event_type") == et).count()
            probe = xxh64_keys(np.array([et], dtype=object))
            got = int(c.query(probe, prehashed=True)[0])
            assert got >= n  # CMS overestimates only


class TestLedgerOrdering:
    """T3 (job-queue ordering): the resume path must claim exactly the
    missing group ids, deterministically, and the ledger must end up a
    complete one-row-per-(group, sketch) partition of the work — the
    Spark analog of the reference's ordered job-queue claim
    (/root/reference/src/job/job_executor.py:93-130)."""

    def test_resume_claims_exactly_missing_groups_once(self, prepared, spark):
        tmp = tempfile.mkdtemp(prefix="ledger-order-")
        try:
            specs = [
                SketchSpec("hll_conv", HyperLogLog, "conv_id", kernel_cls=HyperLogLog)
            ]
            lineage = build_sketches(prepared, specs, num_groups=32, method="group")
            kept = lineage.filter(F.col("group_id") < 16).withColumn(
                "run_id", F.lit("r1")
            )
            kept.write.mode("overwrite").parquet(tmp + "/build")

            run_with_lineage(prepared, specs, tmp, num_groups=32, run_id="r2")
            ledger = spark.read.parquet(tmp + "/build").collect()

            # r2 claimed exactly the missing half, nothing it already had
            r2_groups = sorted(r["group_id"] for r in ledger if r["run_id"] == "r2")
            assert r2_groups == list(range(16, 32))
            # the finished ledger is a complete, duplicate-free partition
            # of the work: one row per (group_id, sketch_name)
            keys = [(r["group_id"], r["sketch_name"]) for r in ledger]
            assert len(keys) == len(set(keys)) == 32
            assert sorted({g for g, _ in keys}) == list(range(32))
            # a third run over the complete ledger claims nothing (T3's
            # "don't re-claim finished jobs")
            run_with_lineage(prepared, specs, tmp, num_groups=32, run_id="r3")
            ledger3 = spark.read.parquet(tmp + "/build").collect()
            assert not any(r["run_id"] == "r3" for r in ledger3)
            assert len(ledger3) == 32
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestBucketedJoin:
    """write_bucketed makes same-key joins shuffle-free: both sides
    pre-hashed into aligned buckets at write time, so the join plan has
    NO Exchange — the co-location lever for fact-to-fact joins at
    100 TB."""

    def test_bucketed_join_has_no_exchange(self, spark):
        from associationabacminer_spark.sources.layout import write_bucketed

        tmp = tempfile.mkdtemp(prefix="buckets-")
        try:
            a = spark.range(0, 10_000).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("va")
            )
            b = spark.range(0, 10_000).select(
                F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
            )
            write_bucketed(a, "bk_a", ["k"], 8, path=tmp + "/a", sort_cols=["k"])
            write_bucketed(b, "bk_b", ["k"], 8, path=tmp + "/b", sort_cols=["k"])
            ta, tb = spark.table("bk_a"), spark.table("bk_b")
            joined = ta.join(tb.hint("merge"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # and it computes the right thing
            row = joined.agg(
                F.count("*").alias("n"), F.sum(F.col("va") + F.col("vb")).alias("s")
            ).collect()[0]
            assert row["n"] == 10_000
            assert row["s"] == sum(2 * i + 3 * i for i in range(10_000))
        finally:
            spark.sql("DROP TABLE IF EXISTS bk_a")
            spark.sql("DROP TABLE IF EXISTS bk_b")
            shutil.rmtree(tmp, ignore_errors=True)

    def test_bucketed_groupby_has_no_exchange(self, spark):
        from associationabacminer_spark.sources.layout import write_bucketed

        tmp = tempfile.mkdtemp(prefix="buckets-")
        try:
            a = spark.range(0, 10_000).select(
                (F.col("id") % 500).alias("k"), F.col("id").alias("v")
            )
            write_bucketed(a, "bk_g", ["k"], 8, path=tmp + "/g")
            plan = (
                spark.table("bk_g")
                .groupBy("k")
                .agg(F.sum("v"))
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Exchange" not in plan, plan
        finally:
            spark.sql("DROP TABLE IF EXISTS bk_g")
            shutil.rmtree(tmp, ignore_errors=True)


class TestMisraGriesThroughHarness:
    def test_mg_through_grouped_states_matches_exact(self, spark):
        """7th-kernel lifecycle check: Misra-Gries per-group summaries
        through grouped_sketch_states — deserialized lower bounds within
        the tracked error of exact counts, partition-invariant."""
        import numpy as np
        from pyspark.sql import functions as F

        from associationabacminer_spark.operators.agg import SketchSpec
        from associationabacminer_spark.operators.windowed_sketch import (
            grouped_sketch_states,
        )
        from associationabacminer_spark.sketch import MisraGries
        from associationabacminer_spark.sketch.xxhash import xxh64_keys

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        specs = [
            SketchSpec("mg_user", lambda: MisraGries(k=64), "user_id",
                       kernel_cls=MisraGries, prehash=True),
        ]
        states = grouped_sketch_states(ev, "event_type", specs, salts=4)
        by = {r["group"]: r for r in states.collect()}
        for et in ("view", "error"):
            mg = MisraGries.deserialize(bytes(by[et]["sketch"]))
            top = (
                ev.filter(F.col("event_type") == et)
                .groupBy("user_id").count()
                .orderBy(F.desc("count")).limit(3).collect()
            )
            for r in top:
                probe = np.array(
                    [int(xxh64_keys(np.array([r["user_id"]], dtype="int64"))[0])]
                )
                lb = int(mg.query(probe, prehashed=True)[0])
                assert lb <= r["count"] <= lb + mg.error_bound()
        # partition invariance (merge order must not change the summary)
        again = grouped_sketch_states(ev.repartition(7), "event_type", specs, salts=4)
        a = {r["group"]: bytes(r["sketch"]) for r in states.collect()}
        b = {r["group"]: bytes(r["sketch"]) for r in again.collect()}
        assert a == b
