"""Hypothesis property tests for the sketch kernels: merge laws
(associativity/commutativity up to each kernel's guarantee), bound
invariants, and weighted-update equivalence over RANDOMIZED inputs —
the north-star's "verified associative/commutative" requirement beyond
the fixed-seed cases in test_sketch_kernels.py."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from associationabacminer_spark.sketch import (
    KLL,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    TDigest,
)

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
int_keys = st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=400)
values = st.lists(floats, min_size=1, max_size=400)


def _np_keys(xs):
    return np.array(xs, dtype=np.int64)


class TestHllLaws:
    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys, int_keys)
    def test_merge_assoc_comm_register_exact(self, xa, xb, xc):
        a = HyperLogLog(p=10).update_batch(_np_keys(xa), prehashed=True)
        b = HyperLogLog(p=10).update_batch(_np_keys(xb), prehashed=True)
        c = HyperLogLog(p=10).update_batch(_np_keys(xc), prehashed=True)
        ab_c = HyperLogLog.merge(HyperLogLog.merge(a, b), c)
        a_bc = HyperLogLog.merge(a, HyperLogLog.merge(b, c))
        b_ac = HyperLogLog.merge(b, HyperLogLog.merge(a, c))
        assert (ab_c._registers() == a_bc._registers()).all()
        assert (ab_c._registers() == b_ac._registers()).all()

    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys)
    def test_merge_equals_union_stream(self, xa, xb):
        m = HyperLogLog.merge(
            HyperLogLog(p=10).update_batch(_np_keys(xa), prehashed=True),
            HyperLogLog(p=10).update_batch(_np_keys(xb), prehashed=True),
        )
        u = HyperLogLog(p=10).update_batch(_np_keys(xa + xb), prehashed=True)
        assert (m._registers() == u._registers()).all()


class TestCmsLaws:
    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys)
    def test_merge_is_table_addition_and_overestimates(self, xa, xb):
        a = CountMinSketch(width=256, depth=3).update_batch(
            _np_keys(xa), prehashed=True
        )
        b = CountMinSketch(width=256, depth=3).update_batch(
            _np_keys(xb), prehashed=True
        )
        m = CountMinSketch.merge(a, b)
        assert (m.table == a.table + b.table).all()
        allk = xa + xb
        ks, cnts = np.unique(_np_keys(allk), return_counts=True)
        est = m.query(ks, prehashed=True)
        assert (est >= cnts).all()  # CMS never underestimates


class TestBloomLaws:
    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys)
    def test_merge_is_word_or_and_no_false_negatives(self, xa, xb):
        shape = BloomFilter.from_capacity(2000, 0.01)

        def mk(keys):
            f = BloomFilter(shape.m, shape.k)
            k1 = _np_keys(keys)
            f.update_pairs(k1, k1 ^ np.int64(7))
            return f

        a, b, u = mk(xa), mk(xb), mk(xa + xb)
        m = BloomFilter.merge(a, b)
        assert (m.words == (a.words | b.words)).all()
        assert (m.words == u.words).all()
        k1 = _np_keys(xa + xb)
        assert m.contains_pairs(k1, k1 ^ np.int64(7)).all()


class TestKllLaws:
    @settings(max_examples=20, deadline=None)
    @given(values, values)
    def test_merge_n_and_bound(self, va, vb):
        a = KLL(k=100).update_batch(np.array(va))
        b = KLL(k=100).update_batch(np.array(vb))
        m = KLL.merge(a, b)
        exact = np.sort(np.array(va + vb))
        assert m.n == len(exact)
        for q in (0.25, 0.5, 0.75):
            est = m.quantile(q)
            # ties give est a rank INTERVAL [left, right]; the bound
            # holds if q is within err of that interval
            lo = np.searchsorted(exact, est, side="left") / len(exact)
            hi = np.searchsorted(exact, est, side="right") / len(exact)
            err = m.rank_error + 2.0 / len(exact) + 1e-9
            assert lo - err <= q <= hi + err

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(floats, st.integers(1, 1000)), min_size=1, max_size=100
        )
    )
    def test_weighted_equals_repeated(self, pairs):
        vals = np.array([p[0] for p in pairs])
        wts = np.array([p[1] for p in pairs], dtype=np.int64)
        kw = KLL(k=100).update_weighted(vals, wts)
        assert kw.n == int(wts.sum())
        exact = np.sort(np.repeat(vals, wts))
        for q in (0.1, 0.5, 0.9):
            est = kw.quantile(q)
            lo = np.searchsorted(exact, est, side="left") / len(exact)
            hi = np.searchsorted(exact, est, side="right") / len(exact)
            err = kw.rank_error + 2.0 / len(exact) + 1e-9
            assert lo - err <= q <= hi + err


class TestTDigestLaws:
    @settings(max_examples=20, deadline=None)
    @given(values, values)
    def test_merge_weight_conservation_and_bound(self, va, vb):
        a = TDigest(delta=100).update_batch(np.array(va))
        b = TDigest(delta=100).update_batch(np.array(vb))
        m = TDigest.merge(a, b)
        assert m.n == len(va) + len(vb)
        exact = np.sort(np.array(va + vb))
        est = m.quantile(0.5)
        lo = np.searchsorted(exact, est, side="left") / len(exact)
        hi = np.searchsorted(exact, est, side="right") / len(exact)
        err = 6.0 / 100 + 2.0 / len(exact)
        assert lo - err <= 0.5 <= hi + err

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(floats, st.integers(1, 1000)), min_size=2, max_size=100
        )
    )
    def test_weighted_total_weight_in_n(self, pairs):
        vals = np.array([p[0] for p in pairs])
        wts = np.array([p[1] for p in pairs], dtype=np.float64)
        td = TDigest(delta=100).update_batch(vals, weights=wts)
        assert float(td.n) == pytest.approx(wts.sum())


class TestBottomKLaws:
    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys, int_keys)
    def test_merge_assoc_comm_byte_exact(self, xa, xb, xc):
        from associationabacminer_spark.sketch import BottomK

        def mk(xs):
            h = _np_keys(xs).astype(np.uint64)
            return BottomK(k=32).update_hashes(h, payloads=_np_keys(xs))

        a, b, c = mk(xa), mk(xb), mk(xc)
        ab_c = BottomK.merge(BottomK.merge(a, b), c)
        a_bc = BottomK.merge(a, BottomK.merge(b, c))
        b_ac = BottomK.merge(b, BottomK.merge(a, c))
        assert ab_c.serialize() == a_bc.serialize() == b_ac.serialize()

    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys)
    def test_merge_equals_union_stream_and_idempotent(self, xa, xb):
        from associationabacminer_spark.sketch import BottomK

        def mk(xs):
            return BottomK(k=32).update_hashes(_np_keys(xs).astype(np.uint64))

        m = BottomK.merge(mk(xa), mk(xb))
        u = mk(xa + xb)
        assert m.serialize() == u.serialize()
        again = BottomK.merge(m, mk(xa))  # re-absorbing a subset: no-op
        assert again.serialize() == m.serialize()

    @settings(max_examples=20, deadline=None)
    @given(int_keys)
    def test_estimate_exact_below_k(self, xs):
        from associationabacminer_spark.sketch import BottomK

        distinct = len(set(xs))
        s = BottomK(k=1024).update_hashes(_np_keys(xs).astype(np.uint64))
        if distinct < 1024:
            assert s.estimate_distinct() == float(distinct)


class TestBottomKPayloadMaskLaws:
    """The out-of-band payload-validity mask (round-3 BTK2 layout) must
    survive merges and serde for ANY int64 payload, including the old
    in-band sentinel value int64 min."""

    @settings(max_examples=30, deadline=None)
    @given(int_keys, int_keys)
    def test_mask_follows_payloads_through_merge_and_serde(self, xa, xb):
        from associationabacminer_spark.sketch import BottomK

        ha = _np_keys(xa).astype(np.uint64)
        hb = _np_keys(xb).astype(np.uint64)
        a = BottomK(k=32).update_hashes(ha, payloads=_np_keys(xa))  # with payloads
        b = BottomK(k=32).update_hashes(hb)  # without
        m = BottomK.merge(a, b)
        rt = BottomK.deserialize(m.serialize())
        assert (rt.has_payload == m.has_payload).all()
        # every sampled payload is one a contributed; b's entries never leak
        a_payloads = set(int(x) for x in _np_keys(xa))
        assert set(int(x) for x in rt.sample()) <= a_payloads

    @settings(max_examples=20, deadline=None)
    @given(int_keys)
    def test_int64_min_is_a_legal_payload(self, xs):
        from associationabacminer_spark.sketch import BottomK

        lo = -(2**63)
        h = np.concatenate(
            [np.array([lo], dtype=np.int64), _np_keys(xs)]
        ).astype(np.uint64)
        p = h.astype(np.int64)
        s = BottomK(k=max(64, len(h) + 1)).update_hashes(h, payloads=p)
        assert lo in set(int(x) for x in s.sample())
