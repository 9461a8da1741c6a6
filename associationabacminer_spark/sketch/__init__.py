"""Pure-numpy mergeable sketch kernels.

Every kernel exposes the same lifecycle (the UDAF contract used by
``operators.agg``):

    s = Kernel(**params)          # init
    s.update_batch(np_or_series)  # vectorized absorb of a batch of values
    s = Kernel.merge(a, b)        # commutative + associative combine
    b = s.serialize()             # -> bytes (binary sketch-state column)
    s = Kernel.deserialize(b)
    s.estimate(...)               # query

The reference computes all of these exactly with in-memory Python sets /
Counters (see SURVEY.md §2.4; the central pain is the SHA-256 hash-set
distinct count at /root/reference/src/eval/EnvPolicyEvaluator.py:106-169).
These kernels are the bounded-memory, mergeable replacements.
"""

from associationabacminer_spark.sketch.hashing import hash64
from associationabacminer_spark.sketch.hll import HyperLogLog
from associationabacminer_spark.sketch.cms import CountMinSketch
from associationabacminer_spark.sketch.bloom import BloomFilter
from associationabacminer_spark.sketch.kll import KLL
from associationabacminer_spark.sketch.tdigest import TDigest
from associationabacminer_spark.sketch.bottomk import BottomK
from associationabacminer_spark.sketch.misragries import MisraGries

__all__ = [
    "hash64",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "BottomK",
    "MisraGries",
    "KLL",
    "TDigest",
]
