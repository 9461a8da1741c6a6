from associationabacminer_spark.operators.agg import (
    SketchSpec,
    build_sketches,
    salted_group_id,
    tree_merge,
    sketch_aggregate,
    LINEAGE_SCHEMA,
)
from associationabacminer_spark.operators import (
    asof,
    dedup,
    multimodal,
    rulemine,
    similarity,
    stats,
    topk,
    windowed_sketch,
    windows,
)

__all__ = [
    "SketchSpec",
    "build_sketches",
    "salted_group_id",
    "tree_merge",
    "sketch_aggregate",
    "LINEAGE_SCHEMA",
    "asof",
    "dedup",
    "multimodal",
    "rulemine",
    "similarity",
    "stats",
    "topk",
    "windowed_sketch",
    "windows",
]
