from associationabacminer_spark.operators.agg import (
    SketchSpec,
    build_sketches,
    salted_group_id,
    tree_merge,
    sketch_aggregate,
    LINEAGE_SCHEMA,
)
from associationabacminer_spark.operators import (
    dedup,
    multimodal,
    rulemine,
    similarity,
    topk,
    windows,
)

__all__ = [
    "SketchSpec",
    "build_sketches",
    "salted_group_id",
    "tree_merge",
    "sketch_aggregate",
    "LINEAGE_SCHEMA",
    "dedup",
    "multimodal",
    "rulemine",
    "similarity",
    "topk",
    "windows",
]
