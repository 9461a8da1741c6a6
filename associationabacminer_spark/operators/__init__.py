from associationabacminer_spark.operators.agg import (
    SketchSpec,
    build_sketches,
    tree_merge,
    sketch_aggregate,
    LINEAGE_SCHEMA,
)

__all__ = [
    "SketchSpec",
    "build_sketches",
    "tree_merge",
    "sketch_aggregate",
    "LINEAGE_SCHEMA",
]
