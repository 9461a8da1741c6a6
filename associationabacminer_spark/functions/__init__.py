from associationabacminer_spark.functions import normalize, text

__all__ = ["normalize", "text"]
