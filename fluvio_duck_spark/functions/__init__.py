from fluvio_duck_spark.functions.exact import davg, dmul, dsum

__all__ = ["davg", "dmul", "dsum"]
