from maggma_spark.functions.criteria import compile_criteria, compile_projection

__all__ = ["compile_criteria", "compile_projection"]
