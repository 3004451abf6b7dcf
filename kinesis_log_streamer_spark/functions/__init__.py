"""Column-expression function library (JVM-side, codegen-friendly)."""

from kinesis_log_streamer_spark.functions.vector import cosine_sim, dot, l2_norm

__all__ = ["cosine_sim", "dot", "l2_norm"]
