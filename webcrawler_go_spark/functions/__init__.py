"""Scalar / column-level functions (SURVEY.md §2.2, §2.6).

Everything here prefers JVM-side ``pyspark.sql.functions`` column builders
(whole-stage-codegen friendly); pandas-UDF kernels exist only where Spark
has no built-in (RFC-3986 reference resolution, Go-parity filename hash)
and are Arrow-vectorized.
"""
