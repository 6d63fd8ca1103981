"""Scalar/array expression helpers, including the dual-dialect
(Spark SQL / DuckDB SQL) generators used so every extension operator
has a machine-generated oracle built from the same constants."""
