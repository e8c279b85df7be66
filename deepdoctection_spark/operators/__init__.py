"""Spark operators: Arrow-batched extraction stages + relational compositions.

Each module is the Spark-first re-expression of one reference pipeline
component family (/root/reference/deepdoctection/pipe/*): per-row semantics
live in deepdoctection_spark.kernels; this layer owns batching, schemas,
partitioning, and shuffle behavior.
"""
