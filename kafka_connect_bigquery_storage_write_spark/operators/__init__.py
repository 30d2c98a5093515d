"""Extension operators for large-scale training-data pipelines (SURVEY.md E14–E16).

Everything here is built from declarative DataFrame primitives (shuffle-
conscious, broadcast-aware); Python appears only as Arrow-batched pandas
UDFs where Spark genuinely lacks the operator.
"""
