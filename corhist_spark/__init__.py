"""corhist_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimplementation of the query and mining
semantics of Tpt/corhist (WWW 2019, "Learning How to Correct a Knowledge
Base from the Edit History"): edit-history state reconstruction, the ten
constraint-violation kernels, correction lookup + expansion, rule mining
with confidence tuning, rule application / evaluation, entity
canonicalization, plus the large-scale training-data operators
(deduplication, similarity search, text analysis) that a 100 TB corpus
pipeline needs.

Everything is declarative DataFrame / Spark SQL; Python touches executor
data only through Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
