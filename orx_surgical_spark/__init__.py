"""orx_surgical_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference repo ``sfu-bigdata/orx-surgical`` (a
pandas/NumPy/Keras pipeline over CMS DE-SynPUF claims data), re-expressed
as lazy, Catalyst-optimizable DataFrame plans, plus a beyond-reference
tier of large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout
------
- ``session``    — SparkSession factory tuned for local[N] and cluster use.
- ``schemas``    — explicit StructTypes (no inference; SURVEY §1.4).
- ``sources``    — parquet/CSV readers and writers (SURVEY §2-A).
- ``operators``  — relational ops, encoders, dedup, similarity, text,
                   multimodal (SURVEY §2-B/C/D/E + beyond-reference tier).
- ``functions``  — metric/evaluation aggregations (SURVEY §2-G).
- ``models``     — MLlib pipelines mirroring the reference models (§2-F).
- ``plans``      — physical-plan assertion helpers (SURVEY §5 plan tests).
- ``streaming``  — Structured Streaming operators over event streams.
- ``queries``    — the declared query catalog (spark fn + DuckDB oracle).
"""

__version__ = "0.1.0"
