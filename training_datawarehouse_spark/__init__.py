"""training_datawarehouse_spark — a PySpark-native analytics engine.

Re-expresses the semantics of the reference training-data-warehouse
(an ETL + analytics pipeline over a personal endurance-training diary:
config-driven projection, a 3-dimensional aggregation lattice, EWMA /
rolling time-series metrics, interpolation, and periodic rollups) as
idiomatic Spark DataFrame pipelines, and extends it with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing).

Design tenets (100 TB posture):
- Declarative DataFrame / SQL plans only; Catalyst owns the physical plan.
- No row-at-a-time Python in the hot path; Pandas UDFs (Arrow) where Spark
  lacks an operator (per-key EWMA recurrence), built-in expressions elsewhere.
- Broadcast small dimensions, partial (map-side) aggregation everywhere,
  AQE for skew; no ``collect()`` inside any operator.
"""

__version__ = "0.1.0"
