"""calidad_del_aire_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
air-quality ETL (Moisescar3008/Calidad-del-aire-etl, surveyed in
SURVEY.md) as idiomatic Spark DataFrame operators, plus the operators a
large-scale (100 TB) training-data pipeline needs: dedup families,
similarity search, multimodal binary columns, and text analysis.

Design rules (see SURVEY.md §4):
- DataFrame/SQL first; Catalyst picks physical plans.
- No ``.collect()`` inside operators; everything stays distributed.
- Small dimension tables are broadcast; aggregations rely on partial
  (map-side) aggregation; window ops shuffle once per group key.
- Python UDFs only as Arrow-batched pandas UDFs, and only where
  built-in functions genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
