"""upc_sku_data_loader_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL loader
(krissirk/upc-sku-data-loader; reference tree empty at survey time, see
SURVEY.md §0.1 — behavior reconstructed from driver metadata) as an
idiomatic Spark DataFrame engine, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Public surface:
- ``session.get_spark`` / ``session.ensure_runtime_configs``
- ``catalog.load`` — schema-pinned fixture tables
- ``registry.QUERIES`` / ``registry.ORACLES`` — the operator inventory
  (one DataFrame builder + DuckDB oracle SQL per SURVEY.md §2 row)
"""

__version__ = "0.1.0"
