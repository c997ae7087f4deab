"""Sources & sinks — the engine's ingest/export layer (SURVEY §2.A).

The reference's whole purpose was Parquet→Postgres chunked import
(app.py:88-193); here that collapses into declarative writes:
``df.write.parquet`` / ``df.write.jdbc(mode=...)`` for batch,
``writeStream.foreachBatch`` for incremental (streaming/microbatch.py),
plus a PostGIS staging adapter for geometry columns (spatial.py).
"""
