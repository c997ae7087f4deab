"""Reusable operator implementations (the engine API proper).

Modules here hold the non-trivial algorithms — as-of joins, sessionization,
similarity search, dedup — composed from DataFrame builtins so Catalyst
can still optimize through them. The thin builtin wrappers live directly
in :mod:`parquet_importer_spark.suite`.
"""
