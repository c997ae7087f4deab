"""Column-expression builders shared across operators — all pure
``pyspark.sql.functions`` compositions (JVM-side, codegen-friendly)."""
