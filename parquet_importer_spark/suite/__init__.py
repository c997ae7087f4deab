"""Driver-checked query suite.

Importing this package populates :mod:`parquet_importer_spark.registry`
with every implemented operator from SURVEY.md §2. Each submodule covers
one inventory section.
"""

from parquet_importer_spark.suite import (  # noqa: F401
    aggregates,
    analytics,
    flagship,
    functions,
    joins,
    llm_dedup,
    llm_filtering,
    llm_multimodal,
    llm_sampling,
    llm_similarity,
    llm_text,
    relational,
    scans,
    sinks_suite,
    streaming,
    udf_suite,
    windows,
)

from parquet_importer_spark.registry import QUERIES, ORACLES  # noqa: F401
