"""Live embedded-Derby JDBC round-trip: the reference's fail/replace/
append mode map (app.py:21,178-183) executed for real, not dry-run."""

from __future__ import annotations

import os
import tempfile

from parquet_importer_spark.io import read_table
from parquet_importer_spark.sources.sinks import write_jdbc

SF = "/root/testdata/sf0.001"


def test_jdbc_roundtrip_modes(spark):
    db_dir = tempfile.mkdtemp(prefix="pis_derby_test_")
    spark._jvm.java.lang.System.setProperty(  # noqa: SLF001
        "derby.stream.error.file", os.path.join(db_dir, "derby.log")
    )
    url = f"jdbc:derby:{os.path.join(db_dir, 'db')};create=true"
    n = read_table(spark, SF, "nation")
    n_rows = n.count()

    write_jdbc(n, url, "t_nation", mode="replace", batchsize=1000, num_partitions=2)
    assert spark.read.jdbc(url, "t_nation").count() == n_rows

    # replace again is idempotent (drop + recreate, not double-load)
    write_jdbc(n, url, "t_nation", mode="replace", batchsize=1000, num_partitions=2)
    assert spark.read.jdbc(url, "t_nation").count() == n_rows

    write_jdbc(n, url, "t_nation", mode="append", batchsize=1000, num_partitions=2)
    assert spark.read.jdbc(url, "t_nation").count() == 2 * n_rows

    try:
        write_jdbc(n, url, "t_nation", mode="fail")
        raised = False
    except Exception:  # noqa: BLE001 — table-exists is the expected failure
        raised = True
    assert raised, "mode='fail' must raise on an existing table"
    assert spark.read.jdbc(url, "t_nation").count() == 2 * n_rows

    # read-back preserves values, not just counts
    back = {r.n_nationkey for r in spark.read.jdbc(url, "t_nation").collect()}
    assert back == {r.n_nationkey for r in n.collect()}


def test_sink_jdbc_query_outcomes(spark):
    from parquet_importer_spark.suite import QUERIES

    rows = {r.step: r for r in QUERIES["sink_jdbc"](spark, SF).collect()}
    assert rows["1_replace"].rows_in_db * 2 == rows["2_append"].rows_in_db
    assert rows["3_fail"].outcome == "errorifexists_raised"
    assert rows["3_fail"].rows_in_db == rows["2_append"].rows_in_db
