"""Batch sinks: parquet and JDBC (Postgres), with the reference's
fail/replace/append semantics mapped onto Spark SaveModes.

Reference parity (SURVEY §2.A):
- mode map — app.py:21 offers fail/replace/append; `to_sql` semantics
  map 1:1 onto SaveModes (sink_jdbc row);
- chunked append — app.py:109/178/186 applies the user mode on the
  first chunk then forces append; a single atomic ``df.write`` makes
  that dance unnecessary (the incremental analog lives in
  streaming/microbatch.py).

Scale: the reference pushed every row through ONE Postgres connection
(app.py:111-183). ``df.write.jdbc`` opens one connection per partition
and batches inserts — ``numPartitions`` × ``batchsize`` is the knob
pair; repartition before the write to bound connection count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: reference UI mode → Spark SaveMode (app.py:21 → write.mode)
IF_EXISTS_TO_SAVEMODE = {
    "fail": "errorifexists",
    "replace": "overwrite",
    "append": "append",
}


def write_parquet(df: DataFrame, path: str, mode: str = "fail") -> None:
    """Parquet sink (reference generate_data.py:21). Atomic per write:
    no first-chunk-DDL special case needed."""
    df.write.mode(IF_EXISTS_TO_SAVEMODE[mode]).parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "fail",
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 50_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink with the reference's mode semantics (app.py:178-183).

    ``batchsize`` defaults to the reference's 50k chunk (app.py:94) —
    here it is the per-roundtrip INSERT batch, per connection, in
    parallel across partitions rather than one serial loop.
    """
    props = {"batchsize": str(batchsize)}
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    out = df.repartition(num_partitions) if num_partitions else df
    out.write.mode(IF_EXISTS_TO_SAVEMODE[mode]).options(**props).jdbc(
        url, table
    )


def jdbc_write_plan(
    df: DataFrame,
    table: str,
    mode: str = "fail",
    batchsize: int = 50_000,
    num_partitions: int = 8,
) -> list[tuple[str, str]]:
    """Dry-run description of the JDBC write: (step, detail) pairs.
    Lets the sink logic be inspected/tested without a live database."""
    return [
        ("save_mode", IF_EXISTS_TO_SAVEMODE[mode]),
        ("target_table", table),
        ("batchsize", str(batchsize)),
        ("num_partitions", str(num_partitions)),
        ("columns", ", ".join(f"{f.name} {f.dataType.simpleString()}"
                              for f in df.schema.fields)),
    ]
