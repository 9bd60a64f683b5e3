"""JDBC warehouse sink: distributed staging write + one server-side merge.

The reference's warehouse is Postgres loaded with a single multi-row
``INSERT ... ON CONFLICT (key) DO UPDATE SET <non-key cols>``
(``etl/load.py:30-52``), executed row-batch-wise from the driver. That
shape doesn't scale past one process, so the Spark-first sink splits the
load into the two phases every MPP loader uses:

1. **Staging write** — ``df.write.jdbc`` into a transient staging table:
   every executor streams its partitions over its own connection, so the
   wire transfer parallelizes with the cluster (``numPartitions``
   controls the connection fan-in the database sees).
2. **Merge statement** — ONE server-side set-based statement moves
   staging into the target under the database's own transaction:
   ``INSERT .. ON CONFLICT DO UPDATE`` (postgres/sqlite dialects) or
   ANSI ``MERGE`` (everything else). Updates win on shared keys, union
   otherwise, re-run is a no-op — exactly ``merge_upsert``'s semantics,
   pushed to the database.

Both effects are injected (``writer``/``statement_runner``) so tests run
without a database or driver jar; the defaults use ``DataFrameWriter.jdbc``
and a JVM ``DriverManager`` connection (no extra Python deps).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame


def _q(ident: str) -> str:
    """Quote an SQL identifier (double-quote, doubling embedded quotes)."""
    return '"' + ident.replace('"', '""') + '"'


def build_upsert_sql(
    table: str,
    staging: str,
    columns: Sequence[str],
    keys: Sequence[str],
    dialect: str = "postgres",
) -> str:
    """The server-side merge statement for one staged batch.

    ``postgres``/``sqlite`` → ``INSERT .. ON CONFLICT (keys) DO UPDATE``
    (the reference's statement, etl/load.py:36-44); anything else → ANSI
    ``MERGE``. Non-key columns update; key-only tables degrade to
    DO NOTHING (nothing to update — matches the reference's behavior for
    pure-key dims).
    """
    cols = ", ".join(_q(c) for c in columns)
    keycols = ", ".join(_q(k) for k in keys)
    nonkey = [c for c in columns if c not in keys]
    if dialect in ("postgres", "postgresql", "sqlite"):
        if nonkey:
            sets = ", ".join(f"{_q(c)} = EXCLUDED.{_q(c)}" for c in nonkey)
            action = f"DO UPDATE SET {sets}"
        else:
            action = "DO NOTHING"
        # WHERE true disambiguates the upsert clause from a join for
        # sqlite's parser; postgres accepts it unchanged
        return (
            f"INSERT INTO {_q(table)} ({cols}) "
            f"SELECT {cols} FROM {_q(staging)} WHERE true "
            f"ON CONFLICT ({keycols}) {action}"
        )
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in columns)
    merge = (
        f"MERGE INTO {_q(table)} t USING {_q(staging)} s ON ({on}) "
    )
    if nonkey:
        sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in nonkey)
        merge += f"WHEN MATCHED THEN UPDATE SET {sets} "
    merge += f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals})"
    return merge


def _default_writer(df: DataFrame, url: str, table: str, options: dict) -> None:
    df.write.mode("overwrite").options(**options).jdbc(url, table)


def _default_statement_runner(df: DataFrame, url: str, options: dict):
    """Run statements over one JVM DriverManager connection (no Python
    DB driver needed — the JDBC jar serving the staging write serves
    this too)."""

    def run(*statements: str) -> None:
        jvm = df.sparkSession._jvm
        props = jvm.java.util.Properties()
        for k, v in options.items():
            props.setProperty(k, str(v))
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            st = conn.createStatement()
            for sql in statements:
                st.execute(sql)
            st.close()
        finally:
            conn.close()

    return run


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    dialect: str = "postgres",
    staging_table: str | None = None,
    options: dict | None = None,
    writer: Callable[[DataFrame, str, str, dict], None] | None = None,
    statement_runner: Callable[..., None] | None = None,
) -> str:
    """L2 over JDBC: stage the batch in parallel, merge it set-based.

    Returns the merge SQL it executed (for logging/auditing). The staging
    table is dropped afterwards; re-running the same batch is a no-op on
    the target (ON CONFLICT/MERGE idempotency — the reference's re-run
    guarantee, etl/load.py:45-48).
    """
    staging = staging_table or f"{table}_staging"
    opts = dict(options or {})
    write = writer or _default_writer
    write(df, url, staging, opts)

    run = statement_runner or _default_statement_runner(df, url, opts)
    merge_sql = build_upsert_sql(table, staging, df.columns, keys, dialect)
    run(merge_sql, f"DROP TABLE {_q(staging)}")
    return merge_sql
