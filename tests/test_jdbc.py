"""JDBC sink: merge-SQL construction and real upsert semantics, executed
against TWO live SQL engines standing in for the warehouse — stdlib
sqlite3 and DuckDB (whose parser/executor is Postgres-flavored, so the
postgres dialect's generated statements run verbatim). No JDBC jar
needed — the writer/statement transports are injected, but every merge
statement the operator generates is genuinely parsed and executed."""

from __future__ import annotations

import sqlite3

import duckdb

from data_pipeline_who_gho_spark.operators.jdbc import build_upsert_sql, upsert_jdbc


def test_postgres_upsert_sql_shape():
    sql = build_upsert_sql(
        "fact_observation", "fact_observation_staging",
        ["observation_id", "indicator_code", "numeric_value"],
        ["observation_id"],
    )
    assert sql == (
        'INSERT INTO "fact_observation" '
        '("observation_id", "indicator_code", "numeric_value") '
        'SELECT "observation_id", "indicator_code", "numeric_value" '
        'FROM "fact_observation_staging" WHERE true '
        'ON CONFLICT ("observation_id") DO UPDATE SET '
        '"indicator_code" = EXCLUDED."indicator_code", '
        '"numeric_value" = EXCLUDED."numeric_value"'
    )


def test_key_only_table_does_nothing_on_conflict():
    sql = build_upsert_sql("dim", "dim_staging", ["code"], ["code"])
    assert sql.endswith('ON CONFLICT ("code") DO NOTHING')


def test_ansi_merge_dialect():
    sql = build_upsert_sql("t", "s", ["k", "v"], ["k"], dialect="ansi")
    assert sql.startswith('MERGE INTO "t" t USING "s" s ON (t."k" = s."k")')
    assert 'WHEN MATCHED THEN UPDATE SET t."v" = s."v"' in sql
    assert 'WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")' in sql


def _sqlite_effects(con):
    """writer + statement_runner implemented on an sqlite3 connection."""

    def writer(df, url, staging, options):
        cols = df.columns
        collist = ", ".join(f'"{c}"' for c in cols)
        con.execute(f'DROP TABLE IF EXISTS "{staging}"')
        con.execute(f'CREATE TABLE "{staging}" ({collist})')
        ph = ", ".join("?" for _ in cols)
        con.executemany(
            f'INSERT INTO "{staging}" ({collist}) VALUES ({ph})',
            [tuple(r[c] for c in cols) for r in df.collect()],
        )

    def runner(*statements):
        for sql in statements:
            con.execute(sql)

    return writer, runner


def test_upsert_jdbc_updates_win_and_rerun_is_noop(spark):
    con = sqlite3.connect(":memory:")
    con.execute('CREATE TABLE "tgt" ("k" TEXT, "v" REAL, UNIQUE ("k"))')
    con.execute("INSERT INTO tgt VALUES ('a', 1.0), ('b', 2.0)")
    writer, runner = _sqlite_effects(con)

    batch = spark.createDataFrame([("b", 20.0), ("c", 3.0)], "k STRING, v DOUBLE")
    sql = upsert_jdbc(
        batch, "jdbc:sqlite::memory:", "tgt", ["k"], dialect="sqlite",
        writer=writer, statement_runner=runner,
    )
    assert "ON CONFLICT" in sql

    def snapshot():
        return sorted(con.execute("SELECT k, v FROM tgt").fetchall())

    assert snapshot() == [("a", 1.0), ("b", 20.0), ("c", 3.0)]
    # staging table dropped after the merge
    left = con.execute(
        "SELECT name FROM sqlite_master WHERE name = 'tgt_staging'"
    ).fetchall()
    assert left == []

    # replaying the identical batch is a no-op (reference etl/load.py:45-48)
    upsert_jdbc(
        batch, "jdbc:sqlite::memory:", "tgt", ["k"], dialect="sqlite",
        writer=writer, statement_runner=runner,
    )
    assert snapshot() == [("a", 1.0), ("b", 20.0), ("c", 3.0)]


def _duckdb_effects(con):
    """writer + statement_runner on a DuckDB connection: the staging
    write materializes the Spark batch through Arrow, and the runner
    hands the operator's generated SQL to DuckDB verbatim — a live
    dialect check for the postgres-flavored merge statement."""

    def writer(df, url, staging, options):
        pdf = df.toPandas()
        con.register("__batch", pdf)
        con.sql(f'DROP TABLE IF EXISTS "{staging}"')
        con.sql(f'CREATE TABLE "{staging}" AS SELECT * FROM __batch')
        con.unregister("__batch")

    def runner(*statements):
        for sql in statements:
            con.sql(sql)

    return writer, runner


def test_upsert_postgres_dialect_executes_on_duckdb(spark):
    """The postgres-dialect INSERT .. ON CONFLICT DO UPDATE statement —
    the reference's exact load statement (etl/load.py:36-44) — must
    parse and execute end-to-end on a live engine, with updates winning
    on shared keys, inserts elsewhere, and idempotent replay."""
    con = duckdb.connect()
    con.sql(
        'CREATE TABLE "fact" ("obs_id" BIGINT PRIMARY KEY, '
        '"indicator" VARCHAR, "value" DOUBLE)'
    )
    con.sql("INSERT INTO fact VALUES (1, 'WHS', 10.0), (2, 'MDG', 20.0)")
    writer, runner = _duckdb_effects(con)

    batch = spark.createDataFrame(
        [(2, "MDG", 99.0), (3, "SDG", 30.0)],
        "obs_id LONG, indicator STRING, value DOUBLE",
    )
    sql = upsert_jdbc(
        batch, "jdbc:duckdb:", "fact", ["obs_id"], dialect="postgres",
        writer=writer, statement_runner=runner,
    )
    assert "ON CONFLICT" in sql and "EXCLUDED" in sql

    def snapshot():
        return sorted(con.sql("SELECT obs_id, indicator, value FROM fact").fetchall())

    assert snapshot() == [(1, "WHS", 10.0), (2, "MDG", 99.0), (3, "SDG", 30.0)]
    # staging table dropped by the operator's own DROP statement
    assert con.sql(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_name = 'fact_staging'"
    ).fetchall() == []

    # idempotent replay on a real engine
    upsert_jdbc(
        batch, "jdbc:duckdb:", "fact", ["obs_id"], dialect="postgres",
        writer=writer, statement_runner=runner,
    )
    assert snapshot() == [(1, "WHS", 10.0), (2, "MDG", 99.0), (3, "SDG", 30.0)]


def test_upsert_key_only_do_nothing_executes_on_duckdb(spark):
    """The key-only degenerate (DO NOTHING) must also run end-to-end."""
    con = duckdb.connect()
    con.sql('CREATE TABLE "dim" ("code" VARCHAR PRIMARY KEY)')
    con.sql("INSERT INTO dim VALUES ('AFG'), ('ALB')")
    writer, runner = _duckdb_effects(con)

    batch = spark.createDataFrame([("ALB",), ("DZA",)], "code STRING")
    sql = upsert_jdbc(
        batch, "jdbc:duckdb:", "dim", ["code"], dialect="postgres",
        writer=writer, statement_runner=runner,
    )
    assert sql.endswith("DO NOTHING")
    assert sorted(con.sql("SELECT code FROM dim").fetchall()) == [
        ("AFG",), ("ALB",), ("DZA",),
    ]
