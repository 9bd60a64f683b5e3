"""Round-11 file-format ingestion queries (plans/curation18.py):
messy-CSV scan + reject split, multiline CSV, ORC round-trip."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_who_gho_spark.session import get_spark

    return get_spark(app_name="test-curation18")


def _oracle(sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_csv_scan_stats_matches_oracle(spark):
    """Spark's real CSV parser over RFC 4180 records with embedded
    commas and doubled-quote escapes: every good row's quoted payload
    must round-trip byte-exactly (md5 parity), every corrupt row must
    be excluded."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_SCAN_STATS_SQL,
        csv_scan_stats,
    )

    got = sorted(tuple(r) for r in csv_scan_stats(spark, SF).collect())
    assert got == _oracle(CSV_SCAN_STATS_SQL)
    assert len(got) > 400
    assert all(d % 13 != 5 for d, _, _ in got)  # corrupt rows excluded


def test_csv_reject_split_matches_oracle(spark):
    """The V2 reject posture on a file scan: corrupt rows land in
    _corrupt_record carrying the COMPLETE raw line (md5-pinned), with
    the id re-extracted for quarantine diagnostics."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_REJECT_SPLIT_SQL,
        csv_reject_split,
    )

    got = sorted(tuple(r) for r in csv_reject_split(spark, SF).collect())
    assert got == _oracle(CSV_REJECT_SPLIT_SQL)
    assert got and all(d % 13 == 5 for d, _, _ in got)


def test_csv_multiline_stats_matches_oracle(spark):
    """Quoted fields spanning physical lines (multiLine=true): the
    embedded newlines must survive the parse exactly."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        CSV_MULTILINE_STATS_SQL,
        csv_multiline_stats,
    )

    got = sorted(
        tuple(r) for r in csv_multiline_stats(spark, SF).collect()
    )
    assert got == _oracle(CSV_MULTILINE_STATS_SQL)
    assert all(n >= 3 for _, n, _ in got)  # payload genuinely multi-line


def test_orc_roundtrip_matches_oracle_and_pushes_down(spark):
    """ORC write/read round-trip; the filter must reach the ORC scan
    (PushedFilters) and the projection must prune to the 3 referenced
    columns — same plan discipline as the parquet tests."""
    from data_pipeline_who_gho_spark.plans.curation18 import (
        ORC_ROUNDTRIP_STATS_SQL,
        orc_roundtrip_stats,
    )

    df = orc_roundtrip_stats(spark, SF)
    got = sorted(tuple(r) for r in df.collect())
    assert got == _oracle(ORC_ROUNDTRIP_STATS_SQL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "n_chars" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan's ReadSchema must not include text/source
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema and "source" not in read_schema


def test_csv_parser_handles_pathological_fields(spark):
    """Direct parser-semantics pin on constructed lines: leading/
    trailing quotes, doubled quotes at field edges, commas everywhere,
    and a too-many-fields row rejected (not silently truncated)."""
    import os
    import tempfile

    from data_pipeline_who_gho_spark.plans.curation18 import _read_csv

    d = tempfile.mkdtemp(prefix="csv-patho-")
    lines = [
        '1,en,"a,b,""c"",d"',        # quotes + commas inside
        '2,de,""""',                  # field that IS one quote char
        '3,fr,",starts,with,comma"',
        "4,es,unquoted plain",
        '5,zh,"x","extra-field"',     # too many fields -> corrupt
        "notanum,en,\"y\"",           # bad id -> corrupt
    ]
    with open(os.path.join(d, "part-0.csv"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    rows = {
        r["doc_id"]: r
        for r in _read_csv(spark, d, multiline=False).collect()
        if r["_corrupt_record"] is None
    }
    assert rows[1]["payload"] == 'a,b,"c",d'
    assert rows[2]["payload"] == '"'
    assert rows[3]["payload"] == ",starts,with,comma"
    assert rows[4]["payload"] == "unquoted plain"
    corrupt = [
        r["_corrupt_record"]
        for r in _read_csv(spark, d, multiline=False).collect()
        if r["_corrupt_record"] is not None
    ]
    assert sorted(corrupt) == sorted([lines[4], lines[5]])
