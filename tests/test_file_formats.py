"""CSV/JSONL side-table ingest: schema discipline + corrupt-row routing."""

from duckdb_nats_jetstream_spark.sources.file_formats import (
    CORRUPT_COL,
    read_csv,
    read_json,
)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    df = read_csv(spark, str(p), schema="id long, name string, score double")
    rows = sorted((r.id, r.name, r.score) for r in df.drop(CORRUPT_COL).collect())
    assert rows == [(1, "alpha", 1.5), (2, "beta", 2.5)]


def test_jsonl_corrupt_rows_are_quarantinable(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n{not json at all}\n{"id": 2, "name": "ok2"}\n')
    # Spark disallows querying ONLY the corrupt column off a raw file scan;
    # materialize the parse once (what a quarantine pipeline does anyway)
    df = read_json(spark, str(p), schema="id long, name string").cache()
    try:
        good = df.filter(df[CORRUPT_COL].isNull())
        bad = df.filter(df[CORRUPT_COL].isNotNull())
        assert sorted(r.id for r in good.collect()) == [1, 2]
        assert bad.count() == 1
    finally:
        df.unpersist()


def test_csv_failfast_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\nnot_a_number,b\n")
    df = read_csv(spark, str(p), schema="id long, name string", mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
