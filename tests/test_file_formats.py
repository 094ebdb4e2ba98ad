"""CSV/JSONL side-table ingest: schema discipline + corrupt-row routing."""

from duckdb_nats_jetstream_spark.sources.file_formats import (
    CORRUPT_COL,
    read_csv,
    read_json,
    read_orc,
    write_orc,
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


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", None)], "id long, name string, score double"
    )
    path = str(tmp_path / "t.orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_scan_prunes_and_pushes_down(spark, tmp_path):
    path = str(tmp_path / "t.orc")
    write_orc(
        spark.range(1000).selectExpr("id", "id * 2 AS v", "CAST(id AS STRING) AS s"),
        path,
    )
    plan = (
        read_orc(spark, path)
        .filter("id > 990")
        .select("id", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,990)]" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "id:bigint" in read_schema and "s:string" not in read_schema


def test_csv_failfast_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\nnot_a_number,b\n")
    df = read_csv(spark, str(p), schema="id long, name string", mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
