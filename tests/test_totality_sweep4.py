"""Regression pins for the fourth r10 review sweep (sinks, file formats,
scalar functions, winsorize, imagecodec): NULL totality at capability
boundaries, deterministic shuffle keys, per-session conf scoping."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import Row, functions as F


# --- udx: NULL money ----------------------------------------------------------


def test_cents_null_money_stays_null(spark):
    """np.rint(NaN).astype(int64) yields INT64_MIN — a NULL dollar must
    surface as a NULL cent value, never a garbage sentinel."""
    from duckdb_nats_jetstream_spark.functions.udx import cents

    df = spark.createDataFrame(
        [Row(i=0, d=1.25), Row(i=1, d=None), Row(i=2, d=0.10)],
        "i long, d double",
    )
    got = {r.i: r.c for r in df.select("i", cents("d").alias("c")).collect()}
    assert got == {0: 125, 1: None, 2: 10}


def test_cents_sum_sql_semantics_on_nulls(spark):
    """SQL SUM: NULLs skipped; an all-NULL group sums to NULL."""
    from duckdb_nats_jetstream_spark.functions.udx import cents_sum

    df = spark.createDataFrame(
        [("a", 1.25), ("a", None), ("a", 0.25), ("b", None)],
        "g string, d double",
    )
    got = {
        r.g: r.s
        for r in df.groupBy("g").agg(cents_sum("d").alias("s")).collect()
    }
    assert got == {"a": 150, "b": None}


# --- text: 0/0 ratio totality --------------------------------------------------


def test_dup_ngram_fraction_short_doc_is_null_not_crash(spark):
    """A doc shorter than n tokens has zero n-gram positions: 0/0 is NULL
    in the DuckDB mirror and must not DIVIDE_BY_ZERO under default ANSI."""
    from duckdb_nats_jetstream_spark.functions import text as TX

    df = spark.createDataFrame([Row(t="one"), Row(t="a b c d")])
    out = df.select(
        TX.dup_ngram_fraction(TX.tokens(F.col("t")), 3).alias("r")
    ).collect()
    vals = [r.r for r in out]
    assert None in vals  # the 1-token doc
    assert 0.0 in vals  # the 4-token doc has 2 distinct 3-grams, no repeats


def test_jaccard_both_empty_is_null(spark):
    from duckdb_nats_jetstream_spark.functions.text import jaccard

    df = spark.createDataFrame([Row(a=[], b=[])], "a array<string>, b array<string>")
    assert df.select(jaccard(F.col("a"), F.col("b")).alias("j")).collect()[0].j is None


def test_text_ratio_nulls_match_duckdb(spark):
    """The 0/0 arms agree with DuckDB NULL-for-NULL on short docs."""
    import duckdb

    from duckdb_nats_jetstream_spark.functions import text as TX

    texts = ["one", "x y", "a b c d a b c"]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        r.doc_id: r.r
        for r in df.select(
            "doc_id", TX.dup_ngram_fraction(TX.tokens(F.col("text")), 3).alias("r")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(enumerate(texts)))
    sql = TX.sql_dup_ngram_fraction(TX.sql_tokens("text"), 3)
    want = dict(con.execute(f"SELECT doc_id, {sql} FROM docs").fetchall())
    assert got == want


# --- winsorize: _clipped totality ----------------------------------------------


def test_winsorize_clipped_flag_is_total(spark):
    from duckdb_nats_jetstream_spark.operators.winsorize import winsorize

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 21)] + [("a", None)],
        "k string, v double",
    )
    out = winsorize(df, "v", ["k"], lower=0.05, upper=0.95).collect()
    flags = {r.v: r._clipped for r in out}
    assert flags[None] == 0  # NULL value: present, not clipped, never NULL
    assert set(flags.values()) <= {0, 1}


# --- sinks: per-session pin, deterministic salt, ANN totality -------------------


def test_prunable_timestamps_is_per_session(spark):
    """A cloned session (the foreachBatch shape) must get its OWN pin even
    while another session holds one — and restores must not cross."""
    from duckdb_nats_jetstream_spark.sinks import _TS_CONF, _prunable_timestamps

    clone = spark.newSession()
    spark.conf.set(_TS_CONF, "INT96")
    clone.conf.set(_TS_CONF, "INT96")
    with _prunable_timestamps(spark):
        assert spark.conf.get(_TS_CONF) == "TIMESTAMP_MICROS"
        # the clone is NOT covered by the main session's pin…
        assert clone.conf.get(_TS_CONF) == "INT96"
        with _prunable_timestamps(clone):
            # …it pins itself
            assert clone.conf.get(_TS_CONF) == "TIMESTAMP_MICROS"
        assert clone.conf.get(_TS_CONF) == "INT96"
        assert spark.conf.get(_TS_CONF) == "TIMESTAMP_MICROS"
    assert spark.conf.get(_TS_CONF) == "INT96"
    spark.conf.unset(_TS_CONF)
    clone.conf.unset(_TS_CONF)


def test_partitioned_write_salt_is_deterministic(spark, tmp_path):
    """The fan-out salt must be a content hash, not rand(): a
    nondeterministic shuffle key loses/duplicates rows on task retry."""
    from duckdb_nats_jetstream_spark.sinks import write_partitioned_parquet

    df = spark.range(200).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("v")
    )
    out = str(tmp_path / "salted_det")
    write_partitioned_parquet(df, out, ["p"], files_per_partition=3)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.select(F.sum("v")).collect()[0][0] == sum(range(200))


def test_write_ann_index_tolerates_null_and_ragged_embeddings(spark, tmp_path):
    from duckdb_nats_jetstream_spark.sinks import write_ann_index

    rows = [Row(vec_id=i, embedding=[float(i % 7), float(i % 5), 1.0, 0.5]) for i in range(40)]
    rows += [Row(vec_id=100, embedding=None), Row(vec_id=101, embedding=[1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ann_null")
    cents_ = write_ann_index(df, path, n_clusters=4, dim=4)
    assert len(cents_) == 4
    back = spark.read.parquet(path)
    ids = {r.vec_id for r in back.select("vec_id").collect()}
    assert ids == set(range(40))  # null/ragged rows excluded, not fatal


# --- file formats: quarantine contract ------------------------------------------


def test_read_csv_inferred_schema_still_quarantines(spark, tmp_path):
    from duckdb_nats_jetstream_spark.sources.file_formats import CORRUPT_COL, read_csv

    p = tmp_path / "m.csv"
    p.write_text("a,b\n1,2\n3,4\n")
    df = read_csv(spark, str(p))  # schema=None → inferred
    assert CORRUPT_COL in df.columns
    assert df.count() == 2


def test_with_corrupt_col_uses_parsed_names_not_substrings(spark):
    from duckdb_nats_jetstream_spark.sources.file_formats import (
        CORRUPT_COL,
        _with_corrupt_col,
    )

    ddl = "id int, my_corrupt_record_flag boolean"
    out = _with_corrupt_col(ddl, "PERMISSIVE")
    assert CORRUPT_COL in out.split(",")[-1]  # the real column was appended


# --- imagecodec: ValueError boundary --------------------------------------------


def test_png_decode_truncated_input_raises_valueerror():
    from duckdb_nats_jetstream_spark.functions.imagecodec import (
        png_decode,
        png_encode,
    )
    import numpy as np

    good = png_encode(np.zeros((4, 4, 3), dtype=np.uint8))
    # corrupt the IDAT payload: deflate stream no longer valid
    bad = bytearray(good)
    idat = good.find(b"IDAT")
    bad[idat + 6] ^= 0xFF
    with pytest.raises(ValueError):
        png_decode(bytes(bad))
    # short IHDR chunk
    hdr = bytearray(good)
    hdr[3 + 8 : 4 + 8] = b""  # shrink declared IHDR length path via direct call
    import struct

    broken = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 5)
        + b"IHDR"
        + b"12345"
        + struct.pack(">I", zlib.crc32(b"IHDR" + b"12345") & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(broken)
