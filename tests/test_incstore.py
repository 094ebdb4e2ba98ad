"""Store-backed incremental dedup must be bit-identical to the rescanning
API (same hash pipeline → same candidates → same verified flags), through
a real parquet round-trip of the store relations."""

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.dedup import incremental_near_dups
from duckdb_nats_jetstream_spark.operators.dedup import (
    build_signature_store,
    incremental_near_dups_stored,
)
from duckdb_nats_jetstream_spark.tables import read_table

from conftest import SF_DIR


def _split(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    ref = docs.filter(F.col("doc_id") % 10 != 0)
    return new, ref


def test_stored_parity_with_rescanning_api(spark, tmp_path):
    new, ref = _split(spark)
    base = incremental_near_dups(new, ref)

    sh, bands = build_signature_store(ref)
    sh.write.parquet(str(tmp_path / "sh"))
    bands.write.parquet(str(tmp_path / "bands"))
    stored = incremental_near_dups_stored(
        new,
        spark.read.parquet(str(tmp_path / "sh")),
        spark.read.parquet(str(tmp_path / "bands")),
    )

    a = {(r.doc_id, r.n_ref_dups) for r in base.collect()}
    b = {(r.doc_id, r.n_ref_dups) for r in stored.collect()}
    assert a == b and len(a) > 0


def test_store_append_only_admission(spark, tmp_path):
    """Admitting a batch = appending its store rows; the next batch sees
    the grown corpus without any rescan of earlier text."""
    new, ref = _split(spark)
    sh, bands = build_signature_store(ref)
    sh.write.parquet(str(tmp_path / "sh"))
    bands.write.parquet(str(tmp_path / "bands"))

    # admit the first batch's survivors: append their store rows
    flagged = incremental_near_dups_stored(
        new,
        spark.read.parquet(str(tmp_path / "sh")),
        spark.read.parquet(str(tmp_path / "bands")),
    )
    survivors = new.join(flagged.select("doc_id"), "doc_id", "left_anti")
    s_sh, s_bands = build_signature_store(survivors)
    s_sh.write.mode("append").parquet(str(tmp_path / "sh"))
    s_bands.write.mode("append").parquet(str(tmp_path / "bands"))

    # an exact copy of an admitted survivor must now be flagged
    probe = survivors.limit(1).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    out = incremental_near_dups_stored(
        probe,
        spark.read.parquet(str(tmp_path / "sh")),
        spark.read.parquet(str(tmp_path / "bands")),
    ).collect()
    assert len(out) == 1 and out[0].n_ref_dups >= 1
