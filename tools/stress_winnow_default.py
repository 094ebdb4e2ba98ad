"""Re-measure `winnow_pairs` DEFAULT path at the 10× replica (r08 verdict
ask #1 "Done" condition).

r08 measured the then-default UNCAPPED form at exponent 1.90 / 9.7 GB
shuffle / 34 GB peak task memory on the 10× adversarial replica (every doc
has 9 near-copies, so hot fingerprints explode quadratically), while the
df_cap=40 twin stayed flat. r09 made `df_cap=DEFAULT_WINNOW_DF_CAP` (256)
the default; this script measures exactly what a user now gets by calling
`winnow_pairs(docs, min_shared=30)` with NO cap argument, at 1× and 10×,
with the same UI-REST stage accounting as `tools/stress_scale.py` —
the evidence that the shipped default is memory-bounded at scale.

Run:  python tools/stress_winnow_default.py   → paste table into SCALING.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402
from tools.stress_scale import (  # noqa: E402 — same replica + metrics
    SRC_DIR,
    STRESS_DIR,
    UI_PORT,
    _stages,
    build_scaled_documents,
)


def run_default_winnow(spark, sf_dir: str) -> dict:
    from duckdb_nats_jetstream_spark.operators.dedup import winnow_pairs
    from duckdb_nats_jetstream_spark.tables import read_table

    docs = read_table(spark, sf_dir, "documents")
    before = set(_stages())
    t0 = time.perf_counter()
    # default-arg call — THE user-facing path under measurement; df_cap
    # intentionally not passed
    winnow_pairs(docs, min_shared=30).write.mode("overwrite").format(
        "noop"
    ).save()
    wall = time.perf_counter() - t0
    after = _stages()
    new = [v for k, v in after.items() if k not in before]
    return {
        "wall_s": round(wall, 2),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
        ),
        "peak_task_mem_mb": round(
            max((s.get("peakExecutionMemory", 0) for s in new), default=0)
            / 1e6,
            1,
        ),
        "n_stages": len(new),
    }


def main() -> None:
    build_scaled_documents()
    spark = _sparkui.build_session("stress-winnow-default", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_nats_jetstream_spark.tables import read_table

    read_table(spark, SRC_DIR, "documents").count()  # warm

    r1 = run_default_winnow(spark, SRC_DIR)
    r10 = run_default_winnow(spark, STRESS_DIR)
    exp = math.log10(max(r10["wall_s"], 0.01) / max(r1["wall_s"], 0.01))
    print(f"1x  {r1}", file=sys.stderr)
    print(f"10x {r10}  exponent {exp:.2f}", file=sys.stderr)
    print(
        "\n| query | sf0.1 wall | sf1.0 wall | exponent "
        "| shuffle MB 0.1→1.0 | peak task mem MB 0.1→1.0 |"
    )
    print("|---|---|---|---|---|---|")
    from duckdb_nats_jetstream_spark.operators.dedup import (
        DEFAULT_WINNOW_DF_CAP,
    )

    print(
        f"| winnow_pairs (default df_cap={DEFAULT_WINNOW_DF_CAP}) | {r1['wall_s']}s "
        f"| {r10['wall_s']}s | {round(exp, 2)} "
        f"| {r1['shuffle_write_mb']}→{r10['shuffle_write_mb']} "
        f"| {r1['peak_task_mem_mb']}→{r10['peak_task_mem_mb']} |"
    )


if __name__ == "__main__":
    main()
