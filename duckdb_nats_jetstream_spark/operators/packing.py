"""Token-budget sequence packing for training-data pipelines (north-star
surface — beyond the reference): group documents into training sequences
("bins") so each sequence's token total stays within a context budget.

Greedy first-fit packing over a document ordering is inherently
sequential — a global scan carrying (current bin, fill) state. The 100 TB
shape is **chunk-parallel greedy**: split the corpus into fixed id-range
chunks, pack greedily *within* each chunk independently (one Arrow-batched
``applyInPandas`` task per chunk, no cross-chunk coordination), and make
bin ids globally unique as ``chunk * chunk_size + bin``. The cost is at
most one underfull trailing bin per chunk — bounded waste of
``n_chunks / n_bins``, negligible for chunk sizes in the thousands — in
exchange for embarrassingly parallel execution and determinism under any
partitioning.

Everything about the result depends only on (id, n_tokens, budget,
chunk_size): no RNG, no partition-order sensitivity, so a recursive-CTE
oracle can replay the identical greedy recurrence row by row.

The greedy rule (first row of a chunk starts bin 0; a document that alone
exceeds the budget still occupies one bin):

    fill + n > budget  →  open next bin with fill = n
    else               →  fill += n
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    chunk_size: int = 100,
) -> DataFrame:
    """Chunk-parallel greedy packing; returns one row per input row with
    ``(id_col, size_col, seq_id)`` where ``seq_id`` is the globally unique
    training-sequence id.

    Assumes dense-ish integer ids (chunk = ``id // chunk_size``) — the
    natural shape for a corpus with assigned sequence numbers. For
    arbitrary ids, derive a dense rank first.
    """
    import pandas as pd

    def pack_chunk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        if len(pdf) > chunk_size:
            # duplicate ids (an upstream join fan-out) would push bin ids
            # past chunk_size, colliding seq_ids with the NEXT chunk and
            # silently packing unrelated documents over budget — fail loud
            raise ValueError(
                f"pack_sequences: chunk {int(pdf['__chunk'].iloc[0])} has "
                f"{len(pdf)} rows > chunk_size={chunk_size}; ids must be "
                "unique (derive a dense rank first)"
            )
        bins = []
        bin_id, fill = 0, 0
        for i, n in enumerate(pdf[size_col]):
            # a NULL token count arrives as NaN and int(NaN) would kill
            # the task (the streaming null-ts crash class, r10 review).
            # Semantics: an unknown-size document is zero-width — it packs
            # into the current bin, contributes nothing to the fill, and
            # keeps its row (its stored size stays NULL in the output).
            w = 0 if pd.isna(n) else int(n)
            if i == 0:
                fill = w
            elif fill + w > budget:
                bin_id += 1
                fill = w
            else:
                fill += w
            bins.append(bin_id)
        pdf["seq_id"] = pdf["__chunk"] * chunk_size + pd.Series(bins)
        return pdf[[id_col, size_col, "seq_id"]]

    chunked = df.select(
        F.col(id_col),
        F.col(size_col).cast("long").alias(size_col),
        F.floor(F.col(id_col) / chunk_size).cast("long").alias("__chunk"),
    )
    schema = f"{id_col} long, {size_col} long, seq_id long"
    return chunked.groupBy("__chunk").applyInPandas(pack_chunk, schema=schema)
