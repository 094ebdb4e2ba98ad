"""Training-data pipeline operators (the north-star surface): deduplication,
similarity search, and text analysis over ``documents`` / ``embeddings``.

Filled in incrementally; every entry gets a DuckDB oracle where the semantics
are SQL-expressible (deterministic md5-based hashing keeps both engines
bit-identical), rows-only otherwise.
"""

from __future__ import annotations

QUERIES: dict = {}
