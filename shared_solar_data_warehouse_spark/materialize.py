"""Session-scoped memoization of materialized intermediate tables.

Several registry operators consume the SAME derived table — the 3-word
shingle sets feed `dedup_near_shingle`, `dedup_near_minhash`,
`dedup_cluster` and `dedup_keep_canonical`; the exact near-dup pair list
feeds the latter two; the packed simhash signatures feed banding AND
verification.  In a production pipeline these are ETL artifacts: you
compute the signature/pair table ONCE per corpus snapshot and every
downstream job reads the materialized result (SURVEY.md §7.4 — at
100 TB this is a parquet table written by a signature job, not a
recompute per query).

`memo_checkpoint` is the local-mode twin of that design: the first
builder call materializes via ``localCheckpoint(eager=True)`` (a hard
barrier that also defeats Catalyst projection-collapse recompute,
SURVEY.md §5.4) and the checkpointed DataFrame is reused for every
later request in the same SparkContext.  Keyed by the context's
``applicationId`` so a cached plan can never leak across sessions
(checkpoint blocks die with their context).

Memory envelope: the cached tables are O(corpus row count) narrow rows
(5 000 docs at sf0.1) — negligible next to executor memory; a bounded
FIFO keeps the map from growing without limit if many sf_dirs are
cycled through one long-lived session.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_MAX_ENTRIES = 32

_cache: OrderedDict[tuple, DataFrame] = OrderedDict()

#: Wall-clock seconds spent building each memoized artifact, keyed by
#: the public part of the memo key (without applicationId).  Read by
#: bench.py to emit the `memo_cold` record (VERDICT r11 item 7): the
#: per-query bench rows measure the memo-warm steady state, so the
#: amortized one-per-snapshot ETL build cost must be on the record
#: separately instead of silently absent.
BUILD_SECONDS: dict[str, float] = {}


def memo_checkpoint(
    spark: SparkSession,
    key: tuple,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return a localCheckpoint-materialized DataFrame for ``key``,
    building it at most once per SparkContext.

    ``key`` must capture every input that determines the result
    (sf_dir, thresholds, signature layout...).  ``build`` returns the
    *unmaterialized* plan; this function owns the checkpoint call.
    """
    full_key = (spark.sparkContext.applicationId, *key)
    hit = _cache.get(full_key)
    if hit is not None:
        _cache.move_to_end(full_key)
        return hit
    import time

    started = time.time()
    df = build().localCheckpoint(eager=True)
    BUILD_SECONDS["/".join(str(p) for p in key)] = round(
        time.time() - started, 3
    )
    _cache[full_key] = df
    while len(_cache) > _MAX_ENTRIES:
        _cache.popitem(last=False)
    return df
