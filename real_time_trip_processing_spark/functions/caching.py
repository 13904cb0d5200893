"""Owned-cache handles for per-call internal persists (round 9).

Several entry points persist an internal frame whose lifetime must
span construction AND consumption of the returned DataFrame (two-plus
consumers of one expensive subtree), so they cannot unpersist eagerly
— but they are also per-ingest-cycle / per-corpus calls, and without
a handle every cycle in a long-lived session pins another cached
frame releasable only by a blanket ``spark.catalog.clearCache()``
(the round-8/9 ADVICE class, first hit by `minhash_incremental_pairs`
and by the pack ledger). The convention:

- the builder attaches its inline-persisted frames to the RESULT via
  `attach_owned` (a plain Python attribute — alive exactly as long as
  the caller holds the result object, which is the window the caches
  must survive);
- the caller releases them with `release_owned_caches(result)` once
  the cycle's output is consumed;
- frames the CALLER supplied are never attached — their lifecycle
  stays caller-owned (the `corpus_hash_index` rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_sparkgraft_owned_caches"


def attach_owned(df: DataFrame, owned: list[DataFrame]) -> DataFrame:
    """Record inline-persisted frames on ``df`` for
    `release_owned_caches`."""
    if owned:
        setattr(df, _ATTR, owned)
    return df


def release_owned_caches(df: DataFrame) -> int:
    """Unpersist every cached frame a builder attached to ``df``;
    returns the number released. Idempotent; a frame the caller
    supplied to the builder is never attached, so it is never touched
    here.

    CALL THIS ON THE OBJECT THE BUILDER RETURNED, not on a frame
    derived from it: every DataFrame transformation
    (``.filter``/``.select``/``.cache``/...) returns a NEW Python
    object without the attachment attribute, so
    ``release_owned_caches(pairs.filter(...))`` finds nothing,
    returns 0, and the builder's caches stay pinned — 0 is also the
    legitimate "nothing was attached" result, so the miss is silent.
    The per-cycle pattern is::

        pairs = minhash_incremental_pairs(...)   # hold THIS object
        strong = pairs.filter(F.col("jaccard") > 0.8)
        ...consume strong...
        release_owned_caches(pairs)              # release via it
    """
    owned = getattr(df, _ATTR, None) or []
    for frame in owned:
        frame.unpersist()
    if owned:
        setattr(df, _ATTR, [])
    return len(owned)
