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

import warnings

from pyspark.sql import DataFrame

_ATTR = "_sparkgraft_owned_caches"


def attach_owned(df: DataFrame, owned: list[DataFrame]) -> DataFrame:
    """Record inline-persisted frames on ``df`` for
    `release_owned_caches`. ALWAYS stamps the attribute — even with
    nothing to own — so a builder result is distinguishable from a
    derived frame: ``release_owned_caches`` on an unstamped object is
    the misuse the round-9 ADVICE flagged (the caches stay pinned
    silently), and the stamp is what lets it warn instead."""
    setattr(df, _ATTR, list(owned))
    return df


def has_owned_caches(df: DataFrame) -> bool:
    """True iff ``df`` is a builder result still carrying unreleased
    owned caches — the assertable form of "the handle survived".
    False both after release and on a derived/non-builder frame
    (use `release_owned_caches`'s None return to tell those apart)."""
    return bool(getattr(df, _ATTR, None))


def release_owned_caches(df: DataFrame) -> int | None:
    """Unpersist every cached frame a builder attached to ``df``;
    returns the number released (0 when the builder attached nothing,
    or on an idempotent re-release). Returns ``None`` — with a
    warning — when ``df`` carries no attachment attribute AT ALL,
    which means it is not the object a builder returned.

    CALL THIS ON THE OBJECT THE BUILDER RETURNED, not on a frame
    derived from it: every DataFrame transformation
    (``.filter``/``.select``/``.cache``/...) returns a NEW Python
    object without the attachment attribute, so
    ``release_owned_caches(pairs.filter(...))`` releases nothing and
    the builder's caches stay pinned. Pre-round-10 that miss was
    silent (0 is also the legitimate "nothing was attached" result);
    builder results are now always stamped, so the derived-frame case
    is detectable and warned. The per-cycle pattern is::

        pairs = minhash_incremental_pairs(...)   # hold THIS object
        strong = pairs.filter(F.col("jaccard") > 0.8)
        ...consume strong...
        release_owned_caches(pairs)              # release via it
    """
    owned = getattr(df, _ATTR, None)
    if owned is None:
        warnings.warn(
            "release_owned_caches: this DataFrame carries no owned-cache "
            "handle — it is a derived frame (.filter/.select/... returns "
            "a new object) or not a builder result. Call it on the exact "
            "object the builder returned; any caches it owns are still "
            "pinned.",
            stacklevel=2,
        )
        return None
    for frame in owned:
        frame.unpersist()
    if owned:
        setattr(df, _ATTR, [])
    return len(owned)
