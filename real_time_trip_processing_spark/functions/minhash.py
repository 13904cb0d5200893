"""MinHash + banded LSH near-duplicate detection — the scale path for
X2 (SURVEY §2.12).

All deterministic, all built-in expressions, and shaped for codegen:
- shingles are exploded to (doc, hash) rows; each shingle is hashed
  ONCE (xxhash64 → top 31 bits so universal-hash arithmetic can't
  overflow under ANSI mode);
- the signature is ONE HashAggregate: ``min((a_i*(h+1)+b_i) mod
  (2^31−1))`` per permutation — 32 codegen'd min-aggregates in a
  single shuffle on doc_id (higher-order array lambdas are interpreted
  in Spark, an order of magnitude slower for the same arithmetic); the
  mod-Mersenne reduction is what makes the permutations independent,
  and the +1 / mod-(M−1) class domain keeps every class distinct and
  nonzero mod the prime (see MERSENNE_31);
- LSH banding hashes groups of signature columns; docs sharing any
  (band, band_hash) bucket become candidate pairs — the pair space is
  per-bucket, never O(n²);
- candidates are verified with exact Jaccard over the collected hashed
  shingle sets, so the output has no false positives (modulo 64-bit
  hash collisions); only LSH's false-negative risk remains, tunable
  via num_perm/bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .caching import attach_owned as _attach_owned
from .caching import release_owned_caches  # noqa: F401  (re-export)
from .text import shingle_rows


#: Mersenne prime 2^31 − 1: the universal-hash modulus. REQUIRED for
#: the permutations to be permutations at all — without a modulus,
#: a·h+b is monotonically INCREASING in h (a > 0), so every
#: "permutation" shares one argmin (the globally smallest shingle
#: hash) and all num_perm signature slots collapse to functions of
#: that single value: banded LSH degenerates to ONE-permutation
#: MinHash (two docs match on ALL bands or NONE, candidate recall =
#: plain jaccard instead of the banded S-curve 1−(1−j^r)^b). The
#: round-8 regression test pins non-degeneracy on a fixed near-dup
#: fixture. Exact verification of candidates masked this from every
#: correctness gate — the oracle replays the same formula — which is
#: why it needed a structural test, not more oracle queries.
#:
#: Shingle classes live in [1, M−1] (round 9): h is reduced mod M−1
#: and the aggregate maps h31+1 ∈ [1, M−1], so a·x+b with a ∈ [1,
#: M−1] is a genuine bijection on nonzero residues mod the prime. A
#: plain 31-bit reduction left classes 0 and 2^31−1 congruent mod M
#: (both exist mod M ≡ 0 resp. ≡ 0 + 1 class wrap): two distinct
#: shingle hashes collided under EVERY permutation, and a zero-class
#: shingle pinned a·0+b = b as a universal fixed point (ADVICE round
#: 8 — ~2^-30 per shingle, negligible in practice but structurally
#: wrong; MLlib's MinHashLSH uses the same (1+elem)·coeff guard).
#:
#: SIGNATURE-FORMAT COMPATIBILITY: the class-domain change shifts
#: EVERY signature value — a `minhash_signatures` frame or
#: `seed_minhash_index` directory persisted by the pre-round-9
#: formula is NOT comparable with signatures computed by this code
#: (band keys would almost never collide: the vs-corpus screen
#: silently collapses to zero candidates, admitting every near-dup as
#: novel). Rebuild persisted signature indexes when crossing this
#: boundary; signatures never mix formula versions.
MERSENNE_31 = (1 << 31) - 1

#: Signature-FORMULA version, stamped into every persisted signature
#: index (`streaming/dedup.seed_minhash_index` /
#: `stream_dedup_near_sink` write it to a ``_SIG_FORMAT`` marker and
#: assert it at index read — round-10 ADVICE: the silent-collapse mode
#: the paragraph above documents was otherwise LIVE, undetectable at
#: runtime). v2 = the round-9 class-domain formula (h31 ∈ [1, M−1],
#: invertible ``a``); bump this whenever a change shifts persisted
#: signature values, and rebuilding stale indexes becomes a loud
#: failed batch instead of a silent admit-everything.
MINHASH_SIG_VERSION = 2

#: class-domain modulus: h31 ∈ [0, M−2], so h31+1 ∈ [1, M−1] — every
#: class distinct and nonzero mod MERSENNE_31.
_H31_MOD = MERSENNE_31 - 1


#: deterministic 31-bit multipliers/offsets (splitmix64-derived); with
#: h reduced to 31 bits, a*h+b < 2^62 — safe under ANSI arithmetic
#: before the mod-Mersenne reduction.
def _perm_constants(num_perm: int) -> list[tuple[int, int]]:
    consts = []
    for i in range(num_perm):
        x = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
        y = (x * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        # a must be in [1, M−1] to be invertible mod the Mersenne prime;
        # the |1 form alone could emit a == M (≡ 0 — a constant
        # "permutation"). The % ... or 1 clamp is a no-op for every
        # constant the first 64 slots actually generate (verified) —
        # note this says only that the CLAMP changes nothing; the
        # round-9 class-domain change (see MERSENNE_31) DID shift every
        # signature, and persisted pre-round-9 indexes must be rebuilt.
        a = ((x & 0x7FFFFFFF) | 1) % MERSENNE_31 or 1
        consts.append((a, y & 0x7FFFFFFF))
    return consts


#: owned-cache contract (round-9 ADVICE): `minhash_lsh_pairs` /
#: `minhash_incremental_pairs` must keep inline signature frames
#: cached until the RESULT is consumed (two consumers: band rows +
#: verification), so they cannot unpersist eagerly — but the functions
#: are per-ingest-cycle entry points, and without a handle repeated
#: calls in a long-lived session accumulate cached frames the caller
#: can only clear with a blanket ``spark.catalog.clearCache()``.
#: Callers that run per cycle should::
#:
#:     pairs = minhash_incremental_pairs(batch, corpus_sigs=idx)
#:     ...consume pairs...
#:     release_owned_caches(pairs)
#:
#: Caller-supplied frames (``sigs=`` / ``corpus_sigs=``) are never
#: attached — their lifecycle stays caller-owned (the
#: corpus_hash_index rule). The streaming sink manages its own
#: persist/unpersist and doesn't need this. Shared machinery lives in
#: `functions/caching.py` (the pack ledger uses the same contract);
#: `release_owned_caches` is re-exported from this module's top
#: imports because this module introduced the contract.


def minhash_signature_agg(num_perm: int, h_col: str = "h31") -> list[Column]:
    """The per-permutation min-aggregate expressions."""
    h = F.col(h_col)
    # h31 ∈ [0, M−2] (the _H31_MOD reduction upstream) → h31+1 ∈
    # [1, M−1]: a·(h+1)+b is a bijection on nonzero residues mod the
    # prime — no pair of distinct classes is congruent under every
    # permutation and no class is a universal fixed point. Overflow-
    # safe under ANSI: a·(h+1) ≤ (2^31−1)·(2^31−1) < 2^62.
    return [
        F.min((F.lit(a) * (h + F.lit(1)) + F.lit(b)) % F.lit(MERSENNE_31)).alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(_perm_constants(num_perm))
    ]


def _fused_det_signatures(
    docs: DataFrame,
    n: int,
    num_perm: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """The det-flavor signature frame computed ENTIRELY MAP-SIDE by one
    Arrow kernel — ZERO exchanges (round 12, guide §2.4/§4.2).

    A MinHash signature is a pure per-doc function of the text, so
    nothing about it needs a shuffle: the kernel tokenizes (py_tokens —
    the JVM-exact twin), builds the doc's DISTINCT gram set, hashes each
    gram (md5 top-60-bits == ``conv(substring(md5(sh),1,15),16,10)``:
    the first 8 digest bytes big-endian >> 4), and evaluates all
    ``num_perm`` universal-hash minima in numpy. The exchange flavor
    paid a token-stream window shuffle + a (doc)-keyed HashAggregate
    exchange and evaluated md5/conv + 32 codegen'd min-aggregates per
    GRAM OCCURRENCE row; here within-doc work never leaves the map task
    and the Python boundary carries one row per doc out (sig + hs),
    never the 2.3M-row gram stream (the r11 negative result on
    ``shingle_impl="arrow"`` was about shipping gram STRINGS across the
    boundary — this ships none). Bit-identity with the exchange flavor
    is test-pinned per doc (MINHASH_SIG_VERSION unchanged; persisted
    indexes stay valid).

    Scale-adaptive spread as in ``shingle_set_rows``: a small corpus
    arrives as a one-task scan that would serialize the kernel, so
    below-defaultParallelism inputs repartition the raw doc texts; at
    scale the check is a no-op and the whole signature build is
    map-side inside the scan stage. When the spread DID fire, the
    kernel's output is shuffled back down to the input's own partition
    count: the signature frame is persisted and re-read by 3-4
    consumers in every LSH flavor, and leaving a 5k-row frame in 32
    cache partitions made every downstream stage pay 32-task fixed
    costs — measured at sf0.1 on the full self-join query: 1.40 s
    (32-part cache) → 0.98 s (narrow cache), vs 1.15 s for the r11
    exchange build it replaces. The down-shuffle moves one signature
    row per doc (the same mass the exchange build shuffled anyway) and,
    like the spread, cannot fire at scale."""
    import numpy as np
    import pandas as pd

    from .text import py_tokens

    docs = docs.filter(F.col(text_col).isNotNull())
    sc = docs.sparkSession.sparkContext
    try:
        n_in = docs.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        n_in = sc.defaultParallelism
    spread = n_in < sc.defaultParallelism
    if spread:
        docs = docs.repartition(sc.defaultParallelism)

    id_type = dict(docs.dtypes)[id_col]
    sig_cols = ", ".join(f"sig_{i} long" for i in range(num_perm))
    schema = f"doc {id_type}, {sig_cols}, hs array<long>"
    consts = _perm_constants(num_perm)
    a_vec = np.array([a for a, _ in consts], dtype=np.int64)
    b_vec = np.array([b for _, b in consts], dtype=np.int64)

    def scan(batches):
        from hashlib import md5

        for pdf in batches:
            doc_out: list = []
            hs_out: list = []
            counts: list = []
            for did, txt in zip(pdf[id_col].to_list(), pdf[text_col].to_list()):
                if txt is None:
                    continue
                toks = py_tokens(txt)
                hi = max(len(toks) - n, 0)
                # distinct h per doc: min() is duplicate-invariant and
                # hs is a collect_set, so the set IS the full state
                hset = {
                    int.from_bytes(
                        md5(" ".join(toks[i : i + n]).encode("utf-8")).digest()[:8],
                        "big",
                    )
                    >> 4
                    for i in range(hi + 1)
                }
                hv = np.fromiter(hset, dtype=np.int64, count=len(hset))
                doc_out.append(did)
                hs_out.append(hv)
                counts.append(len(hv))
            if not doc_out:
                continue
            x = np.concatenate(hs_out) % _H31_MOD + 1  # h31 + 1 ∈ [1, M−1]
            offsets = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            out = {"doc": doc_out}
            # one permutation at a time keeps peak memory at one int64
            # row over the batch's gram stream (a·x ≤ (2^31−1)² < 2^62:
            # the same ANSI-safe bound the codegen'd aggregate relies on)
            for i in range(num_perm):
                v = (a_vec[i] * x + b_vec[i]) % MERSENNE_31
                out[f"sig_{i}"] = np.minimum.reduceat(v, offsets)
            out["hs"] = hs_out
            yield pd.DataFrame(out)

    sig = docs.select(id_col, text_col).mapInPandas(scan, schema)
    if spread:
        sig = sig.repartition(max(1, n_in))
    return sig


def minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    det: bool = False,
    shingle_impl: str = "builtin",
    impl: str = "auto",
) -> DataFrame:
    """Per-doc MinHash signature frame ``(doc, sig_0..sig_{p-1}, hs)``
    — the reusable state every LSH flavor (self-join pairs, incremental
    batch-vs-corpus, streaming index) is derived from. ``hs`` is the
    distinct hashed-shingle set kept for exact-Jaccard verification of
    candidates. One shuffle on doc: the 32 min-aggregates and the
    shingle set share a single HashAggregate.

    ``det=True`` is the md5-60-bit flavor every intermediate of which
    any engine can replay (the oracle flavor); ``det=False`` is the
    cheaper xxhash64 production flavor. Signatures are a pure per-doc
    function of the text, so a signature computed at ingest time equals
    one computed in a later batch — which is what makes a PERSISTED
    signature frame a valid corpus index for `minhash_incremental_pairs`
    (the near-dup twin of `streaming/dedup.corpus_hash_index`).

    ``impl`` (round 12): "fused" computes the whole signature frame in
    ONE map-side Arrow kernel — zero exchanges, one output row per doc
    across the Python boundary (see `_fused_det_signatures`); det-only,
    because the production xxhash64 flavor's hash lives in the JVM.
    "exchange" keeps the shingle-explode + HashAggregate build (the
    Python-free cross-check, and the only shape for det=False).
    "auto" (default) picks fused for det=True, exchange otherwise.
    Both impls are bit-identical per doc (test-pinned), so persisted
    signature indexes can mix them; MINHASH_SIG_VERSION is unchanged."""
    if impl == "auto":
        impl = "fused" if det else "exchange"
    if impl == "fused":
        if not det:
            raise ValueError(
                "impl='fused' replays the md5 det hash in the kernel; "
                "the xxhash64 flavor (det=False) needs impl='exchange'"
            )
        return _fused_det_signatures(docs, n, num_perm, id_col, text_col)
    # Round-11 (guide §2.4 — remove shuffles outright): the historical
    # `dropDuplicates(["doc", "sh"])` between the shingle build and the
    # signature aggregate was semantically REDUNDANT — min() is
    # duplicate-invariant and collect_set dedups h — but not free: its
    # (doc, sh)-keyed exchange also BROKE the partitioning chain, so
    # groupBy(doc) paid a second exchange. Without it the signature
    # aggregate reuses the window flavor's doc-keyed exchange directly:
    # ONE exchange total, bit-identical signatures and hs sets
    # (duplicate postings collapse inside min/collect_set instead of in
    # a shuffle of their own). Measured at sf0.1, cache-isolated noop
    # runs of the signature build alone (det flavor, 8 steady runs):
    # 1.78 → 1.45 s median, non-overlapping spreads; the full declared
    # queries move within their spread (band join + verify dominate
    # their variance).
    #
    # ``shingle_impl`` is the scale dial (same values as
    # `shingle_rows`): "builtin" (default) keeps the all-JVM window
    # build — measured FASTER on local[32] for n=3 grams, where a
    # shuffle is a memcpy and the window has only two lead() columns;
    # "arrow" emits grams ROW-LOCALLY in the Arrow kernel, removing the
    # token-stream exchange entirely — on a real cluster that exchange
    # is the dominant network cost of the signature build (the partial
    # signature aggregate then ships ~one row per doc per map
    # partition), so 100 TB deployments should flip it. Both flavors
    # produce the same gram multiset (equivalence test-pinned) →
    # identical signatures; MINHASH_SIG_VERSION is unchanged.
    posts = shingle_rows(docs, n, id_col, text_col, impl=shingle_impl)
    if det:
        # 15 hex chars = 60 bits → always fits BIGINT; h31 by modulus
        # keeps universal-hash arithmetic under 2^62 (ANSI-safe)
        h = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
        sh_rows = posts.select("doc", h.alias("h")).withColumn(
            "h31", F.col("h") % F.lit(_H31_MOD)
        )
    else:
        sh_rows = posts.select("doc", F.xxhash64("sh").alias("h")).withColumn(
            "h31", F.shiftrightunsigned("h", 33) % F.lit(_H31_MOD)
        )
    return sh_rows.groupBy("doc").agg(
        *minhash_signature_agg(num_perm), F.collect_set("h").alias("hs")
    )


def _full_sig_key(num_perm: int, det: bool) -> Column:
    """Full-signature group key for hot-bucket star/hub construction;
    in the det flavor it is the plain signature-value string so the
    DuckDB oracle can replay hub selection (xxhash64 groups the same
    docs — equal signatures — just not portably)."""
    if det:
        return F.concat_ws(
            "|", *[F.col(f"sig_{i}").cast("string") for i in range(num_perm)]
        )
    return F.xxhash64(*[F.col(f"sig_{i}") for i in range(num_perm)]).cast("string")


def banded_rows(
    sig: DataFrame, num_perm: int, bands: int, det: bool, with_fs: bool = False
) -> DataFrame:
    """LSH band rows ``(doc[, fs], band, bh)`` from a signature frame —
    one explode over the per-band key structs."""
    rows_per_band = num_perm // bands

    def band_key(b: int):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if det:
            return F.concat_ws("|", *[c.cast("string") for c in cols])
        return F.xxhash64(*cols).cast("string")

    band_cols = [
        F.struct(F.lit(b).alias("band"), band_key(b).alias("bh"))
        for b in range(bands)
    ]
    head = ["doc"] + (
        [_full_sig_key(num_perm, det).alias("fs")] if with_fs else []
    )
    exploded = sig.select(*head, F.explode(F.array(*band_cols)).alias("bk"))
    return exploded.select(
        *(["doc", "fs"] if with_fs else ["doc"]),
        F.col("bk.band").alias("band"),
        F.col("bk.bh").alias("bh"),
    )


def _verify_jaccard(
    candidates: DataFrame, hs_a: DataFrame, hs_b: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against the hashed
    shingle sets: ``candidates(a, b)`` joined to ``hs_a(a, hs_a)`` /
    ``hs_b(b, hs_b)`` → ``(a, b, inter, jaccard ≥ threshold)``. Shared
    by the self-join and incremental flavors so the verification rule
    cannot drift between them."""
    return (
        candidates.join(hs_a, "a")
        .join(hs_b, "b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.round("jaccard", 8).alias("jaccard"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    det: bool = False,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs (a, b, inter, jaccard) via MinHash-LSH candidates
    + exact-Jaccard verification on the hashed shingle sets.

    ``sigs`` — a precomputed `minhash_signatures` frame to pair over
    instead of building one from ``docs`` (which is then ignored); its
    cache lifecycle is caller-owned. Used by the streaming sink, which
    computes each micro-batch's signatures once and reuses them for
    both the within-batch self-join and the vs-corpus screen. Without
    it, the inline signature frame is persisted and attached to the
    result — release it with `release_owned_caches(pairs)` after
    consumption (see its docstring for the per-cycle contract).

    ``det=False`` (default): xxhash64 shingle hashing + xxhash64 band
    keys — the cheapest flavor for production runs. ``det=True``: the
    shingle hash is the top 60 bits of md5 and band keys are plain
    signature-value strings — ~same plan, marginally more CPU, but
    every intermediate is reproducible in ANY engine with md5, which is
    what lets the DuckDB oracle replay the whole LSH pipeline and
    hash-match the declared query (plans/vector_queries.py).

    ``max_bucket`` — the hot-bucket dial (the LSH twin of
    `similarity.ann_join_ivf(max_bucket=...)`): the banded self-join's
    cost is Σ K² over bucket widths K. A band bucket is a group of
    docs agreeing on ``rows_per_band`` signature slots — on corpora
    with large exact/near-duplicate clusters (boilerplate-heavy
    crawls) the widest buckets ARE those clusters and grow with the
    corpus, an unbounded quadratic term. (History, SCALE.md round 8:
    the quadratic blow-up originally measured on the zipfian harness —
    426M candidates / 347 s at 2M docs — was dominated by the
    pre-round-8 DEGENERATE signatures, which bucketed docs by their
    single smallest shingle hash so common-shingle groups grew with N;
    with genuine permutations the same corpus runs 65 s uncapped and
    the cap's verified output is identical. The cap remains the
    insurance for genuinely duplicate-heavy corpora, where mega
    clusters band identically either way — the planted-fixture tests
    pin exactly that shape.) With ``max_bucket=K`` set, buckets wider
    than K contribute:

    - LINEAR star edges between docs sharing the FULL num_perm
      signature (sorted-min hub per signature group) — identical and
      heavily-duplicated content keeps its cluster CONNECTIVITY (the
      downstream dedup use) at O(group) cost instead of O(group²);
    - NO cross-signature pairs — in an over-wide bucket those are
      overwhelmingly band-collision false positives that verification
      would reject anyway (the measured mass above), and dropping them
      is the standard production-dedup cap. Bounded, documented recall
      loss: a genuine near-dup pair (different full signatures) inside
      an over-wide bucket is missed unless another of its bands lands
      in a narrow bucket — raise ``max_bucket`` or rows-per-band if
      that matters for the corpus.

    Narrow buckets are EXACTLY unchanged; ``max_bucket=None`` (default)
    disables the cap entirely. BOTH flavors are declared, oracled
    queries (`dedup_near_minhash` uncapped, `dedup_near_minhash_capped`
    with the cap firing) — the capped star-edge semantics are
    deterministic SQL (widths a GROUP BY, hubs a MIN per (band, bucket,
    full-signature) group), so DuckDB hash-adjudicates the production
    configuration end-to-end, not just the uncapped one."""
    assert num_perm % bands == 0

    # one shuffle on doc: 32 min-aggregates (signature) + the hashed
    # shingle set for exact verification of candidates
    owned: list[DataFrame] = []
    if sigs is not None:
        sig = sigs
    else:
        sig = minhash_signatures(docs, n, num_perm, id_col, text_col, det).persist()
        owned.append(sig)
    bucketed = banded_rows(sig, num_perm, bands, det, with_fs=True)

    if max_bucket is None:
        pair_src = bucketed
        hot_edges = None
    else:
        from pyspark.sql import Window

        # width tagging + hub selection as WINDOWS over one (band, bh)
        # exchange, not groupBy+join pairs: count over the unordered
        # bucket frame gives _k, min(doc) over the (bucket, full-
        # signature) frame gives the star hub — the groupBy/join
        # formulation paid the same partitioning exchange plus two
        # join exchanges to re-attach its aggregates. (Both windows
        # share the (band, bh) partitioning, so the second is a
        # partition-local sort, not a new shuffle.)
        #
        # Deliberately NOT persisted (measured, late round 6): the
        # tagged frame has three consumers (both self-join sides, the
        # hot-edge branch) and the planner instantiates this subtree
        # once per consumer with no exchange reuse. Caching the
        # exploded bands-x-corpus frame to collapse them helps only
        # the small-SF fixed overhead (1.30 -> 0.99 s at sf0.1); at
        # 2M docs a same-session A/B shows the post-signature capped
        # work is ~19 s either way (the 60-75 s totals are dominated
        # by the signature build, which the cap machinery never
        # touches), a serialized cache is strictly worse (125.8 s
        # total), and the deserialized cache adds a multi-GB
        # footprint for nothing. Recomputing the explode off the
        # persisted sig is the scale-safe shape.
        tagged = bucketed.withColumn(
            "_k", F.count(F.lit(1)).over(Window.partitionBy("band", "bh"))
        )
        pair_src = tagged.filter(F.col("_k") <= max_bucket).drop("_k", "fs")
        # linear star edges inside each (bucket, full-signature) group:
        # hub = min doc, one edge per other member — connectivity
        # preserved at O(group), then verified like any candidate
        hot_edges = (
            tagged.filter(F.col("_k") > max_bucket)
            .withColumn(
                "_hub",
                F.min("doc").over(Window.partitionBy("band", "bh", "fs")),
            )
            .filter(F.col("doc") != F.col("_hub"))
            .select(F.col("_hub").alias("a"), F.col("doc").alias("b"))
        )

    candidates = (
        # SHUFFLED-HASH self-join (round 11, guide §3.1 — the same fix
        # as `_shingle_pair_intersections`): left to estimates the
        # planner broadcast one side of the banded self-join, a full
        # second evaluation of the band-explode subtree collected into
        # a driver hash relation; with the hint both sides'
        # ENSURE_REQUIREMENTS exchanges are canonically identical and
        # runtime stage reuse evaluates the subtree once. Measured at
        # sf0.1 on cold-cache runs: uncapped 1.82 s → 1.43 s, capped
        # 1.99 s → 1.81 s, identical rows.
        pair_src.alias("l")
        .join(pair_src.alias("r").hint("shuffle_hash"), ["band", "bh"])
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .filter(F.col("a") < F.col("b"))
    )
    if hot_edges is not None:
        candidates = candidates.unionByName(hot_edges)
    candidates = candidates.distinct()

    hs_a = sig.select(F.col("doc").alias("a"), F.col("hs").alias("hs_a"))
    hs_b = sig.select(F.col("doc").alias("b"), F.col("hs").alias("hs_b"))
    return _attach_owned(
        _verify_jaccard(candidates, hs_a, hs_b, threshold), owned
    )


def minhash_incremental_pairs(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    det: bool = False,
    corpus_sigs: DataFrame | None = None,
    max_bucket: int | None = None,
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection — the per-ingest-cycle shape of
    `minhash_lsh_pairs`, completing the near-dup family's batch →
    incremental progression (exact dedup has `dedup_incremental`, span
    dedup has `dedup_spans_incremental`): each NEW batch document is
    screened against the ALREADY-INGESTED corpus. Returns verified
    pairs ``(a, b, inter, jaccard)`` with ``a`` a corpus doc and ``b``
    a batch doc — never batch×batch or corpus×corpus pairs (within-
    batch dedup is `minhash_lsh_pairs` on the batch alone; the
    streaming sink composes both).

    Scale shape: the candidate join is batch-bands × corpus-bands on
    ``(band, bh)`` — an equi-join whose left side is the BATCH (small
    per ingest cycle), never the corpus self-join. The corpus side
    ships ``(doc, band keys, hashed shingle set)`` only — no document
    bodies. At 100 TB pass ``corpus_sigs`` — a persisted/parquet-backed
    frame from `minhash_signatures` (columns ``doc, sig_*, hs``),
    maintained across ingest cycles like
    `streaming/dedup.corpus_hash_index` — so the corpus is never
    re-shingled per cycle; signatures are a pure per-doc function of
    the text, so stored and recomputed signatures agree bit-for-bit.
    Inline-computed signature frames are persisted and attached to the
    result; per-cycle callers release them with
    `release_owned_caches(pairs)` after consuming the cycle's pairs.

    ``max_bucket`` is the hot-bucket dial, adapted from the self-join
    cap: a corpus bucket wider than K (head-heavy corpora grow their
    widest buckets with the corpus — the measured quadratic hazard,
    SCALE.md) contributes only ONE representative per full-signature
    group (the min corpus doc), matched to batch docs sharing that
    FULL signature. Identical/heavily-duplicated corpus content thus
    still flags its batch twins at O(width) cost; cross-signature
    candidates in an over-wide bucket — overwhelmingly band-collision
    false positives — are dropped, the same bounded, documented recall
    trade as `minhash_lsh_pairs(max_bucket=...)`. Narrow buckets are
    exactly unchanged; ``None`` disables the cap.

    ``batch_sigs`` — a precomputed signature frame for the BATCH side,
    symmetric to ``corpus_sigs`` (round 12): when batch and corpus are
    slices of ONE source (the declared %7-split queries; a sink that
    already computed the cycle's signatures), pass both frames from a
    single shared `minhash_signatures` pass instead of letting this
    function build each side from text separately — one table scan and
    one kernel instantiation instead of two. Caller-supplied frames'
    cache lifecycle stays caller-owned, exactly as for
    ``corpus_sigs``."""
    assert num_perm % bands == 0
    # inline-computed sigs are persisted (both frames feed two
    # consumers: band rows + verification) and ATTACHED to the result —
    # this is a per-ingest-cycle entry point, so the caller releases
    # them with `release_owned_caches(pairs)` once the cycle's pairs
    # are consumed (round-9 ADVICE: they previously leaked one cached
    # frame per cycle with no handle). A caller-supplied corpus_sigs'
    # cache lifecycle stays caller-owned (the corpus_hash_index rule).
    owned: list[DataFrame] = []
    if corpus_sigs is None:
        if corpus is None:
            raise ValueError("pass corpus or corpus_sigs")
        corpus_sigs = minhash_signatures(
            corpus, n, num_perm, id_col, text_col, det
        ).persist()
        owned.append(corpus_sigs)
    if batch_sigs is None:
        batch_sigs = minhash_signatures(
            batch, n, num_perm, id_col, text_col, det
        ).persist()
        owned.append(batch_sigs)
    return _attach_owned(
        _incremental_pairs_from_sigs(
            batch_sigs, corpus_sigs, num_perm, bands, threshold, det, max_bucket
        ),
        owned,
    )


def _incremental_pairs_from_sigs(
    batch_sigs: DataFrame,
    corpus_sigs: DataFrame,
    num_perm: int,
    bands: int,
    threshold: float,
    det: bool,
    max_bucket: int | None = None,
) -> DataFrame:
    """`minhash_incremental_pairs` from signature frames directly —
    shared with the streaming sink, where the corpus side is the
    persisted per-batch signature index and the batch side is computed
    once per micro-batch."""
    bb = banded_rows(batch_sigs, num_perm, bands, det, with_fs=True).select(
        F.col("doc").alias("b"), F.col("fs").alias("fs_b"), "band", "bh"
    )
    cb = banded_rows(corpus_sigs, num_perm, bands, det, with_fs=True).select(
        F.col("doc").alias("a"), F.col("fs").alias("fs_a"), "band", "bh"
    )

    if max_bucket is None:
        candidates = bb.join(cb, ["band", "bh"]).select("a", "b")
    else:
        from pyspark.sql import Window

        # width tagging + hub selection as windows over ONE (band, bh)
        # exchange on the corpus side (same plan shape as the capped
        # self-join; the batch side is untouched)
        tagged = cb.withColumn(
            "_k", F.count(F.lit(1)).over(Window.partitionBy("band", "bh"))
        )
        narrow = bb.join(
            tagged.filter(F.col("_k") <= max_bucket), ["band", "bh"]
        ).select("a", "b")
        hubs = (
            tagged.filter(F.col("_k") > max_bucket)
            .withColumn(
                "_hub",
                F.min("a").over(Window.partitionBy("band", "bh", "fs_a")),
            )
            .filter(F.col("a") == F.col("_hub"))
            .select("band", "bh", F.col("fs_a").alias("fs_b"), "a")
        )
        wide = bb.join(hubs, ["band", "bh", "fs_b"]).select("a", "b")
        candidates = narrow.unionByName(wide)
    candidates = candidates.distinct()

    hs_a = corpus_sigs.select(F.col("doc").alias("a"), F.col("hs").alias("hs_a"))
    hs_b = batch_sigs.select(F.col("doc").alias("b"), F.col("hs").alias("hs_b"))
    return _verify_jaccard(candidates, hs_a, hs_b, threshold)


def minhash_band_stats(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-band LSH tuning diagnostics for the deterministic MinHash
    flavor: docs bucketed, distinct buckets, candidate pairs per band —
    the band-level cost/recall dial (twin of the SRP view in
    plans/vector_queries.dedup_near_embedding_lsh). Rebuilds the same
    md5-60-bit signatures as ``minhash_lsh_pairs(det=True)`` so the two
    views describe the same index.

    Pair counts are the closed form Σ k·(k−1)/2 over bucket widths —
    one aggregate, O(buckets), never the Σ k² self-join rows (on
    head-heavy corpora that join is itself the quadratic hazard this
    diagnostic measures). The DuckDB oracle keeps the join
    formulation, adjudicating the closed form against an independent
    derivation."""
    assert num_perm % bands == 0
    rpb = num_perm // bands
    # round 12: same zero-exchange map-side signature build as the
    # dedup flavors (hs rides along unused — it is the same distinct
    # set the kernel already holds)
    sig = _fused_det_signatures(docs, n, num_perm, id_col, text_col).drop("hs")
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"sig_{b * rpb + r}").cast("string") for r in range(rpb)],
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    bucketed = sig.select("doc", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    # candidate-pair counts WITHOUT the banded self-join: a bucket of
    # width k contributes exactly k·(k−1)/2 pairs, so n_pairs per band
    # is an aggregate over bucket widths — O(buckets) instead of the
    # Σ k² join rows the join flavor materializes just to count them.
    # On the head-heavy corpora where this diagnostic matters most the
    # join flavor IS the quadratic hazard it exists to diagnose (the
    # round-5 2M-doc finding); the closed form never touches pair rows.
    widths = bucketed.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("k")
    )
    return widths.groupBy("band").agg(
        F.sum("k").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("n_pairs"),
    )
