"""Near-duplicate similarity primitives: shingles, MinHash, LSH bands,
SimHash, fingerprints (SURVEY.md §7.5 — beyond-reference operators for
training-data dedup; generalizes the reference's exact dedup D1/D5).

Hash design: every hash is derived from ``md5(seed || ':' || value)``
hex strings. Two reasons:

1. **Engine-portable determinism** — md5 is available and identical in
   Spark, DuckDB, and nearly every engine, so the correctness oracle
   can recompute signatures exactly; no dependence on Spark's internal
   xxhash64 seeding.
2. Fixed-width lowercase hex compares lexicographically exactly like
   the underlying 128-bit integer, so ``min(hex)`` IS min-hashing —
   no int conversion needed in the hot path.

At 100 TB scale the md5 cost is visible but the pipeline is shuffle-
bound (the LSH band group-by), not hash-bound; swap in xxhash64 via
``hash_fn`` if oracle portability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a token array (empty array when the
    document has fewer than ``n`` tokens)."""
    count = F.size(toks) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), count)
    make = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(count >= 1, make).otherwise(F.array().cast("array<string>"))


def seeded_hash(value: Column, seed: int, length: int = 8) -> Column:
    """Portable seeded hash: first ``length`` hex chars of
    md5('<seed>:' || value). Lexicographic order == numeric order."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), value)), 1, length)


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """MinHash signature: array of k minima of seeded hashes over the
    shingle set. Null-safe: empty shingle set -> array of 'ffffffff'
    sentinels (matches nothing real).

    Hash family: the 128-bit md5 of '<i/4>:' || shingle is split into
    four independent 8-hex-char chunks, so k=16 functions cost only 4
    md5 evaluations per shingle (hashing dominated the signature stage
    4x before this).

    # NB: the factory matters — a `lambda s, i=i:` two-arg lambda would
    # be interpreted by F.transform as an (element, index) function and
    # the seed would silently become the array position.
    """
    sentinel = F.lit("ffffffff")

    def hasher(i: int):
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(f"{i // 4}:"), s)), (i % 4) * 8 + 1, 8
        )

    elems = [
        F.coalesce(F.array_min(F.transform(shingles, hasher(i))), sentinel)
        for i in range(k)
    ]
    return F.array(*elems)


def lsh_band_keys(signature: Column, bands: int = 4, rows: int = 4) -> Column:
    """Split a k=bands*rows signature into band keys:
    array of 'band_id:elem|elem|...' strings. Docs sharing any band key
    are LSH candidates."""
    keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[F.element_at(signature, b * rows + r + 1) for r in range(rows)],
        )
        for b in range(bands)
    ]
    return F.array(*keys)


def token_hash_u32(tok: Column, length: int = 8) -> Column:
    """First 8 md5 hex chars of a token as an unsigned 32-bit integer
    (for SimHash bit arithmetic)."""
    return F.conv(F.substring(F.md5(tok), 1, length), 16, 10).cast("long")


def simhash_bits(toks_distinct_hash: Column, bit: int) -> Column:
    """Contribution of one hashed token to one SimHash bit position:
    +1 if the bit is set, else -1."""
    return (F.shiftright(toks_distinct_hash, bit).bitwiseAND(F.lit(1)) * 2 - 1)


def fingerprint(shingles: Column, k: int = 4) -> Column:
    """Winnowing-style document fingerprint: the k smallest shingle
    hashes, sorted and joined — a compact rolling-hash sketch usable as
    a near-dup prefilter key."""
    hashes = F.array_sort(F.array_distinct(F.transform(shingles, lambda s: seeded_hash(s, 0))))
    return F.concat_ws("|", F.slice(hashes, 1, k))
