"""Portable deterministic hashing — the foundation of the dedup /
fingerprint extension operators.

Every hash is derived from md5 (identical in Spark and DuckDB) so each
operator's DuckDB oracle computes the *same* signatures, not just
similar ones: h32(s) = first 8 hex digits of md5(s) as an integer.
Spark's own hash()/xxhash64 are NOT used — their seeds/algorithms have
no DuckDB twin.

MinHash uses K universal-hash permutations (a_j * h + b_j) mod P over
w-shingles. P ≈ 2^30 keeps a_j * h < 2^35 — far from int64 overflow in
both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for universal hashing (prime, ~2^30)
P = 1_000_000_007
#: K = 8 permutations → 2 bands × 4 rows (tuned on the synthetic corpus:
#: catches the planted jaccard≈0.99 near-dups with ~30 candidate pairs
#: at sf0.01, no bucket blow-up)
MINHASH_A = (7, 11, 13, 17, 19, 23, 29, 31)
MINHASH_B = (3, 5, 101, 4099, 65537, 999983, 77, 123457)
K = len(MINHASH_A)
#: shingle width (tokens)
SHINGLE_W = 3


# ---------------------------------------------------------------------------
# h32 — md5-prefix hash
# ---------------------------------------------------------------------------


def h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# w-shingles from a token array
# ---------------------------------------------------------------------------


def shingles(tokens: Column, w: int = SHINGLE_W) -> Column:
    """Overlapping w-token shingles: tokens[i] || ' ' || ... tokens[i+w-1].
    Array-native (no explode): transform over the index range."""

    def shingle_at(i: Column) -> Column:
        pieces = []
        for off in range(w):
            if off:
                pieces.append(F.lit(" "))
            pieces.append(F.element_at(tokens, i + F.lit(off + 1)))
        return F.concat(*pieces)

    return F.transform(
        F.sequence(F.lit(0), F.size(tokens) - w), lambda i: shingle_at(i)
    )


def shingles_sql(tokens_expr: str, w: int = SHINGLE_W) -> str:
    join = " || ' ' || ".join(f"{tokens_expr}[i + {off + 1}]" for off in range(w))
    return (
        f"list_transform(range(len({tokens_expr}) - {w - 1}), i -> {join})"
    )


# ---------------------------------------------------------------------------
# MinHash signature (one column / SQL expr per permutation)
#
# Two-step on purpose: hash each shingle ONCE (md5 is the expensive part),
# then apply the K cheap affine permutations over the hash array —
# K× fewer md5 evaluations than hashing inside each permutation.
# Duplicate shingles don't affect a minimum, so the hash array is built
# from the raw (non-distinct) shingle list.
# ---------------------------------------------------------------------------


def hashed_shingles(shingles_col: Column) -> Column:
    return F.transform(shingles_col, lambda s: h32(s) % P)


def hashed_shingles_sql(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {h32_sql('s')} % {P})"


def minhash(hashes_col: Column, j: int) -> Column:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return F.array_min(F.transform(hashes_col, lambda h: (F.lit(a) * h + b) % P))


def minhash_sql(hashes_expr: str, j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return f"list_min(list_transform({hashes_expr}, h -> ({a} * h + {b}) % {P}))"
