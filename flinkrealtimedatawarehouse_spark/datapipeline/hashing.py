"""Portable hash + shingle expression builders (Spark Column AND DuckDB SQL).

Every dedup/fingerprint operator needs a hash that the DuckDB oracle can
reproduce bit-for-bit. We use the md5 hex prefix as a 60-bit integer:

    Spark :  conv(substr(md5(s), 1, 15), 16, 10)::bigint
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::UBIGINT::BIGINT

(both verified equal; 15 hex digits = 60 bits < 2^63, no sign issues).
MinHash permutations are linear maps (a*h30 + b) mod p over the 30-bit
reduction of that hash, with constants generated once here and embedded as
literals on BOTH sides, so the oracle SQL is generated from the same spec
as the DataFrame code.

Tokenization is the same on both sides: lower + split on /[^a-z0-9]+/ +
drop empties (Spark ``split``/``filter`` == DuckDB ``string_split_regex``/
``list_filter``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1
H30 = 1 << 30


def perm_constants(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k MinHash permutations."""
    return [((2 * j + 3) % MERSENNE31, (j * j * 2654435761 + 12345) % MERSENNE31) for j in range(k)]


# --- Spark side -----------------------------------------------------------

def spark_phash(col: Column) -> Column:
    """60-bit portable hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def spark_tokens(col: Column) -> Column:
    """Lowercase latin/digit token array (empties dropped)."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda x: F.length(x) > 0)


def spark_shingles(tokens: Column, n: int) -> Column:
    """Overlapping word n-grams joined by a space; [] when < n tokens."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


SHINGLE_A = 1_000_003  # rolling-combination multiplier (Horner mod p)


def spark_token_hashes(tokens: Column) -> Column:
    """30-bit hash per TOKEN (one md5 per token — the shingle hashes below
    combine these with integer arithmetic, so an n-gram costs zero extra
    md5 calls; hashing shingle STRINGS cost n× the md5 work plus the
    concat allocations)."""
    return F.transform(tokens, lambda t: spark_phash(t) % F.lit(H30))


def spark_hash_shingles(token_hashes: Column, n: int) -> Column:
    """Combined hash per overlapping n-gram of token hashes: Horner with a
    mod at every step (values stay < 2^51, no int64 overflow). [] when
    fewer than n tokens."""

    def comb(i: Column) -> Column:
        expr = F.element_at(token_hashes, i + 1)
        for j in range(1, n):
            expr = (expr * F.lit(SHINGLE_A) + F.element_at(token_hashes, i + 1 + j)) % F.lit(MERSENNE31)
        return expr

    return F.when(
        F.size(token_hashes) >= n,
        F.transform(F.sequence(F.lit(0), F.size(token_hashes) - n), comb),
    ).otherwise(F.array().cast("array<bigint>"))


SHINGLE_A2 = 777_767_777  # second independent Horner multiplier


def spark_hash_shingles_wide(token_hashes: Column, n: int) -> Column:
    """62-bit combined hash per n-gram: two independent 31-bit Horner
    combines (multipliers ``SHINGLE_A``/``SHINGLE_A2``, both mod
    MERSENNE31) packed as ``h1 * 2^31 + h2``. The 31-bit space of
    ``spark_hash_shingles`` is fine for MinHash (whose permutations live
    mod MERSENNE31 anyway) but NOT for corpus-scale exact keying —
    at ~1e8 windows the birthday bound yields millions of colliding
    pairs in 2^31, each a false duplicate; in 2^62 the expected count is
    ~1e-3. Each Horner step keeps operands < 2^31 so no int64 overflow.
    [] when fewer than n tokens."""

    def comb(a_mult: int):
        def inner(i: Column) -> Column:
            expr = F.element_at(token_hashes, i + 1)
            for j in range(1, n):
                expr = (expr * F.lit(a_mult) + F.element_at(token_hashes, i + 1 + j)) % F.lit(
                    MERSENNE31
                )
            return expr

        return inner

    c1, c2 = comb(SHINGLE_A), comb(SHINGLE_A2)
    return F.when(
        F.size(token_hashes) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(token_hashes) - n),
            lambda i: c1(i) * F.lit(1 << 31) + c2(i),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def duck_hash_shingles_wide(th_expr: str, n: int) -> str:
    def horner(a_mult: int) -> str:
        expr = f"({th_expr})[i]"
        for j in range(1, n):
            expr = f"((({expr}) * {a_mult} + ({th_expr})[i+{j}]) % {MERSENNE31})"
        return expr

    combined = f"(({horner(SHINGLE_A)}) * {1 << 31} + ({horner(SHINGLE_A2)}))"
    return (
        f"CASE WHEN len({th_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({th_expr}) - {n - 1}), i -> {combined}) "
        f"ELSE []::BIGINT[] END"
    )


def _perm_fn(a: int, b: int):
    # NB: captured via factory, not lambda defaults — PySpark counts default
    # params as higher-order-function arity.
    return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


def spark_minhash(hashes: Column, k: int) -> Column:
    """k-element MinHash signature over a precomputed 30-bit hash array."""
    consts = perm_constants(k)
    return F.array(
        *[F.array_min(F.transform(hashes, _perm_fn(a, b))) for a, b in consts]
    )


# --- DuckDB side (SQL text generators, same constants) --------------------

def duck_phash(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::UBIGINT)::BIGINT"


def duck_tokens(expr: str) -> str:
    return f"list_filter(string_split_regex(lower({expr}), '[^a-z0-9]+'), t -> length(t) > 0)"


def duck_shingles(tokens_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def duck_token_hashes(tokens_expr: str) -> str:
    return f"list_transform({tokens_expr}, t -> {duck_phash('t')} % {H30})"


def duck_hash_shingles(th_expr: str, n: int) -> str:
    expr = f"({th_expr})[i]"
    for j in range(1, n):
        expr = f"((({expr}) * {SHINGLE_A} + ({th_expr})[i+{j}]) % {MERSENNE31})"
    return (
        f"CASE WHEN len({th_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({th_expr}) - {n - 1}), i -> {expr}) "
        f"ELSE []::BIGINT[] END"
    )


def duck_minhash(hashes_expr: str, k: int) -> str:
    consts = perm_constants(k)
    parts = [
        f"list_min(list_transform({hashes_expr}, h -> (h * {a} + {b}) % {MERSENNE31}))"
        for a, b in consts
    ]
    return "[" + ", ".join(parts) + "]"
