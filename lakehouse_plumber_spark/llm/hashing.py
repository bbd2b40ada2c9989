"""Cross-engine deterministic hashing primitives.

`md5int(expr)` — a 60-bit integer from the md5 hex prefix — evaluates to the
SAME value in Spark SQL and DuckDB, which makes minhash/simhash/LSH structures
exactly reproducible by the correctness oracle. (xxhash64 stays available for
Spark-only paths; it does not exist in DuckDB.)
"""

from __future__ import annotations

MERSENNE61 = (1 << 61) - 1


def minhash_coeffs(k: int) -> list[tuple[int, int, int]]:
    """Deterministic (a, b, c) coefficient triples for the k minhash functions.

    h_i(x) = (a*(x % 2^30) + b*(x // 2^30) + c) % MERSENNE61 — all terms stay
    below 2^62, so 64-bit arithmetic never overflows in either engine. One md5
    per shingle + k cheap integer mixes replaces k md5s per shingle.
    """
    out = []
    x = 88172645463325252 % (1 << 30)

    def nxt() -> int:
        nonlocal x
        x = (1103515245 * x + 12345) % (1 << 30)
        return x

    for _ in range(k):
        out.append((nxt() | 1, nxt() | 1, nxt()))
    return out


def minhash_mix(a: int, b: int, c: int, h: str, dialect: str) -> str:
    """The h_i(x) expression over a precomputed 60-bit shingle hash column."""
    div = "DIV" if dialect == "spark" else "//"
    return f"(({a} * ({h} % 1073741824) + {b} * ({h} {div} 1073741824) + {c}) % {MERSENNE61})"


def let_spark(bound: str, var: str, body: str) -> str:
    """SQL let-binding: evaluate `bound` once per row, reference it as `var`.

    `transform` over a one-element array binds a lambda variable, so the bound
    computation cannot be duplicated by projection collapse — without this,
    Catalyst's CollapseProject inlines a withColumn expression into every
    consumer and a k-way fold re-evaluates tokenization/hashing k times.
    """
    return f"element_at(transform(array({bound}), {var} -> {body}), 1)"


def md5int_spark(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}),1,15),16,10) as bigint)"


def md5int_duck(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}),1,15))::BIGINT)"


def tokens_spark(col: str) -> str:
    """Whitespace tokenization, empty-safe."""
    return f"filter(split(trim({col}), '\\\\s+'), x -> x <> '')"


def tokens_duck(col: str) -> str:
    return f"list_filter(string_split_regex(trim({col}), '\\s+'), x -> x <> '')"


def word_ngrams_spark(col: str, n: int) -> str:
    """Distinct word n-gram shingles as strings (space-joined).

    Tokenization is let-bound: evaluated once per row, not once per shingle.
    """
    return let_spark(
        tokens_spark(col),
        "t",
        f"array_distinct(transform(sequence(1, greatest(size(t) - {n - 1}, 1)), "
        f"i -> array_join(slice(t, i, {n}), ' ')))",
    )


def word_ngrams_duck(col: str, n: int) -> str:
    toks = tokens_duck(col)
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


def word_ngrams_all_spark(col: str, n: int) -> str:
    """All word n-grams WITH multiplicity (for repetition counting — the
    distinct variant above is for set-similarity signatures)."""
    return let_spark(
        tokens_spark(col),
        "t",
        f"transform(sequence(1, greatest(size(t) - {n - 1}, 1)), "
        f"i -> array_join(slice(t, i, {n}), ' '))",
    )


def word_ngrams_all_duck(col: str, n: int) -> str:
    toks = tokens_duck(col)
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
