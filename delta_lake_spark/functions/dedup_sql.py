"""SQL-text twins of the expression-heavy dedup builders.

Why this exists: the MinHash/SimHash/winnowing constructors assemble large
expression trees (16 permutations x polynomial hashes, 32-counter folds).
Built Column-by-Column through the Python API, one query build costs
hundreds of Py4J round-trips (~0.5-1.0 s of driver latency per build at
this box's ~1.3 ms/call).  Emitting the SAME expression as one SQL string
through a single ``F.expr`` parse keeps the semantics bit-identical (the
oracle sweep checks this) while cutting the build to a handful of calls.

These builders mirror ``functions/dedup.py`` term for term — any semantic
change must land in BOTH (and in the DuckDB oracle mirrors in
``queries/dedup.py``).
"""

from __future__ import annotations

from delta_lake_spark.functions.dedup import (
    MINHASH_BAND_SIZE,
    MINHASH_COEFFS,
    MINHASH_K,
    MINHASH_PRIME,
    _POLY_COEFS,
)

# Spark SQL text for \s+ : backslash must survive the SQL string literal.
_WS = r"'\\s+'"


def normalize_sql(col: str) -> str:
    """Mirror of text.normalize_text."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9]+', ' '), {_WS}, ' '))"
    )


def tokens_sql(expr: str) -> str:
    """Mirror of text.tokens: empty string -> empty array (not [''])."""
    return (
        f"CASE WHEN trim({expr}) = '' THEN CAST(array() AS array<string>) "
        f"ELSE split(trim({expr}), {_WS}) END"
    )


def shingle_hash_sql(var: str) -> str:
    """Mirror of dedup.shingle_hash: sum ascii(c_i) * 31^(8-i) as bigint."""
    terms = " + ".join(
        f"CAST(ascii(substring({var}, {i}, 1)) AS BIGINT) * {coef}"
        for i, coef in enumerate(_POLY_COEFS, start=1)
    )
    return f"(CAST(0 AS BIGINT) + {terms})"


def let_sql(bound: str, body: str, var: str) -> str:
    """SQL let-binding: evaluate ``bound`` ONCE per row and reference it as
    ``var`` inside ``body``.  ``transform`` over a one-element array binds
    the value to a lambda variable; higher-order lambdas otherwise inline
    the bound expression TEXTUALLY, so an expression referenced inside a
    per-element lambda re-evaluates per element (measured 4.5x on the
    shingle pipeline: the tokens split re-ran for every element_at)."""
    return f"element_at(transform(array({bound}), {var} -> {body}), 1)"


def _shingle_transform_sql(toks: str, n: int) -> str:
    # CASE guard, not greatest(...,0): Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0] (unlike DuckDB's empty range(1, 1)), so a <n-token
    # document crashed on element_at(__t, 0) under ANSI. <n tokens -> [].
    parts = ", ".join(f"element_at(__t, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END".replace("__t", toks)
    )


def token_shingles_sql(col: str, n: int = 3) -> str:
    """Mirror of dedup.token_shingles (distinct n-token shingles).  The
    tokens array is let-bound so normalize+split runs once per row, not
    once per element_at inside the shingle lambda."""
    toks = tokens_sql(normalize_sql(col))
    return let_sql(
        toks, f"array_distinct({_shingle_transform_sql('__tk', n)})", "__tk"
    )


def token_shingle_seq_sql(col: str, n: int = 3) -> str:
    """Mirror of dedup.token_shingle_seq (in-order, duplicates kept)."""
    return let_sql(
        tokens_sql(normalize_sql(col)),
        _shingle_transform_sql("__tk", n),
        "__tk",
    )


def hashed_shingles_sql(shingles: str) -> str:
    return f"transform({shingles}, s -> {shingle_hash_sql('s')})"


def minhash_sig_sql(hashes: str) -> str:
    """Mirror of dedup.minhash_signature given a pre-hashed array column."""
    mins = ", ".join(
        f"array_min(transform({hashes}, h -> ({a} * h + {b}) % {MINHASH_PRIME}))"
        for a, b in MINHASH_COEFFS
    )
    return f"array({mins})"


def band_keys_sql(sig: str, band_size: int = MINHASH_BAND_SIZE) -> str:
    """Mirror of dedup.band_keys: array of (band, key) structs.  The
    ``band_size`` knob trades candidate fan-out for recall (d14 measures
    this empirically)."""
    n_bands = MINHASH_K // band_size
    bands = []
    for b in range(n_bands):
        parts = ", ".join(
            f"CAST(element_at({sig}, {b * band_size + j + 1}) AS STRING)"
            for j in range(band_size)
        )
        bands.append(f"named_struct('band', {b}, 'key', concat_ws('-', {parts}))")
    return f"array({', '.join(bands)})"


def simhash32_sql(col: str) -> str:
    """Mirror of dedup.simhash32: single-pass 32-counter fold."""
    bit_idx = "array(" + ", ".join(str(k) for k in range(32)) + ")"
    pow2 = "array(" + ", ".join(f"CAST({1 << k} AS BIGINT)" for k in range(32)) + ")"
    toks = f"array_distinct({tokens_sql(normalize_sql(col))})"
    hashes = hashed_shingles_sql(toks)
    sums = (
        f"aggregate({hashes}, array_repeat(CAST(0 AS BIGINT), 32), "
        f"(acc, h) -> zip_with(acc, {bit_idx}, (s, k) -> s + getbit(h, k) * 2 - 1))"
    )
    weighted = (
        f"zip_with({sums}, {pow2}, "
        f"(s, p) -> CASE WHEN s > 0 THEN p ELSE CAST(0 AS BIGINT) END)"
    )
    return f"aggregate({weighted}, CAST(0 AS BIGINT), (a, x) -> a + x)"


def winnow_sql(col: str, window: int = 4) -> str:
    """Mirror of dedup.winnow_fingerprints.  The hash array is let-bound:
    the windowed-minima lambda references it per window position, which
    without the binding re-ran the whole tokenize+hash pipeline per
    position (quadratic in document length)."""
    hashes = hashed_shingles_sql(token_shingle_seq_sql(col))
    return let_sql(
        hashes,
        (
            # <window shingles -> [] (sequence(1, 0) descends in Spark)
            f"CASE WHEN size(__hs) >= {window} THEN "
            f"array_distinct(transform("
            f"sequence(1, size(__hs) - {window - 1}), "
            f"i -> array_min(slice(__hs, i, {window})))) "
            f"ELSE CAST(array() AS array<bigint>) END"
        ),
        "__hs",
    )
