"""Text column helpers shared by the dedup / text-analysis operators.

All pure Spark SQL expressions (JVM-side, codegen-friendly) with exact DuckDB
SQL equivalents so every operator built on them is oracle-checkable.
Tokenization is defined as: lowercase, trim, split on single spaces — the
documents testdata is single-space separated, and DuckDB's string_split
matches this definition exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """lower → trim → split(' '). DuckDB: string_split(trim(lower(x)), ' ')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), " ")


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles joined by spaces; empty array when the doc is
    shorter than n words (Spark's sequence() descends when stop < start, so
    the guard is mandatory).

    DuckDB: list_distinct(list_transform(generate_series(1, len(t)-n+1),
    i -> array_to_string(t[i:i+n-1], ' ')))  -- list_slice is inclusive.
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
                lambda i: F.array_join(F.slice(tokens_col, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def duckdb_tokens(expr: str = "text") -> str:
    return f"string_split(trim(lower({expr})), ' ')"


def duckdb_word_shingles(tokens_expr: str, n: int = 3) -> str:
    """DuckDB SQL matching word_shingles(); list_slice(t, i, j) is inclusive."""
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))) "
        f"ELSE [] END"
    )


def word_ngrams_all(tokens_col: Column, n: int = 3) -> Column:
    """NON-distinct word n-gram list — word_shingles' repetition-measuring
    twin: dedup wants distinct shingles, repetition metrics need the
    copies kept. Empty array below n tokens (same sequence() guard).

    DuckDB: CASE WHEN len(t) >= n THEN list_transform(generate_series(1,
    len(t)-n+1), i -> array_to_string(t[i:i+n-1], ' ')) ELSE [] END.
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_ratio(tokens_col: Column, n: int = 3) -> Column:
    """Gopher-style duplicate n-gram fraction: 1 - distinct/total over the
    non-distinct n-gram list, 0.0 when the doc is shorter than n words.
    Shared by repetition_ratio and quality_filter_flags so the threshold
    semantics can't drift between the signal table and the gate."""
    g = word_ngrams_all(tokens_col, n)
    return F.when(
        F.size(g) > 0,
        1.0 - F.size(F.array_distinct(g)) / F.size(g),
    ).otherwise(F.lit(0.0))


def token_segments(tokens_col: Column, seg: int = 8) -> Column:
    """NON-overlapping aligned token windows that COVER the token list —
    the "line" unit for boilerplate / intra-doc scrubbing on corpora
    without newline structure (on newline-delimited corpora the same
    operators run with split('\\n') in place of this). The final partial
    window is kept (slice clamps at the end), so
    ``concat_ws(' ', token_segments(T))`` reconstructs the tokenized text
    exactly — the reassembly invariant the scrub operators rely on.

    DuckDB: list_transform(generate_series(1, greatest(len(t),1), seg),
    i -> array_to_string(list_slice(t, i, i+seg-1), ' ')).
    """
    return F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(tokens_col), F.lit(1)), F.lit(seg)
        ),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, seg)),
    )


def duckdb_token_segments(tokens_expr: str, seg: int = 8) -> str:
    """DuckDB SQL matching token_segments() (list_slice is inclusive)."""
    return (
        f"list_transform(generate_series(1, greatest(len({tokens_expr}), 1), {seg}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {seg - 1}), ' '))"
    )
