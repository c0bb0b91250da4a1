"""Helpers shared by __spark_entry__ queries and their DuckDB oracles.

The driver compares Spark results against DuckDB by row-count + schema +
order-insensitive value-hash, sorting columns by name. Two consequences:

- every computed column must carry the SAME alias on both sides;
- float results must be deterministic: we cast vector elements to double
  before arithmetic (both engines then do identical double ops in identical
  sequential fold order) and additionally round scores to 6 decimals to be
  robust against fold-order differences;
- top-k ties must be broken on an id column on both sides.
"""

from __future__ import annotations

ROUND = 6

# DuckDB SQL fragments mirroring lanterndb_spark.functions.distance.
# a/b are FLOAT[] list expressions; both engines cast elements to double and
# fold sequentially, so results agree to well past 6 decimals.


def duck_l2sq(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ** 2))"
    )


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def duck_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def duck_cos(a: str, b: str) -> str:
    return f"(1.0 - {duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"


def duck_sql_list(words) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def duck_tokens(col: str, stopwords=None) -> str:
    """DuckDB twin of functions.text.tokenize (no stemming).

    Forms diverge intentionally since r14: the Spark side splits on the
    separator class in ONE regex pass, this twin keeps the retired
    two-pass replace+split shape — they are pinned token-identical by
    test_text.py::test_tokenize_one_pass_split_matches_two_pass_form,
    so the oracle stays a value twin, not a structural one (r14 ADVICE
    item, resolved by documentation)."""
    base = (
        f"list_filter(string_split_regex(regexp_replace(lower({col}), "
        f"'[^\\p{{L}}\\p{{N}}]+', ' ', 'g'), '\\s+'), t -> t <> '')"
    )
    if stopwords:
        base = f"list_filter({base}, t -> t NOT IN {duck_sql_list(stopwords)})"
    return base
