"""Debug helpers over Spark plans.

``masked_explain`` mirrors ``lantern.masked_explain`` / ``mask_arrays``
(lantern_hnsw/sql/lantern.sql:599-654,888-915): EXPLAIN output with long
vector literals collapsed so plans stay readable when queries embed
128-dim query vectors.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_ARRAY_LIT = re.compile(r"\[([-0-9.eE+, ]{40,})\]")


def mask_arrays(text: str, keep: int = 3) -> str:
    """Collapse long numeric array literals to ``[a, b, c, …×N]``."""

    def repl(m: re.Match) -> str:
        items = [x.strip() for x in m.group(1).split(",")]
        if len(items) <= keep:
            return m.group(0)
        return "[" + ", ".join(items[:keep]) + f", …×{len(items)}]"

    return _ARRAY_LIT.sub(repl, text)


def masked_explain(df: DataFrame, mode: str = "formatted", keep: int = 3) -> str:
    """``df.explain(mode)`` as a string with vector literals masked."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )
    return mask_arrays(plan, keep=keep)
