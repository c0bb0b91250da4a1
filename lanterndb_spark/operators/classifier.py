"""Trainable quality classifier: logistic regression over text signals.

The GPT-3/CCNet-style corpus quality filter — fit a linear classifier on
cheap per-document signals (labeled "good" corpus vs raw crawl, or any
binary label) and score the whole corpus with it. The reference has no
trainable surface; this extends the curation stack (SURVEY §7.8, same
posture as ``curate``/``profile``).

Scale split, mirroring ``ivf``/``pca``:

- FEATURES are pure column projections (``text_quality_features`` —
  token counts, stopword/alnum ratios, repetition), whole-stage codegen,
  zero shuffle, zero Python.
- FIT is a bounded random sample + driver-side Newton-IRLS on a d×d
  system (d = handful of features) — deterministic, microseconds of
  driver CPU; a distributed fit would scan 100 TB per iteration to
  estimate ~6 numbers.
- SCORE is a LITERAL EXPRESSION: the standardized weights fold into one
  ``sigmoid(w·x + b)`` column — the 100 TB pass is the same codegen'd
  projection as the features, and a SQL oracle given the same literals
  reproduces it (pinned by the q_quality_logreg_score row).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.text import STOPWORDS, tokenize


def text_quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append the standard quality-signal columns (all pure projections;
    the token array is materialized ONCE as a real intermediate column —
    a two-step select, the ``shingle_table`` pattern — so tokenize runs
    once per row, not once per derived feature):

    - ``f_tokens``   token count
    - ``f_mean_len`` mean token length in chars
    - ``f_stop``     stopword ratio over tokens
    - ``f_alnum``    alphanumeric-or-space char ratio over raw chars
    - ``f_dup1``     duplicate-unigram fraction (1 - distinct/total)
    """
    txt = F.col(text_col)
    # collision-safe intermediate name (an input that already carries a
    # __qf_toks column — e.g. a re-applied pipeline — must not collide)
    tok_name = "__qf_toks"
    while tok_name in df.columns:
        tok_name += "_"
    toks = F.col(tok_name)
    n_tok = F.size(toks)
    safe_n = F.greatest(n_tok, F.lit(1)).cast("double")
    tok_chars = F.coalesce(
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ),
        F.lit(0).cast("bigint"),
    )
    sw_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    alnum = F.length(F.regexp_replace(txt, "[^a-zA-Z0-9 ]", ""))
    with_toks = df.select(
        df["*"], tokenize(text_col, stopwords=None).alias(tok_name)
    )
    return with_toks.select(
        *[c for c in df.columns],
        n_tok.cast("double").alias("f_tokens"),
        (tok_chars.cast("double") / safe_n).alias("f_mean_len"),
        (sw_hits.cast("double") / safe_n).alias("f_stop"),
        (
            alnum.cast("double")
            / F.greatest(F.length(txt), F.lit(1)).cast("double")
        ).alias("f_alnum"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / safe_n
        ).alias("f_dup1"),
    )


FEATURE_COLS = ("f_tokens", "f_mean_len", "f_stop", "f_alnum", "f_dup1")


class LogRegModel(NamedTuple):
    """Standardized logistic regression: P(y=1|x) =
    sigmoid(bias + Σ w_i · (x_i - mean_i) / scale_i)."""

    feature_cols: tuple
    mean: np.ndarray
    scale: np.ndarray
    weights: np.ndarray
    bias: float


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    sample_limit: int = 500_000,
    seed: int = 42,
    l2: float = 1e-3,
    max_iter: int = 50,
    tol: float = 1e-10,
) -> LogRegModel:
    """Newton-IRLS on a bounded random sample (one scan; the normal
    system is (d+1)², driver-trivial). Features are standardized from
    the sample; L2 applies to weights, not the bias. Deterministic for a
    fixed seed."""
    from lanterndb_spark.plans.shape import bounded_rand_sample

    # driver-safe sample (see bounded_rand_sample: the old
    # orderBy(rand).limit idiom blows maxResultSize at 50M+ rows)
    rows = bounded_rand_sample(
        df.select(
            *feature_cols, F.col(label_col).cast("double").alias("__y")
        ).dropna(),
        sample_limit, seed,
    )
    if len(rows) < 4:
        raise ValueError("logreg_fit needs at least 4 labeled rows")
    X = np.array([[r[c] for c in feature_cols] for r in rows], dtype=np.float64)
    y = np.array([r["__y"] for r in rows], dtype=np.float64)
    if set(np.unique(y)) - {0.0, 1.0}:
        raise ValueError(f"{label_col} must be binary 0/1")
    mean = X.mean(axis=0)
    scale = X.std(axis=0)
    scale[scale == 0.0] = 1.0
    Z = np.column_stack([np.ones(len(X)), (X - mean) / scale])
    beta = np.zeros(Z.shape[1])
    reg = np.full(Z.shape[1], l2) * len(X)
    reg[0] = 0.0
    for _ in range(max_iter):
        p = 1.0 / (1.0 + np.exp(-(Z @ beta)))
        W = np.clip(p * (1.0 - p), 1e-12, None)
        grad = Z.T @ (y - p) - reg * beta
        H = (Z.T * W) @ Z + np.diag(reg)
        step = np.linalg.solve(H, grad)
        beta = beta + step
        if float(np.abs(step).max()) < tol:
            break
    return LogRegModel(
        tuple(feature_cols), mean, scale, beta[1:].copy(), float(beta[0])
    )


def logreg_score_expr(
    model: LogRegModel, feature_cols: Sequence[str] | None = None
) -> Column:
    """The model as ONE literal column expression — sigmoid of the
    standardized dot product. Pure JVM arithmetic: scoring 100 TB is a
    codegen'd projection, and any SQL engine given the same literals
    computes the same value (q_quality_logreg_score pins this)."""
    cols = feature_cols or model.feature_cols
    z: Column = F.lit(float(model.bias))
    for c, w, m, s in zip(cols, model.weights, model.mean, model.scale):
        z = z + F.lit(float(w)) * (
            (F.col(c) - F.lit(float(m))) / F.lit(float(s))
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_score(
    df: DataFrame,
    model: LogRegModel,
    out_col: str = "quality_prob",
    feature_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Append the model probability (and nothing else) to ``df``."""
    return df.withColumn(out_col, logreg_score_expr(model, feature_cols))


def quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    out_col: str = "quality_prob",
    **fit_kw,
) -> tuple[DataFrame, LogRegModel]:
    """featurize → fit → score in one call: returns (scored df, model).
    ``label_col`` is any binary column on ``df`` (e.g. membership in a
    trusted source, a human audit bit, a heuristic seed label)."""
    feat = text_quality_features(df, text_col)
    model = logreg_fit(feat, FEATURE_COLS, label_col, **fit_kw)
    return logreg_score(feat, model, out_col), model


def binary_auc(df: DataFrame, score_col: str, label_col: str) -> float:
    """Rank-based AUC (Mann-Whitney). Ties get average rank
    ((first_rank + last_rank)/2 via a RANGE frame), so the value is
    partition-layout independent.

    The unpartitioned rank window funnels rows through one task — fine
    for its purpose (scoring an EVAL set: thousands of rows), wrong for
    a full corpus; at corpus scale, sample the scores first or bin them
    (histogram-AUC) before calling this."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(score_col))
    # average rank for ties: (rank + reverse cumulative count) summed via
    # min/max ranks — (first_rank + last_rank) / 2
    ranked = df.select(
        F.col(label_col).cast("double").alias("y"),
        F.rank().over(w).alias("r_lo"),
        (
            F.count("*").over(
                Window.orderBy(F.col(score_col)).rangeBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
        ).alias("r_hi"),
    ).select("y", ((F.col("r_lo") + F.col("r_hi")) / 2.0).alias("r"))
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("r"))).alias("rp"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("np"),
        F.count("*").alias("n"),
    ).first()
    n_pos, n = int(agg["np"]), int(agg["n"])
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (float(agg["rp"]) - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
