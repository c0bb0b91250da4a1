"""Embedding generation at scale.

Reference: the CLI 3-stage async pipeline (producer → embedding worker →
COPY exporter with a failed-rows table) in lantern_cli/src/embeddings/mod.rs
(750 LoC), and the SQL surface ``llm_embedding(input, model, …, runtime)``
(lantern_extras/src/embeddings.rs:155-184) with runtimes ort/openai/cohere
(lantern_cli/src/embeddings/core/mod.rs:25-60).

Spark recast: the entire pipeline is ``mapInPandas`` — Spark's own
micro-batching replaces the channel plumbing, repartition() is the rate
control, and failures become NULL embeddings quarantined by a filter
(mirroring the failed-rows-table semantics, embeddings/mod.rs:69-83).

Runtimes here:
- ``hash``: a deterministic fake (seeded per-text gaussian from an md5
  digest, L2-normalized) — real Spark plumbing, fake model. Model
  libraries (onnxruntime / API clients) are not in this container; the
  ``ort``/``openai``/``cohere`` runtimes raise NotImplementedError at
  call time with the batch shape already correct. A deployment that has
  the libraries activates them WITHOUT editing this module:
  ``register_embedding_client(runtime, batch_fn)`` plugs the model call
  into the same dispatch the reference builds by name
  (core/mod.rs:25-60), and batching/quarantine/jobs run unchanged.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# model registry mirroring get_available_models (embeddings.rs:201-225);
# dims from the reference's ort runtime model table (ort_runtime.rs:285-300)
MODELS = {
    "BAAI/bge-small-en": ("ort", 384),
    "BAAI/bge-base-en": ("ort", 768),
    "BAAI/bge-large-en": ("ort", 1024),
    "intfloat/e5-base-v2": ("ort", 768),
    "intfloat/e5-large-v2": ("ort", 1024),
    "thenlper/gte-base": ("ort", 768),
    "thenlper/gte-large": ("ort", 1024),
    "microsoft/all-MiniLM-L12-v2": ("ort", 384),
    "microsoft/all-mpnet-base-v2": ("ort", 768),
    "clip/ViT-B-32-textual": ("ort", 512),
    "clip/ViT-B-32-visual": ("ort", 512),
    "jinaai/jina-embeddings-v2-base-en": ("ort", 768),
    "text-embedding-3-small": ("openai", 1536),
    "text-embedding-3-large": ("openai", 3072),
    "embed-english-v3.0": ("cohere", 1024),
    "hash/debug-64": ("hash", 64),
}

RUNTIMES = ("hash", "ort", "openai", "cohere")

# user-pluggable model clients, keyed by runtime — the dispatch point the
# reference builds by name (lantern_cli/src/embeddings/core/mod.rs:25-60,
# EmbeddingRuntime::new matching on runtime). The container has no
# inference deps, so ort/openai/cohere ship as raise-at-call stubs; a
# deployment that DOES have them registers a client here and the whole
# pipeline (batching, quarantine, jobs) runs unchanged — no library edit.
_EMBED_CLIENTS: dict = {}
_COMPLETION_CLIENTS: dict = {}


def register_embedding_client(runtime: str, batch_fn) -> None:
    """Wire a real model client into a runtime slot. ``batch_fn``
    receives ``(texts, model, dim)`` for one Arrow batch — texts is a
    list that may contain None — and returns one embedding list (or
    None = quarantine) per text, in order. It is captured into the UDF
    closure at call time, so it must be picklable (it ships to
    executors). Pass ``None`` to unregister."""
    if runtime not in RUNTIMES:
        raise ValueError(f"unknown runtime {runtime!r}; one of {RUNTIMES}")
    if batch_fn is None:
        _EMBED_CLIENTS.pop(runtime, None)
    else:
        _EMBED_CLIENTS[runtime] = batch_fn


def register_completion_client(runtime: str, batch_fn) -> None:
    """Completion twin of :func:`register_embedding_client`:
    ``batch_fn(texts, model, system_prompt)`` returns one string (or
    None) per text. Pass ``None`` to unregister. ``runtime`` must be a
    completion runtime (a value of COMPLETION_MODELS) — a typoed name
    would otherwise register a client ``complete()`` never dispatches
    to, failing only at call time with the stub's NotImplementedError."""
    known = sorted(set(COMPLETION_MODELS.values()))
    if runtime not in known:
        raise ValueError(f"unknown completion runtime {runtime!r}; one of {known}")
    if batch_fn is None:
        _COMPLETION_CLIENTS.pop(runtime, None)
    else:
        _COMPLETION_CLIENTS[runtime] = batch_fn


def get_available_models() -> list[str]:
    return sorted(MODELS)


def get_available_runtimes() -> list[str]:
    return list(RUNTIMES)


def _hash_embed_batch(texts: list[str | None], dim: int) -> list:
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v) or 1.0
        out.append(v.astype(np.float32).tolist())
    return out


def embed(
    df: DataFrame,
    text_col: str,
    model: str = "hash/debug-64",
    runtime: str | None = None,
    out_col: str = "embedding",
    batch_partitions: int | None = None,
) -> DataFrame:
    """``df.withColumn(out_col, embedding)`` — the whole CLI pipeline in one
    operator. Rows whose embedding fails get NULL (quarantine with
    ``quarantine_failed``). ``batch_partitions`` repartitions first — the
    rate-control knob for remote-API runtimes."""
    if model not in MODELS:
        raise ValueError(f"unknown model {model!r}; see get_available_models()")
    default_runtime, dim = MODELS[model]
    runtime = runtime or default_runtime
    if runtime not in RUNTIMES:
        raise ValueError(f"unknown runtime {runtime!r}; one of {RUNTIMES}")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    client = _EMBED_CLIENTS.get(runtime)  # driver-time capture
    if client is not None:
        @F.pandas_udf("array<float>")
        def run(s: pd.Series) -> pd.Series:
            return pd.Series(client(s.tolist(), model, dim))
    elif runtime == "hash":
        @F.pandas_udf("array<float>")
        def run(s: pd.Series) -> pd.Series:
            return pd.Series(_hash_embed_batch(s.tolist(), dim))
    else:
        @F.pandas_udf("array<float>")
        def run(s: pd.Series) -> pd.Series:
            # batch shape is real; only the model call is stubbed
            raise NotImplementedError(
                f"runtime {runtime!r} needs its model client installed; "
                "register one with register_embedding_client()"
            )

    return df.withColumn(out_col, run(F.col(text_col)))


COMPLETION_MODELS = {
    "gpt-4o": "openai",
    "gpt-4o-mini": "openai",
    "echo/debug": "echo",
}


def complete(
    df: DataFrame,
    text_col: str,
    model: str = "echo/debug",
    system_prompt: str = "",
    out_col: str = "completion",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Chat-completion column — ``llm_completion(user_prompt, model,
    system_prompt, …)`` (lantern_extras/src/embeddings.rs:129-152).

    ``echo`` runtime is a deterministic stub (system prompt + text digest)
    with the real Arrow batch shape; API runtimes raise at call time, the
    same stub-the-client pattern as :func:`embed`."""
    if model not in COMPLETION_MODELS:
        raise ValueError(f"unknown model {model!r}")
    runtime = COMPLETION_MODELS[model]
    if batch_partitions:
        df = df.repartition(batch_partitions)

    client = _COMPLETION_CLIENTS.get(runtime)  # driver-time capture
    if client is not None:
        @F.pandas_udf("string")
        def run(s: pd.Series) -> pd.Series:
            return pd.Series(client(s.tolist(), model, system_prompt))
    elif runtime == "echo":
        @F.pandas_udf("string")
        def run(s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: None if t is None
                else f"{system_prompt}|{hashlib.md5(t.encode()).hexdigest()[:12]}"
            )
    else:
        @F.pandas_udf("string")
        def run(s: pd.Series) -> pd.Series:
            raise NotImplementedError(
                f"runtime {runtime!r} needs its API client installed; "
                "register one with register_completion_client()"
            )

    return df.withColumn(out_col, run(F.col(text_col)))


def quarantine_failed(df: DataFrame, out_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """(ok, failed) split — the failed-rows-table semantics
    (embeddings/mod.rs:69-83, 267-350)."""
    return df.filter(F.col(out_col).isNotNull()), df.filter(F.col(out_col).isNull())


# ------------------------------------------------------ job-table API
# Thin metadata layer mirroring add_embedding_job / get_embedding_job_status
# (lantern_extras/src/daemon.rs:122-399). Jobs are rows; run_embedding_job
# executes one synchronously with Spark (no daemon in v0 — SURVEY §1.1).

JOBS_SCHEMA = (
    "id int, src_table string, src_column string, dst_column string, "
    "embedding_model string, runtime string, batch_size int, job_type string, "
    "status string"
)


@dataclass
class JobRegistry:
    jobs: list[dict] = field(default_factory=list)

    def add_embedding_job(
        self, src_table: str, src_column: str, dst_column: str,
        model: str = "hash/debug-64", runtime: str | None = None,
        batch_size: int | None = None,
    ) -> int:
        job_id = len(self.jobs) + 1
        self.jobs.append(
            {
                "id": job_id, "src_table": src_table, "src_column": src_column,
                "dst_column": dst_column, "embedding_model": model,
                "runtime": runtime or MODELS.get(model, ("hash",))[0],
                "batch_size": batch_size, "job_type": "embedding_generation",
                "status": "queued",
            }
        )
        return job_id

    def add_completion_job(
        self, src_table: str, src_column: str, dst_column: str,
        model: str = "echo/debug", system_prompt: str = "",
        batch_size: int | None = None,
    ) -> int:
        job_id = len(self.jobs) + 1
        self.jobs.append(
            {
                "id": job_id, "src_table": src_table, "src_column": src_column,
                "dst_column": dst_column, "embedding_model": model,
                "runtime": COMPLETION_MODELS.get(model, "echo"),
                "batch_size": batch_size, "job_type": "completion",
                "status": "queued", "system_prompt": system_prompt,
            }
        )
        return job_id

    def get_status(self, job_id: int) -> str:
        return self.jobs[job_id - 1]["status"]

    def cancel(self, job_id: int) -> None:
        self.jobs[job_id - 1]["status"] = "canceled"

    def run(self, job_id: int, df: DataFrame) -> DataFrame:
        job = self.jobs[job_id - 1]
        if job["status"] == "canceled":
            raise ValueError(f"job {job_id} is canceled")
        job["status"] = "running"
        if job["job_type"] == "completion":
            out = complete(
                df, job["src_column"], model=job["embedding_model"],
                system_prompt=job.get("system_prompt", ""),
                out_col=job["dst_column"], batch_partitions=job["batch_size"],
            )
        else:
            out = embed(
                df, job["src_column"], model=job["embedding_model"],
                runtime=job["runtime"], out_col=job["dst_column"],
                batch_partitions=job["batch_size"],
            )
        job["status"] = "done"
        return out
