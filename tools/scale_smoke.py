#!/usr/bin/env python
"""Scale smoke: run the headline operators on synthetic data 1-2 orders
of magnitude beyond the driver SF, and record wall-clock + the plan
properties that must hold for the 100 TB posture.

The testdata tops out at 2k vectors / 5k docs; pathologies that matter at
cluster scale (skew, quadratic fan-out, codegen cliffs, per-row Python)
only show up with more rows. This generates:

- embeddings: N_VEC rows x DIM float32 (seeded gaussian, JVM-side rand)
- documents: N_DOC rows of zipf-ish token text with planted near-dups
  and a deliberately hot token (~40% of docs) to exercise the salted
  postings build and the jaccard hot-shingle cap

under spark-warehouse/scale_smoke/ (inside the repo; .gitignored), then
times each operator end-to-end. Results go to stdout as one JSON line —
paste the numbers into DESIGN.md when they move.

Usage: python tools/scale_smoke.py [--vec N] [--doc N]  (defaults 200k/50k)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lanterndb_spark.session import get_spark

WAREHOUSE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark-warehouse", "scale_smoke",
)

# ~100-word vocabulary; token 'hot' is planted into ~40% of docs below to
# make a skewed posting list on purpose
VOCAB = [f"tok{i}" for i in range(100)] + ["hot"]


def gen(spark, n_vec: int, n_doc: int, dim: int = 64, force: bool = False):
    vec_path = os.path.join(WAREHOUSE, f"emb_{n_vec}_{dim}")
    doc_path = os.path.join(WAREHOUSE, f"doc_{n_doc}_v2")
    if force or not os.path.exists(vec_path):
        (
            spark.range(n_vec).withColumnRenamed("id", "vec_id")
            .withColumn(
                "embedding",
                F.transform(
                    F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: F.randn(42) .cast("float"),
                ),
            )
            .withColumn("label", F.pmod(F.col("vec_id"), F.lit(7)).cast("int"))
            .repartition(32)
            .write.mode("overwrite").parquet(vec_path)
        )
    if force or not os.path.exists(doc_path):
        # 20-40 tokens per doc, zipf-ish draw (squared uniform → the low
        # vocab ids dominate, so most shingles are hot); 40% of docs get
        # the 'hot' token on top. NOTE (round 4): random zipf draws do NOT
        # produce true 3-gram near-dups — measured exact Jaccard of every
        # banding candidate is < 0.2 — so 2% of docs get an explicitly
        # PLANTED twin (one appended token, shingle Jaccard ~0.85+) at
        # doc_id + n_doc; dedup ops assert on finding them.
        base = (
            spark.range(n_doc).withColumnRenamed("id", "doc_id")
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            (F.lit(20) + F.pmod(F.xxhash64("doc_id"), F.lit(21))).cast("int"),
                        ),
                        # zipf-ish: square the uniform draw to skew low ids
                        lambda i: F.element_at(
                            F.array(*[F.lit(v) for v in VOCAB]),
                            (
                                F.pow(F.rand(7), F.lit(2.0)) * F.lit(len(VOCAB) - 1)
                            ).cast("int") + 1,
                        ),
                    ),
                ),
            )
            .withColumn(
                "text",
                F.when(
                    F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(5)) < 2,
                    F.concat_ws(" ", "text", F.lit("hot")),
                ).otherwise(F.col("text")),
            )
        )
        twins = (
            base.filter(F.pmod(F.col("doc_id"), F.lit(50)) == 0)
            .select(
                (F.col("doc_id") + F.lit(n_doc)).alias("doc_id"),
                F.concat_ws(" ", "text", F.lit("twinmark")).alias("text"),
            )
        )
        base.unionByName(twins).repartition(32).write.mode("overwrite").parquet(doc_path)
    return spark.read.parquet(vec_path), spark.read.parquet(doc_path)


def gen_events(spark, n_evt: int, n_user: int = 10_000, force: bool = False):
    """Synthetic clickstream: n_evt rows over n_user users across 30 days,
    hash-scattered timestamps (unsorted on disk, like real ingest)."""
    path = os.path.join(WAREHOUSE, f"evt_{n_evt}")
    if force or not os.path.exists(path):
        month_us = 30 * 24 * 3600 * 1_000_000
        (
            spark.range(n_evt).withColumnRenamed("id", "event_id")
            .withColumn("user_id", F.pmod(F.xxhash64("event_id"), F.lit(n_user)))
            .withColumn(
                "ts",
                F.timestamp_micros(
                    F.lit(1_704_067_200_000_000)  # 2024-01-01
                    + F.pmod(F.xxhash64("event_id", F.lit(2)), F.lit(month_us))
                ),
            )
            .withColumn(
                "event_type",
                F.element_at(
                    F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                            F.lit("error"), F.lit("signup")),
                    F.pmod(F.xxhash64("event_id", F.lit(3)), F.lit(5)).cast("int") + 1,
                ),
            )
            .withColumn("value", (F.pmod(F.xxhash64("event_id", F.lit(4)), F.lit(10_000)) / 100.0))
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        )
    return spark.read.parquet(path)


_SPARK = None  # set in main; used by the shuffle-byte snapshot


def _shuffle_totals():
    """(read_bytes, write_bytes) summed over all completed stages via the
    UI REST API (spark.ui.enabled=true in this tool's session only).
    Returns (0, 0) when the UI is unreachable — telemetry, never a
    failure source."""
    try:
        import json as _json
        import urllib.request

        sc = _SPARK.sparkContext
        url = sc.uiWebUrl
        if not url:
            return (0, 0)
        data = _json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{sc.applicationId}/stages?status=complete",
                timeout=10,
            )
        )
        return (
            sum(s.get("shuffleReadBytes", 0) for s in data),
            sum(s.get("shuffleWriteBytes", 0) for s in data),
        )
    except Exception:  # noqa: BLE001
        return (0, 0)


def timed(label, fn, out):
    r0, w0 = _shuffle_totals()
    t0 = time.monotonic()
    n = fn()
    dt = round(time.monotonic() - t0, 2)
    r1, w1 = _shuffle_totals()
    rec = {"s": dt}
    if (r1, w1) != (0, 0):
        rec["shuffle_read_mb"] = round((r1 - r0) / 1e6, 1)
        rec["shuffle_write_mb"] = round((w1 - w0) / 1e6, 1)
    out[label] = rec
    print(
        f"  {label}: {dt}s"
        + (f" ({n} rows)" if isinstance(n, int) else "")
        + (f" [shfl r {rec.get('shuffle_read_mb', '?')}MB"
           f" w {rec.get('shuffle_write_mb', '?')}MB]"),
        file=sys.stderr,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vec", type=int, default=200_000)
    ap.add_argument("--doc", type=int, default=50_000)
    ap.add_argument("--evt", type=int, default=2_000_000)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    global _SPARK
    spark = get_spark(
        app_name="scale-smoke", extra_conf={"spark.ui.enabled": "true"}
    )
    _SPARK = spark
    spark.sparkContext.setLogLevel("ERROR")
    emb, docs = gen(spark, args.vec, args.doc, force=args.force)
    events = gen_events(spark, args.evt, force=args.force)
    emb.cache().count(); docs.cache().count(); events.cache().count()

    from lanterndb_spark.operators.bm25 import build_postings, search_bm25
    from lanterndb_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from lanterndb_spark.operators.ivf import build_ivf, ivf_search
    from lanterndb_spark.operators.knn import knn, knn_join
    from lanterndb_spark.operators.pq import quantize, train_codebook
    from lanterndb_spark.plans.shape import release

    qv = [float(x) for x in emb.first()["embedding"]]
    out: dict = {}
    quality: dict = {}

    timed(f"knn_{args.vec // 1000}k", lambda: len(knn(emb, "embedding", qv, k=10, id_col="vec_id").collect()), out)

    def ivf_job():
        idx = build_ivf(emb, "embedding", nlist=64, seed=42)
        idx.assigned.cache().count()
        r = len(ivf_search(idx, qv, k=10, nprobe=8, id_col="vec_id").collect())
        idx.assigned.unpersist()
        return r

    timed("ivf_build_search", ivf_job, out)

    def hnsw_job():
        # graph backend at scale: ~25k rows per shard graph (bounded
        # executor-local artifacts), batch search = one beam per shard.
        # Planted check: recall@10 >= 0.95 on 5 sampled queries at the
        # reference's default ef
        from lanterndb_spark.operators.autotune import (
            _collect_by_query, exact_topk_batch, recall_at_k, sample_queries)
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_batch

        idx = build_hnsw(
            emb, "embedding", id_col="vec_id", m=16, ef_construction=64,
            seed=42,
        )
        qs = sample_queries(emb, "embedding", n=5, seed=7)
        got = _collect_by_query(hnsw_search_batch(idx, qs, k=10, ef=64), "vec_id")
        truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
        rec = sum(
            recall_at_k(got.get(i, []), truth.get(i, [])) for i in range(len(qs))
        ) / len(qs)
        idx.graphs.unpersist()
        assert rec >= 0.95, f"hnsw recall@10 {rec} < 0.95 at scale"
        quality["hnsw_recall_at_10"] = round(rec, 4)
        return int(rec * 1000)

    timed(f"hnsw_build_search_{args.vec // 1000}k", hnsw_job, out)

    def knn_join_job():
        qdf = emb.limit(64).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
        return len(knn_join(emb, "embedding", qdf, "qv", k=10, id_col="vec_id").collect())

    timed("knn_join_64q", knn_join_job, out)

    def pq_job():
        cb = train_codebook(emb, "embedding", splits=8, clusters=16, seed=42)
        return quantize(emb, "embedding", cb).count()

    timed("pq_train_encode", pq_job, out)

    timed("bm25_build_hot", lambda: build_postings(docs).count(), out)
    timed(
        "bm25_search", lambda: len(search_bm25(docs, "tok3 tok17 hot", limit=10).collect()), out
    )

    n_twins = docs.filter(F.col("doc_id") >= args.doc).count()

    def minhash_job():
        p = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, verify="auto")
        n = p.count()
        release(p)
        # every planted twin pair (J ~0.85; detection P ~1 at 16x4 bands)
        # must surface and exact-verify
        assert n >= int(0.9 * n_twins), f"planted twins missed: {n}/{n_twins}"
        return n

    timed(f"minhash_auto_{args.doc // 1000}k", minhash_job, out)

    def minhash_scope_job(scope):
        def job():
            p = minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.5, verify="exact",
                verify_scope=scope,
            )
            n = p.count()
            release(p)
            assert n >= int(0.9 * n_twins), f"{scope}: twins missed {n}/{n_twins}"
            return n
        return job

    # verify_scope crossover (VERDICT r4 item 7): corpus-scope re-reads
    # every doc's shingles for the exact verify; candidates-scope
    # semi-joins the re-scan down to candidate ids first. The crossover
    # SF is where candidates wins — record both and diff.
    timed("minhash_exact_corpus_scope", minhash_scope_job("corpus"), out)
    timed("minhash_exact_cand_scope", minhash_scope_job("candidates"), out)

    def jaccard_job():
        # hot token shared by 40% of docs -> without the cap this join
        # would fan out ~ (0.4*n_doc)^2 rows from that one posting.
        # Planted-twin overlap lives mostly in NON-hot shingles, so the
        # capped exact path must still find nearly all of them (round-4
        # correction: the old "capped exact found 0 of 132k" note compared
        # against phantom pairs from the pre-decorrelation estimator)
        p = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_posting=1000)
        n = p.count()
        release(p)
        assert n >= int(0.8 * n_twins), f"planted twins missed by capped jaccard: {n}/{n_twins}"
        return n

    timed(f"jaccard_capped_{args.doc // 1000}k", jaccard_job, out)

    def jaccard_prefix_job():
        # prefix filtering prunes the same hot-posting cliff WITHOUT the
        # cap's recall loss: exact join, so it must find >= the capped
        # count and every planted twin
        from lanterndb_spark.operators.dedup import jaccard_pairs_prefix

        p = jaccard_pairs_prefix(docs, "doc_id", "text", n=3, threshold=0.5)
        n = p.count()
        release(p)
        assert n >= int(0.9 * n_twins), f"planted twins missed by prefix join: {n}/{n_twins}"
        return n

    timed(f"jaccard_prefix_{args.doc // 1000}k", jaccard_prefix_job, out)

    from lanterndb_spark.operators.temporal import asof_join, range_join

    def asof_job():
        # ~400k clicks pick up the latest of ~400k purchases per user:
        # one |L|+|R| shuffle on user_id, window state = one struct
        clicks = events.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts")
        purch = events.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value")
        return asof_join(clicks, purch, on="ts", by="user_id",
                         tolerance=86400.0).count()

    timed(f"asof_{args.evt // 1000}k_evt", asof_job, out)

    def range_job():
        # 200 ten-minute windows against every event: bucketed hash join,
        # NOT a nested loop — candidate rows ≈ points + 2 bins/window
        windows = (events.filter(F.col("event_type") == "error")
                   .orderBy(F.col("ts").asc(), F.col("event_id").asc()).limit(200)
                   .select(F.col("event_id").alias("wid"), F.col("ts").alias("lo"),
                           (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi")))
        return range_join(events.select("event_id", "ts"), windows,
                          "ts", "lo", "hi").count()

    timed(f"range_join_{args.evt // 1000}k_evt", range_job, out)

    def para_job():
        # 50k docs -> ~125k 16-token chunks -> global hash dedup + reassembly
        from lanterndb_spark.operators.paragraphs import remove_duplicate_paragraphs

        return remove_duplicate_paragraphs(docs, chunk_tokens=16, sep=" ").count()

    timed(f"para_dedup_{args.doc // 1000}k_doc", para_job, out)

    def spans_job():
        # substring-level dedup at 50k docs: postings = one row per
        # 10-token window (hashes, not strings, cross the shuffle); every
        # planted twin shares its >= 20-token base with its source, so
        # both sides MUST carry a repeated span
        from lanterndb_spark.operators.spans import repeated_spans

        sp = repeated_spans(docs, "doc_id", "text", min_len=10, min_docs=2)
        twin_docs = (
            sp.filter(F.col("doc_id") >= args.doc).select("doc_id").distinct().count()
        )
        n = sp.count()
        release(sp)
        assert twin_docs >= int(0.9 * n_twins), (
            f"planted twins missing repeated spans: {twin_docs}/{n_twins}"
        )
        return n

    timed(f"repeated_spans_{args.doc // 1000}k_doc", spans_job, out)

    def span_ingest_job():
        # streaming span dedup: base corpus in batch 1 builds the gram
        # store; the twins arrive in batch 2 and every one must flag at
        # arrival (each shares its >= 20-token base with a stored doc)
        from lanterndb_spark.streaming.spans import span_dedup_ingest_stream

        ingest = span_dedup_ingest_stream("doc_id", "text", min_len=10, min_docs=2)
        w = ingest.writer()
        w(docs.filter(F.col("doc_id") < args.doc), 0)
        w(docs.filter(F.col("doc_id") >= args.doc), 1)
        flagged = (
            ingest.all_spans().filter(F.col("doc_id") >= args.doc)
            .select("doc_id").distinct().count()
        )
        assert flagged >= int(0.9 * n_twins), (
            f"arriving twins not flagged: {flagged}/{n_twins}"
        )
        return ingest.all_spans().count()

    timed(f"span_ingest_2batch_{args.doc // 1000}k", span_ingest_job, out)

    def hnsw_ingest_job():
        # streaming GRAPH ingest at scale (VERDICT r6 item 7): build on
        # 3/4 of the vectors, stream the last quarter in 4 micro-batches
        # through hnsw_insert's cogroup; per-batch wall recorded, then
        # stream==batch equality: a full-probe search over the grown
        # index must equal the exact knn over ALL vectors. With the
        # untouched-shard passthrough, each batch costs O(touched
        # shards) — at this tier every shard is touched (uniform ids),
        # so the meaningful number is wall per batch vs the full build.
        from lanterndb_spark.operators.hnsw import build_hnsw, hnsw_search_batch
        from lanterndb_spark.streaming.hnsw import hnsw_ingest_stream

        cut = int(args.vec * 3 / 4)
        base = emb.filter(F.col("vec_id") < cut)
        t0 = time.time()
        idx = build_hnsw(
            base, "embedding", id_col="vec_id", m=16, ef_construction=64,
            seed=42,
        )
        quality["hnsw_ingest_base_build_s"] = round(time.time() - t0, 1)
        ingest = hnsw_ingest_stream(idx)
        w = ingest.writer()
        step = (args.vec - cut + 3) // 4
        walls = []
        for b in range(4):
            lo = cut + b * step
            hi = min(args.vec, lo + step)
            tb = time.time()
            w(emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
              .select("vec_id", "embedding"), b)
            walls.append(round(time.time() - tb, 1))
        quality["hnsw_ingest_batch_walls_s"] = walls
        total = ingest.index.graphs.agg(F.sum("n")).first()[0]
        assert total == args.vec, f"grown index holds {total} != {args.vec}"
        # stream==batch: full probe over ONE sampled query == exact knn
        from lanterndb_spark.operators.autotune import (
            _collect_by_query, exact_topk_batch, sample_queries)
        qs = sample_queries(emb, "embedding", n=2, seed=7)
        got = _collect_by_query(
            hnsw_search_batch(ingest.index, qs, k=10, ef=64), "vec_id")
        truth = exact_topk_batch(emb, "embedding", qs, k=10, id_col="vec_id")
        from lanterndb_spark.operators.autotune import recall_at_k
        rec = sum(recall_at_k(got.get(i, []), truth.get(i, []))
                  for i in range(len(qs))) / len(qs)
        ingest.index.graphs.unpersist()
        assert rec >= 0.9, f"post-ingest recall {rec} < 0.9"
        quality["hnsw_ingest_recall_at_10"] = round(rec, 3)
        return int(total)

    timed(f"hnsw_ingest_4batch_{args.vec // 1000}k", hnsw_ingest_job, out)

    def project_job():
        # 200k x 64 -> 16 JL projection: closure-shipped matrix, one
        # numpy matmul per Arrow batch, zero shuffle
        from lanterndb_spark.operators.project import project_embeddings

        return (
            project_embeddings(emb, "embedding", 16, seed=42, in_dim=64)
            .agg(F.sum(F.element_at("proj", 1))).collect()
        )

    timed(f"jl_project_{args.vec // 1000}k", project_job, out)

    def sketch_job():
        # per (type, day) HLL states over the event stream, rolled to type
        from lanterndb_spark.functions.sketches import hll_rollup, hll_sketches

        fine = hll_sketches(
            events.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
        )
        return hll_rollup(fine, "event_type").count()

    timed(f"hll_rollup_{args.evt // 1000}k_evt", sketch_job, out)

    def repetition_job():
        from lanterndb_spark.functions.text import repetition_signals

        return docs.select("doc_id", *repetition_signals(F.col("text"))).agg(
            F.avg("dup_bigram_frac")
        ).count()

    timed(f"repetition_{args.doc // 1000}k_doc", repetition_job, out)

    def split_cap_job():
        from lanterndb_spark.operators.sampling import cap_per_group, hash_split

        s = hash_split(docs, "doc_id").groupBy("split").count().count()
        c = cap_per_group(
            docs.withColumn("src", F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(50))),
            "src", "doc_id", 100,
        ).count()
        return s + c

    timed(f"split_cap_{args.doc // 1000}k_doc", split_cap_job, out)

    def decontam_job():
        # every 37th doc plays the benchmark; zipf text guarantees heavy
        # 5-gram collisions, so the hit join actually carries rows
        from lanterndb_spark.operators.contamination import decontaminate

        bench = docs.filter(F.col("doc_id") % 37 == 0)
        corpus = docs.filter(F.col("doc_id") % 37 != 0)
        return decontaminate(corpus, bench, n=5).filter("contaminated").count()

    timed(f"decontam_{args.doc // 1000}k_doc", decontam_job, out)

    def pack_job():
        from lanterndb_spark.operators.packing import pack_contiguous

        return pack_contiguous(docs, budget=2048, n_buckets=256).count()

    timed(f"pack_{args.doc // 1000}k_doc", pack_job, out)

    def pii_job():
        from lanterndb_spark.functions.pii import scrub

        return scrub(docs).filter("has_pii").count()

    timed(f"pii_scrub_{args.doc // 1000}k_doc", pii_job, out)

    def balance_job():
        from lanterndb_spark.operators.balance import cluster_balance

        return cluster_balance(emb, nlist=64, quota=500).count()

    timed(f"cluster_balance_{args.vec // 1000}k_vec", balance_job, out)

    def minhash_hotbucket_job():
        # adversarial input for the LSH bucket cap: a boilerplate blob
        # duplicated 20k times. Uncapped, EVERY band bucket holds all 20k
        # copies -> 16 bands x 2*10^8 pair rows; capped, the star emits
        # 20k-1 pairs per band pre-distinct and the group still resolves.
        blob = spark.range(20_000).select(
            F.col("id").alias("doc_id"),
            F.lit("boiler plate legal disclaimer repeated verbatim across "
                  "every page of the crawl forever and ever").alias("text"),
        ).unionByName(
            docs.limit(5_000).select(
                (F.col("doc_id") + 100_000).alias("doc_id"), "text")
        )
        p = minhash_lsh_pairs(blob, "doc_id", "text", threshold=0.5,
                              verify="estimate", max_bucket=1_000)
        n = p.count()
        release(p)
        assert n >= 19_999, f"boilerplate group did not resolve: {n}"
        return n

    timed("minhash_hotbucket_20k_dups", minhash_hotbucket_job, out)

    def bucketed_join_job():
        # co-located layout: pay the one-time bucketed write, then the
        # repeated join on the key plans with zero Exchange
        from lanterndb_spark.sources.bucketed import (
            drop_bucketed, is_colocated_join, read_bucketed, write_bucketed)

        write_bucketed(docs, "smoke_docs_b", "doc_id", buckets=32)
        write_bucketed(
            emb.select(F.col("vec_id").alias("doc_id"), "label"),
            "smoke_lab_b", "doc_id", buckets=32)
        left, right = read_bucketed(spark, "smoke_docs_b"), read_bucketed(spark, "smoke_lab_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert is_colocated_join(left, right, "doc_id"), "bucketed join re-shuffled"
            n = left.join(right, "doc_id").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            drop_bucketed(spark, "smoke_docs_b")
            drop_bucketed(spark, "smoke_lab_b")
        return n

    timed(f"bucketed_join_{args.doc // 1000}k_doc", bucketed_join_job, out)

    # ingest shape: a 5% new batch against stored signatures of the other
    # 95% — corpus text untouched, batch band keys broadcast. The stored
    # signature table is built OUTSIDE the timed window (it exists before
    # the batch arrives, by definition of the ingest scenario).
    from lanterndb_spark.operators.dedup import (
        minhash_lsh_incremental, minhash_signatures)

    _inc_old = docs.filter(F.col("doc_id") % 20 != 0)
    _inc_new = docs.filter(F.col("doc_id") % 20 == 0)
    _inc_sigs = minhash_signatures(_inc_old, "doc_id", "text").cache()
    _inc_sigs.count()  # the "stored" table

    def minhash_incremental_job():
        p = minhash_lsh_incremental(_inc_sigs, _inc_new, "doc_id", "text", threshold=0.5)
        n = p.count()
        release(p)
        return n

    timed(f"minhash_incremental_{args.doc // 20000}k_new", minhash_incremental_job, out)
    _inc_sigs.unpersist()

    def semdedup_ann_job():
        # ANN-backed semantic dedup at scale: cos HNSW with CLUSTER
        # routing, corpus re-queried as a DataFrame, nprobe bounds the
        # per-query cost (n x nprobe shard visits, never n x shards).
        # Planted check: 1% direction-preserving twins (cos_dist = 0;
        # twin routes to its source's cell by construction) must ALL
        # surface as pairs.
        from lanterndb_spark.operators.dedup import embedding_near_dup_pairs

        sem_n = min(args.vec, 500_000)  # every doc queries the graph, so
        sem = emb.filter(F.col("vec_id") < sem_n)  # bound the job's wall
        n_twin = sem_n // 100
        src = sem.filter(F.col("vec_id") < n_twin)
        twins = src.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x * F.lit(2.0),
            ).alias("embedding"),
        )
        corpus = (
            sem.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
            .unionByName(twins)
        )
        pairs = embedding_near_dup_pairs(
            corpus, "vec_id", "embedding", max_cos_dist=0.05, method="ann",
            k_neighbors=3, nprobe=4,
            index_params={"routing": "cluster"},
        )
        found = {
            (r["id_a"], r["id_b"])
            for r in pairs.filter(F.col("id_b") >= 10_000_000).collect()
        }
        release(pairs)
        want = {(i, i + 10_000_000) for i in range(n_twin)}
        missing = len(want - found)
        assert not missing, f"semdedup: {missing}/{n_twin} planted twins missed"
        quality["semdedup_twin_recall"] = 1.0
        return len(found)

    timed(f"semdedup_ann_{min(args.vec, 500_000) // 1000}k", semdedup_ann_job, out)

    print(json.dumps({"n_vec": args.vec, "n_doc": args.doc, "n_evt": args.evt,
                      "timings": out, "quality": quality}))
    spark.stop()


if __name__ == "__main__":
    main()
