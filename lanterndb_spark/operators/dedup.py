"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (its dedup-adjacent machinery is the
DISTINCT ON in hybrid search, lantern.sql:800); these extend the engine
for LLM-data curation per the build plan (SURVEY §7.8). Five tiers:

- exact: hash groupBy on content (or any column set);
- n-gram Jaccard: exact set similarity via a shingle inverted-index
  self-join — no cross join, scales as Σ posting² per shingle;
- MinHash + LSH: signature = per-hash-seed min over shingles (pure
  Catalyst — ``F.hash(shingle, seed)`` is JVM murmur); banding buckets
  candidate pairs, exact Jaccard verifies; the standard 100 TB dedup path;
- SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dup =
  small hamming distance, candidates via pigeonhole band join;
- embedding cosine: semantic near-dup via threshold self-join (brute for
  oracle-checkable small scale; random-hyperplane LSH bucketing as the
  scale path).

Every pair-producing operator returns (id_a, id_b [, score]) with
id_a < id_b, deduped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lanterndb_spark.functions.distance import cos_dist
from lanterndb_spark.functions.text import tokenize


# ------------------------------------------------------------ exact

def exact_dedup(
    df: DataFrame, on: list[str] | str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per duplicate group (the ``keep`` extreme of id_col).
    Pure groupBy — one shuffle on the content hash at any scale."""
    on = [on] if isinstance(on, str) else on
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    keeper = df.groupBy(*on).agg(agg.alias(id_col))
    return df.join(keeper, on=on + [id_col], how="inner")


def duplicate_groups(df: DataFrame, on: list[str] | str, id_col: str) -> DataFrame:
    """(content cols, n_dups, ids) for groups with more than one row."""
    on = [on] if isinstance(on, str) else on
    return (
        df.groupBy(*on)
        .agg(
            F.count("*").cast("int").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ----------------------------------------------------------- shingles

def word_shingles(col, n: int = 3) -> Column:
    """Distinct word n-grams of the tokenized text (array<string>)."""
    toks = tokenize(col, stopwords=None)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(
            F.when(F.size(toks) > 0, F.array(F.array_join(toks, " "))).otherwise(
                F.array().cast("array<string>")
            )
        )
    )


# ----------------------------------------------- exact n-gram Jaccard

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with Jaccard(shingles_a, shingles_b) >= threshold, via
    shingle inverted-index self-join (explode → join on shingle → count
    common → |A|+|B|-common). No cross join: cost is bounded by posting
    list sizes, and hot shingles can be dropped like BM25 drops hot terms."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    ).withColumn("sz", F.size("sh"))
    sizes = sh.select("id", "sz")
    ex = sh.select("id", F.explode("sh").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return out


# --------------------------------------------------------- MinHash LSH

def minhash_signature_expr(sh_col, num_hashes: int = 64) -> Column:
    """MinHash signature over an ALREADY-MATERIALIZED shingle column:
    sig[i] = min over shingles of murmur3(shingle, seed=i). Pure Catalyst.

    Always project the shingle expression into its own column first —
    inlining word_shingles here would duplicate the whole tokenize+ngram
    tree num_hashes times in the plan (measured 25x slowdown)."""
    sh = F.col(sh_col) if isinstance(sh_col, str) else sh_col
    return F.array(
        *[F.array_min(F.transform(sh, lambda g: F.hash(g, F.lit(i)))) for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, n: int = 3
) -> DataFrame:
    """(id, sig array<int>) — shingles materialized once, then hashed."""
    return (
        df.select(F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh"))
        .select("id", minhash_signature_expr("sh", num_hashes).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH.

    bands×rows = num_hashes; a pair lands in a candidate bucket if any
    band of its signatures matches exactly (P ≈ 1-(1-j^r)^b). Candidates
    are then verified with exact Jaccard when ``verify`` (what you want at
    100 TB: LSH prunes the quadratic space, exact check keeps precision).
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(*[F.col("sig")[bi * r + j] for j in range(r)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("s"),
    ).select("id", "s.band", "s.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["band", "bh"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return cand
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    out = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ------------------------------------------------------------ SimHash

def simhash_expr(hashes_col, bits: int = 64) -> Column:
    """SimHash fingerprint (bigint) over an ALREADY-MATERIALIZED column of
    64-bit token hashes: per bit position, sum +1/-1 votes; sign → bit.
    Like minhash_signature_expr, the hash column must be projected first or
    the token-hash tree is duplicated ``bits`` times in the plan."""
    hashes = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        for i in range(bits)
    ]
    out = F.lit(0).cast("bigint")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(F.lit(0).cast("bigint"))
    return out


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, fp bigint): tokenize → 64-bit token hashes (two seeded murmurs)
    materialized once → sign-aggregated fingerprint."""
    toks = tokenize(text_col, stopwords=None)
    h64 = lambda t: (
        F.hash(t, F.lit(0)).cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF))
        .bitwiseOR(F.shiftleft(F.hash(t, F.lit(1)).cast("bigint").bitwiseAND(F.lit(0xFFFFFFFF)), 32))
    )
    return (
        df.select(F.col(id_col).alias("id"), F.transform(toks, h64).alias("hs"))
        .select("id", simhash_expr("hs", bits).alias("fp"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into ``chunks``
    16-bit chunks; any pair within hamming d < chunks must agree exactly
    on ≥1 chunk → join on (chunk_id, chunk_value), verify with popcount.
    """
    width = 64 // chunks
    fp = simhash_fingerprints(df, id_col, text_col)
    chunked = fp.select(
        "id", "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("fp", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("s"),
    ).select("id", "fp", "s.chunk", "s.cv")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(b, on=["chunk", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------- embedding cosine near-dup

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    max_cos_dist: float = 0.05,
    method: str = "brute",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Semantic near-dup pairs: cos_dist(a,b) <= max_cos_dist.

    method='brute': full self-join — exact, oracle-checkable, O(n²):
    fine up to ~10⁵ rows / for verification samples.
    method='lsh': random-hyperplane signatures bucket the join (pairs
    agreeing on all sign bits); loses recall near bucket boundaries but
    prunes the quadratic blowup — the 100 TB path.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if method == "lsh":
        import numpy as np

        rng = np.random.default_rng(seed)
        dim = len(base.select("v").first()["v"])
        planes = rng.standard_normal((n_planes, dim))
        sig = F.concat(
            *[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            F.col("v").cast("array<double>"),
                            F.array(*[F.lit(float(x)) for x in planes[p]]),
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0"))
                for p in range(n_planes)
            ]
        )
        base = base.withColumn("bucket", sig)
        join_on = ["bucket"]
    else:
        base = base.withColumn("bucket", F.lit(0))
        join_on = ["bucket"]
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, on=join_on)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos_dist(F.col("a.v"), F.col("b.v")).alias("cos_dist"),
        )
        .filter(F.col("cos_dist") <= F.lit(float(max_cos_dist)))
    )
