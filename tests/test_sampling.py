"""Deterministic sampling: reproducibility, fraction accuracy, plan shape."""

from pyspark.sql import functions as F

from lanterndb_spark.operators.sampling import (
    cap_per_group,
    hash_bucket,
    hash_split,
    stratified_sample,
)


def test_split_is_deterministic_and_partition_independent(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(df.repartition(13, "k").sortWithinPartitions(F.desc("k")), "k").collect()
    }
    assert a == b


def test_split_fractions_land(spark):
    df = spark.range(50_000).withColumnRenamed("id", "k")
    got = {
        r["split"]: r["n"]
        for r in hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {"train", "val", "test"}
    assert abs(got["train"] / 50_000 - 0.8) < 0.01
    assert abs(got["val"] / 50_000 - 0.1) < 0.005
    # every row lands in exactly one split
    assert sum(got.values()) == 50_000


def test_salt_changes_assignment(spark):
    df = spark.range(2_000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s1").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k", salt="s2").collect()}
    assert a != b


def test_split_is_pure_projection(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    plan = hash_split(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_fractions(spark, tables):
    docs = tables["documents"]
    out = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.0}, "doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "de" not in langs
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.filter(F.col("lang") == "en").count() == n_en


def test_cap_per_group_keeps_first_by_order(spark, tables):
    docs = tables["documents"]
    capped = cap_per_group(docs, "source", "doc_id", 5)
    per = capped.groupBy("source").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).collect()
    firsts = {
        r["source"]: r["ids"]
        for r in docs.groupBy("source")
        .agg(F.slice(F.array_sort(F.collect_list("doc_id")), 1, 5).alias("ids"))
        .collect()
    }
    kept = {
        r["source"]: sorted(x["doc_id"] for x in capped.filter(F.col("source") == r["source"]).select("doc_id").collect())
        for r in per
    }
    for src, n_kept in ((r["source"], r["n"]) for r in per):
        assert n_kept <= 5
        assert kept[src] == firsts[src]


def test_cap_per_group_is_window_group_limit(spark, tables):
    plan = (
        cap_per_group(tables["documents"], "source", "doc_id", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_bucket_matches_duckdb(spark):
    """Engine-independence is the point: DuckDB computes the same buckets."""
    import duckdb

    ks = [str(i) for i in range(200)]
    df = spark.createDataFrame([(k,) for k in ks], "k string")
    got = {r["k"]: r["b"] for r in df.select("k", hash_bucket("k", 1000).alias("b")).collect()}
    con = duckdb.connect()
    for k in ks:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5(?),1,8)) AS BIGINT) % 1000", [k]
        ).fetchone()[0]
        assert got[k] == want


def test_mix_to_weights_proportions_and_determinism(tables):
    from lanterndb_spark.operators.sampling import mix_to_weights

    docs = tables["documents"]
    weights = {"en": 0.5, "de": 0.2, "es": 0.15, "fr": 0.1, "zh": 0.05}
    out = mix_to_weights(docs, "lang", weights, "doc_id")
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    n_in = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    total_cap = min(n_in[d] / w for d, w in weights.items())
    # the limiting domain keeps ~all rows, and every observed share is
    # within hash noise of its target (loose: ±40% relative at sf0.001)
    tot = sum(by_lang.values())
    for d, w in weights.items():
        target = w * total_cap
        assert by_lang.get(d, 0) <= n_in[d]
        assert abs(by_lang.get(d, 0) - target) <= max(6, 0.4 * target), (d, by_lang, target)
    assert tot <= sum(n_in.values())
    # deterministic under repartition
    again = mix_to_weights(docs.repartition(7), "lang", weights, "doc_id")
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in again.select("doc_id").collect())
    assert a == b


def test_mix_to_weights_drops_unweighted_domains(tables):
    from lanterndb_spark.operators.sampling import mix_to_weights

    docs = tables["documents"]
    out = mix_to_weights(docs, "lang", {"en": 1.0}, "doc_id")
    assert {r["lang"] for r in out.select("lang").distinct().collect()} == {"en"}


def test_leakage_safe_split_groups_stay_together(spark, tables):
    from lanterndb_spark.operators.sampling import hash_split, leakage_safe_split

    docs = tables["documents"].select("doc_id")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    out = leakage_safe_split(docs, "doc_id", pairs).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    # connected docs share a split
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    # un-paired docs fall back to plain hash_split assignment
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").collect()
    }
    for d in split:
        if d not in (0, 1, 2, 10, 11):
            assert split[d] == plain[d]
    # component members adopt the REPRESENTATIVE's plain assignment
    assert split[0] == plain[0] and split[10] == plain[10]


def test_token_budget_sample_monotone_prefix(spark, tables):
    from lanterndb_spark.operators.sampling import token_budget_sample

    docs = tables["documents"].select("doc_id", "n_chars")
    small = {r["doc_id"] for r in token_budget_sample(docs, "doc_id", "n_chars", 20_000).collect()}
    big = {r["doc_id"] for r in token_budget_sample(docs, "doc_id", "n_chars", 60_000).collect()}
    assert small and small < big
    # budget respected
    total = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    assert sum(total[d] for d in small) <= 20_000
    # deterministic
    again = {r["doc_id"] for r in token_budget_sample(docs, "doc_id", "n_chars", 20_000).collect()}
    assert small == again


# ------------------------------------------- weighted sampling (A-ES)

def test_weighted_sample_deterministic_and_capped(spark, tables):
    from lanterndb_spark.operators.sampling import weighted_sample

    docs = tables["documents"].select("doc_id", "lang", "n_chars")
    a = weighted_sample(docs, "doc_id", "n_chars", k=5, group_cols=["lang"])
    b = weighted_sample(docs.repartition(7), "doc_id", "n_chars", k=5,
                        group_cols=["lang"])
    got_a = {(r["doc_id"],) for r in a.collect()}
    got_b = {(r["doc_id"],) for r in b.collect()}
    assert got_a == got_b            # partitioning-independent
    from pyspark.sql import functions as F
    per = a.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)


def test_weighted_sample_weight_bias(spark):
    from lanterndb_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) + 200 heavy rows (w=100): heavy rows must
    # dominate the sample
    rows = [(i, 1.0) for i in range(200)] + [(i + 200, 100.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, w double")
    got = weighted_sample(df, "id", "w", k=50).collect()
    heavy = sum(1 for r in got if r["id"] >= 200)
    assert heavy >= 40  # expectation ~49.7 of 50


def test_weighted_sample_salt_changes_draw(spark):
    from lanterndb_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, 1.0) for i in range(100)], "id int, w double")
    a = {r["id"] for r in weighted_sample(df, "id", "w", k=10, salt="a").collect()}
    b = {r["id"] for r in weighted_sample(df, "id", "w", k=10, salt="b").collect()}
    assert a != b


def test_weighted_sample_drops_bad_weights(spark):
    from lanterndb_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None)], "id int, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert got == [1]


def test_temperature_weights_formula(tables):
    from lanterndb_spark.operators.sampling import temperature_weights

    docs = tables["documents"]
    n_in = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    w_half = temperature_weights(docs, "lang", tau=0.5)
    assert set(w_half) == set(n_in)
    for d, n in n_in.items():
        assert w_half[d] == float(n) ** 0.5
    w_nat = temperature_weights(docs, "lang", tau=1.0)
    assert all(w_nat[d] == float(n) for d, n in n_in.items())
    w_uni = temperature_weights(docs, "lang", tau=0.0)
    assert all(v == 1.0 for v in w_uni.values())


def test_temperature_mix_flattens_distribution(tables):
    from lanterndb_spark.operators.sampling import mix_to_weights, temperature_weights

    docs = tables["documents"]
    n_in = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    out = mix_to_weights(docs, "lang", temperature_weights(docs, "lang", 0.5), "doc_id")
    by = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    tot_in, tot_out = sum(n_in.values()), sum(by.values())
    head = max(n_in, key=n_in.get)
    tail = min(n_in, key=n_in.get)
    # temperature < 1 shrinks the head's share and grows the tail's
    assert by[head] / tot_out < n_in[head] / tot_in
    assert by.get(tail, 0) / tot_out >= n_in[tail] / tot_in - 1e-9
    # tail (limiting) domain is kept whole
    assert by[tail] == n_in[tail]


def test_temperature_cut_math_matches_duckdb(tables):
    """Pins the float parity the q_mix_temperature oracle relies on:
    DuckDB pow/min/floor over DOUBLE reproduces the driver-side cut."""
    import math

    import duckdb

    from lanterndb_spark.operators.sampling import BUCKETS, temperature_weights

    docs = tables["documents"]
    counts = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    weights = temperature_weights(docs, "lang", 0.5)
    total = min(counts[d] / weights[d] for d in counts)
    py_cuts = {
        d: int(math.floor(weights[d] * total * BUCKETS / counts[d])) for d in counts
    }
    con = duckdb.connect()
    rows = ", ".join(f"('{d}', {n})" for d, n in counts.items())
    got = dict(
        con.execute(
            f"""
            WITH n(dom, c) AS (VALUES {rows}),
            j AS (SELECT dom, CAST(c AS DOUBLE) AS n, pow(CAST(c AS DOUBLE), 0.5) AS wt FROM n),
            t AS (SELECT min(n / wt) AS tot FROM j)
            SELECT dom, CAST(floor(wt * tot * {BUCKETS} / n) AS BIGINT)
            FROM j CROSS JOIN t
            """
        ).fetchall()
    )
    assert got == py_cuts
