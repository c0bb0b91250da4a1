"""Driver-contract hygiene: the correctness gate only sees the FIRST 50
``queries()`` entries, so window composition is itself behavior worth
pinning — a refactor that reorders the dict or drops an oracle would
silently weaken the gate without failing any operator test."""

import __spark_entry__ as entry

# rows deliberately inside the window WITHOUT a SQL oracle (rows-only
# recall checks, each shadowed by an oracle-backed *_equiv twin)
WINDOW_ROWS_ONLY = {"ivfsq_knn"}


def test_every_oracle_key_is_a_registered_query():
    qs, os_ = entry.queries(), entry.oracle_sql()
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracles without a query: {sorted(orphans)}"


def test_window_entries_carry_oracles():
    qs, os_ = entry.queries(), entry.oracle_sql()
    window = list(qs)[:50]
    missing = [k for k in window if k not in os_ and k not in WINDOW_ROWS_ONLY]
    assert not missing, (
        f"window rows without an oracle (driver gate weakened): {missing}"
    )


def test_registry_values_are_callables():
    qs = entry.queries()
    assert all(callable(v) for v in qs.values())
    assert len(qs) >= 150  # the registry only grows


def test_oracle_sql_strings_are_nonempty():
    for k, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), k
