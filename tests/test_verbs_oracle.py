"""Verb correctness vs DuckDB oracles, inside pytest (input_hint:
``python -m pytest -x -q`` is the verification entry point).

Runs a representative subset of the queries()/oracle_sql() surface at
sf0.001 — the driver's full gate (scripts/check_oracle.py at sf0.01)
covers everything; this keeps the pytest run fast while still
exercising read→map_batches→aggregate→compare end-to-end.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

FAST_QUERIES = [
    "count_by_group", "count_distinct", "uniq_priorities",
    "stats1_moments", "stats1_percentiles", "stats1_var",
    "top3", "histogram", "most_frequent_brand", "merge_fields",
    "filter_project", "sort_head", "join_segment_revenue",
    "uniq_all", "reshape_long", "nest_explode", "grep",
    "summary", "cumfrac", "format_values", "corpus_curation",
    "step_ewma", "domain_mix", "pii_redact",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(ray_session, sf_dir, oracle_con, name):
    import __ray_entry__ as entrymod
    from scripts.check_oracle import compare, to_pandas

    ours = to_pandas(entrymod.queries()[name](sf_dir))
    oracle = oracle_con.execute(entrymod.oracle_sql()[name]).df()
    ok, msg = compare(name, ours, oracle)
    assert ok, f"{name}: {msg}"


def test_every_query_has_callable_and_oracle_consistency(ray_session):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # every oracle refers to an existing query
    assert set(oracles) <= set(qs)
    # the SQL-checked surface stays large (driver correctness gate)
    assert len(oracles) >= 50
    assert len(qs) >= 60
