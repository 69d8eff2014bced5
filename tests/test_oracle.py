"""Every SQL-backed queries() entry vs its DuckDB oracle — the local
replica of the driver's correctness gate (row count + schema + values)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry_mod  # noqa: E402

from tests.oracle_util import compare, duck_con  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql_all()))
def test_query_matches_oracle(ray_session, con, name):
    ray_res = entry_mod.queries_all()[name](SF)
    oracle = con.sql(entry_mod.oracle_sql_all()[name]).df()
    ok, msg = compare(ray_res, oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_have_callables():
    qs = entry_mod.queries_all()
    for name in entry_mod.oracle_sql_all():
        assert name in qs, f"oracle {name} has no query"


def test_driver_window_invariant():
    """The driver's correctness check covers the first 50 queries()
    entries: the window must be exactly 50, every entry SQL-backed
    except the two rows-only flagships, and crawl_parity must lead."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == 50
    rows_only = [k for k in q if k not in o]
    assert rows_only == ["crawl_flagship", "web_train_set"]
    assert next(iter(q)) == "crawl_parity"
    # every window oracle is also in the full registry's oracle set
    oa = entry_mod.oracle_sql_all()
    assert all(k in oa for k in o)


def test_entry_smoke(ray_session):
    res = entry_mod.entry()
    n = res.count() if hasattr(res, "count") else len(res)
    assert n > 0
