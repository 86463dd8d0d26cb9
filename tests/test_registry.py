"""Registry/process guards: the correctness driver verifies only the FIRST
50 registered queries per round, so the registration order IS the proof
budget. These tests pin the invariants the rotation process depends on —
they fail loudly when a new query is added without rotating it into the
window, or when an oracle goes missing or stops parsing."""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose outputs are IEEE-accumulation-order-dependent floats — no
# cross-engine oracle can exist. Anything else without an oracle is a bug.
NO_ORACLE_ALLOWED = {
    "edge_betweenness_customers",
    "communities_girvan_newman",
    "edge_betweenness_distributed_customers",
}


def _registered() -> list[str]:
    return list(em.queries().keys())


def test_window_is_exactly_the_first_fifty():
    names = _registered()
    pri = em._DRIVER_PRIORITY
    assert len(pri) == 50
    assert len(set(pri)) == 50, "duplicate names in the priority window"
    assert names[:50] == pri
    missing = [n for n in pri if n not in names]
    assert not missing, f"priority names not registered: {missing}"


def test_every_query_is_oracled_or_allowlisted():
    names = set(_registered())
    oracled = set(em.oracle_sql().keys())
    unoracled = names - oracled
    assert unoracled == NO_ORACLE_ALLOWED, (
        "queries without an oracle beyond the known float-sum set: "
        f"{sorted(unoracled - NO_ORACLE_ALLOWED)}; "
        f"allowlisted-but-registered-with-oracle: "
        f"{sorted(NO_ORACLE_ALLOWED - unoracled)}"
    )
    orphans = oracled - names
    assert not orphans, f"oracles for unregistered queries: {sorted(orphans)}"


def test_unproven_oracled_queries_sit_inside_the_window():
    """Union of passing rows across all committed CORRECTNESS_r*.json; an
    oracled query without a green row MUST be in the first 50 or the next
    round can never prove it. (A row with err or a failed hash is NOT
    proven.)"""
    passed: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                    and not row.get("err")
                ):
                    passed.add(name)
    if not passed:
        pytest.skip("no CORRECTNESS artifacts committed yet")
    names = _registered()
    oracled = set(em.oracle_sql().keys())
    window = set(names[:50])
    stranded = [
        n for n in names if n in oracled and n not in passed and n not in window
    ]
    assert not stranded, (
        "oracled queries with no green driver row are OUTSIDE the 50-slot "
        f"window and can never be proven: {stranded}"
    )


def test_all_oracle_sql_parses_in_duckdb():
    """EXPLAIN every oracle against empty-shaped views — catches SQL typos
    in seconds instead of at the gate."""
    con = duckdb.connect()
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet') LIMIT 0"
        )
    bad = []
    for name, sql in em.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:
            bad.append((name, str(exc).splitlines()[0]))
    assert not bad, f"oracle SQL fails to plan: {bad}"


def test_shared_intermediates_cover_every_memo_key():
    """bench.py times each memoized shared intermediate as its own line
    item; a _memo key missing from shared_intermediates() would silently
    book its build cost to whichever query runs it first (the round-4
    attribution bug). Pin the two lists together by scanning the source."""
    import re

    import __spark_entry__ as em

    src = open(em.__file__).read()
    memo_keys = set(
        re.findall(r'_memo(?:_multi)?\(spark, \(sf, "(\w+)"', src)
    )
    assert memo_keys, "expected _memo call sites"
    # superset: builders that memoize a PAIR inline (mh_index) appear in
    # shared_intermediates without a matching single-key _memo call
    assert memo_keys <= set(em.shared_intermediates()), (
        memo_keys, set(em.shared_intermediates())
    )


def test_golden_only_marker_is_exactly_the_oracle_gap():
    """The registry's golden_only() annotation must list EXACTLY the
    registered queries that carry no DuckDB oracle — so a future query
    accidentally shipped without an oracle fails here instead of silently
    joining the documented float pair, and a stale marker (for a query
    that gained an oracle) fails too."""
    gap = set(em.queries().keys()) - set(em.oracle_sql().keys())
    marked = set(em.golden_only().keys())
    assert marked == gap == {
        "edge_betweenness_customers",
        "communities_girvan_newman",
        "edge_betweenness_distributed_customers",
    }
    for reason in em.golden_only().values():
        assert reason  # every marker carries its permanent why


def test_high_variance_marker_names_registered_oracled_queries():
    """high_variance() annotates PERFORMANCE variance only: every marked
    query must be registered AND oracled (correctness unaffected), and
    every reason must name its stable twin so the fallback is auditable."""
    names = set(em.queries().keys())
    oracled = set(em.oracle_sql().keys())
    for q, reason in em.high_variance().items():
        assert q in names and q in oracled, q
        assert "twin" in reason, f"{q}: reason must name the stable twin"


def test_scale_pinned_marker_names_registered_oracled_queries():
    """scale_pinned() annotates deliberate asymptotic pins (r12 verdict
    item 4): every marked query must be registered AND oracled
    (correctness unaffected — only the scaling shape is pinned), and
    every reason must name its registered scale-safe twin plus the
    measured reading that motivated the pin, so a bench audit can route
    around the row mechanically instead of flagging it."""
    names = set(em.queries().keys())
    oracled = set(em.oracle_sql().keys())
    for q, reason in em.scale_pinned().items():
        assert q in names and q in oracled, q
        assert "twin" in reason, f"{q}: reason must name the scale twin"
        # the named twin must itself be a registered query
        twin = [w.strip() for w in reason.split() if w.strip() in names and w.strip() != q]
        assert twin, f"{q}: no registered twin named in reason"
        # a measured number backs the pin (the 'why' is evidence, not prose)
        assert any(ch.isdigit() for ch in reason), q
    assert "semantic_dedup_keep_best" in em.scale_pinned()
