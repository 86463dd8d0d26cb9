"""Property-based tests (hypothesis): the pure-Python kernels must agree
with independent brute-force formulations on arbitrary small inputs."""

from __future__ import annotations

import itertools
from collections import Counter, defaultdict, deque

from hypothesis import given, settings
from hypothesis import strategies as st

from inf_553_datamining_mapreduce_spark.operators.frequent_itemsets import (
    apriori_local,
    count_candidates_in_basket,
)
from inf_553_datamining_mapreduce_spark.operators.graph import (
    _components_local,
    bfs_credit_one_source,
    modularity_local,
)

baskets_strategy = st.lists(
    st.frozensets(st.integers(min_value=1, max_value=12), min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10), st.integers(min_value=1, max_value=10)
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
).map(lambda es: sorted({(min(a, b), max(a, b)) for a, b in es}))


@settings(max_examples=60, deadline=None)
@given(baskets_strategy, st.integers(min_value=1, max_value=5))
def test_apriori_local_equals_brute_force(baskets, threshold):
    cnt: Counter = Counter()
    for b in baskets:
        items = sorted(b)
        for k in range(1, len(items) + 1):
            for c in itertools.combinations(items, k):
                cnt[c] += 1
    expected = {c for c, v in cnt.items() if v >= threshold}
    assert set(apriori_local(baskets, threshold)) == expected


@settings(max_examples=60, deadline=None)
@given(baskets_strategy)
def test_candidate_counting_strategies_agree(baskets):
    """Both counting strategies in count_candidates_in_basket (combo
    enumeration vs subset test) must yield identical hits."""
    universe = sorted({i for b in baskets for i in b})
    cands = {
        2: set(itertools.combinations(universe, 2)),
        3: set(itertools.combinations(universe[:6], 3)),
    }
    for b in baskets:
        via_api = set(count_candidates_in_basket(b, cands))
        brute = {
            c for k, cs in cands.items() for c in cs if b.issuperset(c)
        }
        assert via_api == brute


@settings(max_examples=60, deadline=None)
@given(edges_strategy)
def test_components_match_bfs_reachability(edge_list):
    vids = {v for e in edge_list for v in e} | {1, 2, 3}
    comp = _components_local(edge_list, vids)
    adj = defaultdict(set)
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)
    for start in vids:
        seen = {start}
        q = deque([start])
        while q:
            cur = q.popleft()
            for nb in adj[cur]:
                if nb not in seen:
                    seen.add(nb)
                    q.append(nb)
        assert comp[start] == min(seen)  # min-id labeling over reachability


@settings(max_examples=40, deadline=None)
@given(edges_strategy)
def test_betweenness_symmetry_and_positivity(edge_list):
    adj = defaultdict(list)
    for a, b in edge_list:
        adj[a].append(b)
        adj[b].append(a)
    total: Counter = Counter()
    for src in sorted(adj):
        for key, credit in bfs_credit_one_source(src, dict(adj)).items():
            assert credit > 0
            assert key[0] < key[1]
            total[key] += credit
    # every existing edge receives credit from its own endpoints' BFS
    for e in edge_list:
        assert total[e] > 0 or not adj[e[0]]


@settings(max_examples=40, deadline=None)
@given(edges_strategy)
def test_modularity_bounded(edge_list):
    if not edge_list:
        return
    vids = {v for e in edge_list for v in e}
    comp = _components_local(edge_list, vids)
    q = modularity_local(edge_list, comp)
    # modularity of any partition lies in [-1, 1]
    assert -1.0 <= q <= 1.0


@given(
    n_rows=st.integers(min_value=1, max_value=5000),
    n_buckets=st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_ntile_formula_matches_sql_ntile_semantics(n_rows, n_buckets):
    """The closed-form bucket arithmetic behind olap._ntile_from_rank must
    reproduce SQL NTILE for every (N, n): the first N mod n buckets take
    ceil(N/n) rows, the rest floor(N/n), buckets contiguous over ranks
    1..N. Evaluated here as pure integer math (the Spark Column version is
    pinned against F.ntile separately in test_plans)."""
    q, rem = divmod(n_rows, n_buckets)
    big = q + 1
    threshold = rem * big

    def bucket_of(rank: int) -> int:
        if rank <= threshold:
            return (rank - 1) // big + 1
        return rem + (rank - 1 - threshold) // q + 1

    # reference: walk ranks handing out bucket sizes the SQL way
    expected = []
    for b in range(1, n_buckets + 1):
        size = big if b <= rem else q
        expected.extend([b] * size)
    got = [bucket_of(r) for r in range(1, n_rows + 1)]
    assert got == expected[:n_rows]
    assert len(expected) == n_rows


def test_gn_fixedpoint_matches_duckdb_on_random_graphs(spark):
    """Randomized cross-engine property: the integer GN twin and its
    generated chained-CTE oracle (with a VALUES edge list injected) must
    agree bit-for-bit on arbitrary small graphs — schedules, grids,
    label rounds, modularity argmax, member strings, everything. This is
    the oracle-parity test freed from the fixed customer graph, so tie
    handling and non-converged labelings get exercised on adversarial
    shapes too."""
    import random

    import duckdb

    import __spark_entry__ as em
    from inf_553_datamining_mapreduce_spark.operators.graph import (
        girvan_newman_fixedpoint,
    )

    for seed in (3, 17, 91):
        rng = random.Random(seed)
        n_verts = rng.randint(8, 24)
        pairs = set()
        for _ in range(rng.randint(10, 48)):
            a, b = rng.randrange(n_verts), rng.randrange(n_verts)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        edf = spark.createDataFrame(pairs, "src long, dst long")
        got = sorted(
            (r["community"], r["members_str"], r["n_members"])
            for r in girvan_newman_fixedpoint(
                edf, max_depth=6, source_mod=3, n_grid=8, label_rounds=8
            ).collect()
        )
        values = ", ".join(f"({a}, {b})" for a, b in pairs)
        sql = em._gn_fp_oracle(
            max_depth=6,
            source_mod=3,
            n_grid=8,
            label_rounds=8,
            edges_sql=(
                f"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT)"
                f" AS dst FROM (VALUES {values}) t(src, dst)"
            ),
        )
        want = sorted(
            (int(r[0]), r[1], int(r[2]))
            for r in duckdb.connect().execute(sql).fetchall()
        )
        assert got == want, f"seed {seed} diverged"


def test_chunk_dedup_stats_matches_bruteforce_on_random_corpora(spark):
    """Property: the windowed-aggregate formulation equals an independent
    Python brute force (chunk, hash by content, count cross-corpus
    copies per source) on seeded random corpora with planted repeats."""
    import random
    from collections import Counter, defaultdict

    from inf_553_datamining_mapreduce_spark.operators.text import (
        chunk_dedup_stats,
    )

    for seed in (5, 29):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = []
        for i in range(60):
            n = rng.randint(0, 80)
            words = [rng.choice(vocab) for _ in range(n)]
            docs.append((i, " ".join(words), f"s{rng.randint(0, 3)}"))
        # plant exact copies across sources
        docs.append((100, docs[0][1], "s9"))
        docs.append((101, docs[1][1], docs[1][2]))

        chunk_size = 8
        occ = Counter()
        per_doc_chunks = {}
        for doc_id, text, source in docs:
            toks = text.split(" ")
            chunks = [
                " ".join(toks[s : s + chunk_size])
                for s in range(0, max(len(toks) - 1, 0) + 1, chunk_size)
            ] or [""]
            # mirror doc_chunks: starts at 0, stride=chunk_size, last
            # partial window included; empty text yields one "" chunk
            per_doc_chunks[doc_id] = chunks
            for c in chunks:
                occ[c] += 1
        want = defaultdict(lambda: [0, 0, set()])
        for doc_id, text, source in docs:
            for c in per_doc_chunks[doc_id]:
                want[source][0] += 1
                if occ[c] > 1:
                    want[source][1] += 1
                    want[source][2].add(c)
        df = spark.createDataFrame(docs, "doc_id long, text string, source string")
        got = {
            r["source"]: (r["n_chunks"], r["n_dup_chunks"], r["n_dup_groups"])
            for r in chunk_dedup_stats(
                df, chunk_size=chunk_size, stride=chunk_size
            ).collect()
        }
        expect = {
            s: (v[0], v[1], len(v[2])) for s, v in want.items()
        }
        assert got == expect, f"seed {seed}"


def test_betweenness_fixedpoint_matches_duckdb_on_random_graphs_both_rules(spark):
    """Randomized cross-engine property for BOTH credit rules of the
    fixed-point betweenness: the Spark loop and the generated CTE chain
    (VALUES edge list injected) must agree bit-for-bit — BFS depths, DAG
    membership, route counts, σ accumulation (brandes), and the reverse
    integer sweep — on arbitrary small graphs."""
    import random

    import duckdb

    import __spark_entry__ as em
    from inf_553_datamining_mapreduce_spark.operators.graph import (
        edge_betweenness_fixedpoint,
    )

    for seed, rule in ((7, "equal_split"), (7, "brandes"), (41, "brandes")):
        rng = random.Random(seed)
        n_verts = rng.randint(8, 20)
        pairs = set()
        for _ in range(rng.randint(10, 40)):
            a, b = rng.randrange(n_verts), rng.randrange(n_verts)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        edf = spark.createDataFrame(pairs, "src long, dst long")
        got = sorted(
            (r["src"], r["dst"], r["credit_sum_fp"])
            for r in edge_betweenness_fixedpoint(
                edf, max_depth=6, scale=10**9, source_mod=3, rule=rule
            ).collect()
        )
        values = ", ".join(f"({a}, {b})" for a, b in pairs)
        sql = em._betweenness_fp_oracle(
            max_depth=6,
            scale=10**9,
            source_mod=3,
            rule=rule,
            edges_sql=(
                f"SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT)"
                f" AS dst FROM (VALUES {values}) t(src, dst)"
            ),
        )
        want = sorted(
            (int(r[0]), int(r[1]), int(r[2]))
            for r in duckdb.connect().execute(sql).fetchall()
        )
        assert got == want, f"seed {seed} rule {rule} diverged"


def test_per_row_minhash_matches_aggregated_on_adversarial_text(spark):
    """Random short/degenerate texts (empty, single token, repeated
    tokens, multi-space-free vocab) — the stateless per-row signature
    must equal the aggregated groupBy form everywhere, with NULL exactly
    where the doc has no shingle."""
    import random

    from inf_553_datamining_mapreduce_spark.operators.dedup import (
        minhash_signatures,
        with_minhash_signature,
        word_shingles,
    )

    rng = random.Random(13)
    vocab = ["a", "bb", "ccc", "dddd", "e1", ""]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    agg = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(word_shingles(df, n=3)).collect()
    }
    per_row = {
        r["doc_id"]: (list(r["signature"]) if r["signature"] else None)
        for r in with_minhash_signature(df).collect()
    }
    assert len(per_row) == 120
    for doc_id, sig in per_row.items():
        if sig is None:
            assert doc_id not in agg, doc_id
        else:
            assert agg[doc_id] == sig, doc_id


def test_media_kernels_never_crash_on_fuzzed_payloads(spark):
    """Random byte payloads — including garbage bodies behind every
    decoder's magic prefix — must never crash the feature or frame
    kernels: undecodable inputs fall back to the deterministic stand-ins
    and every asset produces output rows. (This fuzz found two real
    ZeroDivisionError paths: PPM headers with zero dimensions and WAV
    fmt chunks with rate 0 — both now rejected by the decoders.)"""
    import random

    from pyspark.sql import Row

    from inf_553_datamining_mapreduce_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    rng = random.Random(99)
    prefixes = [b"", b"BM", b"P6", b"P6\n0 0\n255\n", b"P6\n2 2\n255\n",
                b"RIFF", b"RIFF\x10\x00\x00\x00WAVE", b"RIFF\x10\x00\x00\x00AVI ",
                b"\xff\xd8", b"\xff\xd8\xff\xe0", b"GIF87a", b"GIF89a",
                b"\x89PNG\r\n\x1a\n"]
    rows = []
    for i in range(60):
        body = bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
        rows.append(
            Row(
                asset_id=i,
                media_type=rng.choice(["image", "audio", "video"]),
                payload=rng.choice(prefixes) + body,
            )
        )
    df = spark.createDataFrame(rows)
    feats = extract_features(df).collect()
    assert len(feats) == 60
    assert all(len(r["features"]) == 16 for r in feats)
    frames = sample_frames(df).collect()  # video-typed assets only
    assert all(r["frame_sha256"] for r in frames)


# ---------------------------------------------------------------------------
# Quantile-sketch key arithmetic (pure-Python mirror of sketches._qs_key /
# _qs_bounds — the Spark exprs are pinned to this mirror in
# tests/test_sketches.py's fixed-value test)


def _qs_key_py(v: int, bits: int = 5) -> int:
    if v <= 0:
        return 0
    e = v.bit_length() - 1
    sub = v if e < bits else (v >> (e - bits)) & ((1 << bits) - 1)
    return e * (1 << bits) + sub


def _qs_bounds_py(key: int, bits: int = 5) -> tuple:
    e, r = divmod(key, 1 << bits)
    if e < bits:
        return r, r
    lo = ((1 << bits) + r) << (e - bits)
    return lo, lo + (1 << (e - bits)) - 1


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**62))
def test_qsketch_bounds_enclose_value(v):
    lo, hi = _qs_bounds_py(_qs_key_py(v))
    assert lo <= v <= hi
    if v < 32:
        assert lo == hi == v
    if v > 0:
        assert hi - lo <= max(lo >> 5, 0)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_qsketch_key_is_monotone_py(vals):
    s = sorted(vals)
    keys = [_qs_key_py(v) for v in s]
    assert keys == sorted(keys)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.sampled_from([50, 90, 99]),
)
def test_qsketch_quantile_readout_encloses_exact(vals, q):
    """The full readout pipeline on the Python mirror: register counts,
    cumulative walk, ceil-rank pick — the bucket must enclose the exact
    order statistic for ANY multiset and quantile."""
    from collections import Counter

    regs = Counter(_qs_key_py(v) for v in vals)
    n = len(vals)
    target = (n * q + 99) // 100
    cum = 0
    pick = None
    for k in sorted(regs):
        cum += regs[k]
        if cum >= target:
            pick = k
            break
    lo, hi = _qs_bounds_py(pick)
    exact = sorted(vals)[target - 1]
    assert lo <= exact <= hi


# ---------------------------------------------------------------------------
# weighted_pick ladder (r10 verdict item 8): the shared md5-mod-cumulative-
# weight draw must agree with an independent Python ladder mirror on
# arbitrary (keys, weights, draws) — four call sites ride on this helper,
# so a standalone sweep is cheap insurance for the next one.
# ---------------------------------------------------------------------------

# per group: distinct order values -> non-negative weights (0 exercises the
# "zero-weight rows never win" clause), plus one 60-bit draw per group
pick_groups_strategy = st.lists(
    st.tuples(
        st.dictionaries(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=40),
            min_size=1,
            max_size=7,
        ),
        st.integers(min_value=0, max_value=2**60),
    ),
    min_size=1,
    max_size=4,
)


def _ladder_mirror(rows, draw):
    """Independent formulation: sorted ladder, half-open interval walk."""
    rows = sorted(rows)
    tot = sum(w for _, w in rows)
    if tot <= 0:
        return None
    pick = draw % tot
    cum = 0
    for order, w in rows:
        cum += w
        if w > 0 and cum - w <= pick < cum:
            return order
    return None  # unreachable: pick < tot == final cum


@settings(max_examples=12, deadline=None)
@given(pick_groups_strategy)
def test_weighted_pick_matches_python_ladder(spark, groups):
    from pyspark.sql import functions as F

    from inf_553_datamining_mapreduce_spark.operators.graph import (
        weighted_pick,
    )

    data = []
    expected = {}
    for gid, (rows, draw) in enumerate(groups):
        for order, w in rows.items():
            data.append((gid, order, w, draw))
        win = _ladder_mirror(list(rows.items()), draw)
        if win is not None:
            expected[gid] = win
    cand = spark.createDataFrame(
        data, "gid long, ord long, w long, draw long"
    )
    got = {
        r["gid"]: r["ord"]
        for r in weighted_pick(
            cand, ["gid"], "w", "ord", F.col("draw")
        ).collect()
    }
    assert got == expected
