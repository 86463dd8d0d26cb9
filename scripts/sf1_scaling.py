"""sf1 heavy-subset core-scaling bracket (r13 verdict item 3).

The driver's 8-vs-32-core bench at sf0.1 reads ≈1.0 for every query
because every headline query is overhead-bound at that scale (0.5–7 s
per query, dominated by job scheduling) — the scaling signal is dead
weight. This script makes core-scaling measurable: it runs the ~12
heaviest data-parallel queries at the synthesized sf1 decade
(``scripts/make_sf1.py`` → ``.localdata/sf1``) through ``bench.py``
itself — same canary brackets, same normalization, same envelope
machinery — once per core count, in SEPARATE processes (the master is
a static conf), and writes the low/high ratios.

Usage:
    python scripts/make_sf1.py              # once, ~minutes
    python scripts/sf1_scaling.py [--cpus 32,8] [--runs 1]

Output: ``BENCH_SF1_SCALING_r14.json`` next to the repo root —
per-core-count bench summaries plus per-query raw and normalized
low/high ratios. Interpretation: ratio ≈ cpus_high/cpus_low on
perfectly data-parallel work; ratio ≈ 1 means the query is still
overhead- or driver-bound at sf1 (documented per row in
OPTIMIZATION_r14.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The heaviest sf0.1 rows that (a) read only tables make_sf1 synthesizes
# and (b) are data-parallel by design (scale_sweep's decade subset).
SUBSET = [
    "frequent_itemsets_fpgrowth",
    "frequent_itemsets_son",
    "communities_girvan_newman_fixedpoint",
    "span_deduped_corpus",
    "minhash_lsh_near_duplicates",
    "simhash_near_duplicates",
    "edge_betweenness_brandes_customers",
    "incremental_media_phash",
    "media_phash_near_duplicates",
    "incremental_span_scrub",
    "semantic_dedup_keep_best_scaled",
    "sgns_embeddings_weighted_walks_customers",
]


def main() -> None:
    cpus = [32, 8]
    runs = "1"
    argv = sys.argv[1:]
    if "--cpus" in argv:
        cpus = [int(c) for c in argv[argv.index("--cpus") + 1].split(",")]
    if "--runs" in argv:
        runs = argv[argv.index("--runs") + 1]
    sf_dir = os.path.join(REPO, ".localdata", "sf1")
    if not os.path.isdir(sf_dir):
        raise SystemExit("run scripts/make_sf1.py first (no .localdata/sf1)")

    legs: dict[int, dict] = {}
    for c in cpus:
        full_path = f"/tmp/BENCH_SF1_c{c}.json"
        env = dict(os.environ)
        env.update(
            {
                "SPARK_GRAFT_SF_DIR": sf_dir,
                "SPARK_GRAFT_CPUS": str(c),
                "SPARK_GRAFT_BENCH_RUNS": runs,
                "SPARK_GRAFT_BENCH_QUERIES": ",".join(SUBSET),
                "SPARK_GRAFT_BENCH_FULL_PATH": full_path,
                # FPGrowth's sf1 conditional trees exceed the 8g default
                # split 32 ways (measured OOM, scale_sweep.py note).
                "SPARK_GRAFT_DRIVER_MEM": env_mem(),
            }
        )
        print(f"sf1_scaling: leg cpus={c} ...", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            raise SystemExit(f"leg cpus={c} failed rc={proc.returncode}")
        with open(full_path) as fh:
            legs[c] = json.load(fh)

    hi, lo = max(cpus), min(cpus)
    ratios_raw, ratios_norm = {}, {}
    for q in SUBSET:
        lo_r, hi_r = legs[lo]["queries"].get(q), legs[hi]["queries"].get(q)
        if lo_r and hi_r:
            ratios_raw[q] = round(lo_r / hi_r, 2)
        lo_n = legs[lo]["queries_normalized"].get(q)
        hi_n = legs[hi]["queries_normalized"].get(q)
        if lo_n and hi_n:
            ratios_norm[q] = round(lo_n / hi_n, 2)
    shared_ratios = {}
    for s, hi_s in legs[hi]["shared_intermediates"].items():
        lo_s = legs[lo]["shared_intermediates"].get(s)
        if lo_s and hi_s:
            shared_ratios[s] = round(lo_s / hi_s, 2)

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "ratio_definition": f"sec@{lo}cores / sec@{hi}cores (>1 = scales)",
        "per_query_ratio_raw": ratios_raw,
        "per_query_ratio_normalized": ratios_norm,
        "shared_intermediates_ratio_raw": shared_ratios,
        "legs": {
            str(c): {
                k: legs[c][k]
                for k in (
                    "value",
                    "normalized_total",
                    "envelope_total_normalized",
                    "queries",
                    "queries_normalized",
                    "shared_intermediates",
                    "canary_mt_sec",
                    "canary_bw_sec",
                    "n_failed",
                )
            }
            for c in cpus
        },
    }
    out_path = os.path.join(REPO, "BENCH_SF1_SCALING_r14.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"raw": ratios_raw, "normalized": ratios_norm}))
    print(f"wrote {out_path}", file=sys.stderr)


def env_mem() -> str:
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")


if __name__ == "__main__":
    main()
