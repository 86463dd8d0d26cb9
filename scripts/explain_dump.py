"""Dump ``.explain("formatted")`` for named registered queries.

Optimization-round artifact helper: writes ``plans/<round>/<query>_<tag>.txt``
for every requested query so plan claims in OPTIMIZATION_r*.md are checkable
by READING the committed dumps (producing them runs Spark — the iterative
query builders collect/checkpoint during plan construction). Usage:

    python scripts/explain_dump.py --tag before [--round r14] name [name ...]

``$SPARK_GRAFT_SF_DIR`` picks the data directory (default /root/testdata/sf0.1
— the scale the driver benches, so size-dependent planning like broadcast
selection matches the measured runs).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="dump .explain('formatted') for registered queries"
    )
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", dest="rnd", default="r14")
    ap.add_argument("names", nargs="+")
    ns = ap.parse_args()
    tag, rnd, names = ns.tag, ns.rnd, ns.names

    import __spark_entry__ as em
    from inf_553_datamining_mapreduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = em.queries()

    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"explain: {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep dumping the others
            text = f"ERROR building plan: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n")
            fh.write(text)
        print(f"explain: wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
