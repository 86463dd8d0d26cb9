"""CLI entry point — the reference's parameterized ``spark-submit``
invocation surface (SURVEY.md §2.1 S6: CLI args for paths, case number,
support threshold), generalized to the whole query registry.

    python -m inf_553_datamining_mapreduce_spark list
    python -m inf_553_datamining_mapreduce_spark run pricing_summary \
        --sf-dir /root/testdata/sf0.01 [--output out.csv] [--limit 20]
    python -m inf_553_datamining_mapreduce_spark son --case 1 --support 1200 \
        --ratings ratings.dat --users users.dat --output SON.case1_1200.txt
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inf_553_datamining_mapreduce_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    run = sub.add_parser("run", help="run a registered query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--output", help="write result CSV here (single file)")
    run.add_argument("--limit", type=int, default=20, help="rows to print")

    son = sub.add_parser("son", help="SON frequent itemsets on ml-1m-shaped input")
    son.add_argument("--case", type=int, choices=(1, 2), required=True)
    son.add_argument("--support", type=int, required=True)
    son.add_argument("--ratings", required=True)
    son.add_argument("--users", required=True)
    son.add_argument("--output", required=True)

    for task_name, needs_movies in (("task1", False), ("task2", True)):
        t = sub.add_parser(
            task_name,
            help=f"grouped-average {task_name} on ml-1m-shaped ::-delimited input",
        )
        t.add_argument("--ratings", required=True)
        t.add_argument("--users", required=True)
        if needs_movies:
            t.add_argument("--movies", required=True)
        t.add_argument("--output", required=True)

    comm = sub.add_parser(
        "communities", help="Girvan-Newman communities on ml-latest-small CSV"
    )
    comm.add_argument("--ratings-csv", required=True)
    comm.add_argument("--min-shared", type=int, default=3)
    comm.add_argument("--step", type=int, default=2500)
    comm.add_argument("--output", required=True)
    comm.add_argument("--betweenness-output", help="also write (u1,u2,b) lines here")

    args = parser.parse_args(argv)

    import __spark_entry__ as entrymod

    from inf_553_datamining_mapreduce_spark.session import get_spark

    if args.cmd == "list":
        for name in sorted(entrymod.queries()):
            oracle = "oracle" if name in entrymod.oracle_sql() else "rows-only"
            print(f"{name}  [{oracle}]")
        return 0

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "run":
        queries = entrymod.queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        df = queries[args.query](spark, args.sf_dir)
        if args.output:
            from inf_553_datamining_mapreduce_spark.sources.sinks import (
                write_single_csv,
            )

            write_single_csv(df, args.output)
            print(f"wrote {args.output}")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "son":
        from inf_553_datamining_mapreduce_spark.operators.movielens import (
            load_ml1m,
            son_frequent_movie_sets,
        )
        from inf_553_datamining_mapreduce_spark.sources.sinks import (
            write_frequent_itemsets,
        )

        ratings, users, _ = load_ml1m(spark, args.ratings, args.users)
        result = son_frequent_movie_sets(ratings, users, args.case, args.support)
        itemsets = [tuple(r["itemset"]) for r in result.collect()]
        write_frequent_itemsets(itemsets, args.output)
        print(f"wrote {args.output} ({len(itemsets)} itemsets)")
        return 0

    if args.cmd in ("task1", "task2"):
        from inf_553_datamining_mapreduce_spark.operators.movielens import (
            avg_rating_by_genre_gender,
            avg_rating_by_movie_gender,
            load_ml1m,
        )
        from inf_553_datamining_mapreduce_spark.sources.sinks import write_group_avg

        movies_path = getattr(args, "movies", None)
        ratings, users, movies = load_ml1m(spark, args.ratings, args.users, movies_path)
        if args.cmd == "task1":
            df = avg_rating_by_movie_gender(ratings, users)
            write_group_avg(df, args.output, ["mid", "gender"], "avg_rating")
        else:
            df = avg_rating_by_genre_gender(ratings, users, movies)
            write_group_avg(df, args.output, ["genres", "gender"], "avg_rating")
        print(f"wrote {args.output}")
        return 0

    if args.cmd == "communities":
        from pyspark.sql import functions as F

        from inf_553_datamining_mapreduce_spark.operators.graph import (
            cooccurrence_edges,
            edge_betweenness,
            girvan_newman_communities,
        )
        from inf_553_datamining_mapreduce_spark.sources.sinks import (
            write_betweenness,
            write_communities,
        )

        df = spark.read.csv(args.ratings_csv, header=True, inferSchema=True)
        edges = cooccurrence_edges(df, "userId", "movieId", args.min_shared)
        vertices = df.select(F.col("userId").cast("long")).distinct()
        if args.betweenness_output:
            rows = [
                (r["src"], r["dst"], r["betweenness"])
                for r in edge_betweenness(edges, vertices).collect()
            ]
            write_betweenness(rows, args.betweenness_output)
            print(f"wrote {args.betweenness_output}")
        result = girvan_newman_communities(edges, vertices, step=args.step)
        write_communities(
            [list(r["members"]) for r in result.collect()], args.output
        )
        print(f"wrote {args.output}")
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
