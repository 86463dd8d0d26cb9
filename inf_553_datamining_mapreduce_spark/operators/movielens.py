"""Reference-parity MovieLens pipelines: the reference's four actual entry
points, re-expressed as DataFrame plans over the ``::``-delimited readers.

  * task 1 — avg rating by (movie, gender): ``task1.scala:51-85``
  * task 2 — avg rating by (genre-string, gender): ``task2.scala`` (the
    genre string is the raw pipe-joined composite, NEVER split —
    ``task2.scala:23``, SURVEY.md §1.2)
  * SON case 1 — frequent movie-sets over male users' baskets
    (``SON.scala:54-55``)
  * SON case 2 — frequent user-sets over movies' female-rater baskets
    (``SON.scala:56-57``)

Output contracts (sort orders, 11-decimal formatting, SON rendering) live in
``sources/sinks.py`` and are exercised against an independent local oracle
in tests (the reference's own ml-1m input is missing from its snapshot, so
goldens are recomputed on synthetic fixtures per FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inf_553_datamining_mapreduce_spark.operators.frequent_itemsets import (
    son_frequent_itemsets,
)
from inf_553_datamining_mapreduce_spark.schemas import (
    MOVIES_ML1M,
    RATINGS_ML1M,
    USERS_ML1M,
)
from inf_553_datamining_mapreduce_spark.sources.readers import read_double_colon


def load_ml1m(
    spark: SparkSession,
    ratings_path: str,
    users_path: str,
    movies_path: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    ratings = read_double_colon(spark, ratings_path, RATINGS_ML1M)
    users = read_double_colon(spark, users_path, USERS_ML1M)
    movies = (
        read_double_colon(spark, movies_path, MOVIES_ML1M) if movies_path else None
    )
    return ratings, users, movies


def avg_rating_by_movie_gender(ratings: DataFrame, users: DataFrame) -> DataFrame:
    """task 1: ratings⋈users on uid → avg by (mid, gender) → (mid asc
    numeric, gender asc). Ratings are whole stars, so the integer sum is
    exact and the final double division deterministic under any partitioning
    (the reference's hand-rolled (count, sum) pairs, ``task1.scala:69-76``).
    """
    return (
        ratings.join(users.select("uid", "gender"), "uid")
        .groupBy("mid", "gender")
        .agg(
            (F.sum("rating").cast("double") / F.count("rating")).alias("avg_rating")
        )
        .orderBy("mid", "gender")
    )


def avg_rating_by_genre_gender(
    ratings: DataFrame, users: DataFrame, movies: DataFrame
) -> DataFrame:
    """task 2: the 3-way join variant keyed by the COMPOSITE genre string
    (lexicographic sort — ``task2.scala:39-45``)."""
    return (
        ratings.join(users.select("uid", "gender"), "uid")
        .join(F.broadcast(movies.select("mid", "genres")), "mid")
        .groupBy("genres", "gender")
        .agg(
            (F.sum("rating").cast("double") / F.count("rating")).alias("avg_rating")
        )
        .orderBy("genres", "gender")
    )


def son_baskets(
    ratings: DataFrame, users: DataFrame, case_number: int
) -> DataFrame:
    """Basket orientation by case (``SON.scala:54-60``, P4 conditional plan):
    case 1 — male users' baskets of movies; case 2 — movies' baskets of
    female raters. Gender filter pushes down before the join."""
    joined = ratings.select("uid", "mid").join(users.select("uid", "gender"), "uid")
    if case_number == 1:
        return (
            joined.filter(F.col("gender") == "M")
            .groupBy("uid")
            .agg(F.sort_array(F.collect_set("mid")).alias("basket"))
        )
    if case_number == 2:
        return (
            joined.filter(F.col("gender") == "F")
            .groupBy("mid")
            .agg(F.sort_array(F.collect_set("uid")).alias("basket"))
        )
    raise ValueError(f"case_number must be 1 or 2, got {case_number}")


def son_frequent_movie_sets(
    ratings: DataFrame, users: DataFrame, case_number: int, support: int
) -> DataFrame:
    """Full SON pipeline for either case at the given absolute support;
    returns ``(itemset array<long>, support long)``. Sink with
    ``sinks.write_frequent_itemsets`` for the ``SON.case{N}_{support}.txt``
    contract (``SON.scala:264-278``)."""
    baskets = son_baskets(ratings, users, case_number)
    return son_frequent_itemsets(baskets, support)
