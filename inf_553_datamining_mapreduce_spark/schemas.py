"""Explicit schemas for every source the engine reads.

The reference uses fixed positional schemas known only from code comments
(``task1.scala:62-63``, ``task2.scala:20``, ``SON.scala:20-24``); here every
source gets an explicit ``StructType`` — schema inference is never relied on
for correctness-checked outputs (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# MovieLens-shaped fixture schemas (reference parity; FIXTURES.md §1)
# ---------------------------------------------------------------------------

# ml-1m ratings.dat: UserID::MovieID::Rating::Timestamp (task1.scala:62-64)
RATINGS_ML1M = StructType(
    [
        StructField("uid", IntegerType(), False),
        StructField("mid", IntegerType(), False),
        StructField("rating", IntegerType(), False),
        StructField("ts", LongType(), True),
    ]
)

# ml-1m users.dat: UserID::Gender::Age::Occupation::Zip (task1.scala:63-65)
USERS_ML1M = StructType(
    [
        StructField("uid", IntegerType(), False),
        StructField("gender", StringType(), False),
        StructField("age", IntegerType(), True),
        StructField("occupation", IntegerType(), True),
        StructField("zip", StringType(), True),  # keeps leading zeros
    ]
)

# ml-1m movies.dat: MovieID::Title::Genres — genres kept whole, never split
# (task2.scala:23; SURVEY.md §1.2)
MOVIES_ML1M = StructType(
    [
        StructField("mid", IntegerType(), False),
        StructField("title", StringType(), True),
        StructField("genres", StringType(), False),
    ]
)

# ml-latest-small ratings.csv with header: userId,movieId,rating,timestamp
# (Betweenness.scala:19-21) — rating is fractional here.
RATINGS_SMALL = StructType(
    [
        StructField("userId", IntegerType(), False),
        StructField("movieId", IntegerType(), False),
        StructField("rating", DoubleType(), False),
        StructField("timestamp", LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md / FIXTURES.md §2)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType(), True),
            StructField("r_name", StringType(), True),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType(), True),
            StructField("n_name", StringType(), True),
            StructField("n_regionkey", IntegerType(), True),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType(), True),
            StructField("c_name", StringType(), True),
            StructField("c_nationkey", IntegerType(), True),
            StructField("c_acctbal", DoubleType(), True),
            StructField("c_mktsegment", StringType(), True),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType(), True),
            StructField("s_name", StringType(), True),
            StructField("s_nationkey", IntegerType(), True),
            StructField("s_acctbal", DoubleType(), True),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType(), True),
            StructField("p_name", StringType(), True),
            StructField("p_brand", StringType(), True),
            StructField("p_type", StringType(), True),
            StructField("p_size", IntegerType(), True),
            StructField("p_retailprice", DoubleType(), True),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType(), True),
            StructField("o_custkey", LongType(), True),
            StructField("o_orderstatus", StringType(), True),
            StructField("o_totalprice", DoubleType(), True),
            StructField("o_orderdate", TimestampType(), True),
            StructField("o_orderpriority", StringType(), True),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType(), True),
            StructField("l_partkey", LongType(), True),
            StructField("l_suppkey", LongType(), True),
            StructField("l_linenumber", IntegerType(), True),
            StructField("l_quantity", DoubleType(), True),
            StructField("l_extendedprice", DoubleType(), True),
            StructField("l_discount", DoubleType(), True),
            StructField("l_tax", DoubleType(), True),
            StructField("l_returnflag", StringType(), True),
            StructField("l_linestatus", StringType(), True),
            StructField("l_shipdate", TimestampType(), True),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", TimestampType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("source", StringType(), True),
            StructField("n_chars", LongType(), True),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType(), True),
            StructField("embedding", ArrayType(FloatType()), True),
            StructField("label", IntegerType(), True),
        ]
    ),
}

# ---------------------------------------------------------------------------
# Multimodal column conventions (engine extension; no reference analog)
# ---------------------------------------------------------------------------

# Opaque media payload + typed metadata. The decode step is stubbed in this
# container (no image/audio libs) but the schema contract is real.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
