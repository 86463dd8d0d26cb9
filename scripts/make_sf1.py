"""Synthesize a ~sf1 dataset (10x sf0.1) for the scale sweep.

The driver testdata stops at sf0.1; SCALE.md's measured sweep needs one
more decade for the headline subset (SON, MinHash, fixed-point
betweenness, training batches, supplier/part Pareto, and the round-6
additions: FPGrowth, Brandes betweenness, bloom-filtered revenue,
benchmark contamination, SimHash). This replicates the sf0.1
`lineitem`, `orders`, `part`, and `documents` tables 10x with
deterministic key offsets so every headline query sees 10x rows with
per-replica statistics identical to sf0.1:

* key columns shift by `replica * OFFSET` (offsets far above the max
  base key), so joins never cross replicas — the co-occurrence graph,
  baskets, and supplier/part groups become 10 disjoint copies;
* document tokens are bijectively renamed per replica (suffix `_i` on
  every token for replica i>0), so shingle/minhash statistics WITHIN a
  replica are unchanged while no shingle ever matches across replicas —
  without this, identical cross-replica texts would turn every
  duplicate group of size g into one of size 10g and grow the pair
  output ~45x, which would masquerade as super-linear scaling;
* token COUNT and doc length are preserved (training_batches packs the
  same token totals per replica).

Output:
``.localdata/sf{N}/{lineitem,orders,part,documents,embeddings}.parquet``
under the repo root (gitignored; regenerate with
``python scripts/make_sf1.py [N]`` — N is the target scale factor as a
multiple of sf0.1 decades, default 1, e.g. ``10`` builds a ~sf10 set
from 100 key-offset replicas for the third-decade sweep). Only the
tables the headline subset reads are generated. ``embeddings`` is
synthesized (md5-seeded, 50k x N vectors), not replicated — see the
inline rationale.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from inf_553_datamining_mapreduce_spark.session import get_spark
from inf_553_datamining_mapreduce_spark.sources.readers import read_parquet_table

SRC = "/root/testdata/sf0.1"
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
TARGET = int(_pos[0]) if _pos else 1
DST = os.path.join(REPO, ".localdata", f"sf{TARGET}")
REPLICAS = 10 * TARGET
OFF = 10_000_000  # far above every base key in sf0.1
# --tables=a,b regenerates a subset (e.g. --tables=embeddings to add the
# synthesized ANN corpus to an existing sf dir without paying the
# lineitem rewrite).
ALL_TABLES = ("orders", "lineitem", "part", "documents", "embeddings")
_sel = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--tables=")]
TABLES = tuple(_sel[0].split(",")) if _sel else ALL_TABLES


def main() -> None:
    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    orders = read_parquet_table(spark, SRC, "orders")
    lineitem = read_parquet_table(spark, SRC, "lineitem")
    documents = read_parquet_table(spark, SRC, "documents")
    part = read_parquet_table(spark, SRC, "part")

    reps = spark.range(REPLICAS).select(F.col("id").cast("long").alias("_rep"))

    o = orders.crossJoin(reps).select(
        (F.col("o_orderkey") + F.col("_rep") * OFF).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_rep") * OFF).alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    if "orders" in TABLES:
        o.repartition(8 * TARGET).write.mode("overwrite").parquet(
            os.path.join(DST, "orders.parquet")
        )

    li_cols = [
        (F.col("l_orderkey") + F.col("_rep") * OFF).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_rep") * OFF).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_rep") * OFF).alias("l_suppkey"),
    ]
    passthrough = [c for c in lineitem.columns if c not in (
        "l_orderkey", "l_partkey", "l_suppkey"
    )]
    li = lineitem.crossJoin(reps).select(*li_cols, *passthrough)
    if "lineitem" in TABLES:
        li.repartition(16 * TARGET).write.mode("overwrite").parquet(
            os.path.join(DST, "lineitem.parquet")
        )

    # part: key offset only; descriptive columns (brand/type/size) repeat
    # per replica, so per-brand selectivity matches sf0.1 while the dim
    # grows 10x with the fact — what the bloom/broadcast queries need.
    p = part.crossJoin(reps).select(
        (F.col("p_partkey") + F.col("_rep") * OFF).alias("p_partkey"),
        "p_name",
        "p_brand",
        "p_type",
        "p_size",
        "p_retailprice",
    )
    if "part" in TABLES:
        p.repartition(4 * TARGET).write.mode("overwrite").parquet(
            os.path.join(DST, "part.parquet")
        )

    # Bijective per-replica token rename: replica 0 keeps the original
    # text; replica i appends `_i` to every token. Token count, length
    # distribution, and within-replica shingle statistics are preserved.
    renamed = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("_"), F.col("_rep").cast("string")),
            ),
            " ",
        )
    )
    d = documents.crossJoin(reps).select(
        (F.col("doc_id") + F.col("_rep") * OFF).alias("doc_id"),
        renamed.alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    # Documents carry the heaviest per-row compute downstream (span md5,
    # shingling); without an explicit repartition the crossJoin writes ONE
    # file with ONE row group, and Parquet scan parallelism is ROW-GROUP
    # granular — every downstream projection then runs on a single task
    # regardless of cluster size (measured round 7: the sf10 span build was
    # "68x for 10x data" purely from this; with the layout fixed it is
    # linear). At 100 TB this is the ingest-side file/row-group sizing
    # story: target ~128 MB row groups, never one giant group.
    if "documents" in TABLES:
        d.repartition(16 * TARGET).write.mode("overwrite").parquet(
            os.path.join(DST, "documents.parquet")
        )

    # embeddings: the driver table stops at 2,000 vectors even at sf0.1,
    # so the ANN family (PQ / IVFADC / SemDeDup / Lloyd consumers) had no
    # data-scaling decade (r10 verdict: "corpus 500 rows at both SFs").
    # Synthesize 50,000 x TARGET deterministic vectors — NOT replicas:
    # replicating identical vectors would turn every point into a
    # 10-way exact duplicate and degenerate the near-dup/cluster
    # structure. Instead each vector is md5-seeded (the engine-wide
    # deterministic convention): label = vec_id % 10 picks one of 10
    # md5-derived cluster centers, and the vector is
    # 0.7*center + 0.3*md5-noise per dimension — clustered structure a
    # coarse quantizer can learn, unique points throughout, identical
    # distribution at every scale. Pure JVM expressions (md5/conv/
    # transform), no Python in the generation path.
    n_vec = 50_000 * TARGET
    dim = 64

    def _md5_unit(prefix: str, key: F.Column, d: F.Column) -> F.Column:
        # deterministic value in [-1, 1] with ~1e-3 resolution from the
        # first 6 hex digits of md5(prefix:key:d)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(prefix), key.cast("string"), d.cast("string")
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        return (F.pmod(h, F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)

    # Planted ground-truth neighbors (r11 verdict item 3): the synthetic
    # cluster structure gives every query ~5k near-tie same-label
    # siblings, so recall@5 vs brute force reads ~0 at ANY code width —
    # geometry, not a pipeline defect — and the decade sweep proved cost
    # scaling but not quality. Plant one UNAMBIGUOUS true neighbor per
    # query vector: vec_id p in [10, 20) is 0.95*v_q + 0.05*noise for
    # q = p - 10 (cosine ~0.998 by construction vs ~0.85 for cluster
    # siblings), so "was the plant retrieved" is a measurable recall
    # floor at every scale. Plant ids sit at 10..19 — below virtually
    # the whole corpus — so the (adc, neighbor_id) tie-break cannot hide
    # a retrieved plant behind same-code siblings.
    label = F.pmod(F.col("vec_id"), F.lit(10))

    def _base(key: F.Column, d: F.Column) -> F.Column:
        return 0.7 * _md5_unit("c", F.pmod(key, F.lit(10)), d) + (
            0.3 * _md5_unit("n", key, d)
        )

    partner = F.col("vec_id") - F.lit(10)
    is_plant = (F.col("vec_id") >= 10) & (F.col("vec_id") < 20)
    emb = (
        spark.range(n_vec)
        .select(F.col("id").alias("vec_id"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.when(
                    is_plant,
                    0.95 * _base(partner, d)
                    + 0.05 * _md5_unit("p", F.col("vec_id"), d),
                )
                .otherwise(_base(F.col("vec_id"), d))
                .cast("float"),
            ),
        )
        .withColumn("label", label.cast("int"))
    )
    if "embeddings" in TABLES:
        emb.repartition(4 * TARGET).write.mode("overwrite").parquet(
            os.path.join(DST, "embeddings.parquet")
        )

    for t in TABLES:
        n = spark.read.parquet(os.path.join(DST, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
