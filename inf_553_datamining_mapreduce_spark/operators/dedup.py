"""Deduplication operators for training-data pipelines over ``documents``
and ``embeddings``: exact (hash groupBy), n-gram Jaccard, MinHash-LSH,
SimHash, and embedding-cosine near-dup.

No reference analog (SURVEY.md §2.9); this is north-star extension surface.

Scale stance:
  * Exact dedup is a hash aggregate — embarrassingly scalable.
  * Jaccard via shingle explode + self-equi-join on the shingle key: only
    documents that actually share a shingle ever meet (same idiom as the
    co-occurrence graph, never an all-pairs product). Hot shingles are the
    skew risk — ``max_shingle_df`` drops shingles appearing in more than a
    bounded number of docs (standard df-cut), which both caps the join
    fan-out and removes non-discriminative shingles.
  * MinHash-LSH: signatures via ``xxhash64`` with per-row seeds, banded
    bucketing, exact-Jaccard verification of candidates — the classic
    shingle→minhash→band→bucket-join pipeline, entirely in DataFrame ops.
  * SimHash: 60-bit md5-derived signatures via bit-counting aggregation
    (JVM-side), banded by 16-bit chunks, Hamming-verified.
  * Embedding near-dup: exact pairwise for driver-small tables; the
    random-hyperplane LSH path (similarity.py) is the 100-TB route.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: md5 key, membership count, the
    kept representative (min doc_id) — the 'drop all but first' contract."""
    return (
        documents.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("content_hash")
    )


def exact_duplicates_normalized(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Exact dedup after canonical text normalization — lowercase, non-
    alphanumeric runs collapsed to single spaces, trimmed — the standard
    first escalation when byte-identical dedup misses trivially reformatted
    copies (case, punctuation, whitespace). Same hash-aggregate shape as
    ``exact_duplicates``: one shuffle on the 16-byte digest, unbounded."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return (
        documents.select(F.md5(norm).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("content_hash")
    )


def prefix_duplicate_rate_by_source(
    documents: DataFrame, prefix_tokens: int = 20, text_col: str = "text"
) -> DataFrame:
    """Per-source share of documents whose first ``prefix_tokens`` tokens
    collide with another document — the cheap boilerplate/template
    detector (shared headers, scraped navigation, licence preambles) run
    before any full near-dup pass. One md5 over the token prefix, one
    count per hash, one source rollup; the corpus is scanned once and
    nothing wider than (doc, hash) ever shuffles."""
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.col(text_col), " "), 1, prefix_tokens)
    )
    h = documents.select("doc_id", "source", F.md5(prefix).alias("ph"))
    counts = h.groupBy("ph").agg(F.count(F.lit(1)).alias("n_same_prefix"))
    return (
        h.join(counts, "ph")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("n_same_prefix") > 1, 1).otherwise(0)
            ).alias("n_prefix_dup_docs"),
        )
        .withColumn(
            "prefix_dup_rate",
            F.col("n_prefix_dup_docs") / F.col("n_docs"),
        )
        .orderBy("source")
    )


def word_shingles(documents: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: ``(doc_id, shingle)``.
    Built with transform-over-sequence so shingling stays in codegen."""
    # CASE guard: sequence(1, 0) would generate a DESCENDING [1, 0] in Spark,
    # so documents shorter than n must short-circuit to an empty array.
    shingle_expr = (
        f"CASE WHEN size(split({text_col}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))) "
        f"ELSE array() END"
    )
    return documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(shingle_expr))).alias("shingle"),
    ).filter(F.col("shingle") != "")


def jaccard_near_duplicates(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Document pairs with shingle-set Jaccard >= threshold.

    Exact algorithm: |A ∩ B| via self-equi-join on shingle, |A|, |B| from a
    per-doc size table, jaccard = common / (|A| + |B| - common). With
    ``max_shingle_df`` set, the scoring is a conservative hybrid: sizes
    |A|, |B| are counted over the FULL shingle set while the intersection
    only counts shingles at or below the df cut, so scores are only ever
    LOWERED (never inflated) relative to the uncut Jaccard — pairs whose
    overlap rides solely on stop-shingles fall out, the standard
    web-scale trade.
    """
    sh = word_shingles(documents, n, text_col)
    if max_shingle_df is not None:
        # One linear pipeline, THREE shuffles, no plan-subtree reuse (a
        # DataFrame referenced k times re-executes its lineage k times —
        # the join-back formulation this replaces read the corpus 3x):
        #   1. doc_id window  — per-doc shingle count rides along each row
        #   2. shingle window — per-shingle df, then the df-cut filter drops
        #      hot-shingle rows in place (WindowExec buffers one group at a
        #      time in a SPILLABLE row array — safe for a web-scale
        #      stop-shingle, unlike collecting first and filtering after,
        #      where a single collect_list buffer would hold the hot
        #      shingle's whole doc list in memory); the groupBy that
        #      follows reuses the window's hash partitioning (no exchange)
        #   3. pair aggregate — pairs emitted WITH both sizes attached, so
        #      no size table ever joins back
        # Per-shingle pair fan-out is bounded to max_shingle_df^2 BY
        # CONSTRUCTION. Sizes are counted over the FULL shingle set (before
        # the cut): the cut then only lowers the intersection term, making
        # near-miss scores conservative rather than inflated; below the cut
        # threshold the result is exactly the uncut Jaccard either way.
        from pyspark.sql.window import Window

        doc_w = Window.partitionBy("doc_id")
        sh_w = Window.partitionBy("shingle")
        grouped = (
            sh.withColumn("n_sh", F.count(F.lit(1)).over(doc_w))
            .withColumn("df", F.count(F.lit(1)).over(sh_w))
            .filter(F.col("df") <= max_shingle_df)
            .groupBy("shingle")
            .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("docs"))
        )
        emit_expr = (
            "flatten(transform(docs, (x, i) -> "
            "transform(slice(docs, i + 2, size(docs)), y -> struct("
            "least(x.doc_id, y.doc_id) AS doc_a, "
            "greatest(x.doc_id, y.doc_id) AS doc_b, "
            "CASE WHEN x.doc_id <= y.doc_id THEN x.n_sh ELSE y.n_sh END AS size_a, "
            "CASE WHEN x.doc_id <= y.doc_id THEN y.n_sh ELSE x.n_sh END AS size_b))))"
        )
        pairs = (
            grouped.select(F.explode(F.expr(emit_expr)).alias("p"))
            .select("p.doc_a", "p.doc_b", "p.size_a", "p.size_b")
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("common"),
                F.first("size_a").alias("size_a"),
                F.first("size_b").alias("size_b"),
            )
        )
        return (
            pairs.select(
                "doc_a",
                "doc_b",
                (
                    F.col("common")
                    / (F.col("size_a") + F.col("size_b") - F.col("common"))
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= min_jaccard)
            .orderBy("doc_a", "doc_b")
        )
    else:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .orderBy("doc_a", "doc_b")
    )


def benchmark_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_overlap: float = 0.2,
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Train-set decontamination: for each (train, eval) document pair that
    shares word n-gram shingles, the fraction of the TRAIN doc's shingles
    that also occur in the eval doc — the standard benchmark-leakage check a
    pre-training pipeline runs before a corpus ships.

    Output: ``(train_doc_id, eval_doc_id, n_common_shingles, overlap_frac)``
    for pairs with overlap_frac >= min_overlap.

    Scale: shingle both sides and equi-join on the shingle key — only pairs
    that actually share an n-gram ever meet. Benchmark suites are tiny next
    to a 100-TB corpus, so the eval shingle table is broadcast
    (``broadcast_eval``) and the train side streams map-side with ZERO
    shuffle of the corpus; the only shuffle is the per-pair count aggregate,
    whose size is bounded by actual contamination.
    """
    tr = word_shingles(train_docs, n, text_col).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    ev = word_shingles(eval_docs, n, text_col).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    sizes = tr.groupBy("train_doc_id").agg(
        F.count(F.lit(1)).alias("n_train_shingles")
    )
    common = (
        tr.join(ev, "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_common_shingles"))
    )
    return (
        common.join(sizes, "train_doc_id")
        .select(
            "train_doc_id",
            "eval_doc_id",
            "n_common_shingles",
            (
                F.col("n_common_shingles").cast("double")
                / F.col("n_train_shingles")
            ).alias("overlap_frac"),
        )
        .filter(F.col("overlap_frac") >= min_overlap)
        .orderBy("train_doc_id", "eval_doc_id")
    )


def cross_source_overlap(
    documents: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Provenance-leakage matrix: how many near-duplicate pairs connect
    each (source, source) combination, with the min/max pair similarity.
    The report that tells you WHICH ingestion feeds are copying from each
    other (mirrors, scrapes of scrapes) before you burn dedup budget on
    them — off-diagonal mass is cross-feed leakage, diagonal mass is
    within-feed boilerplate.

    ``pairs`` is any near-dup pair stream with (doc_a, doc_b, jaccard) —
    the shared Jaccard pair memo in the registry, so this costs two id
    joins and one bounded aggregate on top of work already done. min/max
    (not sums or means) keep the similarity columns order-independent:
    each pair's jaccard is a single IEEE division both engines compute
    identically, and MIN/MAX over exact values is exact; a double SUM
    would be accumulation-order-dependent.

    Output: ``(source_x, source_y, n_pairs, min_jaccard, max_jaccard)``
    with source_x <= source_y (unordered source pair, counted once).
    """
    src = documents.select("doc_id", "source")
    a = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a")
    )
    b = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b")
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.least("source_a", "source_b").alias("source_x"),
            F.greatest("source_a", "source_b").alias("source_y"),
            "jaccard",
        )
        .groupBy("source_x", "source_y")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("source_x", "source_y")
    )


def near_duplicate_clusters(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 32,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Transitive near-duplicate clusters: Jaccard near-dup pairs become
    edges, connected components become clusters, the smallest doc_id in each
    cluster is the kept representative — the 'keep one per dup group'
    contract an LLM training pipeline actually applies (pair lists alone
    under-remove when A~B and B~C but A!~C).

    Output: ``(doc_id, cluster_id, keep)`` for every document that belongs
    to some near-dup cluster (singletons are implicitly kept and omitted).

    Scale: the pair stream is the bounded-fan-out df-cut Jaccard join; the
    component step is min-label propagation over cluster edges only (the
    near-dup graph is vastly smaller than the corpus), driver union-find
    under the small-graph gate. Pass ``pairs`` to reuse an
    already-materialized pair stream (the shared-intermediate pattern when
    pair listing and clustering run in the same session).
    """
    from inf_553_datamining_mapreduce_spark.operators.graph import (
        connected_components,
    )

    if pairs is None:
        pairs = jaccard_near_duplicates(
            documents, n=n, min_jaccard=min_jaccard, text_col=text_col,
            max_shingle_df=max_shingle_df,
        )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(edges)
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle → minhash → band → bucket-join → verify)
# ---------------------------------------------------------------------------

def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: for seed i, min over shingles of
    ``xxhash64(shingle, i)``. One groupBy producing all components —
    signature stays JVM-side as an array column."""
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = shingled.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_near_duplicates(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, exact-verified.

    rows-per-band = num_hashes / bands; a pair collides in a band iff that
    slice of the signatures matches exactly, giving the usual
    ``1-(1-s^r)^b`` candidate-recall curve. Candidates are re-checked with
    exact shingle Jaccard, so precision is exact and only recall depends on
    (bands, rows). Same output schema as ``jaccard_near_duplicates``.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    sh = word_shingles(documents, n, text_col)
    # ONE pass over the shingle stream produces the signature AND the
    # verification payload (shingle set + size) per doc, then the result is
    # materialized (localCheckpoint — the same intra-operator reuse pattern
    # pagerank uses): banding and the two verification joins all read the
    # doc-grain table instead of re-shingling the corpus, which the previous
    # formulation did four times (signatures, sizes, and both sides of the
    # intersection join). The doc-grain table is corpus-cardinality with
    # bounded per-row payload — the thing you WANT resident at 100 TB.
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = (
        sh.groupBy("doc_id")
        .agg(*mins, F.collect_set("shingle").alias("sset"))
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
            "sset",
            F.size("sset").cast("long").alias("n_sh"),
        )
        .localCheckpoint()
    )
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col("signature").getItem(bi * rows + r)
                                for r in range(rows)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Exact verification: each candidate pair pulls both materialized
    # shingle sets (two key joins against the checkpointed doc-grain table)
    # and intersects them in codegen — exact Jaccard, no corpus re-read.
    a_side = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sset").alias("sset_a"),
        F.col("n_sh").alias("size_a"),
    )
    b_side = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sset").alias("sset_b"),
        F.col("n_sh").alias("size_b"),
    )
    common = F.size(F.array_intersect("sset_a", "sset_b")).cast("long")
    return (
        candidates.join(a_side, "doc_a")
        .join(b_side, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                common / (F.col("size_a") + F.col("size_b") - common)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Incremental index dedup: new documents vs a prebuilt MinHash index.
# Stateless per-row signatures -> works unchanged under Structured
# Streaming via stream-static joins (the ingestion-time dedup shape).
# ---------------------------------------------------------------------------

def _shingle_array_expr(toks_col: str, n: int) -> Column:
    """Per-row DISTINCT word-n-gram shingle array over a pre-split token
    array column — same semantics as ``word_shingles`` (short docs →
    empty, empty shingles dropped) but as one expression with NO
    explode/aggregate, so it is streaming-safe. Takes the TOKEN column
    (an attribute, cheap to reference thrice) rather than re-splitting
    the text inside each sub-expression."""
    return F.expr(
        f"filter(array_distinct("
        f"CASE WHEN size({toks_col}) >= {n} THEN "
        f"transform(sequence(1, size({toks_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {n}))) "
        f"ELSE array() END), s -> s <> '')"
    )


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    sig_col: str = "signature",
    shingles_col: str = "sset",
    hash_fn: str = "per_seed",
) -> DataFrame:
    """Append per-ROW MinHash signature + shingle-set columns — no
    aggregation, no shuffle, so the same code runs on a batch table and a
    streaming micro-batch. Documents with no shingle (< n tokens) get an
    empty shingle array and a NULL signature; downstream joins drop them,
    matching the aggregated pipeline where such docs produce no shingle
    rows at all.

    ``hash_fn`` selects the hash family (both are valid min-wise
    families; SIGNATURES DIFFER between them, so an index and its probes
    must agree):

    * ``"per_seed"`` (default) — component k is ``min over shingles of
      xxhash64(shingle, k)``: bit-identical to the aggregated
      ``minhash_signatures`` (both hash the (shingle, k) column pair; min
      over a distinct array equals min over the exploded multiset). Each
      component re-scans the shingle STRING — num_hashes string hashes
      per shingle.
    * ``"rehash"`` — the standard hash-once-rehash trick: each shingle is
      hashed ONCE (``xxhash64(shingle)``), and component k is ``min over
      shingles of xxhash64(base, k)`` — a fixed 8-byte rehash per
      component instead of a string re-scan. The rehash of a 64-bit value
      under num_hashes seeds is the same per-seed family applied to the
      base hash, so component independence matches "per_seed"; only the
      concrete signature values differ. MEASURED (sf1, 3-word shingles
      averaging ~20 chars): NO win — 15.2 s vs 11.9 s for the signature
      scan — because Spark's per-call xxhash64 overhead (codegen call +
      null check) dwarfs the few extra bytes scanned, and the extra
      base-hash array materialization costs more than it saves. The mode
      stays available (and pair-for-pair verified against "per_seed")
      for corpora with long shingles — e.g. character n-grams of n ≥ 50
      — where the scan-length argument actually bites.

    The token split, the shingle array, and (for "rehash") the base-hash
    array are each bound to their own projection before downstream
    expressions reference them — CollapseProject keeps the boundary
    rather than duplicating a non-cheap expression into every lambda, so
    the corpus is split and shingled (and base-hashed) once per row, not
    num_hashes times.
    """
    tmp = (
        df.withColumn("_mh_toks", F.split(F.col(text_col), " "))
        .withColumn(shingles_col, _shingle_array_expr("_mh_toks", n))
        .drop("_mh_toks")
    )
    if hash_fn == "per_seed":
        sig = F.when(
            F.size(shingles_col) > 0,
            F.expr(
                f"transform(sequence(0, {num_hashes - 1}), "
                f"k -> array_min(transform({shingles_col}, s -> xxhash64(s, k))))"
            ),
        )
        return tmp.withColumn(sig_col, sig)
    if hash_fn != "rehash":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    tmp = tmp.withColumn(
        "_mh_base", F.expr(f"transform({shingles_col}, s -> xxhash64(s))")
    )
    sig = F.when(
        F.size(shingles_col) > 0,
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"k -> array_min(transform(_mh_base, h -> xxhash64(h, k))))"
        ),
    )
    return tmp.withColumn(sig_col, sig).drop("_mh_base")


def _band_struct_expr(sig_col: str, bands: int, rows: int) -> Column:
    """Array of (band, bucket) structs from a signature column; bucket is
    the '_'-joined signature slice — identical encoding to the aggregated
    LSH path."""
    return F.expr(
        f"transform(sequence(0, {bands - 1}), b -> struct(b AS band, "
        f"array_join(transform(slice({sig_col}, b * {rows} + 1, {rows}), "
        f"x -> CAST(x AS STRING)), '_') AS bucket))"
    )


def build_minhash_index(
    index_docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    text_col: str = "text",
    hash_fn: str = "per_seed",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the two tables of a MinHash dedup index over an
    existing corpus: the banded bucket table (IDS ONLY — carrying
    payloads through the band replication was the measured 2x cost in
    the ANN LSH kernel) and the payload table (signature + shingle set +
    size per doc, joined back for candidates only). Both are
    localCheckpoint'ed: an index is built once and probed many times.
    ``hash_fn`` (see ``with_minhash_signature``) must match the probes'
    — signatures from different families never collide meaningfully.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    payload = (
        with_minhash_signature(index_docs, text_col, n, num_hashes, hash_fn=hash_fn)
        .filter(F.size("sset") > 0)
        .select(
            F.col("doc_id").alias("index_doc_id"),
            "signature",
            "sset",
            F.size("sset").cast("long").alias("n_sh"),
        )
        .localCheckpoint()
    )
    band_tbl = (
        payload.select(
            "index_doc_id",
            F.explode(_band_struct_expr("signature", bands, rows)).alias("bb"),
        )
        .select(
            "index_doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        .localCheckpoint()
    )
    return band_tbl, payload


def index_near_duplicates(
    new_docs: DataFrame,
    index_band_tbl: DataFrame,
    index_payload: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    hash_fn: str = "per_seed",
    carry_payload: bool | None = None,
) -> DataFrame:
    """Ingestion-time near-dup check: for each NEW document, the index
    documents with exact shingle-Jaccard >= threshold among banded
    MinHash candidates — ``(new_doc_id, index_doc_id, jaccard)``.

    Every step is STATELESS on the new side (per-row signature, band
    explode, two joins against static tables), so the identical
    composition runs under Structured Streaming as stream-static joins —
    no watermark, no state store — which is the shape ingestion dedup
    needs: the corpus index is a slowly-refreshed static artifact, the
    stream is the firehose.

    Candidate de-duplication is structural, not stateful: a pair is
    emitted only from its FIRST colliding band (computed per row from
    the two signatures — ``filter(bands)[0] == band``), which replaces
    the batch pipeline's ``distinct()`` with a pure expression a stream
    can evaluate. Verification is exact (array_intersect on the carried
    shingle sets), so precision is exact and only recall depends on
    (bands, rows) — same contract as ``minhash_lsh_near_duplicates``.

    Two physically different, output-identical probe shapes:

    * **Batch** (default): the new side is banded IDS-ONLY and the
      signature/shingle payload is joined back for CANDIDATES only —
      the same replication cut already applied to the index side (the
      band explode would otherwise ship every payload ``bands`` times
      through the bucket-join shuffle; measured 22.6 → 15.3 s on the
      sf1 probe, the remainder being the signature compute itself).
      The signature table localCheckpoints because two branches (band
      explode, candidate payload join) read it.
    * **Streaming** (auto when ``new_docs.isStreaming``): payload
      carried through the explode — joining the banded stream back to
      its own payload would be a stream-stream join; carrying keeps
      every stage stateless, and a micro-batch is small enough that
      its ``bands``-fold replication is immaterial.

    ``carry_payload`` overrides the auto-selection (None): the
    plan-gated ``incremental_index_dedup_stream_plan`` registry entry
    passes ``True`` to run the STREAM's exact composition under batch
    execution, putting the stream shape itself under the driver's
    DuckDB oracle rather than only under the micro-batch pytest.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    ns = (
        with_minhash_signature(new_docs, text_col, n, num_hashes, hash_fn=hash_fn)
        .filter(F.size("sset") > 0)
        .select(
            F.col("doc_id").alias("new_doc_id"),
            F.col("signature").alias("sig_new"),
            F.col("sset").alias("sset_new"),
            F.size("sset").cast("long").alias("n_new"),
        )
    )
    if carry_payload is None:
        carry_payload = new_docs.isStreaming
    if new_docs.isStreaming and not carry_payload:
        # Without this guard the ids-only branch hits localCheckpoint()
        # on a streaming frame, which dies with an opaque
        # AnalysisException deep in the plan — surface the actual
        # contract instead.
        raise ValueError(
            "carry_payload=False is a batch-only shape: a banded STREAM "
            "cannot re-join its own payload without a stream-stream "
            "join. Pass carry_payload=True (or None for auto) for "
            "streaming new_docs."
        )
    if not carry_payload:
        ns = ns.localCheckpoint()
        banded_ids = ns.select(
            "new_doc_id",
            F.explode(_band_struct_expr("sig_new", bands, rows)).alias("bb"),
        ).select(
            "new_doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        cand = (
            banded_ids.join(index_band_tbl, ["band", "bucket"])
            .join(ns, "new_doc_id")
            .join(index_payload, "index_doc_id")
        )
    else:
        banded = ns.select(
            "new_doc_id",
            "sig_new",
            "sset_new",
            "n_new",
            F.explode(_band_struct_expr("sig_new", bands, rows)).alias("bb"),
        ).select(
            "new_doc_id",
            "sig_new",
            "sset_new",
            "n_new",
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        cand = banded.join(index_band_tbl, ["band", "bucket"]).join(
            index_payload, "index_doc_id"
        )
    # first colliding band: signature slices compared directly — emitting
    # a pair only at its smallest colliding band is the stateless
    # replacement for distinct()
    first_band = F.expr(
        f"filter(sequence(0, {bands - 1}), b -> "
        f"slice(sig_new, b * {rows} + 1, {rows}) = "
        f"slice(signature, b * {rows} + 1, {rows}))[0]"
    )
    common = F.size(F.array_intersect("sset_new", "sset")).cast("long")
    return (
        cand.filter(F.col("band") == first_band)
        .select(
            "new_doc_id",
            "index_doc_id",
            (common / (F.col("n_new") + F.col("n_sh") - common)).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, bit-counting aggregation, banded Hamming candidates)
# ---------------------------------------------------------------------------

# SimHash token-hash width: the first 15 hex digits of md5 = 60 bits. An
# md5-derived hash (rather than xxhash64) keeps the whole signature pipeline
# expressible in ANSI SQL (hex→int is portable), so the driver's DuckDB
# oracle can verify it end-to-end; 60 bits stays exact in a signed long.
SIMHASH_BITS = 60


def simhash_signatures(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document, entirely JVM-side: explode tokens, hash
    each (md5-derived, see ``SIMHASH_BITS``), then per bit position sum
    +1/-1 and take the sign."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    )
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return bit_sums.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(
    documents: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming. Candidates via
    16-bit band collision (any pair within Hamming 3 of a <=64-bit signature
    agrees exactly on at least one of the 4 bands — pigeonhole), then exact
    popcount verification.

    The signature table is materialized (localCheckpoint — doc-grain,
    two columns) because the band self-join references it on BOTH sides:
    un-materialized, the token explode + 60-column bit-count aggregate —
    the heaviest stage — evaluates twice (same reuse policy as the
    MinHash one-pass table)."""
    sig = simhash_signatures(documents, text_col).localCheckpoint()
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (exact; LSH scale path in similarity.py)
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine over two array<float> columns via zip_with/aggregate — stays in
    codegen; the double accumulation runs in array order (deterministic)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# Broadcast gate for the exact all-pairs path: 200k x 64-dim float64 ~ 100 MB.
MAX_BROADCAST_VECTORS = 200_000


def embedding_near_duplicates(
    embeddings: DataFrame, min_cosine: float = 0.45
) -> DataFrame:
    """Exact pairwise cosine near-dup over ``embeddings(vec_id, embedding)``.

    Block-nested-loop with a vectorized inner: the (gated) full matrix is
    broadcast once, row-normalized; each Arrow batch computes one numpy
    matmul against it and emits only pairs (id_a < id_b) above threshold.
    This is the exact baseline — a 2M-pair column-expression cross join
    evaluates the cosine lambda interpretively and is ~100x slower. Beyond
    the broadcast gate, prefilter with MinHash/hyperplane LSH
    (similarity.py) and verify candidates exactly.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from inf_553_datamining_mapreduce_spark.deploy import ensure_worker_imports
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = embeddings.sparkSession
    ensure_worker_imports(spark)
    # Gate BEFORE materializing: count() is a cheap distributed aggregate,
    # while collect() of an over-sized table would OOM the driver before any
    # guard could refuse. (count-then-collect is two scans, but the gated
    # table is by contract small enough that the extra scan is noise.)
    n_vectors = embeddings.count()
    if n_vectors > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"{n_vectors} vectors exceed the broadcast gate "
            f"({MAX_BROADCAST_VECTORS}); use the LSH prefilter path"
        )
    rows = embeddings.select("vec_id", "embedding").collect()
    if not rows:
        return spark.createDataFrame(
            [], "id_a bigint, id_b bigint, cosine double"
        )
    all_ids = np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat_n = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((all_ids, mat_n))

    schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, m_all = bc.value
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            sims = (m / n[:, None]) @ m_all.T
            bi, bj = np.nonzero(
                (sims >= min_cosine) & (ids[:, None] < ids_all[None, :])
            )
            if len(bi):
                yield pd.DataFrame(
                    {
                        "id_a": ids[bi],
                        "id_b": ids_all[bj],
                        "cosine": sims[bi, bj],
                    }
                )

    return (
        embeddings.select("vec_id", "embedding")
        .mapInPandas(kernel, schema)
        .orderBy("id_a", "id_b")
    )


def near_duplicate_keep_best(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 32,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Quality-aware dedup selection: within each near-duplicate cluster,
    keep the LONGEST document (token count, doc_id tie-break) instead of the
    arbitrary min-id representative — what a curation pipeline actually
    wants when duplicates differ in truncation or boilerplate stripping.

    Output: ``(doc_id, cluster_id, n_tokens, keep_best)`` for every
    clustered document. Builds on ``near_duplicate_clusters`` (same pair
    stream, reusable via ``pairs``); the quality join is per-doc metadata
    (token counts stay in codegen) and the selection is one row_number
    window over the cluster key.
    """
    clusters = near_duplicate_clusters(
        documents, n=n, min_jaccard=min_jaccard, text_col=text_col,
        max_shingle_df=max_shingle_df, pairs=pairs,
    ).select("doc_id", "cluster_id")
    tok = documents.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        clusters.join(tok, "doc_id")
        .withColumn("keep_best", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "n_tokens", "keep_best")
        .orderBy("doc_id")
    )
