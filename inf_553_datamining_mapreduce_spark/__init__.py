"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``yudong-94/INF_553_DataMining_MapReduce``.

The reference (surveyed in SURVEY.md) covers four query families:

1. Grouped-average analytics over multi-way joins
   (``1-Group Average Calculation/task1.scala``, ``task2.scala``)
2. Frequent-itemset mining — SON + A-priori
   (``2-Market Basket Analysis/Solutions/SON.scala``)
3. Graph construction + edge betweenness (simplified Girvan-Newman credit
   rule) (``3-Graph Community Detection/Betweenness.scala``)
4. Community detection — Girvan-Newman with modularity-guided stopping
   (``3-Graph Community Detection/Community.scala``)

This engine re-expresses all of them Spark-first (DataFrame / Spark SQL /
Catalyst; ``mapInPandas`` only for the two genuinely custom kernels), and adds
the large-scale training-data-pipeline surface the reference lacks: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding), similarity
search, text analysis, multimodal column plumbing, and windowed / streaming
event analytics.
"""

from inf_553_datamining_mapreduce_spark.session import (
    get_spark,
    maybe_release_under_pressure,
    register_release_hook,
    release_session_blocks,
)

__all__ = [
    "get_spark",
    "release_session_blocks",
    "register_release_hook",
    "maybe_release_under_pressure",
]
