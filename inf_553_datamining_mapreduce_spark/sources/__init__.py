from inf_553_datamining_mapreduce_spark.sources.readers import (
    load_testdata,
    read_csv_with_header,
    read_double_colon,
    read_parquet_table,
)

__all__ = [
    "load_testdata",
    "read_csv_with_header",
    "read_double_colon",
    "read_parquet_table",
]
