"""Sources and sinks: CSV-directory bronze ingest, parquet lakehouse layers,
JDBC pass-through."""

from .csv_source import read_crawl_csv_dir, write_crawl_csv
from .parquet_source import load_testdata, register_testdata_views

__all__ = [
    "read_crawl_csv_dir",
    "write_crawl_csv",
    "load_testdata",
    "register_testdata_views",
]
