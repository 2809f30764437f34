from .readers import load_table, load_tables, read_raw_playlists, register_views
from .sinks import write_parquet, write_partitioned

__all__ = [
    "load_table",
    "load_tables",
    "read_raw_playlists",
    "register_views",
    "write_parquet",
    "write_partitioned",
]
