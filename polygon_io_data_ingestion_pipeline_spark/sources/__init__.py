from .tables import TESTDATA_TABLES, table
from .csv_bars import read_bar_flatfiles, resolve_bar_columns
from .jsonl import read_jsonl, write_jsonl
from .lake import delete_from_lake, lake_manifest, merge_into_lake, read_lake, write_lake, write_lake_zordered, zorder_key
from .watchlist import load_watchlist, union_universes

__all__ = [
    "TESTDATA_TABLES",
    "table",
    "read_bar_flatfiles",
    "resolve_bar_columns",
    "read_jsonl",
    "write_jsonl",
    "delete_from_lake",
    "lake_manifest",
    "merge_into_lake",
    "read_lake",
    "write_lake",
    "write_lake_zordered",
    "zorder_key",
    "load_watchlist",
    "union_universes",
]
