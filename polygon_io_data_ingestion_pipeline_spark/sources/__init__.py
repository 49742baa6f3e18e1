from .tables import TESTDATA_TABLES, table

__all__ = ["TESTDATA_TABLES", "table"]
