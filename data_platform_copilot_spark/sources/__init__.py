from .registry import TESTDATA_TABLES, load_table, register_testdata

__all__ = ["TESTDATA_TABLES", "load_table", "register_testdata"]
