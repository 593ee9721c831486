from .registry import (
    TESTDATA_TABLES,
    load_table,
    register_testdata,
    warm_tables,
)

__all__ = ["TESTDATA_TABLES", "load_table", "register_testdata",
           "warm_tables"]
