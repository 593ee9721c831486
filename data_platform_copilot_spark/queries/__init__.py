"""Query-pack registry.

Import every group module for its registration side effects, then
re-export the combined QUERIES / ORACLE dicts. Parity rules for new
entries are documented in ``core.py``'s module docstring.
"""

from .core import ORACLE, QUERIES, query  # noqa: F401  (registry first)

from . import relational  # noqa: E402,F401
from . import scalar  # noqa: E402,F401
from . import dq  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import extras  # noqa: E402,F401
from . import extras2  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import quality  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLE", "query"]
