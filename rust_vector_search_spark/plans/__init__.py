"""The oracle-checked query registry — the driver contract surface.

Importing this package populates ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLES`` (name → DuckDB SQL twin). Every
SQL-expressible operator from SURVEY.md §2 has one entry in each dict;
genuinely non-SQL-expressible ops (seeded-random index builds, streaming)
register a query only (rows-only check).
"""

from .registry import ORACLES, QUERIES, register

from . import relational  # noqa: E402,F401  (registration side effects)
from . import vectorsearch  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import annindex  # noqa: E402,F401
from . import streamingops  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
