"""Column-reference helper shared by builder/executor/compose/facade."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """F.col with the name backtick-quoted: reference field names
    routinely contain dots (untokenized.field2, __key__.field,
    sorted.intfield1 — fieldregistry.py:31-37 prefix conventions) which
    bare F.col would mis-parse as struct access."""
    return F.col(f"`{name}`")
