"""Single-parse literal array constructors.

``F.array(*[F.lit(v) for v in values])`` costs 2-4 Py4J round-trips per
element; a 16x64 sign matrix built that way adds ~3 s of DRIVER time to
every query construction (measured, r11 optimization round — guide §5: the
driver should do almost no work, and §7.3: plan/expression construction is
single-threaded driver time).  Rendering the same values as ONE SQL literal
expression and calling ``F.expr`` once is a single round-trip plus one
Catalyst parse.

Value fidelity: floats are rendered with ``repr``, the shortest string that
round-trips to the identical IEEE-754 double in both CPython and Java's
``Double.parseDouble``, so the resulting plan literal is bit-identical to
the ``F.lit(float(x))`` it replaces.  Non-finite floats are rejected — the
callers build sign matrices, centroids and fixed-point constants, where a
NaN/Inf would be a bug upstream.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scalar_sql(v, sql_type: str) -> str:
    if sql_type == "BIGINT":
        return f"{int(v)}L"
    if sql_type == "DOUBLE":
        x = float(v)
        if not math.isfinite(x):
            raise ValueError(f"non-finite literal {v!r}")
        return f"{x!r}D"
    if sql_type == "INT":
        return str(int(v))
    raise ValueError(f"unsupported literal type {sql_type!r}")


def sql_array(values: Sequence, sql_type: str = "DOUBLE") -> Column:
    """One-round-trip ``array(...)`` literal of numeric ``values``."""
    return F.expr(
        "array(" + ",".join(_scalar_sql(v, sql_type) for v in values) + ")"
    )


def sql_matrix(rows: Sequence[Sequence], sql_type: str = "DOUBLE") -> Column:
    """One-round-trip ``array(array(...), ...)`` literal of a numeric
    matrix (list of equal-typed rows)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_scalar_sql(v, sql_type) for v in row) + ")"
            for row in rows
        )
        + ")"
    )
