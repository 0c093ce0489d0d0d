"""Result-set serialization with reference-compatible coercions.

The reference's observable output semantics (``core/ai_query_generator.py:
325-341``): rows become dicts; date/datetime -> ISO-8601 via ``isoformat()``;
numeric values in any column whose name contains ``salary`` -> ``round(float,
2)``; ``None`` -> null; **everything else stringified**. Internally we keep
native Spark types (SURVEY.md 7.2 deliberate deviation) and apply this
coercion only at the compatibility boundary.
"""

from __future__ import annotations

import datetime
from decimal import Decimal
from typing import Any


def serialize_value(column_name: str, value: Any) -> Any:
    if value is None:
        return None
    if hasattr(value, "isoformat"):  # date / datetime
        return value.isoformat()
    if isinstance(value, (int, float, Decimal)) and "salary" in column_name.lower():
        return round(float(value), 2)
    return str(value)


def serialize_rows(columns: list[str], rows: list[tuple]) -> list[dict[str, Any]]:
    return [
        {col: serialize_value(col, row[i]) for i, col in enumerate(columns)}
        for row in rows
    ]
