"""Projection / scalar expression operators (SURVEY §2.3 P1-P7).

Everything here is a thin, named composition of built-in Column
expressions — fully inside whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_project(df: DataFrame, map_col: str, fields: dict[str, str], *extra: Column) -> DataFrame:
    """P1 — extract logical columns from a MAP payload.

    Parity: ``data['id'] AS id`` projections (DwdTradeCartAdd.java:63-77,
    DwdTradeOrderDetail.java:127-191).  ``fields`` maps output name → map key.
    """
    cols = [F.col(map_col).getItem(k).alias(out) for out, k in fields.items()]
    return df.select(*cols, *extra)


def struct_field(col: str, field: str) -> Column:
    """P2 — nested struct access, `info.dic_name` (DwdInteractionCommentInfo.java:73)."""
    return F.col(f"{col}.{field}")


def route_filter(df: DataFrame, **eq: str) -> DataFrame:
    """P3 — conjunction of equality predicates routing one stream to a
    logical table (DwdTradeCartAdd.java:79-81)."""
    cond = F.lit(True)
    for c, v in eq.items():
        cond = cond & (F.col(c) == v)
    return df.filter(cond)


def updated_field(df_old_col: Column, key: str) -> Column:
    """P4 — `old['x'] IS NOT NULL` update detection (DwdTradeCartAdd.java:85)."""
    return df_old_col.getItem(key).isNotNull()


def cart_add_delta(data_num: Column, old_num: Column, typ: Column) -> Column:
    """P5+P6 — the incremental cart-add quantity (DwdTradeCartAdd.java:68):
    ``if(type='insert', data.sku_num, cast(data.sku_num - old.sku_num))``.
    """
    new = data_num.cast("long")
    old = old_num.cast("long")
    return F.when(typ == "insert", new).otherwise(new - old)
