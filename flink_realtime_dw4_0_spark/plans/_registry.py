"""Catalog registry: the QuerySpec dataclass, the CATALOG dict, the
@q registration decorator, the table loader, and DuckDB fragments shared
across tiers.  Every q_*.py tier module registers into CATALOG at import
time; plans.catalog is the façade that imports them all."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.files import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver does rows-only check
    tags: tuple[str, ...] = field(default=())
    bench: bool = False  # included in bench.py headline set
    # None = expected linear-or-better at 100x scale (the default
    # contract every catalog entry is held to by the measured ladder,
    # BENCH_SCALE.json).  A non-None string declares a KNOWN
    # super-linear exact/output contract and names the measured-flat
    # plan of record to use at scale instead — so no consumer of
    # queries() mistakes an exactness reference for the 100 TB path.
    scale_contract: str | None = None


CATALOG: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None, tags: tuple[str, ...] = (),
      bench: bool = False, scale_contract: str | None = None):
    def deco(fn):
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, tags=tags,
                                  bench=bench, scale_contract=scale_contract)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# DuckDB-side tokenizer mirroring operators.text.tokenize
_DK_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
