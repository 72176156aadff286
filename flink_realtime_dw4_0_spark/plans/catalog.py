"""Query catalog façade: importing this module registers every tier's
queries into CATALOG — the same entries, names, oracles, and iteration
order as the former single-file catalog (split by tier for
maintainability; zero behavior change).

This is the engine's capability inventory made executable: every
SURVEY §2 operator plus the training-data-pipeline tiers as a
(Spark plan, DuckDB oracle) pair over the driver's testdata tables.
Streaming-only semantics (keyed state, watermark eviction, upsert
sinks) are exercised in tests/ with availableNow triggers; entries here
are their batch-equivalent plans, which is what the correctness gate
can check.
"""

from __future__ import annotations

from ._registry import CATALOG, QuerySpec, q, t  # noqa: F401

# registration order == former single-file order (bench iterates CATALOG
# in insertion order; the dedup cache-group adjacency depends on it)
from . import q_survey  # noqa: F401,E402
from . import q_dedup  # noqa: F401,E402
from . import q_analytics  # noqa: F401,E402
from . import q_tpch_extra  # noqa: F401,E402
from . import q_curation  # noqa: F401,E402
