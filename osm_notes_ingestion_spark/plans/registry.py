"""Central query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from .queries_relational import QUERIES as RELATIONAL
from .queries_spatial import QUERIES as SPATIAL
from .queries_text import QUERIES as TEXT

REGISTRY: dict[str, tuple] = {}
REGISTRY.update(SPATIAL)
REGISTRY.update(RELATIONAL)
REGISTRY.update(TEXT)
