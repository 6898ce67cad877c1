"""Central query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from .queries_relational import QUERIES as RELATIONAL
from .queries_spatial import QUERIES as SPATIAL

REGISTRY: dict[str, tuple] = {}
REGISTRY.update(SPATIAL)
REGISTRY.update(RELATIONAL)
