"""Central query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from .queries_relational import QUERIES as RELATIONAL
from .queries_spatial import QUERIES as SPATIAL
from .queries_text import QUERIES as TEXT

REGISTRY: dict[str, tuple] = {}
REGISTRY.update(SPATIAL)
REGISTRY.update(RELATIONAL)
REGISTRY.update(TEXT)

# a name collision across families would silently DROP a query from the
# driver gate (dict.update is last-wins) — fail loudly instead
assert len(REGISTRY) == len(SPATIAL) + len(RELATIONAL) + len(TEXT), (
    "duplicate query name across families: "
    f"{sorted(set(SPATIAL) & set(RELATIONAL) | set(SPATIAL) & set(TEXT) | set(RELATIONAL) & set(TEXT))}"
)
