"""API-surface snapshots + Neo4j-dialect compatibility notes
(reference: shared/compat.py, cli/utility.py compat-check).

Two independent utilities behind the ``compat-check`` CLI command:

- :func:`snapshot_api_surface` introspects the public API (classes,
  functions, and their signatures) of this package so a saved JSON
  snapshot can be diffed against a later version — removed symbols or
  changed signatures are breaking changes (exit 1 from the CLI).
- :data:`NEO4J_COMPAT_NOTES` documents how this engine's Cypher dialect
  relates to Neo4j's, feature by feature, so users migrating queries
  can check support up front. The notes describe THIS engine — they are
  not a copy of the reference's support matrix (e.g. DETACH DELETE and
  FOREACH are supported here).
"""

from __future__ import annotations

import importlib
import inspect
import json
from dataclasses import dataclass, field
from typing import Any

#: package modules whose public names form the supported API surface
_PUBLIC_MODULES = (
    "pycypher_nmetl_spark",
    "pycypher_nmetl_spark.engine",
    "pycypher_nmetl_spark.catalog",
    "pycypher_nmetl_spark.profiler",
    "pycypher_nmetl_spark.semantic",
    "pycypher_nmetl_spark.algorithms",
    "pycypher_nmetl_spark.llmops",
    "pycypher_nmetl_spark.llmops.dedup",
    "pycypher_nmetl_spark.llmops.similarity",
    "pycypher_nmetl_spark.llmops.textstats",
    "pycypher_nmetl_spark.llmops.export",
    "pycypher_nmetl_spark.streaming",
    "pycypher_nmetl_spark.pipeline",
)


@dataclass(frozen=True)
class ApiSymbol:
    name: str  # qualified: module.symbol
    kind: str  # class | function
    signature: str


@dataclass
class ApiSurface:
    version: str
    symbols: dict[str, ApiSymbol] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "symbols": {
                    k: {"kind": s.kind, "signature": s.signature}
                    for k, s in sorted(self.symbols.items())
                },
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "ApiSurface":
        doc = json.loads(text)
        return cls(
            version=doc.get("version", "?"),
            symbols={
                k: ApiSymbol(name=k, kind=v["kind"], signature=v["signature"])
                for k, v in doc.get("symbols", {}).items()
            },
        )


def _signature_of(obj: Any) -> str:
    import re

    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # object-default reprs embed memory addresses; strip for stability
    return re.sub(r" at 0x[0-9a-fA-F]+", "", sig)


def snapshot_api_surface() -> ApiSurface:
    """Introspect the public classes/functions of the package modules.

    Public = listed in ``__all__`` if the module defines one, else every
    non-underscore top-level class/function DEFINED in that module
    (re-exports are attributed to their defining module).
    """
    from pycypher_nmetl_spark import __version__

    surface = ApiSurface(version=__version__)
    for mod_name in _PUBLIC_MODULES:
        mod = importlib.import_module(mod_name)
        names = getattr(mod, "__all__", None) or [
            n for n in vars(mod) if not n.startswith("_")
        ]
        for name in names:
            obj = getattr(mod, name, None)
            if inspect.isclass(obj) or inspect.isfunction(obj):
                defined_in = getattr(obj, "__module__", mod_name)
                # only symbols this package defines (imported third-party
                # names like DataFrame are not our API), counted once —
                # in their defining module when that module is public too
                if not str(defined_in).startswith("pycypher_nmetl_spark"):
                    continue
                if defined_in != mod_name and defined_in in _PUBLIC_MODULES:
                    continue
                kind = "class" if inspect.isclass(obj) else "function"
                sig = _signature_of(obj)
                surface.symbols[f"{mod_name}.{name}"] = ApiSymbol(
                    name=f"{mod_name}.{name}", kind=kind, signature=sig
                )
    return surface


@dataclass
class DiffReport:
    removed: list[str]
    added: list[str]
    changed: list[tuple[str, str, str]]  # (name, old_sig, new_sig)

    @property
    def has_breaking_changes(self) -> bool:
        return bool(self.removed or self.changed)

    def summary(self) -> str:
        lines = []
        if self.removed:
            lines.append(f"BREAKING — removed symbols ({len(self.removed)}):")
            lines += [f"  - {n}" for n in self.removed]
        if self.changed:
            lines.append(f"BREAKING — changed signatures ({len(self.changed)}):")
            lines += [
                f"  ~ {n}: {old} -> {new}" for n, old, new in self.changed
            ]
        if self.added:
            lines.append(f"added symbols ({len(self.added)}):")
            lines += [f"  + {n}" for n in self.added]
        if not lines:
            lines.append("API surface unchanged.")
        return "\n".join(lines)


def diff_surfaces(old: ApiSurface, new: ApiSurface) -> DiffReport:
    removed = sorted(set(old.symbols) - set(new.symbols))
    added = sorted(set(new.symbols) - set(old.symbols))
    changed = []
    for name in sorted(set(old.symbols) & set(new.symbols)):
        o, n = old.symbols[name], new.symbols[name]
        if o.signature != n.signature:
            # parameter REMOVAL or rename breaks callers; appending new
            # defaulted parameters does not — treat any textual change
            # conservatively as breaking, like the reference does
            changed.append((name, o.signature, n.signature))
    return DiffReport(removed=removed, added=added, changed=changed)


# --------------------------------------------------------------------- #
# Neo4j Cypher dialect notes — truthful for THIS engine
# --------------------------------------------------------------------- #
NEO4J_COMPAT_NOTES: dict[str, dict[str, Any]] = {
    "MATCH": {"supported": True, "notes": "Full pattern matching incl. multi-path, anonymous nodes, cycles."},
    "OPTIONAL MATCH": {"supported": True, "notes": "Compiles to a left outer join; IS NULL anti-pattern works."},
    "CREATE": {"supported": True, "notes": "Nodes and relationships; distributed id allocation."},
    "MERGE": {"supported": True, "notes": "With ON CREATE SET / ON MATCH SET."},
    "DELETE": {"supported": True, "notes": "Deleting a node with relationships without DETACH raises, as in openCypher."},
    "DETACH DELETE": {"supported": True, "notes": "Removes the node and all its relationships."},
    "SET": {"supported": True, "notes": "Property, +=, map replace, labels, dynamic keys."},
    "REMOVE": {"supported": True, "notes": "Properties and labels."},
    "FOREACH": {"supported": True, "notes": "Update clauses over list elements."},
    "UNWIND": {"supported": True, "notes": "Null/empty lists produce no rows, as in Neo4j."},
    "WITH": {"supported": True, "notes": "Rescoping, implicit aggregation, trailing WHERE, ORDER BY/SKIP/LIMIT."},
    "UNION": {"supported": True, "notes": "UNION and UNION ALL; mixing both in one query is rejected."},
    "CALL procedure": {"supported": True, "notes": "Table-valued procedures with YIELD (db.labels, algo.* etc.); user procedures registrable."},
    "CALL subquery": {
        "supported": True,
        "notes": (
            "CALL { [WITH imports] ... RETURN ... } with per-invocation "
            "aggregation/DISTINCT/SKIP/LIMIT, nesting, and UNION [ALL] "
            "between branches (each branch with its own importing WITH). "
            "Writes inside the subquery are not supported."
        ),
    },
    "shortestPath": {"supported": True, "notes": "shortestPath and allShortestPaths, including lower bounds > 1."},
    "Variable-length paths": {"supported": True, "notes": "[*m..n] with edge-uniqueness; unbounded capped at 20 hops (configurable)."},
    "Quantified path patterns": {
        "supported": True,
        "notes": (
            "GQL ((a)-[r:T]->(b)){m,n} / + / * with inner labels, props "
            "and inline WHERE; inner variables become group (list) "
            "variables; zero repetitions bind the boundary nodes equal. "
            "Not supported: nested QPP, var-length rels inside a QPP, a "
            "path variable over a QPP path; unbounded quantifiers cap "
            "at 8 repetitions."
        ),
    },
    "List comprehensions": {"supported": True, "notes": "Including pattern comprehensions and quantifiers (ALL/ANY/NONE/SINGLE)."},
    "Map projections": {"supported": True, "notes": "m{.k, var, .*} forms."},
    "Temporal types": {"supported": True, "notes": "date/datetime/duration with truncate, components, duration arithmetic."},
    "Spatial types": {
        "supported": False,
        "notes": "point() and spatial predicates are not implemented.",
        "workaround": "Store lon/lat as doubles and use math functions (e.g. haversine via trig).",
    },
    "Indexes/constraints DDL": {
        "supported": False,
        "notes": "CREATE INDEX / CONSTRAINT statements are not part of this engine; Spark has no index structures.",
        "workaround": "Partition/bucket the underlying tables; Catalyst prunes and pushes down predicates.",
    },
    "Transactions": {"supported": True, "notes": "Single-statement atomicity plus multi-query transactional scripts (execute_many)."},
    "Parameters": {"supported": True, "notes": "$param substitution at compile time, including lists and maps."},
}


def check_neo4j_compat(feature: str) -> dict[str, Any] | None:
    feature_lower = feature.lower()
    for key, info in NEO4J_COMPAT_NOTES.items():
        if feature_lower in key.lower():
            return {"feature": key, **info}
    return None
