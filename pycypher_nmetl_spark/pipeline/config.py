"""Pipeline YAML config model.

Mirrors the reference's PipelineConfig schema
(reference: packages/pycypher/src/pycypher/ingestion/config.py:211-879):
sources.entities / sources.relationships / functions / queries / output,
with ${ENV_VAR} interpolation in URIs and per-source SQL transforms.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _interp(value: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in os.environ:
            raise KeyError(f"environment variable {name} referenced in config is not set")
        return os.environ[name]

    return _ENV_RE.sub(sub, value)


@dataclass
class EntitySource:
    id: str
    uri: str
    entity_type: str
    id_col: str | None = None
    query: str | None = None  # SQL transform applied after load
    schema_hints: dict[str, str] | None = None
    format: str | None = None
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class RelationshipSource:
    id: str
    uri: str
    relationship_type: str
    source_col: str
    target_col: str
    id_col: str | None = None
    query: str | None = None
    schema_hints: dict[str, str] | None = None
    format: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    source_label: str | None = None
    target_label: str | None = None


@dataclass
class FunctionSpec:
    module: str
    names: list[str] = field(default_factory=list)  # empty = wildcard


@dataclass
class QuerySpec:
    id: str
    cypher: str
    description: str | None = None
    depends_on: list[str] = field(default_factory=list)  # explicit extras


@dataclass
class OutputSpec:
    query_id: str
    uri: str
    format: str | None = None
    mode: str = "overwrite"
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    name: str
    entities: list[EntitySource]
    relationships: list[RelationshipSource]
    functions: list[FunctionSpec]
    queries: list[QuerySpec]
    outputs: list[OutputSpec]
    description: str | None = None
    on_error: str = "fail"  # fail | skip
    # reuse one persisted frame for queries sharing a leading MATCH run
    # (read-only batches only; see CypherEngine.execute_many share_scans)
    share_scans: bool = False

    def validate(self) -> list[str]:
        """Static validation (reference: config.py check_* validators)."""
        errors: list[str] = []
        ids = [s.id for s in self.entities] + [s.id for s in self.relationships]
        dupes = {i for i in ids if ids.count(i) > 1}
        if dupes:
            errors.append(f"duplicate source ids: {sorted(dupes)}")
        qids = [q.id for q in self.queries]
        qdupes = {i for i in qids if qids.count(i) > 1}
        if qdupes:
            errors.append(f"duplicate query ids: {sorted(qdupes)}")
        for out in self.outputs:
            if out.query_id not in qids:
                errors.append(f"output references unknown query {out.query_id!r}")
        for q in self.queries:
            from pycypher_nmetl_spark.cypher.parser import parse
            from pycypher_nmetl_spark.cypher.tokenizer import CypherSyntaxError

            try:
                parse(q.cypher)
            except CypherSyntaxError as e:
                errors.append(f"query {q.id!r} does not parse: {e}")
        return errors


def load_config(path: str | Path) -> PipelineConfig:
    import yaml

    base = Path(path).parent
    raw: dict[str, Any] = yaml.safe_load(Path(path).read_text())

    sources = raw.get("sources", {}) or {}
    entities = [
        EntitySource(
            id=s["id"],
            uri=_interp(str(s["uri"])),
            entity_type=s["entity_type"],
            id_col=s.get("id_col"),
            query=s.get("query"),
            schema_hints=s.get("schema_hints"),
            format=s.get("format"),
            options=s.get("options", {}) or {},
        )
        for s in sources.get("entities", []) or []
    ]
    relationships = [
        RelationshipSource(
            id=s["id"],
            uri=_interp(str(s["uri"])),
            relationship_type=s["relationship_type"],
            source_col=s["source_col"],
            target_col=s["target_col"],
            id_col=s.get("id_col"),
            query=s.get("query"),
            schema_hints=s.get("schema_hints"),
            format=s.get("format"),
            options=s.get("options", {}) or {},
            source_label=s.get("source_label"),
            target_label=s.get("target_label"),
        )
        for s in sources.get("relationships", []) or []
    ]
    functions = [
        FunctionSpec(module=f["module"], names=list(f.get("names", []) or []))
        for f in raw.get("functions", []) or []
    ]

    queries = []
    for q in raw.get("queries", []) or []:
        if "cypher" in q:
            text = q["cypher"]
        elif "source" in q:
            text = (base / q["source"]).read_text()
        else:
            raise ValueError(f"query {q.get('id')!r} needs 'cypher' or 'source'")
        queries.append(
            QuerySpec(
                id=q["id"],
                cypher=text,
                description=q.get("description"),
                depends_on=list(q.get("depends_on", []) or []),
            )
        )

    outputs = [
        OutputSpec(
            query_id=o["query_id"],
            uri=_interp(str(o["uri"])),
            format=o.get("format"),
            mode=o.get("mode", "overwrite"),
            options=o.get("options", {}) or {},
        )
        for o in raw.get("output", []) or []
    ]

    project = raw.get("project", {}) or {}
    return PipelineConfig(
        name=project.get("name", Path(path).stem),
        description=project.get("description"),
        entities=entities,
        relationships=relationships,
        functions=functions,
        queries=queries,
        outputs=outputs,
        on_error=(raw.get("error_handling", {}) or {}).get("on_error", "fail"),
        share_scans=bool(project.get("share_scans", False)),
    )
