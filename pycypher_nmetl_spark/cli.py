"""CLI (reference: cli/main.py:39-98 — run/validate/list-queries/query/
parse/schema/functions/health/security-check surface, Spark-backed).

    python -m pycypher_nmetl_spark run pipeline.yaml
    python -m pycypher_nmetl_spark validate pipeline.yaml
    python -m pycypher_nmetl_spark list-queries pipeline.yaml
    python -m pycypher_nmetl_spark query pipeline.yaml "MATCH ..." [--limit N]
    python -m pycypher_nmetl_spark schema pipeline.yaml
    python -m pycypher_nmetl_spark security-check pipeline.yaml [--allow-host H]
    python -m pycypher_nmetl_spark health pipeline.yaml
    python -m pycypher_nmetl_spark parse "MATCH (n) RETURN n"
    python -m pycypher_nmetl_spark functions
    python -m pycypher_nmetl_spark config [--json]
    python -m pycypher_nmetl_spark metrics pipeline.yaml [--json]
    python -m pycypher_nmetl_spark health-server pipeline.yaml [--port N]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pycypher-nmetl-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name in ("run", "validate", "list-queries"):
        s = sub.add_parser(name)
        s.add_argument("config")

    s = sub.add_parser("query")
    s.add_argument("config")
    s.add_argument("cypher")
    s.add_argument("--limit", type=int, default=20)

    s = sub.add_parser("parse")
    s.add_argument("cypher")

    s = sub.add_parser("format")
    s.add_argument("cypher")

    sub.add_parser("functions")

    s = sub.add_parser("schema")
    s.add_argument("config")

    s = sub.add_parser("security-check")
    s.add_argument("config")
    s.add_argument("--allow-host", action="append", default=None)
    s.add_argument("--allow-root", action="append", default=None)

    s = sub.add_parser("health")
    s.add_argument("config")

    s = sub.add_parser("repl")
    s.add_argument("config", nargs="?")

    s = sub.add_parser("config")
    s.add_argument("--json", action="store_true", dest="as_json")

    s = sub.add_parser("compat-check")
    s.add_argument("--snapshot", help="save API surface snapshot to JSON file")
    s.add_argument("--diff", help="compare current API against a saved snapshot")
    s.add_argument("--neo4j", help="look up one Neo4j feature's support status")
    s.add_argument("--neo4j-all", action="store_true", help="list all dialect notes")

    s = sub.add_parser("metrics")
    s.add_argument("config")
    s.add_argument("--json", action="store_true", dest="as_json")

    s = sub.add_parser("health-server")
    s.add_argument("config")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)

    args = p.parse_args(argv)

    if args.cmd == "parse":
        from pycypher_nmetl_spark.cypher.parser import parse as parse_cypher

        print(parse_cypher(args.cypher))
        return 0

    if args.cmd == "format":
        from pycypher_nmetl_spark.cypher.formatter import format_query
        from pycypher_nmetl_spark.cypher.parser import parse as parse_cypher

        print(format_query(parse_cypher(args.cypher)))
        return 0

    if args.cmd == "functions":
        from pycypher_nmetl_spark.functions.scalar import (
            AGGREGATE_FUNCTIONS, SCALAR_FUNCTIONS,
        )

        print(json.dumps({
            "scalar": sorted(SCALAR_FUNCTIONS),
            "aggregate": sorted(AGGREGATE_FUNCTIONS),
        }, indent=2))
        return 0

    if args.cmd == "config":
        return _show_config(as_json=args.as_json)

    if args.cmd == "compat-check":
        return _compat_check(args)

    if args.cmd == "repl":
        return _repl(args.config)

    from pycypher_nmetl_spark.pipeline.config import load_config

    config = load_config(args.config)

    if args.cmd == "validate":
        errors = config.validate()
        if errors:
            print("\n".join(f"ERROR: {e}" for e in errors))
            return 1
        print(f"{config.name}: OK ({len(config.queries)} queries, "
              f"{len(config.entities)} entity sources, "
              f"{len(config.relationships)} relationship sources)")
        return 0

    if args.cmd == "list-queries":
        from pycypher_nmetl_spark.pipeline.runner import order_queries

        for q in order_queries(config.queries):
            desc = f" — {q.description}" if q.description else ""
            print(f"{q.id}{desc}")
        return 0

    if args.cmd == "security-check":
        # no Spark needed: validate every source URI against the policy
        # (reference: cli/main.py security-check + ingestion/security.py)
        from pycypher_nmetl_spark.pipeline.security import (
            SourceSecurityError, SourceSecurityPolicy, validate_source_uri,
        )

        policy = SourceSecurityPolicy(
            allowed_hosts=tuple(args.allow_host) if args.allow_host else None,
            allowed_local_roots=tuple(args.allow_root) if args.allow_root else None,
        )
        failures = 0
        for src in list(config.entities) + list(config.relationships):
            try:
                validate_source_uri(src.uri, policy)
                print(f"OK    {src.uri}")
            except SourceSecurityError as e:
                print(f"FAIL  {e}")
                failures += 1
        return 1 if failures else 0

    from pycypher_nmetl_spark.session import get_spark

    spark = get_spark(app_name=f"pipeline:{config.name}")

    if args.cmd == "run":
        from pycypher_nmetl_spark.pipeline.runner import run_pipeline

        result = run_pipeline(spark, config)
        for qid in result.order:
            status = (
                f"-> {result.written[qid]}" if qid in result.written
                else f"FAILED: {result.errors[qid]}" if qid in result.errors
                else "ok"
            )
            print(f"{qid}: {status}")
        return 1 if result.errors else 0

    if args.cmd == "query":
        from pycypher_nmetl_spark.engine import CypherEngine
        from pycypher_nmetl_spark.pipeline.runner import build_catalog, load_functions

        engine = CypherEngine(build_catalog(spark, config))
        load_functions(engine, config.functions)
        engine.execute(args.cypher).show(args.limit, truncate=False)
        return 0

    if args.cmd == "schema":
        # label -> columns/dtypes, rel type -> endpoints + columns
        # (reference: cli/main.py schema command)
        from pycypher_nmetl_spark.pipeline.runner import build_catalog

        cat = build_catalog(spark, config)
        out = {"labels": {}, "relationship_types": {}}
        for label in cat.labels():
            out["labels"][label] = dict(cat.nodes(label).dtypes)
        for rt in cat.rel_types():
            src_l, dst_l = cat.edge_endpoints(rt)
            out["relationship_types"][rt] = {
                "src_label": src_l,
                "dst_label": dst_l,
                "columns": dict(cat.edges(rt).dtypes),
            }
        print(json.dumps(out, indent=2))
        return 0

    if args.cmd == "health":
        from pycypher_nmetl_spark.engine import CypherEngine
        from pycypher_nmetl_spark.pipeline.runner import build_catalog

        engine = CypherEngine(build_catalog(spark, config))
        print(json.dumps({
            "status": "ok",
            "spark": spark.version,
            "labels": len(engine.catalog.labels()),
            "rel_types": len(engine.catalog.rel_types()),
            "data_epoch": engine.catalog.data_epoch,
        }))
        return 0

    if args.cmd == "metrics":
        # same payload the HealthServer /metrics endpoint serves, as a
        # one-shot (reference: cli/system.py metrics_impl)
        from pycypher_nmetl_spark.engine import CypherEngine
        from pycypher_nmetl_spark.pipeline.runner import build_catalog

        engine = CypherEngine(build_catalog(spark, config))
        counters = {
            "catalog_labels": len(engine.catalog.labels()),
            "catalog_rel_types": len(engine.catalog.rel_types()),
            "catalog_data_epoch": engine.catalog.data_epoch,
            **engine.metrics.counters,
        }
        if engine.cache is not None:
            counters["result_cache_hits"] = engine.cache.hits
            counters["result_cache_misses"] = engine.cache.misses
        if args.as_json:
            print(json.dumps(counters, indent=2, sort_keys=True))
        else:
            for k in sorted(counters):
                print(f"{k} {counters[k]}")
        return 0

    if args.cmd == "health-server":
        from pycypher_nmetl_spark.engine import CypherEngine
        from pycypher_nmetl_spark.health import HealthServer
        from pycypher_nmetl_spark.pipeline.runner import build_catalog

        engine = CypherEngine(build_catalog(spark, config))
        srv = HealthServer(engine, host=args.host, port=args.port).start()
        print(f"health server on http://{args.host}:{srv.port} "
              f"(GET /health, /metrics) — Ctrl-C to stop")
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            return 0

    return 2


def _compat_check(args) -> int:
    """API snapshot/diff + Neo4j dialect notes (reference: cli/utility.py
    compat_check_impl). Exit 1 on breaking diff or unknown feature."""
    from pycypher_nmetl_spark.compat import (
        NEO4J_COMPAT_NOTES, ApiSurface, check_neo4j_compat, diff_surfaces,
        snapshot_api_surface,
    )

    if args.snapshot:
        surface = snapshot_api_surface()
        with open(args.snapshot, "w") as f:
            f.write(surface.to_json())
        print(f"Saved API snapshot: {len(surface.symbols)} symbols "
              f"(v{surface.version}) -> {args.snapshot}")
        return 0
    if args.diff:
        with open(args.diff) as f:
            old = ApiSurface.from_json(f.read())
        report = diff_surfaces(old, snapshot_api_surface())
        print(report.summary())
        return 1 if report.has_breaking_changes else 0
    if args.neo4j:
        result = check_neo4j_compat(args.neo4j)
        if result is None:
            print(f"No compatibility notes found for '{args.neo4j}'.")
            return 1
        status = "SUPPORTED" if result["supported"] else "NOT SUPPORTED"
        print(f"{result['feature']}: {status}")
        print(f"  {result['notes']}")
        if "workaround" in result:
            print(f"  Workaround: {result['workaround']}")
        return 0
    if args.neo4j_all:
        for feature, info in NEO4J_COMPAT_NOTES.items():
            status = "+" if info["supported"] else "-"
            print(f"  [{status}] {feature}")
            print(f"      {info['notes']}")
            if "workaround" in info:
                print(f"      Workaround: {info['workaround']}")
        return 0
    surface = snapshot_api_surface()
    print(f"pycypher-nmetl-spark v{surface.version} — "
          f"{len(surface.symbols)} public symbols")
    by_kind: dict[str, list[str]] = {}
    for sym in surface.symbols.values():
        by_kind.setdefault(sym.kind, []).append(sym.name)
    for kind in sorted(by_kind):
        names = sorted(by_kind[kind])
        plural = "classes" if kind == "class" else f"{kind}s"
        print(f"\n  {plural} ({len(names)}):")
        for name in names:
            print(f"    {name}")
    return 0


def _show_config(as_json: bool) -> int:
    """Show every configuration knob this engine honors: environment
    variables with their live values, and CypherEngine constructor
    defaults introspected from the signature so the listing can't drift
    from the code (reference: cli/system.py CONFIG_REGISTRY/config_impl)."""
    import inspect
    import os

    env_registry = [
        ("SPARK_GRAFT_CPUS", "local[N] core count for get_spark()",
         str(os.cpu_count() or 8)),
        ("SPARK_DRIVER_MEMORY", "Spark driver memory", "8g"),
        ("SPARK_GRAFT_AUDIT_LOG", "structured audit log (1/true/yes)",
         "disabled"),
        ("SPARK_GRAFT_SF_DIR", "bench.py data directory",
         "/root/testdata/sf0.1"),
        ("SPARK_GRAFT_BENCH_REPS", "bench.py repetitions", "3"),
    ]
    env_entries = [
        {
            "variable": name,
            "value": os.environ.get(name, default),
            "source": "env" if name in os.environ else "default",
            "description": desc,
        }
        for name, desc, default in env_registry
    ]

    from pycypher_nmetl_spark.compiler import paths
    from pycypher_nmetl_spark.engine import CypherEngine

    sig = inspect.signature(CypherEngine.__init__)
    engine_defaults = {
        name: repr(param.default)
        for name, param in sig.parameters.items()
        if param.default is not inspect.Parameter.empty
    }
    engine_defaults["paths.MAX_HOPS"] = repr(paths.MAX_HOPS)
    engine_defaults["paths.LAZY_MAX_LEVELS"] = repr(paths.LAZY_MAX_LEVELS)

    if as_json:
        print(json.dumps(
            {"environment": env_entries, "engine_defaults": engine_defaults},
            indent=2,
        ))
        return 0
    print("\nEnvironment variables\n")
    for e in env_entries:
        marker = "*" if e["source"] == "env" else " "
        print(f"  {marker} {e['variable']:<26} {e['value']:<22} {e['description']}")
    print("\nCypherEngine defaults (constructor keywords)\n")
    for k in sorted(engine_defaults):
        print(f"    {k:<34} {engine_defaults[k]}")
    print("\n  * = set via environment variable\n")
    return 0


def _repl(config_path: str | None) -> int:
    """Interactive loop (reference: repl.py). Commands: :quit, :labels,
    :types, :explain <query>, :profile <query>."""
    from pycypher_nmetl_spark.engine import CypherEngine
    from pycypher_nmetl_spark.session import get_spark

    spark = get_spark(app_name="repl")
    if config_path:
        from pycypher_nmetl_spark.pipeline.config import load_config
        from pycypher_nmetl_spark.pipeline.runner import build_catalog, load_functions

        config = load_config(config_path)
        engine = CypherEngine(build_catalog(spark, config))
        load_functions(engine, config.functions)
    else:
        from pycypher_nmetl_spark.catalog import GraphCatalog

        engine = CypherEngine(GraphCatalog(spark))
    print("pycypher-nmetl-spark REPL — :quit to exit")
    while True:
        try:
            line = input("cypher> ").strip()
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if not line:
            continue
        if line in (":quit", ":exit", ":q"):
            return 0
        if line == ":labels":
            print(engine.catalog.labels())
            continue
        if line == ":types":
            print(engine.catalog.rel_types())
            continue
        try:
            if line.startswith(":explain "):
                print(engine.explain(line[len(":explain "):]))
            elif line.startswith(":profile "):
                print(engine.profile(line[len(":profile "):]))
            else:
                engine.execute(line).show(50, truncate=False)
        except Exception as e:  # noqa: BLE001
            print(f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # e.g. `... | head` closed the pipe
        sys.exit(0)
