"""API-surface snapshot/diff + Neo4j dialect notes
(reference: shared/compat.py, cli/utility.py compat-check)."""

from __future__ import annotations

import json

from pycypher_nmetl_spark.compat import (
    ApiSurface, ApiSymbol, NEO4J_COMPAT_NOTES, check_neo4j_compat,
    diff_surfaces, snapshot_api_surface,
)


def test_snapshot_contains_core_api_only_package_symbols():
    surface = snapshot_api_surface()
    names = set(surface.symbols)
    assert "pycypher_nmetl_spark.engine.CypherEngine" in names
    assert "pycypher_nmetl_spark.catalog.GraphCatalog" in names
    # imported third-party names must not leak into the surface
    assert not any(n.endswith(".DataFrame") for n in names)
    assert not any(n.endswith(".Any") for n in names)
    # signatures are stable (no memory addresses from object reprs)
    assert not any("0x" in s.signature for s in surface.symbols.values())


def test_snapshot_roundtrip_and_self_diff_clean():
    surface = snapshot_api_surface()
    again = ApiSurface.from_json(surface.to_json())
    report = diff_surfaces(again, snapshot_api_surface())
    assert not report.has_breaking_changes
    assert report.summary() == "API surface unchanged."


def test_diff_flags_removed_and_changed():
    surface = snapshot_api_surface()
    doc = json.loads(surface.to_json())
    doc["symbols"]["pycypher_nmetl_spark.engine.Gone"] = {
        "kind": "class", "signature": "(x)",
    }
    key = "pycypher_nmetl_spark.engine.CypherEngine"
    doc["symbols"][key]["signature"] = "(totally, different)"
    old = ApiSurface.from_json(json.dumps(doc))
    report = diff_surfaces(old, snapshot_api_surface())
    assert report.has_breaking_changes
    assert "pycypher_nmetl_spark.engine.Gone" in report.removed
    assert any(n == key for n, _, _ in report.changed)


def test_neo4j_notes_lookup():
    hit = check_neo4j_compat("detach")
    assert hit["feature"] == "DETACH DELETE" and hit["supported"]
    assert check_neo4j_compat("nonexistent-thing") is None
    # unsupported entries must carry a workaround or explanation
    for feature, info in NEO4J_COMPAT_NOTES.items():
        assert info["notes"]
        if not info["supported"]:
            assert "workaround" in info, feature


def test_cli_compat_check(tmp_path, capsys):
    from pycypher_nmetl_spark.cli import main

    assert main(["compat-check"]) == 0
    out = capsys.readouterr().out
    assert "public symbols" in out and "classes" in out

    snap = str(tmp_path / "api.json")
    assert main(["compat-check", "--snapshot", snap]) == 0
    capsys.readouterr()
    assert main(["compat-check", "--diff", snap]) == 0
    assert "unchanged" in capsys.readouterr().out

    assert main(["compat-check", "--neo4j", "spatial"]) == 0
    out = capsys.readouterr().out
    assert "NOT SUPPORTED" in out and "Workaround" in out
    assert main(["compat-check", "--neo4j", "zzz"]) == 1
    capsys.readouterr()
    assert main(["compat-check", "--neo4j-all"]) == 0
    assert "[+] MATCH" in capsys.readouterr().out
