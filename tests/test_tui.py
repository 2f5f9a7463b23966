"""TUI screen model (reference: packages/pycypher-tui screens; here a
pure state machine driven without a terminal — the curses driver is a
thin blitter around TuiModel)."""

from __future__ import annotations

import pytest

from pycypher_nmetl_spark.tui import SCREENS, TuiModel


def _type(model, text):
    for ch in text:
        model.handle_key(ch)


@pytest.fixture()
def model(golden):
    return TuiModel(golden)


def test_screen_switching_and_quit(model):
    assert model.screen == "overview"
    model.handle_key("2")
    assert model.screen == "model"
    model.handle_key("4")
    assert model.screen == "help"
    model.handle_key("q")
    assert model.running is False


def test_overview_renders_catalog_summary(model):
    lines = model.render(80, 24)
    assert len(lines) == 24
    assert all(len(ln) <= 80 for ln in lines)
    text = "\n".join(lines)
    assert "no pipeline config loaded" in text
    assert "2 labels" in text  # Person + Company in the golden graph


def test_model_screen_lists_labels_and_endpoints(model):
    model.handle_key("2")
    text = "\n".join(model.render(100, 30))
    assert "(:Person)" in text and "(:Company)" in text
    assert "(:Person)-[:KNOWS]->(:Person)" in text
    assert "name:string" in text


def test_query_screen_runs_and_scrolls(model):
    model.handle_key("3")
    _type(model, "MATCH (p:Person) RETURN p.name AS name ORDER BY name")
    model.handle_key("ENTER")
    assert model.status.endswith("ms") or "rows" in model.status
    assert model.result_header == ["name"]
    assert [r[0] for r in model.result_rows] == ["Alice", "Bob", "Carol", "Dave"]
    text = "\n".join(model.render(80, 24))
    assert "Alice" in text
    # empty input line -> j/k scroll the results
    model.handle_key("j")
    assert model.result_scroll == 1
    assert "scrolled 1" in "\n".join(model.render(80, 24))
    model.handle_key("k")
    assert model.result_scroll == 0
    # digits while typing are input, not screen switches
    _type(model, "RETURN 1")
    assert model.screen == "query" and model.query_text == "RETURN 1"
    model.handle_key("ESC")
    assert model.query_text == ""
    # with the line empty again, 1 goes back to the overview
    model.handle_key("1")
    assert model.screen == "overview"


def test_query_error_is_screen_content_not_crash(model):
    model.handle_key("3")
    # unknown FUNCTION errors; unknown labels now conformantly match
    # zero rows (round-9 TCK change), which is a result, not an error
    _type(model, "RETURN nosuchfunction(1) AS x")
    model.handle_key("ENTER")
    assert model.result_header == ["error"]
    assert model.status == "error"
    assert model.running is True


def test_profile_and_quit_commands(model):
    model.handle_key("3")
    _type(model, ":profile MATCH (p:Person) RETURN count(*) AS c")
    model.handle_key("ENTER")
    text = "\n".join(model.render(120, 40))
    assert "Query Profile" in text
    _type(model, ":quit")
    model.handle_key("ENTER")
    assert model.running is False


def test_overview_with_pipeline_config(spark, tmp_path):
    from pycypher_nmetl_spark.engine import CypherEngine
    from pycypher_nmetl_spark.pipeline.config import load_config
    from pycypher_nmetl_spark.pipeline.runner import build_catalog

    (tmp_path / "p.csv").write_text("id,name\n1,A\n")
    (tmp_path / "pipe.yaml").write_text(
        f"""
version: "1.0"
project: {{name: tui_demo}}
sources:
  entities:
    - {{id: p, uri: "{tmp_path}/p.csv", entity_type: P, id_col: id}}
queries:
  - {{id: q1, cypher: "MATCH (n:P) RETURN n.name AS name"}}
"""
    )
    config = load_config(str(tmp_path / "pipe.yaml"))
    engine = CypherEngine(build_catalog(spark, config))
    m = TuiModel(engine, config)
    text = "\n".join(m.render(100, 30))
    assert "pipeline: tui_demo" in text
    assert "q1" in text and "dependency order" in text


def test_render_is_width_clamped_and_screens_exist(model):
    for i, name in enumerate(SCREENS, start=1):
        model.screen = "overview"
        model.handle_key(str(i))
        assert model.screen == name
        lines = model.render(20, 10)
        assert len(lines) == 10 and all(len(ln) <= 20 for ln in lines)
