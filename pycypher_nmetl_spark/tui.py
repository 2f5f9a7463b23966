"""Terminal UI (reference: packages/pycypher-tui — pipeline overview,
data-model browser, query console and testing screens; implemented here
as a compact curses app over this repo's engine, NOT a port of the
reference's textual-framework application).

Architecture: :class:`TuiModel` is a pure state machine — key events in,
rendered text lines out — so every screen is unit-testable without a
terminal. :func:`run_tui` is the thin curses driver (import-gated; any
terminal quirk stays out of the model).

Screens (number keys switch):
  1 Overview   — pipeline name, sources, dependency-ordered queries
  2 Data model — labels with columns/dtypes; relationship types with
                 endpoints (the reference's DataModelScreen)
  3 Query      — type Cypher, Enter runs it; j/k (or arrows) scroll the
                 result table; :profile prefix shows the profile report
  4 Help       — key reference

Run: ``python -m pycypher_nmetl_spark.tui [pipeline.yaml]``.
"""

from __future__ import annotations

import time
from typing import Any

SCREENS = ("overview", "model", "query", "help")

_HELP = [
    "Keys",
    "  1/2/3/4     switch screen (overview / data model / query / help)",
    "  q           quit (from any non-query screen)",
    "  Query screen:",
    "    type        edit the query line",
    "    Enter       run the query",
    "    Backspace   delete",
    "    Up/Down j/k scroll results (j/k only while results focused)",
    "    Esc         clear the input line",
    "    :profile <cypher>   run under the profiler",
    "    :explain <cypher>   show the physical plan",
    "    :quit               leave the TUI",
]


class TuiModel:
    """Pure TUI state: screens, query console, rendering to text lines."""

    def __init__(self, engine: Any, config: Any = None, max_rows: int = 200):
        self.engine = engine
        self.config = config
        self.screen = "overview"
        self.query_text = ""
        self.result_header: list[str] = []
        self.result_rows: list[list[str]] = []
        self.result_scroll = 0
        self.status = "ready"
        self.max_rows = max_rows
        self.running = True
        self.history: list[str] = []

    # ---- events ------------------------------------------------------- #
    def handle_key(self, key: str) -> None:
        """Key names: printable single chars, 'ENTER', 'BACKSPACE',
        'UP', 'DOWN', 'ESC' (curses names are mapped by the driver)."""
        if self.screen != "query":
            if key in ("1", "2", "3", "4"):
                self.screen = SCREENS[int(key) - 1]
            elif key in ("q", "Q"):
                self.running = False
            return
        # query screen: digits are input unless the line is empty
        if key == "ENTER":
            self._run_query()
        elif key == "BACKSPACE":
            self.query_text = self.query_text[:-1]
        elif key == "ESC":
            self.query_text = ""
        elif key in ("UP",) or (key == "k" and not self.query_text):
            self.result_scroll = max(0, self.result_scroll - 1)
        elif key in ("DOWN",) or (key == "j" and not self.query_text):
            self.result_scroll = min(
                max(0, len(self.result_rows) - 1), self.result_scroll + 1
            )
        elif not self.query_text and key in ("1", "2", "4"):
            self.screen = SCREENS[int(key) - 1]
        elif len(key) == 1 and key.isprintable():
            self.query_text += key

    # ---- actions ------------------------------------------------------ #
    def _run_query(self) -> None:
        text = self.query_text.strip()
        if not text:
            return
        self.history.append(text)
        if text in (":quit", ":q", ":exit"):
            self.running = False
            return
        t0 = time.perf_counter()
        try:
            if text.startswith(":explain "):
                plan = self.engine.explain(text[len(":explain "):])
                self.result_header = ["physical plan"]
                self.result_rows = [[ln] for ln in str(plan).splitlines()]
            elif text.startswith(":profile "):
                report = self.engine.profile(text[len(":profile "):])
                self.result_header = ["profile"]
                self.result_rows = [[ln] for ln in str(report).splitlines()]
            else:
                df = self.engine.execute(text)
                rows = df.take(self.max_rows + 1)
                truncated = len(rows) > self.max_rows
                rows = rows[: self.max_rows]
                self.result_header = list(df.columns)
                self.result_rows = [
                    ["" if v is None else str(v) for v in r] for r in rows
                ]
                if truncated:
                    self.result_rows.append(["…"] * max(1, len(self.result_header)))
            elapsed = (time.perf_counter() - t0) * 1000
            self.status = f"{len(self.result_rows)} rows in {elapsed:.0f}ms"
        except Exception as e:  # noqa: BLE001 — errors are screen content
            self.result_header = ["error"]
            self.result_rows = [[f"{type(e).__name__}: {e}"]]
            self.status = "error"
        self.result_scroll = 0
        self.query_text = ""

    # ---- rendering ---------------------------------------------------- #
    def render(self, width: int = 80, height: int = 24) -> list[str]:
        """Render the current screen to exactly `height` lines of at most
        `width` chars (the curses driver just blits these)."""
        body_h = height - 2  # title + status bar
        title = f"[pycypher-nmetl-spark] {self.screen}  (1-4 screens, q quits)"
        if self.screen == "overview":
            body = self._render_overview()
        elif self.screen == "model":
            body = self._render_model()
        elif self.screen == "query":
            body = self._render_query(width, body_h)
        else:
            body = list(_HELP)
        body = body[:body_h] + [""] * max(0, body_h - len(body))
        cat = self.engine.catalog
        status = (
            f" {self.status} | labels={len(cat.labels())}"
            f" rels={len(cat.rel_types())} epoch={cat.data_epoch}"
        )
        lines = [title] + body + [status]
        return [ln[:width] for ln in lines]

    def _render_overview(self) -> list[str]:
        out = []
        if self.config is not None:
            out.append(f"pipeline: {self.config.name}")
            out.append(f"entity sources ({len(self.config.entities)}):")
            out += [f"  {s.id}: {s.uri}" for s in self.config.entities]
            out.append(f"relationship sources ({len(self.config.relationships)}):")
            out += [f"  {s.id}: {s.uri}" for s in self.config.relationships]
            try:
                from pycypher_nmetl_spark.pipeline.runner import order_queries

                ordered = order_queries(self.config.queries)
                out.append(f"queries in dependency order ({len(ordered)}):")
                out += [f"  {i+1}. {q.id}" for i, q in enumerate(ordered)]
            except Exception as e:  # noqa: BLE001 — cycle errors etc.
                out.append(f"query ordering failed: {e}")
        else:
            out.append("no pipeline config loaded (catalog-only session)")
        cat = self.engine.catalog
        out.append(f"catalog: {len(cat.labels())} labels, "
                   f"{len(cat.rel_types())} relationship types")
        return out

    def _render_model(self) -> list[str]:
        cat = self.engine.catalog
        out = ["labels:"]
        for label in cat.labels():
            cols = ", ".join(f"{c}:{t}" for c, t in cat.nodes(label).dtypes)
            out.append(f"  (:{label})  {cols}")
        out.append("relationship types:")
        for rt in cat.rel_types():
            src_l, dst_l = cat.edge_endpoints(rt)
            cols = ", ".join(
                f"{c}:{t}" for c, t in cat.edges(rt).dtypes
                if c not in ("src", "dst")
            )
            out.append(f"  (:{src_l})-[:{rt}]->(:{dst_l})  {cols}")
        return out

    def _render_query(self, width: int, body_h: int) -> list[str]:
        out = [f"cypher> {self.query_text}_", "-" * min(width, 40)]
        if self.result_header:
            widths = self._col_widths(width)
            out.append(self._fmt_row(self.result_header, widths))
            visible = self.result_rows[
                self.result_scroll : self.result_scroll + max(1, body_h - 4)
            ]
            out += [self._fmt_row(r, widths) for r in visible]
            if self.result_scroll:
                out[2] += f"  (scrolled {self.result_scroll})"
        return out

    def _col_widths(self, width: int) -> list[int]:
        n = max(1, len(self.result_header))
        per = max(6, (width - n + 1) // n)
        widths = []
        for i, h in enumerate(self.result_header):
            w = max(len(h), *(len(r[i]) for r in self.result_rows[:50] if i < len(r)),
                    1) if self.result_rows else len(h)
            widths.append(min(per, max(4, w)))
        return widths

    @staticmethod
    def _fmt_row(cells: list[str], widths: list[int]) -> str:
        padded = []
        for i, w in enumerate(widths):
            c = cells[i] if i < len(cells) else ""
            padded.append(c[:w].ljust(w))
        return " ".join(padded)


# ------------------------------------------------------------------ #
# curses driver (import-gated; everything interesting is in the model)
# ------------------------------------------------------------------ #
def run_tui(engine: Any, config: Any = None) -> int:
    import curses

    model = TuiModel(engine, config)

    def loop(stdscr) -> None:
        curses.curs_set(0)
        stdscr.timeout(200)
        while model.running:
            h, w = stdscr.getmaxyx()
            stdscr.erase()
            for y, line in enumerate(model.render(w - 1, h)):
                try:
                    stdscr.addstr(y, 0, line)
                except curses.error:  # bottom-right cell write
                    pass
            stdscr.refresh()
            try:
                ch = stdscr.get_wch()
            except curses.error:  # timeout tick
                continue
            if isinstance(ch, str):
                if ch in ("\n", "\r"):
                    key = "ENTER"
                elif ch in ("\x7f", "\b"):
                    key = "BACKSPACE"
                elif ch == "\x1b":
                    key = "ESC"
                else:
                    key = ch
            elif ch == curses.KEY_BACKSPACE:
                key = "BACKSPACE"
            elif ch == curses.KEY_UP:
                key = "UP"
            elif ch == curses.KEY_DOWN:
                key = "DOWN"
            else:
                continue
            model.handle_key(key)

    curses.wrapper(loop)
    return 0


def main(argv: list[str] | None = None) -> int:
    import sys

    from pycypher_nmetl_spark.engine import CypherEngine
    from pycypher_nmetl_spark.session import get_spark

    argv = sys.argv[1:] if argv is None else argv
    spark = get_spark(app_name="tui")
    config = None
    if argv:
        from pycypher_nmetl_spark.pipeline.config import load_config
        from pycypher_nmetl_spark.pipeline.runner import build_catalog, load_functions

        config = load_config(argv[0])
        engine = CypherEngine(build_catalog(spark, config))
        load_functions(engine, config.functions)
    else:
        from pycypher_nmetl_spark.catalog import GraphCatalog

        engine = CypherEngine(GraphCatalog(spark))
    return run_tui(engine, config)


if __name__ == "__main__":
    raise SystemExit(main())
