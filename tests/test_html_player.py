"""Static smoke tests for the HTML player (html/).

No JS runtime ships in this image, so instead of driving a browser we pin
the cross-language invariants that would break the player silently:

- every sample puzzle embedded in ``sample_puzzles.js`` parses with the
  Python core (the semantic oracle) and describes a solvable instance;
- every DOM id referenced by ``player.js`` exists in ``index.html``;
- the action/key tables in the JS agree with the core action displacements
  (reference: html/index.js:445-465 uses the same LRUD displacement map).
"""

import os
import re

import pytest

from pushworld_tpu.core.puzzle import Actions, Puzzle
from pushworld_tpu.search.host_planner import solve_host

HTML_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "html")


def _read(name: str) -> str:
    with open(os.path.join(HTML_DIR, name)) as f:
        return f.read()


def _sample_puzzles() -> dict:
    src = _read("sample_puzzles.js")
    # "name": { pwp: `body`, solution: "RR" },
    pairs = re.findall(
        r'"([^"]+)":\s*\{\s*pwp:\s*`([^`]*)`,\s*solution:\s*"([A-Z]*)"', src
    )
    assert pairs, "no sample puzzles found in sample_puzzles.js"
    return {name: (pwp, sol) for name, pwp, sol in pairs}


def test_sample_puzzles_parse_and_solve():
    from pushworld_tpu.core.puzzle import plan_from_string

    for name, (body, solution) in _sample_puzzles().items():
        puzzle = Puzzle.from_text(body)
        # The embedded solution (used by the in-browser smoke test and the
        # hint button) must replay to goal on the semantic oracle.
        assert puzzle.is_valid_plan(plan_from_string(solution)), name
        plan = solve_host(puzzle, mode="N+RGD", time_limit=10.0)
        assert plan is not None, f"sample {name!r} is unsolvable"
        assert plan == [] or puzzle.is_valid_plan(plan), name


def test_dom_ids_exist():
    html = _read("index.html")
    js = _read("player.js")
    ids_in_html = set(re.findall(r'id="([^"]+)"', html))
    ids_used = set(re.findall(r'getElementById\("([^"]+)"\)', js))
    missing = ids_used - ids_in_html
    assert not missing, f"player.js references missing DOM ids: {missing}"


def test_js_action_displacements_match_core():
    js = _read("player.js")
    m = re.search(r"DISPLACEMENTS\s*=\s*\{([^}]*)\}", js, re.S)
    assert m, "player.js has no DISPLACEMENTS action table"
    entries = re.findall(r"Arrow(\w+)\s*:\s*\[\s*(-?\d+)\s*,\s*(-?\d+)\s*\]", m.group(1))
    disp = {name: (int(x), int(y)) for name, x, y in entries}
    assert disp == {
        "Left": (-1, 0),
        "Right": (1, 0),
        "Up": (0, -1),
        "Down": (0, 1),
    }
    # Same displacement map as the core actions.
    core = dict(
        zip(
            (Actions.LEFT, Actions.RIGHT, Actions.UP, Actions.DOWN),
            (disp["Left"], disp["Right"], disp["Up"], disp["Down"]),
        )
    )
    assert core[Actions.LEFT] == (-1, 0) and core[Actions.DOWN] == (0, 1)


def test_js_parser_handles_same_tokens_as_core():
    """The JS tokenizer must accept the same cell tokens the core emits:
    case-insensitive ids, '+'-separated overlaps, '.' empties, and must
    require an agent — mirroring core/puzzle.py parsing."""
    js = _read("player.js")
    for needle in ('toLowerCase', 'split("+")', "cells.has(\"a\")"):
        assert needle in js, needle
