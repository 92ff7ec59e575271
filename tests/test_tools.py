"""Toolkit tests: transforms, generation, PDDL export, benchmark harness,
plotting, visualization."""

import os

import numpy as np
import pytest
import yaml

from pushworld_tpu.core.puzzle import Puzzle, plan_from_string


# ---------------------------------------------------------------- transforms


def test_transforms_produce_8_solvable_variants(puzzles_dir):
    """A known plan, mapped through each transform's action permutation,
    solves the transformed puzzle (reference: test_transform.py:24-83)."""
    from pushworld_tpu.tools.transform import get_puzzle_transforms, transform_plan

    src = open(os.path.join(puzzles_dir, "simple.pwp")).read()
    plan = plan_from_string("RR")

    transforms = get_puzzle_transforms(src)
    assert len(transforms) == 8
    assert set(transforms) == {
        "r0", "r90", "r180", "r270",
        "r0_flipped", "r90_flipped", "r180_flipped", "r270_flipped",
    }
    assert transforms["r0"].split() == src.split()

    for name, text in transforms.items():
        puzzle = Puzzle.from_text(text)
        tplan = transform_plan(plan, name)
        assert puzzle.is_valid_plan(tplan), name


def test_create_transformed_puzzles(tmp_path, puzzles_dir):
    from pushworld_tpu.tools.transform import create_transformed_puzzles

    out = tmp_path / "transformed"
    create_transformed_puzzles(puzzles_dir, str(out))
    files = sorted(str(p) for p in out.rglob("*.pwp"))
    # 8 transforms per fixture, subdirectory tree mirrored (recursively).
    n_src = sum(
        1
        for _root, _dirs, names in os.walk(puzzles_dir)
        for n in names
        if n.endswith(".pwp")
    )
    assert len(files) == 8 * n_src
    assert any("simple_r90_flipped.pwp" in f for f in files)
    for f in files[:8]:
        Puzzle.from_file(f)  # parses


# ---------------------------------------------------------------- generation


def test_generate_level0(tmp_path):
    from pushworld_tpu.tools.generate import generate_level0_puzzles

    out = tmp_path / "gen"
    kept = generate_level0_puzzles(
        str(out),
        num_puzzles=6,
        random_seed=3,
        filter_puzzles=True,
        time_limit=5.0,
        min_puzzle_size=6,
        max_puzzle_size=8,
        planner="host",
    )
    files = sorted(os.listdir(out))
    assert kept == len(files) > 0
    # Renumbered 0..kept-1, all parse and all are solvable.
    assert files == [f"puzzle_{i}.pwp" for i in range(kept)]
    from pushworld_tpu.search.host_planner import solve_host

    for f in files:
        p = Puzzle.from_file(str(out / f))
        plan = solve_host(p, max_expansions=200000)
        assert plan is not None


def test_generate_validation_errors(tmp_path):
    from pushworld_tpu.tools.generate import generate_level0_puzzles

    with pytest.raises(ValueError):
        generate_level0_puzzles(str(tmp_path / "x"), num_puzzles=0)
    with pytest.raises(ValueError):
        generate_level0_puzzles(
            str(tmp_path / "y"), min_puzzle_size=9, max_puzzle_size=8
        )
    with pytest.raises(ValueError):
        generate_level0_puzzles(str(tmp_path / "z"), object_shapes="weird")


# --------------------------------------------------------------------- PDDL


def test_pddl_export_structure(puzzles_dir):
    from pushworld_tpu.tools.pddl import puzzle_to_pddl

    p = Puzzle.from_file(os.path.join(puzzles_dir, "chain.pwp"))
    domain, problem = puzzle_to_pddl("chain test", p)
    assert "(domain chain_test)" in domain
    assert "(problem chain_test)" in problem
    assert "m1 m2 - moveable-object" in domain
    # Initial positions in content coordinates.
    assert "(at agent pos0-0)" in problem
    assert "(at m1 pos2-0)" in problem
    assert "(at m2 pos1-0)" in problem
    assert "(at m1 pos4-0)" in problem.split("(:goal")[1]
    # Collisions: the agent never appears on the right side of in-collision.
    goal_section = problem.split("(:init")[1].split("(:goal")[0]
    for line in goal_section.splitlines():
        if "(in-collision" in line:
            parts = line.strip().strip("()").split()
            assert parts[3] != "agent"

    # BFWS mode: arity-3 collisions with pair constants.
    domain_b, problem_b = puzzle_to_pddl("chain", p, for_bfws=True)
    assert "object-pair" in domain_b
    assert "(is-pair m1-m2 m1 m2)" in problem_b
    assert "(in-collision agent-m1" in problem_b or "(in-collision agent-m2" in problem_b


def test_pddl_batch_export(tmp_path, puzzles_dir):
    from pushworld_tpu import config
    from pushworld_tpu.tools.pddl import convert_all_puzzles_to_pddl

    out = tmp_path / "pddl"
    convert_all_puzzles_to_pddl(str(out), os.path.join(puzzles_dir, "simple.pwp"))
    files = os.listdir(out)
    assert f"simple{config.DOMAIN_SUFFIX}" in files
    assert f"simple{config.PROBLEM_SUFFIX}" in files


# ---------------------------------------------------------------- benchmark


def test_benchmark_harness_yaml_schema(tmp_path, puzzles_dir):
    from pushworld_tpu.tools.benchmark import benchmark_planner

    results = benchmark_planner(
        puzzles_path=os.path.join(puzzles_dir, "simple.pwp"),
        results_path=str(tmp_path / "results"),
        time_limit=30.0,
        planner="host",
        progress=False,
    )
    assert "simple" in results
    doc = yaml.safe_load(open(tmp_path / "results" / "simple.yaml"))
    assert doc["puzzle"] == "simple"
    assert doc["plan"] is not None
    p = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    assert p.is_valid_plan(plan_from_string(doc["plan"]))
    assert doc["planning_time"] >= 0
    assert "failure_reason" not in doc


def test_benchmark_harness_no_solution(tmp_path, puzzles_dir):
    from pushworld_tpu.tools.benchmark import benchmark_planner

    results = benchmark_planner(
        puzzles_path=os.path.join(puzzles_dir, "no_solution.pwp"),
        results_path=str(tmp_path / "results"),
        time_limit=30.0,
        planner="host",
        progress=False,
    )
    doc = yaml.safe_load(open(tmp_path / "results" / "no_solution.yaml"))
    assert doc["plan"] is None
    assert doc["failure_reason"] == "no solution"


# --------------------------------------------------------------------- plot


def test_plot_solved_vs_time(tmp_path):
    from pushworld_tpu.tools.plot import plot_puzzles_solved_vs_time

    rdir = tmp_path / "results"
    rdir.mkdir()
    for planner in ["alpha", "beta"]:
        for i, t in enumerate([0.5, 2.0, 10.0]):
            doc = {
                "planner": planner,
                "puzzle": f"p{i}",
                "plan": "RR" if (planner == "alpha" or i < 2) else None,
                "planning_time": t,
            }
            with open(rdir / f"{planner}_p{i}.yaml", "w") as f:
                yaml.safe_dump(doc, f)
    out = tmp_path / "plot.png"
    plot_puzzles_solved_vs_time(str(rdir), str(out), planning_timeout=60)
    assert out.exists() and out.stat().st_size > 0

    # Mismatched puzzle sets raise.
    with open(rdir / "gamma_only.yaml", "w") as f:
        yaml.safe_dump(
            {"planner": "gamma", "puzzle": "px", "plan": None, "planning_time": 1.0}, f
        )
    with pytest.raises(ValueError):
        plot_puzzles_solved_vs_time(str(rdir), str(out))


# ------------------------------------------------------------- visualization


def test_render_previews(tmp_path, puzzles_dir):
    pytest.importorskip("PIL")
    from pushworld_tpu.tools.visualization import render_puzzle_previews

    out = tmp_path / "previews"
    render_puzzle_previews(str(out), os.path.join(puzzles_dir, "simple.pwp"))
    assert (out / "simple.png").exists()


def test_run_planner_cli(puzzles_dir, capsys):
    from pushworld_tpu.scripts.run_planner import main

    rc = main(["N+RGD", os.path.join(puzzles_dir, "simple.pwp"), "--planner", "host"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    p = Puzzle.from_file(os.path.join(puzzles_dir, "simple.pwp"))
    assert p.is_valid_plan(plan_from_string(out))

    rc = main(["N+RGD", os.path.join(puzzles_dir, "no_solution.pwp"), "--planner", "host"])
    assert rc == 0
    assert "NO SOLUTION" in capsys.readouterr().out


def test_pddl_atoms_encode_exact_dynamics(puzzles_dir):
    """Re-simulates the exported ground atoms (wall-collision, in-collision,
    connected) as the PDDL push cascade and checks the resulting transitions
    against the exact dynamics on random walks (reference analog:
    test_pddl.py re-simulates Fast Downward plans)."""
    import re

    import numpy as np

    from pushworld_tpu.tools.pddl import puzzle_to_pddl

    for fixture in ["chain", "multi_goal", "lshape", "heur/trivial_tool"]:
        p = Puzzle.from_file(os.path.join(puzzles_dir, fixture + ".pwp"))
        _, problem = puzzle_to_pddl("t", p)

        wall = set()
        for m in re.finditer(r"\(wall-collision (\S+) pos(\d+)-(\d+)\)", problem):
            wall.add((m.group(1), int(m.group(2)), int(m.group(3))))
        coll = set()
        for m in re.finditer(
            r"\(in-collision (\S+) pos(\d+)-(\d+) (\S+) pos(\d+)-(\d+)\)", problem
        ):
            coll.add(
                (m.group(1), int(m.group(2)), int(m.group(3)),
                 m.group(4), int(m.group(5)), int(m.group(6)))
            )

        names = ["agent"] + [f"m{i}" for i in range(1, p.num_movables)]
        disp = [(-1, 0), (1, 0), (0, -1), (0, 1)]

        def pddl_next(state, a):
            # state: content coords (x-1, y-1).  Simulate the push cascade:
            # move-agent marks the agent should-move; each push action moves
            # one object and marks contacts.  Mirrors the conditional-effect
            # semantics of the exported domain.
            dx, dy = disp[a]
            positions = list(state)
            should_move = {0}
            moved = set()
            while should_move:
                i = should_move.pop()
                if i in moved:
                    continue
                x, y = positions[i]
                nx, ny = x + dx, y + dy
                # Off-grid moves have no `connected` atom; border collisions
                # appear as wall-collision atoms: either way the cascade is
                # stuck.
                cw, ch = p.dimensions[0] - 2, p.dimensions[1] - 2
                if not (0 <= nx < cw and 0 <= ny < ch):
                    return None
                if (names[i], nx, ny) in wall:
                    return None  # push precondition fails -> cascade stuck
                # grid bounds = connected atoms; border handled via wall atoms
                positions[i] = (nx, ny)
                moved.add(i)
                for j in range(len(names)):
                    if j in moved or j == i:
                        continue
                    key = (names[i], nx, ny, names[j],
                           positions[j][0], positions[j][1])
                    if key in coll:
                        should_move.add(j)
            return tuple(positions)

        rng = np.random.RandomState(0)
        state = p.initial_state
        for _ in range(60):
            a = int(rng.randint(0, 4))
            nxt = p.get_next_state(state, a)
            content = tuple((x - 1, y - 1) for x, y in state)
            sim = pddl_next(content, a)
            if nxt == state:
                # Nothing moves exactly when the PDDL cascade gets stuck.
                assert sim is None or sim == content, (fixture, state, a)
            else:
                expected = tuple((x - 1, y - 1) for x, y in nxt)
                assert sim == expected, (fixture, state, a)
            state = nxt


def test_benchmark_harness_time_limit(tmp_path, puzzles_dir):
    """Timeouts record planning_time == time_limit (reference:
    benchmark_rgd.py:94-97) and failure_reason 'time limit'."""
    from pushworld_tpu.tools.benchmark import benchmark_planner

    results = benchmark_planner(
        puzzles_path=os.path.join(puzzles_dir, "heur", "shortest_path_tool.pwp"),
        results_path=str(tmp_path / "results"),
        time_limit=0.0,
        planner="host",
        progress=False,
    )
    doc = yaml.safe_load(open(tmp_path / "results" / "shortest_path_tool.yaml"))
    assert doc["plan"] is None
    assert doc["failure_reason"] == "time limit"
    assert doc["planning_time"] == 0.0
