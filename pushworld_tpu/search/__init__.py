from pushworld_tpu.search.heuristics_host import (  # noqa: F401
    MovementGraphs,
    NoveltyHeuristic,
    PathDistances,
    RecursiveGraphDistance,
    WeightedSumHeuristic,
)
from pushworld_tpu.search.host_planner import best_first_search, solve_host  # noqa: F401
