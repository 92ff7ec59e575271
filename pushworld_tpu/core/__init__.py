from pushworld_tpu.core.puzzle import Actions, Colors, Puzzle, PushWorldObject  # noqa: F401
from pushworld_tpu.core.compiled import CompiledPuzzle, compile_puzzle  # noqa: F401
