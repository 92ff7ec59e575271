"""pushworld_tpu: a TPU-native planning + RL-environment framework for PushWorld.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
google-deepmind/pushworld (reference mounted read-only at /root/reference):

- ``core``:     the ``.pwp`` puzzle format, exact host-side dynamics (the semantic
                oracle), rendering, and compilation of puzzles into dense,
                statically-shaped collision tensors.
- ``ops``:      jit/vmap-compiled batched dynamics, reachability fixpoints,
                distance fields, and batched heuristics (RGD, novelty).
- ``search``:   the batched best-first planner (device) and an exact host
                planner used as a differential-testing oracle.
- ``envs``:     a pure-JAX vectorized environment plus Gym / dm_env wrappers
                with reference-identical reward semantics.
- ``parallel``: ``jax.sharding`` mesh utilities and the sharded benchmark
                runner (puzzle-sharded SPMD over ICI/DCN).
- ``tools``:    puzzle generation, symmetry transforms, PDDL/SAS export,
                benchmark harness, plotting, and rendering utilities.

Reference parity notes are cited inline as ``reference: <file>:<lines>``
pointing into the upstream repository.
"""

__version__ = "0.1.0"

from pushworld_tpu.core.puzzle import Actions, Puzzle  # noqa: F401
