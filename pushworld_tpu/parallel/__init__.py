from pushworld_tpu.parallel.mesh import make_mesh  # noqa: F401
from pushworld_tpu.parallel.sharded import solve_group  # noqa: F401
