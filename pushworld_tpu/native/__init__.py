from pushworld_tpu.native.bridge import is_available, solve_native  # noqa: F401
