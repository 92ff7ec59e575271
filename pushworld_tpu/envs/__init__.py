from pushworld_tpu.envs.vector_env import VectorEnv, EnvState  # noqa: F401
