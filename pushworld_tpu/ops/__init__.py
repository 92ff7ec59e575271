from pushworld_tpu.ops.step import step, step_batch, count_achieved_goals, is_goal_state  # noqa: F401
