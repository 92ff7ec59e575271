#!/bin/bash
# Round-5 TPU measurement window — run steps ONE AT A TIME (one TPU
# process at a time; kill strays by exact PID first).  Each step appends
# to its own log; all are resumable/skippable.
set -x
cd /root/repo

# 0. Chip probe: donation + is_ready on axon (fast; validates the round-5
#    device-path changes before any long run).
probe() {
  timeout 600 python - <<'EOF'
import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
print("backend:", jax.default_backend(), jax.devices())
from pushworld_tpu import config
import os
from pushworld_tpu.core.puzzle import Puzzle
from pushworld_tpu.utils.filesystem import get_puzzle_file_paths
from pushworld_tpu.search.batched import BatchedPlanner, run_chunk, search_status
paths = get_puzzle_file_paths(os.path.join(config.BENCHMARK_PUZZLES_PATH, "level1"))
p = Puzzle.from_file(paths[sorted(paths)[0]])
pl = BatchedPlanner(p, expand=64, frontier_capacity=1<<12, visited_bits=16,
                    history_capacity=1<<16, max_depth=0, lazy=True)
s = pl.init_state()
t0=time.monotonic()
s = run_chunk(pl.cp, pl.tables, pl.config, s, 8)   # donation exercised
h = search_status(s)
print("is_ready t+0:", h.is_ready())
st = np.asarray(h)
print("chunk ok; status:", st.tolist(), f"({time.monotonic()-t0:.1f}s incl compile)")
s = run_chunk(pl.cp, pl.tables, pl.config, s, 8)   # donate previous output
h2 = search_status(s)
time.sleep(2.0)
print("is_ready t+2:", h2.is_ready())
print("PROBE OK")
EOF
}

# 1. Precompile all reachable device keys (kernels changed: cache cold).
prec() { timeout 3000 python scripts_dev/precompile_keys.py 2>&1 | tee scripts_dev/precompile_keys_r5.log; }

# 2. Device iteration profile (Caged Key, lazy) @256 and @1024.
prof() {
  PW_LAZY=1 PW_PUZZLE="level3/Caged Key" PW_EXPANDS=256 PW_VARIANTS=full \
    timeout 1200 python scripts_dev/profile_iter.py 2>&1 | tee scripts_dev/profile_iter_r5.log
  PW_LAZY=1 PW_PUZZLE="level3/Caged Key" PW_EXPANDS=1024 PW_VARIANTS=full \
    timeout 1200 python scripts_dev/profile_iter.py 2>&1 | tee -a scripts_dev/profile_iter_r5.log
}

# 3. Official bench, 3 repeats (driver config; baseline cached).
reps() {
  for i in 1 2 3; do
    timeout 900 python bench.py 2>scripts_dev/bench_r5_rep$i.err | tee -a scripts_dev/bench_repeats_r5.jsonl
  done
}

# 4. Stratified fleet-vs-host ablation, 3 reps.
abl() { PW_REPS=3 PW_HANG_DUMP_S=5400 timeout 5400 python scripts_dev/fleet_ablation.py 2>&1 | tee scripts_dev/fleet_ablation_r5.log; }

# 5. Frontier-sharded level4 probe at 300 s (3 instances).
l4() {
  printf 'level4/Four Rooms\nlevel4/Mind The Gap\nlevel4/Cup Stacking\n' > scripts_dev/l4_probe_r5.txt
  PW_ONLY=scripts_dev/l4_probe_r5.txt PW_BUDGET=300 PW_EXPAND=256 \
  PW_VISITED_BITS=23 PW_HISTORY=$((1<<22)) \
  PW_OUT=scripts_dev/sharded_level4_r5.jsonl \
    timeout 2400 python scripts_dev/sharded_level4_probe.py 2>&1 | tee scripts_dev/sharded_level4_r5.log
}

"$@"
