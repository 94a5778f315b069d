#!/bin/bash
# r5 TPU measurement sequence (run when the axon tunnel is healthy).
# Each step logs to benchmarks/logs/; run piecewise if a step crashes.
set -x
mkdir -p benchmarks/logs
cd "$(dirname "$0")/.."

# 1. flagship stage table (attribution + window + band-direct rows)
timeout 3600 python benchmarks/exp_ba_stages.py 1000 50000 8 9 \
  > benchmarks/logs/r5_stages_flagship.log 2>&1

# 2. flagship end-to-end convergence sanity (sorted + band storage active)
timeout 3600 python benchmarks/run_benchmarks.py bench_ba_sparse \
  > benchmarks/logs/r5_ba_sparse.log 2>&1

# 3. pose-graph CR (sweep-inverse effect on the 41 ms/iter)
timeout 3600 python benchmarks/exp_pose_graph_iter.py \
  > benchmarks/logs/r5_pose_graph.log 2>&1

# 4. memory-ceiling run (medium first, then the 10k-cam target)
timeout 3600 python benchmarks/bench_ba_ceiling.py 4000 200000 8 \
  > benchmarks/logs/r5_ceiling_4k.log 2>&1
timeout 5400 python benchmarks/bench_ba_ceiling.py 10000 500000 8 \
  > benchmarks/logs/r5_ceiling_10k.log 2>&1

# 5. cg=64 crash bisect (subprocess per config — worker kills contained)
timeout 5400 python benchmarks/repro_schur_cg_crash.py \
  > benchmarks/logs/r5_cg_bisect.log 2>&1

# 6. headline driver metric sanity
timeout 1800 python bench.py > benchmarks/logs/r5_bench.log 2>&1

tail -n 40 benchmarks/logs/r5_stages_flagship.log
