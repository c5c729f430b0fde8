#!/bin/bash
# Round-5 TPU measurement suite: runs every queued probe in sequence
# with per-stage logs under /tmp/r5_tpu/. Launch when the tunnel is
# responsive (see /tmp/tpu_watch.log).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p /tmp/r5_tpu
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $(date +%H:%M:%S) ===" | tee -a /tmp/r5_tpu/driver.log
  timeout "$@" > "/tmp/r5_tpu/$name.log" 2>&1
  echo "exit $?: $name $(date +%H:%M:%S)" | tee -a /tmp/r5_tpu/driver.log
}
run hmm_gap   2400 python benchmarks/hmm_gap_probe_r4.py
run sqmc      2400 python benchmarks/sqmc_probe_r5.py
run mfu       2400 python benchmarks/mfu_probe_r4.py
run vrnn_abl  2400 python benchmarks/vrnn_ablation_r5.py
run learn_tw  2400 python benchmarks/learn_twist_probe_r5.py
run bench     2400 python bench.py
run wave      4800 python benchmarks/bench_extended.py wave
run hmm_rows  2400 python benchmarks/bench_extended.py hmm
echo "ALL DONE $(date)" | tee -a /tmp/r5_tpu/driver.log
