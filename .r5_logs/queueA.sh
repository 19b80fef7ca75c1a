#!/bin/bash
cd /root/repo
echo "=== bench.py HEAD (policy default) $(date)" 
python bench.py > .r5_logs/bench_policy.json 2> .r5_logs/bench_policy.log
echo "exit=$? $(date)"
echo "=== bench.py BENCH_STREAMS=4 (old attested config) $(date)"
BENCH_STREAMS=4 python bench.py > .r5_logs/bench_S4.json 2> .r5_logs/bench_S4.log
echo "exit=$? $(date)"
echo "=== r9_cfg_sweep S x auto-cap grid $(date)"
python scripts/r9_cfg_sweep.py 4608,2,0 2304,4,0 1536,6,0 > .r5_logs/cfg_sweep_S.out 2> .r5_logs/cfg_sweep_S.log
echo "exit=$? $(date)"
echo "=== queue A done $(date)"
