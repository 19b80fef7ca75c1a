#!/bin/bash
# Round-5 TPU re-attestation queue (VERDICT r4 items 1,2,3,4,7).
# Everything at HEAD: plane-layout kernel + 1.40x auto cap.
cd /root/repo
L=.r5_logs
run() {
  name=$1; shift
  echo "=== $name: $* $(date)"
  timeout 4500 env "$@" > "$L/$name.out" 2> "$L/$name.log"
  echo "exit=$? $(date)"
}

# 1. S x auto-cap grid on the bench table (VERDICT 7; caps hold S*cap=9216)
run cfg_sweep_S python scripts/r9_cfg_sweep.py 4608,2,0 2304,4,0 1536,6,0

# 2. large-table (14.2M keys -> 4.19M buckets, paged) S sweep at 64 Mi
run lt_S1 KMT_BENCH_BUF=67108864 STREAMS=1 python scripts/r3_large_table.py 16
run lt_S2 KMT_BENCH_BUF=67108864 STREAMS=2 python scripts/r3_large_table.py 16
run lt_S4 KMT_BENCH_BUF=67108864 STREAMS=4 python scripts/r3_large_table.py 16

# 3. ragged: meta table S in {4,6}; paged 12.8M-key table S in {2,4}
run ragged_meta python scripts/r6_ragged_streams.py 4 6
run ragged_paged N_UNIQUE=24000000 python scripts/r6_ragged_streams.py 2 4

# 4. pre-hashed library surface at 2^24 and 2^25
run lib_24 python scripts/r3_library_surface.py 24
run lib_25 python scripts/r3_library_surface.py 25

# 5. bench matrix artifacts (VERDICT 3)
run bench_k16 BENCH_K=16 python bench.py
run bench_k21 BENCH_K=21 python bench.py
run bench_revcomp BENCH_REVCOMP=1 python bench.py
run bench_ragged BENCH_RAGGED=1 python bench.py

# 6. the 150M-key human-scale drill (VERDICT 2)
run drill_150 python scripts/r8_scale_drill.py 150

echo "=== queue B done $(date)"
