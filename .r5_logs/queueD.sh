#!/bin/bash
# Round-5 session 2: perf experiments at the 150M-key drill scale.
# The recorded default (BUF=64Mi, S=1, group=4, cap=1152) = 110.4 Mk/s.
# D1: 128 Mi buffer — large tables amortize per-tile fixed overhead over
#     more queries (64 vs 16 Mi was +39% on the 4.19M-bucket table).
# D2: STREAMS=2 — halves the flat 53.8M-slot sort into sweet-spot segments;
#     KmerMapper auto-widens group (4 -> feasible width for S=2).
cd /root/repo
L=.r5_logs
run() {
  name=$1; shift
  echo "=== $name: $* $(date)"
  timeout 4500 env "$@" > "$L/$name.out" 2> "$L/$name.log"
  echo "exit=$? $(date)"
}

run drill_150_b128 BUF_MI=128 python scripts/r8_scale_drill.py 150
run drill_150_s2 STREAMS=2 python scripts/r8_scale_drill.py 150

echo "=== queue D done $(date)"
