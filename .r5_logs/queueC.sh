#!/bin/bash
# Round-5 session 2: finish the bench-matrix artifacts (VERDICT r4 item 3)
# - bench_ragged: the queue-B run succeeded but an interrupted manual re-run
#   truncated its .out; clean re-run at HEAD.
# - lib_24 / lib_25: crashed pre-fix (950707c); re-run at HEAD.
cd /root/repo
L=.r5_logs
run() {
  name=$1; shift
  echo "=== $name: $* $(date)"
  timeout 4500 env "$@" > "$L/$name.out" 2> "$L/$name.log"
  echo "exit=$? $(date)"
}

run bench_ragged BENCH_RAGGED=1 python bench.py
run lib_24 python scripts/r3_library_surface.py 24
run lib_25 python scripts/r3_library_surface.py 25

echo "=== queue C done $(date)"
