#!/bin/bash
cd /root/repo
echo "=== drill_150_v2_b64 BUF_MI=64 STREAMS=1 $(date)"
REUSE_INDEX=1 BUF_MI=64 STREAMS=1 timeout 3600 python scripts/r8_scale_drill.py 150 > .r5_logs/drill_150_v2_b64.out 2> .r5_logs/drill_150_v2_b64.log
echo "exit=$? $(date)"
echo "=== lt_v2_S1 (4.19M-bucket paged, 64Mi, S=1) $(date)"
KMT_BENCH_BUF=67108864 STREAMS=1 timeout 3600 python scripts/r3_large_table.py 16 > .r5_logs/lt_v2_S1.out 2> .r5_logs/lt_v2_S1.log
echo "exit=$? $(date)"
echo "=== lt_v2_S2 $(date)"
KMT_BENCH_BUF=67108864 STREAMS=2 timeout 3600 python scripts/r3_large_table.py 16 > .r5_logs/lt_v2_S2.out 2> .r5_logs/lt_v2_S2.log
echo "exit=$? $(date)"
echo "=== queue F done $(date)"
