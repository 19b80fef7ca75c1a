#!/bin/bash
cd /root/repo
echo "=== drill_150_v2 (production policy, 128Mi floor) $(date)"
timeout 4200 python scripts/r8_scale_drill.py 150 > .r5_logs/drill_150_v2.out 2> .r5_logs/drill_150_v2.log
echo "exit=$? $(date)"
echo "=== drill_150_v2_s1 STREAMS=1 $(date)"
REUSE_INDEX=1 BUF_MI=128 STREAMS=1 timeout 3600 python scripts/r8_scale_drill.py 150 > .r5_logs/drill_150_v2_s1.out 2> .r5_logs/drill_150_v2_s1.log
echo "exit=$? $(date)"
echo "=== drill_150_v2_s4 STREAMS=4 $(date)"
REUSE_INDEX=1 BUF_MI=128 STREAMS=4 timeout 3600 python scripts/r8_scale_drill.py 150 > .r5_logs/drill_150_v2_s4.out 2> .r5_logs/drill_150_v2_s4.log
echo "exit=$? $(date)"
echo "=== queue E done $(date)"
