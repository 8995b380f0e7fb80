#!/bin/bash
# On-hardware measurement queue (run when the axon relay is back; one
# session, compare within-session only — PERFORMANCE.md "pending" section).
set -x
timeout 900 python tools_oproj_ab.py all 2>&1 | tail -8
timeout 900 python tools_oproj_ab.py check 2>&1 | tail -3
timeout 900 python bench.py 2>&1 | tail -2
timeout 1200 python bench_throughput.py 2>&1 | tail -3
timeout 1200 python bench_serving.py --num_slots 4 2>&1 | tail -2
timeout 1200 python bench_serving.py --num_slots 4 --kv_int8 2>&1 | tail -2
timeout 1200 python bench_serving.py --num_slots 4 --kv_int8 --chunk_prefill 512 2>&1 | tail -2
timeout 1200 python bench_serving.py --num_slots 4 --kv_int8 --speculative 4 2>&1 | tail -2
