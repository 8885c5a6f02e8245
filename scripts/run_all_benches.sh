#!/bin/bash
# Fire when the TPU tunnel is back: all on-chip benches, sequentially.
set -u
cd /root/repo
echo "== tunnel check"
timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/8113" || { echo "tunnel still dead"; exit 1; }
echo "== tpu_smoke (on-chip kernel regression gate)"
timeout 3600 python scripts/tpu_smoke.py > /tmp/final_smoke.log 2>&1
echo "smoke exit=$?"; grep -v WARNING /tmp/final_smoke.log | tail -1
echo "== bench.py (headline)"
timeout 2200 python bench.py > /tmp/final_bench.log 2>&1
echo "bench exit=$?"; grep -v WARNING /tmp/final_bench.log | tail -1
echo "== bench_train default"
timeout 2700 python scripts/bench_train.py > /tmp/final_train.log 2>&1
echo "train exit=$?"; grep -v WARNING /tmp/final_train.log | tail -1
echo "== bench_train bf16"
timeout 2400 python scripts/bench_train.py --train-dtype bfloat16 > /tmp/final_train_bf16.log 2>&1
echo "train-bf16 exit=$?"; grep -v WARNING /tmp/final_train_bf16.log | tail -1
echo "== bench_train cached-question"
timeout 2400 python scripts/bench_train.py --cache-qst > /tmp/final_train_cacheqst.log 2>&1
echo "train-cacheqst exit=$?"; grep -v WARNING /tmp/final_train_cacheqst.log | tail -1
echo "== bench_train cached-question + 4 steps/dispatch (best train config)"
timeout 2400 python scripts/bench_train.py --cache-qst --steps-per-dispatch 4 > /tmp/final_train_spd4.log 2>&1
echo "train-spd4 exit=$?"; grep -v WARNING /tmp/final_train_spd4.log | tail -1
echo "== bench tspm"
timeout 1200 python bench.py --model tspm > /tmp/final_tspm.log 2>&1
echo "tspm exit=$?"; grep -v WARNING /tmp/final_tspm.log | tail -1
echo "== bench_serve"
timeout 2900 python scripts/bench_serve.py > /tmp/final_serve.log 2>&1
echo "serve exit=$?"; grep -v WARNING /tmp/final_serve.log | tail -1
echo "== ALL DONE"
