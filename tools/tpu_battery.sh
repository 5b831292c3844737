#!/bin/bash
# Wait for the axon TPU tunnel, then run the measurement battery once.
# Logs to /tmp/tpu_battery.log.  Not part of CI.
LOG=/tmp/tpu_battery.log
cd /root/repo
probe() { timeout 120 python -c "import jax, jax.numpy as jnp; print(int(jnp.sum(jnp.arange(4))))" >/dev/null 2>&1; }
echo "=== battery start $(date) ===" >> $LOG
ok=0
for i in $(seq 1 70); do
  if probe; then
    ok=$((ok+1))
    echo "probe $i: UP ($ok consecutive) $(date)" >> $LOG
    if [ $ok -ge 2 ]; then break; fi
    sleep 20
  else
    ok=0
    echo "probe $i: down $(date)" >> $LOG
    sleep 200
  fi
done
if [ $ok -lt 2 ]; then echo "GIVING UP $(date)" >> $LOG; exit 1; fi

echo "--- viterbi microbench i8mxu $(date) ---" >> $LOG
timeout 900 python tools/microbench_viterbi.py i8mxu >> $LOG 2>&1
echo "--- viterbi microbench i8 $(date) ---" >> $LOG
timeout 900 python tools/microbench_viterbi.py i8 >> $LOG 2>&1
echo "--- demod microbench $(date) ---" >> $LOG
timeout 900 python tools/microbench.py >> $LOG 2>&1
echo "--- bench.py 96 20 $(date) ---" >> $LOG
timeout 2400 python bench.py 96 20 >> $LOG 2>&1
echo "=== battery done $(date) ===" >> $LOG
