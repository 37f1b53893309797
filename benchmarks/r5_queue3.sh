#!/bin/bash
# Round-5 chip queue, batch 3 — after r5_queue2.sh completes.
cd /root/repo || exit 1

echo "=== 1. CAUM entity-ablated control"
python -u benchmarks/run_statfix_matrix.py --only caum_statfix2_noent

echo "=== 2. CAUM probes (topic_pers evidence)"
for pair in caum_statfix2_celoss:statfix_caum2 \
            caum_statfix2_noent:statfix_caum2_noent; do
  e=${pair%%:*}; d=${pair##*:}
  ck=$(ls -d outputs/$d/attempt_*/checkpoints 2>/dev/null | tail -1)
  if [ -n "$ck" ] && [ ! -f outputs/$d/bias_probe.json ]; then
    echo "--- probe $e ($ck)"
    timeout 1800 python -u benchmarks/sentiment_bias_probe.py \
      --exp "$e" --ckpt "$ck" --out "outputs/$d/bias_probe.json"
  fi
done

echo "=== 3. PLM serving at production corpus scale"
timeout 1800 python -u benchmarks/serving_scale.py --tower plm --corpus 100000 \
  > outputs/serving_scale_plm100k.log 2>&1
tail -6 outputs/serving_scale_plm100k.log
timeout 2400 python -u benchmarks/serving_scale.py --tower plm --corpus 250000 \
  > outputs/serving_scale_plm250k.log 2>&1
tail -6 outputs/serving_scale_plm250k.log

echo "=== 4. final bench"
timeout 3000 python -u bench.py > outputs/bench_r5_final.json 2> outputs/bench_r5_final.log
tail -3 outputs/bench_r5_final.log
cat outputs/bench_r5_final.json

echo "=== queue3 done"
