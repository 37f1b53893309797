#!/bin/bash
# Round-5 chip queue, batch 2 — runs after the v2 matrix completes.
# Sequential single-TPU discipline (verify skill: never two TPU processes).
cd /root/repo || exit 1

echo "=== 1. sentiment-bias probes on the fresh v2 checkpoints"
for pair in nrms_statfix2_celoss:statfix_nrms2 \
            sentirec_statfix2_celoss:statfix_sentirec2 \
            sentirec_statfix2_nodiv:statfix_sentirec2_nodiv \
            senti_debias_statfix2:statfix_senti_debias2 \
            dkn_statfix2_celoss:statfix_dkn2 \
            dkn_statfix2_noent:statfix_dkn2_noent; do
  e=${pair%%:*}; d=${pair##*:}
  ck=$(ls -d outputs/$d/attempt_*/checkpoints 2>/dev/null | tail -1)
  if [ -n "$ck" ] && [ ! -f outputs/$d/bias_probe.json ]; then
    echo "--- probe $e ($ck)"
    timeout 1800 python -u benchmarks/sentiment_bias_probe.py \
      --exp "$e" --ckpt "$ck" --out "outputs/$d/bias_probe.json"
  fi
done

echo "=== 1b. CAUM on v2 (second entity-bearing architecture)"
python -u benchmarks/run_statfix_matrix.py --only caum_statfix2_celoss

echo "=== 2. v2 seed replicates (noise band on the v2 fixture)"
python -u benchmarks/run_statfix_matrix.py --seeds 43,44 --exp nrms_statfix2_celoss --name nrms2
python -u benchmarks/run_statfix_matrix.py --seeds 43 --exp sentirec_statfix2_celoss --name sentirec2

echo "=== 3. second-family v1 seed replicates (MINER)"
python -u benchmarks/run_statfix_matrix.py --seeds 42,43,44 --exp miner_statfix_celoss --name miner

echo "=== 4. A-module reruns (kNN purity + sentiment t-SNE)"
python -u benchmarks/run_statfix_matrix.py --seeds 42 --exp manner_a_categ_statfix --name manner_a_categ_r5
python -u benchmarks/run_statfix_matrix.py --seeds 42 --exp manner_a_sent_statfix --name manner_a_sent_r5

echo "=== 5. MLM pretrain + fine-tune pair (pretrained vs random init)"
timeout 3600 python -u benchmarks/mlm_pretrain.py --steps 4000
python -u benchmarks/run_statfix_matrix.py --seeds 42 --exp nrms_statfix_plm4_pre --name plm4_pre
python -u benchmarks/run_statfix_matrix.py --seeds 42 --exp nrms_statfix_plm4_rand --name plm4_rand
pre_run=$(ls -d outputs/statfix_seeds/plm4_pre_s42/attempt_* 2>/dev/null | tail -1)
[ -n "$pre_run" ] && timeout 900 python -u benchmarks/plm_frozen_check.py "$pre_run"

echo "=== queue2 done"
