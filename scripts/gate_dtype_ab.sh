#!/bin/bash
# bf16-gate convergence A/B (r4): same seed, same data, full SAVP VAE-GAN
# on synthetic, 600 steps at batch 16 — fp32 vs bf16 gate math. If the
# loss trajectories and eval metrics track, adopting gate_dtype=bfloat16
# at the bench operating points is evidence-backed, not hopeful.
set -u
cd /root/repo
LOG=${1:-/tmp/gate_ab.log}
HP_COMMON="context_frames=2,sequence_length=12,batch_size=16,l1_weight=100.0,kl_weight=0.01,nz=8,video_sn_gan_weight=0.1,video_sn_vae_gan_weight=0.1,gan_loss_type=LSGAN,beta1=0.5,transformation=cdna,num_transformed_images=4,schedule_sampling_k=900.0,compute_dtype=bfloat16,scan_unroll=0,lstm_gate_conv=merged,max_steps=600"
echo "=== gate A/B start $(date -u +%FT%TZ) ===" >> "$LOG"
for GD in float32 bfloat16; do
  OUT=/tmp/gate_ab_$GD
  rm -rf "$OUT"
  echo "--- train gate_dtype=$GD ---" >> "$LOG"
  timeout 3000 python scripts/train.py \
    --dataset synthetic --model savp \
    --model_hparams "$HP_COMMON,gate_dtype=$GD" \
    --output_dir "$OUT" --seed 7 \
    --progress_freq 50 --save_freq 600 --summary_freq 0 \
    --eval_summary_freq 0 --image_summary_freq 0 --accum_eval_summary_freq 0 \
    --no_tensorboard >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
  echo "--- evaluate gate_dtype=$GD ---" >> "$LOG"
  timeout 1200 python scripts/evaluate.py --checkpoint "$OUT" \
    --results_dir /tmp/gate_ab_res_$GD --batch_size 8 --num_samples 16 \
    --num_stochastic_samples 2 >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
done
echo "=== gate A/B done $(date -u +%FT%TZ) ===" >> "$LOG"
