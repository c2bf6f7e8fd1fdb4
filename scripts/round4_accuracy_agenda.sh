#!/bin/bash
# Round-4 accuracy loop (VERDICT r3 item 1): train the FLAGSHIP config from
# scratch on the synthetic corpus THROUGH THE PRODUCTION CLIs on the TPU,
# then evaluate the chip-trained checkpoint with the production eval path in
# both fp32 and bf16.  In-env analog of the reference acceptance flow
# (/root/reference/README.md:126-145: train -> transcribe -> transkunEval).
#
# Corpus: scripts/make_synth_corpus.py /tmp/corpus --train 40 --val 4 --test 4 --dur 120
# Resumable: cli/train.py resumes from $CKPT if it exists.
set -ex
CORPUS=${CORPUS:-/tmp/corpus}
CKPT=${CKPT:-/tmp/ckpt_r4}
STEPS=${STEPS:-6000}
# 40x120s pieces at 16s/8s chunking -> 560 chunks -> 280 steps/epoch at B=2
MAX_EPOCH=${MAX_EPOCH:-21}
MAX_LR=${MAX_LR:-4e-4}
cd /root/repo

python -m transkun_tpu.cli.train "$CKPT" \
  --datasetPath "$CORPUS" \
  --datasetMetaFile_train "$CORPUS/train.pickle" \
  --datasetMetaFile_val "$CORPUS/val.pickle" \
  --modelConf transkun_tpu/pretrained/2.0.conf \
  --bf16 --batchSize 2 --max_lr "$MAX_LR" --nIter "$STEPS" \
  --maxEpoch "$MAX_EPOCH" \
  --warmupCutoff 300 --statsEvery 200 --ckptEvery 200 --logEvery 16 \
  --dataLoaderWorkers 2

python scripts/eval_corpus.py "$CORPUS" "$CORPUS/test.pickle" /tmp/est_fp32 \
  --weight "$CKPT" --outputJSON /tmp/est_fp32/metrics.json | tee /tmp/eval_fp32.out
python scripts/eval_corpus.py "$CORPUS" "$CORPUS/test.pickle" /tmp/est_bf16 \
  --weight "$CKPT" --bf16 --outputJSON /tmp/est_bf16/metrics.json | tee /tmp/eval_bf16.out
