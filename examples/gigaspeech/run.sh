#!/usr/bin/env bash
# GigaSpeech recipe driver — equivalent of the reference's
# examples/gigaspeech/s0/run-pipeline-v3.sh + go-{SF,LF}-* harnesses,
# staged like a Kaldi/WeNet recipe.
set -euo pipefail

stage=${stage:-0}
stop_stage=${stop_stage:-5}
data=${data:-data}
exp=${exp:-exp/rwkvbi_trans_shortform}
config=${config:-conf/rwkvbi_ds4k31nc_12le_trans_shortform.yaml}
decode_modes=${decode_modes:-"rnnt_beam_search"}
PKG=paper_accurate_fast_cheap_tpu

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "stage 0: data prep — expects ${data}/{train,dev,test}/wav.scp+text"
  for set in train dev test; do
    python -m ${PKG}.bin.data_tools validate --dir ${data}/${set}
    python -m ${PKG}.bin.make_shard \
      --wav_scp ${data}/${set}/wav.scp --text ${data}/${set}/text \
      --output_dir ${data}/${set}/shards --num_utts_per_shard 1000 \
      --resample 16000
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: global CMVN"
  python -m ${PKG}.bin.compute_cmvn_stats \
    --data ${data}/train/shards/shards.txt --data_type shard \
    --num_mel_bins 80 --out_cmvn ${data}/global_cmvn
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: train"
  python -m ${PKG}.bin.train \
    --config ${config} \
    --train_data ${data}/train/shards/shards.txt \
    --cv_data ${data}/dev/shards/shards.txt \
    --data_type shard --model_dir ${exp}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: average checkpoints"
  python -m ${PKG}.bin.average_model \
    --src_path ${exp} --dst_path ${exp}/avg --num 5 --val_best \
    --config ${exp}/train.yaml
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: short-form decode + WER (go-SF-* equivalent)"
  python -m ${PKG}.bin.recognize \
    --config ${exp}/train.yaml --checkpoint ${exp}/avg \
    --test_data ${data}/test/shards/shards.txt --data_type shard \
    --result_dir ${exp}/results --modes ${decode_modes} \
    --beam_size 8 --batch_size 64 \
    --ctc_weight 0.3 --transducer_weight 0.7
  for mode in ${decode_modes}; do
    python -m ${PKG}.bin.compute_wer --giga \
      ${data}/test/text ${exp}/results/${mode}/text
  done
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "stage 5: long-form decode sweep (go-LF-* equivalent)"
  for chunk in 2000 4000 9000 15000 20000 40000; do
    out=${exp}/longform_${chunk}
    for wav in ${data}/test_longform/*.wav; do
      python -m ${PKG}.bin.recognize_wav \
        --config ${exp}/train.yaml --checkpoint ${exp}/avg \
        --wav ${wav} --output_dir ${out} --chunk_size ${chunk} \
        --mode rnnt_beam_search
    done
    # score: per-file .txt hyps vs .ref_txt references
    python - "$out" "${data}/test_longform" <<'PY'
import glob, os, sys
out, ref_dir = sys.argv[1], sys.argv[2]
with open(os.path.join(out, "hyp.trn"), "w") as h, \
     open(os.path.join(out, "ref.trn"), "w") as r:
    for t in sorted(glob.glob(os.path.join(out, "*.txt"))):
        name = os.path.splitext(os.path.basename(t))[0]
        ref = os.path.join(ref_dir, name + ".ref_txt")
        if not os.path.exists(ref):
            continue
        h.write(f"{name} {open(t).read().strip()}\n")
        r.write(f"{name} {open(ref).read().strip()}\n")
PY
    python -m ${PKG}.bin.compute_wer --giga --longform \
      ${out}/ref.trn ${out}/hyp.trn | tee ${out}/summary.txt
  done
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "stage 6: benchmarks (encoder RTF sweep, decode RTF, train step)"
  python local/run_rtf_sweep.py --out_dir ${exp}/rtf_sweep --runs 2
  python -m ${PKG}.bin.decode_rtf --config ${config} \
    --mode rnnt_beam_search --batch_size 64 --chunk_size 3000 \
    --beam_size 8 --output ${exp}/decode_b64.rtf
  python -m ${PKG}.bin.train_bench --config ${config} \
    --batch_size 16 --frames 1500 --output ${exp}/train_step.bench
fi
