#!/usr/bin/env bash
# TEDLIUM-3 recipe (reference examples/tedlium/s5_r3/run.sh analog; the
# only deltas vs s5_r2 there are the release-3 corpus, the blstm_las
# default conf, and the LM text sourced from the release's LM dir).
# Stages: 0 download+prep -> 1/2 features+vocab+TSV -> 3 LM -> 4 ASR -> 5 decode.
set -euo pipefail
cd "$(dirname "$0")"

stage=${1:-0}
stop_stage=${2:-5}
data=${DATA:-./data}
exp=${EXP:-./exp}
conf=${CONF:-conf/asr/blstm_las.yaml}
lm_conf=${LM_CONF:-conf/lm/rnnlm.yaml}
wp_vocab_size=${WP_VOCAB:-10000}
speed_perturb=${SPEED_PERTURB:-0.9_1.0_1.1}
db=${DB:-$data/db}

# Stage 0: download TEDLIUM release 3 (openslr 51) + STM-segmented manifest
# prep from the `legacy` split layout (same train/dev/test partition as
# release 2, which is what the reference s5_r3 trains on). Audio is NIST
# SPHERE — decoded natively (utils/io.py::read_sph), segments cut by the
# STM timestamps (no sph2pipe / Kaldi). Skipped when $data/train/wav.scp
# exists or the host has no network.
if [ $stage -le 0 ] && [ $stop_stage -ge 0 ] && [ ! -f "$data/train/wav.scp" ]; then
  mkdir -p "$db"
  if [ ! -d "$db/TEDLIUM_release-3" ]; then
    echo "downloading TEDLIUM_release-3 (~50GB) ..."
    wget -q -c -O "$db/TEDLIUM_release-3.tgz" \
      "https://www.openslr.org/resources/51/TEDLIUM_release-3.tgz" \
      || { echo "download failed (offline?); provide wav.scp/text manually"; }
    [ -f "$db/TEDLIUM_release-3.tgz" ] && tar -xzf "$db/TEDLIUM_release-3.tgz" -C "$db"
  fi
  DB="$db" DATA="$data" python - <<'EOF'
# wav.scp keyed by recording + Kaldi-style segments/text from the STMs
import os, glob
from neural_sp_tpu.utils.make_dataset import parse_stm
db, data = os.environ["DB"], os.environ["DATA"]
root = os.path.join(db, "TEDLIUM_release-3", "legacy")
for split in ("train", "dev", "test"):
    sd = os.path.join(root, split)
    if not os.path.isdir(sd):
        continue
    scp, seg, txt = {}, [], []
    for stm in sorted(glob.glob(os.path.join(sd, "stm", "*.stm"))):
        rec = os.path.splitext(os.path.basename(stm))[0]
        sph = os.path.join(sd, "sph", rec + ".sph")
        if not os.path.isfile(sph):
            continue
        utts = parse_stm(stm)
        if not utts:
            continue
        scp[rec] = sph
        for u in utts:
            seg.append(f'{u["utt_id"]} {u["rec"]} {u["t0"]:.2f} {u["t1"]:.2f}')
            txt.append(f'{u["utt_id"]} {u["text"]}')
    if scp:
        os.makedirs(os.path.join(data, split), exist_ok=True)
        open(os.path.join(data, split, "wav.scp"), "w").write(
            "\n".join(f"{r} {p}" for r, p in sorted(scp.items())) + "\n")
        open(os.path.join(data, split, "segments"), "w").write(
            "\n".join(seg) + "\n")
        open(os.path.join(data, split, "text"), "w").write(
            "\n".join(txt) + "\n")
        print(f"{split}: {len(scp)} recordings, {len(seg)} utts")
EOF
fi

# Stage 1/2: features (+3-way speed perturb on train) + vocab + TSVs.
if [ $stage -le 2 ] && [ $stop_stage -ge 0 ]; then
  SPEED_PERTURB="$speed_perturb" WP_VOCAB="$wp_vocab_size" DATA="$data" \
    python - <<'EOF'
import os
from neural_sp_tpu.utils.make_dataset import (
    extract_features, make_vocab, make_tsv, expand_utts_for_speed)
data = os.environ["DATA"]
wp = int(os.environ.get("WP_VOCAB", 10000))
sp = tuple(float(f) for f in
           os.environ.get("SPEED_PERTURB", "").split("_") if f)
cmvn = None
for split in ("train", "dev", "test"):
    d = os.path.join(data, split)
    if not os.path.isdir(d):
        print(f"skip {split} (no {d})"); continue
    wav_scp = dict(l.split(None, 1) for l in open(f"{d}/wav.scp")
                   .read().strip().splitlines())
    text = dict(l.split(None, 1) for l in open(f"{d}/text")
                .read().strip().splitlines())
    segments = {}
    if os.path.isfile(f"{d}/segments"):
        for l in open(f"{d}/segments").read().strip().splitlines():
            utt, rec, t0, t1 = l.split()
            segments[utt] = (rec, float(t0), float(t1))
    if split == "train":
        make_vocab(list(text.values()), "wp", f"{data}/dict_wp.txt", wp,
                   wp_model_path=f"{data}/wp.json")
    is_train = split == "train"
    paths, lens, cmvn = extract_features(
        wav_scp, f"{d}/feat", cmvn=None if is_train else cmvn,
        speed_perturbs=sp if is_train else (),
        segments=segments or None)
    utts = [{"utt_id": u, "speaker": u.rsplit("-", 2)[0], "text": t}
            for u, t in text.items()]
    if is_train and sp:
        utts = expand_utts_for_speed(utts, sp)
    make_tsv(utts, paths, lens, f"{data}/dict_wp.txt", "wp",
             f"{data}/{split}_wp.tsv", wp_model=f"{data}/wp.json")
EOF
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  python -m neural_sp_tpu.bin.lm.train --config "$lm_conf" \
    --train_set "$data/train_wp.tsv" --dev_set "$data/dev_wp.tsv" \
    --dict "$data/dict_wp.txt" --wp_model "$data/wp.json" \
    --model_save_dir "$exp/lm"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  python -m neural_sp_tpu.bin.asr.train --config "$conf" \
    --train_set "$data/train_wp.tsv" --dev_set "$data/dev_wp.tsv" \
    --dict "$data/dict_wp.txt" --wp_model "$data/wp.json" \
    --model_save_dir "$exp/asr"
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  python -m neural_sp_tpu.bin.asr.eval \
    --recog_model "$exp/asr" --recog_sets "$data/test_wp.tsv" \
    --recog_beam_width 10 --recog_ctc_weight 0.3 --recog_length_norm true \
    --recog_dir "$exp/decode"
fi
