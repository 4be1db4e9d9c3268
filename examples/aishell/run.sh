#!/usr/bin/env bash
# AISHELL-1 recipe (reference examples/aishell/s5/run.sh analog).
# Stage 0 downloads the open corpus (openslr 33) and builds wav.scp/text;
# later stages run through the shared driver.
cd "$(dirname "$0")"
set -euo pipefail

data=${DATA:-./data}
db=${DB:-$data/db}

if [ "${1:-0}" -le 0 ] && [ ! -f "$data/train/wav.scp" ]; then
  mkdir -p "$db"
  if [ ! -d "$db/data_aishell" ]; then
    echo "downloading AISHELL-1 (15 GB) ..."
    wget -q -c -O "$db/data_aishell.tgz" \
      "https://www.openslr.org/resources/33/data_aishell.tgz" \
      || echo "download failed (offline?); provide wav.scp/text manually"
    [ -f "$db/data_aishell.tgz" ] && tar -xzf "$db/data_aishell.tgz" -C "$db"
    # per-speaker inner tarballs
    for f in "$db"/data_aishell/wav/*.tar.gz; do
      [ -f "$f" ] && tar -xzf "$f" -C "$db/data_aishell/wav" && rm -f "$f"
    done
  fi
  DB="$db" DATA="$data" python - <<'EOF'
# aishell layout: wav/{train,dev,test}/<spk>/<utt>.wav +
# transcript/aishell_transcript_v0.8.txt ("<utt> <spaced chars>")
import os, glob
db, data = os.environ["DB"], os.environ["DATA"]
trans = {}
tp = os.path.join(db, "data_aishell", "transcript",
                  "aishell_transcript_v0.8.txt")
if os.path.isfile(tp):
    for line in open(tp, encoding="utf-8"):
        utt, text = line.strip().split(" ", 1)
        trans[utt] = text.replace(" ", "")
for split in ("train", "dev", "test"):
    scp, txt = [], []
    for wav in sorted(glob.glob(os.path.join(
            db, "data_aishell", "wav", split, "*", "*.wav"))):
        utt = os.path.splitext(os.path.basename(wav))[0]
        if utt in trans:
            scp.append(f"{utt} {wav}")
            txt.append(f"{utt} {trans[utt]}")
    if scp:
        os.makedirs(os.path.join(data, split), exist_ok=True)
        open(os.path.join(data, split, "wav.scp"), "w").write(
            "\n".join(scp) + "\n")
        open(os.path.join(data, split, "text"), "w",
             encoding="utf-8").write("\n".join(txt) + "\n")
        print(f"{split}: {len(scp)} utts")
EOF
fi

CONF=${CONF:-conf/conformer_las.yaml} \
UNIT=${UNIT:-char} \
exec ../common/run_asr.sh "$@"
