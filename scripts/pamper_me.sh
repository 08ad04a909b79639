#!/bin/bash
# Real-data tier (reference pamper_me.sh, /root/reference/src/pamper_me.sh:1-5).
# Uses the REAL EMPIAR-10988 TS_026 tomogram when scripts/fetch_real_data.sh
# has fetched it (docs/REAL_DATA.md), and additionally runs the quality
# protocol against the cv2 oracle on a crop.  Offline, a membranes/filaments
# phantom quantized to int16 (the .rec payload dtype) stands in.
set -e
cd "$(dirname "$0")/.."
if [ -s data/TS_026.mrc ]; then
    IN=data/TS_026.mrc
    python -m flowdenoising_tpu -i "$IN" -o /tmp/TS_026_SDPG.mrc -v 1
    python scripts/real_data_eval.py "$IN"
else
    python scripts/make_test_volume.py -o /tmp/TS_026_syn.mrc \
        -z 160 -y 512 -x 512 --pattern membranes --dtype int16 --noise 30
    python -m flowdenoising_tpu -i /tmp/TS_026_syn.mrc -o /tmp/TS_026_syn_SDPG.mrc -v 1
fi
echo OK
