#!/bin/bash
# Stress test (reference stress_me.sh tier, /root/reference/src/stress_me.sh:1-6).
# Uses the REAL big_vol.mrc when scripts/fetch_real_data.sh has fetched it
# (docs/REAL_DATA.md); falls back to a synthetic volume offline.
set -e
cd "$(dirname "$0")/.."
if [ -s data/big_vol.mrc ]; then
    IN=data/big_vol.mrc
else
    python scripts/make_test_volume.py -o /tmp/big_vol.mrc -z 256 -y 512 -x 512
    IN=/tmp/big_vol.mrc
fi
python -m flowdenoising_tpu -i "$IN" -o /tmp/big_vol_SDPG.mrc -v 1 --slab_size 64
echo OK
