#!/bin/bash
# Smoke test (reference test_me.sh tier, /root/reference/src/test_me.sh:1-8).
# Uses the REAL small_vol.mrc when scripts/fetch_real_data.sh has fetched it
# (docs/REAL_DATA.md); falls back to a synthetic volume offline.
set -e
cd "$(dirname "$0")/.."
if [ -s data/small_vol.mrc ]; then
    IN=data/small_vol.mrc
else
    python scripts/make_test_volume.py -o /tmp/small_vol.mrc -z 32 -y 64 -x 64
    IN=/tmp/small_vol.mrc
fi
python -m flowdenoising_tpu -i "$IN" -o /tmp/small_vol_SDPG.mrc -v 1
echo OK
