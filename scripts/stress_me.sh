#!/bin/bash
# Stress test: large synthetic volume (the reference stress_me.sh tier).
set -e
cd "$(dirname "$0")/.."
python scripts/make_test_volume.py -o /tmp/big_vol.mrc -z 256 -y 512 -x 512
python -m flowdenoising_tpu -i /tmp/big_vol.mrc -o /tmp/big_vol_SDPG.mrc -v 1 --slab_size 64
echo OK
