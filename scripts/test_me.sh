#!/bin/bash
# Smoke test: small synthetic volume through the full OF CLI (the reference
# test_me.sh tier; synthetic instead of a Google Drive download).
set -e
cd "$(dirname "$0")/.."
python scripts/make_test_volume.py -o /tmp/small_vol.mrc -z 32 -y 64 -x 64
python -m flowdenoising_tpu -i /tmp/small_vol.mrc -o /tmp/small_vol_SDPG.mrc -v 1
echo OK
