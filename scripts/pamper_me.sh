#!/bin/bash
# Real-data tier: tomogram-scale textured volume through the full OF CLI.
# The reference's analogous tier fetches the EMPIAR-10988 TS_026.rec
# tomogram and saves it as TS_026.mrc (/root/reference/src/stress_me.sh:1-4);
# this sandbox is zero-egress, so a membranes/filaments phantom quantized to
# int16 -- the .rec payload dtype -- stands in.
set -e
cd "$(dirname "$0")/.."
python scripts/make_test_volume.py -o /tmp/TS_026_syn.mrc \
    -z 160 -y 512 -x 512 --pattern membranes --dtype int16 --noise 30
python -m flowdenoising_tpu -i /tmp/TS_026_syn.mrc -o /tmp/TS_026_syn_SDPG.mrc -v 1
echo OK
