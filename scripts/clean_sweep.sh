#!/bin/bash
# Clean-session performance sweep (BASELINE.md ladder; VERDICT r3 #8).
# One session, every BASELINE.json config, driver-style capture:
#   bash scripts/clean_sweep.sh | tee /tmp/sweep.log
# Methodology: BIG_DEVGEN=1 times device-resident-input denoise (donated,
# compute-only) -- the representative per-chip figure; the shared tunnel's
# bulk H2D degrades to ~100 KB/s under load, so host-input absolutes are
# not measurable here (production PCIe moves 2 GiB in <1 s).  bench.py is
# the official record format.
set -u
cd "$(dirname "$0")/.."

echo "== tunnel health =="
timeout 300 python - <<'EOF' 2>&1 | grep -v WARNING
import time, numpy as np, jax
x = np.ones((16,512,512), np.float32)
t0=time.time(); xd = jax.device_put(x); _=float(xd[0,0,0])
dt = time.time()-t0
print(f"H2D 16MiB: {dt:.1f}s ({16/dt:.0f} MB/s)")
if dt > 8: print("TUNNEL DEGRADED -- big_run absolutes will be transfer-bound")
EOF

run () {  # run <label> <env...>
  label="$1"; shift
  echo "== $label =="
  env "$@" BIG_DEVGEN=1 BIG_REPS=2 timeout 3000 python scripts/big_run.py 2>&1 | grep -v WARNING | grep -E "rep |pass |volume|H2D"
}

echo "=== 512^3 ladder ==="
S=512,512,512
run "solve f32"                 BIG_SHAPE=$S BIG_TAP=solve   BIG_PREC=float32
run "solve f32 presmooth"       BIG_SHAPE=$S BIG_TAP=solve   BIG_PREC=float32 BIG_PRESMOOTH=1.5
run "solve bf16"                BIG_SHAPE=$S BIG_TAP=solve   BIG_PREC=bfloat16
run "compose f32"               BIG_SHAPE=$S BIG_TAP=compose BIG_PREC=float32
run "compose bf16"              BIG_SHAPE=$S BIG_TAP=compose BIG_PREC=bfloat16
run "compose bf16 sym"          BIG_SHAPE=$S BIG_TAP=compose BIG_PREC=bfloat16 BIG_SYM=1
run "compose bf16 sym presmooth" BIG_SHAPE=$S BIG_TAP=compose BIG_PREC=bfloat16 BIG_SYM=1 BIG_PRESMOOTH=1.5

echo "=== 1024x1024x512 headline ==="
H=512,1024,1024
run "solve f32 (headline)"       BIG_SHAPE=$H BIG_TAP=solve   BIG_PREC=float32 BIG_PASS_TIMES=1
run "solve f32 presmooth (headline)" BIG_SHAPE=$H BIG_TAP=solve BIG_PREC=float32 BIG_PRESMOOTH=1.5
run "compose bf16 sym (headline)" BIG_SHAPE=$H BIG_TAP=compose BIG_PREC=bfloat16 BIG_SYM=1
run "compose bf16 sym presmooth (headline)" BIG_SHAPE=$H BIG_TAP=compose BIG_PREC=bfloat16 BIG_SYM=1 BIG_PRESMOOTH=1.5

echo "=== official bench record (256^3, all sections) ==="
BENCH_DEADLINE_S=1200 timeout 1500 python bench.py 2>/dev/null | grep '^{' | tail -1

echo "=== batch throughput (config 5) ==="
BENCH_MODE=batch timeout 2400 python bench.py 2>/dev/null | grep '^{' | tail -1

echo "=== sweep done ==="
