"""Worker process for the 2-process multi-host sharding test.

Each process owns half the devices of a (2 processes x 4 virtual CPU
devices) = 8-device global mesh, builds its process-LOCAL Z shard of a
deterministic volume, assembles the global array with
``make_array_from_process_local_data``, and runs the sharded pipeline.
Cross-process ppermute halo exchange and all-to-all transpose resharding
ride the gloo CPU collectives -- the CI stand-in for multi-host ICI/DCN.

Usage: _multihost_worker.py <process_id> <num_processes> <coordinator> <outdir>
"""

import os
import sys

pid, nproc, coord, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(__file__))
from conftest import make_blob_volume  # noqa: E402
from flowdenoising_tpu.config import Boundary, FilterConfig, FlowConfig  # noqa: E402
from flowdenoising_tpu.parallel.mesh import AXIS, denoise_sharded, make_mesh  # noqa: E402

assert len(jax.devices()) == 4 * nproc, jax.devices()
mesh = make_mesh(4 * nproc)
sharding = NamedSharding(mesh, P(AXIS, None, None))

Z = 16
vol = make_blob_volume(Z, 24, 16, seed=21).astype(np.float32)

# Each process materializes ONLY its local Z rows (the >host-RAM pattern:
# per-host shard loading, parallel/ingest.py).
shard_z = Z // (4 * nproc)
my_devs = [i for i in range(4 * nproc)
           if mesh.devices.flat[i].process_index == pid]
assert my_devs == list(range(min(my_devs), max(my_devs) + 1)), my_devs
lo = min(my_devs) * shard_z
hi = (max(my_devs) + 1) * shard_z
local = vol[lo:hi]
garr = jax.make_array_from_process_local_data(sharding, local,
                                              global_shape=vol.shape)

mode = sys.argv[5] if len(sys.argv) > 5 else "gauss"
if mode == "gauss":
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       use_flow=False)
else:
    cfg = FilterConfig(sigma=(0.5, 0.5, 0.5), boundary=Boundary.WRAP,
                       flow=FlowConfig(levels=0, winsize=5))

out = denoise_sharded(garr, cfg, mesh=mesh)
out.block_until_ready()

# Persist this process's addressable output shards for reassembly.
for shard in out.addressable_shards:
    z0 = shard.index[0].start or 0
    np.save(os.path.join(outdir, f"out_{z0:04d}.npy"), np.asarray(shard.data))

jax.distributed.shutdown()
print(f"worker {pid} ok", flush=True)
