"""Pass-boundary checkpoint / resume.

The reference has no fault tolerance (SURVEY.md §5.3-5.4): a crash loses the
entire run.  The natural resume point it *implies* is the pass-boundary
buffer swap (flowdenoising.py:287-289).  This manager persists the volume
after each completed axis pass plus a manifest binding it to the input and
configuration, so an interrupted run restarts at the last completed pass.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import os

import numpy as np

from flowdenoising_tpu.config import FilterConfig
from flowdenoising_tpu.io.mrc import read_mrc, write_mrc

MANIFEST = "manifest.json"


def _config_key(cfg: FilterConfig, input_digest: str) -> str:
    payload = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256((payload + input_digest).encode()).hexdigest()[:16]


def volume_digest(vol: np.ndarray) -> str:
    """Cheap content fingerprint: shape/dtype + strided sample hash."""
    vol = np.asarray(vol)
    h = hashlib.sha256()
    h.update(str(vol.shape).encode())
    h.update(str(vol.dtype).encode())
    flat = vol.reshape(-1)
    stride = max(1, flat.size // 65536)
    h.update(np.ascontiguousarray(flat[::stride]).tobytes())
    return h.hexdigest()[:16]


class CheckpointManager:
    def __init__(self, directory: str, cfg: FilterConfig, input_vol: np.ndarray):
        self.dir = directory
        self.key = _config_key(cfg, volume_digest(input_vol))
        self.mean = float(np.asarray(input_vol, np.float64).mean())
        os.makedirs(directory, exist_ok=True)

    def _pass_path(self, i: int) -> str:
        return os.path.join(self.dir, f"pass{i}.mrc")

    def save_pass(self, i: int, vol) -> None:
        vol = np.asarray(vol, np.float32)
        write_mrc(self._pass_path(i), vol)
        manifest = {"key": self.key, "completed_pass": i, "mean": self.mean}
        tmp = os.path.join(self.dir, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.dir, MANIFEST))
        logging.info(f"checkpointed pass {i} -> {self._pass_path(i)}")

    def load_latest(self):
        """Returns (next_pass_index, volume, input_mean) or None.

        A manifest whose last completed pass is the final (X) pass returns
        ``next_pass_index == 3`` with the FINISHED volume: a restart after
        success writes the output directly instead of re-executing the most
        expensive third of the run (the pipelines skip every pass when
        ``start_pass >= 3``).
        """
        path = os.path.join(self.dir, MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            manifest = json.load(f)
        if manifest.get("key") != self.key:
            logging.info("checkpoint manifest does not match this input/config; ignoring")
            return None
        i = min(int(manifest["completed_pass"]), 2)
        vol, _ = read_mrc(self._pass_path(i))
        if i >= 2:
            logging.info(f"all passes checkpointed; using finished volume "
                         f"from {self._pass_path(i)}")
        else:
            logging.info(f"resuming after pass {i} from {self._pass_path(i)}")
        return i + 1, np.asarray(vol, np.float32), float(manifest.get("mean", self.mean))

    def clear(self) -> None:
        for name in os.listdir(self.dir):
            if name.startswith("pass") or name == MANIFEST:
                try:
                    os.remove(os.path.join(self.dir, name))
                except OSError:
                    pass
