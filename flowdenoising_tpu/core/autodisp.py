"""Automatic ``max_displacement`` selection from the volume's real motion.

The Pallas sampling kernels bound per-tap displacements to
``FlowConfig.max_displacement`` (D); motions beyond D are clamped during
sampling.  The default D=8 covers FIB-SEM-style sub-pixel drift with room to
spare, but on data with large inter-slice motion it costs quality (QUALITY.md
membranes tier: parity mode lands 0.6-0.8 dB below the cv2 reference because
cv2's ``calcOpticalFlowFarneback`` follows displacements unboundedly,
/root/reference/src/flowdenoising.py:69-79).  Conversely, on calm data a
smaller D shrinks every solve's sampling halo and shift window.

``--max_displacement auto`` picks the bound by measuring what clamping
actually costs, not by raw flow magnitude: optical flow between distant
cross-sections routinely reports large displacements where structure appears
or deforms (no coherent match exists), and clamping those is harmless.  The
probe therefore

- takes a few evenly spaced slice pairs per pass axis at the LARGEST tap
  distance the filter uses (ks2 = kernel_len // 2; per-tap flow grows with
  tap distance, so distance-ks2 pairs bound every tap) and at distance 1
  (bounding the compose modes' ``adjacent_displacement``),
- downsamples the planes (INTER_AREA) so the longest extent is
  ``probe_extent`` px -- the probe costs ~nothing, plane noise is averaged
  down, and large motions shrink into the pyramid's capture range,
- solves unbounded Farneback (exact-gather path, ``max_displacement=None``)
  at probe scale, and
- picks the smallest ladder D whose component-clamped flow warps the
  reference onto the target within ``_TOL`` of the unbounded flow's warp
  error -- i.e. the smallest bound that does not lose motions the estimator
  can genuinely track.

The probe runs on the host CPU backend when one is available so CLI runs
don't pay a remote-TPU compile for a throwaway 128-px program.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from flowdenoising_tpu.config import FilterConfig, FlowConfig
from flowdenoising_tpu.kernels import get_gaussian_kernels

# Displacement ladders: small enough steps that the chosen bound stays
# close to the need, few enough that compile variants stay bounded.
_D_LADDER = (4, 6, 8, 12, 16, 24, 32)
_ADJ_LADDER = (2, 3, 4, 6, 8, 12, 16)
# Accepted relative increase of the clamped warp's mean abs error over the
# unbounded warp's (calibration in tests/test_autodisp.py: calm volumes sit
# ~1e-3 above, coherent large drifts sit 2-10x above until D covers them).
_TOL = 0.05
_N_PAIRS = 4   # probed slice pairs per axis per distance
# The probe's flow is "tracking" only when its warp error clearly beats the
# identity warp; above this fraction the clamp-cost curve is uninformative
# (see curves_at in probe_displacement).
_UNTRACKED_FRAC = 0.9


def _probe_pairs(vol: np.ndarray, distance: int, n_pairs: int):
    """(targets, references) stacks of ``n_pairs`` plane pairs at the given
    slice distance along axis 0, evenly spaced."""
    n = vol.shape[0]
    distance = min(distance, n - 1)
    starts = np.unique(np.linspace(0, n - 1 - distance,
                                   min(n_pairs, n - distance)).astype(int))
    tgt = np.stack([np.asarray(vol[z], dtype=np.float32) for z in starts])
    ref = np.stack([np.asarray(vol[z + distance], dtype=np.float32)
                    for z in starts])
    return tgt, ref


def _clamp_cost_curve(tgt: np.ndarray, ref: np.ndarray, flow_cfg: FlowConfig,
                      probe_extent: int, ladder: tuple[int, ...]):
    """Mean-abs warp error of the component-clamped flow for each ladder D,
    plus the unbounded flow's error.  Flow direction matches the per-tap
    solve: target -> reference, then the reference is warped back."""
    import jax.numpy as jnp
    from flowdenoising_tpu.ops.farneback import farneback_flow
    from flowdenoising_tpu.ops.resize import resize_area
    from flowdenoising_tpu.ops.warp import warp_slices

    h, w = tgt.shape[-2:]
    scale = max(1.0, max(h, w) / probe_extent)
    ph, pw = max(16, round(h / scale)), max(16, round(w / scale))
    # sampler="windowed": the probe may run on the host CPU backend while
    # the default platform is a TPU -- pallas_supported() keys off the
    # platform, so the "auto" sampler would route update_flow through a
    # Mosaic kernel the CPU backend cannot execute.  (Sampling itself takes
    # the exact-gather path regardless: max_displacement=None.)
    probe_cfg = dataclasses.replace(
        flow_cfg, max_displacement=None, precision="float32",
        dtype="float32", tap_mode="solve", use_initial_flow=False,
        sampler="windowed")
    t = resize_area(jnp.asarray(tgt), (ph, pw))
    r = resize_area(jnp.asarray(ref), (ph, pw))
    flow = farneback_flow(r, t, probe_cfg)

    def err(f):
        return float(jnp.mean(jnp.abs(warp_slices(r, f) - t)))

    # D is in full-res pixels; flow components are in probe-res pixels.
    su, sv = w / pw, h / ph
    curve = [err(jnp.stack([jnp.clip(flow[..., 0], -d / su, d / su),
                            jnp.clip(flow[..., 1], -d / sv, d / sv)], axis=-1))
             for d in ladder]
    ident = float(jnp.mean(jnp.abs(r - t)))
    return curve, err(flow), ident


def _pick_bound(costs_by_axis, base_by_axis, ladder, label) -> int:
    """Smallest ladder D acceptable on EVERY probed axis."""
    for i, d in enumerate(ladder):
        if all(c[i] <= b * (1.0 + _TOL) + 1e-6
               for c, b in zip(costs_by_axis, base_by_axis)):
            return d
    logging.warning(
        f"auto {label}: even D={ladder[-1]} clamps motion the flow tracks "
        f"(the sampling kernels bound displacements; residual clamping "
        f"matches the fixed-D behavior)")
    return ladder[-1]


def probe_displacement(vol: np.ndarray, cfg: FilterConfig,
                       probe_extent: int = 128) -> tuple[int, int]:
    """Measure the volume's motion scale and return
    ``(max_displacement, adjacent_displacement)`` from the ladders.

    ``vol`` may be any array-like with numpy slicing (ndarray or np.memmap
    in stored dtype); only ~``3 axes * 2 * _N_PAIRS`` planes are touched.
    """
    import jax

    kernels = get_gaussian_kernels(cfg.sigma)
    far_costs, far_base, adj_costs, adj_base = [], [], [], []
    untrackable = []
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        # any backend-lookup failure (error type varies across JAX versions)
        # just means the probe runs on the default device
        cpu = None

    def curves_at(tgt, ref, ladder, label):
        """Clamp-cost curve with probe-extent escalation: the downsampled
        probe's pyramid is clamped to ~2 levels, so motion it cannot track
        leaves the unbounded warp error ~at the identity-warp error -- a
        small-D pick from such a curve would be unfounded.  Re-probe at 2x
        extent once; if the flow still barely beats the identity warp, flag
        the axis so the pick is floored at the fixed default."""
        curve, base, ident = _clamp_cost_curve(tgt, ref, cfg.flow,
                                               probe_extent, ladder)
        if base > _UNTRACKED_FRAC * ident:
            curve, base, ident = _clamp_cost_curve(tgt, ref, cfg.flow,
                                                   2 * probe_extent, ladder)
            if base > _UNTRACKED_FRAC * ident:
                untrackable.append(label)
        return curve, base

    def run():
        for axis in range(3):
            ks2 = len(kernels[axis]) // 2
            if ks2 == 0 or vol.shape[axis] < 2:
                continue
            v = np.moveaxis(np.asarray(vol), axis, 0) if axis else vol
            dist_far = min(ks2, vol.shape[axis] - 1)
            tgt, ref = _probe_pairs(v, dist_far, _N_PAIRS)
            curve, base = curves_at(tgt, ref, _D_LADDER, f"axis{axis}/far")
            far_costs.append(curve)
            far_base.append(base)
            if dist_far > 1:
                tgt, ref = _probe_pairs(v, 1, _N_PAIRS)
            curve, base = curves_at(tgt, ref, _ADJ_LADDER, f"axis{axis}/adj")
            adj_costs.append(curve)
            adj_base.append(base)

    if cpu is not None:
        with jax.default_device(cpu):
            run()
    else:
        run()

    if not far_costs:
        return (cfg.flow.max_displacement or _D_LADDER[1],
                cfg.flow.adjacent_displacement or _ADJ_LADDER[2])
    max_d = _pick_bound(far_costs, far_base, _D_LADDER, "max_displacement")
    adj_d = min(max_d, _pick_bound(adj_costs, adj_base, _ADJ_LADDER,
                                   "adjacent_displacement"))
    if untrackable:
        # Probe could not distinguish bounds on these curves; never pick a
        # bound TIGHTER than the fixed defaults there.  Far and adjacent
        # curves floor independently: an informative far curve must not
        # launder an uninformative adjacent pick (or vice versa).
        far_unt = [u for u in untrackable if u.endswith("/far")]
        adj_unt = [u for u in untrackable if u.endswith("/adj")]
        floor_d = cfg.flow.max_displacement or 8
        floor_adj = cfg.flow.adjacent_displacement or _ADJ_LADDER[2]
        if far_unt and max_d < floor_d:
            logging.warning(
                f"auto max_displacement: probe flow barely beats the "
                f"identity warp on {far_unt} (motion the probe scale "
                f"cannot track?); flooring pick {max_d} at the fixed "
                f"default {floor_d}")
            max_d = floor_d
        if adj_unt and adj_d < min(max_d, floor_adj):
            logging.warning(
                f"auto adjacent_displacement: uninformative adjacent probe "
                f"on {adj_unt}; flooring pick {adj_d} at the fixed "
                f"default {min(max_d, floor_adj)}")
            adj_d = min(max_d, floor_adj)
    logging.info(f"auto max_displacement: probed clamp-cost curves -> "
                 f"max_displacement={max_d}, adjacent_displacement={adj_d}")
    return max_d, adj_d


def resolve_auto_displacement(vol: np.ndarray,
                              cfg: FilterConfig) -> FilterConfig:
    """Return ``cfg`` with probed displacement bounds filled in."""
    max_d, adj_d = probe_displacement(vol, cfg)
    return dataclasses.replace(
        cfg, flow=dataclasses.replace(cfg.flow, max_displacement=max_d,
                                      adjacent_displacement=adj_d))
