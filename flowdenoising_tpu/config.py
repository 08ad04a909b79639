"""Configuration dataclasses for the denoising pipeline.

Defaults mirror the reference CLI constants at
/root/reference/src/flowdenoising.py:47-53 (OF_LEVELS=3, OF_WINDOW_SIZE=5,
OF_ITERS=3, OF_POLY_N=5, OF_POLY_SIGMA=1.2, SIGMA=2.0) and its boundary
semantics (wrap-around modular indexing, flowdenoising.py:137; the sequential
variant mean-pads instead, flowdenoising_sequential.py:88-89 -- both are
selectable here, plus a `replicate` mode).
"""

from __future__ import annotations

import dataclasses
import enum


class Boundary(str, enum.Enum):
    """Boundary handling for the filtered axis.

    WRAP      -- modular indexing, matches the reference main CLI
                 (flowdenoising.py:137: ``vol[(z + i - ks2) % Z]``).
    MEAN      -- pad with the volume mean, matches the sequential variant
                 (flowdenoising_sequential.py:88-89).
    REPLICATE -- clamp to the edge slice (new, often the best choice for
                 tomography stacks).
    """

    WRAP = "wrap"
    MEAN = "mean"
    REPLICATE = "replicate"


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """Farneback optical-flow estimator parameters.

    Field-for-field equivalent of the cv2.calcOpticalFlowFarneback call at
    /root/reference/src/flowdenoising.py:69-79.
    """

    levels: int = 3          # -l / --levels (pyramid levels above full res)
    winsize: int = 5         # -w / --winsize (box aggregation window)
    iterations: int = 3      # OF_ITERS
    poly_n: int = 5          # OF_POLY_N (polynomial expansion half-window)
    poly_sigma: float = 1.2  # OF_POLY_SIGMA
    pyr_scale: float = 0.5   # fixed in the reference
    use_initial_flow: bool = True  # OPTFLOW_USE_INITIAL_FLOW seeding; False
                                   # reproduces --recompute_flow
    # Minimum pyramid image extent; levels are clamped so the coarsest image
    # is at least this wide/tall (OpenCV farneback.cpp min_size).
    min_size: int = 32
    # Compute dtype for flow internals.  float32 matches the reference;
    # bfloat16 trades a little accuracy for MXU throughput.
    dtype: str = "float32"
    # Precision of the flow computation's inner passes.  "float32" keeps
    # cv2-level parity.  "bfloat16" is the fast mode: MXU convs/matmuls run
    # single-pass bf16 AND the Pallas sampling kernels read the reference
    # expansion as packed bf16 pairs (one gather returns both bilinear
    # x-neighbors -- half the gather cost).  Output accumulation stays f32.
    precision: str = "float32"
    # Displacement bound (pixels) for the gather-free bilinear sampling fast
    # paths.  Results are identical to the exact gather path whenever
    # |flow| <= max_displacement (XLA's gather runs ~1e8 elem/s on TPU and
    # would dominate the pipeline).  None selects the exact gather path.
    max_displacement: int | None = 8
    # Displacement sampler: "auto" (Pallas kernel on TPU, XLA window
    # elsewhere), "pallas", "windowed", or exact gather when
    # max_displacement is None.
    sampler: str = "auto"
    # How per-tap flows are obtained (the reference solves Farneback anew
    # for every (target, neighbor) tap pair, flowdenoising.py:310-324):
    #   "solve"          -- reference-parity: one seeded pyramid solve per tap.
    #   "compose"        -- fast mode: solve only ADJACENT slice pairs (one
    #                       batched solve per direction per pass), then chain
    #                       tap flows by composing flow fields:
    #                       F_{z->z+j} = F_{z->z+j-1} + warp(a_{z+j-1}, F_{z->z+j-1}).
    #                       ~8x fewer pyramid solves; identical for the
    #                       adjacent taps, approximate beyond them.
    # (A third mode, "compose_refine" -- one full-resolution re-anchor
    # iteration per composed tap -- was REMOVED in v0.5.0: a measured
    # trust-region ladder (clip 0/0.5/0.75/1.5 px, 1-2 iterations, all
    # QUALITY tiers) found no setting reaching >= plain compose everywhere;
    # the level-0 re-solve's correction direction is noise-driven.  Best
    # case was +0.1 dB, worst -0.24 dB, at ~2x compose's cost.)
    tap_mode: str = "solve"
    # Displacement bound for the ADJACENT-pair solves of the compose modes.
    # Adjacent-slice motion is sub-pixel drift in FIB-SEM stacks, so a much
    # tighter window than max_displacement (which must cover whole-tap
    # displacements) applies; smaller bounds shrink the sampling halo and
    # shift window of every solve iteration.  None reuses max_displacement.
    adjacent_displacement: int | None = 4
    # Compose modes only: derive the backward chain links as the negated
    # forward fields (b_k ~ -a_k) instead of solving the reverse direction,
    # halving the solve iterations.  First-order exact for small adjacent
    # motion (error O(|a|^2 * flow gradient)); quality impact measured in
    # QUALITY.md.
    symmetric_adjacent: bool = False
    # Estimate flows from a lightly Gaussian-pre-smoothed copy of the
    # operands (sigma in pixels, in-plane); the tap WARPS still sample the
    # raw volume.  On noisy inputs the per-pixel flow NOISE (std ~1.4 px on
    # the bench volume) is what keeps every sampling block's y-shift range
    # wide -- the noisy first pass costs ~7x per voxel what the already-
    # denoised Y/X passes cost (BASELINE.md) -- and pre-smoothing the
    # ESTIMATION operands collapses it.  0 disables (exact reference
    # operand semantics); quality impact measured in QUALITY.md.
    presmooth: float = 0.0

    def __post_init__(self):
        if self.tap_mode not in ("solve", "compose"):
            raise ValueError(
                f"unknown tap_mode {self.tap_mode!r}: expected 'solve' or "
                "'compose' ('compose_refine' was removed in v0.5.0 -- it "
                "measured at or below plain 'compose' on every quality tier "
                "at ~2x the cost; use 'compose')")

    def clamped_levels(self, height: int, width: int) -> int:
        """Number of pyramid levels actually used for an image size.

        Reproduces OpenCV's clamping loop: stop before a level whose scaled
        extent would drop below ``min_size``.
        """
        k = 0
        scale = 1.0
        while k < self.levels:
            scale *= self.pyr_scale
            if width * scale < self.min_size or height * scale < self.min_size:
                break
            k += 1
        return k


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Separable OF-compensated Gaussian filter parameters."""

    sigma: tuple[float, float, float] = (2.0, 2.0, 2.0)  # (Z, Y, X)
    boundary: Boundary = Boundary.WRAP
    use_flow: bool = True     # False == -n / --no_OF
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    # Output slices are processed in slabs of this many slices to bound HBM
    # footprint; None = whole axis at once.
    slab_size: int | None = None
