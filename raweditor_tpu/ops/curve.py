"""Free-form point tone curve (monotone cubic spline).

Capability beyond the reference editor (whose tone tools are the six
global sliders, reference: state/edit.rs:15-77, gpu/shaders.rs:217-239)
and beyond this repo's parametric 4-region curve (ops/extras.tone_curve):
the classic "point curve" every serious RAW editor ships — arbitrary
control points dragged on the 0..1 tone axis, interpolated smoothly and
WITHOUT overshoot.

Model
-----
``EditParams.point_curve`` is a tuple of (x, y) control points in
[0, 1], strictly increasing in x (validated host-side by
:func:`validate_points`). Empty tuple = no curve — and because the
tuple is part of the params PYTREE STRUCTURE, the gate is a static
Python branch under jit: the default develop never traces the stage
and parity stays bit-exact by construction (the ops/local_adjust.py
discipline). Dragging a point never recompiles (coordinates are traced
leaves); adding/removing a point recompiles once (structure change).

Interpolation is the Fritsch–Carlson / PCHIP monotone cubic Hermite:
segment tangents are the weighted harmonic mean of neighbouring secant
slopes, zeroed at local extrema, which guarantees the interpolant is
monotone wherever the control points are — no ringing around a steep
S-curve, the behaviour photographers expect from Lightroom's point
curve. Outside [x_first, x_last] the curve clamps to the endpoint
values (flat extension).

TPU shape: evaluation is a closed-form O(n_points) chain of pointwise
selects and Hermite polynomials — no gather, no LUT, no data-dependent
control flow — so XLA fuses the whole stage into the develop program
like every other pointwise extra (a 6-point curve costs ~90
flops/pixel/channel on the VPU).

Placement: applied per-channel to the ENCODED RGB planes — after the
transfer encode, BEFORE the finish extras (sharpen/denoise/etc.), the
tone-curve-then-detail order desktop RAW editors use
(ops/develop.finish_to_u8) — display-referred tone mapping.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_F = np.float32

#: More points than anyone drags; keeps a hostile params JSON from
#: compiling an unboundedly long select chain.
MAX_POINTS = 16
#: Minimum x spacing (validate_points): the Hermite segment divides by
#: the gap, and sub-1e-3 gaps are UI noise, not intent.
MIN_GAP = 1e-3


def validate_points(points) -> Tuple[Tuple[float, float], ...]:
    """Normalize + validate a point-curve spec (host-side, concrete
    floats). Accepts any iterable of (x, y) pairs; returns the
    canonical tuple-of-tuples for ``EditParams.point_curve``.

    Rules: 0 or 2..MAX_POINTS points, coordinates finite in [0, 1],
    x strictly increasing with at least MIN_GAP spacing. Raises
    ValueError otherwise — catalog JSON and CLI specs go through here
    so a malformed curve fails loudly at parse time, not as NaNs deep
    in a batch flush.
    """
    pts = []
    for p in points:
        # Entries must be 2-sequences, not merely float-convertible
        # iterables: a digit string like "00" iterates to two chars
        # and would silently become the (0.0, 0.0) control point —
        # malformed catalog/sidecar JSON must fail loudly instead
        # (advisor r4). Strings/numbers/None keep the documented
        # ValueError contract (per-file quarantine catches ValueError,
        # not TypeError).
        if not isinstance(p, (list, tuple)) or len(p) != 2:
            raise ValueError(
                f"point_curve entries must be (x, y) pairs, got {p!r}")
        try:
            pair = tuple(float(v) for v in p)
        except (TypeError, ValueError):
            raise ValueError(
                f"point_curve entries must be (x, y) pairs, got {p!r}")
        if not all(np.isfinite(v) and 0.0 <= v <= 1.0 for v in pair):
            raise ValueError(
                f"point_curve coordinates must be finite in [0, 1], "
                f"got {pair}")
        pts.append(pair)
    if not pts:
        return ()
    if len(pts) == 1:
        raise ValueError("point_curve needs at least 2 points (or none)")
    if len(pts) > MAX_POINTS:
        raise ValueError(
            f"point_curve supports at most {MAX_POINTS} points, "
            f"got {len(pts)}")
    for (x0, _), (x1, _) in zip(pts, pts[1:]):
        if x1 - x0 < MIN_GAP:
            raise ValueError(
                "point_curve x coordinates must be strictly increasing "
                f"(gap >= {MIN_GAP}); got {x0} then {x1}")
    return tuple(pts)


def _tangents(xs, ys):
    """PCHIP segment-end tangents for traced scalars: weighted harmonic
    mean of adjacent secants, zero at local extrema (the monotonicity
    guarantee), one-sided secants at the endpoints."""
    n = len(xs)
    h = [xs[i + 1] - xs[i] for i in range(n - 1)]
    d = [(ys[i + 1] - ys[i]) / h[i] for i in range(n - 1)]
    if n == 2:
        return [d[0], d[0]]
    m = [d[0]]
    for i in range(1, n - 1):
        w1 = _F(2.0) * h[i] + h[i - 1]
        w2 = h[i] + _F(2.0) * h[i - 1]
        keep = d[i - 1] * d[i] > _F(0.0)
        # Guard the divisions when a secant is 0 or the slopes change
        # sign — the result is discarded by the select either way.
        safe0 = jnp.where(keep, d[i - 1], _F(1.0))
        safe1 = jnp.where(keep, d[i], _F(1.0))
        m.append(jnp.where(
            keep, (w1 + w2) / (w1 / safe0 + w2 / safe1), _F(0.0)))
    m.append(d[-1])
    return m


def apply_point_curve(c, points: Sequence[Sequence[float]]):
    """Evaluate the monotone point curve on encoded values ``c``
    (any-shape f32 array in [0, 1]).

    ``points`` is the validated tuple of (x, y) pairs — python
    STRUCTURE with traced scalar coordinates, so under jit this
    unrolls to a fixed pointwise select chain. Values outside
    [x_first, x_last] clamp to the endpoint y (flat extension).
    """
    n = len(points)
    if n == 0:
        return c
    xs = [jnp.asarray(p[0], jnp.float32) for p in points]
    ys = [jnp.asarray(p[1], jnp.float32) for p in points]
    m = _tangents(xs, ys)
    res = jnp.zeros_like(c) + ys[0]
    for i in range(n - 1):
        h = xs[i + 1] - xs[i]
        t = jnp.clip((c - xs[i]) / h, _F(0.0), _F(1.0))
        t2 = t * t
        t3 = t2 * t
        seg = ((_F(2.0) * t3 - _F(3.0) * t2 + _F(1.0)) * ys[i]
               + (t3 - _F(2.0) * t2 + t) * h * m[i]
               + (_F(3.0) * t2 - _F(2.0) * t3) * ys[i + 1]
               + (t3 - t2) * h * m[i + 1])
        res = jnp.where(c >= xs[i], seg, res)
    res = jnp.where(c >= xs[-1], ys[-1], res)
    # Monotone Hermite stays inside [min(ys), max(ys)] ⊆ [0, 1] per
    # segment, but keep the output clamp explicit for the quantizers.
    return jnp.clip(res, _F(0.0), _F(1.0))
