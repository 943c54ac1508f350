"""Double-float (two-float32) error-free transforms.

TPU v5e has no fp64 ALUs; the MXU/VPU are fp32-class.  Iterative
refinement, however, needs the residual r = b - A x computed to BETTER
than working precision or it stalls at O(eps32) (Wilkinson).  The classic
fix on fp32-only hardware is double-float arithmetic built from error-free
transforms (Dekker 1971, Knuth TwoSum): every value is an unevaluated sum
hi + lo of two fp32 with |lo| <= ulp(hi)/2, giving ~2x24 = 48-bit
effective mantissas — enough to drive a refined fp32 solve to ~1e-12-1e-14
backward error entirely on device (the host-fp64 polish step recovers the
last digits with ONE round-trip instead of one per refinement step).

All transforms are straight-line fp32 vector ops (VPU-friendly, fusable).
XLA preserves IEEE semantics (no unsafe reassociation), so the error
terms survive compilation; tests/test_kernels.py checks the invariants
compiled.

Reference role: the reference is fp64-on-CPU throughout and needs none of
this; it exists to close the accuracy gap BASELINE.md item 3 tracks.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Dekker split constant for fp32 (24-bit mantissa, split at 12 bits)
_SPLIT = jnp.float32(4097.0)


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Fast TwoSum, valid when |a| >= |b| (3 flops)."""
    s = a + b
    return s, b - (s - a)


def split(a):
    """Dekker split: a == hi + lo with hi, lo 12-bit-mantissa exact."""
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA dependency)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(ah, al, bh, bl):
    """Double-float addition (sloppy variant, ~eps^2 relative error)."""
    s, e = two_sum(ah, bh)
    return quick_two_sum(s, e + (al + bl))


def df_neg(ah, al):
    return -ah, -al


def df_from_f64(x):
    """Host float64 -> (hi, lo) fp32 pair (exact split on host)."""
    import numpy as np

    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def df_to_f64(hi, lo):
    import numpy as np

    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
