"""Compensated (double-single) summation primitives.

Why this exists: the reference computes losses in float64 and stops on
relative loss deltas as small as 1e-10 (src/optimize.cpp:381-408).  TPUs are
float32-native (float64 is emulated and slow), and a naive f32 sum over ~1e7
squared residuals carries ~1e-5 relative error — the stopping rule would be
noise.  We recover float64-grade accuracy from pure f32 arithmetic with
error-free transformations:

  * ``two_sum``  — Knuth's exact addition: a+b = s + e exactly.
  * ``two_prod`` — Dekker's exact product via 2^12+1 splitting (no FMA needed).
  * a two-stage reduction: a ``fori_loop`` Neumaier-compensated pass over G
    sequential steps of L vector lanes (constant-size graph regardless of n),
    followed by a pairwise-TwoSum tree over the L lane partials.

Total error is O(n * eps^2) relative (~1e-8 even at n=1e9) — matching naive
float64 accumulation.  All ops are elementwise (VPU-friendly) and cost ~1-2
passes over the data.  Host-side finalization adds hi+lo in python float64.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Lane count of the sequential compensated stage.  The fori_loop steps are
# sequential (the compensation carry is a dependency), so wall time is
# (n / LANES) * step_latency: wide lanes matter more than per-step VPU
# occupancy.  1<<18 keeps the ageing-scale eval at ~64 steps while the final
# pairwise tree (log2 L halvings) still compiles instantly.
_LANES = 1 << 18


def two_sum(a, b):
    """Error-free addition: returns (s, e) with s = fl(a+b), a+b = s+e exactly."""
    s = a + b
    bv = s - a
    av = s - bv
    e = (a - av) + (b - bv)
    return s, e


def _split(a):
    """Dekker split of an f32 value into hi+lo with 12/12 bit halves."""
    c = jnp.float32(4097.0) * a  # 2**12 + 1
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free product: returns (p, e) with p = fl(a*b), a*b = p+e exactly."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _tree_sum2_lanes(s, c):
    """Pairwise-TwoSum tree over lane partials (s, c), both (L,) with L a
    power of two.  Returns scalar (hi, lo)."""
    err = jnp.sum(c)  # compensation terms are tiny; plain sum suffices
    while s.shape[0] > 1:
        a, b = s[0::2], s[1::2]
        s, e = two_sum(a, b)
        err = err + jnp.sum(e)
    return s[0], err


def _compensated_reduce(x, square: bool):
    """Sum (or sum of squares) of all elements of x with ~f64 accuracy.

    Stage 1: reshape to (G, L); fori_loop over G with a Neumaier-compensated
    (sum, comp) carry of L lanes.  The graph is O(1) in n.
    Stage 2: TwoSum tree over the L lanes.
    """
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    L = min(_LANES, max(1, n))
    # pad to a multiple of L, and L itself up to a power of two
    Lp = 1
    while Lp < L:
        Lp *= 2
    L = Lp
    G = -(-n // L)
    if G * L != n:
        flat = jnp.pad(flat, (0, G * L - n))
    grid = flat.reshape(G, L)

    def body(g, carry):
        s, c = carry
        v = grid[g]
        if square:
            p, pe = two_prod(v, v)
        else:
            p, pe = v, jnp.zeros_like(v)
        t, e = two_sum(s, p)
        return t, c + (e + pe)

    z = jnp.zeros((L,), jnp.float32)
    s, c = lax.fori_loop(0, G, body, (z, z))
    return _tree_sum2_lanes(s, c)


def sum_squares_ds(x):
    """Compensated sum of squares of all elements. Returns scalar (hi, lo)."""
    return _compensated_reduce(x, square=True)


def sum_abs_ds(x):
    """Compensated sum of |x| of all elements. Returns scalar (hi, lo)."""
    return _compensated_reduce(jnp.abs(x), square=False)


def sum_ds(x):
    """Compensated sum of all elements. Returns scalar (hi, lo)."""
    return _compensated_reduce(x, square=False)


def finalize(hi, lo) -> float:
    """Combine a (hi, lo) pair into a python float (f64) on host."""
    return float(hi) + float(lo)
