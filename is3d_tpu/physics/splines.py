"""Natural cubic splines with array-based evaluation.

The reference interpolates delta-f coefficient tables with GSL natural cubic
splines (reference: src/cpp/deltafReader.cpp:300-395).  GSL's ``cspline`` is
the textbook natural cubic spline; we precompute its polynomial coefficients
on the host with a Thomas tridiagonal solve, store them as plain arrays, and
evaluate inside jit with a searchsorted + Horner scheme.  This reproduces GSL
to machine precision while being vectorizable on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CubicSpline:
    """Piecewise cubic S_i(t) = y_i + b_i t + c_i t^2 + d_i t^3, t = x - x_i."""

    x: jnp.ndarray  # knots, (n,)
    y: jnp.ndarray  # values, (n,)
    b: jnp.ndarray  # (n-1,)
    c: jnp.ndarray  # (n-1,)
    d: jnp.ndarray  # (n-1,)

    def __call__(self, xq):
        return evaluate(self, xq)


def _thomas(lower, diag, upper, rhs):
    """Solve a tridiagonal system (all numpy, host-side)."""
    n = len(diag)
    cp = np.empty(n)
    dp = np.empty(n)
    # n == 1 (exactly 3 spline knots -> one interior c): upper is empty
    cp[0] = upper[0] / diag[0] if n > 1 else 0.0
    dp[0] = rhs[0] / diag[0]
    for i in range(1, n):
        m = diag[i] - lower[i - 1] * cp[i - 1]
        cp[i] = upper[i] / m if i < n - 1 else 0.0
        dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / m
    out = np.empty(n)
    out[-1] = dp[-1]
    for i in range(n - 2, -1, -1):
        out[i] = dp[i] - cp[i] * out[i + 1]
    return out


def build_natural_cubic(x, y, dtype=np.float64) -> CubicSpline:
    """Host-side construction of a natural cubic spline (c''=0 at both ends)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.shape[0]
    if n < 2:
        raise ValueError("need at least 2 knots")
    h = np.diff(x)
    if n == 2:
        c_full = np.zeros(2)
    else:
        # interior equations for c_1..c_{n-2}; natural BC: c_0 = c_{n-1} = 0
        lower = h[1:-1]
        diag = 2.0 * (h[:-1] + h[1:])
        upper = h[1:-1]
        slope = np.diff(y) / h
        rhs = 3.0 * (slope[1:] - slope[:-1])
        c_int = _thomas(lower, diag, upper, rhs)
        c_full = np.concatenate([[0.0], c_int, [0.0]])
    b = np.diff(y) / h - h * (c_full[1:] + 2.0 * c_full[:-1]) / 3.0
    d = (c_full[1:] - c_full[:-1]) / (3.0 * h)
    return CubicSpline(
        x=jnp.asarray(x, dtype=dtype),
        y=jnp.asarray(y, dtype=dtype),
        b=jnp.asarray(b, dtype=dtype),
        c=jnp.asarray(c_full[:-1], dtype=dtype),
        d=jnp.asarray(d, dtype=dtype),
    )


def evaluate(spline: CubicSpline, xq):
    """Evaluate the spline at xq (any shape), jit/vmap friendly.

    Queries outside the knot range are clamped to the end intervals (the
    reference only evaluates in-domain; clamping gives graceful extrapolation
    instead of GSL's hard error).

    Dispatch: a traced spline or JAX query evaluates in jnp; a concrete
    spline queried with plain numpy evaluates in numpy (host-side setup
    paths avoid eager per-op JAX compiles this way).
    """
    if (isinstance(xq, (jax.Array, jax.core.Tracer))
            or isinstance(spline.x, jax.core.Tracer)):
        xp, x, y, b, c, d = jnp, spline.x, spline.y, spline.b, spline.c, spline.d
    else:
        xp = np
        x, y, b, c, d = (np.asarray(a) for a in
                         (spline.x, spline.y, spline.b, spline.c, spline.d))
    xq = xp.asarray(xq)
    n = x.shape[0]
    idx = xp.clip(xp.searchsorted(x, xq, side="right") - 1, 0, n - 2)
    t = xq - x[idx]
    return y[idx] + t * (b[idx] + t * (c[idx] + t * d[idx]))
