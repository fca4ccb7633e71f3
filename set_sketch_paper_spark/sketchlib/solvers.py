"""Scalar root-finding / minimization used by the ML estimators.

The reference uses boost.math's toms748_solve (sketch.hpp:363-379) and
brent_find_minima (sketch.hpp:499-519).  scipy is not available in this
environment, so we ship minimal, well-tested pure-Python implementations:
Brent's root finder (equivalent accuracy class to TOMS-748 for these smooth
monotone objectives) and Brent's bounded scalar minimizer (same algorithm
family as boost's brent_find_minima).  If scipy is importable we defer to it.
"""

from __future__ import annotations

import math

try:  # pragma: no cover - environment dependent
    from scipy.optimize import brentq as _scipy_brentq
    from scipy.optimize import minimize_scalar as _scipy_minimize_scalar
except Exception:  # pragma: no cover
    _scipy_brentq = None
    _scipy_minimize_scalar = None

_GOLD = 0.3819660112501051  # (3 - sqrt(5)) / 2


def brentq(f, a: float, b: float, rtol: float = 1e-9, maxiter: int = 200) -> float:
    """Root of f in [a, b] with f(a)*f(b) <= 0 (Brent 1973)."""
    if _scipy_brentq is not None:
        return float(_scipy_brentq(f, a, b, rtol=max(rtol, 4e-16), maxiter=maxiter))
    fa, fb = f(a), f(b)
    if fa == 0.0:
        return a
    if fb == 0.0:
        return b
    if fa * fb > 0:
        raise ValueError(f"f(a) and f(b) must have opposite signs: {fa}, {fb}")
    c, fc = a, fa
    d = e = b - a
    for _ in range(maxiter):
        if fb * fc > 0:
            c, fc = a, fa
            d = e = b - a
        if abs(fc) < abs(fb):
            a, b, c = b, c, b
            fa, fb, fc = fb, fc, fb
        tol = 2.0 * 2.220446049250313e-16 * abs(b) + 0.5 * rtol * max(abs(b), 1e-300)
        xm = 0.5 * (c - b)
        if abs(xm) <= tol or fb == 0.0:
            return b
        if abs(e) >= tol and abs(fa) > abs(fb):
            s = fb / fa
            if a == c:
                p = 2.0 * xm * s
                q = 1.0 - s
            else:
                q = fa / fc
                r = fb / fc
                p = s * (2.0 * xm * q * (q - r) - (b - a) * (r - 1.0))
                q = (q - 1.0) * (r - 1.0) * (s - 1.0)
            if p > 0:
                q = -q
            p = abs(p)
            if 2.0 * p < min(3.0 * xm * q - abs(tol * q), abs(e * q)):
                e, d = d, p / q
            else:
                d = xm
                e = d
        else:
            d = xm
            e = d
        a, fa = b, fb
        b += d if abs(d) > tol else math.copysign(tol, xm)
        fb = f(b)
    return b


def minimize_bounded(f, lo: float, hi: float, xatol: float = 1e-12, maxiter: int = 500) -> float:
    """Argmin of f on [lo, hi] via Brent's method with golden fallback.

    Mirrors boost::math::tools::brent_find_minima as used by the joint ML
    estimators (sketch.hpp:499-519); the xatol default gives more precision
    than the estimators' statistical error.
    """
    if _scipy_minimize_scalar is not None:
        r = _scipy_minimize_scalar(
            f, bounds=(lo, hi), method="bounded", options={"xatol": xatol, "maxiter": maxiter}
        )
        return float(r.x)
    a, b = lo, hi
    x = w = v = a + _GOLD * (b - a)
    fx = fw = fv = f(x)
    d = e = 0.0
    for _ in range(maxiter):
        xm = 0.5 * (a + b)
        tol1 = xatol + 1e-11 * abs(x)
        tol2 = 2.0 * tol1
        if abs(x - xm) <= tol2 - 0.5 * (b - a):
            return x
        use_golden = True
        if abs(e) > tol1:
            # parabolic fit through (x, w, v)
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0:
                p = -p
            q = abs(q)
            etemp = e
            e = d
            if abs(p) < abs(0.5 * q * etemp) and q * (a - x) < p < q * (b - x):
                d = p / q
                u = x + d
                if u - a < tol2 or b - u < tol2:
                    d = math.copysign(tol1, xm - x)
                use_golden = False
        if use_golden:
            e = (b if x < xm else a) - x
            d = _GOLD * e
        u = x + (d if abs(d) >= tol1 else math.copysign(tol1, d))
        fu = f(u)
        if fu <= fx:
            if u >= x:
                a = x
            else:
                b = x
            v, w, x = w, x, u
            fv, fw, fx = fw, fx, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, w = w, u
                fv, fw = fw, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x
