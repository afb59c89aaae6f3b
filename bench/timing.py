"""Relay-safe timing utilities shared by every probe (see bench/__init__.py).

Two idioms:

* ``slope_time`` — least-squares fit of ``total = overhead + slope * iters``
  over a grid of scan-chain lengths; the slope is the true steady-state
  per-iteration device time, independent of per-call relay overhead. Use for
  kernel/op probes where the body is a pure carry -> carry function.
* ``chain_slope`` / ``fns_slope`` — two-point variant for bodies that are
  cheaper to express as prebuilt jitted chain functions (model-level probes).
"""

import time

import jax
import numpy as np


def slope_time(name, body, c0, flops_per_iter, iter_grid=(8, 32, 128), reps=2,
               label_width=52):
    """Fit total = a + b*iters over iter_grid; print and return (b, a).

    ``body``: carry -> carry (same shape/dtype); chained via lax.scan so the
    device runs iters dependent steps per call."""
    import jax.numpy as jnp

    times = {}
    for iters in iter_grid:
        g = jax.jit(
            lambda c, it=iters: jax.lax.scan(
                lambda cc, _: (body(cc), None), c, None, length=it
            )[0].astype(jnp.float32).mean()
        )
        s = float(np.asarray(g(c0)))  # warm + compile + sync
        assert np.isfinite(s), name
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(g(c0)))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    its = np.array(sorted(times))
    ts = np.array([times[i] for i in its])
    b, a = np.polyfit(its, ts, 1)  # slope, intercept
    rate = flops_per_iter / b / 1e12
    print(
        f"{name:{label_width}s} slope {b*1e3:8.3f} ms/iter  {rate:6.1f} TFLOP/s"
        f"   (fitted overhead {a*1e3:6.1f} ms; naive@{its[-1]} "
        f"{ts[-1]/its[-1]*1e3:7.3f} ms -> {flops_per_iter/(ts[-1]/its[-1])/1e12:5.1f} TF/s)",
        flush=True,
    )
    return b, a


def _two_point(name, runs, iter_counts, unit, label_width):
    ts = []
    for run in runs:
        t0 = time.perf_counter(); run(); _ = time.perf_counter() - t0
        t0 = time.perf_counter(); run(); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); run(); t2 = time.perf_counter() - t0
        ts.append(min(t1, t2))
    per = (ts[1] - ts[0]) / (iter_counts[1] - iter_counts[0])
    print(f"{name:{label_width}s} {per * 1e3:9.3f} ms/{unit}", flush=True)
    return per


def chain_slope(name, make_chain, args, iter_counts=(2, 8), unit="iter",
                label_width=28):
    """Two-point slope over chains built by ``make_chain(iters)``; arrays
    ride as jit args (closure constants blow the remote-compile request-size
    limit)."""
    runs = []
    for it in iter_counts:
        g = jax.jit(make_chain(it))
        runs.append(lambda g=g: float(np.asarray(g(*args))))
    return _two_point(name, runs, iter_counts, unit, label_width)


def fns_slope(name, fns, args, iter_counts=(2, 8), unit="iter",
              label_width=28):
    """Two-point slope over prebuilt (already jitted) chain functions, one
    per iteration count."""
    runs = [lambda g=g: float(np.asarray(g(*args))) for g in fns]
    return _two_point(name, runs, iter_counts, unit, label_width)
