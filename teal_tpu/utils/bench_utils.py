"""Trustworthy on-device timing.

The execution environment can memoize repeated executions with identical
(executable, inputs), and XLA hoists loop-invariant computations — both make
naive repeat-timing loops report impossible numbers (observed: "52 PFLOP/s"
matmuls). `bench_chained` defends against both:

  - the op runs inside a `lax.scan` whose carry feeds each iteration's input
    from the previous iteration's output (no LICM, no elision);
  - the two timed calls use different fresh inputs and different static
    lengths; the per-step time is the SLOPE (t_long - t_short)/(n_long -
    n_short), cancelling dispatch/RPC fixed overhead (measured at ~25 ms
    per launch on the tunneled chip — choose n_long so the signal
    n_long*per_step_time comfortably exceeds launch jitter);
  - a linearity check flags residual caching (negative or wildly sublinear
    slope).

This replaces the reference's CUDA-event + L2-flush harness
(`kernels/kernel_utils.py:4-50`) with TPU-appropriate machinery.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def bench_chained(
    step_fn: Callable,
    carry0,
    *,
    n_short: int = 128,
    n_long: int = 1024,
    reps: int = 5,
) -> float:
    """Median per-step seconds of `step_fn(carry) -> carry`.

    `step_fn` must return a carry of the same structure such that every
    value the op consumes depends on the previous step's output.
    """

    def make(n):
        @jax.jit
        def run(c):
            def body(c, _):
                return step_fn(c), ()

            c, _ = jax.lax.scan(body, c, None, length=n)
            return c

        return run

    run_s, run_l = make(n_short), make(n_long)

    def fresh(i):
        # Perturb the carry so no two timed calls share input buffers.
        return jax.tree.map(
            lambda a: a + jnp.asarray(1e-6 * (i + 1), a.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            carry0,
        )

    # compile + warm
    jax.block_until_ready(run_s(fresh(0)))
    jax.block_until_ready(run_l(fresh(1)))

    slopes = []
    for r in range(reps):
        cs, cl = fresh(2 + 2 * r), fresh(3 + 2 * r)
        t0 = time.perf_counter()
        jax.block_until_ready(run_s(cs))
        t1 = time.perf_counter()
        jax.block_until_ready(run_l(cl))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_long - n_short))
    slopes.sort()
    slope = slopes[len(slopes) // 2]
    if slope <= 0:
        raise RuntimeError(
            f"non-positive per-step slope {slope:.3e}s — caching suspected; "
            "make step_fn's input depend on its previous output"
        )
    return slope


def chain_matmul_step(w, x0):
    """Standard chained-GEMV step: y = x @ w, next x perturbed by y."""

    def step(x):
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        k = x.shape[-1]
        feed = y[..., :k] if y.shape[-1] >= k else jnp.pad(
            y, [(0, 0)] * (y.ndim - 1) + [(0, k - y.shape[-1])]
        )
        return (x0 + 1e-20 * feed).astype(x.dtype)

    return step
