"""Multi-output vs single-output gather kernel comparison."""
import functools, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from teal_tpu.utils.bench_utils import bench_chained

SUB, LANES = 8, 128

def report(name, secs, nbytes):
    print(f"{name:40s} {secs*1e6:9.2f} us   {nbytes/secs/1e9:8.1f} GB/s", flush=True)

def make_inputs(K, Ns, G, keep):
    nb = K // G
    kk = max(1, int(round(nb * keep)))
    keys = jax.random.split(jax.random.PRNGKey(0), len(Ns) + 1)
    ws = [jax.random.normal(k, (K, N), jnp.bfloat16) for k, N in zip(keys[1:], Ns)]
    idx = jnp.asarray(np.sort(np.random.default_rng(0).choice(nb, kk, replace=False)), jnp.int32)
    xpack0 = jax.random.normal(keys[0], (kk, SUB, LANES), jnp.bfloat16)
    return idx, xpack0, ws, kk

def v_multi(K, Ns, G, keep):
    idx, xpack0, ws, kk = make_inputs(K, Ns, G, keep)
    n_w = len(ws)
    def kernel(idx_ref, x_ref, *refs):
        i = pl.program_id(0)
        w_refs, o_refs = refs[:n_w], refs[n_w:]
        xi = x_ref[0][:, :G]
        for w_ref, o_ref in zip(w_refs, o_refs):
            @pl.when(i == 0)
            def _(o_ref=o_ref):
                o_ref[...] = jnp.zeros_like(o_ref)
            o_ref[...] += jax.lax.dot_general(
                xi, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(kk,),
            in_specs=[pl.BlockSpec((1, SUB, LANES), lambda i, ir: (i, 0, 0))]
            + [pl.BlockSpec((G, N), lambda i, ir: (ir[i], 0)) for N in Ns],
            out_specs=[pl.BlockSpec((SUB, N), lambda i, ir: (0, 0)) for N in Ns]),
        out_shape=[jax.ShapeDtypeStruct((SUB, N), jnp.float32) for N in Ns])
    def step(xp):
        os_ = call(idx, xp, *ws)
        feed = sum(o.astype(jnp.float32).sum() for o in os_)
        return xpack0 + (1e-20 * feed).astype(jnp.bfloat16)
    return step, xpack0, kk * G * sum(Ns) * 2

def v_separate(K, Ns, G, keep):
    idx, xpack0, ws, kk = make_inputs(K, Ns, G, keep)
    def kernel(idx_ref, x_ref, w_ref, o_ref):
        i = pl.program_id(0)
        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += jax.lax.dot_general(
            x_ref[0][:, :G], w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    def one(w, N):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(kk,),
                in_specs=[pl.BlockSpec((1, SUB, LANES), lambda i, ir: (i, 0, 0)),
                          pl.BlockSpec((G, N), lambda i, ir: (ir[i], 0))],
                out_specs=pl.BlockSpec((SUB, N), lambda i, ir: (0, 0))),
            out_shape=jax.ShapeDtypeStruct((SUB, N), jnp.float32))
    calls = [one(w, N) for w, N in zip(ws, Ns)]
    def step(xp):
        feed = 0.0
        for call, w in zip(calls, ws):
            o = call(idx, xp, w)
            feed = feed + o.astype(jnp.float32).sum()
        return xpack0 + (1e-20 * feed).astype(jnp.bfloat16)
    return step, xpack0, kk * G * sum(Ns) * 2

def main():
    print("device:", jax.devices()[0], flush=True)
    for K, Ns, G, keep in [(4096, (4096, 4096, 4096), 32, 0.5),
                           (4096, (11008, 11008), 32, 0.5)]:
        print(f"--- K={K} Ns={Ns} G={G} keep={keep}", flush=True)
        for name, mk in [("multi", lambda: v_multi(K, Ns, G, keep)),
                         ("separate x3", lambda: v_separate(K, Ns, G, keep))]:
            try:
                step, x0, nbytes = mk()
                t = bench_chained(step, x0, n_short=64, n_long=512, reps=3)
                report(name, t, nbytes)
            except Exception as e:
                print(f"{name} FAILED: {type(e).__name__} {str(e)[:160]}", flush=True)

if __name__ == "__main__":
    main()
