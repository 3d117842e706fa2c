#!/usr/bin/env python
"""Reference-protocol kernel roofline sweep.

Mirrors `/root/reference/scripts/benchmark_gemv.py:186-235`: sweep
sparsity 0 -> 0.95 in 0.05 bins on the 4096x14336 GEMV (Llama-2-7B
gate/up shape), reporting the sparse kernel vs the dense XLA GEMV and
the theoretical `(1-s) x dense` memory roofline, CSV to stdout/file.

Run on the chip:  python experiments/roofline_sweep.py --out sweep.csv
(slope-timed with dependency-chained scans + device_get sync; see
teal_tpu/utils/bench_utils.py for why).
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.ops import block_gemv
from teal_tpu.utils.bench_utils import bench_chained


def fill(shape, dtype, seed=0, scale=0.05):
    n = int(np.prod(shape))
    flat = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761 + seed)
    vals = (flat >> 16).astype(jnp.float32) / 65536.0 - 0.5
    return (vals * scale).astype(dtype).reshape(shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=4096)
    ap.add_argument("--N", type=int, default=14336)
    ap.add_argument("--block-size", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-short", type=int, default=64)
    ap.add_argument("--n-long", type=int, default=512)
    args = ap.parse_args()

    K, N = args.K, args.N
    w = fill((K, N), jnp.bfloat16, seed=1)
    x0 = fill((1, K), jnp.bfloat16, seed=2)
    G = block_gemv.effective_block_size(args.block_size, K)
    nb = K // G

    def feed(y):
        f = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
        return (x0 + 1e-20 * f.astype(jnp.float32)).astype(jnp.bfloat16)

    def dense_step(x):
        return feed(jnp.matmul(x, w, preferred_element_type=jnp.float32))

    t_dense = bench_chained(dense_step, x0, n_short=args.n_short,
                            n_long=args.n_long)
    dense_gbs = K * N * 2 / t_dense / 1e9
    print(f"dense: {t_dense*1e6:.2f} us  {dense_gbs:.0f} GB/s",
          file=sys.stderr, flush=True)

    rows = ["sparsity,kept_frac,us,dense_us,roofline_us,speedup,"
            "roofline_speedup,kept_gbs"]
    for i in range(20):
        s = i * 0.05
        keep = 1.0 - s
        k_keep = max(1, min(nb, int(round(nb * keep))))

        def step(x, k_keep=k_keep):
            y = block_gemv.block_sparse_matmul(x, w, None, args.block_size,
                                               k_keep / nb)
            return feed(y)

        t = bench_chained(step, x0, n_short=args.n_short,
                          n_long=args.n_long)
        roof = t_dense * max(k_keep / nb, 1e-9)
        kept_gbs = k_keep * G * N * 2 / t / 1e9
        rows.append(f"{s:.2f},{k_keep/nb:.4f},{t*1e6:.2f},"
                    f"{t_dense*1e6:.2f},{roof*1e6:.2f},{t_dense/t:.3f},"
                    f"{t_dense/roof:.3f},{kept_gbs:.0f}")
        print(rows[-1], file=sys.stderr, flush=True)

    csv = "\n".join(rows) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(csv)
    else:
        print(csv)


if __name__ == "__main__":
    main()
