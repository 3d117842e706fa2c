import jax, jax.numpy as jnp
from teal_tpu.ops import block_gemv
K, N, G = 4096, 4096, 32
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (1, K), jnp.bfloat16)
w = jax.random.normal(key, (K, N), jnp.bfloat16)
print("compiling block_sparse_matmul (top-k path)...", flush=True)
y = jax.device_get(block_gemv.block_sparse_matmul(x, w, None, G, 0.5))
print("top-k path OK", flush=True)
s = block_gemv.group_scores(x, G)
thr = jnp.sort(s)[s.shape[0] // 2]
print("compiling project_many (fused select)...", flush=True)
(yt,) = block_gemv.project_many(x[:, None, :], [w], G, 0.625, threshold=thr)
yt = jax.device_get(yt)
print("fused select path OK", flush=True)
from teal_tpu.ops.sparsify import sparsify_groups
import numpy as np
ref = jax.device_get(jnp.matmul(sparsify_groups(x, G, 0.625, threshold=thr), w,
                 preferred_element_type=jnp.float32))
rel = np.linalg.norm(yt.astype(np.float32) - ref) / np.linalg.norm(ref)
print("rel err:", rel, flush=True)
assert rel < 2e-2
print("FUSED-KERNEL-OK")
