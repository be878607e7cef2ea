"""Device microbenchmarks for the hot-set dense-counting path primitives.

Validates, on the real chip, the cost model behind ops/hotset.py before/while
it exists: per-group (G=256) costs of the one-hot weight einsum, the W @ M
count matmul, the dense top_k, and the candidate hot-count element gather.
Amortized fori_loop timing as in probe_microbench.py.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

G, L, H, K = 256, 256, 512, 32
ITERS = 128


def timed(name, fn, *args):
    jax.device_get(np.array(0))  # tunnel warm
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / ITERS
        best = dt if best is None else min(best, dt)
    print(f"{name:52s} {best*1e3:8.3f} ms/group-op", flush=True)


def loop(body):
    def run(*args):
        def step(i, s):
            return s + body(i, *args)
        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0))
    return jax.jit(run)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    for P in (10240, 102400):
        # dense top_k over [G, P]
        x = jnp.asarray(rng.standard_normal((G, P), dtype=np.float32))
        def topk_body(i, x):
            v, idx = jax.lax.top_k(x + i.astype(jnp.float32), K)
            return v[0, 0] + idx[0, 0].astype(jnp.float32)
        timed(f"top_k [G={G}, P={P}] k={K}", loop(topk_body), x)

        # W @ M count matmul
        W = jnp.asarray(rng.random((G, H), dtype=np.float32))
        M = jnp.asarray((rng.random((H, P)) < 0.1).astype(np.float32))
        Mb = M.astype(jnp.bfloat16)
        def mm_body(i, W, Mb):
            c = jnp.dot(W + i.astype(jnp.float32), Mb.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            return c[0, 0]
        timed(f"W@M [G={G}, H={H}, P={P}] f32", loop(mm_body), W, Mb)

        # candidate hot-count gather: [G, cap] element take_along_axis
        for cap in (512, 2048):
            dense = jnp.asarray(rng.standard_normal((G, P), dtype=np.float32))
            idxs = jnp.asarray(
                rng.integers(0, P, size=(G, cap)).astype(np.int32))
            def ga_body(i, dense, idxs):
                g = jnp.take_along_axis(dense, (idxs + i) % P, axis=1)
                return g[0, 0]
            timed(f"take_along [G={G}, cap={cap}] from [G, P={P}]",
                  loop(ga_body), dense, idxs)

    # one-hot weight einsum: W[g,h] = sum_l (offs==hot_starts[h]) * w
    offs = jnp.asarray(rng.integers(0, H * 4, size=(G, L)).astype(np.int32))
    w = jnp.asarray(rng.integers(1, 50, size=(G, L)).astype(np.float32))
    hot_starts = jnp.asarray((np.arange(H) * 4).astype(np.int32))
    def wein_body(i, offs, w, hot_starts):
        ind = (offs[:, :, None] == hot_starts[None, None, :] + i).astype(
            jnp.float32)
        W = jnp.einsum("glh,gl->gh", ind, w,
                       preferred_element_type=jnp.float32)
        return W[0, 0]
    timed(f"W one-hot einsum [G={G}, L={L}, H={H}]",
          loop(wein_body), offs, w, hot_starts)

    # cold-count compare for hot candidates: [G, K, cap]
    cap = 512
    rows = jnp.asarray(rng.integers(0, 10240, size=(G, cap)).astype(np.uint32))
    wexp = jnp.asarray(rng.integers(1, 50, size=(G, cap)).astype(np.int32))
    hits = jnp.asarray(rng.integers(0, 10240, size=(G, K)).astype(np.uint32))
    def cc_body(i, rows, wexp, hits):
        eq = rows[:, None, :] == (hits[:, :, None] + i.astype(jnp.uint32))
        cc = (eq * wexp[:, None, :]).sum(axis=2)
        return cc[0, 0].astype(jnp.float32)
    timed(f"cold-compare [G={G}, K={K}, cap={cap}]",
          loop(cc_body), rows, wexp, hits)


if __name__ == "__main__":
    main()
