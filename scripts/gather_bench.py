"""Microbench: batched per-lane costmap gather formulations on device.

The solver's merit eval is dominated by gathering `steps` random cells per
lane from each lane's own flat (H·W) map (~0.125 ms at B=4096, map 64² —
round-2 trace). This measures that op in isolation across formulations to
find the attainable floor.

  PYTHONPATH=/root/repo python scripts/gather_bench.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    B, HW, S = 4096, 64 * 64, 3
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.random((B, HW), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, HW, (B, S)), jnp.int32)

    def sync(x):
        return np.asarray(jax.device_get(x[..., :1]))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        sync(out)
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            out = f(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {dt:8.4f} ms", flush=True)

    timeit("vmap flat[idx] (engine's form)",
           jax.vmap(lambda f, i: f[i]), flat, idx)
    timeit("take_along_axis", lambda f, i: jnp.take_along_axis(f, i, axis=-1),
           flat, idx)
    timeit("global 1-D take",
           lambda f, i: f.reshape(-1)[i + (jnp.arange(B) * HW)[:, None]],
           flat, idx)
    timeit("one-hot einsum",
           lambda f, i: jnp.einsum(
               "bk,bsk->bs", f,
               (i[..., None] == jnp.arange(HW)[None, None, :]
                ).astype(jnp.float32)), flat, idx)
    # 2-level: gather the 64-wide row (contiguous), one-hot the column.
    W = 64
    timeit("row-gather + col-onehot",
           jax.vmap(lambda f, i: jnp.sum(
               f.reshape(64, W)[i // W]
               * ((i % W)[:, None] == jnp.arange(W)[None, :]), axis=-1)),
           flat, idx)
    # Many points per lane: does per-point cost amortize?
    idx48 = jnp.asarray(rng.integers(0, HW, (B, 48)), jnp.int32)
    timeit("vmap flat[idx], 48 pts/lane",
           jax.vmap(lambda f, i: f[i]), flat, idx48)
    # Reference slab: stream the whole source once (bandwidth floor marker).
    timeit("sum(flat) [streams 64 MB]", lambda f, i: jnp.sum(f, -1), flat, idx)

    # Narrower element types: if the gather rate is source-size-sensitive
    # (TLB/page spread rather than pure issue latency), shrinking the source
    # 4x/2x should show it. u8 is the nav2 raw scale (value-exact: the
    # normalized map IS raw/255 in f32, so gather-then-scale reproduces the
    # f32 gather bitwise on nav2-sourced maps).
    flat_u8 = jnp.asarray(rng.integers(0, 256, (B, HW)), jnp.uint8)
    timeit("vmap u8 flat[idx] -> f32*(1/255)",
           jax.vmap(lambda f, i: f[i].astype(jnp.float32) * (1.0 / 255.0)),
           flat_u8, idx)
    flat_bf16 = flat.astype(jnp.bfloat16)
    timeit("vmap bf16 flat[idx] -> f32",
           jax.vmap(lambda f, i: f[i].astype(jnp.float32)), flat_bf16, idx)
    # Map-size sensitivity probe at f32 (the headline runs map 64^2; 128^2
    # measured 78% of the 64^2 rate end-to-end in round 2).
    HW2 = 128 * 128
    flat2 = jnp.asarray(rng.random((B, HW2), dtype=np.float32))
    idx2 = jnp.asarray(rng.integers(0, HW2, (B, S)), jnp.int32)
    timeit("vmap f32 flat[idx], map 128^2",
           jax.vmap(lambda f, i: f[i]), flat2, idx2)
    flat2_u8 = jnp.asarray(rng.integers(0, 256, (B, HW2)), jnp.uint8)
    timeit("vmap u8 flat[idx], map 128^2",
           jax.vmap(lambda f, i: f[i].astype(jnp.float32) * (1.0 / 255.0)),
           flat2_u8, idx2)


if __name__ == "__main__":
    main()
