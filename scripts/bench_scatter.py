"""Microbenchmark: encoder-backward scatter-add strategies on TPU.

Drives the round-2 attack on the block-grid backward (BENCH_NOTES.md:48,
VERDICT item 7).  Compares, at the bench's production shapes
(table [95k, 256] f32, ~2.1M scattered rows per step):

  a) XLA scatter-add (current VJP lowering)          — baseline
  b) scatter-add with pre-sorted indices             — does sortedness help?
  c) sort + unsorted-segment-sum                     — jax.ops.segment_sum
  d) row dedup by sort + run-boundary reduce + small scatter
  e) one-hot matmul over a SMALL row range (MXU)     — coarse-level path

Run:  python scripts/bench_scatter.py            (needs the TPU free)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

ROWS = 95_000        # total block-table rows (16-level flagship)
WIDTH = 256          # padded row width (250 used)
M = 1 << 21          # scattered rows per step (~2.1M)


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    # spatially-coherent-ish ids: sorted blocks of random walk, like ray
    # samples hitting nearby blocks
    ids = jnp.cumsum(jax.random.randint(k1, (M,), 0, 3)) % ROWS
    ids = ids.astype(jnp.int32)
    ids_rand = jax.random.randint(k1, (M,), 0, ROWS, dtype=jnp.int32)
    grads = jax.random.normal(k2, (M, WIDTH), jnp.float32)

    @jax.jit
    def xla_scatter(ids, grads):
        return jnp.zeros((ROWS, WIDTH), jnp.float32).at[ids].add(grads)

    @jax.jit
    def xla_scatter_sorted_flag(ids, grads):
        z = jnp.zeros((ROWS, WIDTH), jnp.float32)
        return z.at[ids].add(grads, indices_are_sorted=True, unique_indices=False)

    @jax.jit
    def sort_then_segsum(ids, grads):
        order = jnp.argsort(ids)
        return jax.ops.segment_sum(grads[order], ids[order], ROWS,
                                   indices_are_sorted=True)

    @jax.jit
    def segsum_unsorted(ids, grads):
        return jax.ops.segment_sum(grads, ids, ROWS)

    @jax.jit
    def sort_dedup_scatter(ids, grads):
        order = jnp.argsort(ids)
        sid = ids[order]
        g = grads[order]
        # run-boundary reduce via prefix sums (f32 precision caveat noted)
        csum = jnp.cumsum(g, axis=0)
        is_last = jnp.concatenate([sid[1:] != sid[:-1], jnp.asarray([True])])
        last_idx = jnp.nonzero(is_last, size=M, fill_value=M - 1)[0]
        sums = csum[last_idx]
        sums = jnp.concatenate([sums[:1], sums[1:] - sums[:-1]], axis=0)
        rows = sid[last_idx]
        valid = jnp.concatenate([jnp.asarray([True]), rows[1:] != rows[:-1]])
        return jnp.zeros((ROWS, WIDTH), jnp.float32).at[
            jnp.where(valid, rows, ROWS)  # clipped drop for dups
        ].add(jnp.where(valid[:, None], sums, 0.0), mode="drop")

    R_SMALL = 512

    @jax.jit
    def onehot_matmul(ids, grads):
        # coarse-level path: ids < R_SMALL
        ids_s = ids % R_SMALL
        out = jnp.zeros((R_SMALL, WIDTH), jnp.float32)
        CH = 1 << 17
        def body(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(ids_s, i * CH, CH)
            gs = jax.lax.dynamic_slice_in_dim(grads, i * CH, CH)
            oh = jax.nn.one_hot(sl, R_SMALL, dtype=jnp.bfloat16)
            return acc + jnp.dot(oh.T, gs.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(0, M // CH, body, out)

    results = {}
    for name, fn, idv in [
        ("xla_scatter_coherent", xla_scatter, ids),
        ("xla_scatter_random", xla_scatter, ids_rand),
        ("xla_scatter_sorted_ids", xla_scatter, jnp.sort(ids)),
        ("xla_scatter_sorted_flag", xla_scatter_sorted_flag, jnp.sort(ids)),
        ("segsum_unsorted", segsum_unsorted, ids),
        ("sort_then_segsum", sort_then_segsum, ids),
        ("sort_dedup_scatter", sort_dedup_scatter, ids),
        ("onehot_matmul_512rows", onehot_matmul, ids),
    ]:
        try:
            dt = timed(fn, idv, grads)
            rate = M / dt / 1e6
            results[name] = rate
            print(f"{name:28s} {dt*1e3:8.2f} ms   {rate:7.1f} M rows/s")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")
    return results




def bench_encoder_backward():
    """Integrated comparison at the production bench shape: block_encode
    (XLA scatter-add VJP) vs block_encode_segsum (sort + prefix-sum
    segment reduce + sorted-unique scatter), fwd+bwd wall-clock."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from enerf_tpu.ops.blockgrid import (
        BlockGridMeta, init_block_table, block_encode, block_encode_segsum)

    for name, kw in [("8x4blk3", dict(num_levels=8, level_dim=4, block=3)),
                     ("16x2blk4", dict(num_levels=16, level_dim=2, block=4))]:
        meta = BlockGridMeta(log2_hashmap_size=19, desired_resolution=2048,
                             **kw)
        tbl = init_block_table(jax.random.PRNGKey(0), meta)
        # bench.py production load: 8192 rays x 8 compacted samples x 2
        # renders = 131072 points/step
        n = 131072
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        ct = jax.random.normal(jax.random.PRNGKey(2), (n, meta.output_dim))

        f_base = jax.jit(jax.grad(
            lambda t: jnp.vdot(block_encode(x, t, meta), ct)))
        f_seg = jax.jit(jax.grad(
            lambda t: jnp.vdot(block_encode_segsum(x, t, meta), ct)))
        dt_b = timed(f_base, tbl)
        dt_s = timed(f_seg, tbl)
        print(f"encoder bwd {name}: scatter {dt_b*1e3:7.2f} ms | "
              f"segsum {dt_s*1e3:7.2f} ms | speedup {dt_b/dt_s:5.2f}x "
              f"({n/1e3:.0f}k pts x {meta.num_levels} levels)")


if __name__ == "__main__":
    main()
    bench_encoder_backward()
