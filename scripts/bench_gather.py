"""Random-row gather microbenchmark: what row rate is ATTAINABLE on this chip?

Round-4 decision instrument (VERDICT item 2).  The march-path forward at the
reference encoder shape (16x2 blk4) spends ~15 ms/render in the field eval,
dominated by the block-row gather `table[rid]` — measured ~70 M rows/s
(~36 GB/s at 512 B rows) in the full step (scripts/perf_breakdown.py).  The
proposed fused march+encode Pallas kernel can only beat XLA's gather if an
explicit DMA mechanism sustains a higher random-row rate.  Mosaic constrains
HBM slices to (8, 128)-tile alignment, so the smallest legal DMA granule is
an 8-ROW GROUP (4 KB at D=128) — per-row DMA is not expressible.  Variants:

  xla_take     jnp.take(table, idx, axis=0)      — the encoder's current path
  pallas_dma   8-row-group HBM->VMEM async copies, W outstanding,
               scalar-prefetched group indices (the fused kernel's only
               alternative mechanism; delivers 8 rows per granule)

Timing: the axon remote executor memoizes identical executions (BENCH_NOTES
round-3 microbench caveat), so each variant is timed as ONE jitted lax.scan
of K data-chained iterations — iteration i's indices depend on iteration
i-1's output, making memoization impossible.

Run on the free chip: python scripts/bench_gather.py
"""

import argparse
import sys
import time

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 30  # chained iterations per timed execution


def timed_chain(step, idx0, iters=3):
    """step: idx -> (next_idx, probe).  Returns seconds per chained iter."""

    @jax.jit
    def chain(idx):
        def body(carry, _):
            nxt, probe = step(carry)
            return nxt, probe
        final, probes = jax.lax.scan(body, idx, None, length=K)
        return final, probes.sum()

    out = chain(idx0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(idx0)
        idx0 = out[0]  # chain ACROSS executions too
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * K)


def make_group_gather(T_groups, D, M_groups, G=512, W=8):
    """Gather M 8-row groups of table[T_groups*8, D] via async DMA."""

    def kernel(idx_ref, tbl_ref, out_ref, sems):
        g = pl.program_id(0)

        def copy(i, slot):
            grp = idx_ref[g * G + i]
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(grp * 8, 8), :],
                out_ref.at[pl.ds(i * 8, 8), :],
                sems.at[slot])

        def prologue(i, c):
            copy(i, i % W).start()
            return c

        jax.lax.fori_loop(0, W, prologue, 0)

        def body(i, c):
            copy(i, i % W).wait()

            @pl.when(i + W < G)
            def _():
                copy(i + W, (i + W) % W).start()

            return c

        jax.lax.fori_loop(0, G, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M_groups // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # table stays in HBM
        out_specs=pl.BlockSpec((G * 8, D), lambda g, idx: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M_groups * 8, D), jnp.float32),
        grid_spec=grid_spec,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=134_272)  # 16 x 8392
    ap.add_argument("--m", type=int, default=1 << 21)
    ap.add_argument("--d", type=int, nargs="*", default=[128])
    ap.add_argument("--windows", type=int, nargs="*", default=[4, 8, 16])
    args = ap.parse_args(argv)

    T = args.rows - args.rows % 8
    M = args.m

    for D in args.d:
        tbl = jax.random.normal(jax.random.PRNGKey(1), (T, D), jnp.float32)
        row_b = D * 4

        def chain_ids(idx, probe):
            # data-dependent, always-zero bump -> unmemoizable, ~free
            bump = (probe > jnp.float32(1e30)).astype(jnp.int32)
            return (idx + 1 + bump) % jnp.int32(T)

        def xla_step(idx):
            out = jnp.take(tbl, idx, axis=0)
            probe = out[0, 0]
            return chain_ids(idx, probe), probe

        idx0 = jax.random.randint(jax.random.PRNGKey(0), (M,), 0, T,
                                  jnp.int32)
        dt = timed_chain(xla_step, idx0)
        print(f"D={D:4d} xla_take        random  "
              f"{M / dt / 1e6:8.1f} M rows/s  "
              f"{M * row_b / dt / 1e9:7.1f} GB/s")

        def xla_sorted_step(idx):
            out = jnp.take(tbl, jnp.sort(idx), axis=0)
            probe = out[0, 0]
            return chain_ids(idx, probe), probe

        dt = timed_chain(xla_sorted_step, idx0)
        print(f"D={D:4d} xla_take sorted(+sortcost) "
              f"{M / dt / 1e6:8.1f} M rows/s  "
              f"{M * row_b / dt / 1e9:7.1f} GB/s")

        def xla_scatter_step(idx):
            # the table-grad backward's mechanism: duplicate-index RMW add
            upd = jnp.ones((M, D), jnp.float32)
            out = jnp.zeros((T, D), jnp.float32).at[idx].add(upd)
            probe = out[0, 0]
            return chain_ids(idx, probe), probe

        dt = timed_chain(xla_scatter_step, idx0)
        print(f"D={D:4d} xla_scatter_add random  "
              f"{M / dt / 1e6:8.1f} M rows/s  "
              f"{M * row_b / dt / 1e9:7.1f} GB/s (update-stream bytes)")

        # DMA variant: M/8 groups deliver the SAME byte volume
        MG = M // 8
        TG = T // 8
        gidx0 = jax.random.randint(jax.random.PRNGKey(2), (MG,), 0, TG,
                                   jnp.int32)
        for W in args.windows:
            try:
                fn = make_group_gather(TG, D, MG, W=W)

                def dma_step(gidx, _fn=fn, _TG=TG):
                    out = _fn(gidx, tbl)
                    probe = out[0, 0]
                    bump = (probe > jnp.float32(1e30)).astype(jnp.int32)
                    return (gidx + 1 + bump) % jnp.int32(_TG), probe

                # correctness first
                ref = jnp.take(tbl, (gidx0[:64, None] * 8
                                     + jnp.arange(8)[None, :]).reshape(-1),
                               axis=0)
                got = fn(gidx0, tbl)[:512]
                ok = bool(jnp.allclose(ref, got))
                dt = timed_chain(dma_step, gidx0)
                print(f"D={D:4d} pallas_dma8 W={W:2d} random "
                      f"{MG / dt / 1e6:8.1f} M grp/s  "
                      f"{MG * 8 * row_b / dt / 1e9:7.1f} GB/s  exact={ok}")
            except Exception as e:  # noqa: BLE001 — bench reports, not dies
                print(f"D={D:4d} pallas_dma8 W={W:2d} FAILED: "
                      f"{str(e).splitlines()[0][:140]}")


if __name__ == "__main__":
    main(sys.argv[1:])
