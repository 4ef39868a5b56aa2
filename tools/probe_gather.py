"""Micro-probe: what does the mega bitfield gather's cost scale with?

Times extract_fields at the raw-decode codes-gather shape (N=L*F rows,
S=6*seg slots, ~7-bit strides) for several window sizes (MEGA_FR) and
the per-tile fallback.  Wrong-window runs produce wrong VALUES (fields
outside the shrunken window) -- timing-only, never used for decode.

Usage: python tools/probe_gather.py [L] [F]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import jax
    import jax.numpy as jnp
    import ac3acm_tpu.ops.bitgather as BG

    N, S, MB = L * F, 6 * 1408, 1792
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (N, MB), dtype=np.uint8)
    widths1 = rng.integers(0, 17, S).astype(np.int32)
    offs1 = (np.cumsum(widths1) - widths1) % (MB * 8 - 2048)
    offs1 = np.sort(offs1).astype(np.int32)
    offs = jnp.asarray(np.broadcast_to(offs1, (N, S)).copy())
    wid = jnp.asarray(np.broadcast_to(widths1, (N, S)).copy())
    dat = jnp.asarray(data)
    chk = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))

    def timed(tag, fn, reps=5, K=4):
        f = jax.jit(fn)
        out = f(dat, offs, wid)
        _ = int(chk(out))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(K):
                out = f(dat, offs, wid)
            _ = int(chk(out))
            best = min(best, (time.perf_counter() - t0) / K)
        ns = best * 1e9 / (N * S)
        print(f"{tag:20s} {best * 1000:8.2f} ms   {ns:6.2f} ns/slot")

    for fr in (22, 8):
        BG.MEGA = True
        BG.MEGA_FR = fr
        BG._build_mega.cache_clear()
        timed(f"mega fr={fr}", BG.extract_fields)
    BG.MEGA = False
    timed("per-tile", BG.extract_fields)

    # ---- stripped kernel variants: isolate the per-slot cost ----------
    import jax
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = BG.TPG * BG.TS
    U = -(-S // W)
    SP = U * W

    def k_elem(starts_ref, planes_ref, offs_ref, widths_ref, out_ref):
        # no dot, no one-hot: pure elementwise on the same blocks
        for u in range(U):
            offs = offs_ref[0, pl.ds(u, 1)]
            widths = widths_ref[0, pl.ds(u, 1)]
            out_ref[0, pl.ds(u, 1)] = (offs >> 3) + widths

    def k_oh(starts_ref, planes_ref, offs_ref, widths_ref, out_ref):
        # one-hot construction + reduce, no matmul
        import jax.numpy as jnp
        for u in range(U):
            offs = offs_ref[0, pl.ds(u, 1)]
            lo = (offs >> 3) & 127
            lane = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
            oh = (lane == lo).astype(jnp.bfloat16)
            out_ref[0, pl.ds(u, 1)] = jnp.sum(
                oh, axis=0, keepdims=True).astype(jnp.int32)

    def k_dot(fr, starts_ref, planes_ref, offs_ref, widths_ref, out_ref):
        # constant one-hot (no construction) + dot + row-select epilogue
        import jax.numpy as jnp
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
        oh = (lane == 5).astype(jnp.bfloat16)
        for u in range(U):
            offs = offs_ref[0, pl.ds(u, 1)]
            row = starts_ref[0, 0, u]
            win = planes_ref[0, pl.ds(row * 3, fr * 3), :].astype(
                jnp.bfloat16)
            t = jax.lax.dot_general(
                win, oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hi = (offs >> 3) >> 7
            w24 = jnp.zeros((1, W), jnp.float32)
            for c in range(3 * fr):
                w24 = w24 + jnp.where(hi == (c // 3), t[c:c + 1, :], 0.0)
            out_ref[0, pl.ds(u, 1)] = w24.astype(jnp.int32)

    def run_variant(tag, kern, rows):
        grid_spec = pl.GridSpec(
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, 1, U), lambda n: (n, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 3 * rows, 128), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, U, W), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, U, W), lambda n: (n, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, U, W), lambda n: (n, 0, 0)),
        )
        call = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((N, U, W), jnp.int32))

        def fn(dat, offs, wid):
            planes = BG._to_planes(dat, 5)
            o = jnp.concatenate(
                [offs, jnp.broadcast_to(offs[:, -1:], (N, SP - S))], 1)
            w = jnp.concatenate(
                [wid, jnp.zeros((N, SP - S), jnp.int32)], 1)
            o = o.reshape(N, U, W)
            starts = (o.min(axis=2) >> 10)
            starts = jnp.minimum(starts, rows - 22).reshape(N, 1, U)
            return call(starts, planes, o, w.reshape(N, U, W))[:, :, 0]

        timed(tag, fn)

    def k_dot_t(fr, starts_ref, planes_ref, offs_ref, widths_ref, out_ref):
        # slots on the STREAMING (M) dim: oh [W, 128] @ winT [128, 3fr].
        # The lane<->sublane transposes bracket the dot; if the MXU
        # streams >1 row/cycle this beats the weight-fill-bound form.
        import jax.numpy as jnp
        for u in range(U):
            offs = offs_ref[0, pl.ds(u, 1)]               # [1, W]
            offsT = jnp.transpose(offs)                   # [W, 1]
            row = starts_ref[0, 0, u]
            win = planes_ref[0, pl.ds(row * 3, fr * 3), :].astype(
                jnp.bfloat16)
            winT = jnp.transpose(win)                     # [128, 3fr]
            lo = (offsT >> 3) & 127
            hi = (offsT >> 3) >> 7
            lane = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
            oh = (lane == lo).astype(jnp.bfloat16)        # [W, 128]
            t = jax.lax.dot_general(
                oh, winT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [W, 3fr]
            w24 = jnp.zeros((W, 1), jnp.float32)
            for c in range(3 * fr):
                w24 = w24 + jnp.where(hi == (c // 3), t[:, c:c + 1], 0.0)
            out_ref[0, pl.ds(u, 1)] = jnp.transpose(w24.astype(jnp.int32))

    rows = -(-(MB + 2) // 128) + 5
    run_variant("elem-only", k_elem, rows)
    run_variant("onehot-only", k_oh, rows)
    run_variant("dot-only fr=22", partial(k_dot, 20), rows)
    run_variant("dot-transposed", partial(k_dot_t, 20), rows)


if __name__ == "__main__":
    main()
