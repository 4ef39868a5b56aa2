"""Pallas fused steady-decode kernel: matmul + OLA + int16 in one pass.

The scan-free steady pipeline (models.decoder._pipeline_steady) with host
premix reduces each (stream, output-plane) to:

    zd   = freq[n, 256] @ w_long[256, 384]      (long-only chunks)
    out  = zd[:, :256] * win + fold(shift(zd[:, 256:], d0)) * win_r + bias
    i16  = convert_to_int16(out)

XLA materializes zd (4 bytes x 384 per coefficient row) through HBM
between the matmul and the epilogue; this kernel keeps it in VMEM and
writes only the int16 PCM and the 128-float carry-out delay.

Grid blocking: one grid instance per BB streams x all P planes (not one
per (stream, plane) -- 8192 tiny instances put the per-instance DMA
orchestration on the critical path; blocking BB streams amortizes it and
feeds the MXU a [BB*P*n, 256] @ [256, 384] matmul).  Per-row MXU
accumulation is unchanged, so results are bitwise identical across BB.

The delay fold reverses the 128 delay lanes; Mosaic handles the
reversal as a matmul with an exact permutation matrix (f32 x {0,1} is
exact, and the 128 x 128 flops are negligible next to the main matmul).

Numerics: the MXU accumulation order differs from XLA's dot by ~1 ulp
(measured 3e-8 on golden content) -- inside the reference compare-oracle
budget (3.05e-7) but not bit-identical to the XLA steady path; the
dispatcher treats it as an opt-in fast path for the TPU backend.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filterbank import _mats

# When True, pallas_call runs in interpreter mode -- lets CPU tests
# exercise the fused-dispatch wiring (tests/test_pallas_steady.py);
# consulted at trace time, so flip it before building a new pipeline.
INTERPRET = False

# Main-matmul MXU precision (trace-time knob).  HIGHEST = 6-pass bf16
# (f32-exact products); HIGH = 3-pass.  The reversal matmul is pinned at
# HIGHEST regardless: its {0,1} operand must permute exactly.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST

# Manual 3-pass bf16 hi/lo split for the main matmul.  Mosaic rejects
# Precision.HIGH outright (tools/probe_precision.py), so the 3-pass form
# is hand-rolled: x = hi + lo (two bf16 pieces covering the top 16
# mantissa bits), w pre-split the same way, and zd = hi@wlo + lo@whi +
# hi@whi -- dropping only the lo@wlo term (~2^-16 relative per product).
# ~2x on the matmul-bound kernel (3 MXU passes vs 6).
HILO = True

# ---------------------------------------------------------------------------
# THE fused-path accuracy contract -- stated once, here; the dispatch gate
# (parallel.pipeline._gate_once), the driver bench (bench.py
# _assert_fused_matches_xla) and the pytest (tests/test_pallas_steady.py)
# all enforce exactly these two bounds against the XLA steady pipeline on
# full-scale golden-derived content:
#
#   * PCM:   max |fused - xla| <= PCM_LSB_TOL int16 LSB
#   * carry: max |fused - xla| <= CARRY_ATOL in float units
#
# CARRY_ATOL is one PCM LSB expressed in the float domain before int16
# conversion (1/32768): the OLA delay carry is recomputed fresh from each
# block's matmul (no accumulation across blocks), so a bounded per-block
# matmul error stays bounded in the carry, and a carry within 1 float-LSB
# can perturb the NEXT chunk's first block by at most 1 PCM LSB.
#
# Error analysis behind the bounds: the 3-pass HILO kernel drops the
# lo@wlo term and re-rounds the residual into one bf16 piece, ~2^-16
# relative per product -> at the decode output scale (|out - bias| <= 1.0
# after windowing) the absolute error is <= ~1.5e-5 < 1/32768 ~= 3.05e-5,
# i.e. at most 0.5 PCM LSB; measured on golden content: <= 1 LSB PCM,
# carry drift 1.3e-6.  The 6-pass HIGHEST kernel measures ~3e-8.  A
# kernel that ever exceeds the contract is demoted by the gate
# (parallel.pipeline.fused_gate_ok) to the 6-pass HIGHEST form.
PCM_LSB_TOL = 1
CARRY_ATOL = 1.0 / 32768


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@lru_cache(maxsize=1)
def _consts():
    w_long, w_short, win = _mats()
    rev = np.zeros((128, 128), np.float32)
    rev[np.arange(128), 127 - np.arange(128)] = 1.0
    return (w_long.astype(np.float32), win.astype(np.float32),
            win[::-1].copy().astype(np.float32), rev)


def _kernel(hilo, freq_ref, d0_ref, bias_ref, w_ref, win_ref, winr_ref,
            rev_ref, out_ref, dlast_ref):
    # everything stays in the pipeline's block-major [BB, n, P, 256]
    # layout: the matmul is row-order agnostic, the OLA chain slices the
    # n axis, and the int16 PCM is stored in its final layout -- no HBM
    # transposes on either side of the kernel (the [B,n,P,256] <->
    # [B,P,n,256] relayouts cost ~10 GB of HBM traffic at bench batch)
    BB, n, P, _ = freq_ref.shape
    R = BB * n * P
    f = freq_ref[:].reshape(R, 256)
    if hilo:
        # 3-pass bf16 split (see HILO above); w_ref is the pre-split
        # [2, 256, 384] bf16 stack.  Small terms accumulate first.
        fhi, flo = _split_bf16(f)
        whi, wlo = w_ref[0], w_ref[1]
        zd = (jnp.dot(fhi, wlo, preferred_element_type=jnp.float32)
              + jnp.dot(flo, whi, preferred_element_type=jnp.float32))
        zd = zd + jnp.dot(fhi, whi, preferred_element_type=jnp.float32)
    else:
        zd = jnp.dot(f, w_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=MATMUL_PRECISION)            # [R, 384]
    z = zd[:, :256]
    d = zd[:, 256:]                                          # [R, 128]
    d4 = d.reshape(BB, n, P, 128)
    dchain = jnp.concatenate([d0_ref[:, :1], d4[:, :-1]], axis=1)
    dchain2 = dchain.reshape(R, 128)
    drev = jnp.dot(dchain2, rev_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)      # exact reversal
    dfold = jnp.concatenate([dchain2, drev], axis=1)         # [R, 256]
    # bias arrives pre-broadcast as one f32 per output row ([R, 1]): a
    # [bb, n] -> [bb, n, 1, 1] broadcast would move n from lanes to a
    # batch dim, which Mosaic cannot relayout in-kernel
    out = z * win_ref[0] + dfold * winr_ref[0] + bias_ref[:]
    x = (out - 384.0) * 32768.0
    i16 = jnp.clip(jnp.round(x), -32768.0, 32767.0).astype(jnp.int16)
    out_ref[:] = i16.reshape(BB, n, P, 256)
    # the carry-out is d's LAST row; the output tile is 8 sublanes, and a
    # 1-row -> 8-row vector.broadcast fails to lower on Mosaic for some n,
    # so fill the tile with the last 8 rows (n >= 8: static slice) or a
    # row-tiled copy (n < 8); the wrapper slices the row holding d[n-1]
    if n >= 8:
        dlast_ref[:] = d4[:, n - 8:n]          # d[n-1] at row 7
    else:
        reps = -(-8 // n)
        tiled = jnp.concatenate([d4] * reps, axis=1)[:, :8]
        dlast_ref[:] = tiled                   # d[n-1] at row n-1


def fused_steady(freq, d0, bias, bb: int | None = None,
                 hilo: bool | None = None):
    """freq [B, n, P, 256] premixed long-only planes in the pipeline's
    block-major layout; d0 [B, P, 128] carry; bias [B, n] (the per-block
    state bias, 384.0 normally).

    -> (pcm int16 [B, n, P, 256], d_last [B, P, 128])

    P = nch_out planes in output order (LFE first when present -- the
    caller lays them out; every plane has the same long-block chain).
    bb: streams per grid instance (defaults to the largest of 8/4/2/1
    dividing B that keeps the instance's VMEM footprint in budget).
    hilo: kernel variant -- 3-pass hi/lo split vs 6-pass HIGHEST (see
    the contract above); None reads the module default at trace time.
    Callers that cache traced pipelines must key their cache on this
    (parallel.pipeline does), or a demotion would keep serving a stale
    HILO compilation.
    """
    w_long, win, win_r, rev = _consts()
    B, n, P, _ = freq.shape
    budget = 10 * 2 ** 20     # ~16 B/coefficient through VMEM (freq in +
    #                           zd + dfold + i16 out), under ~16 MB/core
    if bb is None:
        bb = next((c for c in (8, 4, 2, 1)
                   if B % c == 0 and c * P * n * 256 * 16 <= budget), None)
        if bb is None and P > 1:
            # even one stream's P planes overflow VMEM: planes are
            # independent up to the output relayout, so fold them into the
            # stream axis and recurse at P=1 (rare: only for very long
            # chunks, where the one-off relayout is amortized)
            pcm, dlast = fused_steady(
                jnp.moveaxis(freq, 2, 1).reshape(B * P, n, 1, 256),
                d0.reshape(B * P, 1, 128),
                jnp.repeat(bias, P, axis=0), hilo=hilo)
            pcm = jnp.moveaxis(pcm.reshape(B, P, n, 256), 1, 2)
            return pcm, dlast.reshape(B, P, 128)
        if bb is None:
            bb = 1            # single plane over budget: let Mosaic try
    assert B % bb == 0
    # Mosaic wants (8, 128)-aligned trailing block dims: the tiny per-plane
    # carry rows ride in 8-row sublane tiles (row 0 is the data)
    d0_pad = jnp.broadcast_to(d0[:, None], (B, 8, P, 128))
    # one bias value per output row (b, n, p) -- see the kernel comment
    bias_rows = jnp.broadcast_to(bias[:, :, None],
                                 (B, n, P)).reshape(B * n * P, 1)

    hilo = bool(HILO) if hilo is None else bool(hilo)
    if hilo:
        whi = w_long.astype(np.float32).astype(jnp.bfloat16)
        wlo = (w_long - np.asarray(whi, np.float32)).astype(jnp.bfloat16)
        w_arg = jnp.stack([whi, wlo])                     # [2, 256, 384]
        w_spec = pl.BlockSpec((2, 256, 384), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_arg = jnp.asarray(w_long)
        w_spec = pl.BlockSpec((256, 384), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    grid = (B // bb,)
    out, dlast = pl.pallas_call(
        partial(_kernel, hilo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n, P, 256), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 8, P, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * n * P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, n, P, 256), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 8, P, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, P, 256), jnp.int16),
            jax.ShapeDtypeStruct((B, 8, P, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * n * 256 * 384,
            bytes_accessed=B * P * n * (1024 + 512) + 256 * 384 * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(freq, d0_pad, bias_rows,
      w_arg, jnp.asarray(win)[None], jnp.asarray(win_r)[None],
      jnp.asarray(rev))
    # the carry-out row matches the kernel's dlast tile fill (see _kernel)
    row = 7 if n >= 8 else n - 1
    return out, dlast[:, row]
