"""Pallas fused filterbank kernel.

Fuses the decode hot path -- dequant (q*a)*b, the IMDCT matmul, and the KBD
window/overlap-add epilogue -- into one TPU kernel: the (q, a, b) tiles
stream HBM->VMEM once, both IMDCT matrices stay VMEM-resident, the MXU
consumes the dequantized tile directly, and the windowed output plus the
new 128-float delay leave in one pass.  Versus the XLA graph this removes
the materialization of `freq` and `zd` in HBM (~2.4 KB/row round trip).

Rows are (stream x block x channel) lanes that share a blksw selector; the
OLA delay chaining across blocks stays outside (it is elementwise and
sequential by nature -- see models.decoder._pipeline_body).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T

TILE = 256          # rows per grid step


@lru_cache(maxsize=1)
def _mats():
    z512, d512 = T.imdct512_matrices()
    z256, d256 = T.imdct256_matrices()
    w_long = np.concatenate([z512, d512], axis=1).astype(np.float32)
    w_short = np.concatenate([z256, d256], axis=1).astype(np.float32)
    return w_long, w_short, T.kbd_window().astype(np.float32)


def _kernel(q_ref, a_ref, b_ref, blk_ref, wl_ref, ws_ref, win_ref,
            z_ref, d_ref):
    freq = (q_ref[:] * a_ref[:]) * b_ref[:]
    blk = blk_ref[:]                        # [TILE, 1] float 0/1
    c_long = freq * (1.0 - blk)
    c_short = freq * blk
    zd = (jnp.dot(c_long, wl_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
          + jnp.dot(c_short, ws_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
    win = win_ref[0, :]
    z_ref[:] = zd[:, :256] * win
    d_ref[:] = zd[:, 256:]


def fused_filterbank(q, a, b, blksw):
    """q/a/b [N, 256] f32, blksw [N] bool -> (z_windowed [N,256], d [N,128]).

    out[n] = z_windowed[n] + fold(delay)[n] * win_rev[n] + bias remains for
    the caller (it carries the OLA state across blocks).
    """
    wl, ws, win = _mats()
    n = q.shape[0]
    pad = (-n) % TILE
    if pad:
        zpad = jnp.zeros((pad, 256), q.dtype)
        q = jnp.concatenate([q, zpad])
        a = jnp.concatenate([a, zpad])
        b = jnp.concatenate([b, zpad])
        blksw = jnp.concatenate([blksw, jnp.zeros(pad, blksw.dtype)])
    rows = q.shape[0]
    blkf = blksw.astype(jnp.float32)[:, None]

    grid = (rows // TILE,)
    tile_spec = pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    z, d = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            tile_spec, tile_spec, tile_spec,
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 384), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 384), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 256), jnp.float32),
            jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * 256 * 384 * 2,
            bytes_accessed=rows * (3 * 1024 + 1024 + 512) + 2 * 256 * 384 * 4,
            transcendentals=0,
        ),
    )(q, a, b, blkf, jnp.asarray(wl), jnp.asarray(ws),
      jnp.asarray(win)[None, :])
    return z[:n], d[:n]
