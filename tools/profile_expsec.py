"""Micro-profile of the exponent strategy/fold/encode section of
models.encoder._frame_core (the part the stage profiler doesn't cover).

Usage: python tools/profile_expsec.py [channels] [batch] [K]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import ac3acm_tpu.models.encoder as E
import ac3acm_tpu.tables as T

K = 8
LAT = [0.0]


def timeit(name, fn, *args):
    chk = jax.jit(lambda t: sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                for x in jax.tree.leaves(t)))
    out = fn(*args)
    _ = float(chk(out))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*args)
        _ = float(chk(out))
        best = min(best, time.perf_counter() - t0)
    ms = max(best - LAT[0], 0.0) / K * 1000
    print(f"{name:40s} {ms:8.2f} ms")
    return ms


def main():
    global K
    ch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kbps = 640 if ch == 6 else 192
    cfg = E.make_config(48000, kbps * 1000, ch)
    nch, nf = cfg.channels, cfg.nfchans
    nb = cfg.nb_coefs
    nbv = jnp.asarray(np.array(nb, np.int32))
    bins = np.arange(256)

    rng = np.random.default_rng(0)
    exp = jnp.asarray(rng.integers(0, 25, (B, 6, nch, 256), np.int32))
    jax.block_until_ready(exp)

    triv = jax.jit(lambda x: x + 1)
    chk = jax.jit(lambda x: jnp.sum(x))
    y = triv(exp); _ = float(chk(y))
    lat = 1e9
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(K):
            y = triv(exp)
        _ = float(chk(y))
        lat = min(lat, time.perf_counter() - t0)
    LAT[0] = lat
    print(f"{'latency':40s} {lat * 1000:8.2f} ms")

    @jax.jit
    def stage_strategy(exp):
        diff = jnp.sum(jnp.abs(exp[:, 1:] - exp[:, :-1]), axis=-1)
        new = jnp.concatenate(
            [jnp.ones((B, 1, nch), bool), diff > 1000], axis=1)
        nxt_arr = []
        running = jnp.full((B, nch), 6)
        for i in range(5, -1, -1):
            nxt_arr.append(running)
            running = jnp.where(new[:, i], i, running)
        nxt_arr = nxt_arr[::-1]
        strat = []
        for i in range(6):
            runlen = nxt_arr[i] - i
            code = jnp.where(runlen == 1, T.EXP_D45,
                             jnp.where(runlen <= 3, T.EXP_D25, T.EXP_D15))
            s_i = jnp.where(new[:, i], code, T.EXP_REUSE)
            strat.append(s_i)
        return jnp.stack(strat, axis=1), new

    strat, new = stage_strategy(exp)
    timeit("strategy", stage_strategy, exp)

    @jax.jit
    def stage_fold(exp, new):
        run_id = []
        rid = jnp.zeros((B, nch), jnp.int32)
        for i in range(6):
            rid = jnp.where(new[:, i], i, rid)
            run_id.append(rid)
        run_id = jnp.stack(run_id, axis=1)
        folded = exp
        for i in range(6):
            same = (run_id == run_id[:, i:i + 1])
            m = jnp.where(same[..., None], exp, 25)
            fmin = jnp.min(m, axis=1)
            live = jnp.asarray(bins)[None, None, :] < nbv[None, :, None]
            folded = folded.at[:, i].set(
                jnp.where(live, fmin, exp[:, i]))
        return folded

    folded = stage_fold(exp, new)
    timeit("exponent_min fold (current)", stage_fold, exp, new)

    @jax.jit
    def stage_fold_scan(exp, new):
        # backward run-min then forward propagate: 10 elementwise steps
        rmin = exp[:, 5]
        outs = [rmin]
        for i in range(4, -1, -1):
            rmin = jnp.where(new[:, i + 1][..., None],
                             exp[:, i], jnp.minimum(exp[:, i], rmin))
            outs.append(rmin)
        outs = outs[::-1]
        fold = outs[0]
        res = [fold]
        for i in range(1, 6):
            fold = jnp.where(new[:, i][..., None], outs[i], fold)
            res.append(fold)
        folded = jnp.stack(res, axis=1)
        live = jnp.asarray(bins)[None, None, None, :] < nbv[None, None, :, None]
        return jnp.where(live, folded, exp)

    f2 = stage_fold_scan(exp, new)
    print("fold equal:", bool(jnp.all(f2 == folded)))
    timeit("exponent_min fold (scan form)", stage_fold_scan, exp, new)

    @jax.jit
    def stage_encexp(folded, strat):
        enc_exp = jnp.zeros_like(folded)
        exp_bits = jnp.zeros((B,), jnp.int32)
        fbw_exp = folded[:, :, :nf]
        for g, scode in ((1, T.EXP_D15), (2, T.EXP_D25), (4, T.EXP_D45)):
            e_s, bits_s = E._encode_exp_static(fbw_exp, nb[0], g)
            sel = strat[:, :, :nf] == scode
            enc_exp = enc_exp.at[:, :, :nf].set(
                jnp.where(sel[..., None], e_s, enc_exp[:, :, :nf]))
            exp_bits = exp_bits + jnp.sum(sel, axis=(1, 2)) * bits_s
        for i in range(1, 6):
            reuse = strat[:, i] == T.EXP_REUSE
            enc_exp = enc_exp.at[:, i].set(
                jnp.where(reuse[..., None], enc_exp[:, i - 1],
                          enc_exp[:, i]))
        return enc_exp, exp_bits

    timeit("encode_exp (3 scans + reuse prop)", stage_encexp, folded, strat)

    def one_scan(g):
        @jax.jit
        def f(folded):
            return E._encode_exp_static(folded[:, :, :nf], nb[0], g)[0]
        return f

    for g in (1, 2, 4):
        timeit(f"  _encode_exp_static g={g}", one_scan(g), folded)


if __name__ == "__main__":
    main()
