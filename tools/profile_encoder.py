"""Stage-level timing of the device encode step on the live backend.

Times each stage of models.encoder._frame_body (single frame, batched
lanes) plus the fused multi-frame scan and the device packer, each as its
own jit with a checksum fetch (the axon tunnel returns early from
block_until_ready, so only a value fetch observes completion).

Usage: python tools/profile_encoder.py [channels] [batch] [frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ac3acm_tpu.models.encoder import (EncoderConfig, make_config,
                                       encode_pipeline_packed, _frame_body)
import ac3acm_tpu.models.encoder as E
import ac3acm_tpu.ops.alloc as AL
import ac3acm_tpu.tables as T
from ac3acm_tpu.ops.mdct import mdct512


def timeit(name, fn, *args, reps=10):
    chk = jax.jit(lambda t: sum(jnp.sum(jnp.asarray(x, jnp.float32))
                                for x in jax.tree.leaves(t)))
    out = fn(*args)
    _ = float(chk(out))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(chk(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best * 1000:8.2f} ms")
    return best


def main():
    ch = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kbps = 640 if ch == 6 else 192
    cfg = make_config(48000, kbps * 1000, ch)
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((F, B, 1536, ch)) * 8000).astype(np.int16)
    dev = jax.device_put(jnp.asarray(pcm))
    last = jnp.zeros((B, ch, 256), jnp.int32)
    csnr = jnp.full((B,), 40, jnp.int32)
    jax.block_until_ready((dev, last, csnr))

    run = _frame_body(cfg)
    one = dev[0].astype(jnp.int32)

    # full packed pipeline (the bench path)
    fn = encode_pipeline_packed(cfg)
    t_full = timeit("encode+pack scan (F frames)", fn, dev, last, csnr)
    print(f"{'  -> per frame':34s} {t_full / F * 1000:8.2f} ms")

    # single-frame body end to end
    body = jax.jit(lambda s, l, c: run(s, l, c))
    timeit("frame body (1 frame)", body, one, last, csnr)

    # stages
    nch = cfg.channels
    nf = cfg.nfchans

    @jax.jit
    def stage_mdct(samples, lastv):
        cur = samples.reshape(B, 6, 256, nch).transpose(0, 1, 3, 2)
        prev = jnp.concatenate([lastv[:, None], cur[:, :5]], axis=1)
        w, _, es = E.window_norm_block(prev, cur)
        coef = mdct512(w)
        return E.extract_exponents(coef, es)

    exp, coef = stage_mdct(one, last)
    timeit("window+mdct+exponents", stage_mdct, one, last)

    # masking chain from encoded exponents
    nb = cfg.nb_coefs
    nbv = jnp.asarray(np.array(nb, np.int32))
    bins = np.arange(256)
    hth_row = jnp.asarray(T.HTH[:, cfg.fscod].astype(np.int32))

    @jax.jit
    def stage_mask(enc_exp):
        live = jnp.asarray(bins)[None, None, None, :] < nbv[None, None, :, None]
        psd = jnp.where(live, 3072 - (enc_exp.astype(jnp.int32) << 7), 0)
        ends = jnp.broadcast_to(nbv, (B, 6, nch))
        bnd = AL.band_psd(psd, ends)
        is_lfe = jnp.zeros((B, 6, nch), bool)
        exc = AL.excitation(bnd, int(T.FGAINTAB[4]), int(T.SGAINTAB[1]),
                            int(T.FDECAYTAB[1]) >> cfg.halfratecod,
                            int(T.SDECAYTAB[2]) >> cfg.halfratecod, is_lfe)
        mask = AL.masking_curve(bnd, exc, int(T.DBKNEETAB[2]),
                                hth_row[None, None, None, :])
        return psd, mask, AL.exp_histogram(enc_exp.astype(jnp.int32), ends)

    enc_exp = jnp.clip(exp, 0, 24)
    psd, mask, pref = stage_mask(enc_exp)
    timeit("psd+masking+histogram", stage_mask, enc_exp)

    floor = int(T.FLOORTAB[4])

    @jax.jit
    def stage_search(pref, mask):
        def bits_used(snro):
            mant = AL.bits_for_offsets(pref, mask,
                                       snro[..., None, None, None], floor)
            return jnp.sum(mant, axis=-1)
        total = jnp.zeros((B,), jnp.int32)
        lo = jnp.full((B,), -1)
        hi = jnp.full((B,), 63)
        for _ in range(7):
            mid = (lo + hi + 1) >> 1
            okm = (40000 - bits_used(((mid - 15) << 4) << 2)) >= 0
            lo = jnp.where(okm, mid, lo)
            hi = jnp.where(okm, hi, mid - 1)
        for _ in range(5):
            okm = (40000 - bits_used(((lo - 15) << 4) << 2)) >= 0
            lo = jnp.where(okm, lo, lo)
        return lo

    timeit("snr binary search (12 evals)", stage_search, pref, mask)

    ends = jnp.broadcast_to(nbv, (B, 6, nch))
    starts = jnp.zeros_like(ends)

    @jax.jit
    def stage_bap_quant(psd, mask, coef, enc_exp):
        bap = AL.bap_from_mask(psd, mask,
                               jnp.zeros((B, 1, 1, 1), jnp.int32),
                               floor, starts, ends)
        q = E.quantize(coef, enc_exp.astype(jnp.int32),
                       jnp.zeros((B, 6, nch), jnp.int32), bap)
        return bap, q

    bap, qmant = stage_bap_quant(psd, mask, coef, enc_exp)
    timeit("bap+quantize", stage_bap_quant, psd, mask, coef, enc_exp)

    # device packer alone on real encoded fields
    from ac3acm_tpu.ops.pack_device import pack_frames_device
    pack = pack_frames_device(cfg)
    res = run(one, last, csnr)
    encd = {k: jnp.broadcast_to(v[None], (F,) + v.shape) if k != "ok" else v
            for k, v in res.items()}
    pk = jax.jit(lambda e: pack(e["bap"], e["qmant"], e["enc_exp"],
                                e["strat"], e["csnroffst"], e["fsnroffst"]))
    args = {k: jnp.asarray(np.broadcast_to(
        np.asarray(res[k])[None], (F,) + res[k].shape).copy())
        for k in ("bap", "qmant", "enc_exp", "strat", "csnroffst",
                  "fsnroffst")}
    t_pack = timeit("device pack (F frames)", pk, args)
    print(f"{'  -> per frame':34s} {t_pack / F * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
