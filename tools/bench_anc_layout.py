"""Microbenchmark: ancestry self-attention K/V cache layouts (beam step).

The beam step's dominant cost (tools/profile_decode.py round-3 budget) is
the 6-layer ancestry self-attention over caches laid out [N, h, T, dk]
with N = nb*bw = 5120, T = 21, dk = 64.  XLA pads the last two dims to
the bf16 (16, 128) tile -> [32, 128], ~3x the logical bytes, and lowers
the (s, t)-structured einsums to VPU mul+reduce fusions.

Candidate layouts benched here (one per subcommand so a hung tunnel run
doesn't take the rest down; pass arg = variant):

  cur   : production layout [N, h, T, dk], one-entry DUS write (axis -2)
  pkdS  : packed [nb, h, dk, S], S = T*bw time-major lanes (105 -> one
          128-lane tile), bw-wide DUS write on the lane dim
  pkdT  : packed [nb, h, S, dk] (S in sublanes), bw-wide DUS on axis -2
  mrg   : merged-lane [N, T, h*dk] (lanes exact at 512), per-head math
          via a free minor-dim reshape view, same cheap write as cur
  pkdSb/pkdTb : pkdS/pkdT with an optimization_barrier before the DUS so
          XLA cannot fuse the entry transpose into a whole-buffer rewrite
Bare variant names time the attention math only (writes removed); the
W-suffixed forms add the per-step cache write, splitting attend cost
from write cost.

Usage:  python tools/bench_anc_layout.py VARIANT
  VARIANT in {check, cur, pkdS, pkdT, mrg, pkdSb, pkdTb} or any of those
  (except check) with a W suffix (curW, pkdSW, pkdTW, mrgW, pkdSbW,
  pkdTbW).
  check  runs eager correctness of every variant vs cur (CPU ok)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from captioning_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()

NB, BW, H, DK = 1024, 5, 8, 64
# ANC_T: cache length (default production 21). ANC_T=11 measures the
# traffic scaling a two-segment scan (short caches for early steps)
# could buy.
T = int(os.environ.get('ANC_T', '21'))
N = NB * BW
S = T * BW
LAYERS = 6
STEPS = 20
NEG = -1e9


def rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


# -- attention variants (given identical logical cache contents) -------------

def attend_cur(q, k, v, anc, t):
    """Production math: transformer._attend_beam over [N, h, T, dk]."""
    time_mask = jnp.broadcast_to(jnp.arange(T)[None, :] <= t, (N, T))
    q4 = q.reshape(NB, BW, H, DK)
    k5 = k.reshape(NB, BW, H, T, DK)
    v5 = v.reshape(NB, BW, H, T, DK)
    scores = jnp.einsum('bqhd,bshtd->bqhst', q4, k5) / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    sel = jax.nn.one_hot(anc.reshape(NB, BW, T), BW, dtype=bool)
    allowed = (jnp.moveaxis(sel, -1, -2) & time_mask.reshape(NB, BW, 1, T))
    scores = jnp.where(allowed[:, :, None], scores, NEG)
    p = jax.nn.softmax(
        scores.reshape(NB, BW, H, BW * T).astype(jnp.float32),
        axis=-1).astype(q.dtype).reshape(NB, BW, H, BW, T)
    out = jnp.einsum('bqhst,bshtd->bqhd', p, v5)
    return out.reshape(N, H, DK)


def _allowed_S(anc, t):
    # allowed[nb, q, s]: lane(s) == anc[q, time(s)] and time(s) <= t,
    # with s = time*BW + lane (time-major)
    sel = jax.nn.one_hot(anc.reshape(NB, BW, T), BW, dtype=bool)  # [n,q,t,l]
    tm = (jnp.arange(T) <= t)[None, None, :, None]
    return (sel & tm).reshape(NB, BW, S)


def attend_pkdS(q, k, v, anc, t):
    """Packed [nb, h, dk, S] (S in lanes): batched MXU dots over (nb, h)."""
    allowed = _allowed_S(anc, t)
    qh = jnp.swapaxes(q.reshape(NB, BW, H, DK), 1, 2)   # [nb, h, bw, dk]
    scores = jnp.einsum('nhqd,nhds->nhqs', qh, k) / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    scores = jnp.where(allowed[:, None], scores, NEG)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum('nhqs,nhds->nhqd', p, v)           # [nb, h, bw, dk]
    return jnp.swapaxes(out, 1, 2).reshape(N, H, DK)


def attend_pkdT(q, k, v, anc, t):
    """Packed [nb, h, S, dk] (S in sublanes, dk in lanes)."""
    allowed = _allowed_S(anc, t)
    qh = jnp.swapaxes(q.reshape(NB, BW, H, DK), 1, 2)   # [nb, h, bw, dk]
    scores = jnp.einsum('nhqd,nhsd->nhqs', qh, k) / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    scores = jnp.where(allowed[:, None], scores, NEG)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum('nhqs,nhsd->nhqd', p, v)
    return jnp.swapaxes(out, 1, 2).reshape(N, H, DK)


def attend_mrg(q, k, v, anc, t):
    """Merged-lane cache [N, T, D]: lanes exact (D = 512), sublanes
    T = 21 -> 32 (1.52x) instead of the [T, dk] trailing pair's ~3x;
    per-head contraction via a free minor-dim reshape view."""
    kv = k.reshape(NB, BW, T, H, DK)
    vv = v.reshape(NB, BW, T, H, DK)
    time_mask = jnp.broadcast_to(jnp.arange(T)[None, :] <= t, (N, T))
    q4 = q.reshape(NB, BW, H, DK)
    scores = jnp.einsum('bqhd,bsthd->bqhst', q4, kv) / jnp.sqrt(
        jnp.asarray(DK, q.dtype))
    sel = jax.nn.one_hot(anc.reshape(NB, BW, T), BW, dtype=bool)
    allowed = (jnp.moveaxis(sel, -1, -2) & time_mask.reshape(NB, BW, 1, T))
    scores = jnp.where(allowed[:, :, None], scores, NEG)
    p = jax.nn.softmax(
        scores.reshape(NB, BW, H, BW * T).astype(jnp.float32),
        axis=-1).astype(q.dtype).reshape(NB, BW, H, BW, T)
    out = jnp.einsum('bqhst,bsthd->bqhd', p, vv)
    return out.reshape(N, H, DK)


# -- cache writes -------------------------------------------------------------

def write_cur(cache, new, t):
    # new: [N, h, dk] -> one time entry per row
    return jax.lax.dynamic_update_slice_in_dim(
        cache, new[:, :, None, :], t, axis=-2)


def write_pkdS(cache, new, t):
    # bw contiguous lanes at offset t*BW; entry transposed [nb, h, dk, bw]
    e = jnp.transpose(new.reshape(NB, BW, H, DK), (0, 2, 3, 1))
    return jax.lax.dynamic_update_slice_in_dim(cache, e, t * BW, axis=-1)


def write_pkdT(cache, new, t):
    # bw contiguous sublanes at offset t*BW; entry [nb, h, bw, dk]
    e = jnp.swapaxes(new.reshape(NB, BW, H, DK), 1, 2)
    return jax.lax.dynamic_update_slice_in_dim(cache, e, t * BW, axis=-2)


def write_mrg(cache, new, t):
    # one T entry per row, lanes exact: same cheap sublane DUS as write_cur
    return jax.lax.dynamic_update_slice_in_dim(
        cache, new.reshape(N, 1, H * DK), t, axis=-2)


def write_pkdSb(cache, new, t):
    # barrier the transposed entry so XLA can't fuse the transpose into the
    # DUS (a fused-operand DUS rewrites the WHOLE buffer instead of the
    # in-place small write)
    e = jnp.transpose(new.reshape(NB, BW, H, DK), (0, 2, 3, 1))
    e = jax.lax.optimization_barrier(e)
    return jax.lax.dynamic_update_slice_in_dim(cache, e, t * BW, axis=-1)


def write_pkdTb(cache, new, t):
    e = jnp.swapaxes(new.reshape(NB, BW, H, DK), 1, 2)
    e = jax.lax.optimization_barrier(e)
    return jax.lax.dynamic_update_slice_in_dim(cache, e, t * BW, axis=-2)


def attend_pal(q, k, v, anc, t):
    """Round-5 candidate: merged-lane cache + the fused Pallas kernel
    (ops/beam_attend.py) — mask+softmax+context in VMEM, zero
    intermediates back to HBM."""
    from captioning_tpu.ops.beam_attend import attend_merged
    out = attend_merged(q.reshape(N, H * DK), k, v, anc, t, bw=BW, h=H)
    return out.reshape(N, H, DK)


def bench_palF():
    """v3 fused write+attend: aliased in-place cache update inside the
    kernel + valid-prefix-only loads.  Own harness (the shared one
    separates write and attend)."""
    from captioning_tpu.ops.beam_attend import attend_write_merged
    key = jax.random.PRNGKey(0)
    kq, ka = jax.random.split(key)
    q0 = rand(kq, (N, H * DK))
    Tp = ((T + 7) // 8) * 8  # v3 caches pad T for DMA tile alignment
    anc0 = jax.random.randint(ka, (N, Tp), 0, BW, jnp.int32)
    caches0 = [(jnp.zeros((N, Tp, H * DK), jnp.bfloat16),
                jnp.zeros((N, Tp, H * DK), jnp.bfloat16))
               for _ in range(LAYERS)]

    def step(carry, _):
        caches, q, anc, t = carry
        new = []
        outs = []
        for k, v in caches:
            ctx, k, v = attend_write_merged(
                q, k, v, (q * 1.01).astype(k.dtype),
                (q * 0.99).astype(v.dtype), anc, t, bw=BW, h=H)
            new.append((k, v))
            outs.append(ctx)
        q2 = (jnp.stack(outs).sum(0) * 0.5).astype(q.dtype)
        return (new, q2, anc, t + 1), ()

    @jax.jit
    def loop(caches, q, anc):
        (_, q, _, _), _ = jax.lax.scan(
            step, (caches, q, anc, jnp.int32(0)), None, length=STEPS)
        return q

    t0 = time.perf_counter()
    np.asarray(loop(caches0, q0, anc0))
    print(f'palF         compile+1 {time.perf_counter()-t0:6.1f}s',
          flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = loop(caches0, q0, anc0)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / iters / STEPS * 1e3
    print(f'palF         {ms:7.3f} ms/step ({LAYERS} layers, fused '
          'write+attend)', flush=True)


VARIANTS = {
    'cur': (attend_cur, write_cur, (N, H, T, DK)),
    'pkdS': (attend_pkdS, write_pkdS, (NB, H, DK, S)),
    'pkdT': (attend_pkdT, write_pkdT, (NB, H, S, DK)),
    'mrg': (attend_mrg, write_mrg, (N, T, H * DK)),
    'pal': (attend_pal, write_mrg, (N, T, H * DK)),
    'pkdSb': (attend_pkdS, write_pkdSb, (NB, H, DK, S)),
    'pkdTb': (attend_pkdT, write_pkdTb, (NB, H, S, DK)),
}


def to_pkdS(k):
    return jnp.transpose(k.reshape(NB, BW, H, T, DK),
                         (0, 2, 4, 3, 1)).reshape(NB, H, DK, S)


def to_pkdT(k):
    return jnp.transpose(k.reshape(NB, BW, H, T, DK),
                         (0, 2, 3, 1, 4)).reshape(NB, H, S, DK)


def to_mrg(k):
    return jnp.transpose(k, (0, 2, 1, 3)).reshape(N, T, H * DK)


def check():
    key = jax.random.PRNGKey(0)
    kq, ka, k1, k2 = jax.random.split(key, 4)
    q = rand(kq, (N, H, DK))
    anc = jax.random.randint(ka, (N, T), 0, BW, jnp.int32)
    kf, vf = rand(k1, (N, H, T, DK)), rand(k2, (N, H, T, DK))
    t = jnp.int32(T - 1)
    ref = np.asarray(attend_cur(q, kf, vf, anc, t), np.float32)
    for name, conv in (('pkdS', to_pkdS), ('pkdT', to_pkdT), ('mrg', to_mrg)):
        fn = VARIANTS[name][0]
        got = np.asarray(fn(q, conv(kf), conv(vf), anc, t), np.float32)
        err = np.abs(ref - got).max()
        print(f'{name}: max |ref - got| = {err:.2e}')
        assert err < 0.125, (name, err)
    # write equivalence: write at t then convert == convert then write
    t = jnp.int32(7)
    new = rand(jax.random.PRNGKey(9), (N, H, DK))
    w_ref = write_cur(kf, new, t)
    for name, conv, wr in (('pkdS', to_pkdS, write_pkdS),
                           ('pkdT', to_pkdT, write_pkdT),
                           ('mrg', to_mrg, write_mrg)):
        a = np.asarray(conv(w_ref), np.float32)
        b = np.asarray(wr(conv(kf), new, t), np.float32)
        err = np.abs(a - b).max()
        print(f'{name} write: max err = {err:.2e}')
        assert err == 0.0, (name, err)
    print('check OK')


def bench(variant, with_write):
    attend, write, shape = VARIANTS[variant]
    key = jax.random.PRNGKey(0)
    kq, ka = jax.random.split(key)
    q0 = rand(kq, (N, H, DK))
    anc0 = jax.random.randint(ka, (N, T), 0, BW, jnp.int32)
    caches0 = [(jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))
               for _ in range(LAYERS)]

    def step(carry, _):
        caches, q, anc, t = carry
        if with_write:
            caches = [(write(k, (q * 1.01), t), write(v, (q * 0.99), t))
                      for k, v in caches]
        outs = [attend(q, k, v, anc, t) for k, v in caches]
        q2 = (jnp.stack(outs).sum(0) * 0.5).astype(q.dtype)
        return (caches, q2, anc, t + 1), ()

    @jax.jit
    def loop(caches, q, anc):
        (_, q, _, _), _ = jax.lax.scan(
            step, (caches, q, anc, jnp.int32(0)), None, length=STEPS)
        return q

    name = variant + ('+write' if with_write else '')
    t0 = time.perf_counter()
    np.asarray(loop(caches0, q0, anc0))
    print(f'{name:12s} compile+1 {time.perf_counter()-t0:6.1f}s', flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = loop(caches0, q0, anc0)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / iters / STEPS * 1e3
    print(f'{name:12s} {ms:7.3f} ms/step ({LAYERS} layers)', flush=True)


if __name__ == '__main__':
    w = sys.argv[1] if len(sys.argv) > 1 else 'check'
    if w == 'check':
        check()
    elif w == 'palF':
        bench_palF()
    else:
        bench(w.rstrip('W'), w.endswith('W'))
