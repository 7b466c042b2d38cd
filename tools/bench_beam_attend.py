"""Parity + timing for ops/beam_attend.py vs the production jnp attend."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from captioning_tpu.ops.beam_attend import attend_merged, attend_merged_ref
from captioning_tpu.models.transformer import _attend_beam

B, bw, h, T, dk = 1024, 5, 8, 21, 64
D = h * dk
N = B * bw
dt = jnp.bfloat16
rng = np.random.RandomState(0)
t0 = 12

q = jnp.asarray(rng.randn(N, D), dt)
k_m = jnp.asarray(rng.randn(N, T, D), dt)
v_m = jnp.asarray(rng.randn(N, T, D), dt)
anc = jnp.asarray(rng.randint(0, bw, (N, T)), jnp.int32)

# old layout [N, h, T, dk] holding identical values
k_o = jnp.transpose(k_m.reshape(N, T, h, dk), (0, 2, 1, 3))
v_o = jnp.transpose(v_m.reshape(N, T, h, dk), (0, 2, 1, 3))
tmask = jnp.broadcast_to(jnp.arange(T) <= t0, (N, T))

ref_old = _attend_beam(q.reshape(N, h, 1, dk), k_o, v_o, anc, tmask, bw,
                       lambda x: x).reshape(N, D)
ref_new = attend_merged_ref(q, k_m, v_m, anc, t0, bw=bw, h=h)
out = attend_merged(q, k_m, v_m, anc, t0, bw=bw, h=h)

for name, a in (('jnp-ref', ref_new), ('pallas', out)):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(ref_old, np.float32))
    print('%s vs production: max|d|=%.5f mean|d|=%.6f' %
          (name, d.max(), d.mean()))

# timing: pallas kernel vs production attend, 6-layer-equivalent loop
def time_fn(f, iters=30):
    f()  # compile
    jax.block_until_ready(f())
    t = time.time()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t) / iters * 1000

p_ms = time_fn(lambda: attend_merged(q, k_m, v_m, anc, t0, bw=bw, h=h))
j = jax.jit(lambda q, k, v, anc, tm: _attend_beam(
    q.reshape(N, h, 1, dk), k, v, anc, tm, bw, lambda x: x))
o_ms = time_fn(lambda: j(q, k_o, v_o, anc, tmask))
print('one-layer attend: pallas %.3f ms vs jnp %.3f ms  (x%.2f)'
      % (p_ms, o_ms, o_ms / p_ms))

# ---- v3: fused write+attend (aliased in-place cache update) ---------------
from captioning_tpu.ops.beam_attend import attend_write_merged

k_new = jnp.asarray(rng.randn(N, D), dt)
v_new = jnp.asarray(rng.randn(N, D), dt)

# v3 caches pad T to a multiple of 8 (DMA tile alignment)
Tp = ((T + 7) // 8) * 8
pad = [(0, 0), (0, Tp - T), (0, 0)]
k_p = jnp.pad(k_m, pad)
v_p = jnp.pad(v_m, pad)
anc_p = jnp.pad(anc, [(0, 0), (0, Tp - T)])

# oracle: DUS write then the jnp merged attend
k_w = jax.lax.dynamic_update_slice_in_dim(k_p, k_new[:, None, :], t0, axis=1)
v_w = jax.lax.dynamic_update_slice_in_dim(v_p, v_new[:, None, :], t0, axis=1)
ref_wa = attend_merged_ref(q, k_w, v_w, anc_p, t0, bw=bw, h=h)

ctx, k_o, v_o = attend_write_merged(q, k_p, v_p, k_new, v_new, anc_p, t0,
                                    bw=bw, h=h)
d = np.abs(np.asarray(ctx, np.float32) - np.asarray(ref_wa, np.float32))
print('v3 ctx vs oracle: max|d|=%.5f' % d.max())
dk_ = np.abs(np.asarray(k_o, np.float32) - np.asarray(k_w, np.float32))
dv_ = np.abs(np.asarray(v_o, np.float32) - np.asarray(v_w, np.float32))
print('v3 cache update: max|dk|=%.5f max|dv|=%.5f' % (dk_.max(), dv_.max()))

# ---- v3 correctness sweep: shapes, t0 extremes, and in-scan carries -------
# (TPU-only; the quick test tier pins CPU, so this is the kernel's
# committed verification artifact.  The t0=0 rows regress the
# uninitialized-VMEM 0*NaN poisoning the first integration hit.)

print('shape sweep (ctx / cache max|d| vs oracle):')
for bw_, ni_, t0_ in ((8, 2, 0), (8, 2, 3), (8, 8, 3), (5, 8, 3),
                      (5, 64, 0), (5, 64, 12), (1, 64, 3), (8, 64, 3)):
    N_ = ni_ * bw_
    q_ = jnp.asarray(rng.randn(N_, D), dt)
    k_ = jnp.asarray(rng.randn(N_, Tp, D), dt)
    v_ = jnp.asarray(rng.randn(N_, Tp, D), dt)
    kn_ = jnp.asarray(rng.randn(N_, D), dt)
    vn_ = jnp.asarray(rng.randn(N_, D), dt)
    anc_ = jnp.asarray(rng.randint(0, bw_, (N_, Tp)), jnp.int32)
    ctx_, ko_, vo_ = attend_write_merged(q_, k_, v_, kn_, vn_, anc_, t0_,
                                         bw=bw_, h=h)
    kw_ = jax.lax.dynamic_update_slice_in_dim(k_, kn_[:, None], t0_, 1)
    vw_ = jax.lax.dynamic_update_slice_in_dim(v_, vn_[:, None], t0_, 1)
    ref_ = attend_merged_ref(q_, kw_, vw_, anc_, t0_, bw=bw_, h=h)
    dc = np.abs(np.asarray(ctx_, np.float32) - np.asarray(ref_, np.float32))
    dk2 = np.abs(np.asarray(ko_, np.float32) - np.asarray(kw_, np.float32))
    flag = '' if (dc.max() < 0.02 and dk2.max() == 0) else '  <-- FAIL'
    print('  bw=%d n_img=%-3d t0=%-2d  ctx=%.4f cache=%.4f%s'
          % (bw_, ni_, t0_, dc.max(), dk2.max(), flag))

# in-scan carry check: zero caches, aliased updates threaded through a
# lax.scan from t=0 (the production decode-loop pattern)
ni_, bw_, STEPS = 64, 5, 6
N_ = ni_ * bw_
qs = jnp.asarray(rng.randn(STEPS, N_, D), dt)
kns = jnp.asarray(rng.randn(STEPS, N_, D), dt)
vns = jnp.asarray(rng.randn(STEPS, N_, D), dt)
anc_ = jnp.asarray(rng.randint(0, bw_, (N_, Tp)), jnp.int32)


from functools import partial


@partial(jax.jit, static_argnums=0)
def _run(use_kernel, qs, kns, vns):
    def step(carry, inp):
        k, v, t = carry
        q, kn, vn = inp
        if use_kernel:
            ctx, k, v = attend_write_merged(q, k, v, kn, vn, anc_, t,
                                            bw=bw_, h=h)
        else:
            k = jax.lax.dynamic_update_slice_in_dim(k, kn[:, None], t, 1)
            v = jax.lax.dynamic_update_slice_in_dim(v, vn[:, None], t, 1)
            ctx = attend_merged_ref(q, k, v, anc_, t, bw=bw_, h=h)
        return (k, v, t + 1), ctx

    z = jnp.zeros((N_, Tp, D), dt)
    (_, _, _), ctxs = jax.lax.scan(step, (z, z, jnp.int32(0)),
                                   (qs, kns, vns))
    return ctxs


a = np.asarray(_run(True, qs, kns, vns), np.float32)
b = np.asarray(_run(False, qs, kns, vns), np.float32)
print('in-scan per-step max|d|:',
      [round(float(np.abs(a[t] - b[t]).max()), 4) for t in range(STEPS)])
