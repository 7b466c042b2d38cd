"""Pallas fused beam ancestry-attention over the stacked KV cache.

RETAINED EXPERIMENT — not wired into any production path.  The stacked
[N, L, h, T, dk] cache layout this kernel reads was REVERTED from the
production transformer (per-layer [B, h, T, dk] buffers alias cleanly
through the decode while-loop; the stacked buffer's per-step
dynamic-update-slices cost ~9 ms/step — see BENCH.md round 4 and
models/transformer.py:init_state).  Kept with its benchmark
(tools/bench_anc_attend.py) as the measured record for that layout.

The beam decode step's dominant cost is the per-layer ancestry
self-attention (reference semantics: CaptionModel.py:60-110 beam
bookkeeping + AttModel beam state reorder, reformulated here as
ancestry-table attention — see models/transformer.py:_attend_beam).
With the round-4 stacked [N, L, h, T, dk] caches, the jnp path must
first materialize the layer's slice (a dynamic-slice at a traced layer
index that XLA cannot fuse into the attention einsums): ~110 MB written
+ re-read per cache per layer per step, measured at ~8 ms/step of pure
copy overhead at the headline shape (B=1024, beam 5).

This kernel reads the layer's K/V tiles DIRECTLY from the stacked cache
in HBM (the layer index is a scalar-prefetch operand consumed by the
BlockSpec index maps), computing scores -> ancestry/time masking ->
softmax -> weighted sum in one pass per row chunk.  No layer slice is
ever materialized, and each cache byte is read exactly once (the jnp
path reads it three times: slice read + slice write + attend read).

The grid has a single row-chunk axis; all heads ride in one block so
each row's K/V DMA is one contiguous h*T*dk run (21.5 KB at the
production shape) instead of h separate 2.7 KB runs — the round-4a
kernel with a head grid axis was DMA/overhead-bound and only tied the
jnp path.

Math is identical to ``_attend_beam`` with a uniform time mask
(``pos <= t``): scores against every sibling slot, exact one-hot
ancestry selection, f32 softmax over the flattened (sibling, time)
axis, bf16 weighted sum.  Eval-mode only (the attention-dropout RL path
keeps the jnp formulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e9


def auto_interpret() -> bool:
    """Pallas interpret mode off TPU (CPU tests / debugging)."""
    return jax.default_backend() != 'tpu'


def anc_attend_ref(K, V, q, anc, l, t, bw):
    """Pure-jnp reference: layer slice + _attend_beam, uniform time mask.

    K, V: [N, Lyr, h, T, dk] stacked caches
    q:    [N, D] current-step queries (D = h*dk)
    anc:  [N, T] int32 ancestry table
    l, t: traced int32 scalars (layer index, current position)
    bw:   static beam width (N % bw == 0)
    Returns [N, D].
    """
    N, Lyr, h, T, dk = K.shape
    k = jax.lax.dynamic_index_in_dim(K, l, 1, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(V, l, 1, keepdims=False)
    nb = N // bw
    q4 = q.reshape(nb, bw, h, dk)
    k5 = k.reshape(nb, bw, h, T, dk)
    v5 = v.reshape(nb, bw, h, T, dk)
    scores = jnp.einsum('bqhd,bshtd->bqhst', q4, k5) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    sel = jax.nn.one_hot(anc.reshape(nb, bw, T), bw, dtype=bool)
    time_ok = jnp.arange(T)[None, None, None, :] <= t       # [1,1,1,T]
    allowed = jnp.moveaxis(sel, -1, -2) & time_ok            # [b,q,s,t]
    scores = jnp.where(allowed[:, :, None], scores, _NEG_INF)
    p = jax.nn.softmax(scores.reshape(nb, bw, h, bw * T).astype(jnp.float32),
                       axis=-1).astype(q.dtype).reshape(nb, bw, h, bw, T)
    out = jnp.einsum('bqhst,bshtd->bqhd', p, v5)
    return out.reshape(N, h * dk)


def _kernel(lt_ref, q_ref, anc_ref, k_ref, v_ref, o_ref, *, bw, h, T, dk):
    # One grid step = one chunk of CB beam blocks, ALL heads.  Mosaic
    # constraints shape everything here: head indexing happens only on
    # LEADING dims (q/out are head-major), no tensor exceeds 3-D, every
    # reduction is single-axis, and the softmax over the (sibling, time)
    # axes runs ONLINE across the unrolled sibling loop so the 4-D
    # [CB, bw, bw, T] score stack (whose jnp.stack needs an unsupported
    # sublane-splitting reshape) is never built.
    t = lt_ref[1]
    CB = anc_ref.shape[0]
    anc_b = anc_ref[:]                               # [CB, bw, T]
    t_ok = jax.lax.broadcasted_iota(jnp.int32, (CB, bw, T), 2) <= t
    inv_sqrt = 1.0 / jnp.sqrt(jnp.asarray(dk, jnp.float32))
    for hd in range(h):
        qh = q_ref[hd]                               # [CB, bw, dk]
        kh = k_ref[:, 0, hd].reshape(CB, bw, T, dk)  # leading-dim split only
        vh = v_ref[:, 0, hd].reshape(CB, bw, T, dk)
        m = jnp.full((CB, bw), _NEG_INF, jnp.float32)
        z = jnp.zeros((CB, bw), jnp.float32)
        acc = jnp.zeros((CB, bw, dk), jnp.float32)
        for s in range(bw):
            sc = jax.lax.dot_general(qh, kh[:, s],
                                     (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            ok = (anc_b == s) & t_ok                 # [CB, bw, T]
            sc = jnp.where(ok, sc * inv_sqrt, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sc, axis=2))
            scale = jnp.exp(m - m_new)
            e = jnp.exp(sc - m_new[:, :, None])      # [CB, bw, T] f32
            z = z * scale + jnp.sum(e, axis=2)
            acc = acc * scale[:, :, None] + jax.lax.dot_general(
                e.astype(qh.dtype), vh[:, s],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m = m_new
        out = acc / z[:, :, None]
        o_ref[hd] = out.astype(qh.dtype)             # [CB, bw, dk]


def _pick_cb(nb: int, bw: int, h: int, T: int, dk: int) -> int:
    """Largest chunk (in beam blocks) that divides nb and keeps the
    double-buffered K+V blocks under a conservative VMEM budget."""
    # VMEM block bytes with bf16 (16,128)-tile padding on the minor dims
    t_pad = -(-T // 16) * 16
    d_pad = -(-dk // 128) * 128
    per_row = h * t_pad * d_pad * 2
    budget = 64 * 1024 * 1024  # K+V, two pipeline buffers each
    cb = max(1, budget // (4 * per_row * bw))
    while cb > 1 and nb % cb:
        cb -= 1
    return cb


@functools.partial(jax.jit, static_argnames=('bw', 'block_cb', 'interpret'))
def anc_attend(K, V, q, anc, l, t, bw, block_cb=0, interpret=None):
    """Fused ancestry attention; see module docstring.  Args as
    ``anc_attend_ref``; ``block_cb`` = beam blocks per grid step
    (0 = auto)."""
    if interpret is None:
        interpret = auto_interpret()
    N, Lyr, h, T, dk = K.shape
    nb = N // bw
    cb = block_cb or _pick_cb(nb, bw, h, T, dk)
    if nb % cb:
        raise ValueError('block_cb %d must divide nb %d' % (cb, nb))
    rb = cb * bw
    lt = jnp.stack([jnp.asarray(l, jnp.int32), jnp.asarray(t, jnp.int32)])
    # head-major q/out: head indexing inside the kernel must land on a
    # LEADING dim (Mosaic rejects sublane-splitting stores); the outside
    # transposes are ~5 MB at production shape.
    qh4 = q.reshape(nb, bw, h, dk).transpose(2, 0, 1, 3)
    anc3 = anc.reshape(nb, bw, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // cb,),
        in_specs=[
            pl.BlockSpec((h, cb, bw, dk), lambda i, lt_ref: (0, i, 0, 0)),
            pl.BlockSpec((cb, bw, T), lambda i, lt_ref: (i, 0, 0)),
            pl.BlockSpec((rb, 1, h, T, dk),
                         lambda i, lt_ref: (i, lt_ref[0], 0, 0, 0)),
            pl.BlockSpec((rb, 1, h, T, dk),
                         lambda i, lt_ref: (i, lt_ref[0], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((h, cb, bw, dk),
                               lambda i, lt_ref: (0, i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, bw=bw, h=h, T=T, dk=dk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, nb, bw, dk), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lt, qh4, anc3, K, V)
    return out.transpose(1, 2, 0, 3).reshape(N, h * dk)
