"""Itemize the G=1 beam-step table math by toggling parts off.

Reproduces engine.decoding.beam_search's per-step work (single group,
no constraints) with flags, to see where the 7.3 ms/step goes.
"""

import sys
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

B, BD, V1, L = 1024, 5, 9488, 20
NEG = -1e30


def run(tag, do_softmax=True, do_unaug=True, do_pool=True, do_topk=True,
        carry_table=True):
    rng0 = np.random.RandomState(0)
    table = jnp.asarray(rng0.randn(L + 1, V1).astype('float32'))

    def body(carry, xs):
        (lp_table, seq, ucum, sums, pseq, pp, pu, t) = carry

        lp3 = lp_table  # [B, BD, V1]
        beam_rng = jnp.arange(BD)
        first_mask = jnp.where((t == 0) & (beam_rng > 0), NEG, 0.0)
        sums_for_step = sums + first_mask[None, :]
        if do_topk:
            candidates = sums_for_step[..., None] + lp3
            ys, ix = jax.lax.top_k(candidates.reshape(B, BD * V1), BD)
            beam_ix = ix // V1
            sel_ix = ix % V1
        else:
            ys = sums_for_step
            beam_ix = jnp.broadcast_to(beam_rng[None], (B, BD))
            sel_ix = (t % V1) + beam_ix

        def gb(x):
            bi = beam_ix.reshape(beam_ix.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, jnp.broadcast_to(
                bi, beam_ix.shape + x.shape[2:]), axis=1)

        time_onehot = jax.nn.one_hot(t, L, dtype=bool)
        new_seq = jnp.where(time_onehot[None, None, :], sel_ix[..., None],
                            gb(seq))
        if do_unaug:
            unaug_row_sum = lp3.sum(-1)
            new_ucum = (jnp.take_along_axis(ucum, beam_ix, axis=1) +
                        jnp.take_along_axis(unaug_row_sum, beam_ix, axis=1))
        else:
            new_ucum = ucum
        new_sums = ys

        if do_pool:
            just_ended = (sel_ix == 0) | (t == L - 1)
            cand_p = jnp.where(just_ended, new_sums, NEG)
            merged_p = jnp.concatenate([pp, cand_p], axis=1)
            merged_u = jnp.concatenate([pu, new_ucum], axis=1)
            merged_seq = jnp.concatenate([pseq, new_seq], axis=1)
            top_p, top_i = jax.lax.top_k(merged_p, BD)
            pp = top_p
            pu = jnp.take_along_axis(merged_u, top_i, axis=1)
            pseq = jnp.take_along_axis(
                merged_seq, top_i[..., None].repeat(L, 2), axis=1)
            new_sums = new_sums - 1000.0 * just_ended

        # model stand-in + the beam loop's log_softmax
        it = sel_ix.reshape(B * BD)
        lp = table[t % (L + 1)][None, :] + \
            0.01 * it.astype(jnp.float32)[:, None]
        if do_softmax:
            lp = jax.nn.log_softmax(lp, axis=-1)
            lp = jax.nn.log_softmax(lp, axis=-1)
        if carry_table:
            lp_table = lp.reshape(B, BD, V1)

        return (lp_table, new_seq, new_ucum, new_sums, pseq, pp, pu,
                t + 1), None

    def full(rng):
        lp_table = jnp.zeros((B, BD, V1), jnp.float32)
        seq = jnp.zeros((B, BD, L), jnp.int32)
        ucum = jnp.zeros((B, BD), jnp.float32)
        sums = jnp.zeros((B, BD), jnp.float32)
        pseq = jnp.zeros((B, BD, L), jnp.int32)
        pp = jnp.full((B, BD), NEG, jnp.float32)
        pu = jnp.full((B, BD), NEG, jnp.float32)
        carry, _ = jax.lax.scan(
            body, (lp_table, seq, ucum, sums, pseq, pp, pu, jnp.int32(0)),
            jnp.arange(L))
        return carry[4]

    fn = jax.jit(full)
    out = fn(jax.random.PRNGKey(0))
    _ = np.asarray(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(jax.random.PRNGKey(0))
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print('%-28s %.2f ms total, %.3f ms/step' % (tag, dt * 1e3,
                                                 dt * 1e3 / L))
    sys.stdout.flush()


if __name__ == '__main__':
    run('full')
    run('no double softmax', do_softmax=False)
    run('no unaug', do_unaug=False)
    run('no pool', do_pool=False)
    run('no topk', do_topk=False)
    run('no table carry', carry_table=False)
    run('bare (nothing)', do_softmax=False, do_unaug=False, do_pool=False,
        do_topk=False, carry_table=False)
