"""Batched on-device decoding: greedy/sample, beam search, diverse sampling.

TPU-native redesign of the reference decoding engine
(``/root/reference/captioning/models/CaptionModel.py:35-407`` and
``AttModel._sample/_sample_beam/_diverse_sample`` at
``/root/reference/captioning/models/AttModel.py:218-449``).

Key translations (SURVEY.md section 7):

* python per-token loops -> single ``lax.scan`` over fixed ``seq_length``
  steps; early-exit bookkeeping becomes masking (finished rows emit pad and
  zeroed logprobs, bit-identical to the reference's break-early zeros).
* ``done_beams`` python lists -> a fixed-shape top-``bdash`` pool per
  (batch, group), maintained by a masked top-k merge each step; since the
  final answer is the top-``bdash`` finished beams by penalized logprob,
  the pool is an exact replacement.
* beam state reordering (reference ``beam_step`` gathers,
  CaptionModel.py:87-109) -> one ``take`` over every state leaf.
* host-side constraint hacks (trigram dicts, bad-ending numpy isin,
  AttModel.py:294-332) -> vectorized scatter masks on device.
* diverse-beam groups staggered in time run *batched in one model call*
  per global step: group g at global step t consumes tokens produced by
  groups < g at strictly earlier global steps, so there is no intra-step
  dependency.

All functions are pure and jit-able; the model is abstracted as a
``DecodeModel`` bundle of closures.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30  # "never selected" sentinel (finite to keep arithmetic NaN-free)


@dataclasses.dataclass(frozen=True)
class DecodeModel:
    """Pure-function view of a captioner, bound to params."""
    prepare: Callable  # (fc, att, att_masks, rng) -> feats pytree
    init_state: Callable  # (batch, beam=False) -> state pytree
    step: Callable  # (it, feats, state, rng, logsoftmax) -> (logprobs, state)
    seq_length: int
    vocab_plus: int  # V + 1
    bos_idx: int = 0
    eos_idx: int = 0
    pad_idx: int = 0
    unk_idx: Optional[int] = None
    bad_endings_ix: Tuple[int, ...] = ()
    # Optional beam-ancestry support (KV-cached models): slots stay put,
    # beam_search reorders only an ancestor-index table and the step
    # attends through it.  ``beam_init(state, bdash)`` adds the ancestry
    # leaves after lane replication; ``beam_reorder(state, flat_idx)``
    # gathers every leaf EXCEPT the physical caches.  When both are set,
    # beam_search calls step with ``beam_width=bdash``.
    beam_init: Optional[Callable] = None
    beam_reorder: Optional[Callable] = None
    # step() accepts cross-attention feats carrying one row per beam block
    # (nb = rows // beam_width); sample_beam then skips the per-lane feats
    # replication, cutting the cross-attend HBM traffic by the beam width.
    shared_beam_feats: bool = False
    # Fused logit epilogue (ops/logit_topk.py): step to the final hidden,
    # then matmul + log-softmax + stats + per-row top-k in one pass — the
    # [N, V1] table never reaches HBM.  Signature:
    #   step_topk(it, feats, state, rng, k, temp, unk_bias, unk_idx,
    #             beam_width) -> (top_lsm [N,k], top_ix [N,k],
    #                             row_sum [N], ent [N], state)
    # top_lsm are UNK-adjusted log-softmax values; per-row top-k commutes
    # with the beam candidate add (a per-row shift).  The fast beam path
    # uses it when set (static temperature only).
    step_topk: Optional[Callable] = None


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def repeat_tree(n: int, tree):
    """Bx... -> Bnx... with the repeat index fastest (models/utils.py:3-14)."""
    if n == 1:
        return tree

    def rep(x):
        if x is None:
            return None
        x = jnp.repeat(x[:, None], n, axis=1)
        return x.reshape((x.shape[0] * n,) + x.shape[2:])

    return jax.tree.map(rep, tree)


def reorder_state(tree, idx):
    """Beam-reorder every state leaf's leading dim by idx.

    XLA's row gather reaches only ~7% of HBM bandwidth on TPU for large
    KV-cache leaves; a one-hot matmul permutation runs on the MXU at ~5x
    the throughput.  Selection through an exact one-hot is bit-exact for
    matching dtypes, so this is a pure performance substitution.  Small
    leaves (RNN h/c, token buffers, int leaves) keep the plain gather.
    """
    n = idx.shape[0]
    onehot = {}

    def sel(x):
        if x is None:
            return None
        row = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
        if (x.dtype in (jnp.bfloat16, jnp.float32) and row >= 2048):
            key = x.dtype
            if key not in onehot:
                onehot[key] = jax.nn.one_hot(idx, n, dtype=x.dtype)
            y = jnp.einsum('bn,nd->bd', onehot[key],
                           x.reshape(n, row),
                           preferred_element_type=jnp.float32)
            return y.astype(x.dtype).reshape(x.shape)
        return jnp.take(x, idx, axis=0)

    return jax.tree.map(sel, tree)


def _where_tree(mask_flat, new_tree, old_tree):
    """Per-row select between two same-shaped pytrees."""
    def sel(new, old):
        if new is None:
            return None
        m = mask_flat.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)
    return jax.tree.map(sel, new_tree, old_tree)


def prep_rng_for_sample(rng, opt: Dict[str, Any]):
    """The prepare-rng ``sample()``/``sample_beam()`` derive from ``rng``.

    Callers that re-run prepare_feature to recover its discarded mutable
    state (trainer.bn_stats_after_prepare threading) must use the SAME
    derived key so dropout-dependent statistics (use_bn=2 normalizes the
    post-dropout embed output) match the decode pass bit-for-bit."""
    beam = (int(opt.get('beam_size', 1)) > 1 and
            opt.get('sample_method', 'greedy') in ('greedy', 'beam_search'))
    if beam:
        return jax.random.split(rng, 4)[1]
    return jax.random.split(rng)[1]


def penalty_fn(length_penalty: str):
    """jnp version of misc.penalty_builder (reference misc.py:133-157).

    The '<type>_<alpha>' spec parses here; the math lives only in
    ``penalty_fn_dynamic`` (a float alpha is just a weakly-typed operand)."""
    if not length_penalty:
        return penalty_fn_dynamic('', 0.0)
    pen_type, alpha = length_penalty.split('_')
    return penalty_fn_dynamic(pen_type, float(alpha))


def penalty_fn_dynamic(pen_type: str, alpha):
    """``penalty_fn`` with a TRACED alpha (the type stays static): an eval
    sweep over length-penalty strengths reuses one compiled beam program."""
    if not pen_type:
        return lambda length, logprobs: logprobs
    if pen_type == 'wu':
        def wu(length, logprobs):
            mod = ((5.0 + length) ** alpha) / ((5.0 + 1.0) ** alpha)
            return logprobs / mod
        return wu
    if pen_type == 'avg':
        return lambda length, logprobs: logprobs / jnp.maximum(length, 1)
    raise ValueError('unknown length_penalty %s' % pen_type)


def _beam_dynamic_setup(dm, opt: Dict[str, Any],
                        dynamic_params: Optional[Dict]):
    """Resolve (temperature, length_penalty fn, apply_unk, unk_scale).

    With ``dynamic_params`` ({'temperature', 'suppress_unk', 'lp_alpha'}
    traced scalars), the compiled program is shared across temperatures,
    UNK suppression on/off, and length-penalty strengths (VERDICT round-2
    item 8); only the penalty TYPE and the structural flags stay in the
    compile key.
    """
    if dynamic_params is not None:
        lp_spec = opt.get('length_penalty', '') or ''
        pen_type = lp_spec.split('_')[0] if lp_spec else ''
        length_penalty = penalty_fn_dynamic(pen_type,
                                            dynamic_params['lp_alpha'])
        return (dynamic_params['temperature'], length_penalty,
                dm.unk_idx is not None, dynamic_params['suppress_unk'])
    temperature = float(opt.get('temperature', 1.0))
    length_penalty = penalty_fn(opt.get('length_penalty', ''))
    suppress_unk = int(opt.get('suppress_UNK', 0))
    return (temperature, length_penalty,
            bool(suppress_unk) and dm.unk_idx is not None, 1.0)


def sample_next_word(rng, logprobs, sample_method: str, temperature: float):
    """reference CaptionModel.sample_next_word (:370-407)."""
    if sample_method == 'greedy':
        it = jnp.argmax(logprobs, axis=1)
        sample_lp = jnp.max(logprobs, axis=1)
        return it, sample_lp
    if sample_method == 'gumbel':
        eps = 1e-20
        u = jax.random.uniform(rng, logprobs.shape)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        y = jax.nn.log_softmax((logprobs + g) / temperature, axis=-1)
        it = jnp.argmax(y, axis=1)
        sample_lp = jnp.take_along_axis(logprobs, it[:, None], axis=1)[:, 0]
        return it, sample_lp

    lp = logprobs / temperature
    if sample_method.startswith('top'):
        top_num = float(sample_method[3:])
        if 0 < top_num < 1:
            # nucleus sampling (reference :390-398)
            probs = jax.nn.softmax(lp, axis=1)
            order = jnp.argsort(-probs, axis=1, stable=True)
            sorted_probs = jnp.take_along_axis(probs, order, axis=1)
            csum = jnp.cumsum(sorted_probs, axis=1)
            mask = csum < top_num
            mask = jnp.concatenate(
                [jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
            kept = sorted_probs * mask
            kept = kept / kept.sum(1, keepdims=True)
            # scatter back to vocab order (inverse permutation of `order`)
            lp = jnp.take_along_axis(
                jnp.log(jnp.maximum(kept, 1e-38)),
                jnp.argsort(order, axis=1), axis=1)
        else:
            k = int(top_num)
            kth = jnp.sort(lp, axis=1)[:, -k][:, None]
            lp = jnp.where(lp >= kth, lp, NEG)
    it = jax.random.categorical(rng, lp, axis=1)
    sample_lp = jnp.take_along_axis(lp, it[:, None], axis=1)[:, 0]
    return it, sample_lp


def _bad_endings_mask(prev_it, bad_ix: Sequence[int], vocab_plus: int):
    """-inf at index 0 where the previous word is a function word
    (reference AttModel.py:299-304)."""
    if not bad_ix:
        return None
    bad = jnp.zeros((vocab_plus,), bool).at[jnp.asarray(bad_ix)].set(True)
    return bad[prev_it]  # [B] bool


def _apply_step_constraints(logprobs, prev_it, t, dm: DecodeModel,
                            decoding_constraint: int, remove_bad_endings: int):
    """decoding_constraint / bad-endings masks (the sample path; UNK
    suppression exists only in beam search, reference AttModel has no
    suppress_UNK outside add_eval_options' beam flags)."""
    if decoding_constraint:
        pen = jnp.where(t > 0, -jnp.inf, 0.0)
        logprobs = logprobs.at[
            jnp.arange(logprobs.shape[0]), prev_it].add(pen)
    if remove_bad_endings and dm.bad_endings_ix:
        was_bad = _bad_endings_mask(prev_it, dm.bad_endings_ix, dm.vocab_plus)
        pen = jnp.where((t > 0) & was_bad, -jnp.inf, 0.0)
        logprobs = logprobs.at[:, 0].add(pen)
    return logprobs


def _trigram_penalty(logprobs, seq_buf, t):
    """Device-side trigram blocking (reference AttModel.py:306-332).

    seq_buf: [B, L] tokens so far (cols >= t are zero).  At step t >= 3 the
    reference has recorded trigrams ending at positions 2..t-1 and blocks
    any w completing (seq[t-2], seq[t-1], w); the mask counts duplicates,
    matching the dict-of-lists accumulation.

    ``t`` may be a scalar (uniform step, the sample path) or a [B] int array
    of per-row positions (staggered diverse groups).
    """
    B, L = seq_buf.shape
    pos = jnp.arange(L)
    # match_s: trigram at position s (s>=2, s<=t-1) has same two-token prefix
    prefix1 = jnp.take_along_axis(
        seq_buf, jnp.maximum(pos - 2, 0)[None].repeat(B, 0), axis=1)
    prefix2 = jnp.take_along_axis(
        seq_buf, jnp.maximum(pos - 1, 0)[None].repeat(B, 0), axis=1)
    t_arr = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (B,))[:, None]
    cur1 = jnp.take_along_axis(seq_buf, jnp.maximum(t_arr - 2, 0), axis=1)
    cur2 = jnp.take_along_axis(seq_buf, jnp.maximum(t_arr - 1, 0), axis=1)
    valid = (pos[None] >= 2) & (pos[None] <= t_arr - 1)
    match = (prefix1 == cur1) & (prefix2 == cur2) & valid
    counts = jnp.zeros_like(logprobs)
    counts = counts.at[jnp.arange(B)[:, None], seq_buf].add(
        match.astype(logprobs.dtype))
    alpha = 2.0
    return jnp.where(t_arr >= 3, counts * (-0.693 * alpha), 0.0)


def sample_next_word_dynamic(rng, logprobs, method_id, temperature,
                             top_k, top_p):
    """sample_next_word with the method/params as TRACED values.

    One compiled program covers greedy / sample / gumbel / top-k / top-p:
    ``method_id`` selects the branch via lax.switch (0=greedy, 1=gumbel,
    2=categorical with optional top-k/top-p masks).  ``top_k`` (int32,
    0=off) and ``top_p`` (f32, 0=off) are runtime operands, so switching
    eval sampling methods does not recompile (VERDICT round-1 item 10).
    Semantics per branch match ``sample_next_word`` exactly.
    """
    V1 = logprobs.shape[1]

    def _greedy(_):
        it = jnp.argmax(logprobs, axis=1)
        return it, jnp.max(logprobs, axis=1)

    def _gumbel(_):
        eps = 1e-20
        u = jax.random.uniform(rng, logprobs.shape)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        y = jax.nn.log_softmax((logprobs + g) / temperature, axis=-1)
        it = jnp.argmax(y, axis=1)
        lp_sel = jnp.take_along_axis(logprobs, it[:, None], axis=1)[:, 0]
        return it, lp_sel

    def _categorical(_):
        lp = logprobs / temperature
        # top-k mask (0 = off): kth largest as a dynamic index into the
        # sorted row
        srt = jnp.sort(lp, axis=1)
        k_ix = jnp.clip(V1 - jnp.maximum(top_k, 1), 0, V1 - 1)
        kth = jnp.take_along_axis(
            srt, jnp.full((lp.shape[0], 1), k_ix), axis=1)
        lp = jnp.where((top_k > 0) & (lp < kth), NEG, lp)
        # nucleus mask (0 = off), reference CaptionModel.py:390-398
        probs = jax.nn.softmax(lp, axis=1)
        order = jnp.argsort(-probs, axis=1, stable=True)
        sorted_probs = jnp.take_along_axis(probs, order, axis=1)
        csum = jnp.cumsum(sorted_probs, axis=1)
        mask = csum < top_p
        mask = jnp.concatenate(
            [jnp.ones_like(mask[:, :1]), mask[:, :-1]], axis=1)
        kept = sorted_probs * mask
        kept = kept / kept.sum(1, keepdims=True)
        lp_nuc = jnp.take_along_axis(
            jnp.log(jnp.maximum(kept, 1e-38)),
            jnp.argsort(order, axis=1), axis=1)
        lp = jnp.where(top_p > 0, lp_nuc, lp)
        it = jax.random.categorical(rng, lp, axis=1)
        lp_sel = jnp.take_along_axis(lp, it[:, None], axis=1)[:, 0]
        return it, lp_sel

    return jax.lax.switch(jnp.clip(method_id, 0, 2),
                          [_greedy, _gumbel, _categorical], None)


# ---------------------------------------------------------------------------
# sample (greedy / temperature / top-k / top-p / gumbel)
# ---------------------------------------------------------------------------

def sample(dm: DecodeModel, fc_feats, att_feats, att_masks, rng,
           opt: Dict[str, Any], dynamic_params: Optional[Dict] = None,
           return_stats: bool = False):
    """reference AttModel._sample (:258-352).

    Returns (seq [B*n, L] int32, seqLogprobs [B*n, L, V+1] f32).

    ``dynamic_params`` (optional) carries TRACED sampling parameters
    {'method_id', 'temperature', 'top_k', 'top_p'} — the compiled program
    is then shared across all sample-family methods (see
    sample_next_word_dynamic); opt's sample_method/temperature are ignored
    and beam/diverse routing is the caller's responsibility.

    ``return_stats``: instead of the full [B*n, L, V+1] distribution
    table (at production shapes ~777 MB that eval_split reduces to two
    scalars per row), return (seq, {'ent_sum', 'lp_sum'}) with the
    entropy / chosen-logprob sums accumulated inside the scan — the same
    gating as the stored tables (rows zeroed after finish), so the
    host-side reductions match exactly.
    """
    sample_method = opt.get('sample_method', 'greedy')
    beam_size = int(opt.get('beam_size', 1))
    temperature = float(opt.get('temperature', 1.0))
    sample_n = int(opt.get('sample_n', 1))
    group_size = int(opt.get('group_size', 1))
    output_logsoftmax = int(opt.get('output_logsoftmax', 1))
    decoding_constraint = int(opt.get('decoding_constraint', 0))
    block_trigrams = int(opt.get('block_trigrams', 0))
    remove_bad_endings = int(opt.get('remove_bad_endings', 0))
    if dynamic_params is None:
        if beam_size > 1 and sample_method in ('greedy', 'beam_search'):
            if return_stats:
                # honor the stats contract on the beam route too: the carried
                # beam sums ARE the requested reductions, and want_logps=False
                # also skips the winner-logprob replay the caller doesn't want
                seq, stats, _ = sample_beam(dm, fc_feats, att_feats,
                                            att_masks, rng, opt,
                                            want_logps=False)
                return seq, stats
            return sample_beam(dm, fc_feats, att_feats, att_masks, rng,
                               opt)[:2]
        if group_size > 1:
            return diverse_sample(dm, fc_feats, att_feats, att_masks, rng,
                                  opt)

    B = fc_feats.shape[0]
    L = dm.seq_length
    V1 = dm.vocab_plus
    rng, prep_rng = jax.random.split(rng)
    feats = dm.prepare(fc_feats, att_feats, att_masks, prep_rng)
    if not dm.shared_beam_feats:
        # models with block-shared attends read one feats row per sample_n
        # block directly (shape-detected in their step)
        feats = repeat_tree(sample_n, feats)
    N = B * sample_n
    state0 = dm.init_state(N)

    step_rngs = jax.random.split(rng, L * 2).reshape(L, 2, -1)

    # fused greedy epilogue (ops/logit_topk.py): the stats path reduces
    # the [N, V1] table to argmax + two scalars per row — with no
    # constraint scatters in the way, step_topk(k=1) produces exactly
    # those and the table never reaches HBM.  The eval stats (and the
    # greedy argmax) are taken on the UNTEMPERED log-softmax (temperature
    # only shapes the sampling distribution in sample_next_word*), so the
    # kernel runs at temp=1 even under dynamic params; the method must be
    # STATICALLY greedy (sample_stats_jit pins it for the production eval
    # program), since dynamic gumbel/categorical need the full table.
    fused_greedy = (return_stats and dm.step_topk is not None
                    and sample_method == 'greedy'
                    and bool(output_logsoftmax)
                    and not decoding_constraint and not block_trigrams
                    and not remove_bad_endings and N % 8 == 0)

    def body(carry, xs):
        it_prev, state, unfinished, seq_buf, ent_sum, lp_sum, t = carry
        rngs = xs
        if fused_greedy:
            tv1, ti1, _, en1, state = dm.step_topk(
                it_prev, feats, state, rngs[0], 1, jnp.float32(1.0),
                jnp.float32(0.0), -1, 0)
            it = ti1[:, 0].astype(jnp.int32)
            first = (t == 0)
            it = jnp.where(first | unfinished, it, dm.pad_idx)
            keep = first | unfinished
            unfinished = jnp.where(first, it != dm.eos_idx,
                                   unfinished & (it != dm.eos_idx))
            seq_buf = seq_buf.at[:, t].set(it)
            ent_sum = ent_sum + jnp.where(keep, en1, 0.0)
            lp_sum = lp_sum + jnp.where(keep, tv1[:, 0], 0.0)
            return (it, state, unfinished, seq_buf, ent_sum, lp_sum,
                    t + 1), it
        logprobs, state = dm.step(it_prev, feats, state, rngs[0],
                                  bool(output_logsoftmax), uniform_t=True)
        # it_prev == seq[:, t-1] for t >= 1; constraints are gated on t > 0
        logprobs = _apply_step_constraints(
            logprobs, it_prev, t, dm, decoding_constraint, remove_bad_endings)
        if block_trigrams:
            logprobs = logprobs + _trigram_penalty(logprobs, seq_buf, t)
        if dynamic_params is not None:
            it, _ = sample_next_word_dynamic(
                rngs[1], logprobs, dynamic_params['method_id'],
                dynamic_params['temperature'], dynamic_params['top_k'],
                dynamic_params['top_p'])
        else:
            it, _ = sample_next_word(rngs[1], logprobs, sample_method,
                                     temperature)
        # finished bookkeeping (reference :340-347)
        first = (t == 0)
        it = jnp.where(first | unfinished, it, dm.pad_idx)
        keep = first | unfinished
        unfinished = jnp.where(first, it != dm.eos_idx,
                               unfinished & (it != dm.eos_idx))
        seq_buf = seq_buf.at[:, t].set(it)
        if return_stats:
            # the two reductions eval_split takes from the stored tables
            # (reference eval_utils.py:173-174), with the same row gating
            # as logprobs_out (zeroed after finish)
            ent_sum = ent_sum + jnp.where(
                keep, -(jnp.exp(logprobs) * logprobs).sum(-1), 0.0)
            lp_sum = lp_sum + jnp.where(
                keep,
                jnp.take_along_axis(logprobs, it[:, None], axis=1)[:, 0],
                0.0)
            out = it
        else:
            logprobs_out = jnp.where(keep[:, None], logprobs, 0.0)
            out = (it, logprobs_out)
        return (it, state, unfinished, seq_buf, ent_sum, lp_sum,
                t + 1), out

    it0 = jnp.full((N,), dm.bos_idx, jnp.int32)
    unfin0 = jnp.ones((N,), bool)
    seq_buf0 = jnp.zeros((N, L), jnp.int32)
    zeros_n = jnp.zeros((N,), jnp.float32)
    carry0 = (it0, state0, unfin0, seq_buf0, zeros_n, zeros_n, jnp.int32(0))
    if return_stats:
        # EXACT early exit (reference AttModel.py:158 breaks when all rows
        # end): once every row has finished, remaining steps only write
        # pads and gated-off stats — skip them.  The stats path emits no
        # per-step outputs (seq lives in the carried buffer), so the scan
        # converts to a while_loop directly.
        def cond(carry):
            return (carry[-1] < L) & ((carry[-1] == 0) | carry[2].any())

        def body_w(carry):
            return body(carry, step_rngs[carry[-1]])[0]

        carry = jax.lax.while_loop(cond, body_w, carry0)
        return carry[3], {'ent_sum': carry[4], 'lp_sum': carry[5]}
    carry, outs = jax.lax.scan(body, carry0, step_rngs)
    seq_steps, lp_steps = outs
    seq = jnp.swapaxes(seq_steps, 0, 1)
    seqLogprobs = jnp.swapaxes(lp_steps, 0, 1)
    return seq, seqLogprobs


def scan_logprobs(dm: DecodeModel, fc_feats, att_feats, att_masks, gen_seq,
                  rng, sample_n: int = 1, output_logsoftmax: int = 1):
    """Recompute per-step logprobs over an already-sampled sequence.

    Mirrors ``sample()``'s rng derivation exactly (same prepare rng, same
    per-step model rng), so under dropout the recomputed activations are
    bit-identical to the sampling pass — gradients through this scan equal
    gradients through the sampling forward itself, which is what the
    reference backprops (loss_wrapper.py:64-72).

    CAVEAT: the bit-exactness claim holds when ``gen_seq`` came from
    ``sample()``'s scan (the production SCST configs: train_beam_size 1).
    A BEAM-decoded train pass (train_beam_size > 1) draws its dropout masks
    over beam-replicated rows inside the beam program; no single-row
    recompute can reproduce those masks, so under dropout the gradient is
    taken through a fresh dropout realization of the same sequence — still
    the reference's REINFORCE estimand, not its exact per-mask gradient
    (PARITY.md "SCST gradient recompute").
    """
    B = fc_feats.shape[0]
    L = dm.seq_length
    rng, prep_rng = jax.random.split(rng)
    feats = dm.prepare(fc_feats, att_feats, att_masks, prep_rng)
    if not dm.shared_beam_feats:
        feats = repeat_tree(sample_n, feats)
    N = B * sample_n
    state0 = dm.init_state(N)
    step_rngs = jax.random.split(rng, L * 2).reshape(L, 2, -1)

    inputs = jnp.concatenate(
        [jnp.full((N, 1), dm.bos_idx, jnp.int32), gen_seq[:, :-1]], axis=1)

    def body(carry, xs):
        state, t = carry
        it, rngs = xs
        logprobs, state = dm.step(it, feats, state, rngs[0],
                                  bool(output_logsoftmax), uniform_t=True)
        return (state, t + 1), logprobs

    (_, _), outputs = jax.lax.scan(
        body, (state0, jnp.int32(0)),
        (inputs.T.astype(jnp.int32), step_rngs))
    lp = jnp.swapaxes(outputs, 0, 1)
    # zero rows after finish, matching sample()'s stored logprobs: step t is
    # kept iff no token before t was eos/pad (pads only follow an eos).
    keep = jnp.concatenate(
        [jnp.ones((N, 1), bool), (gen_seq[:, :-1] != dm.pad_idx) &
         (gen_seq[:, :-1] != dm.eos_idx)], axis=1)
    keep = jnp.cumprod(keep.astype(jnp.int32), axis=1).astype(bool)
    return jnp.where(keep[..., None], lp, 0.0)


# ---------------------------------------------------------------------------
# beam search (batched, diverse groups, fixed shapes)
# ---------------------------------------------------------------------------

def _select_rows(tbl, ix):
    """``take_along_axis(tbl, ix[..., None], axis=1)`` for [B, R, L] tables
    via a masked sum.  XLA's gather materializes these through slow strided
    copies inside the beam scan (profiled at ~1.26 ms for a [1024,10,20]
    int table); the R-way select-and-sum runs as one VPU fusion.  Exact
    for ints and for floats (exactly one mask lane is hot per output)."""
    R = tbl.shape[1]
    oh = ix[:, :, None] == jnp.arange(R, dtype=ix.dtype)[None, None, :]
    zero = jnp.zeros((), tbl.dtype)
    return jnp.where(oh[..., None], tbl[:, None], zero).sum(2)


def _topk_iterated(cand, B, bdash, k):
    """``lax.top_k(cand.reshape(B, bdash * V1), k)`` without the padded-tile
    remap: exact values, indices, order, and tie semantics.

    ``cand`` is the fresh [B*bdash, V1] candidates table.  Flattening
    (bdash, V1) into one minor dim is NOT a layout bitcast on TPU (V1 is
    not a multiple of the 128-lane tile), so the flat ``lax.top_k`` call
    costs two full-table layout copies plus a transposed copy into the
    TopK custom call's preferred layout — profiled at ~1.8 ms/step on top
    of the 1.1 ms sort at the production shape [5120, 9488].  Here each of
    the k winners comes from ONE fused variadic-reduce pass (max, argmax)
    over the table in its native layout — reshaping [B*bdash, V1] to
    [B, bdash, V1] splits the MAJOR dim, which is free — with previously
    chosen flat indices excluded inside the reduce's input fusion.

    Tie semantics match ``lax.top_k`` exactly: equal values resolve to the
    smaller flat index (the comparator prefers lower index on value ties,
    and exclusion rewrites a chosen element to (-inf, INT32_MAX) so even
    legitimate -inf entries — log_softmax underflow — are re-picked before
    any excluded slot).  Returns (values [B, k], flat indices [B, k])."""
    V1 = cand.shape[-1]
    c3 = cand.reshape(B, bdash, V1)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (B, bdash, V1), 1) * V1 +
            jax.lax.broadcasted_iota(jnp.int32, (B, bdash, V1), 2))
    imax = jnp.int32(np.iinfo(np.int32).max)
    ninf = jnp.float32(-jnp.inf)

    def _cmp(a, b):
        av, ai = a
        bv, bi = b
        take_a = (av > bv) | ((av == bv) & (ai < bi))
        return (jnp.where(take_a, av, bv), jnp.where(take_a, ai, bi))

    ys, ix = [], []
    for _ in range(k):
        v = c3
        fi = flat
        for cj in ix:
            hit = flat == cj[:, None, None]
            v = jnp.where(hit, ninf, v)
            fi = jnp.where(hit, imax, fi)
        mv, mi = jax.lax.reduce((v, fi), (ninf, imax), _cmp, (1, 2))
        ys.append(mv)
        ix.append(mi)
    return jnp.stack(ys, axis=1), jnp.stack(ix, axis=1)


def _beam_search_fast(dm: DecodeModel, init_logprobs, init_state,
                      feats_per_beam, rng, opt: Dict[str, Any],
                      dynamic_params: Optional[Dict]):
    """Single-group beam search with the table work fused at WRITE time.

    The general body carries the raw log-prob table and, each iteration,
    re-reads it for constraints, the unaug/entropy reductions, and the
    candidate add — profiled on the v5e at ~2.7 ms/step of pure layout
    copies plus ~1.0 ms of extra reduction passes over the [B*bdash, V+1]
    table.  Here the body carries the CANDIDATES table instead
    (log_softmax + beam-sum add fused into the model step's output pass)
    together with per-row ``row_sum``/``ent_row`` stats computed in that
    same pass, so the big table is materialized exactly once per step and
    feeds straight into top_k.

    Semantics are identical to the general body for G == 1 without the
    scatter constraints (decoding_constraint / remove_bad_endings route to
    the general body; UNK suppression IS supported here — it folds into
    the same elementwise pass).  Output dict matches beam_search.
    """
    temperature, length_penalty, apply_unk, unk_scale = _beam_dynamic_setup(
        dm, opt, dynamic_params)
    beam_size = int(opt.get('beam_size', 10))
    bdash = beam_size
    B = init_logprobs.shape[0]
    L = dm.seq_length
    V1 = dm.vocab_plus
    NBG = B * bdash
    use_anc = dm.beam_init is not None and dm.beam_reorder is not None
    # fused logit epilogue: the carried [NBG, V1] candidate table shrinks
    # to per-row top-bdash survivors (selection commutes with the per-row
    # beam-sum shift; at t=0 the lane-0 row's top-bdash covers the global
    # top-bdash).  temperature / unk suppression ride into the kernel as
    # traced scalars, so the dynamic-params program fuses too.
    fused = dm.step_topk is not None and NBG % 8 == 0

    state = repeat_tree(bdash, init_state)
    if use_anc:
        state = dm.beam_init(state, bdash)

    def _unk_adjust(lp):
        if not apply_unk:
            return lp
        col = jnp.arange(V1) == dm.unk_idx
        return lp + jnp.where(col, -1000.0 * unk_scale, 0.0)

    def _finish_table(raw_lp, sums):
        """One fused pass over the fresh [NBG, V1] table: temperature
        log-softmax, UNK suppression, the two carried-stat reductions, and
        the candidate add for the NEXT selection.  The big table stays 2-D
        end to end — every [B, bdash, V1] regrouping is a row-major bitcast
        — so XLA needs at most one layout conversion between the matmul
        output and the top-k sort (profiled: the 3-D carry forced three
        full extra passes over the 194 MB table per step)."""
        lsm = _unk_adjust(raw_lp)                            # [NBG, V1]
        row_sum = lsm.sum(-1)                                # [NBG]
        ent_row = -(jnp.exp(lsm) * lsm).sum(-1)              # [NBG]
        cand = lsm + sums.reshape(NBG)[:, None]
        # NOTE: carrying the table in the top-k input shape [B, bdash*V1]
        # was measured SLOWER (2362 vs 2625 cap/s): V1 is not a multiple of
        # the 128-lane tile, and fusing the padded-tile remap into this
        # write pass costs more than the loop's standalone copies
        return cand, row_sum.reshape(B, bdash), ent_row.reshape(B, bdash)

    # t = 0: every lane holds the bos distribution; lanes > 0 masked off
    lsm0 = _unk_adjust(init_logprobs)                       # [B, V1]
    if fused:
        # lane 0's per-row top-bdash covers the global top-bdash exactly
        tv0, ti0 = jax.lax.top_k(lsm0, bdash)               # [B, bdash]
        lane0 = jnp.arange(bdash) == 0
        cand = (jnp.where(lane0[None, :, None], tv0[:, None, :],
                          NEG).reshape(NBG, bdash),
                jnp.broadcast_to(ti0[:, None, :],
                                 (B, bdash, bdash)).reshape(NBG, bdash))
    else:
        first_mask = jnp.where(jnp.arange(bdash) > 0, NEG, 0.0)  # [bdash]
        cand = (lsm0[:, None, :] +
                first_mask[None, :, None]).reshape(NBG, V1)
    row_sum = jnp.broadcast_to(lsm0.sum(-1)[:, None], (B, bdash))
    ent_row = jnp.broadcast_to(
        -(jnp.exp(lsm0) * lsm0).sum(-1)[:, None], (B, bdash))

    beam_seq = jnp.zeros((B, bdash, L), jnp.int32)
    beam_unaug_cum = jnp.zeros((B, bdash), jnp.float32)
    beam_logprobs_sum = jnp.zeros((B, bdash), jnp.float32)
    beam_ent_cum = jnp.zeros((B, bdash), jnp.float32)
    beam_lp_cum = jnp.zeros((B, bdash), jnp.float32)
    pool_seq = jnp.zeros((B, bdash, L), jnp.int32)
    pool_p = jnp.full((B, bdash), NEG, jnp.float32)
    pool_unaug = jnp.full((B, bdash), NEG, jnp.float32)
    pool_ent = jnp.zeros((B, bdash), jnp.float32)
    pool_lpc = jnp.zeros((B, bdash), jnp.float32)

    step_rngs = jax.random.split(rng, L)

    def body(carry):
        (state, cand, row_sum, ent_row, beam_seq, beam_unaug_cum,
         beam_logprobs_sum, beam_ent_cum, beam_lp_cum,
         pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc, t) = carry
        step_rng = step_rngs[t]

        # ---- selection straight off the carried candidates ----
        # [NBG, V1] -> [B, bdash*V1] (padded-tile remap; padding V1 to the
        # 128-lane tile to make this a bitcast was measured SLOWER, 2560
        # vs 2625 cap/s — the concat pass costs more than the remap saves;
        # replacing the flat top_k with k fused variadic-reduce argmax
        # passes in the native layout (_topk_iterated) was ALSO measured
        # slower, 2710 vs 2879 cap/s with a 216 -> 493 s compile — XLA's
        # TPU lowering of tuple-operand reduce does not vectorize like the
        # single-operand reductions this step's budget assumed)
        if fused:
            # per-row survivors + the (per-row constant) beam-sum shift;
            # entries are (beam, rank)-ordered, so flat ties resolve to
            # the lowest beam then the lowest vocab index — the same
            # order the [B, bdash*V1] top_k walks
            tv_c, ti_c = cand
            cand_s = (tv_c.reshape(B, bdash, bdash) +
                      beam_logprobs_sum[:, :, None]
                      ).reshape(B, bdash * bdash)
            ys, jx = jax.lax.top_k(cand_s, bdash)
            beam_ix = jx // bdash
            sel_ix = jnp.take_along_axis(
                ti_c.reshape(B, bdash * bdash), jx, axis=1)
        else:
            ys, ix = jax.lax.top_k(cand.reshape(B, bdash * V1), bdash)
            beam_ix = ix // V1
            sel_ix = ix % V1

        time_onehot = jax.nn.one_hot(t, L, dtype=bool)      # [L]
        new_seq = jnp.where(time_onehot[None, None, :], sel_ix[..., None],
                            _select_rows(beam_seq, beam_ix))
        new_ucum = (jnp.take_along_axis(beam_unaug_cum, beam_ix, axis=1) +
                    jnp.take_along_axis(row_sum, beam_ix, axis=1))
        new_ent = (jnp.take_along_axis(beam_ent_cum, beam_ix, axis=1) +
                   jnp.take_along_axis(ent_row, beam_ix, axis=1))
        # chosen-token logprob: the top-k value minus the parent's sum (the
        # candidate was built as sum + lp in f32, so this recovers lp up to
        # one rounding — carried-stat tests bound it at 1e-4)
        chosen_lp = ys - jnp.take_along_axis(beam_logprobs_sum, beam_ix,
                                             axis=1)
        new_lpc = (jnp.take_along_axis(beam_lp_cum, beam_ix, axis=1) +
                   chosen_lp)
        new_sums = ys

        # ---- finished-beam pool merge (CaptionModel.py:182-198) ----
        just_ended = (sel_ix == dm.eos_idx) | (t == L - 1)
        cand_p = length_penalty((t + 1).astype(jnp.float32), new_sums)
        cand_p = jnp.where(just_ended, cand_p, NEG)
        merged_p = jnp.concatenate([pool_p, cand_p], axis=1)
        merged_unaug = jnp.concatenate([pool_unaug, new_ucum], axis=1)
        merged_seq = jnp.concatenate([pool_seq, new_seq], axis=1)
        merged_ent = jnp.concatenate([pool_ent, new_ent], axis=1)
        merged_lpc = jnp.concatenate([pool_lpc, new_lpc], axis=1)
        top_p, top_i = jax.lax.top_k(merged_p, bdash)
        pool_p = top_p
        pool_unaug = jnp.take_along_axis(merged_unaug, top_i, axis=1)
        pool_seq = _select_rows(merged_seq, top_i)
        pool_ent = jnp.take_along_axis(merged_ent, top_i, axis=1)
        pool_lpc = jnp.take_along_axis(merged_lpc, top_i, axis=1)
        new_sums = new_sums - 1000.0 * just_ended

        # ---- model step + fused table finish ----
        base = jnp.arange(B)[:, None] * bdash
        state_ix = (base + beam_ix).reshape(-1)
        it = sel_ix.reshape(NBG).astype(jnp.int32)
        if use_anc:
            new_state = dm.beam_reorder(state, state_ix)
        else:
            new_state = reorder_state(state, state_ix)
        if fused:
            tv_c, ti_c, rs, en, state = dm.step_topk(
                it, feats_per_beam, new_state, step_rng, bdash,
                jnp.float32(temperature),
                -1000.0 * jnp.float32(unk_scale) if apply_unk
                else jnp.float32(0.0),
                dm.unk_idx if apply_unk else -1,
                bdash if use_anc else 0)
            cand = (tv_c, ti_c)
            row_sum = rs.reshape(B, bdash)
            ent_row = en.reshape(B, bdash)
        elif use_anc:
            step_lp, state = dm.step(
                it, feats_per_beam, new_state, step_rng, False,
                uniform_t=True, beam_width=bdash)
            step_lp = jax.nn.log_softmax(step_lp / temperature, axis=-1)
            cand, row_sum, ent_row = _finish_table(step_lp, new_sums)
        else:
            step_lp, state = dm.step(
                it, feats_per_beam, new_state, step_rng, False,
                uniform_t=True)
            step_lp = jax.nn.log_softmax(step_lp / temperature, axis=-1)
            cand, row_sum, ent_row = _finish_table(step_lp, new_sums)

        return (state, cand, row_sum, ent_row, new_seq, new_ucum, new_sums,
                new_ent, new_lpc, pool_seq, pool_p, pool_unaug, pool_ent,
                pool_lpc, t + 1)

    def cond(carry):
        """EXACT early exit: stop once no image's pool can still change.

        Every future candidate's raw sum is bounded by the current max
        lane sum (log-probs are <= 0; finished lanes carry the -1000
        hits), and its penalized score by that sum pushed through the
        length penalty at the interval endpoints [t+2, L] (the penalty is
        monotone in length for fixed negative sums, so the max over the
        interval is at an endpoint).  When that bound cannot strictly
        beat the image's worst pool entry, the pool is final — ties keep
        the pool entry (it precedes the candidate in the merge top-k).
        Real captions finish well before seq_length, so this turns the
        fixed 20-step loop into ~len(longest caption)+1 steps.
        """
        t = carry[-1]
        sums = carry[6]
        pool_p_c = carry[10]
        max_sums = sums.max(1)                                 # [B]
        worst_pool = pool_p_c.min(1)                           # [B]
        # future candidates have lengths t+1..L; for the monotone penalties
        # the max over that interval is at an endpoint, and t+1 is included
        # explicitly so a length-DECREASING penalty (wu with a negative
        # traced alpha) still gets a sound bound
        bound = jnp.maximum(
            jnp.maximum(
                length_penalty(jnp.float32(L), max_sums),
                length_penalty((t + 2).astype(jnp.float32), max_sums)),
            length_penalty((t + 1).astype(jnp.float32), max_sums))
        return (t < L) & jnp.any(bound > worst_pool)

    carry0 = (state, cand, row_sum, ent_row, beam_seq, beam_unaug_cum,
              beam_logprobs_sum, beam_ent_cum, beam_lp_cum,
              pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc,
              jnp.int32(0))
    carry = jax.lax.while_loop(cond, body, carry0)
    (pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc) = carry[9:14]
    # same [B, G, bdash, ...] output contract as the general body (G = 1)
    return {'seq': pool_seq[:, None], 'p': pool_p[:, None],
            'unaug_p': pool_unaug[:, None], 'ent_sum': pool_ent[:, None],
            'lp_sum': pool_lpc[:, None]}


def beam_search(dm: DecodeModel, init_logprobs, init_state, feats_per_beam,
                rng, opt: Dict[str, Any],
                dynamic_params: Optional[Dict] = None):
    """Batched (diverse) beam search (reference CaptionModel.py:35-209).

    init_logprobs: [B, V+1] from the bos step (un-repeated batch).
    init_state:    state pytree with batch B.
    feats_per_beam: feats pytree repeated to B*G*bdash rows.

    Returns dict with pool seq [B, G, bdash, L], p [B, G, bdash]
    (sorted desc per group) and unaug_p.  Full per-step distributions are
    deliberately NOT carried through the scan (they are O(L*V) per beam —
    the dominant memory traffic); winners' distributions are replayed
    post-hoc by ``replay_beam_logps`` with identical constraint masks.
    """
    temperature, length_penalty, apply_unk, unk_scale = _beam_dynamic_setup(
        dm, opt, dynamic_params)
    beam_size = int(opt.get('beam_size', 10))
    group_size = int(opt.get('group_size', 1))
    diversity_lambda = float(opt.get('diversity_lambda', 0.5))
    decoding_constraint = int(opt.get('decoding_constraint', 0))
    remove_bad_endings = int(opt.get('remove_bad_endings', 0))
    if (group_size == 1 and not decoding_constraint and
            not remove_bad_endings and not int(opt.get('_beam_general', 0))):
        # production fast path: candidates carried, table work fused at
        # write time (see _beam_search_fast; `_beam_general: 1` forces the
        # general body for equivalence testing)
        return _beam_search_fast(dm, init_logprobs, init_state,
                                 feats_per_beam, rng, opt, dynamic_params)
    bdash = beam_size // group_size
    G = group_size
    B = init_logprobs.shape[0]
    L = dm.seq_length
    V1 = dm.vocab_plus
    NBG = B * G * bdash

    # replicate bos-step state/logprobs to every (group, beam) lane
    state = repeat_tree(G * bdash, init_state)
    use_anc = dm.beam_init is not None and dm.beam_reorder is not None
    if use_anc:
        state = dm.beam_init(state, bdash)
    logprobs_table = jnp.broadcast_to(
        init_logprobs[:, None, None, :], (B, G, bdash, V1))

    beam_seq = jnp.zeros((B, G, bdash, L), jnp.int32)
    beam_unaug_cum = jnp.zeros((B, G, bdash), jnp.float32)
    beam_logprobs_sum = jnp.zeros((B, G, bdash), jnp.float32)
    # carried eval statistics: cumulative entropy of the constrained
    # per-step distributions and cumulative chosen-token logprob along each
    # beam's ancestry.  These are the only two reductions eval_split needs
    # from the winners' distributions (reference eval_utils.py:173-174), so
    # carrying them lets sample_beam skip the whole winner-logprob replay
    # (want_logps=False).  [B, G, bdash] scalars — negligible scan traffic.
    beam_ent_cum = jnp.zeros((B, G, bdash), jnp.float32)
    beam_lp_cum = jnp.zeros((B, G, bdash), jnp.float32)

    pool_seq = jnp.zeros((B, G, bdash, L), jnp.int32)
    pool_p = jnp.full((B, G, bdash), NEG, jnp.float32)
    pool_unaug = jnp.full((B, G, bdash), NEG, jnp.float32)
    pool_ent = jnp.zeros((B, G, bdash), jnp.float32)
    pool_lpc = jnp.zeros((B, G, bdash), jnp.float32)

    T_total = L + G - 1
    step_rngs = jax.random.split(rng, T_total)

    def body(carry, xs):
        (state, logprobs_table, beam_seq, beam_unaug_cum,
         beam_logprobs_sum, beam_ent_cum, beam_lp_cum,
         pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc, t) = carry
        step_rng = xs

        # Groups are processed SEQUENTIALLY for the table math: the
        # reference's inner divm loop (CaptionModel.py:149-204) lets group g
        # read earlier groups' beam tables *after* their same-step reorder.
        # Only the model step is batched across groups (its inputs are the
        # end-of-step tokens, which have no intra-step dependency).
        cur_seq = [beam_seq[:, g] for g in range(G)]
        cur_ucum = [beam_unaug_cum[:, g] for g in range(G)]
        cur_sums = [beam_logprobs_sum[:, g] for g in range(G)]
        cur_ent = [beam_ent_cum[:, g] for g in range(G)]
        cur_lpc = [beam_lp_cum[:, g] for g in range(G)]
        cur_pseq = [pool_seq[:, g] for g in range(G)]
        cur_pp = [pool_p[:, g] for g in range(G)]
        cur_pu = [pool_unaug[:, g] for g in range(G)]
        cur_pent = [pool_ent[:, g] for g in range(G)]
        cur_plpc = [pool_lpc[:, g] for g in range(G)]
        sel_list, beamix_list, active_list = [], [], []

        beam_rng = jnp.arange(bdash)

        for g in range(G):
            local_t = t - g
            active = (local_t >= 0) & (local_t <= L - 1)
            lt = jnp.maximum(local_t, 0)

            lp = logprobs_table[:, g].reshape(B * bdash, V1)

            # ---- constraints (CaptionModel.py:154-162) ----
            prev_tok = cur_seq[g].reshape(B * bdash, L)[
                :, jnp.maximum(lt - 1, 0)]
            has_prev = local_t > 0
            if decoding_constraint:
                lp = lp.at[jnp.arange(B * bdash), prev_tok].add(
                    jnp.where(has_prev, -jnp.inf, 0.0))
            if remove_bad_endings and dm.bad_endings_ix:
                was_bad = _bad_endings_mask(prev_tok, dm.bad_endings_ix, V1)
                lp = lp.at[:, 0].add(
                    jnp.where(has_prev & was_bad, -jnp.inf, 0.0))
            if apply_unk:
                lp = lp.at[:, dm.unk_idx].add(-1000.0 * unk_scale)

            unaug_lp = lp.reshape(B, bdash, V1)

            # ---- diversity penalty (CaptionModel.py:38-55) ----
            if g > 0:
                toks = jnp.stack([cur_seq[i][:, :, lt] for i in range(g)],
                                 axis=1)            # [B, g, bdash]
                change = jax.nn.one_hot(toks, V1, dtype=jnp.float32
                                        ).sum(axis=(1, 2))  # [B, V1]
                lp3 = unaug_lp - diversity_lambda * change[:, None, :]
            else:
                lp3 = unaug_lp

            # ---- beam_step (CaptionModel.py:60-110) ----
            first_mask = jnp.where((local_t == 0) & (beam_rng > 0), NEG,
                                   0.0)              # [bdash]
            sums_for_step = cur_sums[g] + first_mask[None, :]
            candidates = sums_for_step[..., None] + lp3
            ys, ix = jax.lax.top_k(candidates.reshape(B, bdash * V1), bdash)
            beam_ix = ix // V1                      # [B, bdash]
            sel_ix = ix % V1

            time_onehot = jax.nn.one_hot(lt, L, dtype=bool)  # [L]
            new_seq = jnp.where(time_onehot[None, None, :],
                                sel_ix[..., None],
                                _select_rows(cur_seq[g], beam_ix))
            # running sum of the stored distributions' totals ('unaug_p',
            # CaptionModel.py:193) without carrying the distributions
            unaug_row_sum = unaug_lp.sum(-1)                  # [B, bdash]
            new_ucum = (jnp.take_along_axis(cur_ucum[g], beam_ix, axis=1) +
                        jnp.take_along_axis(unaug_row_sum, beam_ix, axis=1))
            # eval stats along the ancestry: both reductions fuse into the
            # same unaug_lp read as unaug_row_sum
            ent_row = -(jnp.exp(unaug_lp) * unaug_lp).sum(-1)  # [B, bdash]
            new_ent = (jnp.take_along_axis(cur_ent[g], beam_ix, axis=1) +
                       jnp.take_along_axis(ent_row, beam_ix, axis=1))
            chosen_lp = jnp.take_along_axis(
                unaug_lp.reshape(B, bdash * V1), beam_ix * V1 + sel_ix,
                axis=1)                                        # [B, bdash]
            new_lpc = (jnp.take_along_axis(cur_lpc[g], beam_ix, axis=1) +
                       chosen_lp)
            new_sums = ys

            # ---- finished-beam pool merge (CaptionModel.py:182-198) ----
            just_ended = (sel_ix == dm.eos_idx) | (local_t == L - 1)
            cand_p = length_penalty((lt + 1).astype(jnp.float32), new_sums)
            cand_p = jnp.where(just_ended, cand_p, NEG)
            cand_unaug = new_ucum

            merged_p = jnp.concatenate([cur_pp[g], cand_p], axis=1)
            merged_unaug = jnp.concatenate([cur_pu[g], cand_unaug], axis=1)
            merged_seq = jnp.concatenate([cur_pseq[g], new_seq], axis=1)
            merged_ent = jnp.concatenate([cur_pent[g], new_ent], axis=1)
            merged_lpc = jnp.concatenate([cur_plpc[g], new_lpc], axis=1)
            top_p, top_i = jax.lax.top_k(merged_p, bdash)
            new_pp = top_p
            new_pu = jnp.take_along_axis(merged_unaug, top_i, axis=1)
            new_pseq = _select_rows(merged_seq, top_i)
            new_pent = jnp.take_along_axis(merged_ent, top_i, axis=1)
            new_plpc = jnp.take_along_axis(merged_lpc, top_i, axis=1)

            new_sums = new_sums - 1000.0 * just_ended

            # ---- freeze if outside this group's time window ----
            cur_seq[g] = jnp.where(active, new_seq, cur_seq[g])
            cur_ucum[g] = jnp.where(active, new_ucum, cur_ucum[g])
            cur_sums[g] = jnp.where(active, new_sums, cur_sums[g])
            cur_ent[g] = jnp.where(active, new_ent, cur_ent[g])
            cur_lpc[g] = jnp.where(active, new_lpc, cur_lpc[g])
            cur_pseq[g] = jnp.where(active, new_pseq, cur_pseq[g])
            cur_pp[g] = jnp.where(active, new_pp, cur_pp[g])
            cur_pu[g] = jnp.where(active, new_pu, cur_pu[g])
            cur_pent[g] = jnp.where(active, new_pent, cur_pent[g])
            cur_plpc[g] = jnp.where(active, new_plpc, cur_plpc[g])
            sel_list.append(sel_ix)
            beamix_list.append(beam_ix)
            active_list.append(active)

        # ---- batched model step for all groups (CaptionModel.py:202-204) ----
        beam_ix_all = jnp.stack(beamix_list, axis=1)     # [B, G, bdash]
        base = (jnp.arange(B)[:, None, None] * G +
                jnp.arange(G)[None, :, None]) * bdash
        state_ix = (base + beam_ix_all).reshape(-1)
        it = jnp.stack(sel_list, axis=1).reshape(NBG).astype(jnp.int32)
        # One log-softmax, not two: the reference computes
        # log_softmax(log_softmax(logits)/T) (get_logprobs_state then
        # CaptionModel.py:204), which equals log_softmax(logits/T) exactly
        # (subtracting the row constant logsumexp(logits)/T is a no-op under
        # log_softmax), so the step returns raw logits and the outer
        # normalization happens once.
        if use_anc:
            new_state = dm.beam_reorder(state, state_ix)
            step_lp, stepped_state = dm.step(
                it, feats_per_beam, new_state, step_rng, False,
                uniform_t=(G == 1), beam_width=bdash)
        else:
            new_state = reorder_state(state, state_ix)
            step_lp, stepped_state = dm.step(
                it, feats_per_beam, new_state, step_rng, False,
                uniform_t=(G == 1))
        step_lp = jax.nn.log_softmax(step_lp / temperature, axis=-1)
        new_logprobs_table = step_lp.reshape(B, G, bdash, V1)

        if G == 1:
            # single group: local_t == t is always inside [0, L-1] for the
            # whole scan, so the freeze select is the identity — skipping it
            # saves a full read+write of every cache leaf per step
            logprobs_table = new_logprobs_table
            state = stepped_state
        else:
            active_vec = jnp.stack(active_list)          # [G]
            act_g = active_vec[None, :, None]
            act_rows = _expand_group(active_vec, B, bdash)
            logprobs_table = jnp.where(act_g[..., None], new_logprobs_table,
                                       logprobs_table)
            state = _where_tree(act_rows, stepped_state, state)

        beam_seq = jnp.stack(cur_seq, axis=1)
        beam_unaug_cum = jnp.stack(cur_ucum, axis=1)
        beam_logprobs_sum = jnp.stack(cur_sums, axis=1)
        beam_ent_cum = jnp.stack(cur_ent, axis=1)
        beam_lp_cum = jnp.stack(cur_lpc, axis=1)
        pool_seq = jnp.stack(cur_pseq, axis=1)
        pool_p = jnp.stack(cur_pp, axis=1)
        pool_unaug = jnp.stack(cur_pu, axis=1)
        pool_ent = jnp.stack(cur_pent, axis=1)
        pool_lpc = jnp.stack(cur_plpc, axis=1)

        return (state, logprobs_table, beam_seq, beam_unaug_cum,
                beam_logprobs_sum, beam_ent_cum, beam_lp_cum,
                pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc,
                t + 1), None

    carry0 = (state, logprobs_table, beam_seq, beam_unaug_cum,
              beam_logprobs_sum, beam_ent_cum, beam_lp_cum,
              pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc,
              jnp.int32(0))
    carry, _ = jax.lax.scan(body, carry0, step_rngs)
    (pool_seq, pool_p, pool_unaug, pool_ent, pool_lpc) = carry[7:12]
    return {'seq': pool_seq, 'p': pool_p, 'unaug_p': pool_unaug,
            'ent_sum': pool_ent, 'lp_sum': pool_lpc}


def _expand_group(vec_g, B, bdash):
    """[G] -> [B*G*bdash] by broadcasting over batch and beams."""
    G = vec_g.shape[0]
    return jnp.broadcast_to(vec_g[None, :, None], (B, G, bdash)).reshape(-1)


def replay_beam_logps(dm: DecodeModel, feats, seqs, rng,
                      opt: Dict[str, Any],
                      dynamic_params: Optional[Dict] = None):
    """Reproduce the per-step constrained distributions for given beam
    winners (what the reference stored as done_beams 'logps').

    seqs: [N, L]; feats must already be repeated to N rows.  Step 0 uses
    the raw bos-step log-softmax; steps >= 1 go through
    log_softmax(lp / temperature) exactly like the beam loop
    (CaptionModel.py:204), then the same constraint masks are applied.
    """
    temperature, _, apply_unk, unk_scale = _beam_dynamic_setup(
        dm, opt, dynamic_params)
    decoding_constraint = int(opt.get('decoding_constraint', 0))
    remove_bad_endings = int(opt.get('remove_bad_endings', 0))
    N, L = seqs.shape
    V1 = dm.vocab_plus
    state0 = dm.init_state(N)
    step_rngs = jax.random.split(rng, L)
    inputs = jnp.concatenate(
        [jnp.full((N, 1), dm.bos_idx, jnp.int32), seqs[:, :-1]], axis=1)

    def body(carry, xs):
        state, t = carry
        it, step_rng = xs
        # the input token at step t IS seq[t-1] (bos at t=0); the raw-logit
        # step + single log_softmax equals the reference's double
        # normalization (see beam_search body)
        lp, state = dm.step(it, feats, state, step_rng, False,
                            uniform_t=True)
        if isinstance(temperature, float) and temperature == 1.0:
            lp = jax.nn.log_softmax(lp, axis=-1)
        else:
            lp = jnp.where(t > 0,
                           jax.nn.log_softmax(lp / temperature, axis=-1),
                           jax.nn.log_softmax(lp, axis=-1))
        has_prev = t > 0
        if decoding_constraint:
            lp = lp.at[jnp.arange(N), it].add(
                jnp.where(has_prev, -jnp.inf, 0.0))
        if remove_bad_endings and dm.bad_endings_ix:
            was_bad = _bad_endings_mask(it, dm.bad_endings_ix, V1)
            lp = lp.at[:, 0].add(jnp.where(has_prev & was_bad, -jnp.inf, 0.0))
        if apply_unk:
            lp = lp.at[:, dm.unk_idx].add(-1000.0 * unk_scale)
        return (state, t + 1), lp

    (_, _), lps = jax.lax.scan(
        body, (state0, jnp.int32(0)),
        (inputs.T.astype(jnp.int32), step_rngs))
    lps = jnp.swapaxes(lps, 0, 1)
    # zero the steps past each winner's finish (pool seqs are 0-padded)
    keep = jnp.concatenate(
        [jnp.ones((N, 1), bool),
         (seqs[:, :-1] != dm.pad_idx) & (seqs[:, :-1] != dm.eos_idx)], 1)
    keep = jnp.cumprod(keep.astype(jnp.int32), axis=1).astype(bool)
    return jnp.where(keep[..., None], lps, 0.0)


def sample_beam(dm: DecodeModel, fc_feats, att_feats, att_masks, rng,
                opt: Dict[str, Any], want_logps: bool = True,
                dynamic_params: Optional[Dict] = None):
    """reference AttModel._sample_beam (:218-256).

    Returns (seq [B*sample_n, L], seqLogprobs [B*sample_n, L, V+1],
    done_beams dict from beam_search).

    With ``want_logps=False`` the winner-logprob replay (a second L-step
    scan, ~14%% of beam decode time) is skipped and the middle element is a
    stats dict {'ent_sum': [N], 'lp_sum': [N]} carried through the beam
    scan itself — exactly the two reductions eval_split takes from the full
    distributions (reference eval_utils.py:173-174).
    """
    beam_size = int(opt.get('beam_size', 10))
    group_size = int(opt.get('group_size', 1))
    sample_n = int(opt.get('sample_n', 1))
    bdash = beam_size // group_size
    assert sample_n == 1 or sample_n == bdash, \
        'when beam search, sample_n == 1 or beam search'
    B = fc_feats.shape[0]
    L = dm.seq_length

    rng, prep_rng, bos_rng, bs_rng = jax.random.split(rng, 4)
    feats = dm.prepare(fc_feats, att_feats, att_masks, prep_rng)
    # beam=True only for single-group beams: diverse groups decode with
    # STAGGERED per-row t, which the fused write+attend kernel (and its
    # merged-lane cache layout) cannot serve — models pick per-mode cache
    # layouts off this hint (transformer.init_state)
    state = dm.init_state(B, beam=(group_size == 1))
    it = jnp.full((B,), dm.bos_idx, jnp.int32)
    init_logprobs, state = dm.step(it, feats, state, bos_rng, True,
                                   uniform_t=True)
    # repeat by the EFFECTIVE beam count: when group_size does not divide
    # beam_size the reference floors (CaptionModel.beam_search bdash), so a
    # beam_size=5 group_size=2 run uses 4 rows per image, not 5.
    if dm.shared_beam_feats:
        # lanes of one (image, group) block share the encoder memory /
        # attention features; the model's shared attend path reads them
        # once per block (works with both the ancestry and the physical
        # reorder beam paths: state rows only ever permute inside a block)
        feats_per_beam = repeat_tree(group_size, feats)
    else:
        feats_per_beam = repeat_tree(group_size * bdash, feats)
    done = beam_search(dm, init_logprobs, state, feats_per_beam, bs_rng, opt,
                       dynamic_params=dynamic_params)

    if sample_n == 1:
        seq = done['seq'][:, 0, 0]                       # best of group 0
        replay_feats = feats
        if not want_logps:
            stats = {'ent_sum': done['ent_sum'][:, 0, 0],
                     'lp_sum': done['lp_sum'][:, 0, 0]}
            return seq, stats, done
    else:
        # group 0's bdash beams (reference :246-250 takes done_beams[k][:n])
        seq = done['seq'][:, 0].reshape(B * sample_n, L)
        # shared-feats models read one feats row per sample_n block directly
        # (shape-detected in their step), like sample() at the top of this
        # file — replicating would multiply the replay's cross-attend traffic
        replay_feats = (feats if dm.shared_beam_feats
                        else repeat_tree(sample_n, feats))
        if not want_logps:
            stats = {'ent_sum': done['ent_sum'][:, 0].reshape(B * sample_n),
                     'lp_sum': done['lp_sum'][:, 0].reshape(B * sample_n)}
            return seq, stats, done
    logps = replay_beam_logps(dm, replay_feats, seq, rng, opt,
                              dynamic_params=dynamic_params)
    return seq, logps, done


# ---------------------------------------------------------------------------
# diverse sampling (group-staggered sampling, not beam)
# ---------------------------------------------------------------------------

def diverse_sample(dm: DecodeModel, fc_feats, att_feats, att_masks, rng,
                   opt: Dict[str, Any]):
    """reference AttModel._diverse_sample (:354-449).

    Returns (seq [B*G, L], sampleLogprobs [B*G, L]).  Groups are folded
    into the batch; the diversity penalty replicates the reference's
    column-indexing semantics: every token chosen by *any* batch row of an
    earlier group at the same local time is penalized once for all rows.
    """
    sample_method = opt.get('sample_method', 'greedy')
    temperature = float(opt.get('temperature', 1.0))
    group_size = int(opt.get('group_size', 1))
    diversity_lambda = float(opt.get('diversity_lambda', 0.5))
    decoding_constraint = int(opt.get('decoding_constraint', 0))
    block_trigrams = int(opt.get('block_trigrams', 0))
    remove_bad_endings = int(opt.get('remove_bad_endings', 0))

    B = fc_feats.shape[0]
    G = group_size
    L = dm.seq_length
    V1 = dm.vocab_plus

    rng, prep_rng = jax.random.split(rng)
    feats = dm.prepare(fc_feats, att_feats, att_masks, prep_rng)
    # lane layout [B, G] flattened (repeat index fastest = group); shared-
    # attend models read one feats row per G-block directly
    feats_g = feats if dm.shared_beam_feats else repeat_tree(G, feats)
    state = dm.init_state(B * G)

    seq_tbl = jnp.zeros((B, G, L), jnp.int32)
    lp_tbl = jnp.zeros((B, G, L), jnp.float32)
    it_tbl = jnp.full((B, G), dm.bos_idx, jnp.int32)

    # group g is active for t in [g, L+g-1]; the last group finishes at
    # t = L+G-2, so L+G-1 steps cover every (group, position) pair
    T_total = L + G - 1
    step_rngs = jax.random.split(rng, T_total * 2).reshape(T_total, 2, -1)
    group_ids = jnp.arange(G)

    def body(carry, xs):
        state, seq_tbl, lp_tbl, it_tbl, t = carry
        rngs = xs
        local_t = t - group_ids                  # [G]
        active = (local_t >= 0) & (local_t <= L - 1)
        lt = jnp.maximum(local_t, 0)

        it_in = it_tbl.reshape(B * G)
        # raw logits + one log_softmax == the reference's double
        # normalization (see beam_search body)
        logprobs, new_state = dm.step(it_in, feats_g, state, rngs[0], False)
        logprobs = jax.nn.log_softmax(logprobs / temperature, axis=-1)
        lp4 = logprobs.reshape(B, G, V1)

        # diversity: tokens of earlier groups gs < gt at *gt's* local time,
        # pooled over the batch (the reference's column advanced-indexing
        # penalizes every row for any batch item's choice, AttModel.py:396)
        idx = jnp.broadcast_to(lt[None, :, None, None], (B, G, G, 1))
        toks = jnp.take_along_axis(
            jnp.broadcast_to(seq_tbl[:, None], (B, G, G, L)),
            idx, axis=3)[..., 0]                          # [B, Gt, Gs]
        chosen = jax.nn.one_hot(toks, V1, dtype=bool).any(0)   # [Gt, Gs, V1]
        src_before = (jnp.arange(G)[:, None] > jnp.arange(G)[None, :])
        # each earlier group's column assignment fires once per group
        # (duplicate indices collapse) but groups accumulate sequentially:
        # a column chosen by k earlier groups is penalized k times
        n_chosen = (chosen & src_before[..., None]).sum(1)     # [Gt, V1]
        lp4 = lp4 - diversity_lambda * n_chosen[None].astype(jnp.float32)

        lp = lp4.reshape(B * G, V1)
        prev_tok = jnp.take_along_axis(
            seq_tbl, jnp.maximum(lt - 1, 0)[None, :, None].repeat(B, 0),
            axis=2)[..., 0].reshape(B * G)
        has_prev = jnp.broadcast_to((local_t > 0)[None], (B, G)).reshape(-1)
        if decoding_constraint:
            lp = lp.at[jnp.arange(B * G), prev_tok].add(
                jnp.where(has_prev, -jnp.inf, 0.0))
        if remove_bad_endings and dm.bad_endings_ix:
            was_bad = _bad_endings_mask(prev_tok, dm.bad_endings_ix, V1)
            lp = lp.at[:, 0].add(jnp.where(has_prev & was_bad, -jnp.inf, 0.0))
        if block_trigrams:
            # per-group local times (reference _diverse_sample applies the
            # same trigram scheme per group, AttModel.py:411-437)
            t_rows = jnp.broadcast_to(lt[None], (B, G)).reshape(-1)
            lp = lp + _trigram_penalty(lp, seq_tbl.reshape(B * G, L), t_rows)

        it, sample_lp = sample_next_word(rngs[1], lp, sample_method, 1)
        it = it.reshape(B, G)
        sample_lp = sample_lp.reshape(B, G)

        # unfinished recomputed from the sequence (reference :440-445)
        first = (local_t == 0)[None]
        prev_tok2 = prev_tok.reshape(B, G)
        unfinished = (prev_tok2 != dm.pad_idx) & (prev_tok2 != dm.eos_idx)
        it = jnp.where(first | unfinished, it, dm.pad_idx)

        lt_col = lt[None, :, None].repeat(B, 0)
        onehot = jax.nn.one_hot(lt_col[..., 0], L, dtype=bool)
        new_seq_tbl = jnp.where(onehot, it[..., None], seq_tbl)
        new_lp_tbl = jnp.where(onehot, sample_lp[..., None], lp_tbl)

        act = active[None, :]
        seq_tbl = jnp.where(act[..., None], new_seq_tbl, seq_tbl)
        lp_tbl = jnp.where(act[..., None], new_lp_tbl, lp_tbl)
        it_tbl = jnp.where(act, it, it_tbl)
        act_rows = jnp.broadcast_to(act, (B, G)).reshape(-1)
        state = _where_tree(act_rows, new_state, state)
        return (state, seq_tbl, lp_tbl, it_tbl, t + 1), None

    carry0 = (state, seq_tbl, lp_tbl, it_tbl, jnp.int32(0))
    (_, seq_tbl, lp_tbl, _, _), _ = jax.lax.scan(body, carry0, step_rngs)
    return seq_tbl.reshape(B * G, L), lp_tbl.reshape(B * G, L)
