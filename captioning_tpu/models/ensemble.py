"""Inference-time model ensemble.

TPU-native counterpart of ``/root/reference/captioning/models/AttEnsemble.py``:
per-step probabilities of each member are weighted-averaged in probability
space, then logged (AttEnsemble.py:56).  Instead of packed state lists,
the ensemble state is a dict of per-member state pytrees — beam reordering
gathers every leaf uniformly.

When all members share one architecture the per-member steps could be a
single vmap over stacked params; members here may differ (e.g. updown +
transformer), so the general form runs them side by side — XLA still fuses
them into one program.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..engine.decoding import DecodeModel


class EnsembleCaptioner:
    """Captioner-compatible facade over N (captioner, variables) members."""

    def __init__(self, captioners: List, weights: Optional[Sequence[float]]
                 = None):
        self.members = captioners
        self.cfg = captioners[0].cfg
        self.vocab = captioners[0].vocab
        self.bad_endings_ix = captioners[0].bad_endings_ix
        self.unk_idx = captioners[0].unk_idx
        w = jnp.asarray(weights if weights is not None
                        else [1.0] * len(captioners), jnp.float32)
        self.weights = w / w.sum()
        self._jit_cache: Dict = {}

    def bind(self, variables_list, train: bool = False) -> DecodeModel:
        dms = [c.bind(v, train) for c, v in zip(self.members, variables_list)]
        weights = self.weights

        def prepare(fc, att, att_masks, rng):
            return {'m%d' % i: dm.prepare(fc, att, att_masks, rng)
                    for i, dm in enumerate(dms)}

        def init_state(batch, beam=False):
            return {'m%d' % i: dm.init_state(batch, beam=beam)
                    for i, dm in enumerate(dms)}

        def step(it, feats, state, rng, logsoftmax=True, uniform_t=False,
                 beam_width=0):
            probs = None
            new_state = {}
            for i, dm in enumerate(dms):
                # beam ancestry is per-member: only members whose caches
                # were beam_init'ed attend through an ancestry table
                bw = beam_width if dm.beam_init is not None else 0
                lp, st = dm.step(it, feats['m%d' % i], state['m%d' % i],
                                 rng, True, uniform_t=uniform_t,
                                 beam_width=bw)
                p = jnp.exp(lp) * weights[i]
                probs = p if probs is None else probs + p
                new_state['m%d' % i] = st
            logprobs = jnp.log(jnp.maximum(probs, 1e-38))
            return logprobs, new_state

        def beam_init(state, bdash):
            return {'m%d' % i: (dm.beam_init(state['m%d' % i], bdash)
                                if dm.beam_init is not None
                                else state['m%d' % i])
                    for i, dm in enumerate(dms)}

        def beam_reorder(state, flat_idx):
            from ..engine.decoding import reorder_state
            return {'m%d' % i: (dm.beam_reorder(state['m%d' % i], flat_idx)
                                if dm.beam_reorder is not None
                                else reorder_state(state['m%d' % i],
                                                   flat_idx))
                    for i, dm in enumerate(dms)}

        cfg = self.cfg
        return DecodeModel(
            prepare=prepare, init_state=init_state, step=step,
            seq_length=cfg.seq_length, vocab_plus=cfg.vocab_size + 1,
            bos_idx=cfg.bos_idx, eos_idx=cfg.eos_idx, pad_idx=cfg.pad_idx,
            unk_idx=self.unk_idx, bad_endings_ix=self.bad_endings_ix,
            beam_init=beam_init, beam_reorder=beam_reorder,
            # block-shared beam feats only when EVERY member shape-detects
            # blocks (each member's step sees its own feats, so the layout
            # must be uniform across members)
            shared_beam_feats=all(dm.shared_beam_feats for dm in dms))

    # jitted eval-time entry points mirroring Captioner
    def _freeze_opt(self, opt):
        from .api import freeze_opt
        return freeze_opt(opt)

    def sample_jit(self, variables_list, fc, att, am, rng, opt,
                   train: bool = False):
        from ..engine import decoding
        key = ('sample', self._freeze_opt(opt), train)
        if key not in self._jit_cache:
            opt_c = dict(opt)

            def fn(variables_list, fc, att, am, rng):
                dm = self.bind(variables_list, train)
                return decoding.sample(dm, fc, att, am, rng, opt_c)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables_list, fc, att, am, rng)

    def sample_beam_jit(self, variables_list, fc, att, am, rng, opt,
                        train: bool = False, want_logps: bool = True):
        from ..engine import decoding
        key = ('beam', self._freeze_opt(opt), train, want_logps)
        if key not in self._jit_cache:
            opt_c = dict(opt)

            def fn(variables_list, fc, att, am, rng):
                dm = self.bind(variables_list, train)
                return decoding.sample_beam(dm, fc, att, am, rng, opt_c,
                                            want_logps=want_logps)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables_list, fc, att, am, rng)

    def forward_tf_jit(self, variables_list, fc, att, seq, am,
                       ss_prob=0.0, rng=None, train: bool = False):
        """Ensemble TF loss path: average member probabilities per step.
        ``ss_prob`` is a traced operand, as in Captioner.forward_tf_jit."""
        key = ('tf', train)
        if key not in self._jit_cache:
            def fn(variables_list, fc, att, seq, am, ss_prob, rng):
                probs = None
                for c, v, w in zip(self.members, variables_list,
                                   self.weights):
                    lp = c.forward_tf(v, fc, att, seq, am, ss_prob, rng,
                                      train)
                    p = jnp.exp(lp) * w
                    probs = p if probs is None else probs + p
                return jnp.log(jnp.maximum(probs, 1e-38))
            self._jit_cache[key] = jax.jit(fn)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._jit_cache[key](variables_list, fc, att, seq, am,
                                    jnp.float32(ss_prob), rng)
