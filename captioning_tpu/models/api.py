"""Captioner: binds a flax module + params into the engine protocol.

The factory (``models.setup``) returns a Captioner wrapping one of the
model modules; ``bind()`` produces the pure ``DecodeModel`` closure bundle
the decoding engine scans over, and ``forward_tf`` is the teacher-forced
training forward (reference ``AttModel._forward``, AttModel.py:126-164 /
``TransformerModel._forward``, TransformerModel.py:340-348).
"""

from __future__ import annotations

import inspect
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..engine.decoding import DecodeModel, repeat_tree
from .harness import AttCaptioner, BAD_ENDINGS, ModelConfig, config_from_opt
from .transformer import TransformerCaptioner


def freeze_opt(opt: Dict[str, Any]):
    """Hashable jit-cache key from a decode-options dict (shared by
    Captioner and EnsembleCaptioner so the key logic cannot drift).
    dict/list values are excluded from the key — they are baked into the
    compiled closure, so callers must not mutate them between calls."""
    return tuple(sorted((k, v) for k, v in opt.items()
                        if not isinstance(v, (dict, list))))


def _vocab_indices(vocab: Optional[Dict[str, str]], vocab_size: int):
    """bad-ending ids (AttModel.py:96-97) and UNK id (CaptionModel.py:159)."""
    if vocab is None:
        return (), None
    bad_ix = tuple(int(k) for k, v in vocab.items() if v in BAD_ENDINGS)
    unk_idx = vocab_size if vocab.get(str(vocab_size)) == 'UNK' else None
    return bad_ix, unk_idx


class Captioner:
    """A model family instance: module + static metadata (not params)."""

    def __init__(self, cfg: ModelConfig, vocab: Optional[Dict[str, str]] = None):
        self.cfg = cfg
        self.vocab = vocab
        self.bad_endings_ix, self.unk_idx = _vocab_indices(vocab, cfg.vocab_size)
        if self.unk_idx is None and cfg.unk_idx is not None:
            # vocab-less construction (benches, programmatic use): honor an
            # explicit cfg.unk_idx so suppress_UNK doesn't silently no-op
            self.unk_idx = cfg.unk_idx
        if cfg.caption_model == 'transformer':
            self.module = TransformerCaptioner(cfg)
        elif cfg.caption_model == 'aoa':
            from .aoa import AoACaptioner
            self.module = AoACaptioner(cfg)
        elif cfg.caption_model == 'bert':
            from .bert_cap import BertCaptioner
            self.module = BertCaptioner(cfg)
        elif cfg.caption_model == 'm2transformer':
            from .m2 import M2Captioner
            self.module = M2Captioner(cfg)
        else:
            self.module = AttCaptioner(cfg)
        # transformer-family models own a parallel teacher-forcing path
        self.is_transformer = cfg.caption_model in (
            'transformer', 'bert', 'm2transformer')
        self._jit_cache: Dict[Any, Any] = {}

    # -- params ------------------------------------------------------------
    def init_params(self, rng, att_len: int = 4):
        cfg = self.cfg
        fc = jnp.zeros((1, max(cfg.fc_feat_size, 1)), jnp.float32)
        att = jnp.zeros((1, att_len, max(cfg.att_feat_size, 1)), jnp.float32)
        att_masks = jnp.ones((1, att_len), jnp.float32)
        it = jnp.zeros((1,), jnp.int32)
        variables = self.module.init(
            {'params': rng, 'dropout': rng}, fc, att, att_masks, it)
        if self.is_transformer:
            # TF path shares all step-path params; nothing extra to init.
            pass
        return variables

    # -- engine protocol ------------------------------------------------------
    def bind(self, variables, train: bool = False) -> DecodeModel:
        module = self.module
        cfg = self.cfg

        def _rngs(rng):
            return {'dropout': rng} if (train and rng is not None) else None

        def prepare(fc, att, att_masks, rng):
            out = module.apply(variables, fc, att, att_masks, train,
                               method=type(module).prepare_feature,
                               rngs=_rngs(rng),
                               mutable=['batch_stats'] if train else False)
            return out[0] if train else out

        # models whose cache layout differs between train and eval decode
        # (transformer's merged-lane pallas caches) take a train hint;
        # between beam and greedy decode, a beam hint (engine passes
        # beam=True from sample_beam's single-group route)
        _ist_params = inspect.signature(type(module).init_state).parameters
        _ist_train = 'train' in _ist_params
        _ist_beam = 'beam' in _ist_params

        def init_state(batch, beam=False):
            kw = {}
            if _ist_train:
                kw['train'] = train
            if _ist_beam:
                kw['beam'] = beam
            return module.init_state(batch, **kw)

        def step(it, feats, state, rng, logsoftmax=True, uniform_t=False,
                 beam_width=0):
            out = module.apply(variables, it, feats, state, train, logsoftmax,
                               uniform_t, beam_width,
                               method=type(module).step, rngs=_rngs(rng),
                               mutable=['batch_stats'] if train else False)
            return out[0] if train else out

        beam_init = beam_reorder = None
        if getattr(type(module), 'SUPPORTS_BEAM_ANCESTRY', False):
            def _is_cache(name):
                # 'k0'/'v0'...: per-layer [B, h, T, dk] caches — every
                # production model (transformer/bert/m2) uses these since the
                # stacked-cache revert.  The bare 'k'/'v' branch is kept only
                # for stacked [B, L, h, T, dk] cache experiments
                # (ops/anc_attend.py's layout).
                return name[:1] in ('k', 'v') and (name[1:].isdigit()
                                                   or name[1:] == '')

            def beam_init(state, bdash):
                # ancestry table: every past position initially lives in the
                # row's own slot (the bos entry was replicated to all lanes)
                n = state['t'].shape[0]
                T = state['k0' if 'k0' in state else 'k'].shape[-2]
                anc = jnp.broadcast_to(
                    (jnp.arange(n, dtype=jnp.int32) % bdash)[:, None], (n, T))
                return dict(state, anc=anc)

            def beam_reorder(state, flat_idx):
                # physical K/V slots never move; rows inherit the parent's
                # ancestry (and scalar leaves) by gather
                return {kk: (vv if _is_cache(kk)
                             else jnp.take(vv, flat_idx, axis=0))
                        for kk, vv in state.items()}

        # fused logit epilogue: eval-only, TPU, bf16 compute (the resident
        # generator weight block must fit VMEM; ~10 MB at the COCO vocab)
        step_topk = None
        V1 = cfg.vocab_size + 1
        if (getattr(type(module), 'SUPPORTS_FUSED_LOGIT', False)
                and not train and cfg.use_pallas
                and cfg.dtype == jnp.bfloat16
                and jax.default_backend() == 'tpu'
                and cfg.d_model * (-(-V1 // 512) * 512) * 2
                <= 11 * 1024 * 1024):
            from ..ops.logit_topk import logit_topk
            gen = variables['params']['generator']

            def step_topk(it, feats, state, rng, k, temp, unk_bias,
                          unk_idx, beam_width=0):
                # temp / unk_bias may be traced scalars (the engine's
                # dynamic eval params); k / unk_idx / beam_width are static
                hid, st = module.apply(
                    variables, it, feats, state, False, False, True,
                    beam_width, True, method=type(module).step)
                tv, ti, rs, en = logit_topk(
                    hid, gen['kernel'].astype(cfg.dtype), gen['bias'],
                    temp, unk_bias, k=int(k), unk_idx=int(unk_idx))
                return tv, ti, rs, en, st

        return DecodeModel(
            prepare=prepare, init_state=init_state, step=step,
            seq_length=cfg.seq_length, vocab_plus=cfg.vocab_size + 1,
            bos_idx=cfg.bos_idx, eos_idx=cfg.eos_idx, pad_idx=cfg.pad_idx,
            unk_idx=self.unk_idx, bad_endings_ix=self.bad_endings_ix,
            beam_init=beam_init, beam_reorder=beam_reorder,
            shared_beam_feats=self._shared_beam_feats(),
            step_topk=step_topk)

    # RNN-harness models whose cores touch attention features ONLY through
    # AttentionHead (layers.additive_attention handles block-shared rows);
    # adaatt reads p_att_feats directly in its sentinel core and newfc/
    # language_model/fc/show_tell have no att features to share.
    _SHARED_FEATS_RNN = ('att2in', 'att2in2', 'att2all2', 'updown',
                         'topdown', 'stackatt', 'denseatt')

    def _shared_beam_feats(self) -> bool:
        if getattr(type(self.module), 'SUPPORTS_SHARED_BEAM_FEATS', False):
            return True
        return (isinstance(self.module, AttCaptioner) and
                self.cfg.caption_model in self._SHARED_FEATS_RNN)

    def bn_stats_after_prepare(self, variables, fc_feats, att_feats,
                               att_masks, rng):
        """Updated ``batch_stats`` after one train-mode prepare_feature.

        The RL train steps decode through ``bind(train=True)``, whose
        functional apply discards the mutated batch_stats collection; this
        recomputes the update that decode's prepare performed so trainers
        can thread running statistics through SCST/structure steps the way
        the reference's stateful model.train() forwards do.  ``rng`` must be
        the decode's own prepare rng (``decoding.prep_rng_for_sample``):
        use_bn=2 normalizes the post-dropout embed output, so the statistics
        depend on the dropout mask."""
        if 'batch_stats' not in variables:
            return None
        _, new_vars = self.module.apply(
            variables, fc_feats, att_feats, att_masks, True,
            method=type(self.module).prepare_feature, rngs={'dropout': rng},
            mutable=['batch_stats'])
        return new_vars['batch_stats']

    # -- teacher forcing -------------------------------------------------------
    def forward_tf(self, variables, fc_feats, att_feats, seq, att_masks,
                   ss_prob: float = 0.0, rng=None, train: bool = False,
                   return_new_vars: bool = False):
        """Teacher-forced logprobs [N, T, V+1] over seq (input tokens).

        ``seq`` is labels[..., :-1] per the reference call
        (loss_wrapper.py:55).  Scheduled sampling follows
        AttModel.py:145-154: from step 1 on, each row independently feeds
        the model a sample from its previous output with prob ss_prob.

        With return_new_vars (train only), also returns variables with
        updated batch_stats so use_bn running statistics accumulate.
        """
        if seq.ndim == 3:
            seq = seq.reshape(-1, seq.shape[2])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        has_stats = 'batch_stats' in variables

        if self.is_transformer:
            out = self.module.apply(
                variables, fc_feats, att_feats, seq, att_masks, train,
                method=type(self.module).forward_tf,
                rngs={'dropout': rng} if train else None,
                mutable=['batch_stats'] if train else False)
            if train:
                logprobs, updated = out
            else:
                logprobs, updated = out, {}
            if return_new_vars:
                new_vars = dict(variables, **updated) if (
                    train and has_stats) else variables
                return logprobs, new_vars
            return logprobs

        cfg = self.cfg
        B = fc_feats.shape[0]
        N, T = seq.shape
        seq_per_img = N // B
        rng, prep_rng = jax.random.split(rng)
        dm = self.bind(variables, train)
        # BN lives only in the feature prepare; capture its stats update
        new_vars = variables
        if train and has_stats:
            feats_and_stats = self.module.apply(
                variables, fc_feats, att_feats, att_masks, train,
                method=type(self.module).prepare_feature,
                rngs={'dropout': prep_rng}, mutable=['batch_stats'])
            feats, updated = feats_and_stats
            new_vars = dict(variables, **updated)
        else:
            feats = dm.prepare(fc_feats, att_feats, att_masks, prep_rng)
        if not dm.shared_beam_feats:
            # shared-attend models read one feats row per seq_per_img block
            # directly (shape-detected in their step)
            feats = repeat_tree(seq_per_img, feats)
        state0 = dm.init_state(N)

        # ss_prob may be a traced scalar (it changes on an epoch schedule,
        # train.py:144-147); keep one compiled graph by always building the
        # scheduled-sampling branch under train.
        use_ss = train
        step_rngs = jax.random.split(rng, T * 3).reshape(T, 3, -1)

        def body(carry, xs):
            state, prev_logprobs, t = carry
            it_gt, rngs = xs
            if use_ss:
                coin = jax.random.uniform(rngs[0], (N,)) < ss_prob
                sampled = jax.random.categorical(rngs[1], prev_logprobs, axis=1)
                it = jnp.where((t >= 1) & coin, sampled, it_gt)
            else:
                it = it_gt
            logprobs, state = dm.step(it, feats, state, rngs[2], True)
            return (state, logprobs, t + 1), logprobs

        zeros_lp = jnp.zeros((N, cfg.vocab_size + 1), jnp.float32)
        (_, _, _), outputs = jax.lax.scan(
            body, (state0, zeros_lp, jnp.int32(0)),
            (seq.T.astype(jnp.int32), step_rngs))
        logprobs = jnp.swapaxes(outputs, 0, 1)
        if return_new_vars:
            return logprobs, new_vars
        return logprobs


    # -- jitted entry points -------------------------------------------------
    def _freeze_opt(self, opt: Dict[str, Any]):
        return freeze_opt(opt)

    def sample_jit(self, variables, fc_feats, att_feats, att_masks, rng,
                   opt: Dict[str, Any], train: bool = False):
        """Jit-compiled sample(); one compilation per (opt, train, shapes)."""
        from ..engine import decoding
        key = ('sample', self._freeze_opt(opt), train)
        if key not in self._jit_cache:
            opt_c = dict(opt)

            def fn(variables, fc, att, am, rng):
                dm = self.bind(variables, train)
                return decoding.sample(dm, fc, att, am, rng, opt_c)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables, fc_feats, att_feats,
                                    att_masks, rng)

    @staticmethod
    def _dynamic_sample_params(sample_method: str, temperature: float):
        """Map a sample-family method string to traced operands for
        sample_next_word_dynamic (0=greedy, 1=gumbel, 2=categorical)."""
        import numpy as _np
        method_id, top_k, top_p = 2, 0, 0.0
        if sample_method == 'greedy':
            method_id = 0
        elif sample_method == 'gumbel':
            method_id = 1
        elif sample_method.startswith('top'):
            top_num = float(sample_method[3:])
            if 0 < top_num < 1:
                top_p = top_num
            else:
                top_k = int(top_num)
        elif sample_method != 'sample':
            return None  # not a sample-family method
        return {'method_id': jnp.int32(method_id),
                'temperature': jnp.float32(temperature),
                'top_k': jnp.int32(top_k), 'top_p': jnp.float32(top_p)}

    def sample_dynamic_jit(self, variables, fc_feats, att_feats, att_masks,
                           rng, opt: Dict[str, Any], train: bool = False):
        """sample() with the sampling method/params as traced operands: ONE
        compiled program serves greedy/sample/gumbel/top-k/top-p at equal
        shapes and constraint flags (compile-time hygiene, VERDICT item 10).

        Falls back to sample_jit for methods outside the shared family
        (beam routing, diverse groups).
        """
        from ..engine import decoding
        sample_method = opt.get('sample_method', 'greedy')
        beam_size = int(opt.get('beam_size', 1) or 1)
        group_size = int(opt.get('group_size', 1) or 1)
        dyn = self._dynamic_sample_params(
            sample_method, float(opt.get('temperature', 1.0) or 1.0))
        if dyn is None or group_size > 1 or (
                beam_size > 1 and sample_method in ('greedy', 'beam_search')):
            return self.sample_jit(variables, fc_feats, att_feats, att_masks,
                                   rng, opt, train)
        # structural key only: method/temperature/top-* are operands
        opt_s = {k: v for k, v in opt.items()
                 if k not in ('sample_method', 'temperature')}
        key = ('sample_dyn', self._freeze_opt(opt_s), train)
        if key not in self._jit_cache:
            opt_c = dict(opt_s, sample_method='sample')

            def fn(variables, fc, att, am, rng, dyn):
                dm = self.bind(variables, train)
                return decoding.sample(dm, fc, att, am, rng, opt_c,
                                       dynamic_params=dyn)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables, fc_feats, att_feats,
                                    att_masks, rng, dyn)

    @staticmethod
    def _dynamic_beam_params(opt: Dict[str, Any]):
        """(static lp type, traced operands) for the beam program: the
        temperature, UNK suppression, and length-penalty alpha become
        runtime scalars so eval sweeps over them reuse ONE compiled
        program per (beam_size, group_size, shapes)."""
        lp_spec = opt.get('length_penalty', '') or ''
        alpha = float(lp_spec.split('_')[1]) if lp_spec else 0.0
        pen_type = lp_spec.split('_')[0] if lp_spec else ''
        dyn = {'temperature': jnp.float32(opt.get('temperature', 1.0) or 1.0),
               'suppress_unk': jnp.float32(
                   1.0 if int(opt.get('suppress_UNK', 0) or 0) else 0.0),
               'lp_alpha': jnp.float32(alpha)}
        return pen_type, dyn

    def sample_stats_jit(self, variables, fc_feats, att_feats, att_masks,
                         rng, opt: Dict[str, Any]):
        """Eval-path sample(): returns (seq, {'ent_sum', 'lp_sum'}) with
        the entropy/perplexity sums carried through the scan instead of
        materializing (and shipping to the host) the full [N, L, V+1]
        distribution table — ~777 MB per batch at production shapes.
        Sampling params ride as traced operands like sample_dynamic_jit.

        Returns None when the method is outside the sample family (beam /
        diverse routing) — the caller falls back to the table-returning
        paths.
        """
        from ..engine import decoding
        sample_method = opt.get('sample_method', 'greedy')
        beam_size = int(opt.get('beam_size', 1) or 1)
        group_size = int(opt.get('group_size', 1) or 1)
        dyn = self._dynamic_sample_params(
            sample_method, float(opt.get('temperature', 1.0) or 1.0))
        if dyn is None or group_size > 1 or (
                beam_size > 1 and sample_method in ('greedy', 'beam_search')):
            return None
        opt_s = {k: v for k, v in opt.items()
                 if k not in ('sample_method', 'temperature')}
        # greedy (the production eval default) keeps its method STATIC so
        # the fused logit epilogue (engine fused_greedy) can engage — one
        # extra cached program; temperature/top-k/top-p still ride as
        # operands, and the dynamic family program serves everything else
        greedy_static = sample_method == 'greedy'
        key = ('sample_stats', self._freeze_opt(opt_s), greedy_static)
        if key not in self._jit_cache:
            opt_c = dict(opt_s,
                         sample_method='greedy' if greedy_static
                         else 'sample')

            def fn(variables, fc, att, am, rng, dyn):
                dm = self.bind(variables, False)
                return decoding.sample(dm, fc, att, am, rng, opt_c,
                                       dynamic_params=dyn,
                                       return_stats=True)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables, fc_feats, att_feats,
                                    att_masks, rng, dyn)

    def sample_beam_jit(self, variables, fc_feats, att_feats, att_masks, rng,
                        opt: Dict[str, Any], train: bool = False,
                        want_logps: bool = True):
        """Jit-compiled sample_beam(); returns (seq, logps, done_beams).

        want_logps=False skips the winner-logprob replay scan; the middle
        element is then {'ent_sum', 'lp_sum'} per row (see decoding).

        temperature / suppress_UNK / length-penalty alpha are traced
        operands (compile-key hygiene): only the penalty TYPE and the
        structural flags key the compiled program.
        """
        from ..engine import decoding
        pen_type, dyn = self._dynamic_beam_params(opt)
        opt_s = {k: v for k, v in opt.items()
                 if k not in ('temperature', 'suppress_UNK',
                              'length_penalty')}
        key = ('beam', pen_type, self._freeze_opt(opt_s), train, want_logps)
        if key not in self._jit_cache:
            # the closed-over opt keeps length_penalty so beam_search can
            # read the static penalty type; the traced alpha overrides it
            opt_c = dict(opt_s, length_penalty=opt.get('length_penalty', ''))

            def fn(variables, fc, att, am, rng, dyn):
                dm = self.bind(variables, train)
                return decoding.sample_beam(dm, fc, att, am, rng, opt_c,
                                            want_logps=want_logps,
                                            dynamic_params=dyn)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](variables, fc_feats, att_feats,
                                    att_masks, rng, dyn)

    def forward_tf_jit(self, variables, fc_feats, att_feats, seq, att_masks,
                       ss_prob=0.0, rng=None, train: bool = False):
        key = ('tf', train)
        if key not in self._jit_cache:
            def fn(variables, fc, att, seq, am, ss_prob, rng):
                return self.forward_tf(variables, fc, att, seq, am,
                                       ss_prob, rng, train)
            self._jit_cache[key] = jax.jit(fn)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self._jit_cache[key](variables, fc_feats, att_feats, seq,
                                    att_masks, jnp.float32(ss_prob), rng)


def setup(opt, vocab: Optional[Dict[str, str]] = None) -> Captioner:
    """Model factory (reference models/__init__.py:20-73)."""
    supported = ('fc', 'language_model', 'newfc', 'show_tell', 'att2in',
                 'att2in2', 'att2all2', 'adaatt', 'adaattmo', 'topdown',
                 'updown', 'stackatt', 'denseatt', 'transformer', 'aoa',
                 'bert', 'm2transformer')
    if opt.caption_model not in supported:
        raise Exception("Caption model not supported: {}".format(
            opt.caption_model))
    if opt.caption_model in ('fc', 'show_tell'):
        print('Warning: %s model is mostly deprecated; prefer newfc.'
              % opt.caption_model)
    cfg = config_from_opt(opt, opt.vocab_size)
    return Captioner(cfg, vocab)
