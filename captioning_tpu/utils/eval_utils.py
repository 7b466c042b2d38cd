"""Validation / test evaluation loop.

Behavioural port of ``/root/reference/captioning/utils/eval_utils.py``:
``eval_split`` iterates a split, optionally computes teacher-forced loss,
generates captions with forced sample_n=1, accumulates entropy/perplexity
from the stored per-step logprob distributions, truncates to num_images,
and runs ``language_eval`` (here against the native coco_eval stack).
``eval_split_n`` implements the multi-sample harness (bs / sample / gumbel
/ top-k/p / dbs / diverse-*) for diversity evaluation.
"""

from __future__ import annotations

import json
import os
import jax
import jax.numpy as jnp
import numpy as np

from . import misc as utils
from .coco_eval import AnnotationDB, evaluate_captions

bad_endings = ['a', 'an', 'the', 'in', 'for', 'at', 'of', 'with', 'before',
               'after', 'on', 'upon', 'near', 'to', 'is', 'are', 'am', 'the']


def count_bad(sen):
    sen = sen.split(' ')
    return 1 if sen and sen[-1] in bad_endings else 0


def getCOCO(dataset) -> AnnotationDB:
    """Annotation file selection (reference eval_utils.py:39-44)."""
    if 'coco' in dataset:
        ann_file = 'coco-caption/annotations/captions_val2014.json'
        if not os.path.isfile(ann_file):
            ann_file = 'data/captions_val2014.json'
    elif 'flickr30k' in dataset or 'f30k' in dataset:
        ann_file = 'data/f30k_captions4eval.json'
    else:
        ann_file = dataset  # explicit path
    return AnnotationDB(ann_file)


def language_eval(dataset, preds, preds_n, eval_kwargs, split):
    """reference eval_utils.py:47-126 with native scorers."""
    model_id = eval_kwargs.get('id', '')
    eval_oracle = eval_kwargs.get('eval_oracle', 0)

    out = {}

    if len(preds_n) > 0:
        if 'coco' in dataset:
            dataset_file = 'data/dataset_coco.json'
        elif 'flickr30k' in dataset or 'f30k' in dataset:
            dataset_file = 'data/dataset_flickr30k.json'
        else:
            dataset_file = None
        if dataset_file and os.path.isfile(dataset_file):
            training_sentences = set(
                ' '.join(s['tokens'])
                for img in json.load(open(dataset_file))['images']
                if img.get('split') not in ['val', 'test']
                for s in img['sentences'])
            generated_sentences = set(p['caption'] for p in preds_n)
            novels = generated_sentences - training_sentences
            out['novel_sentences'] = float(len(novels)) / len(preds_n)
            words = []
            for s in generated_sentences:
                words += s.split()
            out['vocab_size'] = len(set(words))

    if not os.path.isdir('eval_results'):
        os.makedirs('eval_results', exist_ok=True)
    cache_path = os.path.join('eval_results/',
                              '.cache_' + model_id + '_' + split + '.json')

    coco = getCOCO(dataset)
    valids = coco.valid_ids

    preds_filt = [p for p in preds if p['image_id'] in valids]
    mean_perplexity = (sum(p['perplexity'] for p in preds_filt) /
                       max(len(preds_filt), 1))
    mean_entropy = (sum(p['entropy'] for p in preds_filt) /
                    max(len(preds_filt), 1))
    print('using %d/%d predictions' % (len(preds_filt), len(preds)))
    json.dump(preds_filt, open(cache_path, 'w'))

    ids = [p['image_id'] for p in preds_filt]
    res = {p['image_id']: [p['caption']] for p in preds_filt}
    gts = coco.gts_for(ids)
    overall, img_to_eval = evaluate_captions(gts, res)
    out.update(overall)
    out['perplexity'] = mean_perplexity
    out['entropy'] = mean_entropy

    # per-category SPICE breakdown (reference eval_utils.py:96-99); present
    # only when the jar-gated SPICE ran
    if img_to_eval and 'SPICE' in next(iter(img_to_eval.values())):
        for k in next(iter(img_to_eval.values()))['SPICE'].keys():
            if k != 'All':
                vals = np.array([v['SPICE'][k]['f']
                                 for v in img_to_eval.values()])
                finite = vals[vals == vals]
                # all-NaN category (never fired on this set): explicit None
                # rather than an empty-slice nan mean
                out['SPICE_' + k] = (float(finite.mean()) if finite.size
                                     else None)

    for p in preds_filt:
        img_to_eval[p['image_id']]['caption'] = p['caption']

    if len(preds_n) > 0:
        from . import eval_multi
        cache_path_n = os.path.join(
            'eval_results/', '.cache_' + model_id + '_' + split + '_n.json')
        allspice = eval_multi.eval_allspice(dataset, preds_n, model_id, split)
        if allspice:
            out.update(allspice['overall'])
        div_stats = eval_multi.eval_div_stats(dataset, preds_n, model_id, split)
        out.update(div_stats['overall'])
        if eval_oracle:
            oracle = eval_multi.eval_oracle(dataset, preds_n, model_id, split)
            out.update(oracle['overall'])
        else:
            oracle = None
        self_cider = eval_multi.eval_self_cider(dataset, preds_n, model_id,
                                                split)
        out.update(self_cider['overall'])
        with open(cache_path_n, 'w') as outfile:
            json.dump({'allspice': allspice, 'div_stats': div_stats,
                       'oracle': oracle, 'self_cider': self_cider}, outfile)

    out['bad_count_rate'] = (sum(count_bad(p['caption'])
                                 for p in preds_filt) /
                             float(max(len(preds_filt), 1)))
    outfile_path = os.path.join('eval_results/',
                                model_id + '_' + split + '.json')
    with open(outfile_path, 'w') as outfile:
        json.dump({'overall': out, 'imgToEval': img_to_eval}, outfile)

    return out


def _stats_from_sums(seq, stats, real_rows):
    """Per-caption entropy/perplexity from carried scan sums — the same two
    reductions the reference takes from the stored distributions
    (eval_utils.py:173-174), shared by the beam and sample fast paths."""
    seq = np.asarray(seq)[:real_rows]
    denom = (seq > 0).sum(1) + 1
    entropy = np.asarray(stats['ent_sum'])[:real_rows] / denom
    perplexity = -np.asarray(stats['lp_sum'])[:real_rows] / denom
    return seq, entropy, perplexity


def eval_split(captioner, variables, loader, eval_kwargs=None):
    """reference eval_utils.py:128-226.

    Returns (val_loss, predictions, lang_stats)."""
    eval_kwargs = eval_kwargs or {}
    verbose = eval_kwargs.get('verbose', True)
    verbose_loss = eval_kwargs.get('verbose_loss', 1)
    verbose_beam = eval_kwargs.get('verbose_beam', 0)
    num_images = eval_kwargs.get('num_images',
                                 eval_kwargs.get('val_images_use', -1))
    split = eval_kwargs.get('split', 'val')
    lang_eval = eval_kwargs.get('language_eval', 0)
    dataset = eval_kwargs.get('dataset', 'coco')
    sample_n = eval_kwargs.get('sample_n', 1)
    remove_bad_endings = eval_kwargs.get('remove_bad_endings', 0)
    os.environ["REMOVE_BAD_ENDINGS"] = str(remove_bad_endings)
    label_smoothing = float(eval_kwargs.get('label_smoothing', 0) or 0)

    loader.reset_iterator(split)
    vocab = loader.get_vocab()

    # single-process multi-chip decode: shard each eval batch over the
    # local device mesh (data axis); the jitted sample programs partition
    # automatically from the input shardings.  Goes beyond the reference,
    # whose eval is single-GPU (DataParallel is train-only, train.py:86-88).
    #
    # multi-host: COOPERATIVE eval — every process walks the same loader
    # state, feeds its local slice of each global batch, and the decode
    # runs once across the whole cluster; outputs reshard to replicated so
    # every host ends up with the full prediction list and the identical
    # val loss / lang stats (lockstep checkpoint decisions for free).
    # This replaces the reference's rank-split val loader + DDP gather
    # (train_pl.py:224-276).
    multihost = jax.process_count() > 1
    mesh = None
    if multihost:
        from ..parallel.mesh import make_mesh, globalize_replicated
        mesh = make_mesh('')  # all GLOBAL devices on the data axis
        leaf = jax.tree.leaves(variables)[0]
        if not (isinstance(leaf, jax.Array) and
                len(leaf.sharding.device_set) == jax.device_count()):
            # standalone eval: params are host/local arrays — replicate
            # them onto the global mesh (training passes global arrays)
            variables = globalize_replicated(variables, mesh)
        if jax.process_index() == 0:
            print('eval_split: cooperative multi-host decode over %d '
                  'devices / %d processes'
                  % (jax.device_count(), jax.process_count()))
    elif int(eval_kwargs.get('device_mesh', 0) or 0) and \
            jax.device_count() > 1:
        from ..parallel.mesh import make_mesh, replicate, shard_batch
        mesh = make_mesh('')  # all local devices on the data axis
        variables = replicate(variables, mesh)
        n_dev = mesh.devices.size
        print('eval_split: sharding batches over %d devices' % n_dev)

    def _shard(fc, att, am):
        """Pad the batch to a multiple of the mesh size and shard it.
        Returns (fc, att, am, real_rows)."""
        real = fc.shape[0]
        if mesh is None:
            return fc, att, am, real
        from ..parallel.mesh import shard_batch
        n_dev = mesh.devices.size
        pad = (-real) % n_dev
        if pad:
            def _pad(x):
                if x is None:
                    return None
                reps = jnp.repeat(x[:1], pad, axis=0)
                return jnp.concatenate([x, reps], axis=0)
            fc, att, am = _pad(fc), _pad(att), _pad(am)
        sharded = shard_batch({'fc': fc, 'att': att, 'am': am}, mesh)
        return sharded['fc'], sharded['att'], sharded['am'], real

    def _globalize_batch(data):
        """Multi-host batch prep: pad the global batch to a multiple of the
        global device count (zero MASKS on padded rows keep the masked loss
        exact; padded decode rows are dropped by real_rows), slice this
        host's rows, and assemble global data-sharded arrays."""
        from ..parallel.mesh import globalize_local, local_batch_slice
        n_dev = jax.device_count()
        fc = np.asarray(data['fc_feats'])
        real = fc.shape[0]
        pad = (-real) % n_dev

        def _prep(x, zero_pad=False):
            if x is None:
                return None
            x = np.asarray(x)
            if pad:
                reps = np.zeros_like(x[:1]) if zero_pad else x[:1]
                x = np.concatenate([x] + [reps] * pad, axis=0)
            return x

        tree = {'fc': _prep(fc), 'att': _prep(data['att_feats']),
                'am': _prep(data['att_masks']),
                'labels': _prep(data.get('labels')),
                'masks': _prep(data.get('masks'), zero_pad=True)}
        sl = local_batch_slice(real + pad)
        tree = globalize_local(
            {k: (v[sl] if v is not None else None)
             for k, v in tree.items()}, mesh)
        return (tree['fc'], tree['att'], tree['am'], tree['labels'],
                tree['masks'], real)

    sample_opt = {k: eval_kwargs.get(k) for k in
                  ('sample_method', 'beam_size', 'temperature', 'group_size',
                   'diversity_lambda', 'decoding_constraint',
                   'block_trigrams', 'remove_bad_endings', 'suppress_UNK',
                   'length_penalty', 'max_length')
                  if eval_kwargs.get(k) is not None}
    sample_opt['sample_n'] = 1

    from ..modules import losses as L

    n = 0
    loss = 0.0
    loss_sum = 0
    loss_evals = 1e-8
    predictions = []
    n_predictions = []
    rng = jax.random.PRNGKey(int(eval_kwargs.get('seed', 0)))

    def _process(rec):
        """Fetch + post-process one DISPATCHED batch.  Runs after the NEXT
        batch's decode has been dispatched, so the device->host transfer
        (one tunnel/PCIe round trip per batch) and the host-side string
        work overlap the next batch's device time — the eval analogue of
        tools/train.py's deferred metrics flush.  Semantics (prediction
        order, bounds pops, verbose lines, losses) are identical to the
        synchronous loop: records are processed strictly in batch order."""
        nonlocal loss, loss_sum, loss_evals
        data, real_rows = rec['data'], rec['real_rows']
        if rec['loss_dev'] is not None:
            loss = float(rec['loss_dev'])
            loss_sum += loss
            loss_evals += 1
        kind = rec['kind']
        if kind == 'beam':
            seq, entropy, perplexity = _stats_from_sums(
                rec['seq'], rec['stats'], real_rows)
            if verbose_beam:
                # print every finished beam per image (reference
                # eval_utils.py:178-181)
                beams = np.asarray(rec['done']['seq'])[:real_rows]
                for i in range(beams.shape[0]):
                    flat = beams[i].reshape(-1, beams.shape[-1])
                    print('\n'.join(utils.decode_sequence(vocab, flat)))
                    print('--' * 10)
        elif kind == 'stats':
            seq, entropy, perplexity = _stats_from_sums(
                rec['seq'], rec['stats'], real_rows)
        else:
            G = int(sample_opt.get('group_size', 1) or 1)
            seq = np.asarray(rec['seq'])[:real_rows * G]
            lp = np.asarray(rec['lp'])[:real_rows * G]
            if G > 1 and seq.shape[0] == real_rows * G:
                # diverse sampling folds groups into rows [B*G, L]; the
                # split loop reports one caption per image, so keep group 0
                # (the reference's eval_split cannot reach this combination
                # at all — use eval_split_n / dgreedy for all groups)
                seq = seq.reshape(-1, G, seq.shape[-1])[:, 0]
                lp = lp.reshape((-1, G) + lp.shape[1:])[:, 0]
            denom = (seq > 0).sum(1) + 1
            if lp.ndim == 3:
                # entropy / perplexity (reference eval_utils.py:173-174)
                entropy = -(np.exp(lp) * lp).sum(-1).sum(1) / denom
                perplexity = -np.take_along_axis(
                    lp, seq[..., None], axis=2)[..., 0].sum(1) / denom
            else:
                # diverse sampling (group_size>1) returns only the sampled
                # logprob per step [N, L]; the reference crashes here
                # (eval_utils.py:173 does .sum(2) on a 2-D tensor) — degrade
                # gracefully instead: perplexity from the sampled logprobs,
                # entropy unavailable.  Keep the EOS step's logprob like
                # every other path: a step counts while no EARLIER token
                # ended the row (prefix-keep, as in scan_logprobs)
                keep = np.concatenate(
                    [np.ones((seq.shape[0], 1), bool),
                     np.cumprod(seq[:, :-1] > 0, axis=1).astype(bool)],
                    axis=1)
                entropy = np.zeros(lp.shape[0], lp.dtype)
                perplexity = -np.where(keep, lp, 0.0).sum(1) / denom

        sents = utils.decode_sequence(vocab, seq)

        for k, sent in enumerate(sents):
            entry = {'image_id': data['infos'][k]['id'], 'caption': sent,
                     'perplexity': float(perplexity[k]),
                     'entropy': float(entropy[k])}
            if eval_kwargs.get('dump_path', 0) == 1:
                entry['file_name'] = data['infos'][k]['file_path']
            predictions.append(entry)
            if eval_kwargs.get('dump_images', 0) == 1:
                # copy the source image for the vis/index.html viewer
                # (reference eval_utils.py:188-191)
                src = os.path.join(eval_kwargs.get('image_root', ''),
                                   data['infos'][k].get('file_path', ''))
                if os.path.isfile(src):
                    import shutil
                    os.makedirs('vis/imgs', exist_ok=True)
                    dst = 'vis/imgs/img%d.jpg' % len(predictions)
                    print('cp "%s" %s' % (src, dst))
                    shutil.copyfile(src, dst)
            if verbose:
                print('image %s: %s' % (entry['image_id'], entry['caption']))

        if sample_n > 1:
            eval_split_n(captioner, variables, n_predictions,
                         rec['inputs'] + [data], vocab, rec['n_rng'],
                         eval_kwargs)

        for i in range(rec['n'] - rec['ix1']):
            predictions.pop()

        if verbose:
            print('evaluating validation preformance... %d/%d (%f)'
                  % (rec['n'], rec['ix1'], loss))

    pending = None
    while True:
        data = loader.get_batch(split)
        n = n + len(data['infos'])

        if multihost:
            fc, att, am, labels, masks, real_rows = _globalize_batch(data)
        else:
            fc = jnp.asarray(data['fc_feats'])
            att = jnp.asarray(data['att_feats'])
            am = (jnp.asarray(data['att_masks'])
                  if data['att_masks'] is not None else None)
            # DataLoaderRaw has no ground truth (labels None)
            labels = (jnp.asarray(data['labels'])
                      if data.get('labels') is not None else None)
            masks = (jnp.asarray(data['masks'])
                     if data.get('masks') is not None else None)

        loss_dev = None
        if labels is not None and verbose_loss:
            logprobs = captioner.forward_tf_jit(
                variables, fc, att, labels[..., :-1], am, 0.0, None, False)
            if label_smoothing > 0:
                loss_dev = L.label_smoothing_criterion(
                    logprobs, labels[..., 1:], masks[..., 1:],
                    label_smoothing)
            else:
                loss_dev = L.language_model_criterion(
                    logprobs, labels[..., 1:], masks[..., 1:])

        rng, step_rng = jax.random.split(rng)
        if multihost:
            fc_d, att_d, am_d = fc, att, am  # already global data-sharded
        else:
            fc_d, att_d, am_d, real_rows = _shard(fc, att, am)
        bs_size = int(sample_opt.get('beam_size', 1) or 1)
        sm = sample_opt.get('sample_method', 'greedy')
        rec = {'data': data, 'real_rows': real_rows, 'loss_dev': loss_dev,
               'inputs': [fc, att, am]}
        if bs_size > 1 and sm in ('greedy', 'beam_search'):
            # beam fast path: entropy/perplexity sums are carried through
            # the beam scan itself (decoding.sample_beam want_logps=False),
            # skipping the winner-logprob replay — same two reductions the
            # reference takes from the stored distributions
            # (eval_utils.py:173-174)
            seq, stats, _done = captioner.sample_beam_jit(
                variables, fc_d, att_d, am_d, step_rng, sample_opt,
                want_logps=False)
            rec.update(kind='beam', seq=seq, stats=stats, done=_done)
        elif (stats_out := getattr(captioner, 'sample_stats_jit',
                                   lambda *a: None)(
                variables, fc_d, att_d, am_d, step_rng,
                sample_opt)) is not None:
            # sample-family fast path: ent/perplexity sums carried through
            # the scan; the [N, L, V+1] table never materializes
            seq, stats = stats_out
            rec.update(kind='stats', seq=seq, stats=stats)
        else:
            seq, seq_logprobs = captioner.sample_jit(
                variables, fc_d, att_d, am_d, step_rng, sample_opt)
            rec.update(kind='slow', seq=seq, lp=seq_logprobs)

        if sample_n > 1:
            rng, n_rng = jax.random.split(rng)
            rec['n_rng'] = n_rng

        ix1 = data['bounds']['it_max']
        if num_images != -1:
            ix1 = min(ix1, num_images)
        else:
            num_images = ix1
        rec['n'], rec['ix1'] = n, ix1

        # multi-host: decode outputs are data-sharded over the global mesh
        # (not addressable from one host); reshard them to replicated
        # (async all-gather) so _process can np.asarray them anywhere
        if multihost:
            from ..parallel.mesh import replicate_tree
            for k in ('seq', 'stats', 'done', 'lp'):
                if rec.get(k) is not None:
                    rec[k] = replicate_tree(rec[k], mesh)

        # one batch stays in flight: fetch + post-process the PREVIOUS
        # batch only after this one's device programs are dispatched, so
        # the transfer round trip and the host string work hide under this
        # batch's decode
        if pending is not None:
            _process(pending)
        pending = rec

        if num_images >= 0 and n >= num_images:
            break
    if pending is not None:
        _process(pending)

    # multi-host note: NO gather needed — the cooperative decode above
    # already leaves every host with the full prediction list (the decode
    # ran once across the cluster; outputs were resharded to replicated).
    # The reference's d2comm.gather (train_pl.py:224-276) is matched by
    # construction; gather_predictions remains for per-host-decode users.

    lang_stats = None
    if len(n_predictions) > 0 and 'perplexity' in n_predictions[0]:
        n_predictions = sorted(n_predictions, key=lambda x: x['perplexity'])
    if not os.path.isdir('eval_results'):
        os.mkdir('eval_results')
    import pickle
    if jax.process_index() == 0:
        # identical content on every host; only one writer avoids an
        # interleaved file on shared filesystems
        with open(os.path.join('eval_results/', '.saved_pred_'
                               + eval_kwargs.get('id', '') + '_' + split +
                               '.pkl'), 'wb') as f:
            pickle.dump((predictions, n_predictions), f)
    if lang_eval == 1:
        lang_stats = language_eval(dataset, predictions, n_predictions,
                                   eval_kwargs, split)

    return loss_sum / loss_evals, predictions, lang_stats


def eval_split_n(captioner, variables, n_predictions, input_data, vocab,
                 rng, eval_kwargs=None):
    """Multi-sample eval harness (reference eval_utils.py:230-281)."""
    eval_kwargs = eval_kwargs or {}
    verbose = eval_kwargs.get('verbose', True)
    beam_size = eval_kwargs.get('beam_size', 1)
    sample_n = eval_kwargs.get('sample_n', 1)
    sample_n_method = eval_kwargs.get('sample_n_method', 'sample')

    fc, att, am, data = input_data
    # real image count: under cooperative multi-host eval fc/att/am carry
    # global pad rows (multiple of the device count); infos does not
    B = len(data['infos'])
    multihost = jax.process_count() > 1
    if multihost:
        from ..parallel.mesh import make_mesh, replicate_tree
        _mh_mesh = make_mesh('')

    def _np(x):
        """Device -> np, resharding to replicated first on multi-host."""
        if multihost:
            x = replicate_tree(x, _mh_mesh)
        return np.asarray(x)

    base = {k: eval_kwargs.get(k) for k in
            ('temperature', 'decoding_constraint', 'block_trigrams',
             'remove_bad_endings', 'suppress_UNK', 'length_penalty')
            if eval_kwargs.get(k) is not None}

    if sample_n_method == 'bs':
        opt = dict(base, sample_n=sample_n, beam_size=sample_n, group_size=1)
        _seq, _stats, done = captioner.sample_beam_jit(
            variables, fc, att, am, rng, opt, want_logps=False)
        seqs = _np(done['seq'])[:, 0]  # [B, bdash, L]
        for k in range(B):
            _sents = utils.decode_sequence(vocab, seqs[k][:sample_n])
            for sent in _sents:
                n_predictions.append(
                    {'image_id': data['infos'][k]['id'], 'caption': sent})
    elif (sample_n_method in ('sample', 'gumbel') or
          sample_n_method.startswith('top')):
        opt = dict(base, sample_n=sample_n, sample_method=sample_n_method,
                   beam_size=1)
        # one shared compiled program across the whole sample family
        # (method/temperature are traced operands)
        sampler = getattr(captioner, 'sample_dynamic_jit',
                          captioner.sample_jit)
        _seq, _logprobs = sampler(variables, fc, att, am, rng, opt)
        _seq = _np(_seq)[:B * sample_n]
        lp = _np(_logprobs)[:B * sample_n]
        _sents = utils.decode_sequence(vocab, _seq)
        _perplexity = -np.take_along_axis(
            lp, _seq[..., None], axis=2)[..., 0].sum(1) / ((_seq > 0).sum(1) + 1)
        for k, sent in enumerate(_sents):
            n_predictions.append(
                {'image_id': data['infos'][k // sample_n]['id'],
                 'caption': sent, 'perplexity': float(_perplexity[k])})
    elif sample_n_method == 'dbs':
        opt = dict(base, beam_size=beam_size * sample_n, group_size=sample_n)
        _seq, _stats, done = captioner.sample_beam_jit(
            variables, fc, att, am, rng, opt, want_logps=False)
        seqs = _np(done['seq'])[:, :, 0]  # best of each group [B,G,L]
        for k in range(B):
            _sents = utils.decode_sequence(vocab, seqs[k])
            for sent in _sents:
                n_predictions.append(
                    {'image_id': data['infos'][k]['id'], 'caption': sent})
    else:
        opt = dict(base, sample_method=sample_n_method[1:],
                   group_size=sample_n, beam_size=1)
        _seq, _ = captioner.sample_jit(variables, fc, att, am, rng, opt)
        _sents = utils.decode_sequence(vocab, _np(_seq)[:B * sample_n])
        for k, sent in enumerate(_sents):
            n_predictions.append(
                {'image_id': data['infos'][k // sample_n]['id'],
                 'caption': sent})
    if verbose:
        for entry in sorted(n_predictions[-B * sample_n:],
                            key=lambda x: str(x['image_id'])):
            print('image %s: %s' % (entry['image_id'], entry['caption']))
