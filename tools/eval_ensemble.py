"""Ensemble evaluation (port of ``/root/reference/tools/eval_ensemble.py``).

Builds an EnsembleCaptioner from ``log_<id>`` checkpoints and evaluates
with probability-space averaging.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import captioning_tpu.utils.opts as opts
import captioning_tpu.models as models
import captioning_tpu.utils.eval_utils as eval_utils
import captioning_tpu.utils.misc as utils
from captioning_tpu.models.ensemble import EnsembleCaptioner

utils.honor_jax_platforms_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--ids', nargs='+', required=True,
                        help='ids of the models to ensemble')
    parser.add_argument('--weights', nargs='+', required=False, default=None)
    parser.add_argument('--cnn_model', type=str, default='resnet101')
    opts.add_eval_options(parser)
    opts.add_diversity_opts(parser)
    opt = parser.parse_args()
    utils.enable_compilation_cache(opt.compilation_cache_dir)
    utils.set_rng_impl(getattr(opt, 'rng_impl', ''))

    model_infos = []
    model_paths = []
    for mid in opt.ids:
        if '-' in mid:
            mid, app = mid.split('-')
            app = '-' + app
        else:
            app = ''
        with open('log_%s/infos_%s%s.pkl' % (mid, mid, app), 'rb') as f:
            model_infos.append(utils.pickle_load(f))
        model_paths.append('log_%s/model%s.npz' % (mid, app))

    infos = model_infos[0]
    replace = ['input_fc_dir', 'input_att_dir', 'input_box_dir',
               'input_label_h5', 'input_json', 'batch_size', 'id']
    for k in replace:
        setattr(opt, k, getattr(opt, k) or getattr(infos['opt'], k, ''))
    vars(opt).update({k: vars(infos['opt'])[k]
                      for k in vars(infos['opt']).keys()
                      if k not in vars(opt)})
    opt.use_box = max(getattr(i['opt'], 'use_box', 0) for i in model_infos)

    vocab = infos['vocab']

    captioners, variables_list = [], []
    for i in range(len(model_infos)):
        model_infos[i]['opt'].start_from = None
        model_infos[i]['opt'].vocab_size = len(vocab)
        captioners.append(models.setup(model_infos[i]['opt'], vocab))
        variables_list.append(utils.load_pytree(model_paths[i]))

    weights = ([float(w) for w in opt.weights]
               if opt.weights is not None else None)
    ensemble = EnsembleCaptioner(captioners, weights)

    from captioning_tpu.data.dataset import DataLoader
    loader = DataLoader(opt)
    loader.dataset.ix_to_word = vocab

    opt.id = '+'.join(
        [a + str(b) for a, b in zip(
            opt.ids, weights or [1.0] * len(opt.ids))])
    opt.dataset = opt.input_json

    # eval_split consumes the Captioner API; EnsembleCaptioner provides it
    # with variables = the list of member variable pytrees.
    loss, split_predictions, lang_stats = eval_utils.eval_split(
        ensemble, variables_list, loader, vars(opt))

    print('loss: ', loss)
    if lang_stats:
        print(lang_stats)

    if opt.dump_json == 1:
        os.makedirs('vis', exist_ok=True)
        json.dump(split_predictions, open('vis/vis.json', 'w'))


if __name__ == '__main__':
    main()
