"""Evaluation entry point (port of ``/root/reference/tools/eval.py``).

Loads an infos pickle, overlays eval-time options on the training opts
(eval.py:46-54), honours the result caching / only_lang_eval skip logic
(:61-90), evaluates via eval_utils.eval_split, and dumps ``vis/vis.json``
for the HTML viewer.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import captioning_tpu.utils.opts as opts
import captioning_tpu.models as models
import captioning_tpu.utils.eval_utils as eval_utils
import captioning_tpu.utils.misc as utils

utils.honor_jax_platforms_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', type=str, default='',
                        help='path to model .npz to evaluate')
    parser.add_argument('--cnn_model', type=str, default='resnet101')
    parser.add_argument('--infos_path', type=str, default='',
                        help='path to infos pkl to evaluate')
    parser.add_argument('--only_lang_eval', type=int, default=0)
    parser.add_argument('--annfile', type=str, default='',
                        help='explicit coco-format annotations json for '
                             'language eval (overrides the coco/f30k path '
                             'inference from input_json; needed for custom '
                             'datasets)')
    parser.add_argument('--force', type=int, default=0)
    parser.add_argument('--device', type=str, default='tpu')
    parser.add_argument('--use_pallas', type=int, default=None,
                        help='override the checkpoint opt: 1/0 force the '
                             'fused TPU kernels on/off, -1 auto (on when '
                             'the backend is TPU); default = inherit from '
                             'the training infos')
    opts.add_eval_options(parser)
    opts.add_diversity_opts(parser)
    opt = parser.parse_args()
    if opt.use_pallas is None:
        del opt.use_pallas  # inherit from infos' opt below
    utils.enable_compilation_cache(opt.compilation_cache_dir)
    utils.set_rng_impl(getattr(opt, 'rng_impl', ''))

    with open(opt.infos_path, 'rb') as f:
        infos = utils.pickle_load(f)

    # override and collect parameters (reference eval.py:46-54)
    replace = ['input_fc_dir', 'input_att_dir', 'input_box_dir',
               'input_label_h5', 'input_json', 'batch_size', 'id']
    ignore = ['start_from']
    for k in vars(infos['opt']).keys():
        if k in replace:
            setattr(opt, k, getattr(opt, k) or getattr(infos['opt'], k, ''))
        elif k not in ignore:
            if k not in vars(opt):
                vars(opt).update({k: vars(infos['opt'])[k]})

    vocab = infos['vocab']

    pred_fn = os.path.join('eval_results/', '.saved_pred_' + opt.id + '_' +
                           opt.split + '.pkl')
    result_fn = os.path.join('eval_results/', opt.id + '_' + opt.split +
                             '.json')

    if opt.only_lang_eval == 1 or (not opt.force and os.path.isfile(pred_fn)):
        if not opt.force:
            try:
                if os.path.isfile(result_fn):
                    print(result_fn)
                    json.load(open(result_fn, 'r'))
                    print('already evaluated')
                    return
            except Exception:
                pass
        with open(pred_fn, 'rb') as f:
            predictions, n_predictions = pickle.load(f)
        lang_stats = eval_utils.language_eval(
            opt.annfile or opt.input_json, predictions, n_predictions,
            vars(opt), opt.split)
        print(lang_stats)
        return

    if not opt.force:
        try:
            with open(pred_fn, 'rb') as f:
                pickle.load(f)
            if opt.language_eval == 1:
                json.load(open(result_fn, 'r'))
            print('Result is already there')
            return
        except Exception:
            pass

    # Setup the model
    opt.vocab = vocab
    opt.vocab_size = len(vocab)
    captioner = models.setup(opt, vocab)
    del opt.vocab
    variables = utils.load_pytree(opt.model)

    # Create the Data Loader instance
    if len(opt.image_folder) == 0:
        from captioning_tpu.data.dataset import DataLoader
        loader = DataLoader(opt)
    else:
        from captioning_tpu.data.dataloaderraw import DataLoaderRaw
        loader = DataLoaderRaw({'folder_path': opt.image_folder,
                                'coco_json': opt.coco_json,
                                'batch_size': opt.batch_size,
                                'cnn_model': opt.cnn_model})
    # use the vocab in infos file (reference eval.py:109-111)
    loader.dataset.ix_to_word = infos['vocab']

    opt.dataset = opt.annfile or opt.input_json
    loss, split_predictions, lang_stats = eval_utils.eval_split(
        captioner, variables, loader, vars(opt))

    print('loss: ', loss)
    if lang_stats:
        print(lang_stats)

    if opt.dump_json == 1:
        os.makedirs('vis', exist_ok=True)
        json.dump(split_predictions, open('vis/vis.json', 'w'))


if __name__ == '__main__':
    main()
