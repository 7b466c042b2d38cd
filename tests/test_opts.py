"""Config system tests: flag precedence, _BASE_ inheritance, use_box."""

import os

import numpy as np
import pytest

import captioning_tpu.utils.opts as opts
from captioning_tpu.utils.config import CfgNode


def test_defaults_match_reference():
    opt = opts.parse_opt([])
    # spot-check reference defaults (opts.py)
    assert opt.caption_model == 'show_tell'
    assert opt.rnn_size == 512
    assert opt.learning_rate == 4e-4
    assert opt.grad_clip_mode == 'value'
    assert opt.grad_clip_value == 0.1
    assert opt.seq_per_img == 5
    assert opt.beam_size == 1
    assert opt.max_length == 20
    assert opt.suppress_UNK == 1
    assert opt.train_sample_n == 16
    # derived (opts.py:270-275)
    assert opt.checkpoint_path == './log_'
    assert opt.start_from == './log_'
    assert opt.use_fc and not opt.use_att


def test_cfg_overrides_and_cli_wins(tmp_path):
    base = tmp_path / 'base.yml'
    base.write_text('caption_model: updown\nrnn_size: 777\nbatch_size: 5\n')
    child = tmp_path / 'child.yml'
    child.write_text('_BASE_: base.yml\nrnn_size: 888\n')
    # yaml beats defaults; CLI beats yaml
    opt = opts.parse_opt(['--cfg', str(child), '--batch_size', '7'])
    assert opt.caption_model == 'updown'   # from base
    assert opt.rnn_size == 888             # child overrides base
    assert opt.batch_size == 7             # CLI overrides yaml
    assert opt.use_att and opt.use_fc      # updown uses both


def test_set_cfgs_precedence(tmp_path):
    base = tmp_path / 'b.yml'
    base.write_text('rnn_size: 100\n')
    opt = opts.parse_opt(['--cfg', str(base),
                          '--set_cfgs', 'rnn_size', '200'])
    assert opt.rnn_size == 200
    opt = opts.parse_opt(['--cfg', str(base),
                          '--set_cfgs', 'rnn_size', '200',
                          '--rnn_size', '300'])
    assert opt.rnn_size == 300


def test_use_box_extends_att_feat_size():
    opt = opts.parse_opt(['--caption_model', 'updown', '--use_box', '1',
                          '--att_feat_size', '2048'])
    assert opt.att_feat_size == 2053  # +5 (opts.py:275)


def test_box_features_in_dataset(tmp_path):
    from tests.util_synth import build_synthetic_dataset, make_opt
    import json
    ds = build_synthetic_dataset(str(tmp_path / 's'))
    # write box files
    os.makedirs(ds.input_box_dir, exist_ok=True)
    info = json.load(open(ds.input_json))
    rng = np.random.RandomState(0)
    for img in info['images']:
        att = np.load(os.path.join(
            ds.input_att_dir, '%d.npz' % img['id']))['feat']
        n = att.shape[0]
        x1 = rng.rand(n, 1) * 100
        y1 = rng.rand(n, 1) * 100
        boxes = np.hstack([x1, y1, x1 + 10, y1 + 10]).astype('float32')
        np.save(os.path.join(ds.input_box_dir, '%d.npy' % img['id']), boxes)
    opt = make_opt(ds, 'updown', use_box=1)
    opt.att_feat_size = ds.att_dim + 5
    from captioning_tpu.data.dataset import Dataset
    d = Dataset(opt)
    fc, att, seq, ix, pos, wrapped = d.get_item((0, 1, False))
    assert att.shape[1] == ds.att_dim + 5
    # sorted by area descending (reference dataloader.py:282)
    areas = att[:, -1]
    assert (np.diff(areas) <= 1e-9).all()
