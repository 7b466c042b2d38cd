"""Offline prepro scripts end-to-end: Karpathy-format json ->
prepro_labels -> prepro_ngrams -> Dataset + CiderD consume the artifacts."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: see pytest.ini

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _karpathy_json(path, n_images=10, seed=0):
    rng = np.random.RandomState(seed)
    words = ['cat', 'dog', 'man', 'woman', 'riding', 'a', 'the', 'on',
             'red', 'bike', 'street', 'ball']
    images = []
    for i in range(n_images):
        split = 'train' if i < 6 else ('val' if i < 8 else 'test')
        sentences = []
        for _ in range(rng.randint(3, 6)):
            toks = [words[rng.randint(len(words))]
                    for _ in range(rng.randint(3, 9))]
            sentences.append({'tokens': toks, 'raw': ' '.join(toks)})
        images.append({'split': split, 'cocoid': 5000 + i,
                       'filename': 'img%d.jpg' % i, 'filepath': '',
                       'sentences': sentences})
    json.dump({'images': images}, open(path, 'w'))
    return images


def test_prepro_labels_and_ngrams_roundtrip(tmp_path):
    src = str(tmp_path / 'dataset.json')
    images = _karpathy_json(src)
    env = dict(os.environ, PYTHONPATH=REPO)

    out_json = str(tmp_path / 'talk.json')
    out_h5 = str(tmp_path / 'talk')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'prepro_labels.py'),
         '--input_json', src, '--output_json', out_json,
         '--output_h5', out_h5, '--word_count_threshold', '1',
         '--max_length', '8'],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'prepro_ngrams.py'),
         '--input_json', src, '--dict_json', out_json,
         '--output_pkl', str(tmp_path / 'ng'), '--split', 'train'],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isfile(str(tmp_path / 'ng-idxs.p'))
    assert os.path.isfile(str(tmp_path / 'ng-words.p'))

    # artifacts load in the data layer
    info = json.load(open(out_json))
    assert 'ix_to_word' in info and len(info['images']) == 10
    import h5py
    with h5py.File(out_h5 + '_label.h5') as f:
        labels = f['labels'][:]
        s_ix = f['label_start_ix'][:]
        e_ix = f['label_end_ix'][:]
    assert labels.shape[1] == 8
    assert s_ix[0] == 1 and (e_ix >= s_ix).all()

    # CiderD consumes the idxs df cache
    from captioning_tpu.utils.cider_scorer import CiderD
    scorer = CiderD(df=str(tmp_path / 'ng-idxs.p'))
    gts = {0: ['1 2 0']}
    res = [{'image_id': 0, 'caption': ['1 2 0']}]
    mean, scores = scorer.compute_score(gts, res)
    assert np.isfinite(scores[0])

    # full Dataset path over the generated artifacts (features synthesized)
    fc_dir = str(tmp_path / 'fc')
    att_dir = str(tmp_path / 'att')
    os.makedirs(fc_dir)
    os.makedirs(att_dir)
    rng = np.random.RandomState(1)
    for img in info['images']:
        np.save(os.path.join(fc_dir, '%d.npy' % img['id']),
                rng.randn(6).astype('float32'))
        np.savez(os.path.join(att_dir, '%d.npz' % img['id']),
                 feat=rng.randn(4, 7).astype('float32'))
    from types import SimpleNamespace
    from captioning_tpu.data.dataset import Dataset
    opt = SimpleNamespace(
        input_json=out_json, input_label_h5=out_h5 + '_label.h5',
        input_fc_dir=fc_dir, input_att_dir=att_dir, input_box_dir='',
        seq_per_img=2, use_fc=True, use_att=True, use_box=0,
        norm_att_feat=0, norm_box_feat=0, train_only=0,
        att_bucket_sizes='', data_in_memory=False)
    d = Dataset(opt)
    item = d.get_item((0, 1, False))
    batch = d.collate([item], 'train')
    assert batch['labels'].shape == (1, 2, 10)


def test_build_bpe_roundtrip(tmp_path):
    src = str(tmp_path / 'dataset.json')
    _karpathy_json(src, seed=2)
    env = dict(os.environ, PYTHONPATH=REPO)
    out_json = str(tmp_path / 'bpe.json')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'build_bpe.py'),
         '--input_json', src, '--output_json', out_json,
         '--output_h5', str(tmp_path / 'bpe'), '--num_merges', '30',
         '--max_length', '12'],
        capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.load(open(out_json))
    assert 'bpe' in info and 'ix_to_word' in info
