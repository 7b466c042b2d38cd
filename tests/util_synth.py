"""Synthetic COCO-talk-format dataset builder for tests.

Produces the exact artifact formats the reference prepro scripts emit
(input_json with ix_to_word + splits, labels h5 with 1-indexed
label_start/end_ix, per-image .npy fc / .npz att feature dirs, and a
prepro_ngrams-style -idxs doc-frequency pickle), so the data layer and
SCST path are exercised against the real on-disk contracts.
"""

from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from types import SimpleNamespace

import numpy as np


def build_synthetic_dataset(root, n_images=20, vocab_size=30, seq_length=6,
                            fc_dim=10, att_dim=12, max_att=7, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    fc_dir = os.path.join(root, 'feats_fc')
    att_dir = os.path.join(root, 'feats_att')
    os.makedirs(fc_dir, exist_ok=True)
    os.makedirs(att_dir, exist_ok=True)

    # idempotent reuse: multi-process tests launch several workers over one
    # shared dataset dir; a completed build must not be rewritten under a
    # concurrent reader (content is seed-deterministic, so reuse is exact)
    marker = os.path.join(root, '.complete')
    ns = SimpleNamespace(
        input_json=os.path.join(root, 'talk.json'),
        input_label_h5=os.path.join(root, 'talk_label.h5'),
        input_fc_dir=fc_dir, input_att_dir=att_dir,
        input_box_dir=os.path.join(root, 'feats_box'),
        cached_tokens=os.path.join(root, 'talk-idxs.p'),
        vocab_size=vocab_size, seq_length=seq_length,
        fc_dim=fc_dim, att_dim=att_dim,
        annotations=os.path.join(root, 'annotations.json'))
    if os.path.exists(marker):
        return ns

    ix_to_word = {str(i): 'w%d' % i for i in range(1, vocab_size + 1)}
    images = []
    all_caps = []
    start_ix, end_ix, lengths = [], [], []
    cursor = 1
    for i in range(n_images):
        split = ('train' if i < n_images - 8 else
                 'val' if i < n_images - 4 else 'test')
        img_id = 1000 + i
        images.append({'id': img_id, 'split': split,
                       'file_path': 'img%d.jpg' % i,
                       'width': 640, 'height': 480})
        np.save(os.path.join(fc_dir, '%d.npy' % img_id),
                rng.randn(fc_dim).astype('float32'))
        att_len = rng.randint(3, max_att + 1)
        np.savez(os.path.join(att_dir, '%d.npz' % img_id),
                 feat=rng.randn(att_len, att_dim).astype('float32'))
        ncap = rng.randint(3, 6)
        start_ix.append(cursor)
        for _ in range(ncap):
            L = rng.randint(2, seq_length + 1)
            cap = np.zeros(seq_length, dtype='uint32')
            cap[:L] = rng.randint(1, vocab_size + 1, L)
            all_caps.append(cap)
            lengths.append(L)
        cursor += ncap
        end_ix.append(cursor - 1)

    input_json = os.path.join(root, 'talk.json')
    json.dump({'ix_to_word': ix_to_word, 'images': images},
              open(input_json, 'w'))

    import h5py
    label_h5 = os.path.join(root, 'talk_label.h5')
    with h5py.File(label_h5, 'w') as f:
        f.create_dataset('labels', data=np.stack(all_caps))
        f.create_dataset('label_start_ix', data=np.array(start_ix))
        f.create_dataset('label_end_ix', data=np.array(end_ix))
        f.create_dataset('label_length', data=np.array(lengths))

    # prepro_ngrams-style doc frequency over id-strings (+<eos>=0)
    df = defaultdict(float)
    n_refs = 0
    caps_np = np.stack(all_caps)
    for i in range(n_images):
        ngrams = set()
        for j in range(start_ix[i] - 1, end_ix[i]):
            toks = [str(t) for t in caps_np[j] if t > 0] + ['0']
            for n in range(1, 5):
                for k in range(len(toks) - n + 1):
                    ngrams.add(tuple(toks[k:k + n]))
        for ng in ngrams:
            df[ng] += 1
        n_refs += 1
    ngram_pkl = os.path.join(root, 'talk-idxs.p')
    with open(ngram_pkl, 'wb') as f:
        pickle.dump({'document_frequency': dict(df), 'ref_len': n_refs}, f,
                    protocol=2)

    # coco-caption-style annotation json (what prepro_reference_json emits)
    ann = {'images': [], 'annotations': [], 'type': 'captions',
           'info': {}, 'licenses': []}
    cnt = 0
    for i, img in enumerate(images):
        if img['split'] == 'train':
            continue
        ann['images'].append({'id': img['id']})
        for j in range(start_ix[i] - 1, end_ix[i]):
            toks = ['w%d' % t for t in caps_np[j] if t > 0]
            ann['annotations'].append({'image_id': img['id'],
                                       'caption': ' '.join(toks),
                                       'id': cnt})
            cnt += 1
    ann_json = os.path.join(root, 'annotations.json')
    json.dump(ann, open(ann_json, 'w'))

    with open(marker, 'w') as f:
        f.write('ok')
    return ns


def make_opt(ds, model='newfc', **kw):
    """A full opts namespace over the synthetic dataset."""
    import captioning_tpu.utils.opts as opts
    args = [
        '--caption_model', model,
        '--input_json', ds.input_json,
        '--input_label_h5', ds.input_label_h5,
        '--input_fc_dir', ds.input_fc_dir,
        '--input_att_dir', ds.input_att_dir,
        '--input_box_dir', ds.input_box_dir,
        '--cached_tokens', ds.cached_tokens,
        '--batch_size', '4',
        '--seq_per_img', '2',
        '--rnn_size', '24',
        '--input_encoding_size', '16',
        '--att_hid_size', '8',
        '--fc_feat_size', str(ds.fc_dim),
        '--att_feat_size', str(ds.att_dim),
        '--max_length', '6',
        '--train_sample_n', '2',
        '--num_data_threads', '2',
        '--num_prefetch', '2',
    ]
    opt = opts.parse_opt(args)
    for k, v in kw.items():
        setattr(opt, k, v)
    return opt
