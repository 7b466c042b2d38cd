"""Preprocess a Karpathy-format dataset json into the cocotalk json + label
h5 consumed by the data layer.

Behavioral port of ``/root/reference/scripts/prepro_labels.py``: the vocab
keeps words with count > threshold (everything else maps to UNK),
captions are encoded into a ``labels [M, max_length]`` uint32 array with
1-indexed inclusive ``label_start_ix``/``label_end_ix`` pointers, and the
output json carries a 1-indexed ``ix_to_word`` table.
"""

from __future__ import annotations

import argparse
import collections
import json
import os

import h5py
import numpy as np


def tokenized_captions(images):
    for img in images:
        for sent in img['sentences']:
            yield sent['tokens']


def build_vocab(images, count_thr: int):
    """Count words, report coverage, and attach UNK-substituted
    ``final_captions`` to every image record."""
    counts = collections.Counter()
    length_hist = collections.Counter()
    for tokens in tokenized_captions(images):
        counts.update(tokens)
        length_hist[len(tokens)] += 1

    ranked = sorted(((n, w) for w, n in counts.items()), reverse=True)
    print('top words and their counts:')
    print('\n'.join(map(str, ranked[:20])))

    total = sum(counts.values())
    kept = [w for w, n in counts.items() if n > count_thr]
    n_dropped = len(counts) - len(kept)
    dropped_mass = total - sum(counts[w] for w in kept)
    print('total words:', total)
    print('number of bad words: %d/%d = %.2f%%'
          % (n_dropped, len(counts), n_dropped * 100.0 / len(counts)))
    print('number of words in vocab would be %d' % len(kept))
    print('number of UNKs: %d/%d = %.2f%%'
          % (dropped_mass, total, dropped_mass * 100.0 / total))
    print('max length sentence in raw data: ', max(length_hist))

    if dropped_mass > 0:
        print('inserting the special UNK token')
        kept.append('UNK')

    keep_set = {w for w, n in counts.items() if n > count_thr}
    for img in images:
        img['final_captions'] = [
            [w if w in keep_set else 'UNK' for w in sent['tokens']]
            for sent in img['sentences']]
    return kept


def encode_captions(images, max_length: int, wtoi):
    """Flatten all final_captions into one uint32 matrix plus the
    1-indexed per-image span pointers the loaders expect."""
    n_images = len(images)
    n_caps = sum(len(img['final_captions']) for img in images)

    labels = np.zeros((n_caps, max_length), dtype='uint32')
    start_ix = np.zeros(n_images, dtype='uint32')   # 1-indexed inclusive
    end_ix = np.zeros(n_images, dtype='uint32')
    lengths = np.zeros(n_caps, dtype='uint32')

    row = 0
    for i, img in enumerate(images):
        caps = img['final_captions']
        assert caps, 'error: some image has no captions'
        start_ix[i] = row + 1
        for cap in caps:
            lengths[row] = min(max_length, len(cap))
            ids = [wtoi[w] for w in cap[:max_length]]
            labels[row, :len(ids)] = ids
            row += 1
        end_ix[i] = row
    assert row == n_caps
    assert lengths.min() > 0, 'error: some caption had no words?'
    print('encoded captions to array of size ', labels.shape)
    return labels, start_ix, end_ix, lengths


def image_entry(img, images_root: str):
    entry = {'split': img['split']}
    if 'filename' in img:
        entry['file_path'] = os.path.join(img.get('filepath', ''),
                                          img['filename'])
    for key in ('cocoid', 'imgid'):
        if key in img:
            entry['id'] = img[key]
            break
    if images_root:
        from PIL import Image
        path = os.path.join(images_root, img['filepath'], img['filename'])
        with Image.open(path) as im:
            entry['width'], entry['height'] = im.size
    return entry


def main(args):
    with open(args.input_json) as f:
        images = json.load(f)['images']

    vocab = build_vocab(images, args.word_count_threshold)
    wtoi = {w: i + 1 for i, w in enumerate(vocab)}

    labels, start_ix, end_ix, lengths = encode_captions(
        images, args.max_length, wtoi)

    with h5py.File(args.output_h5 + '_label.h5', 'w') as h5:
        for name, arr in (('labels', labels),
                          ('label_start_ix', start_ix),
                          ('label_end_ix', end_ix),
                          ('label_length', lengths)):
            h5.create_dataset(name, dtype='uint32', data=arr)

    talk = {'ix_to_word': {i + 1: w for i, w in enumerate(vocab)},
            'images': [image_entry(img, args.images_root)
                       for img in images]}
    with open(args.output_json, 'w') as f:
        json.dump(talk, f)
    print('wrote ', args.output_json)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--output_json', default='data.json')
    parser.add_argument('--output_h5', default='data')
    parser.add_argument('--images_root', default='')
    parser.add_argument('--max_length', default=16, type=int)
    parser.add_argument('--word_count_threshold', default=5, type=int)
    args = parser.parse_args()
    print('parsed input parameters:')
    print(json.dumps(vars(args), indent=2))
    main(args)
