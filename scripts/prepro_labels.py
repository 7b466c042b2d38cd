"""Preprocess a Karpathy-format dataset json into the cocotalk json + label
h5 consumed by the data layer.

Port of ``/root/reference/scripts/prepro_labels.py``: vocab built from
words with count > threshold (else UNK), captions encoded into a
``labels [M, max_length]`` uint32 array with 1-indexed inclusive
``label_start_ix``/``label_end_ix`` pointers, and a 1-indexed
``ix_to_word`` json.
"""

from __future__ import annotations

import argparse
import json
import os
from random import seed

import h5py
import numpy as np


def build_vocab(imgs, params):
    count_thr = params['word_count_threshold']
    counts = {}
    for img in imgs:
        for sent in img['sentences']:
            for w in sent['tokens']:
                counts[w] = counts.get(w, 0) + 1
    cw = sorted([(count, w) for w, count in counts.items()], reverse=True)
    print('top words and their counts:')
    print('\n'.join(map(str, cw[:20])))

    total_words = sum(counts.values())
    print('total words:', total_words)
    bad_words = [w for w, n in counts.items() if n <= count_thr]
    vocab = [w for w, n in counts.items() if n > count_thr]
    bad_count = sum(counts[w] for w in bad_words)
    print('number of bad words: %d/%d = %.2f%%'
          % (len(bad_words), len(counts),
             len(bad_words) * 100.0 / len(counts)))
    print('number of words in vocab would be %d' % len(vocab))
    print('number of UNKs: %d/%d = %.2f%%'
          % (bad_count, total_words, bad_count * 100.0 / total_words))

    sent_lengths = {}
    for img in imgs:
        for sent in img['sentences']:
            nw = len(sent['tokens'])
            sent_lengths[nw] = sent_lengths.get(nw, 0) + 1
    max_len = max(sent_lengths.keys())
    print('max length sentence in raw data: ', max_len)

    if bad_count > 0:
        print('inserting the special UNK token')
        vocab.append('UNK')

    for img in imgs:
        img['final_captions'] = []
        for sent in img['sentences']:
            caption = [w if counts.get(w, 0) > count_thr else 'UNK'
                       for w in sent['tokens']]
            img['final_captions'].append(caption)
    return vocab


def encode_captions(imgs, params, wtoi):
    max_length = params['max_length']
    N = len(imgs)
    M = sum(len(img['final_captions']) for img in imgs)

    label_arrays = []
    label_start_ix = np.zeros(N, dtype='uint32')  # 1-indexed
    label_end_ix = np.zeros(N, dtype='uint32')
    label_length = np.zeros(M, dtype='uint32')
    caption_counter = 0
    counter = 1
    for i, img in enumerate(imgs):
        n = len(img['final_captions'])
        assert n > 0, 'error: some image has no captions'
        Li = np.zeros((n, max_length), dtype='uint32')
        for j, s in enumerate(img['final_captions']):
            label_length[caption_counter] = min(max_length, len(s))
            caption_counter += 1
            for k, w in enumerate(s):
                if k < max_length:
                    Li[j, k] = wtoi[w]
        label_arrays.append(Li)
        label_start_ix[i] = counter
        label_end_ix[i] = counter + n - 1
        counter += n

    L = np.concatenate(label_arrays, axis=0)
    assert L.shape[0] == M, "lengths don't match? that's weird"
    assert np.all(label_length > 0), 'error: some caption had no words?'
    print('encoded captions to array of size ', L.shape)
    return L, label_start_ix, label_end_ix, label_length


def main(params):
    imgs = json.load(open(params['input_json'], 'r'))['images']
    seed(123)

    vocab = build_vocab(imgs, params)
    itow = {i + 1: w for i, w in enumerate(vocab)}
    wtoi = {w: i + 1 for i, w in enumerate(vocab)}

    L, label_start_ix, label_end_ix, label_length = encode_captions(
        imgs, params, wtoi)

    with h5py.File(params['output_h5'] + '_label.h5', 'w') as f_lb:
        f_lb.create_dataset('labels', dtype='uint32', data=L)
        f_lb.create_dataset('label_start_ix', dtype='uint32',
                            data=label_start_ix)
        f_lb.create_dataset('label_end_ix', dtype='uint32',
                            data=label_end_ix)
        f_lb.create_dataset('label_length', dtype='uint32',
                            data=label_length)

    out = {'ix_to_word': itow, 'images': []}
    for img in imgs:
        jimg = {}
        jimg['split'] = img['split']
        if 'filename' in img:
            jimg['file_path'] = os.path.join(img.get('filepath', ''),
                                             img['filename'])
        if 'cocoid' in img:
            jimg['id'] = img['cocoid']
        elif 'imgid' in img:
            jimg['id'] = img['imgid']
        if params['images_root'] != '':
            from PIL import Image
            with Image.open(os.path.join(params['images_root'],
                                         img['filepath'],
                                         img['filename'])) as _img:
                jimg['width'], jimg['height'] = _img.size
        out['images'].append(jimg)

    json.dump(out, open(params['output_json'], 'w'))
    print('wrote ', params['output_json'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--output_json', default='data.json')
    parser.add_argument('--output_h5', default='data')
    parser.add_argument('--images_root', default='')
    parser.add_argument('--max_length', default=16, type=int)
    parser.add_argument('--word_count_threshold', default=5, type=int)
    args = parser.parse_args()
    params = vars(args)
    print('parsed input parameters:')
    print(json.dumps(params, indent=2))
    main(params)
