"""BPE-vocab variant of prepro_labels (port of
``/root/reference/scripts/build_bpe_subword_nmt.py``).

The reference depends on the ``subword-nmt`` package; the BPE learner and
applier are implemented natively here (classic Sennrich learn_bpe:
iteratively merge the most frequent adjacent symbol pair; tokens carry the
``</w>`` end marker and applied splits are joined with the ``@@ `` BPE
separator that ``utils.misc.decode_sequence`` strips, misc.py:83).

Outputs the same artifacts: ``<output_h5>_label.h5`` and a json whose
``bpe`` field stores the learned merge codes.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import Counter, defaultdict
from random import seed

import h5py
import numpy as np


def learn_bpe(word_counts: Counter, num_merges: int):
    """Sennrich-style BPE merges over a {word: count} vocabulary."""
    vocab = {tuple(w) + ('</w>',): c for w, c in word_counts.items()}
    merges = []

    def pair_stats(vocab):
        stats = defaultdict(int)
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                stats[(a, b)] += c
        return stats

    for _ in range(num_merges):
        stats = pair_stats(vocab)
        if not stats:
            break
        best = max(stats.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if stats[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == best[0]
                        and word[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


class BPE:
    def __init__(self, merges):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.cache = {}

    def segment_word(self, w: str):
        if w in self.cache:
            return self.cache[w]
        word = list(w) + ['</w>']
        while len(word) > 1:
            pairs = [(self.ranks.get((a, b), 1 << 30), i)
                     for i, (a, b) in enumerate(zip(word, word[1:]))]
            rank, i = min(pairs)
            if rank == 1 << 30:
                break
            word = word[:i] + [word[i] + word[i + 1]] + word[i + 2:]
        # drop the end marker; '@@' marks non-final subwords
        if word[-1] == '</w>':
            word = word[:-1]
        elif word[-1].endswith('</w>'):
            word[-1] = word[-1][:-4]
        toks = [t + '@@' for t in word[:-1]] + word[-1:]
        self.cache[w] = toks
        return toks

    def segment(self, sent: str):
        out = []
        for w in sent.strip().split():
            out.extend(self.segment_word(w))
        return ' '.join(out)


def main(params):
    imgs = json.load(open(params['input_json'], 'r'))['images']
    seed(123)

    counts = Counter(w for img in imgs for s in img['sentences']
                     for w in s['tokens'])
    print('learning %d BPE merges over %d word types...'
          % (params['num_merges'], len(counts)))
    merges = learn_bpe(counts, params['num_merges'])
    bpe = BPE(merges)

    # segment all captions
    for img in imgs:
        img['final_captions'] = [
            bpe.segment(' '.join(s['tokens'])).split(' ')
            for s in img['sentences']]

    # vocab over subwords (all kept; BPE has no UNK in-domain)
    sub_counts = Counter(t for img in imgs for cap in img['final_captions']
                         for t in cap)
    vocab = [w for w, _ in sub_counts.most_common()]
    itow = {i + 1: w for i, w in enumerate(vocab)}
    wtoi = {w: i + 1 for i, w in enumerate(vocab)}
    print('BPE vocab size:', len(vocab))

    from prepro_labels import encode_captions
    L, s_ix, e_ix, lens = encode_captions(imgs, params['max_length'], wtoi)

    with h5py.File(params['output_h5'] + '_label.h5', 'w') as f:
        f.create_dataset('labels', dtype='uint32', data=L)
        f.create_dataset('label_start_ix', dtype='uint32', data=s_ix)
        f.create_dataset('label_end_ix', dtype='uint32', data=e_ix)
        f.create_dataset('label_length', dtype='uint32', data=lens)

    out = {'ix_to_word': itow,
           'bpe': '\n'.join(' '.join(m) for m in merges),
           'images': []}
    for img in imgs:
        jimg = {'split': img['split']}
        if 'filename' in img:
            jimg['file_path'] = os.path.join(img.get('filepath', ''),
                                             img['filename'])
        if 'cocoid' in img:
            jimg['id'] = img['cocoid']
        elif 'imgid' in img:
            jimg['id'] = img['imgid']
        out['images'].append(jimg)
    json.dump(out, open(params['output_json'], 'w'))
    print('wrote ', params['output_json'])


if __name__ == '__main__':
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', required=True)
    parser.add_argument('--output_json', default='data.json')
    parser.add_argument('--output_h5', default='data')
    parser.add_argument('--max_length', default=16, type=int)
    parser.add_argument('--num_merges', default=6000, type=int)
    args = parser.parse_args()
    main(vars(args))
