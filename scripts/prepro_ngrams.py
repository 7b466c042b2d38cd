"""Precompute n-gram document frequencies for fast CIDEr during SCST.

Port of ``/root/reference/scripts/prepro_ngrams.py``: builds both
word-level (``-words.p``) and id-level (``-idxs.p``) doc-frequency caches
over the training references (with ``<eos>``=0 appended), in the pickle
format consumed by utils.cider_scorer.CiderD.
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import defaultdict


def precook_ngrams(words, n=4):
    counts = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i:i + k])] += 1
    return counts


def get_doc_freq(refs):
    """document_frequency over reference sets (cider CiderScorer
    compute_doc_freq semantics: df counts images containing the ngram in
    any of their refs)."""
    document_frequency = defaultdict(float)
    for ref_group in refs:
        ngrams = set()
        for ref in ref_group:
            ngrams.update(precook_ngrams(ref.split()).keys())
        for ngram in ngrams:
            document_frequency[ngram] += 1
    return document_frequency, len(refs)


def build_dict(imgs, wtoi, params):
    wtoi = dict(wtoi)
    wtoi['<eos>'] = 0

    count_imgs = 0
    refs_words = []
    refs_idxs = []
    for img in imgs:
        if (params['split'] == img['split']) or \
           (params['split'] == 'train' and img['split'] == 'restval') or \
           (params['split'] == 'all'):
            ref_words = []
            ref_idxs = []
            for sent in img['sentences']:
                tmp_tokens = sent['tokens'] + ['<eos>']
                tmp_tokens = [_ if _ in wtoi else 'UNK' for _ in tmp_tokens]
                ref_words.append(' '.join(tmp_tokens))
                ref_idxs.append(' '.join([str(wtoi[_]) for _ in tmp_tokens]))
            refs_words.append(ref_words)
            refs_idxs.append(ref_idxs)
            count_imgs += 1
    print('total imgs:', count_imgs)

    ngram_words, count_refs = get_doc_freq(refs_words)
    ngram_idxs, count_refs = get_doc_freq(refs_idxs)
    print('count_refs:', count_refs)
    return ngram_words, ngram_idxs, count_refs


def main(params):
    imgs = json.load(open(params['input_json'], 'r'))
    dict_json = json.load(open(params['dict_json'], 'r'))
    itow = dict_json['ix_to_word']
    wtoi = {w: i for i, w in itow.items()}

    imgs = imgs['images']
    ngram_words, ngram_idxs, ref_len = build_dict(imgs, wtoi, params)

    with open(params['output_pkl'] + '-words.p', 'wb') as f:
        pickle.dump({'document_frequency': dict(ngram_words),
                     'ref_len': ref_len}, f, protocol=2)
    with open(params['output_pkl'] + '-idxs.p', 'wb') as f:
        pickle.dump({'document_frequency': dict(ngram_idxs),
                     'ref_len': ref_len}, f, protocol=2)


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', default='data/dataset_coco.json')
    parser.add_argument('--dict_json', default='data/cocotalk.json')
    parser.add_argument('--output_pkl', default='data/coco-all')
    parser.add_argument('--split', default='all')
    args = parser.parse_args()
    main(vars(args))
