"""On-device CIDEr-D: the SCST reward computed entirely in XLA.

SURVEY.md section 5.8 calls the per-iteration CPU CIDEr-D scoring the main
host-sync point of SCST training; the native C++ scorer already cut it to
~8ms, and this module removes the round trip entirely so the whole SCST
iteration (decode + reward + gradient) can be ONE jitted program.

Exact CIDEr-D semantics (see utils/cider_scorer.py), reformulated over
fixed-shape token matrices:

* every n-gram (n=1..4) at position p of a sequence carries a 64-bit hash
  (two independent 32-bit lanes); multiplicities and clipped tf-idf dot
  products are computed with position-pairwise equality instead of hash
  maps:  norm^2 = sum_i c_i * idf_i^2  and
  dot = sum_i min(c_i, m_i) * m_i * idf_i^2 / c_i, where c_i / m_i are the
  candidate/reference multiplicities of position i's n-gram.
* document frequencies live in a device-resident sorted hash table probed
  with searchsorted (+linear window for the second lane).
* sequences terminate at (and include) the first 0 token (array_to_str,
  reference rewards.py:33-39); length for the gaussian penalty is the
  bigram count.

Exact-match against the python scorer is covered by
tests/test_cider_device.py (up to 64-bit hash collisions, the same
assumption the C++ scorer makes).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

MAX_N = 4
SIGMA = 6.0
_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_PROBE = 8  # linear probe window after searchsorted


def _host_hash_ngram(tokens, lane: int) -> int:
    m = int(_M1) if lane == 0 else int(_M2)
    h = (len(tokens) * 2166136261 + (7 if lane else 3)) & 0xFFFFFFFF
    for t in tokens:
        h = (h * m + (int(t) + 1)) & 0xFFFFFFFF
    return h


class DeviceCiderD:
    """df table + jittable scoring functions."""

    def __init__(self, df_pkl_or_dict, ref_len=None):
        if isinstance(df_pkl_or_dict, str):
            path = (df_pkl_or_dict
                    if df_pkl_or_dict.endswith(('.p', '.pkl'))
                    else 'data/%s.p' % df_pkl_or_dict)
            with open(path, 'rb') as f:
                pkl = pickle.load(f, encoding='latin-1')
            df = pkl['document_frequency']
            ref_len = float(pkl['ref_len'])
        else:
            df = df_pkl_or_dict
            assert ref_len is not None
        self.log_ref_len = float(np.log(ref_len))

        h1, h2, dfv = [], [], []
        for ngram, d in df.items():
            ids = [int(t) for t in ngram]
            h1.append(_host_hash_ngram(ids, 0))
            h2.append(_host_hash_ngram(ids, 1))
            dfv.append(float(d))
        h1 = np.asarray(h1, np.uint32)
        h2 = np.asarray(h2, np.uint32)
        dfv = np.asarray(dfv, np.float32)
        order = np.argsort(h1, kind='stable')
        self.table_h1 = jnp.asarray(h1[order])
        self.table_h2 = jnp.asarray(h2[order])
        self.table_df = jnp.asarray(dfv[order])

    # -- device-side pieces -------------------------------------------------
    def _ngram_hashes(self, seqs):
        """seqs [N, L] int32 -> (h1, h2, valid) each [N, MAX_N, L].

        Position (n-1, p) is the hash of the n-gram starting at p; valid
        only when p + n <= effective length (first 0 inclusive).
        """
        N, L = seqs.shape
        tok = seqs.astype(jnp.uint32) + jnp.uint32(1)
        has_zero = (seqs == 0).any(axis=1)
        first_zero = jnp.argmax(seqs == 0, axis=1)
        eff_len = jnp.where(has_zero, first_zero + 1, L)  # [N]

        h1s, h2s = [], []
        seed1 = []
        for n in range(1, MAX_N + 1):
            s1 = np.uint32((n * 2166136261 + 3) & 0xFFFFFFFF)
            s2 = np.uint32((n * 2166136261 + 7) & 0xFFFFFFFF)
            h1 = jnp.full((N, L), s1, jnp.uint32)
            h2 = jnp.full((N, L), s2, jnp.uint32)
            for k in range(n):
                # token at position p + k (clamped; masked by validity)
                shifted = jnp.roll(tok, -k, axis=1)
                h1 = h1 * _M1 + shifted
                h2 = h2 * _M2 + shifted
            h1s.append(h1)
            h2s.append(h2)
            seed1.append(s1)
        h1 = jnp.stack(h1s, axis=1)   # [N, MAX_N, L]
        h2 = jnp.stack(h2s, axis=1)
        pos = jnp.arange(L)[None, None, :]
        nn = jnp.arange(1, MAX_N + 1)[None, :, None]
        valid = (pos + nn) <= eff_len[:, None, None]
        return h1, h2, valid, eff_len

    def _idf(self, h1, h2):
        """Look up log-idf for hashes (0 when ngram unseen)."""
        shape = h1.shape
        f1 = h1.reshape(-1)
        f2 = h2.reshape(-1)
        idx = jnp.searchsorted(self.table_h1, f1)
        T = self.table_h1.shape[0]
        dfv = jnp.zeros(f1.shape, jnp.float32)
        found = jnp.zeros(f1.shape, bool)
        for k in range(_PROBE):
            j = jnp.minimum(idx + k, T - 1)
            hit = (~found & (self.table_h1[j] == f1) &
                   (self.table_h2[j] == f2))
            dfv = jnp.where(hit, self.table_df[j], dfv)
            found = found | hit
        idf = self.log_ref_len - jnp.log(jnp.maximum(1.0, dfv))
        return idf.reshape(shape)

    @staticmethod
    def _multiplicity(h1a, h2a, va, h1b, h2b, vb):
        """For each ngram position in a: its multiplicity in b.

        a: [..., MAX_N, L]; b broadcast-compatible.  Matching is within the
        same n (dims already aligned on the MAX_N axis).
        """
        eq = ((h1a[..., :, None] == h1b[..., None, :]) &
              (h2a[..., :, None] == h2b[..., None, :]) &
              vb[..., None, :])
        return jnp.sum(eq, axis=-1).astype(jnp.float32) * va

    def sentence_stats(self, seqs):
        """Precompute (h1, h2, valid, count, idf, norm, length) per row."""
        h1, h2, valid, eff_len = self._ngram_hashes(seqs)
        count = self._multiplicity(h1, h2, valid.astype(jnp.float32),
                                   h1, h2, valid)
        idf = self._idf(h1, h2) * valid
        # norm_n^2 = sum_i c_i * idf_i^2  (per n)
        norm2 = jnp.sum(count * idf * idf, axis=-1)     # [N, MAX_N]
        norm = jnp.sqrt(norm2)
        length = jnp.sum(valid[:, 1, :], axis=-1).astype(jnp.float32)
        return dict(h1=h1, h2=h2, valid=valid, count=count, idf=idf,
                    norm=norm, length=length)

    def pair_scores(self, cand, ref):
        """CIDEr-D similarity for aligned candidate/reference stat pytrees
        whose leading dims broadcast; returns [...] scores (already *10/4
        aggregated over n and the length gaussian)."""
        m = self._multiplicity(cand['h1'], cand['h2'],
                               cand['valid'].astype(jnp.float32),
                               ref['h1'], ref['h2'], ref['valid'])
        c = cand['count']
        contrib = jnp.where(c > 0,
                            jnp.minimum(c, m) * m * cand['idf'] ** 2 / jnp.maximum(c, 1.0),
                            0.0)
        dot = jnp.sum(contrib, axis=-1)                  # [..., MAX_N]
        denom = cand['norm'] * ref['norm']
        sim = jnp.where(denom > 0, dot / jnp.maximum(denom, 1e-12), 0.0)
        delta = cand['length'] - ref['length']
        gauss = jnp.exp(-(delta * delta) / (2 * SIGMA * SIGMA))
        return jnp.sum(sim, axis=-1) * gauss[...] * (10.0 / MAX_N)

    def score(self, cands, refs, ref_mask):
        """cands [N, L]; refs [N, R, Lr]; ref_mask [N, R] -> scores [N].

        refs are already expanded per candidate (group gather done by the
        caller); rows with ref_mask 0 are ignored in the mean.
        """
        N, R, Lr = refs.shape
        c_stats = self.sentence_stats(cands)
        r_stats = self.sentence_stats(refs.reshape(N * R, Lr))
        r_stats = jax.tree.map(
            lambda x: x.reshape((N, R) + x.shape[1:]), r_stats)
        c_exp = jax.tree.map(lambda x: x[:, None], c_stats)
        per_ref = self.pair_scores(c_exp, r_stats)       # [N, R]
        per_ref = per_ref * ref_mask
        n_refs = jnp.maximum(ref_mask.sum(-1), 1.0)
        return per_ref.sum(-1) / n_refs

    def _bleu4_grouped(self, c_stats, r_stats, ref_mask):
        """Per-sentence BLEU-4 (coco-caption semantics: tiny/small smoothing,
        closest-ref-length brevity penalty with shorter-length tie-break) for
        cand stats [B, k, ...] x ref stats [B, R, ...] -> [B, k].

        Matches ``utils/cider_scorer.py:Bleu`` (itself the behavioural port
        of the reference's pycocoevalcap BLEU used for mixed SCST rewards,
        reference rewards.py:60-67) on the same id-string sequences; computed
        in log space so the tiny/small-smoothed products stay inside f32
        range.
        """
        small, tiny = 1e-9, 1e-15
        # per-ref multiplicities of every candidate n-gram: [B, k, R, n, L]
        m = self._multiplicity(
            c_stats['h1'][:, :, None], c_stats['h2'][:, :, None],
            c_stats['valid'][:, :, None].astype(jnp.float32),
            r_stats['h1'][:, None], r_stats['h2'][:, None],
            r_stats['valid'][:, None])
        m = m * ref_mask[:, None, :, None, None]
        rmax = jnp.max(m, axis=2)                       # [B, k, n, L]
        c = c_stats['count']
        # sum over positions of min(c, rmax)/c == sum over TYPES of
        # min(c, rmax): clipped correct counts per n
        correct = jnp.sum(
            jnp.where(c > 0, jnp.minimum(c, rmax) / jnp.maximum(c, 1.0), 0.0),
            axis=-1)                                    # [B, k, n]
        guess = jnp.sum(c_stats['valid'], axis=-1).astype(jnp.float32)
        testlen = guess[..., 0]                         # [B, k]
        # closest reference length, ties -> shorter (host: min((diff, len)))
        rlen = jnp.sum(r_stats['valid'][..., 0, :], axis=-1)      # [B, R] int
        big = r_stats['valid'].shape[-1] + 2
        tl = testlen.astype(jnp.int32)
        diff = jnp.abs(rlen[:, None, :] - tl[:, :, None])         # [B, k, R]
        key = diff * big + rlen[:, None, :]
        key = jnp.where(ref_mask[:, None, :] > 0, key, jnp.int32(2 ** 30))
        reflen = (jnp.min(key, axis=-1) % big).astype(jnp.float32)
        log_prec = jnp.log(correct + tiny) - jnp.log(guess + small)
        ratio = (testlen + tiny) / (reflen + small)
        log_bp = jnp.where(ratio < 1, 1.0 - 1.0 / jnp.maximum(ratio, tiny),
                           0.0)
        return jnp.exp(jnp.sum(log_prec, axis=-1) / MAX_N + log_bp)

    def _mixed_score_grouped(self, c_stats, r_stats, ref_mask,
                             cider_weight, bleu_weight):
        """cider_weight * CIDEr-D + bleu_weight * BLEU-4 over grouped stats
        (weights are trace-time python floats; a zero weight removes that
        scorer from the compiled program entirely)."""
        out = 0.0
        if cider_weight:
            out = self._mean_score_grouped(c_stats, r_stats,
                                           ref_mask) * cider_weight
        if bleu_weight:
            out = out + self._bleu4_grouped(c_stats, r_stats,
                                            ref_mask) * bleu_weight
        if isinstance(out, float):
            out = jnp.zeros(c_stats['norm'].shape[:2], jnp.float32)
        return out

    def _mean_score_grouped(self, c_stats, r_stats, ref_mask):
        """cand stats [B, k, ...] x ref stats [B, R, ...] -> [B, k]."""
        c_exp = jax.tree.map(lambda x: x[:, :, None], c_stats)
        r_exp = jax.tree.map(lambda x: x[:, None], r_stats)
        per_ref = self.pair_scores(c_exp, r_exp)          # [B, k, R]
        per_ref = per_ref * ref_mask[:, None]
        n_refs = jnp.maximum(ref_mask.sum(-1), 1.0)[:, None]
        return per_ref.sum(-1) / n_refs

    def score_grouped(self, cands, refs, ref_mask, n: int,
                      cider_weight: float = 1.0, bleu_weight: float = 0.0):
        """cands [B*n, L]; refs [B, R, Lr]; ref_mask [B, R] -> scores [B*n]
        (cider_weight * CIDEr-D + bleu_weight * BLEU-4).

        Same result as ``score(cands, repeat(refs, n), repeat(mask, n))``
        but the reference sentence_stats (the pairwise-equality count tensor
        + the idf table probe, the dominant scorer cost) are computed ONCE
        per image instead of once per candidate row.
        """
        B, R, Lr = refs.shape
        r_stats = jax.tree.map(
            lambda x: x.reshape((B, R) + x.shape[1:]),
            self.sentence_stats(refs.reshape(B * R, Lr)))
        c_stats = jax.tree.map(
            lambda x: x.reshape((B, n) + x.shape[1:]),
            self.sentence_stats(cands))
        return self._mixed_score_grouped(
            c_stats, r_stats, ref_mask, cider_weight,
            bleu_weight).reshape(B * n)

    def self_critical_reward(self, greedy, gen, refs, ref_mask,
                             cider_weight: float = 1.0,
                             bleu_weight: float = 0.0):
        """get_self_critical_reward (reference rewards.py:41-81), fully on
        device, with the reference's mixed reward
        cider_weight * CIDEr-D + bleu_weight * BLEU-4 (rewards.py:60-74).
        greedy [B, L]; gen [B*n, L]; refs [B, R, Lr];
        ref_mask [B, R] -> rewards [B*n, L].

        Reference sentence stats are computed once and shared by the n
        samples AND the greedy baseline (the repeat-then-score formulation
        re-derived them n+1 times inside the fused SCST program)."""
        B = greedy.shape[0]
        N = gen.shape[0]
        n = N // B
        R, Lr = refs.shape[1], refs.shape[2]
        r_stats = jax.tree.map(
            lambda x: x.reshape((B, R) + x.shape[1:]),
            self.sentence_stats(refs.reshape(B * R, Lr)))
        g_stats = jax.tree.map(
            lambda x: x.reshape((B, n) + x.shape[1:]),
            self.sentence_stats(gen))
        gr_stats = jax.tree.map(lambda x: x[:, None],
                                self.sentence_stats(greedy))
        s_gen = self._mixed_score_grouped(
            g_stats, r_stats, ref_mask, cider_weight, bleu_weight)  # [B, n]
        s_greedy = self._mixed_score_grouped(
            gr_stats, r_stats, ref_mask, cider_weight, bleu_weight)[:, 0]
        adv = (s_gen - s_greedy[:, None]).reshape(N)
        return jnp.repeat(adv[:, None], gen.shape[1], axis=1)

    def self_cider_grouped(self, gen, n: int):
        """Self-CIDEr diversity reward fully on device: gen [B*n, L] ->
        scores [B] (reference rewards.py:114-135).

        Per image, the PLAIN-Cider gram matrix over the n samples:
        G[i, j] = mean_k( <tf_i*idf, tf_j*idf>_k / (norm_i,k norm_j,k) )
        * 10, via the position-pairwise identity
        <v_i, v_j>_k = sum_{positions p of i} mult_j(p) * idf_p^2 (each
        of i's positions contributes tf_j*idf^2 once, so summing over
        positions multiplies by tf_i).  Then the reference's eigenvalue
        diversity: -log(sqrt(l_max) / sum sqrt(l_+)) / log(n) over
        eigvalsh(G / 10).  Plain Cider has no clipping and no length
        gaussian, and its tf-idf uses the SAME cached df table as
        CIDEr-D (utils/cider_scorer.py Cider._counts2vec), so the stats
        machinery is shared.  Host scorer runs the eig in f64; device
        f32 agrees to ~1e-5 (tests/test_cider_device.py).
        """
        N, L = gen.shape
        B = N // n
        st = self.sentence_stats(gen)
        g = jax.tree.map(lambda x: x.reshape((B, n) + x.shape[1:]), st)
        a = jax.tree.map(lambda x: x[:, :, None], g)     # [B, n, 1, ...]
        bb = jax.tree.map(lambda x: x[:, None], g)       # [B, 1, n, ...]
        m = self._multiplicity(a['h1'], a['h2'],
                               a['valid'].astype(jnp.float32),
                               bb['h1'], bb['h2'], bb['valid'])
        dot = jnp.sum(m * a['idf'] ** 2, axis=-1)        # [B, n, n, MAX_N]
        denom = a['norm'] * bb['norm']
        sim = jnp.where(denom > 0, dot / jnp.maximum(denom, 1e-12), 0.0)
        gram = sim.mean(-1)                              # [B, n, n] (G/10)
        lam = jnp.clip(jnp.linalg.eigvalsh(gram), 0.0, None)
        sq = jnp.sqrt(lam)                               # ascending
        ssum = sq.sum(-1)
        ratio = jnp.where(ssum > 0,
                          sq[..., -1] / jnp.maximum(ssum, 1e-12), 1.0)
        return -jnp.log(jnp.maximum(ratio, 1e-12)) / np.log(n)


def pad_gts(data_gts, pad_to_multiple: int = 1):
    """Host helper: list of [n_i, Lr] int arrays -> (refs [B, R, Lr],
    mask [B, R]) with R = max n_i (optionally rounded up for shape reuse)."""
    B = len(data_gts)
    R = max(len(g) for g in data_gts)
    if pad_to_multiple > 1:
        R = -(-R // pad_to_multiple) * pad_to_multiple
    Lr = max(np.asarray(g).shape[1] for g in data_gts)
    refs = np.zeros((B, R, Lr), np.int32)
    mask = np.zeros((B, R), np.float32)
    for i, g in enumerate(data_gts):
        g = np.asarray(g, np.int32)
        refs[i, :g.shape[0], :g.shape[1]] = g
        mask[i, :g.shape[0]] = 1.0
    return refs, mask
