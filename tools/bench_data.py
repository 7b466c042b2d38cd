"""Input-pipeline benchmark: steady-state DataLoader throughput.

Builds (or reuses) a synthetic dataset at production COCO shapes
(fc 2048, att 36x2048 float32 — ~295 KB/image of attention features)
and measures `DataLoader.get_batch('train')` in isolation: sampler ->
threaded item reads -> collate -> bucketed pad -> queue.  This is the
host-side ceiling that must stay ahead of the device step (BENCH.md
training rows) for the prefetch pipeline to hide data loading.

Usage: python tools/bench_data.py [--images 600] [--batch 128]
       [--threads 4] [--iters 40] [--dir /tmp/bench_data]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--images', type=int, default=600)
    parser.add_argument('--batch', type=int, default=128)
    parser.add_argument('--threads', type=int, default=4)
    parser.add_argument('--prefetch', type=int, default=4)
    parser.add_argument('--iters', type=int, default=40)
    parser.add_argument('--seq_per_img', type=int, default=5)
    parser.add_argument('--native_io', type=int, default=1,
                        help='0 forces the Python item path (A/B against the'
                             ' C++ batch loader, native/dataio.cpp)')
    parser.add_argument('--dir', type=str, default='/tmp/bench_data',
                        help='dataset dir (reused if already built with the'
                             ' same --images)')
    args = parser.parse_args()

    from tests.util_synth import build_synthetic_dataset, make_opt
    from captioning_tpu.data.dataset import DataLoader

    marker = os.path.join(args.dir, '.built_%d' % args.images)
    if not os.path.exists(marker):
        print('building synthetic dataset (%d images, 36x2048 att)...'
              % args.images)
        build_synthetic_dataset(args.dir, n_images=args.images,
                                vocab_size=9487, seq_length=16,
                                fc_dim=2048, att_dim=2048, max_att=36)
        open(marker, 'w').close()

    from types import SimpleNamespace
    ds = SimpleNamespace(
        input_json=os.path.join(args.dir, 'talk.json'),
        input_label_h5=os.path.join(args.dir, 'talk_label.h5'),
        input_fc_dir=os.path.join(args.dir, 'feats_fc'),
        input_att_dir=os.path.join(args.dir, 'feats_att'),
        input_box_dir=os.path.join(args.dir, 'feats_box'),
        cached_tokens=os.path.join(args.dir, 'talk-idxs.p'),
        fc_dim=2048, att_dim=2048)
    opt = make_opt(ds, model='updown',
                   batch_size=args.batch, seq_per_img=args.seq_per_img,
                   num_data_threads=args.threads, num_prefetch=args.prefetch,
                   native_io=args.native_io)
    loader = DataLoader(opt)
    print('native IO engaged:', loader.dataset.native_io is not None)

    # warmup: first batches pay cold page cache + thread spin-up
    for _ in range(5):
        loader.get_batch('train')
    t0 = time.time()
    att_bytes = 0
    for _ in range(args.iters):
        b = loader.get_batch('train')
        att_bytes += b['att_feats'].nbytes
    dt = time.time() - t0
    img_s = args.batch * args.iters / dt
    print('loader train batch=%d threads=%d prefetch=%d: %.3f s/batch -> '
          '%.0f img/s (%.0f MB/s padded att)' %
          (args.batch, args.threads, args.prefetch, dt / args.iters, img_s,
           att_bytes / dt / 1e6))


if __name__ == '__main__':
    main()
