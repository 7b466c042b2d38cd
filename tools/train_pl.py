"""Lightning-path compatibility entry point (reference tools/train_pl.py).

The reference keeps two training entry points: tools/train.py (single
process, nn.DataParallel) and tools/train_pl.py (pytorch-lightning DDP
over all visible GPUs, reference train_pl.py:458-499).  In this framework
the distinction disappears: tools/train.py already trains data-parallel
over every local device through a `jax.sharding.Mesh` (`_maybe_mesh`,
replacing both DataParallel and Lightning's `strategy='ddp'`), gradients
are reduced by XLA collectives over ICI instead of NCCL, and both
tensorboard and wandb loggers are wired (`--use_wandb`, mirroring
train_pl.py:442-449).

This shim preserves the reference CLI contract:

* `python tools/train_pl.py --cfg configs/x.yml --id x` trains exactly like
  tools/train.py with the mesh defaulted to all local devices (the
  Lightning semantics of `devices=torch.cuda.device_count()`,
  train_pl.py:479-480).  Unlike Lightning, batch_size is interpreted
  globally and sharded per device (train_pl.py:459-460 divides it
  explicitly; the mesh shard does the same thing implicitly).
* `EVALUATE=1 python tools/train_pl.py ...` evaluates the trained
  checkpoint on the test split instead of training (reference
  train_pl.py:494-497).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from captioning_tpu.utils import opts
from captioning_tpu.utils.misc import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    opt = opts.parse_opt()

    if os.environ.get('EVALUATE', '0') == '1':
        # reference train_pl.py:494-497: EVALUATE=1 switches to test
        import tools.eval as eval_cli
        ckpt = os.path.join(opt.checkpoint_path, 'model-best.npz')
        if not os.path.exists(ckpt):
            ckpt = os.path.join(opt.checkpoint_path, 'model.npz')
        infos = os.path.join(opt.checkpoint_path,
                             'infos_' + opt.id + '-best.pkl')
        if not os.path.exists(infos):
            infos = os.path.join(opt.checkpoint_path,
                                 'infos_' + opt.id + '.pkl')
        sys.argv = [sys.argv[0],
                    '--model', ckpt,
                    '--infos_path', infos,
                    '--split', 'test',
                    '--language_eval', str(getattr(opt, 'language_eval', 0)),
                    '--beam_size', str(max(1, opt.beam_size))]
        eval_cli.main()
        return

    import tools.train as train_cli
    train_cli.train(opt)


if __name__ == '__main__':
    main()
