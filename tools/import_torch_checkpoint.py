"""Import a reference PyTorch checkpoint into this framework.

    python tools/import_torch_checkpoint.py \
        --infos_path log_x/infos_x.pkl --model log_x/model.pth \
        --output_dir log_x_tpu --id x

Writes ``model.npz`` + a compatible ``infos_<id>.pkl`` so tools/eval.py and
tools/train.py (--start_from) work directly.  Conversion fidelity is
covered by tests/test_reference_parity.py (exact greedy/beam captions).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import captioning_tpu.utils.misc as utils
from captioning_tpu.models.harness import config_from_opt
from captioning_tpu.utils.torch_convert import convert_checkpoint

utils.honor_jax_platforms_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--infos_path', required=True)
    parser.add_argument('--model', required=True, help='torch model.pth')
    parser.add_argument('--output_dir', required=True)
    parser.add_argument('--id', default=None)
    args = parser.parse_args()

    with open(args.infos_path, 'rb') as f:
        infos = utils.pickle_load(f)
    opt = infos['opt']
    run_id = args.id if args.id is not None else getattr(opt, 'id', '')

    cfg = config_from_opt(opt, len(infos['vocab']))
    variables = convert_checkpoint(args.model, cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    utils.save_pytree(variables, os.path.join(args.output_dir, 'model.npz'))
    infos['loader_state_dict'] = None  # torch sampler state is not portable
    with open(os.path.join(args.output_dir, 'infos_%s.pkl' % run_id),
              'wb') as f:
        utils.pickle_dump(infos, f)
    print('wrote', args.output_dir, '(model.npz, infos_%s.pkl)' % run_id)


if __name__ == '__main__':
    main()
