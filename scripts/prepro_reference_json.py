"""Build a coco-caption-style annotation json for custom datasets /
flickr30k (port of ``/root/reference/scripts/prepro_reference_json.py``)."""

from __future__ import annotations

import argparse
import json


def main(params):
    imgs = json.load(open(params['input_json'][0], 'r'))['images']

    out = {'info': {'description': 'Reference captions for evaluation.',
                    'version': '1.0'},
           'licenses': [], 'type': 'captions',
           'images': [], 'annotations': []}

    cnt = 0
    for img in imgs:
        if img['split'] == 'train':
            continue
        out['images'].append({'id': img.get('cocoid', img.get('imgid'))})
        for s in img['sentences']:
            if len(s) == 0:
                continue
            out['annotations'].append(
                {'image_id': out['images'][-1]['id'],
                 'caption': ' '.join(s['tokens']), 'id': cnt})
            cnt += 1

    json.dump(out, open(params['output_json'], 'w'))
    print('wrote ', params['output_json'])


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--input_json', nargs='+', required=True)
    parser.add_argument('--output_json', default='data.json')
    args = parser.parse_args()
    params = vars(args)
    print('parsed input parameters:')
    print(json.dumps(params, indent=2))
    main(params)
