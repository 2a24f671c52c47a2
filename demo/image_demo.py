"""Single-image demo (reference: demo/image_demo.py)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse

from swindet_tpu.apis.inference import (inference_detector, init_detector,
                                        show_result)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('img', help='image file')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out-file', default='result.jpg')
    parser.add_argument('--score-thr', type=float, default=0.3)
    args = parser.parse_args()

    model = init_detector(args.config, args.checkpoint)
    result = inference_detector(model, args.img)
    show_result(args.img, result, model.CLASSES,
                score_thr=args.score_thr, out_file=args.out_file)
    print(f'saved to {args.out_file}')


if __name__ == '__main__':
    main()
