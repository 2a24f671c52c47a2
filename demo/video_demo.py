"""Video demo (reference: demo/video_demo.py) — sustained
preprocess+detect throughput over a persistent jitted engine
(BASELINE.json config 5)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse
import time

import cv2

from swindet_tpu.apis.inference import (inference_detector, init_detector,
                                        show_result)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('video', help='video file')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out', default=None, help='output mp4')
    parser.add_argument('--score-thr', type=float, default=0.3)
    parser.add_argument('--show', action='store_true')
    args = parser.parse_args()

    model = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.video)
    writer = None
    n, t0 = 0, time.perf_counter()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(model, frame)
        drawn = show_result(frame, result, model.CLASSES,
                            score_thr=args.score_thr)
        if args.out:
            if writer is None:
                fourcc = cv2.VideoWriter_fourcc(*'mp4v')
                writer = cv2.VideoWriter(
                    args.out, fourcc, cap.get(cv2.CAP_PROP_FPS) or 25,
                    (drawn.shape[1], drawn.shape[0]))
            writer.write(drawn)
        if args.show:
            cv2.imshow('video', drawn)
            if cv2.waitKey(1) == 27:
                break
        n += 1
    dt = time.perf_counter() - t0
    print(f'{n} frames in {dt:.1f}s = {n / dt:.2f} fps')
    if writer:
        writer.release()


if __name__ == '__main__':
    main()
