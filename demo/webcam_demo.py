"""Webcam demo (reference: demo/webcam_demo.py)."""
import os.path as _osp
import sys as _sys
_sys.path.insert(0, _osp.join(_osp.dirname(_osp.abspath(__file__)), *(['..'] * ('analysis_tools' in _osp.dirname(_osp.abspath(__file__)) and 2 or 1))))
import argparse

import cv2

from swindet_tpu.apis.inference import (inference_detector, init_detector,
                                        show_result)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--camera-id', type=int, default=0)
    parser.add_argument('--score-thr', type=float, default=0.3)
    args = parser.parse_args()

    model = init_detector(args.config, args.checkpoint)
    cap = cv2.VideoCapture(args.camera_id)
    print('Press ESC to exit')
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(model, frame)
        drawn = show_result(frame, result, model.CLASSES,
                            score_thr=args.score_thr)
        cv2.imshow('webcam', drawn)
        if cv2.waitKey(1) == 27:
            break


if __name__ == '__main__':
    main()
