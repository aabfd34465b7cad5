"""Keypoint post-processing: DIoU-NMS, rootSIFT, top-k filtering.

Parity with reference utils/common.py:698-807 (`rootSIFT`, `diou_nms`,
`process_diou_nms`). The NMS path is optional in the reference's frontend
(commented out at common.py:863) but exposed as a first-class capability.
"""

from __future__ import annotations

import cv2
import numpy as np


def root_sift(descs, eps=1e-7, l2norm=False):
    """Hellinger-kernel normalization of SIFT descriptors
    (reference: common.py:698-708)."""
    descs = descs / (descs.sum(axis=1, keepdims=True) + eps)
    descs = np.sqrt(descs)
    if l2norm:
        descs = descs / np.sqrt(
            (descs**2).sum(axis=1, keepdims=True) + 1e-10
        )
    return descs


def diou_nms(dets, scores, iou_thresh=None, beta=1.0):
    """Distance-IoU NMS over [x1,y1,x2,y2] boxes; returns kept boxes
    (reference: common.py:720-776)."""
    iou_thresh = iou_thresh or 0.5
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        ex1 = np.minimum(x1[i], x1[order[1:]])
        ex2 = np.maximum(x2[i], x2[order[1:]])
        ey1 = np.minimum(y1[i], y1[order[1:]])
        ey2 = np.maximum(y2[i], y2[order[1:]])
        diag2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
        cdist2 = (cx[i] - cx[order[1:]]) ** 2 + (cy[i] - cy[order[1:]]) ** 2
        diou = iou - np.power(cdist2 / (diag2 + 1e-10), beta)
        inds = np.where(diou <= iou_thresh)[0]
        order = order[inds + 1]
    return dets[keep]


def nms_keypoints(keypoints, radius=None, iou_thresh=0.3):
    """DIoU-NMS over cv2 keypoints; returns the surviving keypoints
    (reference: common.py:778-807)."""
    if radius == 0:
        return keypoints
    scores = np.array([k.response for k in keypoints], np.float32)
    half = (radius / 2) if radius else None
    dets = np.array([
        [
            k.pt[0] - (half if half else k.size / 2),
            k.pt[1] - (half if half else k.size / 2),
            k.pt[0] + (half if half else k.size / 2),
            k.pt[1] + (half if half else k.size / 2),
        ]
        for k in keypoints
    ], np.float32)
    res = diou_nms(dets, scores, iou_thresh)
    indexes = []
    for item in res:
        i = np.argwhere(
            (dets[:, 0] == item[0]) & (dets[:, 1] == item[1])
            & (dets[:, 2] == item[2]) & (dets[:, 3] == item[3])
        )
        if i.size:
            indexes.append(int(i[0][0]))
    return [keypoints[i] for i in indexes]


class ImageStreamer:
    """Sequential frame source over a directory, glob, or video file
    (the reference's VideoStreamer capability, utils/common.py:177-314,
    minus live-camera support which this environment cannot exercise)."""

    def __init__(self, source, resize=(640, 480), skip=1, max_length=10**6):
        import glob as globmod
        from pathlib import Path

        self.resize = resize
        self.i = 0
        self.cap = None
        path = Path(str(source))
        if path.is_dir():
            listing = sorted(
                p for p in path.iterdir()
                if p.suffix.lower() in (".jpg", ".png", ".jpeg")
            )
            self.listing = listing[::skip][:max_length]
        elif path.exists() and path.suffix.lower() in (".mp4", ".avi", ".mkv"):
            self.cap = cv2.VideoCapture(str(path))
            n = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self.listing = list(range(n))[::skip][:max_length]
        else:
            self.listing = sorted(globmod.glob(str(source)))[::skip][:max_length]
        if not self.listing:
            raise IOError(f"no frames found at {source}")

    def next_frame(self):
        if self.i >= len(self.listing):
            return None, False
        if self.cap is not None:
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, self.listing[self.i])
            ret, frame = self.cap.read()
            if not ret:
                return None, False
        else:
            frame = cv2.imread(str(self.listing[self.i]), cv2.IMREAD_COLOR)
        if self.resize:
            frame = cv2.resize(frame, self.resize, interpolation=cv2.INTER_AREA)
        self.i += 1
        return frame, True
