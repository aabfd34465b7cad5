"""Pose/epipolar geometry utilities (host numpy).

Parity with the reference's geometry helpers (utils/common.py:389-512):
essential-matrix pose estimation, intrinsics rotation/scaling, epipolar
error, pose angular errors. These back the relative-pose evaluation
capability alongside the homography benchmark.
"""

from __future__ import annotations

import cv2
import numpy as np


def estimate_pose(kpts0, kpts1, K0, K1, thresh, conf=0.99999):
    """RANSAC essential matrix -> (R, t, inlier_mask) or None."""
    if len(kpts0) < 5:
        return None
    f_mean = np.mean([K0[0, 0], K1[1, 1], K0[0, 0], K1[1, 1]])
    norm_thresh = thresh / f_mean
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    E, mask = cv2.findEssentialMat(
        kpts0, kpts1, np.eye(3), threshold=norm_thresh, prob=conf,
        method=cv2.RANSAC,
    )
    if E is None:
        return None
    best_num_inliers = 0
    ret = None
    for _E in np.split(E, len(E) / 3):
        n, R, t, _ = cv2.recoverPose(_E, kpts0, kpts1, np.eye(3), 1e9,
                                     mask=mask)
        if n > best_num_inliers:
            best_num_inliers = n
            ret = (R, t[:, 0], mask.ravel() > 0)
    return ret


def rotate_intrinsics(K, image_shape, rot):
    assert rot <= 3
    h, w = image_shape[:2][:: -1 if (rot % 2) else 1]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    rot = rot % 4
    if rot == 1:
        return np.array([[fy, 0.0, cy], [0.0, fx, w - 1 - cx],
                         [0.0, 0.0, 1.0]], dtype=K.dtype)
    if rot == 2:
        return np.array([[fx, 0.0, w - 1 - cx], [0.0, fy, h - 1 - cy],
                         [0.0, 0.0, 1.0]], dtype=K.dtype)
    return np.array([[fy, 0.0, h - 1 - cy], [0.0, fx, cx],
                     [0.0, 0.0, 1.0]], dtype=K.dtype)


def rotate_pose_inplane(i_T_w, rot):
    rotation_matrices = [
        np.array([
            [np.cos(r), -np.sin(r), 0.0, 0.0],
            [np.sin(r), np.cos(r), 0.0, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ], dtype=np.float32)
        for r in [np.deg2rad(d) for d in (0, 270, 180, 90)]
    ]
    return np.dot(rotation_matrices[rot], i_T_w)


def scale_intrinsics(K, scales):
    return np.dot(np.diag([1.0 / scales[0], 1.0 / scales[1], 1.0]), K)


def to_homogeneous(points):
    return np.concatenate([points, np.ones_like(points[:, :1])], axis=-1)


def compute_epipolar_error(kpts0, kpts1, T_0to1, K0, K1):
    kpts0 = (kpts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    kpts1 = (kpts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    kpts0 = to_homogeneous(kpts0)
    kpts1 = to_homogeneous(kpts1)
    t0, t1, t2 = T_0to1[:3, 3]
    t_skew = np.array([[0, -t2, t1], [t2, 0, -t0], [-t1, t0, 0]])
    E = t_skew @ T_0to1[:3, :3]
    Ep0 = kpts0 @ E.T
    p1Ep0 = np.sum(kpts1 * Ep0, -1)
    Etp1 = kpts1 @ E
    return p1Ep0**2 * (
        1.0 / (Ep0[:, 0]**2 + Ep0[:, 1]**2)
        + 1.0 / (Etp1[:, 0]**2 + Etp1[:, 1]**2)
    )


def angle_error_mat(R1, R2):
    cos = (np.trace(np.dot(R1.T, R2)) - 1) / 2
    return np.rad2deg(np.abs(np.arccos(np.clip(cos, -1.0, 1.0))))


def angle_error_vec(v1, v2):
    n = np.linalg.norm(v1) * np.linalg.norm(v2)
    return np.rad2deg(np.arccos(np.clip(np.dot(v1, v2) / n, -1.0, 1.0)))


def compute_pose_error(T_0to1, R, t):
    error_t = angle_error_vec(t, T_0to1[:3, 3])
    error_t = np.minimum(error_t, 180 - error_t)
    error_R = angle_error_mat(R, T_0to1[:3, :3])
    return error_t, error_R
