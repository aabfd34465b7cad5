"""Geometry utils, NMS/rootSIFT, streamer tests."""

import cv2
import numpy as np

from gims_tpu.eval import geometry as G
from gims_tpu.frontend.nms import root_sift, diou_nms, nms_keypoints, ImageStreamer


def test_estimate_pose_roundtrip(rng=np.random.RandomState(0)):
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    # synthetic 3D points and a known relative pose
    pts3 = rng.rand(200, 3) * 4 + [[-2, -2, 6]]
    angle = np.deg2rad(8.0)
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.6, 0.05, 0.02])
    p0 = (pts3 / pts3[:, 2:]) @ K.T
    cam1 = pts3 @ R.T + t
    p1 = (cam1 / cam1[:, 2:]) @ K.T
    out = G.estimate_pose(p0[:, :2], p1[:, :2], K, K, thresh=1.0)
    assert out is not None
    R_est, t_est, inl = out
    err_t, err_R = G.compute_pose_error(
        np.block([[R, t[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]),
        R_est, t_est,
    )
    assert err_R < 1.0
    assert err_t < 2.0
    assert inl.mean() > 0.9


def test_epipolar_error_zero_on_inliers(rng=np.random.RandomState(1)):
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    pts3 = rng.rand(50, 3) * 3 + [[-1.5, -1.5, 5]]
    R = np.eye(3)
    t = np.array([1.0, 0.0, 0.0])
    p0 = (pts3 / pts3[:, 2:]) @ K.T
    cam1 = pts3 @ R.T + t
    p1 = (cam1 / cam1[:, 2:]) @ K.T
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    err = G.compute_epipolar_error(p0[:, :2], p1[:, :2], T, K, K)
    assert np.max(err) < 1e-8


def test_rotate_scale_intrinsics():
    K = np.array([[100.0, 0, 50], [0, 90.0, 40], [0, 0, 1]])
    K2 = G.scale_intrinsics(K, (2.0, 2.0))
    assert K2[0, 0] == 50 and K2[1, 1] == 45
    Kr = G.rotate_intrinsics(K, (81, 101), 1)
    assert Kr[0, 0] == 90.0  # fx/fy swapped on 90-degree rotation


def test_root_sift():
    d = np.abs(np.random.RandomState(0).rand(5, 128).astype(np.float32))
    r = root_sift(d.copy())
    np.testing.assert_allclose((r**2).sum(1), 1.0, rtol=1e-3)


def test_diou_nms_suppresses_overlaps():
    dets = np.array([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    kept = diou_nms(dets, scores, iou_thresh=0.3)
    assert len(kept) == 2  # overlapping pair collapsed


def test_nms_keypoints():
    def kp(x, y, response):
        k = cv2.KeyPoint(x, y, 8.0)
        k.response = response
        return k

    kps = [kp(10.0, 10.0, 0.9), kp(11.0, 10.5, 0.5), kp(60.0, 60.0, 0.7)]
    kept = nms_keypoints(kps, radius=8, iou_thresh=0.3)
    assert len(kept) == 2


def test_image_streamer(tmp_path):
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"f{i}.png"),
                    np.full((20, 30, 3), i * 40, np.uint8))
    s = ImageStreamer(str(tmp_path), resize=(16, 12), skip=2)
    frames = []
    while True:
        f, ok = s.next_frame()
        if not ok:
            break
        frames.append(f)
    assert len(frames) == 2
    assert frames[0].shape == (12, 16, 3)


def test_send_notify(monkeypatch):
    """Configurable completion webhook (reference: utils/common.py:831-835
    hard-codes its endpoint; here GIMS_NOTIFY_URL selects it, unset = no-op)."""
    import http.server
    import threading
    import urllib.parse

    from gims_tpu.core.notify import send_notify

    monkeypatch.delenv("GIMS_NOTIFY_URL", raising=False)
    assert send_notify("ignored") is False  # unset -> no-op

    got = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            got["query"] = urllib.parse.urlparse(self.path).query
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.handle_request, daemon=True)
    t.start()
    monkeypatch.setenv("GIMS_NOTIFY_URL",
                       f"http://127.0.0.1:{srv.server_port}/send")
    assert send_notify("eval done: auc 92") is True
    t.join(timeout=10)
    srv.server_close()
    assert urllib.parse.parse_qs(got["query"])["msg"] == ["eval done: auc 92"]

    # failures are swallowed (server gone)
    assert send_notify("nobody listening") is False
