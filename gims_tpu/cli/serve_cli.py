"""Demo / serving wrapper.

The reference exposes a hosted Gradio endpoint
`find_matches(image0, image1, resize_enabled) -> (visualization, details)`
(reference: README.md:166-191; implementation not in-repo). This module
provides that API shape as a self-contained stdlib HTTP service: POST two
images, receive the match visualization and a JSON summary.

    python -m gims_tpu.cli.serve_cli --port 7860 &
    curl -F image0=@a.png -F image1=@b.png \
         http://127.0.0.1:7860/find_matches -o out.png
"""

from __future__ import annotations

import argparse
import io
import json
import time

import cv2
import numpy as np


def find_matches(matcher, image0, image1, resize_enabled=True,
                 resize=(800, 600), agc=None):
    """The reference demo's function surface. Returns (viz_bgr, details)."""
    from gims_tpu.eval.viz import draw_matches

    if resize_enabled:
        image0 = cv2.resize(image0, resize)
        image1 = cv2.resize(image1, resize)
    t0 = time.perf_counter()
    from gims_tpu.fused import FusedMatching

    if isinstance(matcher, FusedMatching):
        pred = matcher(image0, image1)
    else:
        pred = matcher({
            "image0": image0[None], "image1": image1[None],
            **(agc or {"radius": 15, "percentile": 2, "min_size": 7}),
            "return_descriptors": False,
        })
    dt = time.perf_counter() - t0
    kpts0 = pred["keypoints0"][0]
    kpts1 = pred["keypoints1"][0]
    matches = pred["matches0"][0]
    valid = matches > -1
    viz = draw_matches(image0, image1, kpts0[valid], kpts1[matches[valid]])
    details = {
        "keypoints0": int(len(kpts0)),
        "keypoints1": int(len(kpts1)),
        "matches": int(valid.sum()),
        "seconds": round(dt, 3),
        "timings": {k: round(v, 3) for k, v in matcher.timings.items()},
    }
    return viz, details


def _parse_multipart(handler):
    import email
    import email.policy

    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length)
    ctype = handler.headers.get("Content-Type", "")
    msg = email.message_from_bytes(
        b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + body,
        policy=email.policy.HTTP,
    )
    files = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            files[name] = part.get_payload(decode=True)
    return files


def serve(port=7860, weights_path=None, fused=False, total_keypoints=12288):
    import http.server

    if fused:
        # flagship single-program path (gims_tpu/fused.py): device DoG
        # detection + dense_gray descriptors; ~one dispatch per request
        from gims_tpu.core.checkpoint import unflatten_npz
        from gims_tpu.fused import FusedMatching

        matcher = FusedMatching({
            "sinkhorn_iterations": 20,
            "match_threshold": 0.02,
            "fast_frontend": True,
            "descriptor_source": "dense_gray",
            "attention_dtype": "bfloat16",
            "radius": 15, "percentile": 2, "min_size": 7,
            "init_scheme": "identity",
        }, variables=(unflatten_npz(weights_path) if weights_path else None),
            total_keypoints=total_keypoints)
    else:
        from gims_tpu.api import Matching

        matcher = Matching({
            "weights_path": weights_path,
            "sinkhorn_iterations": 20,
            "match_threshold": 0.02,
            "max_keypoints": -1,
        })

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path.rstrip("/") != "/find_matches":
                self.send_error(404)
                return
            try:
                files = _parse_multipart(self)
                img0 = cv2.imdecode(
                    np.frombuffer(files["image0"], np.uint8), cv2.IMREAD_COLOR
                )
                img1 = cv2.imdecode(
                    np.frombuffer(files["image1"], np.uint8), cv2.IMREAD_COLOR
                )
                resize_enabled = files.get("resize_enabled", b"1") != b"0"
                viz, details = find_matches(
                    matcher, img0, img1, resize_enabled
                )
                ok, png = cv2.imencode(".png", viz)
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Match-Details", json.dumps(details))
                self.end_headers()
                self.wfile.write(png.tobytes())
            except Exception as e:  # noqa: BLE001
                self.send_error(500, str(e))

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(
                b"<html><body><h1>GIMS-TPU matcher</h1>"
                b"<form action='/find_matches' method='post' "
                b"enctype='multipart/form-data'>"
                b"<input type='file' name='image0'/>"
                b"<input type='file' name='image1'/>"
                b"<input type='submit' value='Match'/></form></body></html>"
            )

    print(f"Serving GIMS-TPU matcher on http://127.0.0.1:{port}")
    http.server.HTTPServer(("127.0.0.1", port), Handler).serve_forever()


def main(argv=None):
    from gims_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--fused", action="store_true",
                        help="serve the fused single-program pipeline "
                             "(device detection + dense_gray descriptors)")
    parser.add_argument("--total_keypoints", type=int, default=12288,
                        help="--fused keypoint budget")
    args = parser.parse_args(argv)
    serve(args.port, args.weights_path, fused=args.fused,
          total_keypoints=args.total_keypoints)


if __name__ == "__main__":
    main()
