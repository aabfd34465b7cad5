"""Pair-generation CLI (reference generate_pairs.py): sample images, apply
random perspective homographies, write 'name h00..h22' lines plus
side-by-side visualizations."""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

from gims_tpu.train.data import get_perspective_mat


def process(image_dir, txt_path, image_save_path, rng=None):
    rng = rng or np.random.RandomState(3)
    os.makedirs(image_save_path, exist_ok=True)
    lines = []
    content = sorted(os.listdir(image_dir))
    for kk, name in enumerate(content):
        if os.path.splitext(name)[-1] not in (".jpg", ".png", ".jpeg"):
            continue
        image = cv2.imread(os.path.join(image_dir, name))
        height, width = image.shape[:2]
        H = get_perspective_mat(
            0.85, center_x=width // 2, center_y=height // 2,
            pers_x=0.0008, pers_y=0.0008, shear_ratio=0.04, shear_angle=10,
            rotation_angle=25, scale=0.6, trans=0.6, rng=rng,
        )
        warped = cv2.warpPerspective(image.copy(), H, (width, height))
        lines.append(name + " " + " ".join(str(float(v))
                                           for v in H.reshape(-1)))
        cv2.imwrite(os.path.join(image_save_path, f"{kk + 1}.png"),
                    np.concatenate([image, warped], axis=1))
    with open(txt_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--txt_path", type=str, required=True)
    parser.add_argument("--image_save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=3)
    args = parser.parse_args(argv)
    process(args.image_dir, args.txt_path, args.image_save_path,
            np.random.RandomState(args.seed))


if __name__ == "__main__":
    main()
