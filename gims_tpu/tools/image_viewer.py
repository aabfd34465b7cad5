"""2x2 image-folder comparator.

Reference: tools/image_viewer.py — a tkinter GUI that shows the same-named
image from up to four result folders side by side for visual comparison.
This build keeps the tkinter app (when a display is available) and adds a
headless mode that writes 2x2 composite images instead.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import cv2
import numpy as np


def list_common_images(folders):
    sets = []
    for folder in folders:
        names = {
            p.name for p in Path(folder).iterdir()
            if p.suffix.lower() in (".jpg", ".png", ".jpeg")
        }
        sets.append(names)
    common = set.intersection(*sets) if sets else set()
    return sorted(common)


def compose_grid(folders, name, cell=(480, 360)):
    tiles = []
    for folder in folders[:4]:
        img = cv2.imread(str(Path(folder) / name))
        if img is None:
            img = np.zeros((cell[1], cell[0], 3), np.uint8)
        img = cv2.resize(img, cell)
        cv2.putText(img, Path(folder).name, (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
        tiles.append(img)
    while len(tiles) < 4:
        tiles.append(np.zeros((cell[1], cell[0], 3), np.uint8))
    top = np.concatenate(tiles[:2], axis=1)
    bottom = np.concatenate(tiles[2:4], axis=1)
    return np.concatenate([top, bottom], axis=0)


def run_headless(folders, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    names = list_common_images(folders)
    for name in names:
        grid = compose_grid(folders, name)
        cv2.imwrite(str(Path(out_dir) / name), grid)
    print(f"wrote {len(names)} composites to {out_dir}")


def run_gui(folders):
    import tkinter as tk
    from PIL import Image, ImageTk  # pillow ships with matplotlib deps

    names = list_common_images(folders)
    if not names:
        print("no common images")
        return
    root = tk.Tk()
    root.title("GIMS-TPU image viewer")
    label = tk.Label(root)
    label.pack()
    title = tk.StringVar(value=names[0])
    tk.Label(root, textvariable=title).pack()
    state = {"i": 0}

    def show():
        grid = compose_grid(folders, names[state["i"]])
        rgb = cv2.cvtColor(grid, cv2.COLOR_BGR2RGB)
        photo = ImageTk.PhotoImage(Image.fromarray(rgb))
        label.configure(image=photo)
        label.image = photo
        title.set(f"[{state['i'] + 1}/{len(names)}] {names[state['i']]}")

    def step(d):
        state["i"] = (state["i"] + d) % len(names)
        show()

    root.bind("<Right>", lambda e: step(1))
    root.bind("<Left>", lambda e: step(-1))
    show()
    root.mainloop()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("folders", nargs="+")
    parser.add_argument("--headless", type=str, default=None,
                        help="write 2x2 composites to this directory")
    args = parser.parse_args(argv)
    if args.headless:
        run_headless(args.folders, args.headless)
    else:
        try:
            run_gui(args.folders)
        except Exception as e:  # noqa: BLE001
            print(f"GUI unavailable ({e}); use --headless OUT_DIR")


if __name__ == "__main__":
    main()
