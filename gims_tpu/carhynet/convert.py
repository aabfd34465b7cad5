"""Torch -> flax weight conversion for CAR-HyNet.

Maps the reference checkpoint layout (state dict of
carhynet/models.py:311-399, shipped as weights/car_hynet.pth) onto this
framework's flax module tree. Conv kernels transpose OIHW -> HWIO (the
same permutation also maps depthwise (C,1,kh,kw) -> (kh,kw,1,C)); FRN/TLU
per-channel (1,C,1,1) tensors flatten to (C,).
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)  # OIHW -> HWIO (also depthwise)


class _Builder:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params = {}
        self.stats = {}
        self.used = set()

    def get(self, key):
        self.used.add(key)
        return self.sd[key]

    def frn(self, tp, fp):
        self.params[fp] = {
            "weight": _t(self.get(f"{tp}.weight")).reshape(-1),
            "bias": _t(self.get(f"{tp}.bias")).reshape(-1),
        }
        self.used.add(f"{tp}.eps")  # non-learnable buffer, fixed 1e-6

    def tlu(self, tp, fp):
        self.params[fp] = {"tau": _t(self.get(f"{tp}.tau")).reshape(-1)}

    def conv(self, tp, fp, bias=True):
        p = {"kernel": _conv_w(self.get(f"{tp}.weight"))}
        if bias:
            p["bias"] = _t(self.get(f"{tp}.bias"))
        self.params[fp] = p

    def bn(self, tp, fp, affine=True):
        if affine:
            self.params[fp] = {
                "scale": _t(self.get(f"{tp}.weight")),
                "bias": _t(self.get(f"{tp}.bias")),
            }
        self.stats[fp] = {
            "mean": _t(self.get(f"{tp}.running_mean")),
            "var": _t(self.get(f"{tp}.running_var")),
        }
        self.used.add(f"{tp}.num_batches_tracked")

    def coord(self, tp, fp):
        self.conv(f"{tp}.conv1", f"{fp}/conv1")
        self.bn(f"{tp}.bn1", f"{fp}/bn1")
        self.conv(f"{tp}.conv_h", f"{fp}/conv_h")
        self.conv(f"{tp}.conv_w", f"{fp}/conv_w")

    def sandglass(self, tp, fp):
        # Sequential indices (reference carhynet/models.py:201-222 for
        # inp==oup, stride=1, expand=6):
        # 0: ConvBNReLU dw3x3, 1: CoordAtt, 2: conv1x1 reduce, 3: BN,
        # 4: ConvBNReLU 1x1 expand, 5: conv dw3x3, 6: BN
        self.conv(f"{tp}.conv.0.0", f"{fp}/dw1/conv", bias=False)
        self.bn(f"{tp}.conv.0.1", f"{fp}/dw1/bn")
        self.coord(f"{tp}.conv.1", f"{fp}/coord")
        self.conv(f"{tp}.conv.2", f"{fp}/pw_reduce", bias=False)
        self.bn(f"{tp}.conv.3", f"{fp}/pw_reduce_bn")
        self.conv(f"{tp}.conv.4.0", f"{fp}/pw_expand/conv", bias=False)
        self.bn(f"{tp}.conv.4.1", f"{fp}/pw_expand/bn")
        self.conv(f"{tp}.conv.5", f"{fp}/dw2", bias=False)
        self.bn(f"{tp}.conv.6", f"{fp}/dw2_bn")


def convert_carhynet_torch(state_dict):
    """Returns flax variables {'params': ..., 'batch_stats': ...}."""
    b = _Builder(state_dict)
    b.frn("layer1.0", "l1_frn_in")
    b.tlu("layer1.1", "l1_tlu_in")
    b.conv("layer1.2", "l1_conv")
    b.frn("layer1.3", "l1_frn")
    b.coord("layer1.4", "l1_coord")
    b.tlu("layer1.5", "l1_tlu")

    b.conv("layer2.0", "l2_conv")
    b.frn("layer2.1", "l2_frn")
    b.coord("layer2.2", "l2_coord")
    b.tlu("layer2.3", "l2_tlu")
    b.sandglass("layer2_5", "l2_sg")

    b.conv("layer3.0", "l3_conv")
    b.frn("layer3.1", "l3_frn")
    b.tlu("layer3.2", "l3_tlu")

    b.conv("layer4.0", "l4_conv")
    b.frn("layer4.1", "l4_frn")
    b.tlu("layer4.2", "l4_tlu")
    b.sandglass("layer4_5", "l4_sg")

    b.conv("layer5.0", "l5_conv")
    b.frn("layer5.1", "l5_frn")
    b.tlu("layer5.2", "l5_tlu")

    b.conv("layer6.0", "l6_conv")
    b.frn("layer6.1", "l6_frn")
    b.tlu("layer6.2", "l6_tlu")

    b.conv("layer7.1", "l7_conv", bias=False)
    b.bn("layer7.2", "l7_bn", affine=False)

    unused = set(b.sd) - b.used
    if unused:
        raise ValueError(f"unconsumed torch keys: {sorted(unused)[:8]} ...")

    def nest(flat):
        tree = {}
        for path, leaf in flat.items():
            parts = path.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = leaf
        return tree

    return {"params": nest(b.params), "batch_stats": nest(b.stats)}
