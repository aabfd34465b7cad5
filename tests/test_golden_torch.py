"""Golden end-to-end parity: full-model forward agreement vs in-test torch
oracles built with the reference's module layout and math.

VERDICT.md round-1 item 9: primitives and converter tree-shape were tested,
but not whole-model forwards. Here we construct torch modules whose state
dicts use the reference checkpoint key layout (reference:
models/gmatcher.py:165-307 and carhynet/models.py:311-399), randomize every
parameter and running statistic, convert through the real checkpoint
converters, and assert end-to-end forward agreement.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tnn = torch.nn


# ---------------------------------------------------------------------------
# GMatcher torch oracle (reference models/gmatcher.py semantics)
# ---------------------------------------------------------------------------


def t_mlp(channels):
    """[Conv1d -> BN -> ReLU]*(n-1) -> Conv1d, reference MLP() layout."""
    layers = []
    for i in range(1, len(channels)):
        layers.append(tnn.Conv1d(channels[i - 1], channels[i], 1, bias=True))
        if i < len(channels) - 1:
            layers.append(tnn.BatchNorm1d(channels[i]))
            layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TKenc(tnn.Module):
    def __init__(self, layers=(32, 64, 128, 256), feature_dim=256):
        super().__init__()
        self.encoder = t_mlp([2] + list(layers) + [feature_dim])

    def forward(self, kpts):  # (B, N, 2)
        return self.encoder(kpts.transpose(1, 2))  # (B, C, N)


class TAttn(tnn.Module):
    def __init__(self, num_heads, d_model):
        super().__init__()
        self.dim = d_model // num_heads
        self.h = num_heads
        self.proj = tnn.ModuleList(
            [tnn.Conv1d(d_model, d_model, 1) for _ in range(3)]
        )
        self.merge = tnn.Conv1d(d_model, d_model, 1)

    def forward(self, query, key, value):  # (B, D, N)
        b = query.size(0)
        q, k, v = [
            layer(x).view(b, self.dim, self.h, -1)
            for layer, x in zip(self.proj, (query, key, value))
        ]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / self.dim**0.5
        prob = torch.nn.functional.softmax(scores, dim=-1)
        x = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        return self.merge(x.contiguous().view(b, self.dim * self.h, -1))


class TProp(tnn.Module):
    def __init__(self, feature_dim, num_heads):
        super().__init__()
        self.attn = TAttn(num_heads, feature_dim)
        self.mlp = t_mlp([feature_dim * 2, feature_dim * 2, feature_dim])

    def forward(self, x, source):
        message = self.attn(x, source, source)
        return self.mlp(torch.cat([x, message], dim=1))


class TGNN(tnn.Module):
    def __init__(self, feature_dim, layer_names, num_heads):
        super().__init__()
        self.names = layer_names
        self.layers = tnn.ModuleList(
            [TProp(feature_dim, num_heads) for _ in layer_names]
        )

    def forward(self, desc0, desc1):
        for layer, name in zip(self.layers, self.names):
            if name == "cross":
                src0, src1 = desc1, desc0
            else:
                src0, src1 = desc0, desc1
            desc0 = desc0 + layer(desc0, src0)
            desc1 = desc1 + layer(desc1, src1)
        return desc0, desc1


class TSAGELayer(tnn.Module):
    """DGL SAGEConv('mean') equivalent: fc_self(h) + fc_neigh(mean) + bias,
    zero-degree nodes aggregate zeros."""

    def __init__(self, in_feats, out_feats):
        super().__init__()
        self.fc_self = tnn.Linear(in_feats, out_feats, bias=False)
        self.fc_neigh = tnn.Linear(in_feats, out_feats, bias=False)
        self.bias = tnn.Parameter(torch.zeros(out_feats))

    def forward(self, h, adj):  # h (N, C), adj (N, N) float
        deg = adj.sum(dim=1, keepdim=True)
        neigh = (adj @ h) / deg.clamp(min=1.0)
        return self.fc_self(h) + self.fc_neigh(neigh) + self.bias


class TSAGE(tnn.Module):
    def __init__(self, in_feats, hidden, out_feats):
        super().__init__()
        self.layers = tnn.ModuleList([
            TSAGELayer(in_feats, hidden),
            TSAGELayer(hidden, hidden),
            TSAGELayer(hidden, out_feats),
        ])

    def forward(self, h, adj):
        for i, layer in enumerate(self.layers):
            h = layer(h, adj)
            if i != len(self.layers) - 1:
                h = torch.relu(h)
        return h


def t_log_optimal_transport(scores, alpha, iters):
    """Reference models/gmatcher.py:41-69 math."""
    b, m, n = scores.shape
    one = scores.new_tensor(1.0)
    ms, ns = (m * one), (n * one)
    bins0 = alpha.expand(b, m, 1)
    bins1 = alpha.expand(b, 1, n)
    a = alpha.expand(b, 1, 1)
    couplings = torch.cat(
        [torch.cat([scores, bins0], -1), torch.cat([bins1, a], -1)], 1
    )
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])
    log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])
    log_mu = log_mu[None].expand(b, -1)
    log_nu = log_nu[None].expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(couplings + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(couplings + u.unsqueeze(2), dim=1)
    Z = couplings + u.unsqueeze(2) + v.unsqueeze(1)
    return Z - norm


class TGMatcher(tnn.Module):
    def __init__(self, d=256, num_layers=18, heads=4):
        super().__init__()
        self.kenc = TKenc(feature_dim=d)
        self.gnn = TGNN(d, ["self", "cross"] * (num_layers // 2), heads)
        self.gnn_encoder = TSAGE(d, d // 2, d)
        self.final_proj = tnn.Conv1d(d, d, 1, bias=True)
        self.bin_score = tnn.Parameter(torch.tensor(1.0))

    def forward(self, kpts0n, desc0, adj0, kpts1n, desc1, adj1, iters):
        # desc: (B, N, C); adj: (B, N, N)
        h0 = torch.stack(
            [self.gnn_encoder(desc0[i], adj0[i]) for i in range(desc0.size(0))]
        ).transpose(1, 2)  # (B, C, N)
        h1 = torch.stack(
            [self.gnn_encoder(desc1[i], adj1[i]) for i in range(desc1.size(0))]
        ).transpose(1, 2)
        d0 = h0 + self.kenc(kpts0n)
        d1 = h1 + self.kenc(kpts1n)
        d0, d1 = self.gnn(d0, d1)
        mdesc0, mdesc1 = self.final_proj(d0), self.final_proj(d1)
        scores = torch.einsum("bdn,bdm->bnm", mdesc0, mdesc1) / 256**0.5
        Z = t_log_optimal_transport(scores, self.bin_score, iters)
        return Z, mdesc0, mdesc1


def _randomize_state_dict(module, rng):
    sd = module.state_dict()
    new = {}
    for k, v in sd.items():
        if k.endswith(".eps"):
            new[k] = v  # fixed constant; the converter ignores it
        elif k.endswith("running_var"):
            new[k] = torch.from_numpy(
                (np.abs(rng.randn(*v.shape)) * 0.5 + 0.5).astype(np.float32)
            )
        elif k.endswith("num_batches_tracked"):
            new[k] = v
        else:
            arr = rng.randn(*v.shape) * 0.2 if v.ndim else rng.randn() * 0.2
            new[k] = torch.from_numpy(np.asarray(arr, np.float32).reshape(v.shape))
    module.load_state_dict(new)
    return module


def test_gmatcher_e2e_vs_torch_oracle(rng):
    from gims_tpu.config import MatcherConfig
    from gims_tpu.matcher.convert import convert_gmatcher_torch
    from gims_tpu.matcher.gmatcher import GMatcher

    n0, n1, d = 40, 33, 256
    num_layers, iters = 18, 20

    tm = TGMatcher(d, num_layers).eval()
    _randomize_state_dict(tm, rng)

    variables = convert_gmatcher_torch(tm.state_dict(),
                                       num_gnn_layers=num_layers)

    kp0 = rng.randn(1, n0, 2).astype(np.float32) * 0.5
    kp1 = rng.randn(1, n1, 2).astype(np.float32) * 0.5
    de0 = rng.randn(1, n0, d).astype(np.float32)
    de1 = rng.randn(1, n1, d).astype(np.float32)
    a0 = rng.rand(n0, n0) < 0.1
    a1 = rng.rand(n1, n1) < 0.1
    a0 = np.triu(a0, 1)
    a0 = (a0 | a0.T)[None]
    a1 = np.triu(a1, 1)
    a1 = (a1 | a1.T)[None]

    with torch.no_grad():
        Zt, md0t, md1t = tm(
            torch.from_numpy(kp0), torch.from_numpy(de0),
            torch.from_numpy(a0.astype(np.float32)),
            torch.from_numpy(kp1), torch.from_numpy(de1),
            torch.from_numpy(a1.astype(np.float32)), iters,
        )

    mcfg = MatcherConfig(sinkhorn_iterations=iters, num_gnn_layers=num_layers,
                         attention_impl="direct")
    out = GMatcher(mcfg).apply(
        variables,
        jnp.asarray(kp0), jnp.asarray(de0), jnp.asarray(a0),
        jnp.ones((1, n0), bool),
        jnp.asarray(kp1), jnp.asarray(de1), jnp.asarray(a1),
        jnp.ones((1, n1), bool),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(out["mdesc0"]), md0t.numpy().transpose(0, 2, 1),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["Z"]), Zt.numpy(), rtol=1e-3, atol=5e-4,
    )


# ---------------------------------------------------------------------------
# CAR-HyNet torch oracle (reference carhynet/models.py:311-399 semantics)
# ---------------------------------------------------------------------------


class TFRN(tnn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(1, c, 1, 1))
        self.bias = tnn.Parameter(torch.zeros(1, c, 1, 1))
        self.register_buffer("eps", torch.tensor(eps))

    def forward(self, x):
        nu2 = x.pow(2).mean(dim=[2, 3], keepdim=True)
        x = x * torch.rsqrt(nu2 + self.eps.abs())
        return self.weight * x + self.bias


class TTLU(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.tau = tnn.Parameter(-torch.ones(1, c, 1, 1))

    def forward(self, x):
        return torch.max(x, self.tau)


def t_hswish(x):
    return x * torch.nn.functional.relu6(x + 3.0) / 6.0


class TCoordAtt(tnn.Module):
    def __init__(self, inp, oup, reduction=32):
        super().__init__()
        mip = max(8, inp // reduction)
        self.conv1 = tnn.Conv2d(inp, mip, 1)
        self.bn1 = tnn.BatchNorm2d(mip)
        self.conv_h = tnn.Conv2d(mip, oup, 1)
        self.conv_w = tnn.Conv2d(mip, oup, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        x_h = x.mean(dim=3, keepdim=True)  # (B, C, H, 1)
        x_w = x.mean(dim=2, keepdim=True).permute(0, 1, 3, 2)  # (B, C, W, 1)
        y = torch.cat([x_h, x_w], dim=2)
        y = t_hswish(self.bn1(self.conv1(y)))
        y_h, y_w = torch.split(y, [h, w], dim=2)
        y_w = y_w.permute(0, 1, 3, 2)
        a_h = self.conv_h(y_h).sigmoid()
        a_w = self.conv_w(y_w).sigmoid()
        return x * a_w * a_h


def t_conv_bn_relu6(inp, oup, k, stride=1, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                   bias=False),
        tnn.BatchNorm2d(oup),
        tnn.ReLU6(),
    )


class TSandGlass(tnn.Module):
    """inp == oup, stride 1, expand 6 configuration (the one CAR-HyNet
    uses); hidden dim via the make_divisible rule."""

    def __init__(self, inp, oup):
        super().__init__()
        import math

        hidden = inp // 6
        if hidden < oup / 6.0:
            v = math.ceil(oup / 6.0)
            hidden = max(16, int(v + 8) // 16 * 16)
        self.conv = tnn.Sequential(
            t_conv_bn_relu6(inp, inp, 3, 1, groups=inp),       # 0
            TCoordAtt(inp, inp),                               # 1
            tnn.Conv2d(inp, hidden, 1, bias=False),            # 2
            tnn.BatchNorm2d(hidden),                           # 3
            t_conv_bn_relu6(hidden, oup, 1),                   # 4
            tnn.Conv2d(oup, oup, 3, 1, 1, groups=oup, bias=False),  # 5
            tnn.BatchNorm2d(oup),                              # 6
        )

    def forward(self, x):
        return x + self.conv(x)


class TCARHyNet(tnn.Module):
    def __init__(self, dim_desc=128):
        super().__init__()
        self.layer1 = tnn.Sequential(
            TFRN(3), TTLU(3), tnn.Conv2d(3, 32, 3, 1, 1, bias=True),
            TFRN(32), TCoordAtt(32, 32), TTLU(32),
        )
        self.layer2 = tnn.Sequential(
            tnn.Conv2d(32, 32, 3, 1, 1, bias=True), TFRN(32),
            TCoordAtt(32, 32), TTLU(32),
        )
        self.layer2_5 = TSandGlass(32, 32)
        self.layer3 = tnn.Sequential(
            tnn.Conv2d(32, 64, 3, 2, 1, bias=True), TFRN(64), TTLU(64),
        )
        self.layer4 = tnn.Sequential(
            tnn.Conv2d(64, 64, 3, 1, 1, bias=True), TFRN(64), TTLU(64),
        )
        self.layer4_5 = TSandGlass(64, 64)
        self.layer5 = tnn.Sequential(
            tnn.Conv2d(64, 128, 3, 2, 1, bias=True), TFRN(128), TTLU(128),
        )
        self.layer6 = tnn.Sequential(
            tnn.Conv2d(128, 128, 3, 1, 1, bias=True), TFRN(128), TTLU(128),
        )
        self.layer7 = tnn.Sequential(
            tnn.Dropout(0.2),
            tnn.Conv2d(128, dim_desc, 8, bias=False),
            tnn.BatchNorm2d(dim_desc, affine=False),
        )
        self.dim_desc = dim_desc

    def forward(self, x):  # (B, 3, 32, 32)
        x = self.layer1(x)
        x1 = self.layer2(x)
        x = x1 + self.layer2_5(x1)
        x = self.layer3(x)
        x1 = self.layer4(x)
        x = x1 + self.layer4_5(x1)
        x = self.layer5(x)
        x = self.layer6(x)
        x = self.layer7(x)
        raw = x.view(x.size(0), self.dim_desc)
        return raw / torch.sqrt((raw * raw).sum(1, keepdim=True) + 1e-10)


def test_carhynet_e2e_vs_torch_oracle(rng):
    from gims_tpu.carhynet.convert import convert_carhynet_torch
    from gims_tpu.carhynet.model import CARHyNet

    tm = TCARHyNet().eval()
    _randomize_state_dict(tm, rng)
    variables = convert_carhynet_torch(tm.state_dict())

    patches = rng.rand(8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(patches.transpose(0, 3, 1, 2))).numpy()

    got = CARHyNet().apply(variables, jnp.asarray(patches), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
