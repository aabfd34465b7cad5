"""Training stack tests: GT matcher parity vs a numpy oracle, LR schedule
parity, homography synthesis sanity, single-device train step, and the
8-device DP mesh step (CPU simulation of the ICI all-reduce)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gims_tpu.config import GIMSConfig, AGCConfig, MatcherConfig, OptimizerConfig
from gims_tpu.train import gt as gt_mod
from gims_tpu.train import step as step_mod
from gims_tpu.train import data as data_mod
from gims_tpu.api import init_gmatcher_variables


def oracle_find_matches(kpts0, kpts1, H, dist_thresh=3.0, n_iters=1):
    """Numpy oracle of the reference algorithm (iterative mutual-argmin
    with removal, preprocess_utils.py:98-132)."""
    def warp(k):
        src = np.concatenate([k, np.ones((len(k), 1))], 1)
        dst = src @ H.T
        return dst[:, :2] / dst[:, 2:3]

    proj = warp(kpts0)
    miss0 = list(range(len(kpts0)))
    miss1 = list(range(len(kpts1)))
    ma0, ma1 = [], []
    for _ in range(n_iters):
        if not miss0 or not miss1:
            break
        d = np.linalg.norm(
            proj[miss0][:, None, :] - kpts1[miss1][None, :, :], axis=-1
        )
        m1 = d.argmin(1)
        m0 = d.argmin(0)
        inter2 = np.where(m1[m0] == np.arange(len(m0)))[0]
        inter1 = m0[inter2]
        okd = d[inter1, inter2] < dist_thresh
        inter1, inter2 = inter1[okd], inter2[okd]
        new0 = [miss0[i] for i in inter1]
        new1 = [miss1[j] for j in inter2]
        ma0 += new0
        ma1 += new1
        miss0 = [i for i in miss0 if i not in set(new0)]
        miss1 = [j for j in miss1 if j not in set(new1)]
    return dict(zip(ma0, ma1)), set(miss0), set(miss1)


@pytest.mark.parametrize("n_iters", [1, 3])
def test_find_matches_vs_oracle(rng, n_iters):
    n0, n1 = 60, 70
    kpts0 = rng.rand(n0, 2).astype(np.float32) * 200
    H = np.array([[1.0, 0.03, 5.0], [-0.02, 0.98, -4.0], [1e-5, 0, 1.0]],
                 np.float32)
    # half of side1 = warped side0 points (+noise), half random
    src = np.concatenate([kpts0, np.ones((n0, 1), np.float32)], 1) @ H.T
    warped = src[:, :2] / src[:, 2:3]
    kpts1 = np.concatenate([
        warped[: n1 // 2] + rng.randn(n1 // 2, 2).astype(np.float32) * 0.5,
        rng.rand(n1 - n1 // 2, 2).astype(np.float32) * 200,
    ])
    want_map, want_miss0, want_miss1 = oracle_find_matches(
        kpts0, kpts1, H, 3.0, n_iters
    )
    m0, m1 = gt_mod.find_matches(
        jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(H),
        jnp.ones(n0, bool), jnp.ones(n1, bool), 3.0, n_iters,
    )
    m0 = np.asarray(m0)
    got_map = {i: int(m0[i]) for i in range(n0) if m0[i] >= 0}
    assert got_map == want_map
    assert set(np.nonzero(m0 < 0)[0]) == want_miss0
    m1 = np.asarray(m1)
    assert set(np.nonzero(m1 < 0)[0]) == want_miss1
    # consistency of the two directions
    for i, j in got_map.items():
        assert m1[j] == i


def test_gt_rows_layout(rng):
    m0 = jnp.asarray([2, -1, 0], jnp.int32)
    m1 = jnp.asarray([2, -1, 0, -1], jnp.int32)
    rows, valid = gt_mod.build_gt_rows(
        m0, m1, jnp.ones(3, bool), jnp.asarray([True, True, True, False]),
        batch_index=5,
    )
    rows = np.asarray(rows)
    valid = np.asarray(valid)
    np.testing.assert_array_equal(rows[:3], [[5, 0, 2], [5, 1, -1], [5, 2, 0]])
    np.testing.assert_array_equal(rows[3:], [[5, -1, 0], [5, -1, 1],
                                             [5, -1, 2], [5, -1, 3]])
    # side-1 rows valid only when unmatched and real
    np.testing.assert_array_equal(valid[3:], [False, True, False, False])


def test_lr_schedule_parity():
    cfg = GIMSConfig(optimizer=OptimizerConfig(
        lr=1e-3, warmup_epochs=1, step_epoch=2, step_value=0.5,
    ))
    sched = step_mod.lr_schedule(cfg, num_batches=10)
    # warmup: np.interp(ni, [0, 10], [0, lr])
    np.testing.assert_allclose(float(sched(0)), 0.0)
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-6)
    # after warmup, before step_epoch
    np.testing.assert_allclose(float(sched(15)), 1e-3, rtol=1e-6)
    # epoch 3 => decay 0.5^(3-2)
    np.testing.assert_allclose(float(sched(35)), 5e-4, rtol=1e-6)


def test_weight_decay_mask():
    variables = init_gmatcher_variables(MatcherConfig(
        descriptor_dim=64, keypoint_encoder=(32,), num_gnn_layers=2,
        input_dim=64, sinkhorn_iterations=2,
    ))
    mask = step_mod.weight_decay_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, val in flat:
        name = path[-1].key
        if name == "kernel":
            assert val
        else:
            assert not val, name


def test_remap_gt_neg_cells_modes():
    """corner = reference parity (all negative rows -> Z[M,N]); dustbin =
    corrected routing to the real dustbin row/column."""
    from gims_tpu.matcher.pipeline import remap_gt_to_dustbin

    nb0 = nb1 = 4
    kept0 = jnp.asarray([[True, True, False, True]])
    kept1 = jnp.asarray([[True, True, True, False]])
    rows = jnp.asarray([
        [0, 0, 1],    # positive, both kept
        [0, 1, -1],   # side-0 unmatched
        [0, -1, 2],   # side-1 unmatched
        [0, 2, 0],    # side-0 endpoint pruned by AGC
        [0, 0, 3],    # side-1 endpoint pruned by AGC
    ], jnp.int32)
    valid = jnp.ones(5, bool)

    _, i0c, i1c, negc, _ = remap_gt_to_dustbin(
        rows, valid, kept0, kept1, nb0, nb1, "corner")
    np.testing.assert_array_equal(np.asarray(i0c), [0, 4, 4, 4, 4])
    np.testing.assert_array_equal(np.asarray(i1c), [1, 4, 4, 4, 4])
    np.testing.assert_array_equal(np.asarray(negc),
                                  [False, True, True, True, True])

    _, i0d, i1d, negd, _ = remap_gt_to_dustbin(
        rows, valid, kept0, kept1, nb0, nb1, "dustbin")
    np.testing.assert_array_equal(np.asarray(i0d), [0, 1, 4, 4, 0])
    np.testing.assert_array_equal(np.asarray(i1d), [1, 4, 2, 0, 4])
    np.testing.assert_array_equal(np.asarray(negd), np.asarray(negc))


def test_homography_synthesis_shapes():
    cfg = GIMSConfig().dataset
    ds = data_mod.SyntheticPairDataset(cfg, length=3, seed=0)
    img, warped, H = ds[0]
    assert img.shape == (480, 640, 3)
    assert warped.shape == (480, 640, 3)
    assert H.shape == (3, 3)
    assert H.dtype == np.float32
    # warp consistency: corners of warped content come from img via H
    assert np.abs(H[2, 2] - 1.0) < 1e-6


def _tiny_cfg():
    return GIMSConfig(
        matcher=MatcherConfig(
            descriptor_dim=64, keypoint_encoder=(32, 64), num_gnn_layers=4,
            sinkhorn_iterations=5, input_dim=64,
        ),
        agc=AGCConfig(radius=60.0, percentile=10.0, min_size=2),
    )


def _tiny_batch(rng, b, nb=40, d=64):
    r = 2 * nb
    return {
        "kpts0": jnp.asarray(rng.rand(b, nb, 2).astype(np.float32) * 300),
        "desc0": jnp.asarray(rng.randn(b, nb, d).astype(np.float32)),
        "valid0": jnp.ones((b, nb), bool),
        "kpts1": jnp.asarray(rng.rand(b, nb, 2).astype(np.float32) * 300),
        "desc1": jnp.asarray(rng.randn(b, nb, d).astype(np.float32)),
        "valid1": jnp.ones((b, nb), bool),
        "gt_rows": jnp.asarray(rng.randint(-1, nb, (b, r, 3)).astype(np.int32)),
        "gt_valid": jnp.ones((b, r), bool),
    }


def test_single_device_train_step(rng):
    cfg = _tiny_cfg()
    variables = init_gmatcher_variables(cfg.matcher)
    state, tx = step_mod.create_train_state(cfg, variables, num_batches=100)
    step = jax.jit(step_mod.make_train_step(cfg, tx, (480, 640)))
    batch = _tiny_batch(rng, b=2)
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state1.step) == 1
    # step 0 has lr=0 (warmup); params must move on step 1
    state2, _ = step(state1, batch)
    moved = [
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(
            jax.tree_util.tree_leaves(state1.params),
            jax.tree_util.tree_leaves(state2.params),
        )
    ]
    assert max(moved) > 0


def test_fused_raw_step_matches_classic():
    """The fused SIFT train step (uint8 descs + homography in, GT computed
    in-graph) must produce the same losses/params as the classic path."""
    import dataclasses

    from gims_tpu.config import FrontendConfig, DatasetConfig
    from gims_tpu.frontend.feature import FeatureFrontend
    from gims_tpu.train.loop import build_batch, build_batch_raw
    from gims_tpu.train.data import SyntheticPairDataset

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        matcher=dataclasses.replace(cfg.matcher, descriptor_dim=256,
                                    input_dim=256),
        frontend=FrontendConfig(descriptor_source="sift"),
    )
    ds = SyntheticPairDataset(
        DatasetConfig(image_height=120, image_width=160,
                      apply_color_aug=False), length=1, seed=0)
    pairs = [ds[0]]
    nb = 256

    fe = FeatureFrontend(cfg.frontend)
    batch_a = build_batch(fe, pairs, nb, np.random.RandomState(5))
    batch_b = build_batch_raw(cfg.frontend, pairs, nb,
                              np.random.RandomState(5))
    # classic batches now carry bf16 128-d halves (loop.build_batch)
    np.testing.assert_allclose(
        np.asarray(batch_a["desc0_h"].astype(jnp.float32)),
        np.asarray(batch_b["desc0_u8"] /
                   jnp.maximum(jnp.linalg.norm(
                       batch_b["desc0_u8"].astype(jnp.float32),
                       axis=-1, keepdims=True), 1e-12)),
        atol=4e-3)

    variables = init_gmatcher_variables(cfg.matcher)
    state_a, tx_a = step_mod.create_train_state(cfg, variables, 10)
    step = jax.jit(step_mod.make_train_step(cfg, tx_a, (120, 160)))
    sa, ma = step(state_a, batch_a)
    state_b, _ = step_mod.create_train_state(cfg, variables, 10)
    sb, mb = step(state_b, batch_b)
    # tolerance: classic-path descriptors round through bf16 halves
    np.testing.assert_allclose(float(ma["total_loss"]),
                               float(mb["total_loss"]), rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-4)


def test_multichip_dp_step_matches_single(rng):
    """8-device DP step == single-device step on the same global batch.

    Uses LayerNorm instead of BatchNorm: with unsynced BN (the reference's
    default, sync_bn=false) per-device batch statistics legitimately differ
    from global-batch statistics, so only the norm-free-of-batch-coupling
    model admits an exact equivalence check of the DP wiring."""
    from jax.sharding import Mesh
    import dataclasses

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, matcher=dataclasses.replace(cfg.matcher, use_layernorm=True)
    )
    variables = init_gmatcher_variables(cfg.matcher)
    batch = _tiny_batch(rng, b=8)

    state_a, tx_a = step_mod.create_train_state(cfg, variables, 100)
    single = jax.jit(step_mod.make_train_step(cfg, tx_a, (480, 640)))
    sa, ma = single(state_a, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    state_b, tx_b = step_mod.create_train_state(cfg, variables, 100)
    dist = step_mod.make_distributed_train_step(cfg, tx_b, (480, 640), mesh)
    sb, mb = dist(state_b, batch)

    # batch-mean losses of the single step == pmean of per-device losses
    np.testing.assert_allclose(
        float(ma["total_loss"]), float(mb["total_loss"]), rtol=2e-4
    )
    pa = jax.tree_util.tree_leaves(sa.params)
    pb = jax.tree_util.tree_leaves(sb.params)
    for a, b_ in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-5
        )


def test_graft_entry():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


def test_remat_step_matches_plain(rng):
    """remat=True must be numerically equivalent (it only changes what the
    backward pass stores, not the math)."""
    import dataclasses

    cfg = _tiny_cfg()
    batch = _tiny_batch(rng, 1)
    variables = init_gmatcher_variables(cfg.matcher)
    state_a, tx = step_mod.create_train_state(cfg, variables, 10)
    step_a = jax.jit(step_mod.make_train_step(cfg, tx, (480, 640)))
    sa, ma = step_a(state_a, batch)

    cfg_r = dataclasses.replace(
        cfg, matcher=dataclasses.replace(cfg.matcher, remat=True))
    state_b, tx_b = step_mod.create_train_state(cfg_r, variables, 10)
    step_b = jax.jit(step_mod.make_train_step(cfg_r, tx_b, (480, 640)))
    sb, mb = step_b(state_b, batch)

    np.testing.assert_allclose(float(ma["total_loss"]),
                               float(mb["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params),
                    jax.tree_util.tree_leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_load_config_train_and_frontend_params(tmp_path):
    from gims_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(
        "train_params:\n"
        "  max_keypoints: 6144\n"
        "  remat: true\n"
        "  lastiter_every: 500\n"
        "  minloss_every: 100\n"
        "frontend_params:\n"
        "  descriptor_source: dense_gray\n"
        "  detector: device\n"
        "agc:\n"
        "  radius: 15\n"
    )
    cfg = load_config(str(p))
    assert cfg.train.max_keypoints == 6144
    assert cfg.matcher.remat is True
    assert cfg.train.lastiter_every == 500
    assert cfg.train.minloss_every == 100
    assert cfg.frontend.descriptor_source == "dense_gray"
    assert cfg.frontend.detector == "device"
    assert cfg.agc.radius == 15


def test_fused_e2e_train_step(rng):
    """Joint descriptor-CNN + matcher step: loss finite, BOTH subtree
    params move (gradients flow through the dense descriptor samples)."""
    import dataclasses
    import cv2

    from gims_tpu.carhynet.model import CARHyNet
    from gims_tpu.config import FrontendConfig
    from gims_tpu.frontend.detect_device import build_gray_blur
    from gims_tpu.fused import octave_budgets
    from gims_tpu.train import fused_step as fstep_mod
    from gims_tpu.train.data import SyntheticPairDataset
    from gims_tpu.config import DatasetConfig
    from gims_tpu.train.loop import build_batch_e2e

    h, w = 120, 160
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        matcher=dataclasses.replace(cfg.matcher, descriptor_dim=256,
                                    input_dim=256, remat=True),
        frontend=FrontendConfig(descriptor_source="dense_gray"),
        agc=AGCConfig(radius=40.0, percentile=5.0, min_size=2),
    )
    ds = SyntheticPairDataset(
        DatasetConfig(image_height=h, image_width=w,
                      apply_color_aug=False), length=1, seed=0)
    batch = build_batch_e2e([ds[0]])

    car_model = CARHyNet(in_channels=1)
    car_vars = car_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 1), jnp.float32))
    matcher_vars = init_gmatcher_variables(cfg.matcher)
    variables = fstep_mod.joint_variables(cfg, matcher_vars, car_vars)
    state, tx = step_mod.create_train_state(cfg, variables, 10)

    budgets = octave_budgets(h, w, 512)
    dense_model = CARHyNet(dense=True, in_channels=1)
    step = jax.jit(fstep_mod.make_fused_e2e_train_step(
        cfg, tx, (h, w), budgets, build_gray_blur(h, w), None, dense_model))
    state1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    state2, _ = step(state1, batch)

    def moved(a_params, b_params, sub):
        return max(
            np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(
                jax.tree_util.tree_leaves(a_params[sub]),
                jax.tree_util.tree_leaves(b_params[sub]),
            ))

    assert moved(state1.params, state2.params, "gmatcher") > 0
    assert moved(state1.params, state2.params, "carhynet") > 0

    # staged recipe: freeze_steps holds the matcher fixed (grads AND
    # weight-decay updates zeroed) while the CNN learns, then releases it
    # (start from state1: step 0 has LR=0 from the linear warmup)
    fstep = jax.jit(fstep_mod.make_fused_e2e_train_step(
        cfg, tx, (h, w), budgets, build_gray_blur(h, w), None, dense_model,
        freeze_steps=2))
    fs1, _ = fstep(state1, batch)
    assert moved(state1.params, fs1.params, "gmatcher") == 0
    assert moved(state1.params, fs1.params, "carhynet") > 0
    fs2, _ = fstep(fs1, batch)
    assert moved(fs1.params, fs2.params, "gmatcher") > 0


def test_fused_e2e_multidevice_step(rng):
    """8-device fused-e2e DP step (one pair per device): pmean loss ==
    mean of the per-pair single-device losses, both param subtrees move
    (VERDICT round-2 item 5: the one training mode that couldn't scale)."""
    import dataclasses
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as Pspec

    from gims_tpu.carhynet.model import CARHyNet
    from gims_tpu.config import DatasetConfig, FrontendConfig
    from gims_tpu.frontend.detect_device import build_gray_blur
    from gims_tpu.fused import octave_budgets
    from gims_tpu.train import fused_step as fstep_mod
    from gims_tpu.train.data import SyntheticPairDataset
    from gims_tpu.train.loop import build_batch_e2e

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    n_dev = 4  # 4-way mesh keeps the CPU-sim compile budget sane
    h, w = 96, 128
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        matcher=dataclasses.replace(
            cfg.matcher, descriptor_dim=256, input_dim=256, remat=True,
            use_layernorm=True,  # BN batch stats are per-device by design
        ),
        frontend=FrontendConfig(descriptor_source="dense_gray"),
        agc=AGCConfig(radius=40.0, percentile=5.0, min_size=2),
    )
    ds = SyntheticPairDataset(
        DatasetConfig(image_height=h, image_width=w,
                      apply_color_aug=False), length=n_dev, seed=0)
    batch8 = build_batch_e2e([ds[i] for i in range(n_dev)])

    car_model = CARHyNet(in_channels=1)
    car_vars = car_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 32, 32, 1), jnp.float32))
    variables = fstep_mod.joint_variables(
        cfg, init_gmatcher_variables(cfg.matcher), car_vars)
    budgets = octave_budgets(h, w, 384)
    blur = build_gray_blur(h, w)
    dense_model = CARHyNet(dense=True, in_channels=1)

    # single-device per-pair losses
    state_a, tx_a = step_mod.create_train_state(cfg, variables, 10)
    single = jax.jit(fstep_mod.make_fused_e2e_train_step(
        cfg, tx_a, (h, w), budgets, blur, None, dense_model))
    losses = []
    for i in range(n_dev):
        one = {k: v[i:i + 1] for k, v in batch8.items()}
        _, m = single(state_a, one)
        losses.append(float(m["total_loss"]))

    # n_dev-device shard_map step on the same pairs
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    state_b, tx_b = step_mod.create_train_state(cfg, variables, 10)
    inner = fstep_mod.make_fused_e2e_train_step(
        cfg, tx_b, (h, w), budgets, blur, None, dense_model,
        axis_name="data")
    import functools
    dist = jax.jit(functools.partial(
        shard_map, mesh=mesh,
        in_specs=(Pspec(), Pspec("data")),
        out_specs=(Pspec(), Pspec()),
        check_vma=False,
    )(inner))
    sb, mb = dist(state_b, batch8)

    np.testing.assert_allclose(
        float(mb["total_loss"]), np.mean(losses), rtol=5e-4)
    # params must move in BOTH subtrees after a post-warmup step
    sb2, _ = dist(sb, batch8)
    for sub in ("gmatcher", "carhynet"):
        delta = max(
            np.abs(np.asarray(a) - np.asarray(b)).max()
            for a, b in zip(jax.tree_util.tree_leaves(sb.params[sub]),
                            jax.tree_util.tree_leaves(sb2.params[sub])))
        assert delta > 0, sub


def test_resolve_save_dir_resume_in_place(tmp_path):
    """--restore_path inside the run dir resumes IN PLACE; anything else
    versions the dir (reference yolo-style increment, utils/common.py:76-86).
    Regression: a crash-resume used to fork `<name>2` and every later
    checkpoint landed away from where export/promote tooling looks."""
    from gims_tpu.cli.train_cli import resolve_save_dir

    run = tmp_path / "e2e_band"
    (run / "weights" / "last").mkdir(parents=True)

    # fresh name, no restore: used as-is
    assert resolve_save_dir(tmp_path / "new_run", None) == str(
        tmp_path / "new_run")
    # existing dir, no restore: versioned
    assert resolve_save_dir(run, None) == str(tmp_path / "e2e_band2")
    # restore from inside the dir: reuse it
    assert resolve_save_dir(run, str(run / "weights" / "last")) == str(run)
    # restore from a DIFFERENT run's checkpoint: still versioned
    other = tmp_path / "other" / "weights" / "last"
    other.mkdir(parents=True)
    assert resolve_save_dir(run, str(other)) == str(tmp_path / "e2e_band2")
