"""Video-SR training orchestration (training/video_sr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unitex_tpu.training import video_sr as vt

rng = np.random.default_rng(3)


def rand(*shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)


def make_g():
    # toy "recurrent" net with a flow submodule: flow conv warps nothing
    # but participates in the graph so its grads are nonzero
    params = {"spynet": {"w": rand(3, 3)}, "trunk": {"w": rand(3, 3)}}

    def g_forward(p, lq):
        return lq @ p["trunk"]["w"] + 0.1 * (lq @ p["spynet"]["w"])

    return params, g_forward


class TestFlowFreezing:
    def test_labels(self):
        params, _ = make_g()
        labels = vt.flow_param_labels(params)
        assert labels["spynet"]["w"] == "flow"
        assert labels["trunk"]["w"] == "normal"

    def test_fix_flow_window(self):
        params, g_forward = make_g()
        opt = optax.adam(1e-2)
        step = vt.make_video_recurrent_train_step(
            g_forward, opt, vt.VideoRecurrentConfig(fix_flow_iter=2,
                                                    pixel_loss="l1"))
        state = vt.VideoTrainState(params, opt.init(params), jnp.int32(0))
        lq = rand(2, 4, 8, 8, 3)
        gt = rand(2, 4, 8, 8, 3)
        s0 = np.asarray(params["spynet"]["w"])
        for i in range(2):
            state, m = step(state, lq, gt)
            np.testing.assert_array_equal(
                np.asarray(state.params["spynet"]["w"]), s0)
            assert not np.allclose(np.asarray(state.params["trunk"]["w"]),
                                   np.asarray(params["trunk"]["w"]))
        state, m = step(state, lq, gt)  # step index 2 -> flow live
        assert not np.allclose(np.asarray(state.params["spynet"]["w"]), s0)
        assert np.isfinite(float(m["l_pix"]))

    def test_charbonnier_default(self):
        pred = jnp.ones((2, 2)) * 2.0
        gt = jnp.ones((2, 2))
        l = vt._pixel_loss("charbonnier", 1e-12, pred, gt)
        np.testing.assert_allclose(float(l), 1.0, atol=1e-5)


class TestFlowLrMul:
    def test_multi_transform_scales_flow_updates(self):
        params, g_forward = make_g()
        opt = vt.make_video_optimizer(1e-2, 0.5, params)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        r = (np.abs(np.asarray(updates["spynet"]["w"])).mean()
             / np.abs(np.asarray(updates["trunk"]["w"])).mean())
        np.testing.assert_allclose(r, 0.5, rtol=1e-4)

    def test_mul_one_is_plain_adam(self):
        params, _ = make_g()
        opt = vt.make_video_optimizer(1e-2, 1.0, params)
        assert opt.init(params) is not None


class TestVideoGAN:
    def _setup(self, cfg):
        g_params, g_forward = make_g()
        d_params = {"w": rand(3, 1)}

        def d_forward(p, x):
            return jnp.mean(x @ p["w"], axis=(1, 2, 3))

        g_opt = optax.adam(1e-3)
        d_opt = optax.adam(1e-3)
        step = vt.make_video_gan_train_step(
            g_forward, d_forward, g_opt, d_opt, cfg)
        state = vt.VideoGANState(
            g_params, d_params,
            jax.tree_util.tree_map(jnp.copy, g_params),
            g_opt.init(g_params), d_opt.init(d_params), jnp.int32(0))
        return step, state, g_params, d_params

    def test_net_d_init_iters_gates_g(self):
        cfg = vt.VideoGANConfig(net_d_init_iters=1, fix_flow_iter=0,
                                percep_weight=0.0, ema_decay=0.999)
        step, state, g0, d0 = self._setup(cfg)
        lq = rand(1, 3, 8, 8, 3)
        gt = rand(1, 3, 8, 8, 3)
        state, m = step(state, lq, gt)  # iter 1: 1 > 1 false -> G frozen
        assert float(m["g_updated"]) == 0.0
        np.testing.assert_array_equal(
            np.asarray(state.g_params["trunk"]["w"]),
            np.asarray(g0["trunk"]["w"]))
        assert not np.allclose(np.asarray(state.d_params["w"]),
                               np.asarray(d0["w"]))
        state, m = step(state, lq, gt)  # iter 2: G live
        assert float(m["g_updated"]) == 1.0
        assert not np.allclose(np.asarray(state.g_params["trunk"]["w"]),
                               np.asarray(g0["trunk"]["w"]))
        for k in ("l_g_pix", "l_g_gan", "l_d_real", "l_d_fake",
                  "out_d_real", "out_d_fake"):
            assert np.isfinite(float(m[k])), k

    def test_ema_tracks(self):
        cfg = vt.VideoGANConfig(fix_flow_iter=0, percep_weight=0.0,
                                ema_decay=0.5)
        step, state, g0, _ = self._setup(cfg)
        state, _ = step(state, rand(1, 2, 8, 8, 3), rand(1, 2, 8, 8, 3))
        e = np.asarray(state.g_ema["trunk"]["w"])
        expect = 0.5 * np.asarray(g0["trunk"]["w"]) \
            + 0.5 * np.asarray(state.g_params["trunk"]["w"])
        np.testing.assert_allclose(e, expect, atol=1e-6)


class TestVideoTest:
    def test_flip_seq_averages_directions(self):
        # direction-sensitive model: adds the frame index
        def g(lq):
            n = lq.shape[1]
            idx = jnp.arange(n, dtype=jnp.float32)[None, :, None, None, None]
            return lq + idx

        lq = rand(1, 4, 4, 4, 3)
        out = vt.video_test(g, lq, flip_seq=True)
        # forward pass adds i; flipped pass adds (on reversed seq) i then
        # re-flips -> frame i gets (i + (2n-1-i))/2 = (2n-1)/2 everywhere
        expect = np.asarray(lq) + (2 * 4 - 1) / 2.0
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_center_frame_only(self):
        out = vt.video_test(lambda x: x, rand(2, 5, 4, 4, 3),
                            center_frame_only=True)
        assert out.shape == (2, 4, 4, 3)

    def test_evaluate_folders(self):
        from unitex_tpu.utils.metrics import psnr
        gt = rand(1, 3, 8, 8, 3)
        folders = {"clip_a": (gt, gt)}
        res = vt.evaluate_video_folders(
            lambda x: x, folders, {"psnr": lambda a, b: psnr(a, b)})
        assert len(res["clip_a"]["psnr"]) == 3
        assert res["clip_a"]["psnr"][0] > 60.0


class TestEDVRTraining:
    def _setup(self, tsa_iter):
        params = {
            "pcd": {"dcn_l1": {"w": rand(3, 3)}, "offset_conv": {"w": rand(3, 3)}},
            "tsa": {"w": rand(3, 3)},
            "trunk": {"w": rand(3, 3)},
        }

        def g_forward(p, lq):
            h = lq @ p["trunk"]["w"] + lq @ p["tsa"]["w"]
            return h + 0.1 * (lq @ p["pcd"]["dcn_l1"]["w"]) \
                + 0.1 * (lq @ p["pcd"]["offset_conv"]["w"])

        opt = optax.adam(1e-2)
        step = vt.make_edvr_train_step(
            g_forward, opt, vt.EDVRTrainConfig(tsa_iter=tsa_iter))
        state = vt.VideoTrainState(params, opt.init(params), jnp.int32(0))
        return params, step, state

    def test_dcn_labels(self):
        params, _, _ = self._setup(0)
        labels = vt.edvr_param_labels(params)
        assert labels["pcd"]["dcn_l1"]["w"] == "dcn"
        assert labels["pcd"]["offset_conv"]["w"] == "normal"
        assert labels["tsa"]["w"] == "normal"

    def test_tsa_warmup_freezes_non_fusion(self):
        params, step, state = self._setup(tsa_iter=2)
        lq, gt = rand(4, 3), rand(4, 3)
        s1, m = step(state, lq, gt)
        assert np.isfinite(float(m["l_pix"]))
        # steps 0,1: only tsa moves
        for k in ("pcd", "trunk"):
            np.testing.assert_array_equal(
                np.asarray(s1.params[k]["w"] if k == "trunk"
                           else s1.params[k]["dcn_l1"]["w"]),
                np.asarray(params[k]["w"] if k == "trunk"
                           else params[k]["dcn_l1"]["w"]))
        assert not np.allclose(np.asarray(s1.params["tsa"]["w"]),
                               np.asarray(params["tsa"]["w"]))
        s2, _ = step(s1, lq, gt)
        np.testing.assert_array_equal(np.asarray(s2.params["trunk"]["w"]),
                                      np.asarray(params["trunk"]["w"]))
        # step 2 (>= tsa_iter): everything trains
        s3, _ = step(s2, lq, gt)
        assert not np.allclose(np.asarray(s3.params["trunk"]["w"]),
                               np.asarray(s2.params["trunk"]["w"]))
        assert not np.allclose(np.asarray(s3.params["pcd"]["dcn_l1"]["w"]),
                               np.asarray(s2.params["pcd"]["dcn_l1"]["w"]))

    def test_dcn_lr_mul_scales_updates(self):
        params, _, _ = self._setup(0)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        opt_full = vt.make_edvr_optimizer(1e-2, 1.0, params)
        opt_quarter = vt.make_edvr_optimizer(1e-2, 0.25, params)
        u_full, _ = opt_full.update(grads, opt_full.init(params), params)
        u_q, _ = opt_quarter.update(grads, opt_quarter.init(params), params)
        np.testing.assert_allclose(
            np.asarray(u_q["pcd"]["dcn_l1"]["w"]),
            np.asarray(u_full["pcd"]["dcn_l1"]["w"]) * 0.25, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(u_q["trunk"]["w"]),
                                   np.asarray(u_full["trunk"]["w"]), rtol=1e-6)


class TestVideoGANCenterFrame:
    def test_4d_sr_passes_flat_unchanged(self):
        # EDVR-style center-frame generator under the video GAN step
        g_params = {"w": rand(3, 3)}
        d_params = {"w": rand(3, 1)}

        def g_forward(p, lq):          # [B,T,H,W,3] -> [B,H,W,3]
            return jnp.tanh(lq.mean(axis=1) @ p["w"])

        def d_forward(p, x):           # [B,H,W,3] -> logits
            return x @ p["w"]

        opt_g, opt_d = optax.adam(1e-3), optax.adam(1e-3)
        step = vt.make_video_gan_train_step(
            g_forward, d_forward, opt_g, opt_d,
            vt.VideoGANConfig(fix_flow_iter=0, percep_weight=0.0))
        state = vt.VideoGANState(g_params, d_params, g_params,
                                 opt_g.init(g_params), opt_d.init(d_params),
                                 jnp.int32(0))
        lq = rand(2, 3, 4, 4, 3)
        gt = rand(2, 4, 4, 3)          # center-frame GT, 4D
        s1, m = step(state, lq, gt)
        assert np.isfinite(float(m["l_g_gan"]))
        assert not np.allclose(np.asarray(s1.g_params["w"]),
                               np.asarray(g_params["w"]))
