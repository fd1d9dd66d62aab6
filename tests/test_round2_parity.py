"""Round-2 parity additions: middle-variant family, legacy LR schedules,
bootstrapped sigmoid loss, device soft-NMS, and the all-reference-configs
build guarantee."""

import glob

import numpy as np
import pytest

REFERENCE_CONFIG_GLOB = "/root/reference/second/configs/**/*.config"


class TestMiddleVariants:
    """Every reference middle class (`second/pytorch/models/middle.py:16-963`)
    builds and forward-passes with the expected dense BEV shape."""

    # name → (depth D of the zyx grid, expected BEV stride, expected C*D)
    CASES = {
        "SpMiddleD4HD": (21, 4, 128),
        "SpResNetD4HD": (21, 4, 128),
        "SpMiddleD4HDLite": (21, 4, 128),
        "SpMiddleD8HD": (41, 8, 128),
        "SpMiddleFHDV2": (41, 8, 64),
        "SpMiddle2K": (81, 16, 128),
        "SpMiddleFHDLarge": (41, 8, 256),
    }

    @pytest.mark.slow       # compile-heavy: ~25-130s/variant on one CPU core
    @pytest.mark.parametrize("name", sorted(CASES))
    def test_forward_shape(self, name):
        import jax
        import jax.numpy as jnp
        import second_tpu.models.sparse_middle  # noqa: F401  (registers)
        from second_tpu.models.middle import MIDDLE_REGISTRY

        D, stride, cd = self.CASES[name]
        grid = (D, 16, 16)
        rng = np.random.default_rng(0)
        B, N = 1, 32
        coords = np.stack(
            [rng.integers(0, g, (B, N)) for g in grid], -1).astype(np.int32)
        feats = rng.normal(size=(B, N, 4)).astype(np.float32)
        valid = np.ones((B, N), bool)
        m = MIDDLE_REGISTRY[name](output_shape=grid, num_input_features=4,
                                  name="middle")
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(coords), jnp.asarray(valid))
        out = m.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid))
        assert out.shape == (B, 16 // stride, 16 // stride, cd)
        assert np.isfinite(np.asarray(out)).all()

    def test_sparse_middle_extractor(self):
        import jax
        import jax.numpy as jnp
        import second_tpu.models.sparse_middle  # noqa: F401
        from second_tpu.models.middle import MIDDLE_REGISTRY

        grid = (21, 16, 16)
        rng = np.random.default_rng(1)
        coords = np.stack(
            [rng.integers(0, g, (1, 32)) for g in grid], -1).astype(np.int32)
        feats = rng.normal(size=(1, 32, 4)).astype(np.float32)
        valid = np.ones((1, 32), bool)
        m = MIDDLE_REGISTRY["SparseMiddleExtractor"](
            output_shape=grid, num_input_features=4,
            num_filters_down1=(16,), num_filters_down2=(16, 16),
            name="middle")
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(coords), jnp.asarray(valid))
        out = m.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid))
        # two z-only (3,1,1)/(2,1,1) downsamples: 21 → 10 → 4; BEV unchanged
        assert out.shape == (1, 16, 16, 4 * 16)

    def test_sparse_bottleneck(self):
        import jax
        import jax.numpy as jnp
        from second_tpu.models.sparse_middle import SparseBottleneck
        from second_tpu.ops import sparse_conv as sp

        grid = (8, 8, 8)
        rng = np.random.default_rng(2)
        coords = np.stack(
            [rng.integers(0, g, (1, 16)) for g in grid], -1).astype(np.int32)
        feats = rng.normal(size=(1, 16, 8)).astype(np.float32)
        valid = np.ones((1, 16), bool)
        sc, sf, sv, sk = jax.vmap(
            lambda c, f, v: sp.sort_active(c, f, v, grid))(
                jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid))
        block = SparseBottleneck(features=8, grid_dhw=grid)
        variables = block.init(jax.random.PRNGKey(0), sf, sc, sk, sv)
        out = block.apply(variables, sf, sc, sk, sv)
        assert out.shape == (1, 16, 32)   # expansion 4
        assert np.isfinite(np.asarray(out)).all()


class TestLegacySchedules:
    def test_multi_phase(self):
        from second_tpu.config.schema import LearningRateConfig
        from second_tpu.train.optimizer import build_lr_schedules

        cfg = LearningRateConfig(kind="multi_phase", phases=[
            {"start": 0.0,
             "lambda_func": "lambda p: annealing_cos(1e-3, 1e-4, p)",
             "momentum_lambda_func": "lambda p: annealing_cos(0.95, 0.85, p)"},
            {"start": 0.5,
             "lambda_func": "lambda p: annealing_cos(1e-4, 1e-6, p)",
             "momentum_lambda_func": "lambda p: annealing_cos(0.85, 0.95, p)"},
        ])
        lr, mom = build_lr_schedules(cfg, 1000)
        assert np.isclose(float(lr(0)), 1e-3, rtol=1e-4)
        # phase 1 end → 1e-4; phase 2 takes over at step 500
        assert np.isclose(float(lr(500)), 1e-4, rtol=1e-3)
        assert np.isclose(float(lr(1000)), 1e-6, rtol=1e-3)
        assert np.isclose(float(mom(0)), 0.95, rtol=1e-4)
        assert np.isclose(float(mom(1000)), 0.95, rtol=1e-4)

    def test_exponential_decay(self):
        from second_tpu.train.optimizer import exponential_decay_schedule

        s = exponential_decay_schedule(1e-2, decay_steps=100,
                                       decay_factor=0.5)
        assert np.isclose(float(s(0)), 1e-2)
        assert np.isclose(float(s(99)), 1e-2)        # staircase
        assert np.isclose(float(s(100)), 5e-3)
        assert np.isclose(float(s(250)), 2.5e-3)
        burn = exponential_decay_schedule(1e-2, 100, 0.5,
                                          burnin_learning_rate=1e-4,
                                          burnin_steps=50)
        assert np.isclose(float(burn(10)), 1e-4)
        assert np.isclose(float(burn(150)), 5e-3)

    def test_cosine_decay_with_warmup(self):
        from second_tpu.train.optimizer import \
            cosine_decay_with_warmup_schedule

        s = cosine_decay_with_warmup_schedule(1e-2, 1000,
                                              warmup_learning_rate=1e-4,
                                              warmup_steps=100)
        assert np.isclose(float(s(0)), 1e-4)
        assert float(s(50)) < 1e-2
        assert np.isclose(float(s(100)), 1e-2, rtol=1e-2)
        assert float(s(1000)) < 1e-4


class TestBootstrappedSigmoid:
    def test_alpha_one_matches_plain_ce(self):
        import jax
        from second_tpu.models.losses import (
            bootstrapped_sigmoid_loss, sigmoid_cross_entropy_with_logits)

        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 8, 3)).astype(np.float32)
        targets = (rng.random((2, 8, 3)) > 0.5).astype(np.float32)
        w = np.ones((2, 8), np.float32)
        boot = bootstrapped_sigmoid_loss(logits, targets, w, alpha=1.0)
        plain = sigmoid_cross_entropy_with_logits(logits, targets)
        np.testing.assert_allclose(np.asarray(boot), np.asarray(plain),
                                   rtol=1e-5)

    def test_soft_bootstrap_reduces_loss_on_confident_wrong_labels(self):
        from second_tpu.models.losses import bootstrapped_sigmoid_loss

        # model confidently predicts 1, label says 0 → bootstrapping trusts
        # the model and shrinks the loss
        logits = np.full((1, 4, 1), 6.0, np.float32)
        targets = np.zeros((1, 4, 1), np.float32)
        w = np.ones((1, 4), np.float32)
        hard_label = bootstrapped_sigmoid_loss(logits, targets, w, alpha=1.0)
        soft = bootstrapped_sigmoid_loss(logits, targets, w, alpha=0.5)
        assert float(np.sum(np.asarray(soft))) < \
            float(np.sum(np.asarray(hard_label)))


class TestDeviceSoftNMS:
    def _oracle(self, boxes_xyxy, scores, **kw):
        from second_tpu.core.nms_np import soft_nms as soft_nms_np
        return soft_nms_np(boxes_xyxy, scores, **kw)

    def test_matches_host_oracle_gaussian(self):
        import jax.numpy as jnp
        from second_tpu.ops.nms import soft_nms

        rng = np.random.default_rng(0)
        n = 32
        centers = rng.uniform(0, 20, (n, 2))
        sizes = rng.uniform(2, 5, (n, 2))
        xyxy = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                              1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        keep_np, scores_np = self._oracle(xyxy, scores, sigma=0.5,
                                          score_threshold=0.05,
                                          method="gaussian")
        idx, rescored, keep = soft_nms(
            jnp.asarray(xyxy), jnp.asarray(scores), jnp.ones((n,), bool),
            pre_max_size=n, post_max_size=n, sigma=0.5,
            score_threshold=0.05, method="gaussian", rotated=False)
        idx, rescored, keep = (np.asarray(idx), np.asarray(rescored),
                               np.asarray(keep))
        got = idx[keep]
        np.testing.assert_array_equal(got, keep_np)
        np.testing.assert_allclose(rescored[keep], scores_np, rtol=1e-4)

    def test_rotated_sparse_matches_dense_matrix(self):
        """The standup-bounded sparse IoU matrix behind rotated soft-NMS
        equals the dense rotated_iou_matrix on every valid pair."""
        import jax.numpy as jnp
        from second_tpu.ops.nms import _sparse_rotated_iou_matrix
        from second_tpu.ops.rotated_iou import rotated_iou_matrix

        rng = np.random.default_rng(3)
        n = 48
        boxes = np.concatenate(
            [rng.uniform(0, 15, (n, 2)), rng.uniform(2, 6, (n, 2)),
             rng.uniform(-np.pi, np.pi, (n, 1))], 1).astype(np.float32)
        valid = np.arange(n) < 40
        cand = jnp.asarray(boxes)
        dense = np.asarray(rotated_iou_matrix(cand, cand))
        sparse = np.asarray(_sparse_rotated_iou_matrix(
            cand, jnp.asarray(valid), max_pairs=n * n))
        vm = valid[:, None] & valid[None, :]
        off_diag = ~np.eye(n, dtype=bool)
        np.testing.assert_allclose(sparse[vm & off_diag],
                                   dense[vm & off_diag],
                                   rtol=1e-5, atol=1e-6)
        assert (sparse[~vm] == 0).all()

    def test_rotated_path_runs(self):
        import jax.numpy as jnp
        from second_tpu.ops.nms import soft_nms

        rng = np.random.default_rng(1)
        n = 16
        boxes = np.concatenate(
            [rng.uniform(0, 20, (n, 2)), rng.uniform(2, 5, (n, 2)),
             rng.uniform(-np.pi, np.pi, (n, 1))], 1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        idx, rescored, keep = soft_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((n,), bool),
            pre_max_size=n, post_max_size=8, rotated=True)
        assert idx.shape == (8,)
        assert np.asarray(keep).any()


@pytest.mark.parametrize(
    "path", sorted(glob.glob(REFERENCE_CONFIG_GLOB, recursive=True)))
def test_every_reference_config_builds(path):
    """Every shipped reference pipeline config parses AND builds a model
    (module + spec + assigner + coder) — VERDICT round-1 item 7."""
    from second_tpu.config import load_pipeline_config
    from second_tpu.models import build_voxelnet

    cfg = load_pipeline_config(path)
    module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    assert module is not None
    assert info.num_anchors > 0
