"""Tests for the text-proto config parser + typed schema."""

import glob

import pytest

from second_tpu.config import (load_pipeline_config, loads_pipeline_config,
                               parse_text)

REFERENCE_CONFIGS = sorted(
    glob.glob("/root/reference/second/configs/**/*.config", recursive=True))

CANONICAL = ("/root/reference/second/configs/twostage_iou/"
             "server_2st_fusion_test.fhd.onestage.config")


def test_parse_scalars_and_lists():
    node = parse_text("""
        a: 1
        b: 2.5
        c: "hello"
        d: true
        e: [1, 2, 3]
        f: BareEnum
        # comment
        msg { x: 1 }
        msg2: { y: -1e-4 }
    """)
    assert node.get("a") == 1
    assert node.get("b") == 2.5
    assert node.get("c") == "hello"
    assert node.get("d") is True
    assert node.get("e") == [1, 2, 3]
    assert node.get("f") == "BareEnum"
    assert node.child("msg").get("x") == 1
    assert node.child("msg2").get("y") == -1e-4


def test_last_scalar_wins():
    node = parse_text("steps: 100\nsteps: 200\n")
    assert node.get("steps") == 200
    assert node.get_all("steps") == [100, 200]


def test_repeated_messages():
    node = parse_text("item { v: 1 }\nitem { v: 2 }\n")
    assert [m.get("v") for m in node.get_all("item")] == [1, 2]


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference not mounted")
def test_all_reference_configs_parse():
    for path in REFERENCE_CONFIGS:
        cfg = load_pipeline_config(path)
        assert cfg.model.voxel_generator.voxel_size
        assert cfg.train_config.steps > 0


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference not mounted")
def test_canonical_config_fields():
    cfg = load_pipeline_config(CANONICAL)
    m = cfg.model
    assert m.voxel_generator.point_cloud_range == [0, -40, -3, 70.4, 40, 1]
    assert m.voxel_generator.voxel_size == [0.05, 0.05, 0.1]
    assert m.voxel_generator.max_number_of_points_per_voxel == 5
    assert m.voxel_generator.grid_size == (1408, 1600, 40)
    assert m.voxel_feature_extractor.module_class_name == "VoxelFeatureExtractorV3"
    assert m.middle_feature_extractor.module_class_name == "SpMiddleFHD"
    assert m.middle_feature_extractor.downsample_factor == 8
    assert m.rpn.module_class_name == "RPN_FUSION"
    assert m.rpn.layer_nums == [5]
    assert m.loss.classification_loss.kind == "weighted_sigmoid_focal"
    assert m.loss.classification_loss.alpha == 0.25
    assert m.loss.localization_loss.sigma == 3.0
    assert m.loss.localization_weight == 2.0
    assert m.loss_norm_type == "NormByNumPositives"
    assert m.use_rotate_nms is True
    assert m.nms_pre_max_size == 1000
    assert m.nms_post_max_size == 100
    ag = m.target_assigner.anchor_generators
    assert len(ag) == 1 and ag[0].class_name == "Car"
    assert ag[0].sizes == [1.6, 3.9, 1.56]
    assert ag[0].matched_threshold == 0.6
    sim = m.target_assigner.region_similarity_calculator
    assert sim.kind == "nearest_iou_similarity"
    opt = cfg.train_config.optimizer
    assert opt.kind == "adam_optimizer"
    assert opt.fixed_weight_decay is True
    assert opt.learning_rate.kind == "manual_stepping"
    assert opt.learning_rate.rates == [1e-4, 1e-5, 1e-6]
    assert cfg.train_config.steps == 30950  # last occurrence wins
    assert cfg.train_input_reader.batch_size == 4
    assert cfg.train_input_reader.max_number_of_voxels == 16000
    assert cfg.eval_input_reader.max_number_of_voxels == 40000
    db = cfg.train_input_reader.database_sampler
    assert db.sample_groups[0].name_to_max_num == {"Car": 15}
    kinds = [s.kind for s in db.database_prep_steps]
    assert "filter_by_difficulty" in kinds
    assert "filter_by_min_num_points" in kinds


def test_default_config_roundtrip():
    cfg = loads_pipeline_config("model { second { } }")
    assert cfg.model.nms_pre_max_size == 1000


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference not mounted")
@pytest.mark.slow
def test_reference_config_builds_model():
    """A verbatim reference pipeline config constructs a working model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from second_tpu.models import build_voxelnet
    cfg = load_pipeline_config(
        "/root/reference/second/configs/onestage/"
        "server_lidaronly.fhd.onestage.config")
    module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    assert info.feature_map_size == (1, 200, 176)
    assert info.num_anchors == 70400
    assert assigner.classes == ["Car"]
    assert spec.nms_pre_max_size == cfg.model.nms_pre_max_size
    # tiny forward through the built module (fhd sparse middle)
    rng = np.random.default_rng(0)
    B, V = 1, 256
    coords = np.stack([rng.integers(0, g, (B, V)) for g in (41, 1600, 1408)],
                      -1).astype(np.int32)
    voxels = rng.normal(0, 1, (B, V, 5, 4)).astype(np.float32)
    num_points = np.full((B, V), 3, np.int32)
    valid = np.ones((B, V), bool)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(voxels),
                            jnp.asarray(num_points), jnp.asarray(coords),
                            jnp.asarray(valid), train=False)
    preds = module.apply(variables, jnp.asarray(voxels),
                         jnp.asarray(num_points), jnp.asarray(coords),
                         jnp.asarray(valid), train=False)
    assert preds["box_preds"].shape == (1, 200, 176, 14)


class TestConfigPatches:
    def test_apply_config_patches(self):
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.train.run import apply_config_patches
        cfg = tiny_pipeline_config()
        apply_config_patches(cfg, [
            "train_config.steps=123",
            "train_input_reader.batch_size=4",
            "model.target_assigner.anchor_generators[0].sizes=[1., 2., 3.]",
            "model.voxel_generator.point_cloud_range[0]=-1.5",
        ])
        assert cfg.train_config.steps == 123
        assert cfg.train_input_reader.batch_size == 4
        assert cfg.model.target_assigner.anchor_generators[0].sizes == \
            [1.0, 2.0, 3.0]
        assert cfg.model.voxel_generator.point_cloud_range[0] == -1.5

    def test_bad_patch_raises(self):
        from second_tpu.testing import tiny_pipeline_config
        from second_tpu.train.run import apply_config_patches
        import pytest as _pytest
        with _pytest.raises(ValueError):
            apply_config_patches(tiny_pipeline_config(), ["no_equals_sign"])


REF = "/root/reference/second/configs"
# one representative per reference config family (VERDICT r4 item 6):
# every (family, middle, rpn, head) combination used by the 41 configs.
FAMILY_CONFIGS = [
    # onestage fusion: RPN_FUSION + SpMiddleFHD
    ("onestage-fusion", f"{REF}/onestage/server_fusion.fhd.onestage.config",
     "fusion"),
    # onestage conv: SpMiddleResNetFHD middle under RPN_FUSION
    ("onestage-resnet",
     f"{REF}/onestage/conv_server_fusion_50e.fhd.onestage.config", "fusion"),
    # onestage_iou: lidar-only with the IoU rectification head
    ("onestage_iou",
     f"{REF}/onestage_iou/server_lidaronly.fhd.onestage.config", "one_stage"),
    # twostage lidar-only: SECOND_RPNV2 second stage
    ("twostage", f"{REF}/twostage/jhyoo_lidaronly.fhd.onestage.config",
     "two_stage"),
    # twostage fusion: RPN_SECOND_FUSION + second stage
    ("twostage-fusion",
     f"{REF}/twostage/server_2st_fusion.fhd.onestage.config",
     "fusion_two_stage"),
    # twostage_iou: the canonical config
    ("twostage_iou",
     f"{REF}/twostage_iou/server_2st_fusion_test.fhd.onestage.config",
     "fusion_two_stage"),
    # multiclass (the reference's people/multiclass recipe shape)
    ("multiclass", "second_tpu/configs/second_multiclass.config",
     "one_stage"),
]


@pytest.mark.skipif(not REFERENCE_CONFIGS, reason="reference not mounted")
@pytest.mark.slow
@pytest.mark.parametrize("name,path,model_type",
                         FAMILY_CONFIGS, ids=[f[0] for f in FAMILY_CONFIGS])
def test_config_family_builds_and_forwards(name, path, model_type):
    """Every reference config family constructs its model and runs a tiny
    forward (parse != build: registry typos or kwarg mismatches only show
    up here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = load_pipeline_config(path)
    if model_type == "one_stage":
        from second_tpu.models import build_voxelnet
        module, spec, info, assigner, coder = build_voxelnet(cfg.model)
    elif model_type == "fusion":
        from second_tpu.models.fusion import build_fusion_voxelnet
        module, spec, info, assigner, coder = build_fusion_voxelnet(cfg.model)
    elif model_type == "two_stage":
        from second_tpu.models.detector_two_stage import \
            build_two_stage_voxelnet
        module, spec, info, assigner, coder = build_two_stage_voxelnet(
            cfg.model, num_proposals=16)
    else:
        from second_tpu.models.detector_fusion_two_stage import \
            build_fusion_two_stage_voxelnet
        module, spec, info, assigner, coder = build_fusion_two_stage_voxelnet(
            cfg.model, num_proposals=16)

    rng = np.random.default_rng(0)
    B, V = 1, 128
    gz, gy, gx = (cfg.model.voxel_generator.grid_size[2],
                  cfg.model.voxel_generator.grid_size[1],
                  cfg.model.voxel_generator.grid_size[0])
    coords = np.stack([rng.integers(0, g, (B, V)) for g in (gz, gy, gx)],
                      -1).astype(np.int32)
    npts = cfg.model.voxel_generator.max_number_of_points_per_voxel
    voxels = rng.normal(0, 1, (B, V, npts, 4)).astype(np.float32)
    num_points = np.full((B, V), min(3, npts), np.int32)
    valid = np.ones((B, V), bool)
    args = [jnp.asarray(voxels), jnp.asarray(num_points), jnp.asarray(coords),
            jnp.asarray(valid)]
    if model_type in ("fusion", "fusion_two_stage"):
        P = 64
        args += [jnp.zeros((B, 64, 96, 3)), jnp.zeros((B, P, 2), jnp.int32),
                 jnp.zeros((B, P, 2), jnp.int32), jnp.zeros((B, P), bool)]
    if model_type in ("two_stage", "fusion_two_stage"):
        anchors = np.concatenate(
            [v["anchors"].reshape(-1, 7) for v in
             assigner.generate_anchors_dict(list(info.feature_map_size))
             .values()], 0)
        args += [jnp.asarray(np.broadcast_to(anchors, (B,) + anchors.shape))]
    variables = module.init(jax.random.PRNGKey(0), *args, train=False)
    preds = module.apply(variables, *args, train=False)
    H, W = info.feature_map_size[1], info.feature_map_size[2]
    num_cls = max(1, len(assigner.classes))
    if model_type in ("two_stage", "fusion_two_stage"):
        assert preds["second_box_preds"].shape == (B, 16, 7)
    else:
        assert preds["box_preds"].shape[0] == B
        assert preds["box_preds"].shape[1:3] == (H, W)
    for v in jax.tree_util.tree_leaves(preds):
        assert np.isfinite(np.asarray(v)).all()
