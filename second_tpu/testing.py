"""Shared test/dry-run helpers: a tiny pipeline config that compiles fast."""

from __future__ import annotations

from .config import loads_pipeline_config

TINY_PIPELINE = """
model: {
  second: {
    voxel_generator {
      point_cloud_range: [0, -8, -3, 16, 8, 1]
      voxel_size: [0.25, 0.25, 4.0]
      max_number_of_points_per_voxel: 8
    }
    voxel_feature_extractor: {
      module_class_name: "PillarFeatureNet"
      num_filters: [16]
      num_input_features: 4
    }
    middle_feature_extractor: {
      module_class_name: "PointPillarsScatter"
      downsample_factor: 1
      num_input_features: 16
    }
    rpn: {
      module_class_name: "RPNV2"
      layer_nums: [1, 1]
      layer_strides: [2, 2]
      num_filters: [16, 32]
      upsample_strides: [1, 2]
      num_upsample_filters: [16, 16]
      num_input_features: 16
    }
    loss: {
      classification_loss: {
        weighted_sigmoid_focal: { alpha: 0.25 gamma: 2.0 anchorwise_output: true }
      }
      localization_loss: {
        weighted_smooth_l1: { sigma: 3.0 }
      }
      classification_weight: 1.0
      localization_weight: 2.0
    }
    use_sigmoid_score: true
    encode_background_as_zeros: true
    encode_rad_error_by_sin: true
    use_direction_classifier: true
    direction_loss_weight: 0.2
    loss_norm_type: NormByNumPositives
    use_rotate_nms: true
    nms_pre_max_size: 64
    nms_post_max_size: 16
    nms_score_threshold: 0.05
    nms_iou_threshold: 0.3
    num_point_features: 4
    box_coder: { ground_box3d_coder: {} }
    target_assigner: {
      anchor_generators: {
        anchor_generator_range: {
          sizes: [1.6, 3.9, 1.56]
          anchor_ranges: [0, -8, -1.78, 16, 8, -1.78]
          rotations: [0, 1.57]
          matched_threshold: 0.5
          unmatched_threshold: 0.35
          class_name: "Car"
        }
      }
      sample_positive_fraction: -1
      sample_size: 512
      region_similarity_calculator: { nearest_iou_similarity: {} }
    }
  }
}
train_input_reader: {
  batch_size: 2
  max_number_of_voxels: 1024
}
train_config: {
  optimizer: {
    adam_optimizer: {
      learning_rate: { one_cycle: { lr_max: 0.003 moms: [0.95, 0.85]
                                    div_factor: 10.0 pct_start: 0.4 } }
      weight_decay: 0.01
    }
    fixed_weight_decay: true
  }
  steps: 100
  steps_per_eval: 50
}
eval_input_reader: {
  batch_size: 2
  max_number_of_voxels: 1024
}
"""


# Sparse-middle variant of the tiny pipeline: the same scene/range, but the
# real fhd component stack (VFE-V3 mean encoder + SpMiddleFHD sparse 3D
# backbone). Exists so the SPARSE training path has its own CPU-sized
# overfit-to-detection test — the dense/sparse training-quality comparison
# the hardware experiments run at full scale.
TINY_SPARSE_PIPELINE = TINY_PIPELINE.replace(
    """      voxel_size: [0.25, 0.25, 4.0]
      max_number_of_points_per_voxel: 8
    }
    voxel_feature_extractor: {
      module_class_name: "PillarFeatureNet"
      num_filters: [16]
      num_input_features: 4
    }
    middle_feature_extractor: {
      module_class_name: "PointPillarsScatter"
      downsample_factor: 1
      num_input_features: 16
    }
    rpn: {
      module_class_name: "RPNV2"
      layer_nums: [1, 1]
      layer_strides: [2, 2]
      num_filters: [16, 32]
      upsample_strides: [1, 2]
      num_upsample_filters: [16, 16]
      num_input_features: 16
    }""",
    """      voxel_size: [0.25, 0.25, 0.1]
      max_number_of_points_per_voxel: 5
    }
    voxel_feature_extractor: {
      module_class_name: "VoxelFeatureExtractorV3"
      num_filters: [4]
      num_input_features: 4
    }
    middle_feature_extractor: {
      module_class_name: "SpMiddleFHD"
      downsample_factor: 8
      num_input_features: 4
    }
    rpn: {
      module_class_name: "RPNV2"
      layer_nums: [1, 1]
      layer_strides: [1, 2]
      num_filters: [32, 32]
      upsample_strides: [1, 2]
      num_upsample_filters: [16, 16]
      num_input_features: 128
    }""").replace("max_number_of_voxels: 1024",
                  "max_number_of_voxels: 2048")


# Multi-class variant: Car + Pedestrian anchor generators (the reference's
# people.* / multiclass config shape, reference configs/people.fhd.config).
TINY_MULTICLASS_PIPELINE = TINY_PIPELINE.replace(
    """      anchor_generators: {
        anchor_generator_range: {
          sizes: [1.6, 3.9, 1.56]
          anchor_ranges: [0, -8, -1.78, 16, 8, -1.78]
          rotations: [0, 1.57]
          matched_threshold: 0.5
          unmatched_threshold: 0.35
          class_name: "Car"
        }
      }""",
    """      anchor_generators: {
        anchor_generator_range: {
          sizes: [1.6, 3.9, 1.56]
          anchor_ranges: [0, -8, -1.78, 16, 8, -1.78]
          rotations: [0, 1.57]
          matched_threshold: 0.5
          unmatched_threshold: 0.35
          class_name: "Car"
        }
      }
      anchor_generators: {
        anchor_generator_range: {
          sizes: [0.6, 0.8, 1.73]
          anchor_ranges: [0, -8, -1.465, 16, 8, -1.465]
          rotations: [0, 1.57]
          matched_threshold: 0.35
          unmatched_threshold: 0.2
          class_name: "Pedestrian"
        }
      }""")


def tiny_pipeline_config():
    return loads_pipeline_config(TINY_PIPELINE)


def tiny_multiclass_pipeline_config():
    return loads_pipeline_config(TINY_MULTICLASS_PIPELINE)


def tiny_sparse_pipeline_config():
    return loads_pipeline_config(TINY_SPARSE_PIPELINE)


def tiny_scene_kwargs():
    """sample_scene kwargs matching the tiny range."""
    return dict(pc_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
                num_cars=(2, 5), points_per_car=(40, 120), num_ground=1500)
