"""Tests for the numpy numeric core (box math, geometry, IoU, voxelizer,
target assignment)."""

import numpy as np
import pytest

from second_tpu.core import box_np, geometry_np, target_np
from second_tpu.core.rotated_iou_np import rotated_iou
from second_tpu.core.voxelize_np import points_to_voxel
from second_tpu.core.anchors import GroundBox3dCoder
from second_tpu.core.region_similarity import NearestIouSimilarity


def random_boxes(rng, n, dim7=True):
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-10, 10, n)
    z = rng.uniform(-3, 1, n)
    w = rng.uniform(0.5, 3, n)
    l = rng.uniform(0.5, 6, n)
    h = rng.uniform(0.5, 3, n)
    r = rng.uniform(-np.pi, np.pi, n)
    return np.stack([x, y, z, w, l, h, r], axis=1)


class TestEncodeDecode:
    @pytest.mark.parametrize("vec,smooth", [(False, False), (True, False),
                                            (False, True), (True, True)])
    def test_roundtrip(self, vec, smooth):
        rng = np.random.default_rng(0)
        boxes = random_boxes(rng, 100)
        anchors = random_boxes(rng, 100)
        enc = box_np.second_box_encode(boxes, anchors, vec, smooth)
        dec = box_np.second_box_decode(enc, anchors, vec, smooth)
        if vec:
            # angle recovered modulo 2π
            d = box_np.limit_period(dec[:, 6] - boxes[:, 6], 0.5, 2 * np.pi)
            np.testing.assert_allclose(d, 0, atol=1e-6)
            np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-6)
        else:
            np.testing.assert_allclose(dec, boxes, atol=1e-6)

    def test_zero_offset_is_zero_code(self):
        rng = np.random.default_rng(1)
        anchors = random_boxes(rng, 10)
        enc = box_np.second_box_encode(anchors, anchors)
        np.testing.assert_allclose(enc, 0, atol=1e-7)

    def test_bev_roundtrip(self):
        rng = np.random.default_rng(2)
        boxes = random_boxes(rng, 50)[:, [0, 1, 3, 4, 6]]
        anchors = random_boxes(rng, 50)[:, [0, 1, 3, 4, 6]]
        enc = box_np.bev_box_encode(boxes, anchors)
        dec = box_np.bev_box_decode(enc, anchors)
        np.testing.assert_allclose(dec, boxes, atol=1e-6)


class TestCorners:
    def test_axis_aligned_corners2d(self):
        c = box_np.center_to_corner_box2d(
            np.array([[1.0, 2.0]]), np.array([[2.0, 4.0]]))
        # corners span [0,2]x[0,4]
        assert c.shape == (1, 4, 2)
        np.testing.assert_allclose(c.min(1), [[0.0, 0.0]])
        np.testing.assert_allclose(c.max(1), [[2.0, 4.0]])

    def test_rotation_preserves_center(self):
        rng = np.random.default_rng(3)
        centers = rng.uniform(-5, 5, (20, 2))
        dims = rng.uniform(0.5, 3, (20, 2))
        angles = rng.uniform(-np.pi, np.pi, 20)
        c = box_np.center_to_corner_box2d(centers, dims, angles)
        np.testing.assert_allclose(c.mean(1), centers, atol=1e-6)

    def test_corner3d_lidar_bottom_origin(self):
        c = box_np.center_to_corner_box3d(
            np.array([[0.0, 0.0, 0.0]]), np.array([[2.0, 2.0, 2.0]]),
            np.array([0.0]), origin=(0.5, 0.5, 0.0), axis=2)
        assert np.isclose(c[0, :, 2].min(), 0.0)
        assert np.isclose(c[0, :, 2].max(), 2.0)

    def test_standup(self):
        rng = np.random.default_rng(4)
        boxes = random_boxes(rng, 10)
        corners = box_np.rbbox3d_to_bev_corners(boxes)
        standup = box_np.corner_to_standup_nd(corners)
        assert (standup[:, 2:] >= standup[:, :2]).all()


class TestLimitPeriod:
    def test_range(self):
        vals = np.linspace(-10, 10, 1001)
        out = box_np.limit_period(vals, 0.5, np.pi)
        assert (out >= -np.pi / 2).all() and (out < np.pi / 2).all()
        # residue is preserved modulo π
        np.testing.assert_allclose(np.sin(2 * out), np.sin(2 * vals), atol=1e-9)


class TestIoU:
    def test_identity(self):
        rng = np.random.default_rng(5)
        boxes = random_boxes(rng, 20)[:, [0, 1, 3, 4, 6]]
        iou = rotated_iou(boxes, boxes)
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)

    def test_disjoint(self):
        a = np.array([[0.0, 0, 1, 1, 0.3]])
        b = np.array([[100.0, 100, 1, 1, 1.0]])
        assert rotated_iou(a, b)[0, 0] == 0.0

    def test_containment(self):
        a = np.array([[0.0, 0, 4, 4, 0.0]])
        b = np.array([[0.0, 0, 1, 1, 0.7]])
        np.testing.assert_allclose(rotated_iou(a, b)[0, 0], 1 / 16, atol=1e-6)

    def test_known_half_overlap(self):
        a = np.array([[0.0, 0, 2, 2, 0.0]])
        b = np.array([[1.0, 0, 2, 2, 0.0]])
        np.testing.assert_allclose(rotated_iou(a, b)[0, 0], 2 / 6, atol=1e-6)

    def test_axis_aligned_matches_standup_iou(self):
        rng = np.random.default_rng(6)
        n = 30
        boxes = random_boxes(rng, n)[:, [0, 1, 3, 4, 6]]
        boxes[:, 4] = 0.0
        standup = box_np.center_to_minmax_2d(boxes[:, :2], boxes[:, 2:4])
        expect = box_np.iou_matrix(standup, standup)
        got = rotated_iou(boxes, boxes)
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_nearest_iou_similarity(self):
        sim = NearestIouSimilarity()
        a = np.array([[0.0, 0, 2, 4, 0.0]])
        b = np.array([[0.0, 0, 2, 4, np.pi / 2]])  # snapped to swap w/l
        out = sim.compare(a, b)
        # nearest boxes: [2,4] vs swapped-to-[4,2] → inter 2x2=4, union 12
        np.testing.assert_allclose(out[0, 0], 4 / 12, atol=1e-6)


class TestGeometry:
    def test_points_in_rbbox(self):
        boxes = np.array([[0.0, 0, 0, 2, 2, 2, 0.0]])
        pts = np.array([[0.0, 0, 1.0], [0.0, 0, 2.5], [0.9, 0.9, 0.1],
                        [1.5, 0, 1]])
        inside = box_np.points_in_rbbox(pts, boxes)
        np.testing.assert_array_equal(inside[:, 0], [True, False, True, False])

    def test_points_in_rotated_box(self):
        boxes = np.array([[0.0, 0, 0, 1.0, 4.0, 2, np.pi / 2]])
        # box is 4 long in x after rotating w=1,l=4 by 90°
        pts = np.array([[1.5, 0.0, 1.0], [0.0, 1.5, 1.0]])
        inside = box_np.points_in_rbbox(pts, boxes)
        np.testing.assert_array_equal(inside[:, 0], [True, False])


class TestAnchors:
    def test_range_grid_shape(self):
        anchors = box_np.create_anchors_3d_range(
            [1, 200, 176], [0, -40, -1.78, 70.4, 40, -1.78])
        assert anchors.shape == (1, 200, 176, 1, 2, 7)
        # centers cover the range inclusively
        assert np.isclose(anchors[..., 0].min(), 0.0)
        assert np.isclose(anchors[..., 0].max(), 70.4)
        assert np.isclose(anchors[..., 2].min(), -1.78)

    def test_stride_grid(self):
        anchors = box_np.create_anchors_3d_stride(
            [1, 4, 4], anchor_strides=[0.4, 0.4, 0.0],
            anchor_offsets=[0.2, -39.8, -1.78])
        assert anchors.shape == (1, 4, 4, 1, 2, 7)
        np.testing.assert_allclose(anchors[0, 0, :, 0, 0, 0],
                                   [0.2, 0.6, 1.0, 1.4])


class TestVoxelizer:
    def test_basic(self):
        points = np.array([
            [0.1, 0.1, 0.1, 1.0],
            [0.12, 0.12, 0.12, 2.0],   # same voxel as point 0
            [1.1, 0.1, 0.1, 3.0],
            [-5.0, 0.1, 0.1, 4.0],     # out of range
        ], dtype=np.float32)
        voxels, coords, num_points = points_to_voxel(
            points, [1.0, 1.0, 1.0], [0, 0, 0, 4, 4, 4], max_points=3,
            max_voxels=10)
        assert voxels.shape == (2, 3, 4)
        np.testing.assert_array_equal(num_points, [2, 1])
        # zyx coords
        np.testing.assert_array_equal(coords, [[0, 0, 0], [0, 0, 1]])
        np.testing.assert_allclose(voxels[0, 0], points[0])
        np.testing.assert_allclose(voxels[0, 1], points[1])
        np.testing.assert_allclose(voxels[1, 0], points[2])

    def test_max_points_capping(self):
        points = np.zeros((10, 4), dtype=np.float32)
        points[:, :3] = 0.5
        points[:, 3] = np.arange(10)
        voxels, coords, num_points = points_to_voxel(
            points, [1.0, 1.0, 1.0], [0, 0, 0, 4, 4, 4], max_points=5,
            max_voxels=10)
        assert voxels.shape[0] == 1
        assert num_points[0] == 5
        np.testing.assert_allclose(voxels[0, :, 3], [0, 1, 2, 3, 4])

    def test_max_voxels_first_come(self):
        rng = np.random.default_rng(7)
        points = rng.uniform(0, 4, (100, 4)).astype(np.float32)
        voxels, coords, num_points = points_to_voxel(
            points, [1.0, 1.0, 1.0], [0, 0, 0, 4, 4, 4], max_points=10,
            max_voxels=3)
        assert voxels.shape[0] == 3
        # first voxel must contain the first point
        np.testing.assert_allclose(voxels[0, 0], points[0])


class TestTargetAssign:
    def _similarity(self, anchors, gts):
        sim = NearestIouSimilarity()
        return sim.compare(anchors[:, [0, 1, 3, 4, 6]], gts[:, [0, 1, 3, 4, 6]])

    def test_simple_assignment(self):
        coder = GroundBox3dCoder()
        # 3 anchors, one gt sitting exactly on anchor 1
        anchors = np.array([
            [0.0, 0, -1.78, 1.6, 3.9, 1.56, 0],
            [10.0, 10, -1.78, 1.6, 3.9, 1.56, 0],
            [30.0, -30, -1.78, 1.6, 3.9, 1.56, 0],
        ])
        gt = np.array([[10.0, 10, -1.78, 1.6, 3.9, 1.56, 0]])
        ret = target_np.create_target(
            anchors, gt, self._similarity, coder.encode,
            matched_threshold=0.6, unmatched_threshold=0.45)
        np.testing.assert_array_equal(ret["labels"], [0, 1, 0])
        np.testing.assert_allclose(ret["bbox_targets"][1], 0, atol=1e-6)
        np.testing.assert_array_equal(ret["assigned_anchors_inds"], [1])

    def test_force_match_below_threshold(self):
        coder = GroundBox3dCoder()
        anchors = np.array([
            [0.0, 0, -1.78, 1.6, 3.9, 1.56, 0],
            [50.0, 30, -1.78, 1.6, 3.9, 1.56, 0],
        ])
        # gt overlaps anchor 0 only slightly — still force-matched
        gt = np.array([[1.5, 2.0, -1.78, 1.6, 3.9, 1.56, 0]])
        ret = target_np.create_target(
            anchors, gt, self._similarity, coder.encode,
            matched_threshold=0.6, unmatched_threshold=0.45)
        assert ret["labels"][0] == 1
        assert ret["labels"][1] == 0

    def test_no_gt(self):
        coder = GroundBox3dCoder()
        anchors = random_boxes(np.random.default_rng(8), 10)
        ret = target_np.create_target(
            anchors, np.zeros((0, 7)), self._similarity, coder.encode)
        np.testing.assert_array_equal(ret["labels"], np.zeros(10))

    def test_anchors_mask_pruning(self):
        coder = GroundBox3dCoder()
        anchors = np.array([
            [0.0, 0, -1.78, 1.6, 3.9, 1.56, 0],
            [10.0, 10, -1.78, 1.6, 3.9, 1.56, 0],
            [30.0, -30, -1.78, 1.6, 3.9, 1.56, 0],
        ])
        gt = np.array([[10.0, 10, -1.78, 1.6, 3.9, 1.56, 0]])
        mask = np.array([True, False, True])
        ret = target_np.create_target(
            anchors, gt, self._similarity, coder.encode,
            prune_anchor_fn=lambda _: np.where(mask)[0])
        # masked-out anchor 1 is ignored (-1)
        assert ret["labels"][1] == -1


class TestCameraLidar:
    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        r_rect = np.eye(4)
        # small rotation + translation velo→cam
        theta = 0.1
        velo2cam = np.array([
            [0, -1, 0, 0.1],
            [0, 0, -1, -0.2],
            [1, 0, 0, 0.3],
            [0, 0, 0, 1],
        ], dtype=np.float64)
        pts = rng.uniform(-10, 10, (50, 3))
        cam = box_np.lidar_to_camera(pts, r_rect, velo2cam)
        back = box_np.camera_to_lidar(cam, r_rect, velo2cam)
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_project_to_image(self):
        P = np.array([[700.0, 0, 600, 0], [0, 700, 200, 0], [0, 0, 1, 0]])
        pts = np.array([[0.0, 0.0, 10.0]])
        uv = box_np.project_to_image(pts, P)
        np.testing.assert_allclose(uv[0], [600, 200])


class TestAnchorsMaskSAT:
    def test_counts(self):
        coors = np.array([[0, 1, 1], [0, 1, 2], [0, 3, 3]])  # zyx
        dense = box_np.sparse_sum_for_anchors_mask(coors, (8, 8))
        cumsum = dense.cumsum(0).cumsum(1)
        anchors_bv = np.array([[0.0, 0.0, 3.0, 3.0]])  # covers (1,1),(2,1)
        area = box_np.fused_get_anchors_area(
            cumsum, anchors_bv, (1.0, 1.0), (0.0, 0.0), (8, 8))
        assert area[0] >= 2


class TestHostNMS:
    def test_greedy_matches_device_semantics(self):
        from second_tpu.core.nms_np import greedy_nms
        boxes = np.array([[0.0, 0, 2, 4, 0.1], [0.2, 0, 2, 4, 0.1],
                          [20.0, 0, 2, 4, 0.0]])
        scores = np.array([0.9, 0.8, 0.7])
        keep = greedy_nms(boxes, scores, iou_threshold=0.1)
        assert set(keep.tolist()) == {0, 2}

    def test_soft_nms_decays_overlaps(self):
        from second_tpu.core.nms_np import soft_nms
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         float)
        scores = np.array([0.9, 0.85, 0.5])
        keep, rescored = soft_nms(boxes, scores)
        assert keep[0] == 0
        # overlapping box 1 survives but decayed below its original score
        i1 = list(keep).index(1)
        assert rescored[i1] < 0.85
        # distant box unaffected
        i2 = list(keep).index(2)
        assert np.isclose(rescored[i2], 0.5)
