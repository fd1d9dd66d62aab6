"""Native C++ host kernels vs the numpy oracles."""

import numpy as np
import pytest

from second_tpu import runtime
from second_tpu.core import augment, box_np
from second_tpu.core.voxelize_np import points_to_voxel as np_voxelize

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


class TestNativeVoxelizer:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        points = np.concatenate([
            rng.uniform([0, -40, -3], [70.4, 40, 1], (20000, 3)),
            rng.uniform(-100, -50, (500, 3))]).astype(np.float32)
        points = np.concatenate(
            [points, rng.uniform(0, 1, (len(points), 1)).astype(np.float32)],
            1)
        args = ([0.05, 0.05, 0.1], [0, -40, -3, 70.4, 40, 1], 5, 40000)
        v1, c1, n1 = runtime.points_to_voxel(points, *args)
        v2, c2, n2 = np_voxelize(points, *args)
        assert len(c1) == len(c2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_allclose(v1, v2)

    def test_max_voxels_cap(self):
        rng = np.random.default_rng(1)
        points = rng.uniform([0, -4, -3], [8, 4, 1], (5000, 3)).astype(
            np.float32)
        points = np.concatenate([points, np.zeros((5000, 1), np.float32)], 1)
        v, c, n = runtime.points_to_voxel(points, [0.5, 0.5, 0.5],
                                          [0, -4, -3, 8, 4, 1], 3, 16)
        assert len(c) == 16
        assert (n <= 3).all()


class TestNativePointsInBox:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        boxes = np.stack([
            rng.uniform(-10, 10, 20), rng.uniform(-10, 10, 20),
            rng.uniform(-2, 0, 20), rng.uniform(1, 3, 20),
            rng.uniform(2, 5, 20), rng.uniform(1, 2, 20),
            rng.uniform(-np.pi, np.pi, 20)], 1)
        points = rng.uniform(-12, 12, (5000, 3))
        points = np.concatenate([points, np.zeros((5000, 1))], 1)
        want = box_np.points_in_rbbox(points, boxes)
        got = runtime.points_in_rbbox(points, boxes)
        # boundary points may differ by float32 rounding; demand ≥99.9% match
        agree = (got == want).mean()
        assert agree > 0.999, agree


class TestNativeCollision:
    def test_matches_numpy(self):
        rng = np.random.default_rng(3)
        b1 = np.stack([rng.uniform(-10, 10, 40), rng.uniform(-10, 10, 40),
                       rng.uniform(1, 3, 40), rng.uniform(2, 5, 40),
                       rng.uniform(-np.pi, np.pi, 40)], 1)
        b2 = np.stack([rng.uniform(-10, 10, 30), rng.uniform(-10, 10, 30),
                       rng.uniform(1, 3, 30), rng.uniform(2, 5, 30),
                       rng.uniform(-np.pi, np.pi, 30)], 1)
        want = augment.box_collision_test(b1, b2)
        got = runtime.box_collision_test(b1, b2)
        agree = (got == want).mean()
        assert agree > 0.995, agree   # SAT boundary cases may differ slightly


class TestSpeed:
    def test_native_voxelizer_speed(self):
        import time
        rng = np.random.default_rng(4)
        points = rng.uniform([0, -40, -3], [70.4, 40, 1],
                             (120000, 3)).astype(np.float32)
        points = np.concatenate(
            [points, np.zeros((len(points), 1), np.float32)], 1)
        args = ([0.05, 0.05, 0.1], [0, -40, -3, 70.4, 40, 1], 5, 60000)
        runtime.points_to_voxel(points, *args)  # warm
        t0 = time.perf_counter()
        for _ in range(5):
            runtime.points_to_voxel(points, *args)
        native = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        np_voxelize(points, *args)
        numpy_t = time.perf_counter() - t0
        print(f"native {native*1000:.1f} ms vs numpy {numpy_t*1000:.1f} ms")
        assert native < numpy_t


class TestNativeIoUMatrix:
    def test_matches_numpy_oracle(self):
        from second_tpu import runtime
        from second_tpu.core import box_np
        if not runtime.available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(5)
        a = np.sort(rng.uniform(0, 50, (300, 2, 2)), axis=1).reshape(300, 4)
        b = np.sort(rng.uniform(0, 50, (17, 2, 2)), axis=1).reshape(17, 4)
        native = runtime.iou_matrix(a, b)
        oracle = box_np.iou_matrix(a, b)
        np.testing.assert_allclose(native, oracle, atol=1e-6)
        # disjoint boxes → exactly 0
        far = np.array([[100.0, 100, 101, 101]])
        assert runtime.iou_matrix(a, far).max() == 0.0
