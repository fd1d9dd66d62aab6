"""Sparse conv ops vs dense-conv oracle (lax.conv on the densified grid)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from second_tpu.ops import sparse_conv as sp


def make_active_set(rng, grid, n_active, cap, cin):
    """Random active voxels, returned sorted with static capacity `cap`."""
    D, H, W = grid
    lin = rng.choice(D * H * W, size=n_active, replace=False)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
    feats = rng.normal(0, 1, (n_active, cin)).astype(np.float32)
    pad = cap - n_active
    coords = np.concatenate([coords, np.zeros((pad, 3), np.int64)])
    feats = np.concatenate([feats, np.zeros((pad, cin), np.float32)])
    valid = np.arange(cap) < n_active
    c, f, v, k = sp.sort_active(jnp.asarray(coords.astype(np.int32)),
                                jnp.asarray(feats), jnp.asarray(valid), grid)
    return c, f, v, k


def dense_from_sparse(coords, feats, valid, grid):
    D, H, W = grid
    dense = np.zeros((D, H, W, feats.shape[-1]), np.float32)
    c = np.asarray(coords)
    f = np.asarray(feats)
    for i in np.flatnonzero(np.asarray(valid)):
        dense[c[i, 0], c[i, 1], c[i, 2]] = f[i]
    return dense


def dense_conv(dense, weights, kernel, stride, padding):
    """lax 3D conv oracle. weights [K, Cin, Cout] in itertools.product order."""
    kd, kh, kw = kernel
    w = np.asarray(weights).reshape(kd, kh, kw, dense.shape[-1], -1)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense[None]), jnp.asarray(w),
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1]),
                 (padding[2], padding[2])],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return np.asarray(out[0])


class TestSubMConv:
    def test_matches_dense_at_active_sites(self):
        rng = np.random.default_rng(0)
        grid = (6, 10, 12)
        cin, cout = 5, 7
        c, f, v, k = make_active_set(rng, grid, 40, 64, cin)
        w = rng.normal(0, 0.3, (27, cin, cout)).astype(np.float32)
        out = sp.subm_conv3d(f, c, k, v, grid, jnp.asarray(w))
        dense = dense_from_sparse(c, f, v, grid)
        ref = dense_conv(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        cnp, vnp = np.asarray(c), np.asarray(v)
        for i in np.flatnonzero(vnp):
            z, y, x = cnp[i]
            np.testing.assert_allclose(np.asarray(out[i]), ref[z, y, x],
                                       rtol=1e-4, atol=1e-4)
        # inactive rows are zero
        assert np.abs(np.asarray(out)[~vnp]).max() == 0

    def test_submanifold_ignores_inactive_neighbors(self):
        """Output at active sites only sums contributions from *active*
        neighbors — exactly the dense conv on the sparse canvas."""
        rng = np.random.default_rng(1)
        grid = (4, 4, 4)
        c, f, v, k = make_active_set(rng, grid, 2, 8, 3)
        w = rng.normal(0, 0.3, (27, 3, 3)).astype(np.float32)
        out = sp.subm_conv3d(f, c, k, v, grid, jnp.asarray(w))
        dense = dense_from_sparse(c, f, v, grid)
        ref = dense_conv(dense, w, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        cnp = np.asarray(c)
        for i in np.flatnonzero(np.asarray(v)):
            z, y, x = cnp[i]
            np.testing.assert_allclose(np.asarray(out[i]), ref[z, y, x],
                                       rtol=1e-4, atol=1e-5)


class TestSparseConvDown:
    @pytest.mark.parametrize("kernel,stride,padding", [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ])
    def test_matches_dense(self, kernel, stride, padding):
        rng = np.random.default_rng(2)
        grid = (7, 12, 14)
        cin, cout = 4, 6
        c, f, v, k = make_active_set(rng, grid, 50, 64, cin)
        K = int(np.prod(kernel))
        w = rng.normal(0, 0.3, (K, cin, cout)).astype(np.float32)
        out, oc, ok, ov, og, nu = sp.sparse_conv3d(
            f, c, k, v, grid, jnp.asarray(w), kernel, stride, padding,
            out_cap=128)
        dense = dense_from_sparse(c, f, v, grid)
        ref = dense_conv(dense, w, kernel, stride, padding)
        assert ref.shape[:3] == og
        ocn, ovn = np.asarray(oc), np.asarray(ov)
        for i in np.flatnonzero(ovn):
            z, y, x = ocn[i]
            np.testing.assert_allclose(np.asarray(out[i]), ref[z, y, x],
                                       rtol=1e-4, atol=1e-4)
        # every nonzero dense output position is in the active output set
        nz = np.argwhere(np.abs(ref).sum(-1) > 1e-5)
        active = {tuple(r) for r in ocn[ovn]}
        for pos in nz:
            assert tuple(pos) in active

    def test_output_capacity_overflow(self):
        rng = np.random.default_rng(3)
        grid = (4, 8, 8)
        c, f, v, k = make_active_set(rng, grid, 60, 64, 2)
        w = rng.normal(0, 0.3, (27, 2, 2)).astype(np.float32)
        out, oc, ok, ov, og, nu = sp.sparse_conv3d(
            f, c, k, v, grid, jnp.asarray(w), (3, 3, 3), (2, 2, 2), (1, 1, 1),
            out_cap=8)
        assert int(np.asarray(ov).sum()) == 8  # capped deterministically

    def test_overflow_keeps_rank_stratified_subset(self):
        """Capacity overflow must sample across the whole key range (one
        site per rank stratum), not amputate the largest keys — linear keys
        are z-major, so a smallest-keys cut would drop the scene's top
        z-slices (the bias the voxelizer's hash-shuffle fix removed)."""
        rng = np.random.default_rng(5)
        grid = (8, 8, 8)
        c, f, v, k = make_active_set(rng, grid, 200, 256, 2)
        cap = 16
        oc, ov, ok, og, nu = sp.downsample_coords(
            c, v, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), cap)
        ok_np = np.asarray(ok)[np.asarray(ov)]
        assert int(nu) > cap and len(ok_np) == cap
        # sorted output
        assert (np.diff(ok_np) > 0).all()
        # full-capacity reference set (the true unique output sites)
        oc2, ov2, ok2, og2, nu2 = sp.downsample_coords(
            c, v, grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 1024)
        all_keys = np.asarray(ok2)[np.asarray(ov2)]
        # kept subset covers the top stratum: its max is in the last
        # n_unique/cap ranks (a smallest-keys cut would keep none there)
        stratum = int(nu) // cap + 1
        assert ok_np[-1] >= all_keys[-stratum]
        assert set(ok_np) <= set(all_keys)


@pytest.mark.slow
class TestSparseMiddleModule:
    def test_fhd_module_shapes(self):
        from second_tpu.models.sparse_middle import SparseMiddleFHD
        rng = np.random.default_rng(4)
        grid = (41, 32, 32)    # fhd depth, tiny spatial (D = nz + 1)
        B, N, C = 2, 128, 4
        coords = np.stack([rng.integers(0, g, (B, N)) for g in grid],
                          -1).astype(np.int32)
        feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)
        valid = np.ones((B, N), bool)
        valid[:, 100:] = False
        mod = SparseMiddleFHD(output_shape=grid, num_input_features=C)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                          jnp.asarray(coords), jnp.asarray(valid),
                          train=False)
        out = mod.apply(params, jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(valid), train=False)
        # depth chain 41→21→11→5→2, spatial 32→16→8→4→4 (pad (0,1,1) on
        # stage 3 and none after), channels 2*64
        assert out.shape == (B, 4, 4, 128)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_mode_updates_stats(self):
        from second_tpu.models.sparse_middle import SparseMiddleFHD
        rng = np.random.default_rng(5)
        grid = (41, 16, 16)
        B, N, C = 1, 64, 4
        coords = np.stack([rng.integers(0, g, (B, N)) for g in grid],
                          -1).astype(np.int32)
        feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)
        valid = np.ones((B, N), bool)
        mod = SparseMiddleFHD(output_shape=grid, num_input_features=C)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                             jnp.asarray(coords), jnp.asarray(valid),
                             train=False)
        out, mutated = mod.apply(
            variables, jnp.asarray(feats), jnp.asarray(coords),
            jnp.asarray(valid), train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed


@pytest.mark.slow
class TestResNetMiddle:
    def test_resnet_fhd_shapes(self):
        from second_tpu.models.sparse_middle import SparseMiddleResNetFHD
        rng = np.random.default_rng(6)
        grid = (41, 32, 32)
        B, N, C = 1, 128, 4
        coords = np.stack([rng.integers(0, g, (B, N)) for g in grid],
                          -1).astype(np.int32)
        feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)
        valid = np.ones((B, N), bool)
        mod = SparseMiddleResNetFHD(output_shape=grid, num_input_features=C)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                          jnp.asarray(coords), jnp.asarray(valid),
                          train=False)
        out = mod.apply(params, jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(valid), train=False)
        assert out.shape == (B, 4, 4, 128)
        assert np.isfinite(np.asarray(out)).all()


class TestStageCapacities:
    @pytest.mark.slow
    def test_fhd_caps_fit_lidar_scan_no_overflow(self):
        """The FHD_CAP_FACTORS sizing must not truncate active sites on
        LiDAR-scan geometry (the capacity profile they were measured on)."""
        import numpy as np
        from second_tpu import runtime
        from second_tpu.data.synthetic import lidar_scan_scene
        from second_tpu.models.sparse_middle import SparseMiddleFHD
        from second_tpu.train.state import sum_stage_overflow

        rng = np.random.default_rng(3)
        pts, _, _ = lidar_scan_scene(rng, num_azimuth=512)
        vs = [0.05, 0.05, 0.1]
        pr = [0.0, -40.0, -3.0, 70.4, 40.0, 1.0]
        _, coords, _ = runtime.points_to_voxel(
            np.ascontiguousarray(pts), vs, pr, 1, 200000)
        N = 16000
        co = np.zeros((1, N, 3), np.int32)
        n = min(len(coords), N)
        co[0, :n] = coords[:n]
        va = np.zeros((1, N), bool)
        va[0, :n] = True
        feats = np.zeros((1, N, 4), np.float32)

        mod = SparseMiddleFHD(output_shape=(41, 1600, 1408))
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                             jnp.asarray(co), jnp.asarray(va), train=False)
        bev, mut = mod.apply(variables, jnp.asarray(feats), jnp.asarray(co),
                             jnp.asarray(va), train=False,
                             mutable=["intermediates"])
        assert bev.shape == (1, 200, 176, 128)
        assert int(sum_stage_overflow(mut["intermediates"])) == 0


class TestBF16SparseConv:
    def test_subm_bf16_matches_fp32(self):
        """bf16 features: byte-packed key channels must keep tap matching
        EXACT; conv output matches fp32 within bf16 tolerance."""
        rng = np.random.default_rng(0)
        grid = (5, 12, 16)
        N = 128
        lin = np.sort(rng.choice(grid[0] * grid[1] * grid[2], 90,
                                 replace=False))
        coords = np.stack([lin // (grid[1] * grid[2]),
                           (lin // grid[2]) % grid[1],
                           lin % grid[2]], -1).astype(np.int32)
        co = np.zeros((N, 3), np.int32)
        co[:90] = coords
        va = np.zeros(N, bool)
        va[:90] = True
        ke = np.full(N, sp.sentinel(grid), np.int32)
        ke[:90] = lin
        feats = rng.normal(0, 1, (N, 8)).astype(np.float32)
        w = rng.normal(0, 0.2, (27, 8, 8)).astype(np.float32)

        out32 = sp.subm_conv3d(jnp.asarray(feats), jnp.asarray(co),
                               jnp.asarray(ke), jnp.asarray(va), grid,
                               jnp.asarray(w))
        out16 = sp.subm_conv3d(jnp.asarray(feats, jnp.bfloat16),
                               jnp.asarray(co), jnp.asarray(ke),
                               jnp.asarray(va), grid, jnp.asarray(w))
        a32 = np.asarray(out32)
        a16 = np.asarray(out16, np.float32)
        # same sparsity pattern: zero rows match exactly
        np.testing.assert_array_equal(a32 == 0, a16 == 0)
        err = np.abs(a32 - a16).max() / max(np.abs(a32).max(), 1e-6)
        assert err < 0.05, f"bf16 relative error {err:.4f}"


class TestBatchedVariants:
    """Batch-native (flat global-index gather) variants match the vmapped
    per-example reference implementations exactly."""

    def _batch(self, rng, grid, cap, cin, B=3):
        cs, fs, vs, ks = [], [], [], []
        for b in range(B):
            n = int(rng.integers(cap // 4, cap - 2))
            c, f, v, k = make_active_set(rng, grid, n, cap, cin)
            cs.append(c), fs.append(f), vs.append(v), ks.append(k)
        return (jnp.stack(cs), jnp.stack(fs), jnp.stack(vs), jnp.stack(ks))

    def test_subm_conv_b_matches_vmapped(self):
        rng = np.random.default_rng(3)
        grid = (6, 12, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 7)).astype(np.float32))
        ref = jax.vmap(lambda f, c, k, v: sp.subm_conv3d(
            f, c, k, v, grid, w))(feats, coords, keys, valid)
        rb = sp.subm_rulebook_b(coords, keys, valid, grid)
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w,
                               rulebook=rb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_subm_conv_b_builds_own_rulebook(self):
        rng = np.random.default_rng(4)
        grid = (4, 9, 11)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 4, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 4, 4)).astype(np.float32))
        ref = jax.vmap(lambda f, c, k, v: sp.subm_conv3d(
            f, c, k, v, grid, w))(feats, coords, keys, valid)
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("kernel,stride,padding", [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ])
    def test_sparse_conv3d_b_matches_vmapped(self, kernel, stride, padding):
        rng = np.random.default_rng(5)
        grid = (7, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 72, 6)
        K = int(np.prod(kernel))
        w = jnp.asarray(rng.normal(0, 0.3, (K, 6, 8)).astype(np.float32))
        cap = 72

        def one(f, c, k, v):
            out, oc, ok, ov, og, nu = sp.sparse_conv3d(
                f, c, k, v, grid, w, kernel, stride, padding, cap)
            return out, oc, ok, ov, nu
        r_out, r_oc, r_ok, r_ov, r_nu = jax.vmap(one)(feats, coords, keys,
                                                      valid)
        g_out, g_oc, g_ok, g_ov, og, g_nu = sp.sparse_conv3d_b(
            feats, coords, keys, valid, grid, w, kernel, stride, padding,
            cap)
        np.testing.assert_array_equal(np.asarray(g_oc), np.asarray(r_oc))
        np.testing.assert_array_equal(np.asarray(g_ov), np.asarray(r_ov))
        np.testing.assert_array_equal(np.asarray(g_nu), np.asarray(r_nu))
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(r_out),
                                   rtol=1e-5, atol=1e-5)

    def test_lookup_rank_paths_agree(self):
        """Dense cumulative-count ranks == bucket-matmul ranks == reference
        per-example ranks (incl. sentinel and below-range queries)."""
        rng = np.random.default_rng(9)
        grid = (5, 11, 13)
        sen = int(np.prod(grid))
        coords, feats, valid, keys = self._batch(rng, grid, 64, 3, B=2)
        q = rng.integers(-1, sen + 1, (2, 4, 64)).astype(np.int32)
        q = jnp.asarray(np.where(q < 0, sen, q))
        ref = jax.vmap(sp.lookup_rank)(keys, q)
        dense = sp._dense_rank_b(keys, q, sen)
        bucket = sp.lookup_rank_b(keys, q, n_cells=0)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(bucket), np.asarray(ref))

    def test_lookup_rank_gather_equals_bucket(self):
        """Three-level compare/gather ranks == bucket-matmul ranks on
        random keys incl. sentinel and below-range queries, across block
        and sub sizes."""
        rng = np.random.default_rng(26)
        grid = (5, 11, 13)
        sen = int(np.prod(grid))
        coords, feats, valid, keys = self._batch(rng, grid, 64, 3, B=2)
        q = rng.integers(-1, sen + 1, (2, 4, 64)).astype(np.int32)
        q = jnp.asarray(np.where(q < 0, sen, q))
        ref = sp.lookup_rank_b(keys, q, n_cells=0)
        for block in (8, 16, 64):
            for sub in (2, 4, 8):
                got = sp.lookup_rank_gather_b(keys, q, block=block, sub=sub)
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(ref),
                                              err_msg=f"{block}/{sub}")

    def test_subm_conv_b_gather_rank_flag_equivalent(self, monkeypatch):
        """SECOND_TPU_GATHER_RANK routes the whole rulebook build through
        the compare/gather ranks — conv output bit-identical."""
        rng = np.random.default_rng(27)
        grid = (5, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 6)).astype(np.float32))
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        monkeypatch.setattr(sp, "GATHER_RANK", True)
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        args = (feats, coords, keys, valid, grid, w,
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
        monkeypatch.setattr(sp, "GATHER_RANK", False)
        ref2 = sp.sparse_conv3d_b(*args)
        monkeypatch.setattr(sp, "GATHER_RANK", True)
        got2 = sp.sparse_conv3d_b(*args)
        for a, b in zip(got2, ref2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_subm_conv_b_dense_rank_flag_equivalent(self, monkeypatch):
        """With SECOND_TPU_DENSE_RANK_CELLS covering the grid, the whole
        batched subm conv (rulebook build through einsum) matches the
        bucket-matmul default bit-for-bit — the safety check behind the
        on-chip A/B of the dense-rank path (sparse_conv.py:287)."""
        rng = np.random.default_rng(17)
        grid = (5, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 6)).astype(np.float32))
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        monkeypatch.setattr(sp, "DENSE_RANK_MAX_CELLS", int(np.prod(grid)))
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_sparse_conv3d_b_dense_rank_flag_equivalent(self, monkeypatch):
        """Strided conv (downsample candidate gen + rulebook) under the
        dense-rank flag matches the default path."""
        rng = np.random.default_rng(18)
        grid = (6, 8, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 4, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 4, 4)).astype(np.float32))
        args = (feats, coords, keys, valid, grid, w,
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 48)
        ref = sp.sparse_conv3d_b(*args)
        monkeypatch.setattr(sp, "DENSE_RANK_MAX_CELLS", int(np.prod(grid)))
        got = sp.sparse_conv3d_b(*args)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_subm_conv_b_idx_map_flag_equivalent(self, monkeypatch):
        """With SECOND_TPU_IDX_MAP_CELLS covering the grid, the whole
        batched subm conv (dense-index-map rulebook through einsum) matches
        the bucket-matmul window default bit-for-bit."""
        rng = np.random.default_rng(19)
        grid = (5, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 6)).astype(np.float32))
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", int(np.prod(grid)))
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # shared per-stage map gives the same rulebook as the per-build map
        imap = sp.stage_index_map_b(keys, grid)
        assert imap is not None
        rb = sp.subm_rulebook_b(coords, keys, valid, grid, idx_map=imap)
        assert rb[0] == "tap"
        got2 = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w,
                                rulebook=rb)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref))

    def test_tap_apply_flag_equivalent(self, monkeypatch):
        """Tap apply (per-tap exact indices derived from the window
        rulebook — the round-5 shipping DEFAULT) matches the window-format
        apply bit-for-bit for subm and strided convs, full module included.
        The window path is forced explicitly for the reference values."""
        assert sp.TAP_APPLY  # shipping default (15.07 vs 14.26 fps e2e A/B)
        rng = np.random.default_rng(25)
        grid = (5, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 6)).astype(np.float32))
        monkeypatch.setattr(sp, "TAP_APPLY", False)
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        rbw = sp.subm_rulebook_b(coords, keys, valid, grid)
        assert rbw[0] == "win"
        sargs = (feats, coords, keys, valid, grid, w,
                 (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
        sref = sp.sparse_conv3d_b(*sargs)
        monkeypatch.setattr(sp, "TAP_APPLY", True)
        rb = sp.subm_rulebook_b(coords, keys, valid, grid)
        assert rb[0] == "tap"
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w,
                               rulebook=rb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        sgot = sp.sparse_conv3d_b(*sargs)
        for a, b in zip(sgot, sref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_idx_map_window_hybrid_equivalent(self, monkeypatch):
        """Map-built rulebooks converted to window form (map build +
        wide-gather apply, SECOND_TPU_IDX_MAP_WINDOW=1) match both the
        default window path and the pure tap path bit-for-bit."""
        rng = np.random.default_rng(24)
        grid = (5, 10, 12)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 6)).astype(np.float32))
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", int(np.prod(grid)))
        monkeypatch.setattr(sp, "IDX_MAP_WINDOW", True)
        rb = sp.subm_rulebook_b(coords, keys, valid, grid)
        assert rb[0] == "win"
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w,
                               rulebook=rb)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        # strided conv through the hybrid too
        args = (feats, coords, keys, valid, grid, w,
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 64)
        ref2 = None
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", 0)
        ref2 = sp.sparse_conv3d_b(*args)
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", int(np.prod(grid)))
        got2 = sp.sparse_conv3d_b(*args)
        for a, b in zip(got2, ref2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sparse_conv3d_b_idx_map_flag_equivalent(self, monkeypatch):
        """Strided conv under the dense-index-map flag (with and without a
        shared stage map) matches the default window path."""
        rng = np.random.default_rng(20)
        grid = (6, 8, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 4, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 4, 4)).astype(np.float32))
        args = (feats, coords, keys, valid, grid, w,
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 48)
        ref = sp.sparse_conv3d_b(*args)
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", int(np.prod(grid)))
        got = sp.sparse_conv3d_b(*args)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        imap = sp.stage_index_map_b(keys, grid)
        got2 = sp.sparse_conv3d_b(*args, idx_map=imap)
        for a, b in zip(got2, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fhd_module_idx_map_flag_equivalent(self, monkeypatch):
        """The full SparseMiddleFHD forward under the index-map flag equals
        the default path (exercises the shared per-stage map threading)."""
        import jax as _jax
        from second_tpu.models.sparse_middle import SparseMiddleFHD
        rng = np.random.default_rng(21)
        grid = (41, 16, 16)     # real FHD depth (4 z-downsamples), tiny HW
        B, N = 2, 96
        coords = np.stack([rng.integers(0, g, (B, N)) for g in grid],
                          -1).astype(np.int32)
        feats = rng.normal(0, 1, (B, N, 4)).astype(np.float32)
        valid = np.arange(N)[None, :] < np.array([[70], [96]])
        m = SparseMiddleFHD(output_shape=grid, num_input_features=4)
        variables = m.init(_jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(coords), jnp.asarray(valid),
                           train=False)
        ref = m.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid), train=False)
        monkeypatch.setattr(sp, "IDX_MAP_MAX_CELLS", int(np.prod(grid)))
        got = m.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid), train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("out_cap", [128, 16])
    def test_downsample_coords_b_matches_vmapped(self, out_cap):
        """The dense-presence-map batched output-site generator equals the
        per-example sort path bit-for-bit, with and without capacity
        overflow (rank-stratified drop in both)."""
        rng = np.random.default_rng(23)
        grid = (6, 8, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 96, 3, B=2)
        kernel, stride, padding = (3, 3, 3), (2, 2, 2), (1, 1, 1)

        def gen(c, v):
            oc, ov, ok, og, nu = sp.downsample_coords(
                c, v, grid, kernel, stride, padding, out_cap)
            return oc, ov, ok, nu
        r_oc, r_ov, r_ok, r_nu = jax.vmap(gen)(coords, valid)
        g_oc, g_ov, g_ok, og, g_nu = sp.downsample_coords_b(
            coords, valid, grid, kernel, stride, padding, out_cap, tile=16)
        np.testing.assert_array_equal(np.asarray(g_nu), np.asarray(r_nu))
        np.testing.assert_array_equal(np.asarray(g_ov), np.asarray(r_ov))
        np.testing.assert_array_equal(np.asarray(g_ok), np.asarray(r_ok))
        np.testing.assert_array_equal(np.asarray(g_oc), np.asarray(r_oc))

    def test_sparse_max_pool3d_b_matches_vmapped(self):
        rng = np.random.default_rng(11)
        grid = (6, 8, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 5)
        cap = 48
        kernel = (2, 1, 1)

        def one(f, c, k, v):
            out, oc, ok, ov, og, nu = sp.sparse_max_pool3d(
                f, c, k, v, grid, kernel, cap)
            return out, oc, ov, nu
        r_out, r_oc, r_ov, r_nu = jax.vmap(one)(feats, coords, keys, valid)
        g_out, g_oc, g_ok, g_ov, og, g_nu = sp.sparse_max_pool3d_b(
            feats, coords, keys, valid, grid, kernel, cap)
        np.testing.assert_array_equal(np.asarray(g_oc), np.asarray(r_oc))
        np.testing.assert_array_equal(np.asarray(g_ov), np.asarray(r_ov))
        np.testing.assert_array_equal(np.asarray(g_nu), np.asarray(r_nu))
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(r_out),
                                   rtol=1e-6, atol=1e-6)


class TestPallasFusedSubM:
    """Interpret-mode correctness of the fused Pallas subm-conv apply
    (window-slab DMA + in-VMEM tap selection + one MXU matmul,
    ops/pallas/subm.py) against the XLA gather+einsum path it replaces."""

    def _batch(self, rng, grid, cap, cin, B=3):
        cs, fs, vs, ks = [], [], [], []
        for _ in range(B):
            n = int(rng.integers(cap // 4, cap - 2))
            c, f, v, k = make_active_set(rng, grid, n, cap, cin)
            cs.append(c), fs.append(f), vs.append(v), ks.append(k)
        return (jnp.stack(cs), jnp.stack(fs), jnp.stack(vs), jnp.stack(ks))

    def test_fused_matches_xla_apply(self, monkeypatch):
        from second_tpu.ops.pallas.subm import subm_conv3d_fused_pallas
        rng = np.random.default_rng(31)
        grid = (6, 12, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 64, 5)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 5, 7)).astype(np.float32))
        # the fused kernel consumes window-format rulebooks only
        monkeypatch.setattr(sp, "TAP_APPLY", False)
        rb = sp.subm_rulebook_b(coords, keys, valid, grid)
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w,
                               rulebook=rb)
        # odd tile size exercises the Mp padding path
        got = subm_conv3d_fused_pallas(feats, rb[1], rb[2], w,
                                       rows_per_tile=24, inflight=8,
                                       interpret=True)
        got = jnp.where(valid[..., None], got, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_non_cubic_kernel(self):
        """kx=1 kernels (the (3,1,1) downsample shapes) — no window slab."""
        from second_tpu.ops.pallas.subm import subm_conv3d_fused_pallas
        rng = np.random.default_rng(32)
        grid = (6, 10, 8)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 4, B=2)
        base = coords - np.array([1, 1, 0], np.int32)
        rb = sp.gather_rulebook_b(keys, base, valid, grid, (3, 3, 1))
        w = jnp.asarray(rng.normal(0, 0.3, (9, 4, 6)).astype(np.float32))
        stacked = sp.gather_taps_rb_b(feats, *rb)
        ref = jnp.einsum("bknc,kcd->bnd", stacked, w,
                         preferred_element_type=jnp.float32)
        ref = jnp.where(valid[..., None], ref, 0.0)
        got = subm_conv3d_fused_pallas(feats, rb[0], rb[1], w,
                                       rows_per_tile=16, interpret=True)
        got = jnp.where(valid[..., None], got, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_env_switch_routes_to_fused(self, monkeypatch):
        """SECOND_TPU_PALLAS_SUBM=1 routes subm_conv3d_b through the fused
        kernel (asserted via a call counter)."""
        import second_tpu.ops.pallas.subm as psubm
        calls = []
        orig = psubm.subm_conv3d_fused_pallas
        monkeypatch.setattr(
            psubm, "subm_conv3d_fused_pallas",
            lambda f, safe, sel, w, **kw:
                calls.append(1) or orig(f, safe, sel, w, interpret=True))
        monkeypatch.setenv("SECOND_TPU_PALLAS_SUBM", "1")
        # the fused route only fires on window-format rulebooks
        monkeypatch.setattr(sp, "TAP_APPLY", False)
        rng = np.random.default_rng(33)
        grid = (5, 8, 8)
        coords, feats, valid, keys = self._batch(rng, grid, 32, 4, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 4, 4)).astype(np.float32))
        got = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        monkeypatch.delenv("SECOND_TPU_PALLAS_SUBM")
        ref = sp.subm_conv3d_b(feats, coords, keys, valid, grid, w)
        assert calls
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_env_switch_strided_conv(self, monkeypatch):
        """The fused Pallas apply is rulebook-generic: strided sparse convs
        under SECOND_TPU_PALLAS_SUBM=1 match the XLA einsum path."""
        import second_tpu.ops.pallas.subm as psubm
        orig = psubm.subm_conv3d_fused_pallas
        monkeypatch.setattr(
            psubm, "subm_conv3d_fused_pallas",
            lambda f, safe, sel, w, **kw: orig(f, safe, sel, w,
                                               interpret=True))
        monkeypatch.setattr(sp, "TAP_APPLY", False)
        rng = np.random.default_rng(34)
        grid = (6, 8, 10)
        coords, feats, valid, keys = self._batch(rng, grid, 48, 4, B=2)
        w = jnp.asarray(rng.normal(0, 0.3, (27, 4, 6)).astype(np.float32))
        args = (feats, coords, keys, valid, grid, w,
                (3, 3, 3), (2, 2, 2), (1, 1, 1), 48)
        ref = sp.sparse_conv3d_b(*args)
        monkeypatch.setenv("SECOND_TPU_PALLAS_SUBM", "1")
        got = sp.sparse_conv3d_b(*args)
        for a, b in zip(got[1:], ref[1:]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
