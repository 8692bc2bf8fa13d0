"""Tests for heatmap targets, NMS, decode, greedy NMS and DoG mining.

Golden values come from independent implementations (numpy brute force, torch
max_pool3d, scipy gaussian_filter), not from the reference codebase.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cet_pick_tpu.ops import (
    gaussian_radius,
    gaussian3d,
    gaussian3d_discrete,
    draw_gaussian_3d,
    build_heatmap,
    nms3d,
    nms3d_xy,
    nms3d_z,
    sigmoid_clamped,
    topk_3d,
    tomo_decode,
    decode_detections,
    greedy_nms_3d,
    dog_candidates_pyramid,
)
from cet_pick_tpu.ops.dog import gaussian_blur_3d


class TestGaussianRadius:
    def test_golden_values(self):
        # The CornerNet formula divides (b + sqrt(disc)) by 2 rather than 2a —
        # a well-known upstream quirk preserved for parity. Golden values
        # computed once from the formula.
        assert gaussian_radius((8, 8)) == pytest.approx(2.1865604245452097)
        assert gaussian_radius((16, 16)) == pytest.approx(4.373120849090419)

    def test_monotone_in_box_size(self):
        assert gaussian_radius((8, 8)) < gaussian_radius((16, 16)) < gaussian_radius((32, 32))


class TestGaussian3d:
    def test_peak_plateau_and_symmetry(self):
        g = gaussian3d((7, 7, 7), sigma=7 / 6)
        assert g[3, 3, 3] == 1.0
        assert np.all(g[g > 0.9] == 1.0)
        np.testing.assert_allclose(g, g[::-1, ::-1, ::-1])

    def test_discrete_labels(self):
        g = gaussian3d_discrete((5, 5, 5), sigma=5 / 6, label1=1, label2=0, thresh=0.2)
        assert set(np.unique(g)) <= {0.0, 1.0}
        assert g[2, 2, 2] == 1.0
        assert g[0, 0, 0] == 0.0


class TestDrawAndBuild:
    def test_draw_center_and_clip(self):
        hm = np.zeros((8, 16, 16), dtype=np.float32)
        draw_gaussian_3d(hm, (5, 6, 3), radius=2)
        assert hm[3, 6, 5] == 1.0
        # splat near corner must not error and keeps peak inside
        draw_gaussian_3d(hm, (0, 0, 0), radius=2)
        assert hm[0, 0, 0] == 1.0

    def test_max_combine_of_overlapping(self):
        hm = np.zeros((8, 16, 16), dtype=np.float32)
        draw_gaussian_3d(hm, (5, 5, 4), radius=3)
        before = hm.copy()
        draw_gaussian_3d(hm, (7, 5, 4), radius=3)
        assert np.all(hm >= before)

    def test_build_heatmap_pu_and_inds(self):
        coords = np.array([[10, 12, 3], [40, 44, 6]])
        hm, inds, gt, anns = build_heatmap((8, 64, 64), coords, bbox=16, down_ratio=2)
        assert hm.shape == (8, 32, 32)
        # peaks at downscaled coords
        assert hm[3, 6, 5] == 1.0 and hm[6, 22, 20] == 1.0
        # PU: all non-splatted voxels are -1
        assert hm.min() == -1.0
        assert not np.any(hm == 0.0)
        np.testing.assert_array_equal(inds, [3 * 1024 + 6 * 32 + 5, 6 * 1024 + 22 * 32 + 20])
        np.testing.assert_array_equal(anns, [[5, 6, 3], [20, 22, 6]])

    def test_build_heatmap_pn_keeps_zeros(self):
        coords = np.array([[10, 12, 3]])
        hm, *_ = build_heatmap((8, 64, 64), coords, bbox=16, pu=False)
        assert hm.min() == 0.0

    def test_build_heatmap_fiber_discrete(self):
        coords = np.array([[10, 12, 3]])
        hm, *_ = build_heatmap((8, 64, 64), coords, bbox=16, fiber=True, pu=False)
        assert set(np.unique(hm)) <= {0.0, 1.0}

    def test_empty_coords(self):
        hm, inds, gt, anns = build_heatmap((4, 16, 16), np.zeros((0, 3)), bbox=8)
        assert gt.shape == (1, 3) and anns.shape == (0, 3)
        assert np.all(hm == -1)


class TestNms:
    def test_matches_torch_maxpool(self, rng):
        import torch
        import torch.nn.functional as F

        heat = rng.standard_normal((6, 12, 10)).astype(np.float32)
        t = torch.from_numpy(heat)[None, None]
        for ours, window in [
            (nms3d(jnp.asarray(heat), kernel=3), (3, 3, 3)),
            (nms3d_xy(jnp.asarray(heat), kernel=3), (1, 3, 3)),
            (nms3d_z(jnp.asarray(heat), kernel=3), (3, 1, 1)),
        ]:
            pad = tuple(w // 2 for w in window)
            tmax = F.max_pool3d(t, window, stride=1, padding=pad)
            ref = (heat * (tmax == t).float().numpy()[0, 0]).astype(np.float32)
            np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    def test_kernel5(self, rng):
        import torch
        import torch.nn.functional as F

        heat = rng.standard_normal((6, 12, 10)).astype(np.float32)
        t = torch.from_numpy(heat)[None, None]
        # reference decode._nms keeps z window at 3 for any kernel (decode.py:30-31)
        tmax = F.max_pool3d(t, (3, 5, 5), stride=1, padding=(1, 2, 2))
        ref = (heat * (tmax == t).float().numpy()[0, 0]).astype(np.float32)
        ours = nms3d(jnp.asarray(heat), kernel=5, kernel_z=3)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    def test_sigmoid_clamp(self):
        x = jnp.array([-100.0, 0.0, 100.0])
        s = sigmoid_clamped(x)
        np.testing.assert_allclose(np.asarray(s), [1e-4, 0.5, 1 - 1e-4])


class TestDecode:
    def test_topk_matches_numpy(self, rng):
        heat = rng.standard_normal((4, 6, 8)).astype(np.float32)
        scores, z, y, x, inds = topk_3d(jnp.asarray(heat), k=5)
        flat = heat.reshape(-1)
        order = np.argsort(-flat)[:5]
        np.testing.assert_allclose(np.asarray(scores), flat[order], atol=1e-6)
        zz, yy, xx = np.unravel_index(order, heat.shape)
        np.testing.assert_array_equal(np.asarray(z), zz)
        np.testing.assert_array_equal(np.asarray(y), yy)
        np.testing.assert_array_equal(np.asarray(x), xx)

    @pytest.mark.parametrize("shape,k", [((17, 23, 31), 70),   # nb>1, n%nb != 0
                                         ((40, 64, 64), 900),  # nb>1, padded tail
                                         ((4, 6, 8), 5)])      # nb==1 flat path
    def test_blocked_topk_matches_flat(self, rng, shape, k):
        """topk_3d's blocked lowering must select exactly the flat lax.top_k
        row set — incl. negatives, a padded last block, and ties (only the
        order among tied scores may differ; torch.topk's is unspecified
        too)."""
        heat = rng.standard_normal(shape).astype(np.float32)
        # plant ties spread across blocks
        flat_h = heat.reshape(-1)
        flat_h[:: max(1, flat_h.size // 7)] = 5.0
        heat = flat_h.reshape(shape)
        scores, z, y, x, inds = topk_3d(jnp.asarray(heat), k=k)
        ref_s, ref_i = jax.lax.top_k(jnp.asarray(heat).reshape(-1), k)
        got = np.stack([np.asarray(scores), np.asarray(inds)], 1)
        ref = np.stack([np.asarray(ref_s), np.asarray(ref_i)], 1)
        np.testing.assert_array_equal(got[np.lexsort(got.T)],
                                      ref[np.lexsort(ref.T)])
        np.testing.assert_array_equal(
            np.asarray(scores), np.sort(np.asarray(scores))[::-1])
        zz, yy, xx = np.unravel_index(np.asarray(inds), shape)
        np.testing.assert_array_equal(np.asarray(z), zz)
        np.testing.assert_array_equal(np.asarray(y), yy)
        np.testing.assert_array_equal(np.asarray(x), xx)

    def test_tomo_decode_finds_planted_peaks(self):
        heat = np.full((8, 32, 32), 0.01, dtype=np.float32)
        peaks = [(5, 10, 2, 0.9), (20, 25, 6, 0.8)]
        for x, y, z, s in peaks:
            heat[z, y, x] = s
        dets = np.asarray(tomo_decode(jnp.asarray(heat), kernel=3, k=4))
        assert dets.shape == (4, 5)
        # first two rows are the planted peaks with +0.25 offsets
        np.testing.assert_allclose(dets[0], [5.25, 10.25, 2, 0.9, 0.9], atol=1e-6)
        np.testing.assert_allclose(dets[1], [20.25, 25.25, 6, 0.8, 0.8], atol=1e-6)

    def test_decode_detections_fused(self):
        logits = np.full((6, 16, 16), -6.0, dtype=np.float32)
        logits[3, 8, 8] = 6.0
        dets = np.asarray(decode_detections(jnp.asarray(logits), k=2))
        assert dets[0, 0] == pytest.approx(8.25)
        assert dets[0, 3] > 0.99

    def test_fiber_mode_separable(self):
        heat = np.full((8, 16, 16), 0.01, dtype=np.float32)
        heat[4, 8, 8] = 0.9
        dets = np.asarray(tomo_decode(jnp.asarray(heat), kernel=3, k=1, if_fiber=True))
        np.testing.assert_allclose(dets[0, :3], [8.25, 8.25, 4], atol=1e-6)


class TestGreedyNms:
    def test_close_peaks_suppressed(self):
        vol = np.zeros((10, 20, 20), dtype=np.float32)
        vol[5, 10, 10] = 1.0
        vol[5, 10, 12] = 0.9  # within radius of first
        vol[5, 10, 18] = 0.8  # outside
        scores, coords = greedy_nms_3d(vol, d=8, scale=1.0, threshold=0.1)
        assert len(scores) == 2
        np.testing.assert_array_equal(coords[0], [10, 10, 5])
        np.testing.assert_array_equal(coords[1], [18, 10, 5])

    def test_descending_order_and_threshold(self, rng):
        vol = rng.random((6, 16, 16)).astype(np.float32)
        scores, coords = greedy_nms_3d(vol, d=4, threshold=0.5)
        assert np.all(np.diff(scores) <= 1e-7)
        assert np.all(scores > 0.5)

    def test_empty(self):
        vol = np.zeros((4, 8, 8), dtype=np.float32)
        scores, coords = greedy_nms_3d(vol, d=4, threshold=0.5)
        assert len(scores) == 0 and coords.shape == (0, 3)


class TestDog:
    def test_blur_matches_scipy(self, rng):
        from scipy.ndimage import gaussian_filter

        vol = rng.standard_normal((12, 24, 24)).astype(np.float32)
        ours = np.asarray(gaussian_blur_3d(jnp.asarray(vol), 2.0))
        ref = gaussian_filter(vol, 2.0)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_finds_dark_blob(self, rng):
        # cryo-ET particles are dark (low intensity); DoG of (sigma2 - sigma1)
        # responds positively to dark blobs
        vol = np.zeros((40, 100, 100), dtype=np.float32)
        vol += rng.standard_normal(vol.shape).astype(np.float32) * 0.01
        # keep blobs inside the mined region: z in [10, 30), x/y in [30, 70)
        zz, yy, xx = np.mgrid[:40, :100, :100]
        for (cz, cy, cx) in [(20, 45, 45), (20, 45, 65)]:
            blob = np.exp(-((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0 ** 2))
            vol -= blob
        scores, coords = dog_candidates_pyramid(vol, sigmas=(2, 4))
        assert len(coords) >= 2
        found = {tuple(c) for c in coords[:, :3]}
        for target in [(45, 45, 20), (65, 45, 20)]:
            assert any(
                abs(f[0] - target[0]) <= 3 and abs(f[1] - target[1]) <= 3 and abs(f[2] - target[2]) <= 3
                for f in found
            ), f"missing candidate near {target}"




def test_pallas_ztap_conv_matches_conv3d():
    """Interpret-mode check of the fused Pallas head kernel against the
    direct dilated conv3d (the TPU A/B lives in benchmarks/pallas_head_ab.py)."""
    import jax
    import jax.numpy as jnp

    from cet_pick_tpu.ops.pallas_head import ztap_dilated_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 32, 32, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 16)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME", rhs_dilation=(1, 4, 4),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = jnp.maximum(ref, 0)
    out = ztap_dilated_conv(x, k, dilation=4, relu=True, hb=16,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
