"""Production-shape kernel dispatch decisions, pinned (VERDICT r1 item 5).

Round 1 established these dispatch outcomes by measurement on v5e and
recorded them only in PARITY.md prose; these tests turn them into
regressions. Shapes are the real workload shapes:

  * CIFAR DiT-S/4 paper config: B*m = 2048 images, N = 64 tokens, D = 384,
    T = 131072 MLP token rows, F = 1536, energy (B=256, m=8, D=3072).
  * DiT-B/4 scale: D = 768, F = 3072.
  * image-size-64 row: N = 256.

Plus interpret-mode numerical checks at the production energy shape and
the m>16 guard (the kernel unrolls m(m-1)/2 pair loops; m=32 would emit
496 dot-reduces and must take the jnp path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ddm_tpu.ops.attention as A
import ddm_tpu.ops.energy as E
import ddm_tpu.ops.mlp_block as M

# CIFAR paper-config shapes
BM, N_S, D_S, F_S = 2048, 64, 384, 1536
D_B, F_B = 768, 3072
T_ROWS = BM * N_S


class TestAttentionGating:
    def test_dit_s_fully_fused(self):
        """DiT-S: the accumulate-in-VMEM backward fits (bi=8 measured r1)."""
        bi, g = A._choose_blocks(BM, N_S, D_S)
        assert (bi, g) == (16, 4)
        assert A._bwd_block_images(BM, N_S, D_S, g, 6) == 8

    def test_dit_b_splits_backward(self):
        """DiT-B: fp32 dW residents overflow VMEM -> full-fused bwd OFF,
        split backward ON (dx/dqkv kernel + XLA dW)."""
        _, g = A._choose_blocks(BM, N_S, D_B)
        assert A._bwd_block_images(BM, N_S, D_B, g, 12) == 0
        assert A._bwd_split_block_images(BM, N_S, D_B, g, 12) >= g

    def test_image_size_64_small_blocks(self):
        """N=256 (image-size 64): no packing (g=1) and the half-block bwd
        shrinks to bi=2 images per grid step but stays ON — the dispatch
        PARITY.md's image-size-64 bench row ran through."""
        bi, g = A._choose_blocks(BM, 256, D_S)
        assert g == 1
        assert A._bwd_block_images(BM, 256, D_S, g, 6) == 2

    def test_attn_bwd_bi_escape_hatch(self, monkeypatch):
        """DDM_TPU_ATTN_BWD_BI caps the backward image block (scoped-vmem
        escape hatch, same contract as DDM_TPU_MLP_ROW_BLOCK)."""
        monkeypatch.setenv("DDM_TPU_ATTN_BWD_BI", "4")
        assert A._bwd_block_images(BM, N_S, D_S, 4, 6) == 4
        monkeypatch.setenv("DDM_TPU_ATTN_BWD_BI", "0")
        assert A._bwd_block_images(BM, N_S, D_S, 4, 6) == 8

    def test_dit_l_pack_shrinks_to_2(self):
        """DiT-L (D=1024, H=16): the 8 MB weight residents leave room for
        only bi=2 images — below _choose_blocks' g=4 pack, which is what
        gated the half-block kernels OFF in r2 (44.5% MFU mixed stack).
        _attn_pack must shrink the pack to g=2 (P=128 = one MXU tile) and
        select the split backward at bi=2."""
        D_L, H_L = 1024, 16
        assert A._choose_blocks(BM, N_S, D_L)[1] == 4
        assert A._fwd_block_images(BM, N_S, D_L, 4) == 0  # g=4 cannot fit
        g = A._attn_pack(BM, N_S, D_L, H_L)
        assert g == 2
        assert A._fwd_block_images(BM, N_S, D_L, g) == 2
        assert A._bwd_block_images(BM, N_S, D_L, g, H_L) == 0  # fully-fused off
        assert A._bwd_split_block_images(BM, N_S, D_L, g, H_L) == 2

    def test_dit_s_b_packs_unchanged_by_shrink_logic(self):
        """The pack-shrink fallback must not perturb the measured DiT-S/B
        dispatch (g=4 from _choose_blocks already fits there)."""
        assert A._attn_pack(BM, N_S, D_S, 6) == 4
        assert A._attn_pack(BM, N_S, D_B, 12) == 4
        assert A._attn_pack(BM, 256, D_S, 6) == 1  # image-size 64: no packing

    def test_fwd_cap_below_pack_shrinks_pack(self, monkeypatch):
        """N=16 at DiT-B width: the D>512 VMEM cap (bi=4) is below
        _choose_blocks' pack (g=8). Pre-r3 this rejected the kernel
        outright (after r1 fixed a silent-garbage path that invoked it
        with bi=0); _attn_pack now shrinks the pack to g=4 instead, and
        the kernel output must still match the oracle."""
        assert A._choose_blocks(2048, 16, 768)[1] == 8
        assert A._fwd_block_images(2048, 16, 768, 8) == 0
        assert A._attn_pack(2048, 16, 768, 12) == 4

        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(7)
        B, N, D, H = 16, 16, 768, 12
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        sp = jnp.ones((D,), jnp.float32)
        bp = jnp.zeros((D,), jnp.float32)
        wqkv = jnp.asarray(
            (rng.normal(size=(D, 3 * D)) / np.sqrt(D)).astype(np.float32))
        bqkv = jnp.zeros((3 * D,), jnp.float32)
        wproj = jnp.asarray(
            (rng.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
        bproj = jnp.zeros((D,), jnp.float32)
        out = A.fused_attention_block(x, sp, bp, wqkv, bqkv, wproj, bproj, H)
        ref = A.attention_block_reference(x, sp, bp, wqkv, bqkv, wproj,
                                          bproj, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_standalone_kernel_supported_at_n256(self):
        """The standalone attention kernel itself still covers N=256."""
        B, N, D = 512, 256, 384
        bi, g = A._choose_blocks(B, N, D)
        assert N % 8 == 0 and N <= 512 and D % 128 == 0 and B % bi == 0


class TestMlpGating:
    def test_dit_s_fully_fused(self):
        # bwd row block 256 (12 MB budget — rb=512 tripped scoped-vmem in
        # some program shapes); fwd keeps the faster rb=512
        assert M._row_block(T_ROWS, D_S, F_S) == 256
        assert M._row_block(T_ROWS, D_S, F_S, fixed=M._fwd_fixed(D_S, F_S)) == 512
        assert M._mlp_kernel_ok(T_ROWS, D_S, F_S) or not M.kernels_enabled()

    def test_dit_b_forward_only(self):
        """DiT-B: 12*D*F = 28 MB kills the in-VMEM backward; the forward
        kernel (weights-only residents, 9.4 MB) must still be available."""
        rb_bwd = M._row_block(T_ROWS, D_B, F_B)
        assert 12 * D_B * F_B + rb_bwd * (D_B * 8 + F_B * 8) > 15 * 1024 * 1024
        rb_fwd = M._row_block(T_ROWS, D_B, F_B, fixed=M._fwd_fixed(D_B, F_B))
        assert M._fwd_fixed(D_B, F_B) + rb_fwd * (D_B * 8 + F_B * 8) \
            < 15 * 1024 * 1024

    def test_dispatch_ladder(self, monkeypatch):
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        assert M._mlp_kernel_ok(T_ROWS, D_S, F_S)
        assert not M._mlp_kernel_ok(T_ROWS, D_B, F_B)
        assert M._mlp_fwd_kernel_ok(T_ROWS, D_B, F_B)

    def test_dit_l_forward_chunks_hidden_axis(self, monkeypatch):
        """DiT-L (D=1024, F=4096): 4*D*F = 16.8 MB kills even the
        weights-only forward kernel; the F-chunked forward must pick
        k=2 (two 8.4 MB passes) so the fused stack stays on (r2 left
        this width entirely to XLA)."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        D_L, F_L = 1024, 4096
        assert not M._mlp_fwd_kernel_ok(T_ROWS, D_L, F_L)
        assert M._mlp_fwd_fchunks(T_ROWS, D_L, F_L) == 2
        # DiT-S/B stay on their unchunked tiers
        assert M._mlp_fwd_fchunks(T_ROWS, D_S, F_S) == 1
        assert M._mlp_fwd_fchunks(T_ROWS, D_B, F_B) == 1


class TestEnergyGating:
    def test_production_shape_supported(self):
        assert E._kernel_supported(256, 8, 3072)

    def test_m32_routes_to_jnp(self):
        """BASELINE.json m-sweep point: m=32 must NOT unroll in-kernel."""
        assert not E._kernel_supported(256, 32, 3072)
        assert E._kernel_supported(256, 16, 3072)

    def test_m32_jnp_path_still_correct(self, monkeypatch):
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(0)
        xh = jnp.asarray(rng.normal(size=(4, 32, 128)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        conf, inter = E.fused_energy_terms(xh, x0, 0.1)
        c2, i2 = E._jnp_energy_terms(xh, x0, 0.1)
        np.testing.assert_allclose(float(conf), float(c2), rtol=1e-6)
        np.testing.assert_allclose(float(inter), float(i2), rtol=1e-6)


@pytest.mark.slow
class TestProductionShapeInterpret:
    """Interpret-mode numerics at one grid step of the REAL shapes."""

    def test_energy_production_block(self, monkeypatch):
        """One grid step of the CIFAR energy shape: bb=8 images, m=8,
        D=3072 — values and grads match the jnp oracle."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(1)
        B, m, D = 8, 8, 3072
        assert E._kernel_supported(B, m, D)
        xh = jnp.asarray(rng.normal(size=(B, m, D)).astype(np.float32))
        x0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

        def total(fn):
            def f(xh, x0):
                c, i = fn(xh, x0, 0.1)
                return c - 0.5 * i
            return f

        got = total(E.fused_energy_terms)(xh, x0)
        want = total(E._jnp_energy_terms)(xh, x0)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        g1 = jax.grad(total(E.fused_energy_terms), argnums=(0, 1))(xh, x0)
        g2 = jax.grad(total(E._jnp_energy_terms), argnums=(0, 1))(xh, x0)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7
            )

    def test_attention_block_production_slice(self, monkeypatch):
        """One grid step of the DiT-S half-block (bi=16 images, N=64,
        D=384) through the FULLY-FUSED kernel, fwd + grads vs oracle."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(2)
        B, N, D, H = 16, N_S, D_S, 6
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        sp = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        bp = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        wqkv = jnp.asarray(
            (rng.normal(size=(D, 3 * D)) / np.sqrt(D)).astype(np.float32))
        bqkv = jnp.asarray(0.1 * rng.normal(size=(3 * D,)).astype(np.float32))
        wproj = jnp.asarray(
            (rng.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
        bproj = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        args = (x, sp, bp, wqkv, bqkv, wproj, bproj)

        out = A._fused_block(*args, H)
        ref = A.attention_block_reference(*args, H)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

        g1 = jax.grad(lambda *a: (A._fused_block(*a, H) ** 2).sum(),
                      argnums=(0, 3, 5))(*args)
        g2 = jax.grad(lambda *a: (A.attention_block_reference(*a, H) ** 2).sum(),
                      argnums=(0, 3, 5))(*args)
        for a, b in zip(g1, g2):
            sc = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / sc < 1e-4

    def test_attention_split_bwd_dit_b_slice(self, monkeypatch):
        """One grid step of the DiT-B half-block through the SPLIT-backward
        path (D=768): fwd + all seven grads vs oracle."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(3)
        B, N, D, H = 8, N_S, D_B, 12
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        sp = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        bp = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        wqkv = jnp.asarray(
            (rng.normal(size=(D, 3 * D)) / np.sqrt(D)).astype(np.float32))
        bqkv = jnp.asarray(0.1 * rng.normal(size=(3 * D,)).astype(np.float32))
        wproj = jnp.asarray(
            (rng.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
        bproj = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        args = (x, sp, bp, wqkv, bqkv, wproj, bproj)

        out = A._fused_block_sb(*args, H)
        ref = A.attention_block_reference(*args, H)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

        g1 = jax.grad(lambda *a: (A._fused_block_sb(*a, H) ** 2).sum(),
                      argnums=tuple(range(7)))(*args)
        g2 = jax.grad(lambda *a: (A.attention_block_reference(*a, H) ** 2).sum(),
                      argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            sc = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / sc < 1e-4

    def test_attention_dit_l_small_pack_slice(self, monkeypatch):
        """One grid step of the DiT-L half-block through the g=2 small-
        pack + split-backward path (D=1024, H=16): fwd + all seven grads
        vs oracle."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(5)
        B, N, D, H = 4, N_S, 1024, 16
        assert A._attn_pack(B, N, D, H) == 2
        x = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
        sp = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        bp = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        wqkv = jnp.asarray(
            (rng.normal(size=(D, 3 * D)) / np.sqrt(D)).astype(np.float32))
        bqkv = jnp.asarray(0.1 * rng.normal(size=(3 * D,)).astype(np.float32))
        wproj = jnp.asarray(
            (rng.normal(size=(D, D)) / np.sqrt(D)).astype(np.float32))
        bproj = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        args = (x, sp, bp, wqkv, bqkv, wproj, bproj)

        out = A._fused_block_sb(*args, H)
        ref = A.attention_block_reference(*args, H)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

        g1 = jax.grad(lambda *a: (A._fused_block_sb(*a, H) ** 2).sum(),
                      argnums=tuple(range(7)))(*args)
        g2 = jax.grad(lambda *a: (A.attention_block_reference(*a, H) ** 2).sum(),
                      argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            sc = float(jnp.abs(b).max()) + 1e-9
            assert float(jnp.abs(a - b).max()) / sc < 1e-4

    def test_mlp_fchunked_dit_l_rows(self, monkeypatch):
        """DiT-L MLP rows through the F-chunked forward (k=2) + XLA
        backward path: values and grads vs the jnp reference."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(6)
        T, D, F = 64, 1024, 4096
        x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
        s = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        b = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32))
        b1 = jnp.asarray(0.1 * rng.normal(size=(F,)).astype(np.float32))
        w2 = jnp.asarray((rng.normal(size=(F, D)) / np.sqrt(F)).astype(np.float32))
        b2 = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        args = (x, s, b, w1, b1, w2, b2)

        out = M._fused_fwdonly_fchunked(*args)
        ref = M.mlp_block_reference(*args, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4)
        g1 = jax.grad(lambda *a: (M._fused_fwdonly_fchunked(*a) ** 2).sum(),
                      argnums=(0, 3, 5))(*args)
        g2 = jax.grad(
            lambda *a: (M.mlp_block_reference(*a, dtype=jnp.float32) ** 2).sum(),
            argnums=(0, 3, 5))(*args)
        for a, b_ in zip(g1, g2):
            sc = float(jnp.abs(b_).max()) + 1e-9
            assert float(jnp.abs(a - b_).max()) / sc < 1e-4

    def test_mlp_partial_fwdonly_tp_dit_b(self, monkeypatch):
        """TP at DiT-B width (local F = F/tp = 1536 at D=768): the in-VMEM
        partial backward gates off (12*D*F = 14.2 MB) but the fwd-only
        partial tier must stay on, with values/grads matching the jnp
        partial reference."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        assert not M._mlp_kernel_ok(T_ROWS, D_B, F_B // 2)
        assert M._mlp_fwd_kernel_ok(T_ROWS, D_B, F_B // 2)

        rng = np.random.default_rng(8)
        T, D, F = 64, D_B, F_B // 2
        x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
        s = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        b = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32))
        b1 = jnp.asarray(0.1 * rng.normal(size=(F,)).astype(np.float32))
        w2 = jnp.asarray((rng.normal(size=(F, D)) / np.sqrt(F)).astype(np.float32))
        args = (x, s, b, w1, b1, w2)

        out = M._fused_partial_fwdonly(*args)
        ref = M.mlp_partial_reference(*args, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4)
        g1 = jax.grad(lambda *a: (M._fused_partial_fwdonly(*a) ** 2).sum(),
                      argnums=(0, 3, 5))(*args)
        g2 = jax.grad(
            lambda *a: (M.mlp_partial_reference(*a, dtype=jnp.float32) ** 2).sum(),
            argnums=(0, 3, 5))(*args)
        for a, b_ in zip(g1, g2):
            sc = float(jnp.abs(b_).max()) + 1e-9
            assert float(jnp.abs(a - b_).max()) / sc < 1e-4

    def test_mlp_fwdonly_dit_b_rows(self, monkeypatch):
        """DiT-B MLP rows through the forward-kernel/XLA-backward path."""
        monkeypatch.setenv("DDM_TPU_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(4)
        T, D, F = 64, D_B, F_B
        x = jnp.asarray(rng.normal(size=(T, D)).astype(np.float32))
        s = jnp.asarray(1 + 0.1 * rng.normal(size=(D,)).astype(np.float32))
        b = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        w1 = jnp.asarray((rng.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32))
        b1 = jnp.asarray(0.1 * rng.normal(size=(F,)).astype(np.float32))
        w2 = jnp.asarray((rng.normal(size=(F, D)) / np.sqrt(F)).astype(np.float32))
        b2 = jnp.asarray(0.1 * rng.normal(size=(D,)).astype(np.float32))
        args = (x, s, b, w1, b1, w2, b2)

        out = M._fused_fwdonly(*args)
        ref = M.mlp_block_reference(*args, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4)
        g1 = jax.grad(lambda *a: (M._fused_fwdonly(*a) ** 2).sum(),
                      argnums=(0, 3, 5))(*args)
        g2 = jax.grad(
            lambda *a: (M.mlp_block_reference(*a, dtype=jnp.float32) ** 2).sum(),
            argnums=(0, 3, 5))(*args)
        for a, b_ in zip(g1, g2):
            sc = float(jnp.abs(b_).max()) + 1e-9
            assert float(jnp.abs(a - b_).max()) / sc < 1e-4
