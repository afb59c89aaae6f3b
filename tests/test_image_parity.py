"""Cross-framework parity for the image (ViT) modality.

Torch/numpy restatements of the reference equations — the MAE 2-D sincos
table (nn/utils.py:351-398), the 2-D ALiBi distance loop
(nn/modalities/base.py:592-611), PatchEmbed (nn/modalities/images.py:266-300)
and patchify (nn/modalities/images.py:172-198) — are compared against the
jax implementations, with weights transplanted where the op has parameters.
The restatements live here (test-only), mirroring the tests/torch_mirror.py
convention; they are reference-equation mirrors, not framework code.
"""

from __future__ import annotations

import math

import flax.traverse_util as tu
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from animal2vec_tpu.config import ImageModalityConfig
from animal2vec_tpu.models.images import (
    ImageEncoder,
    PatchEmbed,
    patchify,
    sincos_pos_embed_2d,
    unpatchify,
)
from animal2vec_tpu.models.modules import BlockConfig
from animal2vec_tpu.ops.alibi import alibi_bias_2d, alibi_slopes
from animal2vec_tpu.train.convert import _export_stack, jax_to_numpy
from tests import torch_mirror


# ---------------------------------------------------------------------------
# Reference-equation restatements (nn/utils.py:351-398, base.py:592-611)
# ---------------------------------------------------------------------------


def _ref_sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """nn/utils.py:380-398 (MAE get_1d_sincos_pos_embed_from_grid)."""
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _ref_sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    """nn/utils.py:351-377: w-first meshgrid, h-half then w-half concat."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
    emb_h = _ref_sincos_1d(embed_dim // 2, grid[0])
    emb_w = _ref_sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def _ref_alibi_2d(num_patches: int, heads: int, distance: str) -> np.ndarray:
    """The reference's quadruple loop (nn/modalities/base.py:592-611)."""
    n = math.isqrt(num_patches)
    assert n * n == num_patches
    pos = np.zeros((num_patches, num_patches), dtype=np.float32)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                for l in range(n):
                    if distance == "manhattan":
                        d = abs(i - k) + abs(j - l)
                    else:
                        d = math.sqrt((i - k) ** 2 + (j - l) ** 2)
                    pos[i * n + j, k * n + l] = -d
    slopes = np.asarray(torch_mirror.get_alibi_slopes(heads), dtype=np.float32)
    return slopes[:, None, None] * pos[None]


class _TorchPatchEmbed(tnn.Module):
    """nn/modalities/images.py:266-300: strided Conv2d + flatten(2).T."""

    def __init__(self, patch_size: int, in_chans: int, embed_dim: int):
        super().__init__()
        self.proj = tnn.Conv2d(
            in_chans, embed_dim, kernel_size=patch_size, stride=patch_size
        )

    def forward(self, x):  # (B, C, H, W)
        return self.proj(x).flatten(2).transpose(1, 2)  # (B, P, D)


def _ref_patchify(imgs: torch.Tensor, p: int) -> torch.Tensor:
    """nn/modalities/images.py:172-183 (NCHW)."""
    b = imgs.shape[0]
    h = w = imgs.shape[2] // p
    x = imgs.reshape(b, 3, h, p, w, p)
    x = torch.einsum("nchpwq->nhwpqc", x)
    return x.reshape(b, h * w, p**2 * 3)


# ---------------------------------------------------------------------------
# Formula parity
# ---------------------------------------------------------------------------


class TestSincos2dParity:
    @pytest.mark.parametrize("dim,grid", [(32, 4), (64, 7), (128, 14), (768, 14)])
    def test_matches_reference_formula(self, dim, grid):
        ours = np.asarray(sincos_pos_embed_2d(dim, grid))
        ref = _ref_sincos_2d(dim, grid).astype(np.float32)
        assert ours.shape == ref.shape == (grid * grid, dim)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestAlibi2dParity:
    @pytest.mark.parametrize("heads", [4, 6])  # pow2 + the interleave workaround
    @pytest.mark.parametrize("distance", ["manhattan", "euclidean"])
    def test_matches_reference_loop(self, heads, distance):
        num_patches = 25  # 5x5 grid
        ours = np.asarray(alibi_bias_2d(num_patches, heads, distance))
        ref = _ref_alibi_2d(num_patches, heads, distance)
        assert ours.shape == ref.shape == (heads, num_patches, num_patches)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_slopes_match_mirror(self):
        for h in (1, 2, 3, 4, 6, 8, 12, 16):
            np.testing.assert_allclose(
                alibi_slopes(h),
                np.asarray(torch_mirror.get_alibi_slopes(h), dtype=np.float32),
                rtol=1e-6,
            )


# ---------------------------------------------------------------------------
# Op parity with transplanted weights
# ---------------------------------------------------------------------------


class TestPatchEmbedParity:
    def test_matches_torch_conv2d(self):
        p, c, d, size, batch = 8, 3, 32, 32, 2
        rng = np.random.default_rng(0)
        imgs = rng.normal(size=(batch, size, size, c)).astype(np.float32)

        mod = PatchEmbed(patch_size=p, embed_dim=d)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(imgs))
        ours = np.asarray(mod.apply(params, jnp.asarray(imgs)))

        tmod = _TorchPatchEmbed(p, c, d)
        kern = np.asarray(params["params"]["kernel"])  # (p, p, C, D) HWIO
        with torch.no_grad():
            tmod.proj.weight.copy_(
                torch.from_numpy(np.ascontiguousarray(np.transpose(kern, (3, 2, 0, 1))))  # OIHW
            )
            tmod.proj.bias.copy_(
                torch.from_numpy(np.asarray(params["params"]["bias"]))
            )
            theirs = tmod(
                torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
            ).numpy()

        assert ours.shape == theirs.shape == (batch, (size // p) ** 2, d)
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


class TestPatchifyParity:
    def test_matches_torch_einsum(self):
        p, size, batch = 4, 16, 2
        rng = np.random.default_rng(1)
        imgs = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
        ours = np.asarray(patchify(jnp.asarray(imgs), p))
        theirs = _ref_patchify(
            torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))), p
        ).numpy()
        np.testing.assert_array_equal(ours, theirs)
        # and the round trip inverts
        back = np.asarray(unpatchify(jnp.asarray(ours), p))
        np.testing.assert_array_equal(back, imgs)


# ---------------------------------------------------------------------------
# Full image branch: patch embed -> fixed positions -> prenet blocks
# ---------------------------------------------------------------------------


class _TorchImageBranch(tnn.Module):
    """Reference image-branch forward (images.py:58-164 assembly):
    PatchEmbed -> +sincos positions -> BlockEncoder with scaled 2-D ALiBi."""

    def __init__(self, cfg: ImageModalityConfig, embed_dim: int, norm_eps: float):
        super().__init__()
        self.patch = _TorchPatchEmbed(cfg.patch_size, cfg.in_chans, cfg.embed_dim)
        grid = cfg.input_size // cfg.patch_size
        self.pos = torch.from_numpy(
            _ref_sincos_2d(embed_dim, grid).astype(np.float32)
        )[None]
        blocks = tnn.ModuleList(
            torch_mirror.AltBlock(
                embed_dim, cfg.num_alibi_heads, norm_eps=norm_eps,
                layer_norm_first=False,
            )
            for _ in range(cfg.prenet_depth)
        )
        self.enc = torch_mirror.BlockEncoder(
            blocks, tnn.LayerNorm(embed_dim, eps=norm_eps), layer_norm_first=False
        )
        self.bias = torch.from_numpy(
            _ref_alibi_2d(grid * grid, cfg.num_alibi_heads, cfg.alibi_distance)
        )

    def forward(self, imgs, alibi_scale):  # (B, C, H, W)
        x = self.patch(imgs) + self.pos
        bias = self.bias[None].expand(x.shape[0], -1, -1, -1)
        bias = bias * alibi_scale.clamp(min=0.0).squeeze(0).reshape(-1, 1, 1)
        return self.enc(x, None, bias)


class TestImageBranchParity:
    def test_branch_matches_mirror(self):
        cfg = ImageModalityConfig(
            prenet_depth=2,
            input_size=32,
            patch_size=8,
            in_chans=3,
            embed_dim=32,  # == model embed_dim: no patch_proj
            use_alibi_encoder=True,
            learned_alibi_scale=True,
            num_alibi_heads=4,
            model_depth=2,
            decoder=None,
        )
        embed_dim, norm_eps, batch = 32, 1e-5, 2
        block_cfg = BlockConfig(
            dim=embed_dim, num_heads=cfg.num_alibi_heads, norm_eps=norm_eps,
            layer_norm_first=False,
        )
        enc = ImageEncoder(cfg=cfg, embed_dim=embed_dim, block_cfg=block_cfg)

        rng = np.random.default_rng(2)
        imgs = rng.normal(size=(batch, 32, 32, 3)).astype(np.float32)

        def fwd(mod, x):
            h = mod.local_features(x)
            h = mod.fixed_positions(h)
            grid = cfg.input_size // cfg.patch_size
            bias = alibi_bias_2d(
                grid * grid, cfg.num_alibi_heads, cfg.alibi_distance
            )[None]  # (1, H, P, P)
            bias = jnp.broadcast_to(bias, (x.shape[0],) + bias.shape[1:])
            bias, scales = mod.scaled_alibi(bias)
            assert scales is None  # single-scale config pre-multiplies
            return mod.prenet(h, None, bias)

        variables = enc.init(jax.random.PRNGKey(3), jnp.asarray(imgs), method=fwd)
        # make the learned alibi scale non-trivial so the test exercises it
        params = jax.tree.map(np.asarray, variables["params"])
        params["alibi_scale"] = np.asarray(
            rng.uniform(0.5, 1.5, size=params["alibi_scale"].shape), np.float32
        )
        ours = np.asarray(enc.apply({"params": params}, jnp.asarray(imgs), method=fwd))

        mirror = _TorchImageBranch(cfg, embed_dim, norm_eps)
        sd = {}
        flat = tu.flatten_dict(jax_to_numpy(params["context_encoder"]["blocks"]))
        for path, w in flat.items():
            _export_stack(sd, "enc.blocks", tuple(str(x) for x in path)[1:], w)
        sd["enc.norm.weight"] = params["context_encoder"]["norm"]["scale"]
        sd["enc.norm.bias"] = params["context_encoder"]["norm"]["bias"]
        sd["patch.proj.weight"] = np.transpose(
            params["patch_embed"]["kernel"], (3, 2, 0, 1)
        )
        sd["patch.proj.bias"] = params["patch_embed"]["bias"]
        mirror.load_state_dict(
            {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        )
        mirror.eval()
        with torch.no_grad():
            theirs = mirror(
                torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))),
                torch.from_numpy(params["alibi_scale"]),
            ).numpy()

        assert ours.shape == theirs.shape == (batch, 16, embed_dim)
        diff = np.max(np.abs(ours - theirs))
        assert diff <= 1e-4, f"max abs branch diff {diff:.2e}"
