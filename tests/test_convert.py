"""Reference-checkpoint conversion: forward parity vs a torch oracle.

The converters in :mod:`ddm_tpu.utils.convert` claim that a reference
``state_dict`` maps onto our param trees with identical forward semantics.
These tests prove it the same way ``tests/inception_oracle.py`` anchors the
Inception converter: a FUNCTIONAL torch implementation of the reference
architecture (written here from the architecture spec in SURVEY §2 /
``/root/reference/dddm/model.py`` — einsum/functional style, no module
classes) runs the same randomly-initialised weights, and the converted
ddm_tpu model must match its output to fp32 tolerance. The only tolerated
deviation is LayerNorm eps (torch 1e-5 vs flax 1e-6).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

from ddm_tpu.models.dit import DDDMDiT  # noqa: E402
from ddm_tpu.models.mlp import DDDMMLP  # noqa: E402
from ddm_tpu.utils.convert import (  # noqa: E402
    dit_params_from_reference,
    load_reference_checkpoint,
    mlp_params_from_reference,
)

# tiny DiT: img 8, patch 2 (16 tokens), D=32, depth 2, heads 2, T=16
CFG = dict(img=8, patch=2, c=3, dim=32, depth=2, heads=2, tdim=16)


def _rand(*shape, g, scale=0.2):
    return torch.randn(*shape, generator=g) * scale


def _make_dit_sd(cfg):
    g = torch.Generator().manual_seed(0)
    d, p, c, t = cfg["dim"], cfg["patch"], cfg["c"], cfg["tdim"]
    n = (cfg["img"] // p) ** 2
    hidden = 4 * d
    sd = {
        "patch_embed.proj.weight": _rand(d, 2 * c, p, p, g=g),
        "patch_embed.proj.bias": _rand(d, g=g),
        "pos_embed": _rand(1, n, d, g=g),
        "time_mlp.0.weight": _rand(d, t, g=g),
        "time_mlp.0.bias": _rand(d, g=g),
        "time_mlp.2.weight": _rand(d, d, g=g),
        "time_mlp.2.bias": _rand(d, g=g),
        "norm.weight": 1 + 0.1 * _rand(d, g=g),
        "norm.bias": 0.1 * _rand(d, g=g),
        "unembed.proj.weight": _rand(c * p * p, d, g=g),
        "unembed.proj.bias": _rand(c * p * p, g=g),
    }
    for i in range(cfg["depth"]):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": 1 + 0.1 * _rand(d, g=g),
            f"{b}.norm1.bias": 0.1 * _rand(d, g=g),
            f"{b}.attn.qkv.weight": _rand(3 * d, d, g=g),
            f"{b}.attn.qkv.bias": _rand(3 * d, g=g),
            f"{b}.attn.proj.weight": _rand(d, d, g=g),
            f"{b}.attn.proj.bias": _rand(d, g=g),
            f"{b}.norm2.weight": 1 + 0.1 * _rand(d, g=g),
            f"{b}.norm2.bias": 0.1 * _rand(d, g=g),
            f"{b}.ff.net.0.weight": _rand(hidden, d, g=g),
            f"{b}.ff.net.0.bias": _rand(hidden, g=g),
            f"{b}.ff.net.2.weight": _rand(d, hidden, g=g),
            f"{b}.ff.net.2.bias": _rand(d, g=g),
        })
    return sd


def _lin(x, sd, key):
    return F.linear(x, sd[f"{key}.weight"], sd[f"{key}.bias"])


def _lnorm(x, sd, key):
    return F.layer_norm(
        x, (x.shape[-1],), sd[f"{key}.weight"], sd[f"{key}.bias"], eps=1e-5
    )


def _oracle_dit(sd, cfg, xt, t, xi):
    """Functional torch forward with reference semantics (NCHW in/out)."""
    d, p, heads, tdim = cfg["dim"], cfg["patch"], cfg["heads"], cfg["tdim"]
    dh = d // heads
    x = torch.cat([xt, xi], dim=1)
    h = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=p)
    h = h.flatten(2).transpose(1, 2)  # (B, N, D)

    half = tdim // 2
    exponent = -math.log(1e4) * torch.arange(half, dtype=t.dtype) / (half - 1)
    args = t[:, None] * torch.exp(exponent)[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    temb = _lin(F.silu(_lin(emb, sd, "time_mlp.0")), sd, "time_mlp.2")
    h = h + temb[:, None, :] + sd["pos_embed"]

    for i in range(cfg["depth"]):
        b = f"blocks.{i}"
        y = _lnorm(h, sd, f"{b}.norm1")
        B, N, _ = y.shape
        qkv = _lin(y, sd, f"{b}.attn.qkv").reshape(B, N, 3, heads, dh)
        q, k, v = (qkv.permute(2, 0, 3, 1, 4))[:]
        a = torch.softmax(q @ k.transpose(-2, -1) * dh ** -0.5, dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, d)
        h = h + _lin(o, sd, f"{b}.attn.proj")
        y = _lnorm(h, sd, f"{b}.norm2")
        h = h + _lin(F.gelu(_lin(y, sd, f"{b}.ff.net.0")), sd, f"{b}.ff.net.2")

    h = _lnorm(h, sd, "norm")
    out = _lin(h, sd, "unembed.proj")
    B, N, _ = out.shape
    grid = cfg["img"] // p
    out = out.view(B, grid, grid, cfg["c"], p, p)
    return out.permute(0, 3, 1, 4, 2, 5).reshape(
        B, cfg["c"], cfg["img"], cfg["img"]
    )


def test_dit_conversion_forward_parity():
    sd = _make_dit_sd(CFG)
    gen = torch.Generator().manual_seed(1)
    xt = torch.randn(4, 3, 8, 8, generator=gen)
    xi = torch.randn(4, 3, 8, 8, generator=gen)
    t = torch.rand(4, generator=gen)
    want = _oracle_dit(sd, CFG, xt, t, xi).numpy()

    model = DDDMDiT(
        img_size=CFG["img"], patch_size=CFG["patch"], embed_dim=CFG["dim"],
        depth=CFG["depth"], num_heads=CFG["heads"], time_embed_dim=CFG["tdim"],
        data_format="NCHW", dtype=jnp.float32, attention_impl="xla",
    )
    params = dit_params_from_reference(sd)
    got = model.apply(params, jnp.asarray(xt.numpy()),
                      jnp.asarray(t.numpy()), jnp.asarray(xi.numpy()))
    # sole systematic deviation: LN eps 1e-5 (torch) vs 1e-6 (flax)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _make_mlp_sd(time_dim=32, hidden=64):
    g = torch.Generator().manual_seed(2)
    dims = [2 + 2 + time_dim] + [hidden] * 4 + [2]
    sd = {"tfeat.freq": torch.linspace(1.0, time_dim // 2, time_dim // 2)}
    for i in range(5):
        sd[f"net.{2 * i}.weight"] = _rand(dims[i + 1], dims[i], g=g)
        sd[f"net.{2 * i}.bias"] = _rand(dims[i + 1], g=g)
    return sd


def _oracle_mlp(sd, xt, t, xi):
    f = sd["tfeat.freq"][None, :] * (2.0 * math.pi) * t[:, None]
    h = torch.cat([xt, xi, torch.sin(f), torch.cos(f)], dim=-1)
    for i in range(4):
        h = F.silu(_lin(h, sd, f"net.{2 * i}"))
    return _lin(h, sd, "net.8")


def test_mlp_conversion_forward_parity():
    sd = _make_mlp_sd()
    gen = torch.Generator().manual_seed(3)
    xt = torch.randn(16, 2, generator=gen)
    xi = torch.randn(16, 2, generator=gen)
    t = torch.rand(16, generator=gen)
    want = _oracle_mlp(sd, xt, t, xi).numpy()

    model = DDDMMLP(time_dim=32, hidden=64)
    params = mlp_params_from_reference(sd)
    got = model.apply(params, jnp.asarray(xt.numpy()),
                      jnp.asarray(t.numpy()), jnp.asarray(xi.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mlp_conversion_rejects_custom_frequencies():
    sd = _make_mlp_sd()
    sd["tfeat.freq"] = sd["tfeat.freq"] * 2.0
    with pytest.raises(ValueError, match="linspace"):
        mlp_params_from_reference(sd)


def test_checkpoint_file_roundtrip(tmp_path):
    """model.pt -> scripts/convert_reference_ckpt.py -> generate.py loaders."""
    import sys

    sys.path.insert(0, "scripts")
    try:
        import convert_reference_ckpt as tool
    finally:
        sys.path.pop(0)
    from ddm_tpu.utils.checkpoint import load_params

    sd = _make_dit_sd(CFG)
    config = {
        "image_size": CFG["img"], "patch_size": CFG["patch"],
        "embed_dim": CFG["dim"], "depth": CFG["depth"],
        "heads": CFG["heads"], "time_embed": CFG["tdim"],
        "mlp_ratio": 4.0, "sample_steps": 2, "eps_churn": 0.0,
    }
    src = tmp_path / "model_final.pt"
    torch.save({"model": sd, "config": config}, src)

    dst = tmp_path / "model_final.ckpt"
    tool.main([str(src), str(dst)])

    params, cfg = load_params(str(dst))
    assert cfg["embed_dim"] == CFG["dim"] and cfg["depth"] == CFG["depth"]
    direct = dit_params_from_reference(sd)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(direct)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )

    # the converted checkpoint drives the inference CLI end-to-end
    import generate as gen_cli

    npz = tmp_path / "s.npz"
    gen_cli.main([
        "--ckpt", str(dst), "--n", "2", "--batch", "2", "--steps", "2",
        "--out", "", "--npz", str(npz),
    ])
    assert np.load(npz)["samples"].shape == (2, 8, 8, 3)


def test_bare_state_dict_detection(tmp_path):
    sd = _make_mlp_sd()
    src = tmp_path / "bare.pt"
    torch.save(sd, src)
    variables, cfg = load_reference_checkpoint(str(src))
    assert "Dense_0" in variables["params"] and cfg == {}


def test_pickle_payloads_require_opt_in(tmp_path):
    """weights_only-safe payloads load by default; object-bearing ones
    (the toy path's TrainConfig) demand an explicit allow_pickle=True."""
    import argparse

    sd = _make_mlp_sd()
    src = tmp_path / "toy.pt"
    torch.save({"model": sd, "config": argparse.Namespace(m=8, beta=0.1)}, src)

    with pytest.raises(ValueError, match="allow_pickle"):
        load_reference_checkpoint(str(src))

    variables, cfg = load_reference_checkpoint(str(src), allow_pickle=True)
    assert "Dense_0" in variables["params"]
    assert cfg == {"m": 8, "beta": 0.1}


def test_reverse_conversion_roundtrips_bitwise():
    """torch sd -> ddm_tpu params -> torch sd is exact, both architectures,
    and the tp>1 canonical tree's separate q/k/v re-fuse correctly."""
    from ddm_tpu.utils.convert import (
        reference_state_dict_from_dit,
        reference_state_dict_from_mlp,
        state_dict_to_numpy,
    )

    sd = state_dict_to_numpy(_make_dit_sd(CFG))
    back = reference_state_dict_from_dit(
        dit_params_from_reference(sd), patch_size=CFG["patch"],
        in_channels=2 * CFG["c"], out_channels=CFG["c"],
    )
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    msd = state_dict_to_numpy(_make_mlp_sd())
    mback = reference_state_dict_from_mlp(
        mlp_params_from_reference(msd), time_dim=32
    )
    assert set(mback) == set(msd)
    for k in msd:
        np.testing.assert_array_equal(mback[k], msd[k], err_msg=k)

    # tp>1 canonical tree: separate q/k/v columns re-fuse to the same rows
    params = dit_params_from_reference(sd)
    for i in range(CFG["depth"]):
        attn = params["params"][f"block_{i}"]["attn"]
        wq, wk, wv = np.split(attn["qkv"]["kernel"], 3, axis=1)
        bq, bk, bv = np.split(attn["qkv"]["bias"], 3)
        params["params"][f"block_{i}"]["attn"] = {
            "q": {"kernel": wq, "bias": bq},
            "k": {"kernel": wk, "bias": bk},
            "v": {"kernel": wv, "bias": bv},
            "proj": attn["proj"],
        }
    refused = reference_state_dict_from_dit(
        params, patch_size=CFG["patch"],
        in_channels=2 * CFG["c"], out_channels=CFG["c"],
    )
    for k in sd:
        np.testing.assert_array_equal(refused[k], sd[k], err_msg=k)


@pytest.mark.slow
def test_to_torch_tool_exports_reference_payload(tmp_path):
    """--to-torch: a ddm_tpu .ckpt exports to a reference-format .pt whose
    functional-oracle forward matches the ddm_tpu model."""
    import sys

    sys.path.insert(0, "scripts")
    try:
        import convert_reference_ckpt as tool
    finally:
        sys.path.pop(0)
    from ddm_tpu.utils.checkpoint import save_checkpoint

    model = DDDMDiT(
        img_size=CFG["img"], patch_size=CFG["patch"], embed_dim=CFG["dim"],
        depth=CFG["depth"], num_heads=CFG["heads"], time_embed_dim=CFG["tdim"],
        data_format="NCHW", dtype=jnp.float32, attention_impl="xla",
    )
    xt0 = jnp.zeros((1, 3, 8, 8))
    variables = model.init(jax.random.PRNGKey(7), xt0, jnp.zeros((1,)), xt0)
    config = {"patch_size": CFG["patch"], "embed_dim": CFG["dim"],
              "depth": CFG["depth"], "heads": CFG["heads"],
              "time_embed": CFG["tdim"], "image_size": CFG["img"]}
    src = tmp_path / "run.ckpt"
    save_checkpoint(str(src), variables, config)

    dst = tmp_path / "model.pt"
    tool.main(["--to-torch", str(src), str(dst)])

    payload = torch.load(dst, map_location="cpu", weights_only=True)
    assert payload["config"]["embed_dim"] == CFG["dim"]

    gen = torch.Generator().manual_seed(9)
    xt = torch.randn(2, 3, 8, 8, generator=gen)
    xi = torch.randn(2, 3, 8, 8, generator=gen)
    t = torch.rand(2, generator=gen)
    want = np.asarray(model.apply(variables, jnp.asarray(xt.numpy()),
                                  jnp.asarray(t.numpy()),
                                  jnp.asarray(xi.numpy())))
    got = _oracle_dit(payload["model"], CFG, xt, t, xi).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
