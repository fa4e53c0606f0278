"""HybridViT model tests: shape contract, determinism/train-mode behavior,
and golden numeric parity vs the reference PyTorch implementation (imported
read-only from /root/reference as an oracle; weights are transplanted)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
    HybridViT,
    count_parameters,
    create_hybrid_vit,
)

SMALL = dict(
    encoder_channels=(8, 16, 32),
    embed_dim=64,
    num_heads=4,
    num_layers=2,
    decoder_channels=(32, 16, 8, 1),
    max_patches=1000,
)


def _init(model, shape=(1, 257, 64, 1), train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=train,
    )
    return variables, x


def test_shape_contract():
    model = HybridViT(**SMALL)
    variables, _ = _init(model)
    for t in (64, 100, 128):
        x = jnp.ones((2, 257, t, 1), jnp.float32)
        y = model.apply(variables, x, train=False)
        assert y.shape == (2, 257, t, 1)
        assert np.all(np.abs(np.asarray(y)) <= 1.0)  # Tanh head


def test_eval_deterministic():
    model = HybridViT(**SMALL)
    variables, x = _init(model)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 257, 64, 1)),
                    jnp.float32)
    y1 = model.apply(variables, x, train=False)
    y2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_train_mode_updates_batch_stats():
    model = HybridViT(**SMALL)
    variables, _ = _init(model)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 257, 64, 1)),
                    jnp.float32)
    y, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_param_count_default_config():
    model = create_hybrid_vit()
    variables, _ = _init(model, shape=(1, 257, 64, 1))
    counts = count_parameters(variables)
    # SURVEY.md §6: 28.45M actual with default config
    assert 28_000_000 < counts["total"] < 29_000_000, counts


def test_cls_token_path():
    model = HybridViT(use_cls_token=True, **SMALL)
    variables, x = _init(model)
    y = model.apply(variables, jnp.ones((1, 257, 64, 1)), train=False)
    assert y.shape == (1, 257, 64, 1)


def test_return_attentions():
    model = HybridViT(**SMALL)
    variables, _ = _init(model)
    x = jnp.ones((1, 257, 64, 1), jnp.float32)
    y, attns = model.apply(variables, x, train=False, return_attentions=True)
    assert y.shape == (1, 257, 64, 1)
    assert len(attns) == SMALL["num_layers"]
    n = attns[0].shape[-1]
    assert attns[0].shape == (1, SMALL["num_heads"], n, n)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(attns[0], axis=-1)), 1.0, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Golden parity vs the reference torch model
# ---------------------------------------------------------------------------


def _torch_reference_model(cfg):
    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from models.hybrid_vit import HybridViT as TorchHybridViT

    kw = {k: v for k, v in cfg.items() if k != "max_patches"}
    kw["encoder_channels"] = list(kw["encoder_channels"])
    kw["decoder_channels"] = list(kw["decoder_channels"])
    model = TorchHybridViT(
        dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0, **kw
    )
    model.eval()
    return model, torch


def _transplant(torch_model, variables):
    """Copy torch weights into the flax param tree (NCHW->NHWC transposes)."""
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    out = {}
    consumed = set()

    def conv_w(w):  # [O,I,kh,kw] -> [kh,kw,I,O]
        return np.transpose(w, (2, 3, 1, 0))

    def dense_w(w):  # [O,I] -> [I,O]
        return np.transpose(w, (1, 0))

    for key in flat:
        parts = key.split("/")
        coll, path = parts[0], parts[1:]
        name = None
        if coll == "params":
            p = "/".join(path)
            if p.startswith("encoder_"):
                i = int(path[0].split("_")[1])
                if path[1] == "Conv_0":
                    name, tr = f"encoder.{i}.block.0.weight", conv_w
                else:  # BatchNorm_0 scale/bias
                    leaf = {"scale": "weight", "bias": "bias"}[path[2]]
                    name, tr = f"encoder.{i}.block.1.{leaf}", None
            elif p.startswith("patch_embed"):
                leaf = path[-1]
                name = f"patch_embed.projection.{'weight' if leaf=='kernel' else 'bias'}"
                tr = conv_w if leaf == "kernel" else None
            elif p.startswith("pos_encoding"):
                name, tr = "pos_encoding.pos_embed", None
            elif p.startswith("transformer/block_"):
                i = int(path[1].split("_")[1])
                sub = path[2]
                leaf = path[-1]
                if sub in ("norm1", "norm2"):
                    tname = {"scale": "weight", "bias": "bias"}[leaf]
                    name, tr = f"transformer.blocks.{i}.{sub}.{tname}", None
                elif sub == "attn":
                    which = {"Dense_0": "qkv", "Dense_1": "proj"}[path[3]]
                    tname = "weight" if leaf == "kernel" else "bias"
                    name = f"transformer.blocks.{i}.attn.{which}.{tname}"
                    tr = dense_w if leaf == "kernel" else None
                elif sub == "mlp":
                    which = {"Dense_0": "net.0", "Dense_1": "net.3"}[path[3]]
                    tname = "weight" if leaf == "kernel" else "bias"
                    name = f"transformer.blocks.{i}.mlp.{which}.{tname}"
                    tr = dense_w if leaf == "kernel" else None
            elif p.startswith("transformer/norm"):
                tname = {"scale": "weight", "bias": "bias"}[path[-1]]
                name, tr = f"transformer.norm.{tname}", None
            elif p.startswith("to_feature_map"):
                tname = "weight" if path[-1] == "kernel" else "bias"
                name = f"to_feature_map.{tname}"
                tr = dense_w if path[-1] == "kernel" else None
            elif p.startswith("skip_proj_"):
                i = int(path[0].split("_")[2])
                tname = "weight" if path[-1] == "kernel" else "bias"
                name = f"skip_projections.{i}.{tname}"
                tr = conv_w if path[-1] == "kernel" else None
            elif p.startswith("decoder_"):
                i = int(path[0].split("_")[1])
                # torch decoder block layer index: upsample shifts conv/bn
                up = [1, 2, 2, 1][i] if len(path) else 1
                conv_idx = 1 if up > 1 else 0
                if path[1] == "Conv_0":
                    name, tr = f"decoder.{i}.block.{conv_idx}.weight", conv_w
                else:
                    leaf = {"scale": "weight", "bias": "bias"}[path[2]]
                    name, tr = f"decoder.{i}.block.{conv_idx+1}.{leaf}", None
        elif coll == "batch_stats":
            leaf = {"mean": "running_mean", "var": "running_var"}[path[-1]]
            if path[0].startswith("encoder_"):
                i = int(path[0].split("_")[1])
                name, tr = f"encoder.{i}.block.1.{leaf}", None
            elif path[0].startswith("decoder_"):
                i = int(path[0].split("_")[1])
                up = [1, 2, 2, 1][i]
                conv_idx = 1 if up > 1 else 0
                name, tr = f"decoder.{i}.block.{conv_idx+1}.{leaf}", None
        assert name is not None, f"unmapped param {key}"
        assert name in sd, f"{name} not in torch state dict ({key})"
        consumed.add(name)
        w = sd[name]
        w = tr(w) if tr else w
        assert w.shape == flat[key].shape, (key, name, w.shape, flat[key].shape)
        out[key] = jnp.asarray(w)
    # every torch weight must have been consumed (num_batches_tracked is a
    # torch-BN step counter with no flax counterpart)
    remaining = {
        n for n in sd if not n.endswith("num_batches_tracked")
    } - consumed
    assert not remaining, f"torch weights never transplanted: {sorted(remaining)}"
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in out.items()}
    )


@pytest.mark.parametrize("t_frames", [64, 100])
def test_parity_vs_reference_torch(t_frames):
    cfg = dict(SMALL, max_patches=10000)  # reference hardcodes 10000
    torch_model, torch = _torch_reference_model(cfg)
    model = HybridViT(
        dropout=0.0, attn_dropout=0.0, drop_path_rate=0.0,
        use_pallas_attention=False, **cfg
    )
    variables, _ = _init(model, shape=(1, 257, t_frames, 1))
    variables = _transplant(torch_model, variables)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1, 257, t_frames)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    y = model.apply(variables, x_nhwc, train=False)
    y_nchw = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y_nchw, ref, atol=2e-4, rtol=1e-3)


def test_linear_attention_variant():
    """EfficientAttention wired as a first-class option (the reference
    defines it but never uses it, models/attention.py:307-373)."""
    model = HybridViT(attention_type="linear", **SMALL)
    variables, _ = _init(model)
    x = jnp.ones((1, 257, 64, 1), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 257, 64, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_remat_matches_non_remat():
    """remat=True (block rematerialization) must be numerically invisible:
    same forward output and same gradients, just less live memory."""
    import jax
    import optax

    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )

    kw = dict(
        encoder_channels=(4, 8, 16),
        embed_dim=32,
        num_heads=4,
        num_layers=2,
        decoder_channels=(16, 8, 4, 1),
        dropout=0.0,
        attn_dropout=0.0,
        drop_path_rate=0.0,
        max_patches=2000,
        use_pallas_attention=False,
    )
    m0 = create_hybrid_vit(**kw, remat=False)
    m1 = create_hybrid_vit(**kw, remat=True)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 257, 64, 1)), jnp.float32
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v0 = m0.init(rngs, x, train=False)
    v1 = m1.init(rngs, x, train=False)
    chex = pytest.importorskip("chex")
    chex.assert_trees_all_equal(v0["params"], v1["params"])

    def loss(model, variables, x):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.mean(jnp.abs(out))
        return jax.value_and_grad(f)(variables["params"])

    l0, g0 = jax.jit(lambda v, x: loss(m0, v, x))(v0, x)
    l1, g1 = jax.jit(lambda v, x: loss(m1, v, x))(v1, x)
    assert np.isclose(float(l0), float(l1), atol=1e-6)
    n0 = float(optax.global_norm(g0))
    n1 = float(optax.global_norm(g1))
    assert np.isclose(n0, n1, rtol=1e-5), (n0, n1)


def test_factory_maps_tpu_config_keys():
    """create_hybrid_vit must honor tpu.use_pallas_attention and
    model.transformer.remat from the merged config dict."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )

    cfg = {
        "model": {"transformer": {"remat": True}},
        "tpu": {"use_pallas_attention": True},
    }
    m = create_hybrid_vit(cfg)
    assert m.use_pallas_attention is True
    assert m.remat is True
    m2 = create_hybrid_vit({})
    assert m2.use_pallas_attention is False and m2.remat is False


# ---------------- factored 2-D positional embedding ----------------


def test_factored_pos_embed_forward_and_factory():
    """pos_embed_type='factored_2d' replaces the flat i*w+j table with
    freq[i]+time[j] tables (bucket-width-invariant valid-patch embeddings)."""
    model = HybridViT(pos_embed_type="factored_2d", **SMALL)
    variables, _ = _init(model)
    p = variables["params"]["pos_encoding"]
    assert set(p) == {"pos_embed_freq", "pos_embed_time"}
    y = model.apply(variables, jnp.ones((2, 257, 100, 1), jnp.float32),
                    train=False)
    assert y.shape == (2, 257, 100, 1)
    m2 = create_hybrid_vit(
        {"model": {"transformer": {"pos_embed": "factored_2d"}}}
    )
    assert m2.pos_embed_type == "factored_2d"
    assert create_hybrid_vit({}).pos_embed_type == "learned_1d"


def test_factored_pos_embed_bucket_width_invariant():
    """The embedding added to valid patch (i, j) must not depend on the
    padded grid width w — the property the reference's 1-D table lacks."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        PositionalEncoding2D,
    )

    mod = PositionalEncoding2D(
        embed_dim=16, max_freq_patches=8, max_time_patches=32, dropout=0.0
    )
    h, w1, w2 = 4, 6, 10
    vs = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, h * w1, 16)), (h, w1))
    small = np.asarray(
        mod.apply(vs, jnp.zeros((1, h * w1, 16)), (h, w1))
    ).reshape(h, w1, 16)
    big = np.asarray(
        mod.apply(vs, jnp.zeros((1, h * w2, 16)), (h, w2))
    ).reshape(h, w2, 16)[:, :w1, :]
    np.testing.assert_array_equal(small, big)
    # (the 1-D table's lack of this invariance is covered by
    # test_enhance_parity.py's cross-bucket delta assertions)


def test_factored_pos_embed_exceeding_table_raises():
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        PositionalEncoding2D,
    )

    mod = PositionalEncoding2D(embed_dim=8, max_freq_patches=2,
                               max_time_patches=4, dropout=0.0)
    with pytest.raises(ValueError, match="patch grid"):
        mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 3 * 4, 8)), (3, 4))


def test_unknown_pos_embed_type_raises():
    model = HybridViT(pos_embed_type="rotary", **SMALL)
    with pytest.raises(ValueError, match="pos_embed_type"):
        _init(model)


def test_large_nfft_factored_2d_freq_table_derived():
    """create_hybrid_vit must size the factored-2d frequency table from the
    config's STFT geometry: n_fft=4096 gives a 128-row freq patch grid
    (2049 bins -> pools /4 -> 512 -> patch /4 -> 128), which the old
    hardcoded 64-row table rejected at init (ADVICE r2 #3)."""
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )

    cfg = {
        "audio": {"n_fft": 4096},
        "model": {
            "encoder": {"channels": [4, 8, 16], "pool_sizes": [2, 2, 1]},
            "transformer": {
                "embed_dim": 32, "num_heads": 2, "num_layers": 1,
                "pos_embed": "factored_2d", "dropout": 0.0,
                "attention_dropout": 0.0, "drop_path_rate": 0.0,
            },
            "decoder": {"channels": [16, 8, 4, 1]},
        },
    }
    model = create_hybrid_vit(cfg)
    assert model.max_freq_patches == 128
    f_bins = 4096 // 2 + 1
    x = jnp.zeros((1, f_bins, 32, 1), jnp.float32)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    assert vs["params"]["pos_encoding"]["pos_embed_freq"].shape[0] == 128
    out = model.apply(vs, x, train=False)
    assert out.shape == x.shape


def test_sinusoidal_pos_embed_variant():
    """pos_embed: sinusoidal is a fixed (parameter-free) table on the 1-D
    path — selectable from config/CLI alongside learned_1d/factored_2d."""
    import jax
    import jax.numpy as jnp
    from speech_enhancement_via_hybrid_vision_transformer_project_tpu.models import (
        create_hybrid_vit,
    )

    model = create_hybrid_vit(
        {"model": {"encoder": {"channels": [4, 8, 16], "dropout": 0.0},
                   "transformer": {"embed_dim": 32, "num_heads": 2,
                                    "num_layers": 1, "pos_embed": "sinusoidal",
                                    "attention_dropout": 0.0,
                                    "drop_path_rate": 0.0},
                   "decoder": {"channels": [16, 8, 4, 1]}}}
    )
    x = jnp.zeros((1, 257, 64, 1), jnp.float32)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    # no positional parameters: the sinusoidal table is a constant
    assert "pos_encoding" not in vs["params"]
    y = model.apply(vs, x, train=False)
    assert y.shape == x.shape and jnp.isfinite(y).all()
