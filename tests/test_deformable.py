"""Deformable-DETR tower parity vs transformers oracles: ResNet backbone,
sine position embeddings, and the multi-scale deformable encoder."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from videollamb_tpu.models.vision.deformable import (  # noqa: E402
    DeformableConfig,
    deformable_encode,
    encoder_layer,
    encoder_reference_points,
    init_deformable_params,
    resnet_features,
    sine_position_embedding,
)


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_sine_position_embedding_matches_hf():
    from transformers.models.deformable_detr.modeling_deformable_detr import (
        DeformableDetrSinePositionEmbedding,
    )

    d = 32
    mod = DeformableDetrSinePositionEmbedding(d // 2, normalize=True)
    pix = torch.zeros(1, 3, 6, 9)
    mask = torch.ones(1, 6, 9, dtype=torch.long)
    ref = mod(pix, mask)[0].numpy()
    ours = np.asarray(sine_position_embedding(6, 9, d))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _tiny_hf_encoder():
    from transformers import DeformableDetrConfig
    from transformers.models.deformable_detr.modeling_deformable_detr import (
        DeformableDetrEncoder,
    )

    hf_cfg = DeformableDetrConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_feature_levels=2, encoder_n_points=3,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    enc = DeformableDetrEncoder(hf_cfg).eval()
    # Perturb the zero-init offset/weight kernels so sampling is exercised.
    for layer in enc.layers:
        torch.nn.init.normal_(layer.self_attn.sampling_offsets.weight, std=0.1)
        torch.nn.init.normal_(layer.self_attn.attention_weights.weight, std=0.1)
    cfg = DeformableConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_feature_levels=2, encoder_n_points=3,
    )
    return hf_cfg, enc, cfg


def _port_encoder_layer(hf_layer):
    def lin(mod):
        return {"kernel": _t2j(mod.weight).T, "bias": _t2j(mod.bias)}

    def ln(mod):
        return {"scale": _t2j(mod.weight), "bias": _t2j(mod.bias)}

    return {
        "self_attn": {
            "sampling_offsets": lin(hf_layer.self_attn.sampling_offsets),
            "attention_weights": lin(hf_layer.self_attn.attention_weights),
            "value_proj": lin(hf_layer.self_attn.value_proj),
            "output_proj": lin(hf_layer.self_attn.output_proj),
        },
        "self_attn_layer_norm": ln(hf_layer.self_attn_layer_norm),
        "fc1": lin(hf_layer.fc1),
        "fc2": lin(hf_layer.fc2),
        "final_layer_norm": ln(hf_layer.final_layer_norm),
    }


def test_deformable_encoder_matches_hf():
    hf_cfg, enc, cfg = _tiny_hf_encoder()
    shapes = [(4, 6), (2, 3)]
    q = sum(h * w for h, w in shapes)
    b = 2
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(b, q, cfg.d_model)).astype(np.float32)
    pos = rng.normal(size=(b, q, cfg.d_model)).astype(np.float32)

    spatial = torch.tensor(shapes, dtype=torch.long)
    level_start = torch.tensor([0, shapes[0][0] * shapes[0][1]], dtype=torch.long)
    valid = torch.ones(b, len(shapes), 2)
    with torch.no_grad():
        out = enc(
            inputs_embeds=torch.from_numpy(hidden),
            attention_mask=None,
            position_embeddings=torch.from_numpy(pos),
            spatial_shapes=spatial,
            spatial_shapes_list=shapes,
            level_start_index=level_start,
            valid_ratios=valid,
        ).last_hidden_state.numpy()

    params = [_port_encoder_layer(l) for l in enc.layers]
    refs = jnp.broadcast_to(
        encoder_reference_points(shapes),
        (b,) + encoder_reference_points(shapes).shape[1:],
    )
    h = jnp.asarray(hidden)
    for lp in params:
        h = encoder_layer(lp, cfg, h, jnp.asarray(pos), refs, shapes)
    np.testing.assert_allclose(np.asarray(h), out, rtol=3e-4, atol=3e-4)


def test_resnet_backbone_matches_hf():
    from transformers import ResNetConfig
    from transformers.models.resnet.modeling_resnet import ResNetBackbone

    hf_cfg = ResNetConfig(
        embedding_size=8, hidden_sizes=[16, 32, 64, 128], depths=[1, 1, 2, 1],
        layer_type="bottleneck", out_features=["stage2", "stage3", "stage4"],
    )
    torch.manual_seed(1)
    bb = ResNetBackbone(hf_cfg).eval()
    sd = bb.state_dict()

    def conv(name):
        return {"kernel": _t2j(sd[name + ".weight"])}

    def bn(name):
        return {"scale": _t2j(sd[name + ".weight"]), "bias": _t2j(sd[name + ".bias"]),
                "mean": _t2j(sd[name + ".running_mean"]),
                "var": _t2j(sd[name + ".running_var"])}

    stages = []
    for si, depth in enumerate(hf_cfg.depths):
        layers = []
        for li in range(depth):
            pre = f"encoder.stages.{si}.layers.{li}"
            layer = {
                "conv0": conv(pre + ".layer.0.convolution"),
                "bn0": bn(pre + ".layer.0.normalization"),
                "conv1": conv(pre + ".layer.1.convolution"),
                "bn1": bn(pre + ".layer.1.normalization"),
                "conv2": conv(pre + ".layer.2.convolution"),
                "bn2": bn(pre + ".layer.2.normalization"),
            }
            if f"{pre}.shortcut.convolution.weight" in sd:
                layer["shortcut"] = {"conv": conv(pre + ".shortcut.convolution"),
                                     "bn": bn(pre + ".shortcut.normalization")}
            layers.append(layer)
        stages.append(layers)
    params = {
        "embed_conv": conv("embedder.embedder.convolution"),
        "embed_bn": bn("embedder.embedder.normalization"),
        "stages": stages,
    }
    cfg = DeformableConfig(
        backbone_embed_channels=8, backbone_depths=(1, 1, 2, 1),
        backbone_channels=(16, 32, 64, 128), backbone_out=(1, 2, 3),
    )
    pix = np.random.default_rng(2).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = bb(torch.from_numpy(pix)).feature_maps
    ours = resnet_features(params, jnp.asarray(pix), cfg)
    assert len(ours) == len(ref) == 3
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=2e-4, atol=2e-4)


def test_deformable_tower_end_to_end_shapes():
    # One encoder layer: the e2e shape check doesn't need depth, and every
    # extra layer adds ~60 s of CPU jit compile.
    cfg = DeformableConfig(
        d_model=32, encoder_layers=1, encoder_attention_heads=4,
        encoder_ffn_dim=64, num_feature_levels=3, encoder_n_points=2,
        backbone_embed_channels=8, backbone_depths=(1, 1, 1, 1),
        backbone_channels=(16, 32, 64, 128), backbone_out=(2, 3),
    )
    params = init_deformable_params(jax.random.PRNGKey(0), cfg)
    pix = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64))
    states = deformable_encode(params, pix, cfg)
    assert len(states) == cfg.encoder_layers + 1
    # Levels: 64/16=4 -> stage3 8x8? geometry: stages reduce 4,8,16,32;
    # out stages (2,3) give 4x4 and 2x2, extra level 1x1 -> 16+4+1 = 21.
    assert states[-1].shape == (1, 21, 32)
    assert np.isfinite(np.asarray(states[-1])).all()


def test_deformable_factory_dispatch():
    from videollamb_tpu.models.vision.builder import resolve_tower

    assert resolve_tower("deformable-detr").kind == "deformable"
