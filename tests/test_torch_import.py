"""Torch checkpoint importer tests.

Builds a state_dict with the *reference's* key naming (derived from its
module definitions — models/modules/attentions.py, encoders.py,
decoders.py, standard_stransformer.py), converts, and checks the
converted model's forward agrees with the independent torch
implementation from test_torch_parity."""

import jax
import numpy as np
import pytest
import torch

from openviic_tpu.builders import build_model
from openviic_tpu.compat import convert_torch_state_dict
from tests.helpers import model_config
from tests.test_models_forward import make_batch


def reference_named_state_dict(vocab, layers=2, d_model=16, d_ff=32, d_feature=13):
    """Random weights under the reference's state_dict key names."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(dout, generator=g) * 0.01

    def ln(prefix, d):
        sd[f"{prefix}.weight"] = torch.rand(d, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(d, generator=g) * 0.01

    def mha(prefix):
        for p in ("fc_q", "fc_k", "fc_v", "fc_o"):
            lin(f"{prefix}.attention.{p}", d_model, d_model)
        ln(f"{prefix}.layer_norm", d_model)

    def pwff(prefix):
        lin(f"{prefix}.fc1", d_model, d_ff)
        lin(f"{prefix}.fc2", d_ff, d_model)
        ln(f"{prefix}.layer_norm", d_model)

    lin("vision_embedding.proj", d_feature, d_model)
    ln("encoder.layer_norm", d_model)
    for i in range(layers):
        mha(f"encoder.layers.{i}.mhatt")
        pwff(f"encoder.layers.{i}.pwff")

    sd["decoder.word_emb.components.weight"] = (
        torch.randn(len(vocab), d_model, generator=g) * 0.1
    )
    for i in range(layers):
        mha(f"decoder.layers.{i}.self_attn")
        mha(f"decoder.layers.{i}.enc_attn")
        pwff(f"decoder.layers.{i}.pwff")
    lin("decoder.fc", d_model, len(vocab), bias=False)
    # reference-only buffers that must be skipped
    sd["decoder.running_mask_self_attention"] = torch.zeros(1, 1, 0)
    sd["decoder.running_seq"] = torch.zeros(1)
    return sd


def test_convert_reference_state_dict(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    template = model.init(jax.random.PRNGKey(0), batch)

    sd = reference_named_state_dict(tiny_vocab)
    params, missing, unused = convert_torch_state_dict(sd, template)
    assert missing == [], f"unconverted params: {missing}"
    assert unused == [], f"unmatched reference keys: {unused}"

    # forward must agree with the independent torch mirror carrying the
    # same weights
    from tests.test_torch_parity import TModel

    tmodel = TModel(tiny_vocab).eval()
    # load the same reference-named weights into the torch mirror
    remap = {}
    for i in range(2):
        for a, b in (
            (f"encoder.layers.{i}.mhatt", f"enc_layers.{i}.0"),
            (f"encoder.layers.{i}.pwff", f"enc_layers.{i}.1"),
            (f"decoder.layers.{i}.self_attn", f"dec_layers.{i}.0"),
            (f"decoder.layers.{i}.enc_attn", f"dec_layers.{i}.1"),
            (f"decoder.layers.{i}.pwff", f"dec_layers.{i}.2"),
        ):
            remap[a] = b
    t_sd = {}
    for key, value in sd.items():
        if key.startswith("decoder.running"):
            continue
        new = key
        for a, b in remap.items():
            if key.startswith(a + "."):
                new = b + key[len(a):]
                break
        new = (
            new.replace("vision_embedding.proj", "vis")
            .replace("encoder.layer_norm", "enc_ln")
            .replace("decoder.word_emb.components", "emb")
            .replace("decoder.fc", "fc")
            .replace(".attention.fc_q", ".q")
            .replace(".attention.fc_k", ".k")
            .replace(".attention.fc_v", ".v")
            .replace(".attention.fc_o", ".o")
            .replace(".layer_norm", ".ln")
        )
        t_sd[new] = value
    tmodel.load_state_dict(t_sd)

    jax_out = np.asarray(model.apply(params, batch))
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(np.asarray(batch["region_features"])),
            torch.tensor(np.asarray(batch["caption_tokens"]), dtype=torch.long),
        ).numpy()
    tokens = np.asarray(batch["caption_tokens"])
    keep = tokens != tiny_vocab.padding_idx
    np.testing.assert_allclose(jax_out[keep], t_out[keep], atol=2e-4)


def test_convert_meshed_and_geometry_families(tiny_vocab):
    """MeshedDecoder fc_alphas + geometric fc_gs clone stacking convert."""
    cfg = model_config(
        architecture="ObjectRelationTransformer",
        encoder="GeometricEncoder",
        enc_attention="AugmentedGeometryScaledDotProductAttention",
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    template = model.init(jax.random.PRNGKey(0), batch)

    # synthesize only the fc_gs clones; everything else falls back
    sd = {}
    import jax as _jax

    h = 2
    d_g = 16 // 2
    g = torch.Generator().manual_seed(1)
    for j in range(h):
        sd[f"encoder.fc_gs.{j}.weight"] = torch.randn(1, d_g, generator=g)
        sd[f"encoder.fc_gs.{j}.bias"] = torch.randn(1, generator=g)
    params, missing, unused = convert_torch_state_dict(sd, template)
    assert unused == []
    kernel = np.asarray(
        params["params"]["encoder"]["fc_gs"]["kernel"]
    )
    for j in range(h):
        np.testing.assert_allclose(
            kernel[:, j], sd[f"encoder.fc_gs.{j}.weight"].numpy()[0], atol=1e-6
        )
