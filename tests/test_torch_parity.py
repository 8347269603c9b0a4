"""Numerical parity vs an independent PyTorch implementation.

The torch model here is written from the reference's *specification*
(SURVEY.md #11-22 math: fused-projection MHA with True=masked -inf
masking, post-LN residuals, DETR sinusoid positions over cumsum of
unmasked entries, interleaved sin/cos decoder position table, padding
masks from the sum==pad quirk, log-softmax head).  Weights are
transplanted from the Flax model; outputs must match to float tolerance
and greedy decode must match token-for-token.
"""

import math

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from openviic_tpu.builders import build_model
from openviic_tpu.decoding import beam_search
from tests.helpers import D_MODEL, HEAD, D_FF, model_config
from tests.test_models_forward import make_batch

DK = D_MODEL // HEAD


# ---------------------------------------------------------------- torch side
class TMha(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.q = torch.nn.Linear(D_MODEL, D_MODEL)
        self.k = torch.nn.Linear(D_MODEL, D_MODEL)
        self.v = torch.nn.Linear(D_MODEL, D_MODEL)
        self.o = torch.nn.Linear(D_MODEL, D_MODEL)
        self.ln = torch.nn.LayerNorm(D_MODEL)

    def forward(self, queries, keys, values, attention_mask=None):
        bs, nq = queries.shape[:2]
        nk = keys.shape[1]
        q = self.q(queries).view(bs, nq, HEAD, DK).permute(0, 2, 1, 3)
        k = self.k(keys).view(bs, nk, HEAD, DK).permute(0, 2, 3, 1)
        v = self.v(values).view(bs, nk, HEAD, DK).permute(0, 2, 1, 3)
        att = torch.matmul(q, k) / math.sqrt(DK)
        if attention_mask is not None:
            att = att.masked_fill(attention_mask, -float("inf"))
        att = torch.softmax(att, -1)
        out = torch.matmul(att, v).permute(0, 2, 1, 3).reshape(bs, nq, D_MODEL)
        out = self.o(out)
        return self.ln(queries + out)


class TFfn(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(D_MODEL, D_FF)
        self.fc2 = torch.nn.Linear(D_FF, D_MODEL)
        self.ln = torch.nn.LayerNorm(D_MODEL)

    def forward(self, x):
        return self.ln(x + self.fc2(torch.relu(self.fc1(x))))


def detr_pos_embedding(x):
    """DETR sinusoid positions (pos_embeddings.py:39-72, no mask)."""
    bs, n = x.shape[:2]
    embed = torch.arange(1, n + 1, dtype=torch.float32).expand(bs, n)
    dim_t = torch.arange(D_MODEL, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / D_MODEL)
    pos = embed[:, :, None] / dim_t
    pos = torch.stack((pos[:, :, 0::2].sin(), pos[:, :, 1::2].cos()), -1)
    return pos.flatten(-2)


def sinusoid_table(max_len):
    pos = torch.arange(max_len, dtype=torch.float32).view(-1, 1)
    dim = torch.arange(D_MODEL // 2, dtype=torch.float32).view(1, -1)
    angle = pos / (10000.0 ** (2 * dim / D_MODEL))
    out = torch.zeros(max_len, D_MODEL)
    out[:, 0::2] = torch.sin(angle)
    out[:, 1::2] = torch.cos(angle)
    out[0] = 0
    return out


class TModel(torch.nn.Module):
    def __init__(self, vocab, layers=2, d_feature=13):
        super().__init__()
        self.vocab = vocab
        self.vis = torch.nn.Linear(d_feature, D_MODEL)
        self.enc_ln = torch.nn.LayerNorm(D_MODEL)
        self.enc_layers = torch.nn.ModuleList(
            [torch.nn.ModuleList([TMha(), TFfn()]) for _ in range(layers)]
        )
        self.emb = torch.nn.Embedding(len(vocab), D_MODEL, padding_idx=0)
        self.pos_table = sinusoid_table(vocab.max_caption_length + 1)
        self.dec_layers = torch.nn.ModuleList(
            [torch.nn.ModuleList([TMha(), TMha(), TFfn()]) for _ in range(layers)]
        )
        self.fc = torch.nn.Linear(D_MODEL, len(vocab), bias=False)

    def encode(self, features):
        pad = (features.sum(-1) == 0)[:, None, None, :]  # sum==pad quirk
        x = self.vis(features)
        out = self.enc_ln(x) + detr_pos_embedding(x)
        for mha, ffn in self.enc_layers:
            out = ffn(mha(out, out, out, pad))
            out = out.masked_fill(pad[:, 0, 0, :, None], 0.0)
        return out, pad

    def decode(self, tokens, memory, mem_mask):
        bs, L = tokens.shape
        pad = (tokens == self.vocab.padding_idx)[:, None, None, :]
        causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)[None, None]
        self_mask = pad | causal
        seq = torch.arange(1, L + 1).expand(bs, L).masked_fill(pad[:, 0, 0, :], 0)
        out = self.emb(tokens) + self.pos_table[seq]
        for self_attn, cross, ffn in self.dec_layers:
            out = self_attn(out, out, out, self_mask)
            out = cross(out, memory, memory, mem_mask)
            out = ffn(out)
            out = out.masked_fill(pad[:, 0, 0, :, None], 0.0)
        return F.log_softmax(self.fc(out), -1)

    def forward(self, features, tokens):
        memory, mem_mask = self.encode(features)
        return self.decode(tokens, memory, mem_mask)


# ---------------------------------------------------------- weight transplant
def transplant(flax_params, tmodel, layers=2):
    p = flax_params["params"]

    def lin(tlin, node):
        tlin.weight.data = torch.tensor(np.asarray(node["kernel"]).T)
        if tlin.bias is not None and "bias" in node:
            tlin.bias.data = torch.tensor(np.asarray(node["bias"]))

    def ln(tln, node):
        tln.weight.data = torch.tensor(np.asarray(node["scale"]))
        tln.bias.data = torch.tensor(np.asarray(node["bias"]))

    def mha(tmha, node):
        att = node["attention"]
        lin(tmha.q, att["fc_q"])
        lin(tmha.k, att["fc_k"])
        lin(tmha.v, att["fc_v"])
        lin(tmha.o, att["fc_o"])
        ln(tmha.ln, node["layer_norm"])

    def ffn(tffn, node):
        lin(tffn.fc1, node["fc1"])
        lin(tffn.fc2, node["fc2"])
        ln(tffn.ln, node["layer_norm"])

    lin(tmodel.vis, p["vision_embedding"]["proj"])
    ln(tmodel.enc_ln, p["encoder"]["layer_norm"])
    for i in range(layers):
        layer = p["encoder"][f"layer_{i}"]
        mha(tmodel.enc_layers[i][0], layer["mhatt"])
        ffn(tmodel.enc_layers[i][1], layer["pwff"])

    dec = p["decoder"]
    tmodel.emb.weight.data = torch.tensor(
        np.asarray(dec["word_emb"]["embedding"]["embedding"])
    )
    for i in range(layers):
        layer = dec[f"layer_{i}"]
        mha(tmodel.dec_layers[i][0], layer["self_attn"])
        mha(tmodel.dec_layers[i][1], layer["enc_attn"])
        ffn(tmodel.dec_layers[i][2], layer["pwff"])
    lin(tmodel.fc, dec["fc"])


@pytest.fixture(scope="module")
def parity_pair(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    tmodel = TModel(tiny_vocab).eval()
    transplant(params, tmodel)
    return model, params, tmodel, batch


def test_teacher_forced_parity(tiny_vocab, parity_pair):
    model, params, tmodel, batch = parity_pair
    jax_out = np.asarray(model.apply(params, batch))
    with torch.no_grad():
        t_out = tmodel(
            torch.tensor(np.asarray(batch["region_features"])),
            torch.tensor(np.asarray(batch["caption_tokens"]), dtype=torch.long),
        ).numpy()
    # padded caption rows are NaN in both (fully later-masked); compare
    # non-pad positions
    tokens = np.asarray(batch["caption_tokens"])
    keep = tokens != tiny_vocab.padding_idx
    np.testing.assert_allclose(
        jax_out[keep], t_out[keep], atol=2e-4,
        err_msg="teacher-forced log-probs diverge from torch reference",
    )


def test_greedy_decode_token_parity(tiny_vocab, parity_pair):
    model, params, tmodel, batch = parity_pair
    vocab = tiny_vocab
    L = vocab.max_caption_length

    # greedy via the jitted beam search (beam=1)
    jax_out, _ = beam_search(model, params, batch, beam_size=1, out_size=1)
    jax_tokens = np.asarray(jax_out)

    # greedy via torch: feed argmax step by step (full-prefix recompute)
    with torch.no_grad():
        features = torch.tensor(np.asarray(batch["region_features"]))
        memory, mem_mask = tmodel.encode(features)
        bs = features.shape[0]
        tokens = torch.full((bs, L), vocab.padding_idx, dtype=torch.long)
        prefix = torch.full((bs, L), vocab.padding_idx, dtype=torch.long)
        prefix[:, 0] = vocab.bos_idx
        finished = torch.zeros(bs, dtype=torch.bool)
        for t in range(L):
            lp = tmodel.decode(prefix, memory, mem_mask)[:, t, :]
            nxt = lp.argmax(-1)
            # after eos, the reference's beam keeps word 0 (<pad>)
            nxt = torch.where(finished, torch.zeros_like(nxt), nxt)
            tokens[:, t] = nxt
            finished |= nxt == vocab.eos_idx
            if t + 1 < L:
                prefix[:, t + 1] = nxt

    # compare up to and including the first eos of each row
    for b in range(jax_tokens.shape[0]):
        row_j, row_t = jax_tokens[b], tokens[b].numpy()
        end = np.argmax(row_j == vocab.eos_idx) if (row_j == vocab.eos_idx).any() else L - 1
        np.testing.assert_array_equal(
            row_j[: end + 1], row_t[: end + 1],
            err_msg=f"greedy tokens diverge at row {b}",
        )
