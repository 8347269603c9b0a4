"""Beam-search consistency for the non-standard decoders/architectures.

For each variant: the cached step-decode must agree with the teacher-forced
forward on the same prefix (validates meshed per-level cross caches, DLCT
merged masks, adaptive language-signal steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openviic_tpu.builders import build_model
from openviic_tpu.config import ConfigNode
from openviic_tpu.decoding import beam_search
from openviic_tpu.models.base import make_decode_cache
from tests.helpers import attention_config, model_config, D_MODEL
from tests.test_models_forward import make_batch


def _check_step_vs_teacher_forced(model, params, batch, vocab, atol=1e-4):
    bs = 2
    L = vocab.max_caption_length
    rng = np.random.default_rng(3)
    tokens = np.full((bs, L), vocab.padding_idx, np.int32)
    tokens[:, 0] = vocab.bos_idx
    n_real = 4
    tokens[:, 1 : 1 + n_real] = rng.integers(4, len(vocab), size=(bs, n_real))

    memory, memory_mask = model.apply(params, batch, method=model.encoder_forward)
    tf_out = model.apply(params, dict(batch, caption_tokens=jnp.asarray(tokens)))

    cache = make_decode_cache(model.config.DECODER, vocab, bs)
    cache = model.apply(params, cache, memory, method=model.prepare_cache)
    for t in range(n_real + 1):
        tok_t = jnp.asarray(tokens[:, t : t + 1])
        step_lp, cache = model.apply(
            params, t, tok_t, cache, memory_mask, method=model.decode_step
        )
        np.testing.assert_allclose(
            np.asarray(step_lp), np.asarray(tf_out[:, t, :]), atol=atol,
            err_msg=f"step {t}",
        )


def test_meshed_decoder_step_consistency(tiny_vocab):
    cfg = model_config(
        architecture="MeshedMemoryTransformer",
        encoder="MultilevelEncoder",
        decoder="MeshedDecoder",
        enc_attention="AugmentedMemoryScaledDotProductAttention",
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    _check_step_vs_teacher_forced(model, params, batch, tiny_vocab)
    outs, lps = beam_search(model, params, batch, beam_size=3, out_size=3)
    assert outs.shape == (2, 3, tiny_vocab.max_caption_length)
    assert np.isfinite(np.asarray(lps)).all()


def test_dlct_transformer_beam_search(tiny_vocab):
    cfg = model_config(architecture="DLCTTransformer")
    cfg.MODEL if False else None
    cfg = ConfigNode(cfg.to_dict())
    cfg._data["VISION_EMBEDDING"] = ConfigNode(
        {
            "ARCHITECTURE": "GeometricDualFeatureEmbedding",
            "D_REGION_FEATURE": 13,
            "D_GRID_FEATURE": 11,
            "D_MODEL": D_MODEL,
            "DROPOUT": 0.1,
        }
    )
    cfg._data["ENCODER"] = ConfigNode(
        {
            "ARCHITECTURE": "DualCollaborativeLevelEncoder",
            "D_MODEL": D_MODEL,
            "LAYERS": 2,
            "HEAD": 2,
            "TRIGNOMETRIC_EMBEDDING": True,
            "SELF_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
            "CROSS_ATTENTION": attention_config(
                "AugmentedGeometryScaledDotProductAttention"
            ),
        }
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    _check_step_vs_teacher_forced(model, params, batch, tiny_vocab)
    outs, _ = beam_search(model, params, batch, beam_size=2, out_size=1)
    caps = tiny_vocab.decode_caption(np.asarray(outs))
    assert len(caps) == 2


def test_adaptive_decoder_beam_search(tiny_vocab):
    cfg = model_config(decoder="AdaptiveDecoder")
    dec = cfg.DECODER
    dec._data["ADAPTIVE_ATTENTION"] = ConfigNode(
        {
            "SELF_ATTENTION": attention_config(
                "AdaptiveScaledDotProductAttention", can_be_stateful=True
            ),
            "ENC_ATTENTION": attention_config("AdaptiveScaledDotProductAttention"),
        }
    )
    dec._data["LANGUAGE_MODEL"] = ConfigNode(
        {
            "ARCHITECTURE": "PhoBERTModel",
            "HIDDEN_SIZE": 16,
            "D_MODEL": D_MODEL,
            "MAX_LEN": tiny_vocab.max_caption_length,
            "VOCAB_SIZE": len(tiny_vocab),
            "PADDING_IDX": tiny_vocab.padding_idx,
            "BACKBONE_LAYERS": 1,
            "BACKBONE_HEADS": 2,
            "ATTENTION": attention_config(),
        }
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)

    # NOTE: adaptive decode steps feed the LM only the current token (the
    # reference's stateful behavior, decoders.py:216), while teacher-forced
    # runs it over the full sequence — so step-vs-forward parity does not
    # hold for this decoder by design.  Check decode runs and is finite.
    outs, lps = beam_search(model, params, batch, beam_size=2, out_size=1)
    assert outs.shape == (2, tiny_vocab.max_caption_length)
    assert np.isfinite(np.asarray(lps)).all()

    # round-4 serving fast path: the step LM sees only the current token,
    # so a precomputed (vocab, d) signal table + gather is EXACT — decode
    # must be token- and logprob-identical with the table supplied
    table = model.apply(params, method=model.compute_language_table)
    assert table.shape == (len(tiny_vocab), D_MODEL)
    outs_t, lps_t = beam_search(
        model, params, batch, beam_size=2, out_size=1, language_table=table
    )
    np.testing.assert_array_equal(np.asarray(outs), np.asarray(outs_t))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_t), atol=1e-6)

    # non-adaptive models have no table (serving gates on the arch name)
    from openviic_tpu.builders import build_model as _bm

    std = _bm(model_config(), tiny_vocab)
    std_params = std.init(jax.random.PRNGKey(0), batch)
    assert std.apply(
        std_params, method=std.compute_language_table
    ) is None


# ------------------------------------------------- beam-resident decode
@pytest.mark.parametrize(
    "arch,encoder,decoder,attn",
    [
        ("StandardTransformerUsingRegion", "Encoder", "Decoder",
         "ScaledDotProductAttention"),
        ("MeshedMemoryTransformer", "MultilevelEncoder", "MeshedDecoder",
         "AugmentedMemoryScaledDotProductAttention"),
    ],
    ids=["standard", "m2"],
)
def test_beam_resident_matches_default(tiny_vocab, arch, encoder, decoder, attn):
    """The no-gather beam-resident path (ancestry one-hot select inside the
    attention, dedup cross K/V, fused hierarchical selection) must be
    token-identical to the default path."""
    cfg = model_config(
        architecture=arch, encoder=encoder, decoder=decoder, enc_attention=attn
    )
    model = build_model(cfg, tiny_vocab)
    for seed in range(3):
        batch = make_batch(tiny_vocab, bs=3, seed=seed)
        params = model.init(jax.random.PRNGKey(seed), batch)
        feats = {"region_features": batch["region_features"]}
        ref_o, ref_l = beam_search(model, params, feats, beam_size=5, out_size=5)
        got_o, got_l = beam_search(
            model, params, feats, beam_size=5, out_size=5, beam_resident=True
        )
        np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), atol=1e-5)


def test_unrolled_decode_matches_default(tiny_vocab):
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=3)
    params = model.init(jax.random.PRNGKey(0), batch)
    feats = {"region_features": batch["region_features"]}
    ref_o, ref_l = beam_search(model, params, feats, beam_size=5, out_size=5)
    # full unroll (static t every step) and partial unroll (k steps per
    # while_loop body, early exit at k-step granularity; both measured
    # slower than the plain while_loop on hardware — scripts/bench_unroll.py
    # — but kept gated for reproducibility) must stay token-identical
    for unroll in (True, 4, 7):
        got_o, got_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            beam_resident=True, unroll=unroll,
        )
        np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), atol=1e-5
        )


def test_resident_kernel_matches_beam_resident(tiny_vocab):
    """The fused Pallas layer kernel (interpret mode on CPU) vs the XLA
    beam-resident path.  The kernel rounds the q*k products through bf16
    (resident_layer_step.py numerics note), so rare near-tie token flips
    are possible at tiny scale — require high agreement + close scores,
    and bound the per-step layer outputs instead of exact tokens."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    rows = total = 0
    for seed in range(3):
        batch = make_batch(tiny_vocab, bs=3, seed=seed)
        params = model.init(jax.random.PRNGKey(seed), batch)
        feats = {"region_features": batch["region_features"]}
        ref_o, ref_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, beam_resident=True,
        )
        got_o, got_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, resident_kernel=True,
        )
        eq = (np.asarray(got_o) == np.asarray(ref_o)).all(-1)
        rows += int(eq.sum())
        total += eq.size
        # scores of agreeing rows match tightly; disagreeing rows must be
        # near-ties (the two paths found equally-scored beams)
        mask = eq[..., None]
        diff = np.abs(np.asarray(got_l) - np.asarray(ref_l)) * mask
        assert diff.max() < 0.05
        seq_got = np.asarray(got_l).sum(-1)
        seq_ref = np.asarray(ref_l).sum(-1)
        np.testing.assert_allclose(seq_got, seq_ref, atol=0.3)
    assert rows / total > 0.5, f"row agreement {rows}/{total}"


def test_head_kernel_matches_fast_select(tiny_vocab):
    """ops/head_topk.py (fused vocab head + lse + top-k): token-exact vs
    the XLA fast-select path in interpret mode (the kernel rounds logits
    through bf16 exactly like the XLA fc materialisation)."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    for seed in range(3):
        batch = make_batch(tiny_vocab, bs=3, seed=seed)
        params = model.init(jax.random.PRNGKey(seed), batch)
        feats = {"region_features": batch["region_features"]}
        ref_o, ref_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, beam_resident=True,
        )
        got_o, got_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, head_kernel=True,
        )
        np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), atol=1e-5
        )


def test_head_kernel_with_return_probs_falls_back(tiny_vocab):
    """return_probs needs the full per-step distributions, which the fused
    head+top-k kernel never materialises — the flag must silently fall
    back to the materialising path (regression: this combination used to
    hit an unbound variable at trace time)."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=2, seed=0)
    params = model.init(jax.random.PRNGKey(0), batch)
    feats = {"region_features": batch["region_features"]}
    ref_o, ref_l, ref_p = beam_search(
        model, params, feats, beam_size=3, out_size=3, return_probs=True,
    )
    got_o, got_l, got_p = beam_search(
        model, params, feats, beam_size=3, out_size=3, return_probs=True,
        head_kernel=True,
    )
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p), atol=1e-5)


def test_beam_search_multi_matches_single(tiny_vocab):
    """beam_search_multi (N independent streams fused into one while_loop
    for cross-batch op interleaving) must be token-identical to running
    beam_search on each batch separately."""
    from openviic_tpu.decoding.beam_search import beam_search_multi

    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batches = []
    params = None
    for seed in range(3):
        batch = make_batch(tiny_vocab, bs=2 + seed, seed=seed)
        if params is None:
            params = model.init(jax.random.PRNGKey(0), batch)
        batches.append({"region_features": batch["region_features"]})

    refs = [
        beam_search(
            model, params, b, beam_size=5, out_size=5, beam_resident=True
        )
        for b in batches
    ]
    multi = jax.jit(
        lambda p, bs: beam_search_multi(model, p, bs, beam_size=5, out_size=5)
    )(params, batches)
    assert len(multi) == len(refs)
    for (ref_o, ref_l), (got_o, got_l) in zip(refs, multi):
        np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), atol=1e-5
        )


def test_head_topk_blocked_matches_single_block():
    """ops/head_topk.py row-blocked grid variant: identical outputs to the
    single-block kernel, including a ragged N that needs row padding."""
    from openviic_tpu.ops.head_topk import head_topk

    rng = np.random.default_rng(0)
    D, V, k = 64, 777, 5
    w = jnp.asarray(rng.normal(size=(D, V)), jnp.float32)
    for N in (16, 40):  # 40 % 16 != 0 exercises the pad-rows path
        x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        ref = head_topk(x, w, k=k, tile=256)
        got = head_topk(x, w, k=k, tile=256, block_rows=16)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]))


def test_head_topk_auto_blocks_past_vmem_budget(monkeypatch):
    """head_topk(block_rows=None) auto-selects the row-blocked variant when
    the single-block logits scratch would exceed the VMEM budget, so
    head_kernel=True keeps working at any batch size."""
    import openviic_tpu.ops.head_topk as ht

    rng = np.random.default_rng(1)
    D, V, k, N = 64, 777, 5, 48
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(D, V)), jnp.float32)
    ref = ht.head_topk(x, w, k=k, tile=256)
    # shrink the budget so this N crosses it; auto block must kick in and
    # stay output-identical (block 16 divides nothing about N=48 raggedly,
    # but the pad path is covered by the blocked test above)
    monkeypatch.setattr(ht, "_AUTO_BLOCK_SCRATCH_BYTES", 1)
    monkeypatch.setattr(ht, "_AUTO_BLOCK_ROWS", 16)
    got = ht.head_topk(x, w, k=k, tile=256)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]))


def test_head_kernel_int_selects_blocked_variant(tiny_vocab):
    """beam_search(head_kernel=<int>) routes through the row-blocked kernel
    and stays token-identical to head_kernel=True."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=3, seed=0)
    params = model.init(jax.random.PRNGKey(0), batch)
    feats = {"region_features": batch["region_features"]}
    ref_o, ref_l = beam_search(
        model, params, feats, beam_size=5, out_size=5,
        compute_dtype=jnp.bfloat16, head_kernel=True,
    )
    got_o, got_l = beam_search(
        model, params, feats, beam_size=5, out_size=5,
        compute_dtype=jnp.bfloat16, head_kernel=8,
    )
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), atol=1e-5)


def _beam_select_reference(q_t, k, v, ancestry, position_mask, mask_axis):
    """The XLA einsum math of attend_projected_beam_select, pre-output
    projection (models/attention.py) — the golden for the Pallas kernel."""
    b_s, n_beams, L = ancestry.shape
    h, d_k = q_t.shape[2], q_t.shape[3]
    d_v = v.shape[3]
    qb = q_t.reshape(b_s, n_beams, h, d_k).astype(jnp.float32)
    kb = k.reshape(b_s, n_beams, L, h, d_k).astype(jnp.float32)
    vb = v.reshape(b_s, n_beams, L, h, d_v).astype(jnp.float32)
    att = jnp.einsum("bqhd,bpLhd->bqpLh", qb, kb) / jnp.sqrt(
        jnp.asarray(d_k, jnp.float32)
    )
    onehot = (
        ancestry[:, :, None, :]
        == jnp.arange(n_beams, dtype=ancestry.dtype)[None, None, :, None]
    )
    if mask_axis == "p":
        not_masked = ~position_mask.reshape(b_s, 1, n_beams, L)
    else:
        not_masked = ~position_mask.reshape(b_s, n_beams, 1, L)
    live = jnp.logical_and(onehot, not_masked)
    att = jnp.where(live[..., None], att, -jnp.inf)
    att = jax.nn.softmax(att.reshape(b_s, n_beams, n_beams * L, h), axis=2)
    att = att.reshape(b_s, n_beams, n_beams, L, h)
    out = jnp.einsum("bqpLh,bpLhd->bqhd", att, vb)
    return out.reshape(b_s * n_beams, 1, h, d_v)


@pytest.mark.parametrize("mask_axis", ["p", "q"])
def test_beam_select_attention_kernel_matches_einsum(mask_axis):
    """ops/beam_select_attention.py: the fused QK+select+softmax+PV kernel
    reproduces the XLA einsum path (incl. multi-block grids and a ragged
    image count that forces a non-default block size)."""
    from openviic_tpu.ops.beam_select_attention import beam_select_attention

    rng = np.random.default_rng(7)
    for b_s, beam, L, h, d_k, d_v, block in (
        (3, 5, 7, 2, 4, 4, 1),   # multi-block, b_s prime
        (4, 3, 6, 2, 4, 8, 2),   # d_v != d_k
        (2, 5, 9, 4, 8, 8, None),  # auto block
    ):
        N = b_s * beam
        q_t = jnp.asarray(rng.normal(size=(N, 1, h, d_k)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(N, L, h, d_k)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(N, L, h, d_v)), jnp.float32)
        anc = jnp.asarray(rng.integers(0, beam, size=(b_s, beam, L)), jnp.int32)
        # mask everything past a per-row length, plus scattered pads;
        # position 0 always live
        pmask = rng.random((N, L)) < 0.3
        pmask[:, 0] = False
        pmask = jnp.asarray(pmask).reshape(N, 1, 1, L)
        ref = _beam_select_reference(q_t, k, v, anc, pmask, mask_axis)
        got = beam_select_attention(
            q_t, k, v, anc, pmask, mask_axis=mask_axis, block_images=block
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )


def test_attn_kernel_matches_beam_resident(tiny_vocab):
    """beam_search(attn_kernel=True) — the fused beam-select attention
    step kernel — stays token-identical to the XLA beam-resident path."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    for seed in range(3):
        batch = make_batch(tiny_vocab, bs=3, seed=seed)
        params = model.init(jax.random.PRNGKey(seed), batch)
        feats = {"region_features": batch["region_features"]}
        ref_o, ref_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, beam_resident=True,
        )
        got_o, got_l = beam_search(
            model, params, feats, beam_size=5, out_size=5,
            compute_dtype=jnp.bfloat16, attn_kernel=True,
        )
        np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(ref_l), atol=1e-5
        )


def test_attn_kernel_composes_with_head_kernel(tiny_vocab):
    """attn_kernel + head_kernel together (the tuned-config fast path)."""
    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=2, seed=1)
    params = model.init(jax.random.PRNGKey(1), batch)
    feats = {"region_features": batch["region_features"]}
    ref_o, ref_l = beam_search(
        model, params, feats, beam_size=5, out_size=5,
        compute_dtype=jnp.bfloat16, head_kernel=True,
    )
    got_o, got_l = beam_search(
        model, params, feats, beam_size=5, out_size=5,
        compute_dtype=jnp.bfloat16, head_kernel=True, attn_kernel=True,
    )
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), atol=1e-5)


def test_head_kernel_auto_gate():
    """BeamSearcher(head_kernel=True) resolves per call: the fused kernel
    only engages inside its measured win region (PERF.md round 3 —
    beam 5 from 480 rows, beam 3 from 960, never at beam 1); an int value
    (row-blocked variant) is a forced override."""
    from openviic_tpu.decoding.beam_search import (
        BeamSearcher,
        _head_kernel_wins,
    )

    assert _head_kernel_wins(96, 5) and _head_kernel_wins(320, 5)
    assert not _head_kernel_wins(64, 5)  # 320 rows
    assert _head_kernel_wins(320, 3) and not _head_kernel_wins(64, 3)
    assert not _head_kernel_wins(512, 1) and not _head_kernel_wins(4096, 1)

    s = BeamSearcher(model=None, head_kernel=True)
    feats_small = {"x": np.zeros((2, 1))}
    feats_big = {"x": np.zeros((96, 1))}
    assert s._effective_head_kernel(feats_small, 5) is False
    assert s._effective_head_kernel(feats_big, 5) is True
    forced = BeamSearcher(model=None, head_kernel=64)
    assert forced._effective_head_kernel(feats_small, 5) == 64
    off = BeamSearcher(model=None, head_kernel=False)
    assert off._effective_head_kernel(feats_big, 5) is False


def test_pallas_kernels_disabled_on_sharded_batch(tiny_vocab):
    """A dp-mesh-sharded decode batch must not route through the Pallas
    kernel paths: Mosaic custom calls have no SPMD partitioning rule, so
    on a real multi-chip mesh the jit would fail to compile (interpret
    mode on this CPU mesh hides that).  The searcher must fall back to
    the XLA fast path for sharded calls while keeping the kernel for
    single-device ones (trainer._decode_loader mixes both: full batches
    shard, ragged final batches fall back to one device)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from openviic_tpu.decoding.beam_search import (
        BeamSearcher,
        _batch_spans_devices,
    )

    cfg = model_config()
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab, bs=4, seed=0)
    params = model.init(jax.random.PRNGKey(0), batch)
    feats = {"region_features": batch["region_features"]}
    assert not _batch_spans_devices(feats)

    searcher = BeamSearcher(model, compute_dtype=jnp.bfloat16, head_kernel=8)
    ref_o, _ = searcher(params, feats, beam_size=5, out_size=5)
    assert {k[3] for k in searcher._compiled} == {8}  # kernel engaged

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = jax.device_put(feats, NamedSharding(mesh, P("data")))
    assert _batch_spans_devices(sharded)
    got_o, _ = searcher(params, sharded, beam_size=5, out_size=5)
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))
    # the sharded call compiled a separate kernel-free program
    assert {k[3] for k in searcher._compiled} == {8, False}


def test_onehot_gather_requests_highest_precision():
    """_gather_beams_onehot must contract at Precision.HIGHEST: at the
    TPU default the MXU routes f32 through bf16 passes, rounding integer
    payloads >256 (measured 7095->7104) — which pushed sampled token ids
    past the vocab bound in the round-5 realistic-vocab SCST run.  The
    rounding only manifests on TPU, so this regression pins the
    precision request in the jaxpr (exactness itself is asserted too —
    trivially true on CPU, load-bearing on TPU)."""
    import jax
    import numpy as np

    from openviic_tpu.decoding.beam_search import _gather_beams_onehot

    ids = jnp.asarray(
        np.array([[7095, 7097, 6404], [123, 4567, 7001]], np.int32)[..., None]
    )  # (bs=2, beam=3, 1)
    sel = jnp.asarray(np.array([[2, 0, 1], [1, 1, 0]], np.int32))
    out = np.asarray(_gather_beams_onehot(ids, sel))
    expect = np.take_along_axis(np.asarray(ids), sel[..., None], axis=1)
    np.testing.assert_array_equal(out, expect)

    jaxpr = jax.make_jaxpr(_gather_beams_onehot)(ids, sel)
    dots = [
        e for e in jaxpr.jaxpr.eqns if e.primitive.name in
        ("dot_general", "einsum")
    ]
    assert dots, "gather no longer lowers to a contraction?"
    for e in dots:
        prec = e.params.get("precision")
        assert prec is not None and "HIGHEST" in str(prec), (
            f"one-hot gather contraction must request HIGHEST precision, "
            f"got {prec}"
        )


def test_adaptive_decoder_token_mode_step_parity(tiny_vocab):
    """SIGNAL_MODE: token — per-token language signals in BOTH training
    and decode, so step-vs-teacher-forced parity HOLDS for the adaptive
    decoder (round 5).  In the default "prefix" mode it cannot: the
    reference trains on full-sequence signals whose bidirectional
    backbone reads future tokens, while its step path feeds the LM one
    token (decoders.py:216) — a model trained that way decodes garbage
    (val_loss 1.34 / dev CIDEr 0.0001 measured on the round-5 RSTNet
    demo before this mode existed)."""
    cfg = model_config(decoder="AdaptiveDecoder")
    dec = cfg.DECODER
    dec._data["ADAPTIVE_ATTENTION"] = ConfigNode(
        {
            "SELF_ATTENTION": attention_config(
                "AdaptiveScaledDotProductAttention", can_be_stateful=True
            ),
            "ENC_ATTENTION": attention_config("AdaptiveScaledDotProductAttention"),
        }
    )
    dec._data["LANGUAGE_MODEL"] = ConfigNode(
        {
            "SIGNAL_MODE": "token",
            "ARCHITECTURE": "PhoBERTModel",
            "HIDDEN_SIZE": 16,
            "D_MODEL": D_MODEL,
            "MAX_LEN": tiny_vocab.max_caption_length,
            "VOCAB_SIZE": len(tiny_vocab),
            "PADDING_IDX": tiny_vocab.padding_idx,
            "BACKBONE_LAYERS": 1,
            "BACKBONE_HEADS": 2,
            "ATTENTION": attention_config(),
        }
    )
    model = build_model(cfg, tiny_vocab)
    batch = make_batch(tiny_vocab)
    params = model.init(jax.random.PRNGKey(0), batch)
    _check_step_vs_teacher_forced(model, params, batch, tiny_vocab)
    # the language-table fast path stays exact in token mode too
    table = model.apply(params, method=model.compute_language_table)
    outs, lps = beam_search(model, params, batch, beam_size=2, out_size=1)
    outs_t, lps_t = beam_search(
        model, params, batch, beam_size=2, out_size=1, language_table=table
    )
    np.testing.assert_array_equal(np.asarray(outs), np.asarray(outs_t))
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lps_t), atol=1e-6)
