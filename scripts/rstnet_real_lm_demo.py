"""RSTNet demo with a REAL (pretrained) frozen language model.

VERDICT r4 next #5: the round-4 RSTNet demo used a random-init frozen
LM, so XE collapsed (CIDEr 1.82 -> 0.12) and only SCST rescued it — the
adaptive-decoder *quality* path was never shown healthy.  Offline there
are no PhoBERT weights, so this script manufactures a genuinely
pretrained LM the same way a practitioner would graft the real one:

  1. **MLM-pretrain** the 4-layer RoBERTa stand-in (the exact
     architecture scripts/run_demo_variants.py builds and
     scripts/graft_hf.py grafts through) on the benchmark dataset's own
     captions, tokenized with the SAME repo Vocab the captioner will
     use — the id space the AdaptiveDecoder feeds the backbone
     (models/decoders.py AdaptiveDecoder, reference
     models/language_models.py:11-133).
  2. ``save_pretrained`` it; build the RSTNet trainer from
     configs/tpu/rstnet_fixed.yaml; **graft** the pretrained weights
     into the trainer params via scripts/graft_hf.py's
     ``graft_hf_params`` (identical code path to grafting hub
     phobert-base).
  3. Train XE to patience, then SCST, recording val-loss + dev-CIDEr
     curves; write the record JSON for PERF.md.

Usage:
  python scripts/rstnet_real_lm_demo.py [workdir] [--xe-epochs 14]
      [--scst-epochs 3] [--mlm-steps 1500] [--n-images 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)


def pretrain_mlm(dataset_root: str, out_dir: str, vocab, steps: int,
                 batch: int = 128, seed: int = 0) -> dict:
    """MLM-pretrain the stand-in FlaxRoberta on the dataset captions."""
    import jax
    import jax.numpy as jnp
    import optax
    from transformers import FlaxRobertaForMaskedLM, RobertaConfig

    # same architecture as run_demo_variants.make_local_roberta (the
    # phobert-base shape family at 4 layers)
    cfg = RobertaConfig(
        vocab_size=64001, hidden_size=768, num_hidden_layers=4,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=130, pad_token_id=0,
    )
    model = FlaxRobertaForMaskedLM(cfg, seed=seed)

    # caption id matrix through the captioner's own Vocab (same
    # preprocess -> encode path as FeatureDataset)
    from openviic_tpu.data.preprocess import preprocess_caption

    with open(os.path.join(dataset_root, "train.json")) as f:
        anns = json.load(f)["annotations"]
    ids = np.stack([
        np.asarray(vocab.encode_caption(
            preprocess_caption(a["caption"], vocab.tokenizer)
        ))
        for a in anns
    ]).astype(np.int32)
    pad = vocab.padding_idx
    mask_id = vocab.unk_idx  # no dedicated [MASK]; unk plays that role

    tx = optax.adamw(3e-4, weight_decay=0.01)
    opt_state = tx.init(model.params)

    @jax.jit
    def step(params, opt_state, batch_ids, rng):
        mask_rng, token_rng = jax.random.split(rng)
        is_token = batch_ids != pad
        mlm_mask = (
            jax.random.uniform(mask_rng, batch_ids.shape) < 0.15
        ) & is_token
        inputs = jnp.where(mlm_mask, mask_id, batch_ids)
        attn = is_token.astype(jnp.int32)

        def loss_fn(p):
            logits = model(
                input_ids=inputs, attention_mask=attn, params=p
            ).logits
            logp = jax.nn.log_softmax(logits, axis=-1)
            picked = jnp.take_along_axis(
                logp, batch_ids[..., None], axis=-1
            )[..., 0]
            return -(picked * mlm_mask).sum() / jnp.maximum(
                mlm_mask.sum(), 1
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(seed)
    params = model.params
    losses = []
    order = np.random.default_rng(seed).permutation(len(ids))
    t0 = time.time()
    for it in range(steps):
        lo = (it * batch) % max(len(ids) - batch, 1)
        sel = order[lo: lo + batch]
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids[sel]), sub
        )
        if it % 100 == 0 or it == steps - 1:
            losses.append(float(loss))
            print(f"[mlm {it}] loss={losses[-1]:.4f} "
                  f"t={time.time() - t0:.0f}s", flush=True)
    model.params = jax.device_get(params)
    model.save_pretrained(out_dir)
    return {"mlm_loss_curve": losses, "mlm_steps": steps}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/rstnet_real_lm")
    ap.add_argument("--xe-epochs", type=int, default=14)
    ap.add_argument("--scst-epochs", type=int, default=3)
    ap.add_argument("--mlm-steps", type=int, default=1500)
    ap.add_argument("--n-images", type=int, default=1000)
    ap.add_argument("--no-graft", action="store_true",
                    help="control run: skip the graft (random frozen LM, "
                         "the round-4 collapse condition)")
    args = ap.parse_args()

    work = args.workdir
    dataset = os.path.join(work, "dataset")
    os.makedirs(work, exist_ok=True)

    if not os.path.isfile(os.path.join(dataset, "train.json")):
        from make_realistic_dataset import main as make_ds

        make_ds(dataset, args.n_images)

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.config import get_config

    cfg = get_config(os.path.join(ROOT, "configs", "tpu",
                                  "rstnet_fixed.yaml"))
    d = cfg.DATASET
    d.JSON_PATH._data.update({
        "TRAIN": f"{dataset}/train.json",
        "DEV": f"{dataset}/dev.json",
        "TEST": f"{dataset}/test.json",
    })
    d.FEATURE_PATH._data["FEATURES"] = f"{dataset}/features"
    d._data["WORKERS"] = 0
    cfg.TRAINING._data.update({
        "CHECKPOINT_PATH": os.path.join(work, "runs"),
        "WARMUP": 1000,
        "PATIENCE": 3,
        # bf16 training with the MLM-grafted LM produces a NaN gradient
        # on the first update (loss 8.70 -> nan at step 1, measured
        # round 5; f32 is clean) — train in f32, decode stays guarded
        # bf16.  Tracked in ROADMAP as an open precision interaction.
        "MIXED_PRECISION": False,
    })
    cfg.MODEL._data["NAME"] = "rstnet_real_lm"
    lm_dir = os.path.join(work, "pretrained_lm")
    cfg.MODEL.DECODER.LANGUAGE_MODEL._data["PRETRAINED_NAME"] = lm_dir

    record = {"n_images": args.n_images, "graft": not args.no_graft}

    # pretrain the LM BEFORE building the trainer: the trainer's backbone
    # adapter reads the saved config (AutoConfig local_files_only) at
    # construction, so the checkpoint must exist first or the shapes
    # (max_position_embeddings) diverge and the graft refuses
    if not os.path.isfile(os.path.join(lm_dir, "config.json")):
        from openviic_tpu.data.vocab import Vocab

        vocab = Vocab(cfg.DATASET)
        record.update(
            pretrain_mlm(dataset, lm_dir, vocab, args.mlm_steps)
        )

    trainer = build_trainer(cfg)

    if not args.no_graft:
        from graft_hf import graft_hf_params

        trainer.state["params"] = graft_hf_params(
            trainer.state["params"], lm_dir
        )
        print("grafted pretrained LM into trainer params", flush=True)

    t0 = time.time()
    xe_curve, cider_curve = [], []
    for epoch in range(args.xe_epochs):
        trainer.epoch = epoch
        trainer.train()
        val = float(trainer.evaluate_loss(trainer.val_dataloader))
        xe_curve.append(val)
        scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
        cider_curve.append(float(scores["CIDEr"]))
        print(f"[xe epoch {epoch}] val_loss={val:.4f} "
              f"dev_cider={cider_curve[-1]:.4f} "
              f"t={time.time() - t0:.0f}s", flush=True)
    record["xe_val_loss"] = xe_curve
    record["xe_dev_cider"] = cider_curve

    if args.scst_epochs:
        trainer.use_rl = True
        trainer._ensure_scst()
        scst_cider = []
        for e in range(args.scst_epochs):
            trainer.epoch = args.xe_epochs + e
            trainer.train_scst()
            scores = trainer.evaluate_metrics(trainer.val_dict_dataloader)
            scst_cider.append(float(scores["CIDEr"]))
            print(f"[scst epoch {e}] dev_cider={scst_cider[-1]:.4f} "
                  f"t={time.time() - t0:.0f}s", flush=True)
        record["scst_dev_cider"] = scst_cider

    test_scores = trainer.evaluate_metrics(trainer.test_dict_dataloader)
    record["test_scores"] = {k: float(v) for k, v in test_scores.items()}
    record["wall_s"] = round(time.time() - t0, 1)
    out = os.path.join(work, "record.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record, indent=2))
    print("record written to", out)


if __name__ == "__main__":
    main()
