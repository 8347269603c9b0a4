"""Generate a synthetic dataset with REFERENCE-LIKE text statistics.

The round-4 verdict's top gap: every trained comparison used vocab 47,
captions <=10 tokens, 1.33 refs/image, while the reference task (UIT-
OpenViIC, data_utils/vocab.py:32-36,88-95 + configs/
standard_transformer.yaml) is vocab ~10^4, captions to ~25 tokens,
~5 refs/image.  This generator closes that gap with a compositional
scene grammar:

 - Each image has a latent scene: 9 attribute slots (subject, subject
   modifier, action, object, object modifier, place, place modifier,
   time, manner), each drawn from its own inventory with a ZIPFIAN
   popularity distribution — head items recur across the corpus, tail
   items are rare/singleton, exactly the unigram statistics of a real
   caption corpus.
 - Each inventory item has 2-3 surface forms ("synonyms") of 1-2
   syllable tokens, so the ~5 references per image are PARAPHRASTIC:
   same scene, different synonym choices, different sentence template.
   Observed vocab lands >=5k types (printed; tune --inventory if not).
 - Sentence templates are Vietnamese-glued multi-clause frames
   producing 15-25 token captions (lengths printed).
 - Region features carry the scene: for each slot, 2.0x the item's
   embedding vector is added to a random subset of the image's regions,
   plus a per-image Gaussian mixture of ALL the slot's item vectors at
   std ``--noise`` (the distractor construction of make_tiny_dataset
   --noise).  A Bayes-optimal linear readout therefore recovers each
   slot with accuracy < 1 for noise > 0; the script prints the per-slot
   oracle accuracy AND the oracle-decode CIDEr per split (the dataset
   ceiling a perfect model could reach), so difficulty is calibrated
   before any training run.

Everything is deterministic from --seed; the dataset is regenerated on
demand (features are NOT committed — .gitignore).

Usage:
  python scripts/make_realistic_dataset.py realistic_dataset \
      --n-images 2300 --noise 0.55
  python scripts/make_realistic_dataset.py realistic_small \
      --n-images 500 --noise 0.55     # SCST side-by-side scale
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# -- Vietnamese-like syllable inventory (onset x rhyme x tone marks) ----
_ONSETS = ["b", "c", "ch", "d", "g", "gh", "h", "kh", "l", "m", "n",
           "ng", "nh", "ph", "qu", "r", "s", "t", "th", "tr", "v", "x"]
_RHYMES = ["a", "ai", "am", "an", "ang", "anh", "ao", "au", "ay", "e",
           "em", "en", "eo", "i", "ia", "iem", "ien", "inh", "o", "oa",
           "oi", "om", "on", "ong", "u", "ua", "ui", "un", "ung", "uong",
           "uy", "y"]
_TONES = ["", "1", "2", "3", "4", "5"]

# real Vietnamese glue words used by the templates (the closed class)
_SLOT_NAMES = ["subject", "subj_mod", "action", "object", "obj_mod",
               "place", "place_mod", "time", "manner"]


def _syllable_pool(rng: np.random.Generator):
    """Unique token generator: all onset x rhyme x tone combos, then
    (shuffled) concatenated pairs — effectively unbounded."""
    base = [o + r + t for o in _ONSETS for r in _RHYMES for t in _TONES]
    rng.shuffle(base)
    yield from base
    n = len(base)
    # all n^2 ordered pairs, enumerated diagonal-by-diagonal (each
    # (i, (i+d) mod n) pair is distinct across d in [0, n)) — the base
    # shuffle already randomizes the surface forms
    for d in range(n):
        for i in range(n):
            yield base[i] + base[(i + d) % n]


def _build_inventories(rng: np.random.Generator, inventory: int):
    """Per-slot item inventories; each item = 2-3 surface forms of 1-2
    unique tokens.  All tokens globally unique across slots/items."""
    pool = iter(_syllable_pool(rng))
    slots = {}
    for slot in _SLOT_NAMES:
        items = []
        for _ in range(inventory):
            n_syn = int(rng.integers(2, 4))  # 2-3 synonyms
            surfaces = []
            for _ in range(n_syn):
                n_tok = int(rng.integers(1, 3))  # 1-2 tokens
                surfaces.append(" ".join(next(pool) for _ in range(n_tok)))
            items.append(surfaces)
        slots[slot] = items
    return slots


# English glue variants of the same frames (--lang en): the enTrainer
# row (VERDICT r4 next #9) needs an English-task dataset so the PTB
# tokenization path is exercised end-to-end.  Content tokens are the
# same synthetic surfaces; only the closed-class glue changes.
_TEMPLATES_EN = [
    ("a {subject} {subj_mod} is {action} a {object} {obj_mod} "
     "at the {place} {place_mod} during {time} in a {manner} way ."),
    ("during {time} at the {place} {place_mod} there is a {subject} "
     "{subj_mod} {action} a {object} {obj_mod} , very {manner} ."),
    ("the photo shows a {subject} {subj_mod} {action} "
     "a {object} {obj_mod} at the {place} {place_mod} in {time} , "
     "looking quite {manner} ."),
    ("you can see a {subject} {subj_mod} {action} a {object} "
     "{obj_mod} rather {manner} near the {place} {place_mod} in {time} ."),
    ("at the {place} {place_mod} during {time} a {subject} {subj_mod} "
     "is {action} a {object} {obj_mod} , extremely {manner} ."),
    ("a {object} {obj_mod} is being {action} by a {subject} {subj_mod} "
     "at the {place} {place_mod} during {time} , truly {manner} ."),
]

# sentence frames: {x} slots get item surfaces; glue is real Vietnamese.
# Each frame yields 15-25 tokens with 1-2-token surfaces.
_TEMPLATES = [
    ("một {subject} {subj_mod} đang {action} một {object} {obj_mod} "
     "ở {place} {place_mod} vào {time} một cách {manner}"),
    ("vào {time} tại {place} {place_mod} có một {subject} {subj_mod} "
     "đang {action} một {object} {obj_mod} rất {manner}"),
    ("bức ảnh chụp cảnh một {subject} {subj_mod} {action} "
     "một {object} {obj_mod} ở {place} {place_mod} lúc {time} "
     "trông thật {manner}"),
    ("có thể thấy một {subject} {subj_mod} {action} một {object} "
     "{obj_mod} một cách {manner} gần {place} {place_mod} vào {time}"),
    ("ở {place} {place_mod} vào {time} một {subject} {subj_mod} "
     "đang {action} một {object} {obj_mod} hết sức {manner}"),
    ("một {object} {obj_mod} đang được một {subject} {subj_mod} "
     "{action} tại {place} {place_mod} vào {time} thật là {manner}"),
]


def _realize(template: str, scene: dict, slots: dict,
             rng: np.random.Generator, syn_choice: dict = None) -> str:
    fills = {}
    for slot in _SLOT_NAMES:
        surfaces = slots[slot][scene[slot]]
        if syn_choice is not None:
            idx = syn_choice[slot] % len(surfaces)
        else:
            idx = int(rng.integers(len(surfaces)))
        fills[slot] = surfaces[idx]
    return template.format(**fills)


def main(root: str = "realistic_dataset", n_images: int = 2300,
         seed: int = 0, inventory: int = 250, noise: float = 0.55,
         refs_lo: int = 4, refs_hi: int = 6, d_feature: int = 1024,
         zipf_a: float = 1.15, quiet: bool = False,
         grids: bool = False, d_grid: int = 1024,
         lang: str = "vi") -> dict:
    templates = _TEMPLATES_EN if lang == "en" else _TEMPLATES
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "features"), exist_ok=True)
    slots = _build_inventories(np.random.default_rng(seed + 1), inventory)

    # Zipfian item popularity per slot: fixed random permutation of
    # ranks, sampled via bounded zipf rejection
    def draw_item(slot_rng) -> int:
        while True:
            z = slot_rng.zipf(zipf_a)
            if z <= inventory:
                return int(z) - 1

    scene_rng = np.random.default_rng(seed + 2)
    scenes = []
    for _ in range(n_images):
        scenes.append(
            {slot: draw_item(scene_rng) for slot in _SLOT_NAMES}
        )

    # annotations: 4-6 paraphrastic refs per image, each a different
    # (template, synonym-choice) realization
    text_rng = np.random.default_rng(seed + 3)
    ids = list(range(n_images))
    splits = {
        "train": ids[: int(n_images * 0.87)],
        "dev": ids[int(n_images * 0.87): int(n_images * 0.935)],
        "test": ids[int(n_images * 0.935):],
    }
    captions = {}  # image_id -> list[str]
    for i in ids:
        n_refs = int(text_rng.integers(refs_lo, refs_hi + 1))
        t_order = text_rng.permutation(len(templates))
        caps = []
        for r in range(n_refs):
            tpl = templates[t_order[r % len(templates)]]
            caps.append(_realize(tpl, scenes[i], slots, text_rng))
        captions[i] = caps
    for name, split_ids in splits.items():
        data = {
            "images": [
                {"id": i, "file_name": f"img_{i}.jpg"} for i in split_ids
            ],
            "annotations": [
                {"image_id": i, "caption": c}
                for i in split_ids for c in captions[i]
            ],
        }
        with open(os.path.join(root, f"{name}.json"), "w") as f:
            json.dump(data, f, ensure_ascii=False)

    # -- features: slot-item embeddings + distractor mixture ------------
    emb_rng = np.random.default_rng(seed + 4)
    embs = {
        slot: (emb_rng.normal(size=(inventory, d_feature))
               / np.sqrt(d_feature)).astype(np.float32)
        for slot in _SLOT_NAMES
    }
    noise_rng = np.random.default_rng(seed + 5)
    # per-image, per-slot distractor coefficients over the whole inventory
    noise_w = {
        slot: noise_rng.normal(
            scale=max(noise, 1e-12), size=(n_images, inventory)
        ).astype(np.float32)
        for slot in _SLOT_NAMES
    }
    # optional grid stream (--grids, for DLCT/dual-stream runs): its OWN
    # slot-embedding tables and an INDEPENDENT distractor realization, so
    # the two streams carry complementary evidence about the same scene —
    # an architecture that fuses both genuinely beats a one-stream readout
    if grids:
        gemb_rng = np.random.default_rng(seed + 7)
        grid_embs = {
            slot: (gemb_rng.normal(size=(inventory, d_grid))
                   / np.sqrt(d_grid)).astype(np.float32)
            for slot in _SLOT_NAMES
        }
        gnoise_rng = np.random.default_rng(seed + 8)
        grid_noise_w = {
            slot: gnoise_rng.normal(
                scale=max(noise, 1e-12), size=(n_images, inventory)
            ).astype(np.float32)
            for slot in _SLOT_NAMES
        }
        grid_boxes = np.stack(
            [
                np.tile(np.arange(7), 7) / 7,
                np.repeat(np.arange(7), 7) / 7,
                (np.tile(np.arange(7), 7) + 1) / 7,
                (np.repeat(np.arange(7), 7) + 1) / 7,
            ],
            axis=-1,
        ).astype(np.float32)

    feat_rng = np.random.default_rng(seed + 6)
    for i in ids:
        n_regions = int(feat_rng.integers(12, 36))
        boxes = feat_rng.uniform(0, 1, size=(n_regions, 4)).astype(np.float32)
        boxes[:, 2:] = np.minimum(
            boxes[:, :2] + 0.05 + boxes[:, 2:] * 0.4, 1.0
        )
        region = feat_rng.normal(size=(n_regions, d_feature)).astype(
            np.float32
        )
        for slot in _SLOT_NAMES:
            # the slot's signal lands on a random ~half of the regions
            mask = feat_rng.uniform(size=n_regions) < 0.5
            if not mask.any():
                mask[int(feat_rng.integers(n_regions))] = True
            sig = 2.0 * embs[slot][scenes[i][slot]] \
                + noise_w[slot][i] @ embs[slot]
            region[mask] += sig
        payload = {"region_features": region, "region_boxes": boxes}
        if grids:
            grid = feat_rng.normal(size=(49, d_grid)).astype(np.float32)
            for slot in _SLOT_NAMES:
                gmask = feat_rng.uniform(size=49) < 0.5
                if not gmask.any():
                    gmask[int(feat_rng.integers(49))] = True
                gsig = 2.0 * grid_embs[slot][scenes[i][slot]] \
                    + grid_noise_w[slot][i] @ grid_embs[slot]
                grid[gmask] += gsig
            payload["grid_features"] = grid
            payload["grid_boxes"] = grid_boxes
        np.save(
            os.path.join(root, "features", f"{i}.npy"),
            payload,
            allow_pickle=True,
        )

    # -- stats + oracle calibration --------------------------------------
    all_caps = [c for i in ids for c in captions[i]]
    toks = [c.split() for c in all_caps]
    vocab = set(itertools.chain.from_iterable(toks))
    lens = np.array([len(t) for t in toks])
    n_refs_arr = np.array([len(captions[i]) for i in ids])
    stats = {
        "n_images": n_images,
        "vocab_types": len(vocab),
        "caption_len_mean": float(lens.mean()),
        "caption_len_p5": int(np.percentile(lens, 5)),
        "caption_len_p95": int(np.percentile(lens, 95)),
        "refs_per_image_mean": float(n_refs_arr.mean()),
    }

    # oracle: argmax over the exact per-slot coefficient vector
    # 2*e_true + noise_w (the least-squares readout recovers this up to
    # vanishing cross-talk); a slot hit = recovering the true item.
    oracle_item = {
        slot: np.argmax(
            noise_w[slot]
            + 2.0 * np.eye(inventory, dtype=np.float32)[
                [scenes[i][slot] for i in ids]
            ],
            axis=1,
        )
        for slot in _SLOT_NAMES
    }
    slot_acc = {
        slot: float(np.mean(
            oracle_item[slot] == np.array([scenes[i][slot] for i in ids])
        ))
        for slot in _SLOT_NAMES
    }
    stats["oracle_slot_accuracy_mean"] = float(
        np.mean(list(slot_acc.values()))
    )

    # oracle CIDEr: decode each image with the recovered slots using the
    # first template + first synonym, score against its refs
    from openviic_tpu.evaluation import Cider

    oracle_cider = {}
    for name, split_ids in splits.items():
        gens, gts = {}, {}
        for i in split_ids:
            dec_scene = {
                slot: int(oracle_item[slot][i]) for slot in _SLOT_NAMES
            }
            syn0 = {slot: 0 for slot in _SLOT_NAMES}
            gens[str(i)] = [
                _realize(templates[0], dec_scene, slots, text_rng, syn0)
            ]
            gts[str(i)] = captions[i]
        oracle_cider[name] = round(
            float(Cider().compute_score(gts, gens)[0]), 4
        )
    stats["oracle_cider"] = oracle_cider

    # perfect-knowledge decode (true slots, same single template/synonym)
    # = the ceiling surface-variation alone imposes
    gens, gts = {}, {}
    for i in splits["dev"]:
        syn0 = {slot: 0 for slot in _SLOT_NAMES}
        gens[str(i)] = [
            _realize(templates[0], scenes[i], slots, text_rng, syn0)
        ]
        gts[str(i)] = captions[i]
    stats["perfect_knowledge_dev_cider"] = round(
        float(Cider().compute_score(gts, gens)[0]), 4
    )

    if not quiet:
        print(f"realistic dataset written to {root}/")
        for k, v in stats.items():
            print(f"  {k}: {v}")
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump({**stats, "seed": seed, "noise": noise,
                   "inventory": inventory, "zipf_a": zipf_a}, f, indent=2)
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root", nargs="?", default="realistic_dataset")
    ap.add_argument("--n-images", type=int, default=2300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--inventory", type=int, default=250)
    ap.add_argument("--noise", type=float, default=0.55)
    ap.add_argument("--zipf-a", type=float, default=1.15)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--grids", action="store_true",
                    help="also emit a 49-cell grid stream (DLCT runs)")
    ap.add_argument("--d-grid", type=int, default=1024)
    ap.add_argument("--lang", choices=["vi", "en"], default="vi")
    a = ap.parse_args()
    main(a.root, a.n_images, a.seed, inventory=a.inventory, noise=a.noise,
         zipf_a=a.zipf_a, quiet=a.quiet, grids=a.grids, d_grid=a.d_grid,
         lang=a.lang)
