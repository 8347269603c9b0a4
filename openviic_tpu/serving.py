"""Batch captioning inference pipeline.

The reference has no serving layer (its CLI only runs test-set evaluation,
train.py:17); this module adds one: load a trained checkpoint + vocab,
stream feature files through the jitted beam-search decoder at a fixed
batch size, and emit captions.  Designed for throughput: fixed shapes
(features bucket-padded), bf16 decode by default, one compiled program per
(batch, bucket) pair.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from openviic_tpu.builders import build_model
from openviic_tpu.data.instance import Instance, InstanceList
from openviic_tpu.training import checkpoint as ckpt
from openviic_tpu.utils import setup_logger

logger = setup_logger()


class CaptioningPipeline:
    def __init__(
        self,
        config,
        checkpoint_dir: Optional[str] = None,
        beam_size: Optional[int] = None,
        batch_size: int = 32,
        use_bf16: bool = True,
        checkpoint_name: Optional[str] = None,
        head_kernel: Optional[Union[bool, int]] = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        decode batches are dp-sharded across it (params replicated), so one
        pipeline serves all chips of a slice; ``batch_size`` must divide by
        the data-axis size.  Pass ``mesh="auto"`` to span every local
        device.  Single-chip behaviour is unchanged when omitted."""
        self.config = config
        if mesh == "auto":
            from openviic_tpu.parallel import make_mesh

            mesh = make_mesh({"data": len(jax.devices())})
        self.mesh = mesh
        if mesh is not None:
            if "data" not in mesh.shape:
                # fail here with the docstring's stated contract — without
                # this, batch_sharding's PartitionSpec('data') dies deep in
                # jax.device_put with an opaque error at first decode
                raise ValueError(
                    "mesh must have a 'data' axis (got axes "
                    f"{tuple(mesh.shape.keys())})"
                )
            ndata = mesh.shape["data"]
            if batch_size % ndata:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"data axis ({ndata})"
                )

        # opt-in persistent XLA compile cache — serving rollouts skip the
        # 20-40 s first-compile tax on restart (utils/compile_cache.py)
        from openviic_tpu.utils import maybe_enable_compilation_cache

        maybe_enable_compilation_cache(config)

        checkpoint_dir = checkpoint_dir or os.path.join(
            config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME
        )
        with open(os.path.join(checkpoint_dir, "vocab.bin"), "rb") as f:
            self.vocab = pickle.load(f)
        self.model = build_model(config.MODEL, self.vocab)
        self.beam_size = beam_size or config.TRAINING.EVALUATING_BEAM_SIZE
        self.batch_size = batch_size
        self.compute_dtype = jnp.bfloat16 if use_bf16 else None
        # fused head+top-k decode kernel (+14-20% on-chip, PERF.md round
        # 3); defaults to the config's TRAINING.DECODE_HEAD_KERNEL
        # (bool, or an int > 1 for the row-blocked variant's block size)
        self.head_kernel = (
            config.TRAINING.get("DECODE_HEAD_KERNEL", False)
            if head_kernel is None else head_kernel
        ) or False
        # fused beam-select self-attention step kernel
        # (ops/beam_select_attention.py)
        self.attn_kernel = config.TRAINING.get("DECODE_ATTN_KERNEL", False) or False

        # initialise to get the param template, then load the checkpoint
        # through the configured backend (native pickle or orbax)
        dummy = self._dummy_batch()
        params = self.model.init(jax.random.PRNGKey(0), dummy)
        io = ckpt.get_backend(config.TRAINING.get("CHECKPOINT_BACKEND", "native"))
        path = os.path.join(checkpoint_dir, checkpoint_name or io.BEST_NAME)
        loaded = io.load_checkpoint(path, params, opt_state_template=None)
        if loaded is None:
            raise FileNotFoundError(f"no checkpoint at {path}")
        # checkpoint restore yields *host* arrays; place them on device once
        # — otherwise every decode call re-uploads the full parameter set
        # (~200 MB fp32 at reference scale, measured seconds per batch over
        # a remote-TPU link)
        if self.mesh is not None:
            from openviic_tpu.parallel.mesh import replicate_sharding

            self.params = jax.device_put(
                loaded["state"]["params"], replicate_sharding(self.mesh)
            )
        else:
            self.params = jax.device_put(loaded["state"]["params"])
        logger.info("Loaded %s (epoch %s)", path, loaded.get("epoch"))

        self._decode = None

    def _dummy_batch(self) -> Dict[str, jnp.ndarray]:
        # one canonical template-batch builder (compat/migrate.py): the
        # migration param template and the serving init template must stay
        # byte-identical or migrated checkpoints stop loading here
        from openviic_tpu.compat.migrate import dummy_batch

        return dummy_batch(self.config, self.vocab)

    def _decoder(self):
        # BeamSearcher owns the jit cache AND the head-kernel auto-gate
        # (head_kernel=True resolves per call via the measured win region;
        # serving pads every call to self.batch_size, so the gate sees the
        # padded row count) — one gating implementation for trainer,
        # serving, and CLI decode paths.
        if self._decode is None:
            from openviic_tpu.decoding.beam_search import BeamSearcher

            searcher = BeamSearcher(
                self.model,
                compute_dtype=self.compute_dtype,
                # beam-resident decode: no per-step cache gathers —
                # token-identical to the default path and ~2x faster
                # (PERF.md round-2 decode optimisation)
                beam_resident=True,
                head_kernel=self.head_kernel,
                attn_kernel=self.attn_kernel,
            )
            extra = {}
            if self.config.MODEL.DECODER.ARCHITECTURE == "AdaptiveDecoder":
                # RSTNet: precompute the (vocab, d) language-signal table
                # ONCE per checkpoint — the per-step frozen-LM forward
                # becomes a gather (exact; 1.9x measured decode win,
                # models/decoders.py language_signal_table)
                table = jax.jit(
                    lambda p: self.model.apply(
                        p, method=self.model.compute_language_table
                    )
                )(self.params)
                extra["language_table"] = jax.block_until_ready(table)
            self._decode = functools.partial(
                searcher, beam_size=self.beam_size, out_size=1, **extra
            )
        return self._decode

    def caption_features(self, feature_dicts: List[Dict]) -> List[str]:
        """Caption a list of per-image feature dicts (the `.npy` payloads)."""
        results: List[str] = []
        decode = self._decoder()
        for start in range(0, len(feature_dicts), self.batch_size):
            chunk = feature_dicts[start : start + self.batch_size]
            # pad the tail chunk to the fixed batch size (avoids recompiles)
            pad_n = self.batch_size - len(chunk)
            batch_items = [Instance(**fd) for fd in chunk]
            batch_items += [batch_items[-1]] * pad_n
            # bucket-pad variable row counts to multiples of 8 so repeated
            # calls reuse a handful of compiled programs
            pad_sizes = {}
            for key, v0 in batch_items[0].items():
                if isinstance(v0, np.ndarray) and v0.ndim >= 2:
                    longest = max(it[key].shape[0] for it in batch_items)
                    pad_sizes[key] = ((longest + 7) // 8) * 8
            batch = InstanceList(batch_items, pad_sizes=pad_sizes)
            # ship feature tensors in the decode's compute dtype — the
            # kernel casts them anyway, and halving the bytes halves the
            # host->device transfer on the serving critical path (boxes
            # keep f32: geometry biases are precision-sensitive)
            cast = self.compute_dtype
            arrays = {
                k: jnp.asarray(
                    v,
                    dtype=cast
                    if cast is not None and k.endswith("_features")
                    and np.issubdtype(v.dtype, np.floating)
                    else None,
                )
                for k, v in batch.arrays().items()
            }
            if self.mesh is not None:
                # dp-shard the fixed-size batch across the mesh; the beam
                # searcher detects the sharded operands and lets GSPMD
                # partition the whole decode (Pallas fast paths auto-gate
                # off — decoding/beam_search.py _batch_spans_devices)
                from openviic_tpu.parallel.mesh import batch_sharding

                arrays = jax.device_put(arrays, batch_sharding(self.mesh))
            outs, _ = decode(self.params, batch=arrays)
            caps = self.vocab.decode_caption(np.asarray(outs))
            results.extend(caps[: len(chunk)])
        return results

    def caption_images(
        self,
        image_paths: Iterable[str],
        backbone: str = "patch",
        grid: int = 7,
        region_boxes: Optional[Dict[str, "np.ndarray"]] = None,
    ) -> Dict[str, str]:
        """Caption raw image files: extract features, then decode.

        ``backbone``: "patch" or "hf:<model>" (data/extraction.py).  The
        patch backbone's feature dim is taken from the model config so the
        extracted features match the vision embedding.  ``region_boxes``
        optionally maps image path/stem -> (r, 4) normalized boxes for
        ROI-pooled region features; for region-consuming models with no
        boxes supplied, the grid cells themselves are used as regions
        (logged once).  Dual-dim (DLCT-style) configs need
        D_REGION_FEATURE == D_GRID_FEATURE to caption raw images, since
        both streams come from the same grid feature map."""
        from PIL import Image

        from openviic_tpu.data.extraction import (
            extract_feature_dict,
            grid_boxes,
            make_backbone,
        )

        vis = self.config.MODEL.VISION_EMBEDDING
        dim = vis.get("D_FEATURE", None)
        if dim is None:
            d_region = vis.get("D_REGION_FEATURE", None)
            dim = vis.get("D_GRID_FEATURE", None) or d_region
            if d_region is not None and d_region != dim:
                raise ValueError(
                    "caption_images derives region features from the grid "
                    f"feature map (dim {dim}), which cannot feed a vision "
                    f"embedding expecting D_REGION_FEATURE={d_region}; "
                    "extract real region features offline instead "
                    "(scripts/extract_features.py)."
                )
        key = (backbone, grid, dim)
        cache = getattr(self, "_backbones", None)
        if cache is None:
            cache = self._backbones = {}
        if key not in cache:  # hf backbones are expensive to load + jit
            cache[key] = make_backbone(backbone, grid, dim)
        bb = cache[key]
        gboxes = grid_boxes(grid)
        needs_regions = (
            self.config.MODEL.ARCHITECTURE != "StandardTransformerUsingGrid"
        )
        paths = list(image_paths)
        feature_dicts = []
        for path in paths:
            stem = os.path.splitext(os.path.basename(path))[0]
            boxes = None
            if region_boxes:
                boxes = region_boxes.get(path, region_boxes.get(stem))
            if boxes is None and needs_regions:
                boxes = gboxes  # grid cells as regions (documented fallback)
            feature_dicts.append(
                extract_feature_dict(Image.open(path), bb, gboxes, boxes)
            )
        captions = self.caption_features(feature_dicts)
        return dict(zip(paths, captions))

    def caption_directory(
        self, features_dir: str, image_ids: Optional[Iterable] = None
    ) -> Dict[str, str]:
        """Caption every ``<id>.npy`` in a directory -> {id: caption}.

        IO-pipelined (round 4): the next batch's feature files load in a
        background thread while the current batch decodes — the decode
        measurements showed the pipeline host-IO-bound at variant shapes
        (PERF.md "variant decode throughput"), and loading the whole
        directory up front also held every feature in memory at once."""
        if image_ids is None:
            image_ids = [
                os.path.splitext(f)[0]
                for f in sorted(os.listdir(features_dir))
                if f.endswith(".npy")
            ]
        image_ids = list(image_ids)
        if not image_ids:
            return {}

        def load_chunk(ids) -> List[Dict]:
            out = []
            for image_id in ids:
                payload = np.load(
                    os.path.join(features_dir, f"{image_id}.npy"),
                    allow_pickle=True,
                )[()]
                out.append(
                    {k: np.asarray(v, np.float32) for k, v in payload.items()}
                )
            return out

        from concurrent.futures import ThreadPoolExecutor

        B = self.batch_size
        chunks = [image_ids[i : i + B] for i in range(0, len(image_ids), B)]
        captions: List[str] = []
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(load_chunk, chunks[0])
            for n in range(len(chunks)):
                current = fut.result()
                if n + 1 < len(chunks):  # exactly one chunk prefetched
                    fut = ex.submit(load_chunk, chunks[n + 1])
                captions.extend(self.caption_features(current))
        return dict(zip([str(i) for i in image_ids], captions))
