"""Serving pipeline test: train briefly, then caption a feature directory."""

import numpy as np

from openviic_tpu.serving import CaptioningPipeline
from tests.test_trainer import full_config


def test_caption_directory(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("serving")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)  # produces best_model + vocab.bin

    pipeline = CaptioningPipeline(cfg, batch_size=3, use_bf16=False)
    captions = pipeline.caption_directory(str(tiny_dataset_dir / "features"))
    assert len(captions) == 8
    assert all(isinstance(c, str) for c in captions.values())

    # deterministic: captioning again gives the same strings
    captions2 = pipeline.caption_directory(str(tiny_dataset_dir / "features"))
    assert captions == captions2


def test_caption_raw_images(tmp_path_factory, tiny_dataset_dir):
    """Raw-image captioning: images -> extraction backbone -> decode."""
    from PIL import Image

    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("serving_images")
    # grid model whose D_FEATURE matches the patch backbone output
    cfg = full_config(
        tmp, tiny_dataset_dir, architecture="StandardTransformerUsingGrid",
        d_feature=11,
    )
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)

    img_dir = tmp / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        p = img_dir / f"photo_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    pipeline = CaptioningPipeline(cfg, batch_size=3, use_bf16=False)
    captions = pipeline.caption_images(paths, backbone="patch", grid=3)
    assert set(captions) == set(paths)
    assert all(isinstance(c, str) for c in captions.values())
    assert captions == pipeline.caption_images(paths, backbone="patch", grid=3)


def test_caption_directory_dp_mesh(tmp_path_factory, tiny_dataset_dir):
    """dp-mesh serving: one pipeline spans all (virtual) devices and
    produces the same captions as the single-device pipeline."""
    import jax

    from openviic_tpu.builders import build_trainer
    from openviic_tpu.parallel import make_mesh

    tmp = tmp_path_factory.mktemp("serving_mesh")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    tr.start(max_epochs=1)

    single = CaptioningPipeline(cfg, batch_size=4, use_bf16=False)
    expected = single.caption_directory(str(tiny_dataset_dir / "features"))

    mesh = make_mesh({"data": len(jax.devices())})
    sharded = CaptioningPipeline(cfg, batch_size=8, use_bf16=False, mesh=mesh)
    got = sharded.caption_directory(str(tiny_dataset_dir / "features"))
    assert got == expected

    # "auto" spans every local device; indivisible batch is rejected
    auto = CaptioningPipeline(cfg, batch_size=8, use_bf16=False, mesh="auto")
    assert auto.mesh.shape["data"] == len(jax.devices())
    try:
        CaptioningPipeline(cfg, batch_size=3, use_bf16=False, mesh=mesh)
    except ValueError as e:
        assert "divisible" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for indivisible batch")
