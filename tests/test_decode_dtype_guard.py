"""bf16 decode runtime guard (VERDICT r3 weak #5 / next #6).

The tuned TPU configs default to ``DECODE_DTYPE: bfloat16`` on the
strength of one measured checkpoint; the guard makes that a per-model
check: the first ``evaluate_metrics`` decodes one batch in both the
configured dtype and f32 and flags token disagreement above
``TRAINING.DECODE_DTYPE_GUARD_TOL``.  Exercised both ways: passing
(within tolerance) and flagging (tolerance forced to -1 so any run
flags), plus off-switch semantics.
"""

import numpy as np

from tests.conftest import make_dataset_config  # noqa: F401 (fixture deps)
from tests.test_trainer import full_config


def _guarded_config(tmp, ds, **training_overrides):
    cfg = full_config(tmp, ds)
    cfg.TRAINING._data["DECODE_DTYPE"] = "bfloat16"
    cfg.TRAINING._data.update(training_overrides)
    return cfg


def test_guard_runs_by_default_with_bf16(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("guard_on")
    tr = build_trainer(_guarded_config(tmp, tiny_dataset_dir))
    assert tr._dtype_guard_enabled
    assert tr.last_decode_dtype_guard is None
    tr.evaluate_metrics(tr.val_dict_dataloader)
    g = tr.last_decode_dtype_guard
    assert g is not None, "guard did not run on the first evaluate_metrics"
    assert 0.0 <= g["token_disagreement"] <= 1.0
    assert 0.0 <= g["seq_agreement"] <= 1.0
    assert g["tol"] == 0.02
    # guard runs once per process, not per eval
    tr.last_decode_dtype_guard = None
    tr.evaluate_metrics(tr.val_dict_dataloader)
    assert tr.last_decode_dtype_guard is None


def test_guard_flags_above_tolerance(tmp_path_factory, tiny_dataset_dir):
    from openviic_tpu.builders import build_trainer

    tmp = tmp_path_factory.mktemp("guard_flag")
    # tolerance -1: any disagreement fraction (including 0) exceeds it,
    # so the flagged/WARNING path is exercised deterministically
    tr = build_trainer(
        _guarded_config(tmp, tiny_dataset_dir, DECODE_DTYPE_GUARD_TOL=-1.0)
    )
    tr.evaluate_metrics(tr.val_dict_dataloader)
    assert tr.last_decode_dtype_guard["flagged"]

    # and the guard result lands in metrics.jsonl for observability
    import json
    import os

    path = os.path.join(tr.checkpoint_path, "metrics.jsonl")
    records = [json.loads(line) for line in open(path)]
    guard_recs = [
        r for r in records if "decode_dtype_guard/flagged" in r
    ]
    assert guard_recs and guard_recs[0]["decode_dtype_guard/flagged"] == 1.0


def test_guard_off_without_bf16_or_when_disabled(
    tmp_path_factory, tiny_dataset_dir
):
    from openviic_tpu.builders import build_trainer

    # f32 decode: nothing to guard
    tmp = tmp_path_factory.mktemp("guard_f32")
    cfg = full_config(tmp, tiny_dataset_dir)
    tr = build_trainer(cfg)
    assert not tr._dtype_guard_enabled
    tr.evaluate_metrics(tr.val_dict_dataloader)
    assert tr.last_decode_dtype_guard is None

    # bf16 but explicitly disabled
    tmp = tmp_path_factory.mktemp("guard_off")
    tr = build_trainer(
        _guarded_config(tmp, tiny_dataset_dir, DECODE_DTYPE_GUARD=False)
    )
    assert not tr._dtype_guard_enabled
    tr.evaluate_metrics(tr.val_dict_dataloader)
    assert tr.last_decode_dtype_guard is None


def test_guard_f32_reference_matches_parity_searcher(
    tmp_path_factory, tiny_dataset_dir
):
    """The guard's f32 searcher must produce the same tokens as a plain
    parity BeamSearcher — i.e. the guard compares against the real
    reference path, not another fast path."""
    from openviic_tpu.builders import build_trainer
    from openviic_tpu.decoding import BeamSearcher
    from openviic_tpu.training.trainer import _device_batch

    tmp = tmp_path_factory.mktemp("guard_ref")
    tr = build_trainer(_guarded_config(tmp, tiny_dataset_dir))
    items = next(iter(tr.val_dict_dataloader))
    batch = _device_batch(items)
    tr._run_decode_dtype_guard(batch, tr.evaluating_beam_size, np.asarray(
        BeamSearcher(tr.model)(
            tr.state["params"], batch,
            beam_size=tr.evaluating_beam_size, out_size=1,
        )[0]
    ))
    # comparing f32 against f32: bit-identical tokens, zero disagreement
    assert tr.last_decode_dtype_guard["token_disagreement"] == 0.0
    assert tr.last_decode_dtype_guard["seq_agreement"] == 1.0
    assert not tr.last_decode_dtype_guard["flagged"]
